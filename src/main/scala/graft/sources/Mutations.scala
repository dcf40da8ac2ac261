package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Row mutations over immutable parquet (SURVEY §7 "mutable rows"):
  * the reference UPDATEs rows in place (alert resolve app.py:1132,
  * user lock/unlock app.py:246, failed_attempts app.py:207-226);
  * here mutations are read-merge-rewrite jobs over the small control
  * tables.
  *
  * Scale note: this pattern is only for KB..MB control tables (users,
  * alerts). The big fact table never mutates — the one reference
  * UPDATE against it (post-insert severity enrichment,
  * app.py:405-409) is classify-at-ingest in this engine, so rows are
  * born final. A lakehouse format (Delta/Iceberg/Hudi) would replace
  * this file-swap with a transactional MERGE at scale.
  */
object Mutations {

  /** If a previous swap crashed between the two renames, the live path
    * is missing and the data sits stranded under '.old' (or fully
    * written under '.tmp'). Called at the top of every mutation so a
    * restart self-heals; concurrent readers during the swap window
    * still see a transient missing path — SINGLE-WRITER, and readers
    * must tolerate/retry. That non-atomicity is inherent to
    * directory-swap over a plain filesystem; a lakehouse table format
    * (Delta/Iceberg/Hudi) is the real fix at scale.
    */
  def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    if (!fs.exists(p(dir))) {
      if (fs.exists(p(dir + ".tmp"))) fs.rename(p(dir + ".tmp"), p(dir))
      else if (fs.exists(p(dir + ".old"))) fs.rename(p(dir + ".old"), p(dir))
    }
  }

  /** Apply `updates` to rows matching `predicate`, swapping the table
    * directory (write new → move old → move new; see [[recoverSwap]]
    * for the crash-window contract). Returns the number of updated
    * rows.
    */
  def updateRows(spark: SparkSession, dir: String, predicate: Column,
                 updates: Map[String, Column]): Long = {
    recoverSwap(spark, dir)
    val current = spark.read.parquet(dir)
    val matched = current.filter(predicate).count()
    if (matched > 0) {
      val updated = updates.foldLeft(current) { case (df, (name, value)) =>
        // a column introduced by the mutation (e.g. resolved_at on an
        // alerts table that never had one) stays null elsewhere
        if (df.columns.contains(name))
          df.withColumn(name, when(predicate, value).otherwise(col(name)))
        else df.withColumn(name, when(predicate, value))
      }
      swapWrite(spark, dir, updated)
    }
    matched
  }

  /** Partition columns of an existing parquet directory, inferred from
    * the `col=value` directory chain — so a rewrite can preserve the
    * layout (a mutation must not flatten a table the streaming sink
    * writes partitioned, or the next micro-batch's dynamic overwrite
    * meets a conflicting directory structure).
    */
  private def partitionColsOf(spark: SparkSession, dir: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val buf = scala.collection.mutable.ListBuffer[String]()
    var cur = new org.apache.hadoop.fs.Path(dir)
    var go = fs.exists(cur)
    while (go) {
      go = false
      val sub = fs.listStatus(cur).filter(s =>
        s.isDirectory && s.getPath.getName.contains("="))
      if (sub.nonEmpty) {
        val name = sub.head.getPath.getName
        buf += name.substring(0, name.indexOf('='))
        cur = sub.head.getPath
        go = true
      }
    }
    buf.toSeq
  }

  /** Write `df` to `dir` via the tmp/old rename dance ([[recoverSwap]]
    * heals a crash inside it), preserving the directory's partition
    * layout.
    */
  private def swapWrite(spark: SparkSession, dir: String,
                        df: DataFrame): Unit = {
    val tmp = dir + ".tmp"
    val old = dir + ".old"
    val partCols = partitionColsOf(spark, dir)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    fs.delete(p(old), true)
    fs.rename(p(dir), p(old))
    fs.rename(p(tmp), p(dir))
    fs.delete(p(old), true)
    ()
  }

  /** DELETE FROM … WHERE predicate (reference firewall-rule delete,
    * app.py:1329-1334) as a read-filter-rewrite over the same swap
    * machinery. Rows where the predicate evaluates NULL are KEPT — a
    * plain `filter(!predicate)` would silently delete them under
    * three-valued logic. Returns rows removed.
    */
  def deleteRows(spark: SparkSession, dir: String,
                 predicate: Column): Long = {
    recoverSwap(spark, dir)
    val current = spark.read.parquet(dir)
    val matched = current.filter(predicate).count()
    if (matched > 0)
      swapWrite(spark, dir,
        current.filter(coalesce(predicate, lit(false)) === false))
    matched
  }

  /** Bulk lockout application — the write half of the reference's
    * lockout flow (authenticate refuses while locked_until is future,
    * app.py:215-216; update_status app.py:246): every username in
    * `lockouts` (the [[graft.operators.Detect.lockouts]] output, or
    * any frame with username + locked_until) gets
    * account_status='Locked' and its locked_until persisted on the
    * users control table. The lockout frame is already tiny
    * (aggregated), so the merge is a broadcast join over the small
    * users dim. Returns the number of users locked.
    */
  def applyLockouts(spark: SparkSession, usersDir: String,
                    lockouts: DataFrame): Long = {
    recoverSwap(spark, usersDir)
    val cur = spark.read.parquet(usersDir)
    // pin the aggregated lockout set (tiny): the lockout lineage is two
    // window passes over the activity table, and it is consumed twice
    // (count + merge write)
    val lk0 = lockouts.groupBy(col("username"))
      .agg(max(col("locked_until")).as("__locked_until"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applyLockoutsPinned(spark, usersDir, cur, lk0)
    finally { lk0.unpersist(); () }
  }

  private def applyLockoutsPinned(spark: SparkSession, usersDir: String,
                                  cur: DataFrame, lk0: DataFrame): Long = {
    val lk = broadcast(lk0)
    val n = cur.join(lk, Seq("username"), "left_semi").count()
    if (n > 0) {
      val base =
        if (cur.columns.contains("locked_until")) cur
        else cur.withColumn("locked_until", lit(null).cast("timestamp_ntz"))
      val merged = base.join(lk, Seq("username"), "left")
        .withColumn("account_status",
          when(col("__locked_until").isNotNull, "Locked")
            .otherwise(col("account_status")))
        .withColumn("locked_until",
          coalesce(col("__locked_until"), col("locked_until")))
        .drop("__locked_until")
      swapWrite(spark, usersDir, merged)
    }
    n
  }

  /** MERGE / upsert as a pure frame transform: rows of `source` win on
    * key match, unmatched `target` rows survive, unmatched `source`
    * rows insert — SQL MERGE with WHEN MATCHED UPDATE SET * / WHEN NOT
    * MATCHED INSERT *. ONE anti-join: the target is scanned once and
    * only its key columns compare; when the source (a CDC batch,
    * typically ≪ target) fits the broadcast threshold AQE makes it a
    * broadcast anti-join, so the target never shuffles. At 100 TB the
    * target side would additionally be partition-restricted to the
    * partitions the batch's keys touch before the rewrite (the
    * dynamic-overwrite pattern `Ingest.start` uses).
    */
  def mergeUpsert(target: DataFrame, source: DataFrame,
                  keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source)

  /** Apply an op-coded CDC batch: `changes` carries `opCol` with 'D'
    * (delete — the key's row is removed) or anything else (upsert —
    * the change row replaces/inserts). Exactly lakehouse MERGE
    * semantics: matched+D deletes, matched+U updates, unmatched+U
    * inserts, unmatched+D is a no-op. Same single-anti-join shape as
    * [[mergeUpsert]] — every change key (delete or not) drops from the
    * target, then the non-delete rows union back.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String): DataFrame =
    target.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))

  /** Alert lifecycle (reference app.py:1132): status → Resolved with
    * a resolution timestamp.
    */
  def resolveAlert(spark: SparkSession, alertsDir: String,
                   activityId: Long, resolvedAt: java.sql.Timestamp): Long =
    updateRows(spark, alertsDir, col("activity_id") === activityId, Map(
      "status" -> lit("Resolved"),
      "resolved_at" -> lit(resolvedAt)))

  /** Account lock/unlock (reference app.py:246). */
  def setAccountStatus(spark: SparkSession, usersDir: String,
                       username: String, status: String): Long =
    updateRows(spark, usersDir, col("username") === username,
      Map("account_status" -> lit(status)))
}
