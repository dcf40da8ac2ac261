package graft.operators

import org.apache.spark.sql.DataFrame

/** Versioned persisted-state ladder for streaming operators whose
  * state advances once per micro-batch: published snapshots live
  * under `v<version>_b<producingBatchId>` directories, a replayed
  * batch resolves to the version BEFORE the one it produced (the
  * input its original run saw) and skips the advance, and one prior
  * version is retained for exactly that replay. The contract of
  * [[Curation.maintenanceStep]]'s corpus-state versions, factored
  * for the dim-state streams ([[TextOps.startSpanDedup]],
  * [[Sampling.startStratifiedSample]]).
  *
  * Crash seams: publish is staged-then-renamed, so a half-written
  * snapshot is never resolvable; whichever prefix of {results write,
  * state publish} a crash leaves, the replay recomputes from the
  * same resolved version and overwrites.
  */
private[graft] object VersionedState {
  import org.apache.hadoop.fs.{FileSystem, Path}

  private val Name = "^v(\\d+)_b(-?\\d+)$".r

  def fsOf(spark: org.apache.spark.sql.SparkSession,
           dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** The published (version, producing-batch) ladder, ascending. */
  def versions(fs: FileSystem, dir: String): Seq[(Int, Long)] = {
    val d = new Path(dir)
    val ls = if (fs.exists(d)) fs.listStatus(d) else null
    (if (ls == null) Array.empty[org.apache.hadoop.fs.FileStatus] else ls)
      .toSeq.flatMap(_.getPath.getName match {
        case Name(v, b) => Some((v.toInt, b.toLong))
        case _ => None
      }).sortBy(_._1)
  }

  /** Bootstrap: publish `df` as version 0, producing batch -1 (no
    * stream batch may claim it). */
  def init(spark: org.apache.spark.sql.SparkSession, dir: String,
           df: DataFrame): Unit =
    publish(spark, fsOf(spark, dir), dir, df, 0, -1L, keep = 1)

  /** Replay-aware resolution for `batchId`: (version to read, its
    * producing batch, alreadyCommitted). A version stamped with this
    * batch id means the advance committed — resolve to the PRIOR
    * version; a replay with no surviving prior version cannot
    * reproduce its input and fails fast.
    */
  def resolve(fs: FileSystem, dir: String,
              batchId: Long): (Int, Long, Boolean) = {
    val vs = versions(fs, dir)
    require(vs.nonEmpty,
      s"versioned state: nothing published under $dir — bootstrap " +
        "with init first")
    vs.find(_._2 == batchId) match {
      case Some((k, _)) =>
        val prior = vs.filter(_._1 < k)
        require(prior.nonEmpty,
          s"versioned state: replay of batch $batchId under $dir but " +
            "no prior version survives — cannot reproduce its input")
        (prior.last._1, prior.last._2, true)
      case None => (vs.last._1, vs.last._2, false)
    }
  }

  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           v: Int, b: Long): DataFrame =
    spark.read.parquet(new Path(dir, s"v${v}_b$b").toString)

  /** Staged publish of version `v` stamped with `batchId`, then prune
    * to the newest `keep` versions. */
  def publish(spark: org.apache.spark.sql.SparkSession, fs: FileSystem,
              dir: String, df: DataFrame, v: Int, batchId: Long,
              keep: Int = 2): Unit = {
    val d = new Path(dir)
    fs.mkdirs(d)
    val staging = new Path(d, s".staging-v$v")
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val target = new Path(d, s"v${v}_b$batchId")
    fs.delete(target, true)
    require(fs.rename(staging, target),
      s"versioned state: failed to publish $target")
    versions(fs, dir).dropRight(keep).foreach { case (ov, ob) =>
      fs.delete(new Path(d, s"v${ov}_b$ob"), true)
      ()
    }
  }
}
