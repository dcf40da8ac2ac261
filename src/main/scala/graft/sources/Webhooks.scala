package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's webhook registry (WebhookManager, app.py:912-937 +
  * endpoints app.py:1346-1369) over the `webhooks` control table:
  * register upserts a URL back to active (ON DUPLICATE KEY UPDATE
  * analog; HTTPS-only, app.py:1357), list returns the active set, and
  * fireAll dispatches the fixed alert wire envelope
  * ([[graft.export.Report.alertWireJson]]) to every active URL
  * through a caller-supplied transport — actual HTTP is presentation
  * I/O and stays out of the engine, matching the Notifier pattern.
  * webhook_id is content-addressed on the URL (AUTO_INCREMENT has no
  * distributed analog — same convention as report_log).
  */
object Webhooks {

  private def dirOf(rootDir: String) = s"$rootDir/webhooks"

  private def readable(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) None
    else scala.util.Try(spark.read.parquet(dir)).toOption

  /** Register (or re-activate) a webhook URL. Returns its
    * content-addressed id. Rejects non-HTTPS URLs like the reference
    * endpoint does.
    */
  /** Content-addressed webhook id: the same xxhash64(url) the column
    * expression computes, evaluated JVM-side (no job for one value).
    */
  private def idOf(url: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(url),
      org.apache.spark.sql.types.StringType, 42L)

  def register(spark: SparkSession, rootDir: String, url: String,
               createdAt: java.sql.Timestamp): Long = {
    require(url.startsWith("https://"), "URL must use HTTPS")
    val dir = dirOf(rootDir)
    Mutations.recoverSwap(spark, dir)
    val exists = readable(spark, dir)
      .exists(df => df.filter(col("url") === url).count() > 0)
    if (exists) {
      Mutations.updateRows(spark, dir, col("url") === url,
        Map("is_active" -> lit(true)))
      ()
    } else {
      import spark.implicits._
      val row = Seq((idOf(url), url, true, createdAt))
        .toDF("webhook_id", "url", "is_active", "created_at")
      // same legacy-schema fail-fast as report_log / user_2fa
      readable(spark, dir).foreach { existing =>
        def shape(s: org.apache.spark.sql.types.StructType) =
          s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
        require(shape(existing.schema) == shape(row.schema),
          s"webhooks at $dir has schema ${existing.schema.simpleString}; " +
            s"expected ${row.schema.simpleString} — migrate before appending")
      }
      row.write.mode(SaveMode.Append).parquet(dir)
    }
    idOf(url)
  }

  /** Deactivate a URL (DELETE endpoint analog — the reference flips
    * is_active rather than deleting rows).
    */
  def deactivate(spark: SparkSession, rootDir: String, url: String): Long =
    Mutations.updateRows(spark, dirOf(rootDir), col("url") === url,
      Map("is_active" -> lit(false)))

  /** Active webhooks (GET /api/v2/webhooks, app.py:1346-1350). */
  def list(spark: SparkSession, rootDir: String): DataFrame =
    readable(spark, dirOf(rootDir)) match {
      case Some(df) => df.filter(col("is_active")).orderBy(col("url"))
      case None =>
        import spark.implicits._
        Seq.empty[(Long, String, Boolean, java.sql.Timestamp)]
          .toDF("webhook_id", "url", "is_active", "created_at")
    }

  /** Dispatch every High/Critical alert's wire JSON to every ACTIVE
    * webhook (WebhookManager.fire_all, app.py:914-917) — the
    * driver-side convenience for interactive/KB-scale use (an
    * arbitrary caller closure cannot ship to executors). The
    * production path is [[fireAllDistributed]].
    */
  def fireAll(spark: SparkSession, rootDir: String, classified: DataFrame,
              post: (String, String) => Unit): Long = {
    val urls = list(spark, rootDir).select(col("url"))
      .collect().map(_.getString(0))
    if (urls.isEmpty) return 0L
    var n = 0L
    graft.export.Report.alertWireJson(classified).select("wire_json")
      .toLocalIterator().forEachRemaining { row =>
        urls.foreach { u => post(u, row.getString(0)); n += 1 }
      }
    n
  }

  /** EXECUTOR-SIDE webhook fan-out (round-7 verdict #7): the alerts ×
    * URLs product runs where the alert rows already live, inside a
    * `foreachPartition` over the wire-JSON frame — the form an
    * alerts-stream `foreachBatch` calls per micro-batch. The driver
    * holds ONLY the URL dim (KB-scale, broadcast); `postFactory`
    * builds the transport ON each executor partition (an HTTP client
    * is not serializable — the factory is), so at 100× alert volume
    * delivery parallelism scales with the alert partitioning instead
    * of funneling through one driver loop. Returns deliveries
    * attempted (a Spark accumulator — exactly the executor-side
    * count; a retried partition may re-post, the same at-least-once
    * contract every side-effecting foreachPartition has).
    */
  def fireAllDistributed(spark: SparkSession, rootDir: String,
                         classified: DataFrame,
                         postFactory: () => (String, String) => Unit): Long = {
    val urls = list(spark, rootDir).select(col("url"))
      .collect().map(_.getString(0))
    if (urls.isEmpty) return 0L
    val urlsB = spark.sparkContext.broadcast(urls)
    val delivered = spark.sparkContext.longAccumulator("webhook_deliveries")
    graft.export.Report.alertWireJson(classified).select("wire_json")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val post = postFactory()
        val us = urlsB.value
        it.foreach { row =>
          val json = row.getString(0)
          us.foreach { u => post(u, json); delivered.add(1L) }
        }
      }
    delivered.value
  }
}
