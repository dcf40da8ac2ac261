package graft.export

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Detect}

/** Driver-side presentation adapters (SURVEY S9/S11): the reference
  * renders PDFs with reportlab (app.py:638-702) and fires
  * email/SMS/webhook notifications (app.py:560-617, 912-937). Both
  * are out-of-engine I/O — the engine's job ends at a bounded,
  * already-aggregated DataFrame, which these adapters consume via
  * toLocalIterator (never more than the export cap crosses the
  * driver).
  */
object Report {

  /** The shared report layout (reference reportlab flow
    * app.py:1229-1246, cap 500): title, underline, column header, one
    * capped row per line — the single source both the text and PDF
    * renderers consume, so they cannot desynchronize.
    */
  private def reportLines(df: DataFrame, title: String,
                          cap: Int): Seq[String] = {
    val cols = df.columns
    val lines = scala.collection.mutable.ListBuffer[String](
      title, "=" * title.length, cols.mkString(" | "))
    df.limit(cap).toLocalIterator().forEachRemaining { row =>
      lines += cols.indices.map(i =>
        Option(row.get(i)).map(_.toString).getOrElse("")).mkString(" | ")
      ()
    }
    lines.toSeq
  }

  /** Compliance/activity report as plain text. */
  def writeTextReport(df: DataFrame, outPath: String,
                      title: String, cap: Int = 500): Unit = {
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.writeString(Paths.get(outPath),
      reportLines(df, title, cap).mkString("", "\n", "\n"))
    ()
  }

  /** S9 — PDF export sink (reference ReportExporter/reportlab,
    * app.py:638-702): the same layout rendered as an actual
    * multi-page PDF via the dependency-free [[Pdf]] writer.
    */
  def writePdfReport(df: DataFrame, outPath: String,
                     title: String, cap: Int = 500): Unit =
    Pdf.write(reportLines(df, title, cap), outPath)

  /** report_log append (reference app.py:1505-1513 table; the
    * scheduled reporter records every generated report). report_id is
    * content-addressed (type + path + timestamp — AUTO_INCREMENT has
    * no distributed analog, SURVEY §1.3); `createdAt` is injectable so
    * tests and replays are deterministic.
    */
  def logReport(spark: org.apache.spark.sql.SparkSession,
                reportLogDir: String, reportType: String, filePath: String,
                createdAt: java.sql.Timestamp): Unit = {
    import spark.implicits._
    val entry = Seq((reportType, filePath, createdAt))
      .toDF("report_type", "file_path", "created_at")
      .withColumn("report_id",
        xxhash64(col("report_type"), col("file_path"), col("created_at")))
      .select("report_id", "report_type", "file_path", "created_at")
    // fail FAST on a legacy/mismatched layout: appending a different
    // schema produces a mixed-schema parquet directory that breaks (or
    // silently drops columns) at read time, long after the write that
    // caused it — migrate the directory explicitly instead. A directory
    // with no readable parquet footer (pre-created, or a cleaned-up
    // failed write) counts as absent: the append creates the first file.
    if (Files.exists(Paths.get(reportLogDir))) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      scala.util.Try(spark.read.parquet(reportLogDir).schema).toOption
        .foreach { existing =>
          require(shape(existing) == shape(entry.schema),
            s"report_log at $reportLogDir has schema ${existing.simpleString}; " +
              s"expected ${entry.schema.simpleString} — migrate the existing " +
              "directory before appending")
        }
    }
    entry.write.mode(SaveMode.Append).parquet(reportLogDir)
  }

  /** Generate a report file AND record it in report_log — the
    * scheduled-reporter flow (app.py:891-902) as one call. Text
    * variant; [[writeLoggedPdfReport]] is what the scheduler runs.
    */
  def writeLoggedReport(df: DataFrame, outPath: String, title: String,
                        reportLogDir: String, reportType: String,
                        createdAt: java.sql.Timestamp,
                        cap: Int = 500): Unit = {
    writeTextReport(df, outPath, title, cap)
    logReport(df.sparkSession, reportLogDir, reportType, outPath, createdAt)
  }

  /** PDF flavor of [[writeLoggedReport]] — the reference's scheduled
    * reporter writes PDFs (app.py:891-895).
    */
  def writeLoggedPdfReport(df: DataFrame, outPath: String, title: String,
                           reportLogDir: String, reportType: String,
                           createdAt: java.sql.Timestamp,
                           cap: Int = 500): Unit = {
    writePdfReport(df, outPath, title, cap)
    logReport(df.sparkSession, reportLogDir, reportType, outPath, createdAt)
  }

  /** Notification sink (reference daemon-thread dispatch app.py:433):
    * alerts stream → side-effecting notifier. The engine only filters
    * to High/Critical; transport is pluggable.
    */
  trait Notifier extends Serializable {
    def notify(alertType: String, severity: String, description: String): Unit
    /** Username-carrying overload — the reference's dispatch_alert
      * includes the triggering alert's actor in the email body
      * (alert.get('username','unknown'), app.py:605-617), so the seam
      * must carry it or notified operators lose the attribution.
      * Default delegates to the 3-arg form for transports that don't
      * render the actor (SMS trims to severity+description).
      */
    def notify(alertType: String, severity: String, description: String,
               username: String): Unit =
      notify(alertType, severity, description)
  }

  final class CollectingNotifier extends Notifier {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]
    override def notify(t: String, s: String, d: String): Unit =
      sent.add((t, s, d))
  }

  /** The fixed alert wire payload (reference alert dict app.py:425-433
    * + the webhook envelope app.py:921-924: {source: "DAM-v3",
    * timestamp, payload}, header X-DAM-Event: security-alert):
    * to_json over an explicit StructType, computed distributed — the
    * driver only iterates the already-tiny alert set. The envelope
    * timestamp is the alert's event time (the reference stamps
    * dispatch wall-clock; event time keeps replays byte-identical).
    */
  val WireEventHeader: (String, String) = "X-DAM-Event" -> "security-alert"

  def alertWireJson(classified: DataFrame): DataFrame =
    Detect.deriveAlerts(classified).select(
      col("activity_id"),
      to_json(struct(
        lit("DAM-v3").as("source"),
        date_format(col("access_timestamp"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("timestamp"),
        struct(
          col("activity_id").as("alert_id"),
          col("alert_type"),
          col("severity_level").as("severity"),
          col("suspicious_reasons").as("description"),
          col("username")).as("payload"))).as("wire_json"))

  /** Webhook-shaped transport: receives the exact wire JSON string. */
  trait WireNotifier extends Serializable {
    def post(json: String): Unit
  }

  /** Dispatch the JSON wire payloads through a webhook-shaped
    * notifier (WebhookManager.fire_all analog, app.py:914-924).
    */
  def dispatchWire(classified: DataFrame, notifier: WireNotifier): Long = {
    var n = 0L
    alertWireJson(classified).select("wire_json")
      .toLocalIterator().forEachRemaining { row =>
        notifier.post(row.getString(0))
        n += 1
      }
    n
  }

  /** Dispatch High/Critical alerts from a classified micro-batch or
    * table through the notifier (driver-side; alert volume is already
    * bounded by severity filtering).
    */
  def dispatchAlerts(classified: DataFrame, notifier: Notifier): Long = {
    var n = 0L
    Detect.deriveAlerts(classified)
      .select("alert_type", "severity_level", "suspicious_reasons",
        "username")
      .toLocalIterator().forEachRemaining { row =>
        notifier.notify(row.getString(0), row.getString(1), row.getString(2),
          Option(row.getString(3)).filter(_.nonEmpty).getOrElse("unknown"))
        n += 1
      }
    n
  }
}
