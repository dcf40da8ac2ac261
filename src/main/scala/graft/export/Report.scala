package graft.export

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

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

  /** Compliance/activity report as plain text (PDF layout stand-in —
    * no PDF library in this environment; the data path, caps and
    * column selection match the reference's reportlab flow
    * app.py:1229-1246, cap 500).
    */
  def writeTextReport(df: DataFrame, outPath: String,
                      title: String, cap: Int = 500): Unit = {
    val cols = df.columns
    val sb = new StringBuilder
    sb.append(title).append('\n')
    sb.append("=" * title.length).append('\n')
    sb.append(cols.mkString(" | ")).append('\n')
    df.limit(cap).toLocalIterator().forEachRemaining { row =>
      sb.append(cols.indices.map(i =>
        Option(row.get(i)).map(_.toString).getOrElse("")).mkString(" | "))
        .append('\n')
    }
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.writeString(Paths.get(outPath), sb.toString)
  }

  /** Notification sink (reference daemon-thread dispatch app.py:433):
    * alerts stream → side-effecting notifier. The engine only filters
    * to High/Critical; transport is pluggable.
    */
  trait Notifier extends Serializable {
    def notify(alertType: String, severity: String, description: String): Unit
  }

  final class CollectingNotifier extends Notifier {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]
    override def notify(t: String, s: String, d: String): Unit =
      sent.add((t, s, d))
  }

  /** Dispatch High/Critical alerts from a classified micro-batch or
    * table through the notifier (driver-side; alert volume is already
    * bounded by severity filtering).
    */
  def dispatchAlerts(classified: DataFrame, notifier: Notifier): Long = {
    var n = 0L
    Detect.deriveAlerts(classified)
      .select("alert_type", "severity_level", "suspicious_reasons")
      .toLocalIterator().forEachRemaining { row =>
        notifier.notify(row.getString(0), row.getString(1), row.getString(2))
        n += 1
      }
    n
  }
}
