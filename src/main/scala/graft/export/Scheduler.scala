package graft.export

import java.sql.Timestamp
import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}

import org.apache.spark.sql.DataFrame

import graft.operators.Detect

/** Scheduled report jobs (reference ScheduledReporter, app.py:870-902:
  * a daemon scheduler generates daily/weekly/monthly compliance
  * reports, writes the file and a report_log row, and notifies).
  *
  * The engine ships this as a driver-side utility: [[runOnce]] is the
  * whole job (window → report → file + report_log + notify), and
  * [[start]] wraps it in an in-process fixed-rate schedule for
  * single-node deployments. A production cluster would trigger the
  * same [[runOnce]] from an external orchestrator — the job itself is
  * orchestrator-agnostic.
  *
  * `clock` is injectable so tests and replays are deterministic.
  */
final class ReportScheduler(
    activity: () => DataFrame,
    outDir: String,
    reportLogDir: String,
    notifier: Report.Notifier,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-report-scheduler")
    t.setDaemon(true)
    t
  }
  private var handles: List[ScheduledFuture[_]] = Nil

  /** One scheduled run: period-windowed compliance report → PDF file
    * (the reference writes reportlab PDFs; [[Pdf]] is the
    * dependency-free equivalent) + report_log row + notification.
    * Returns the report path.
    */
  def runOnce(period: String): String = {
    val ts = clock()
    val act = activity()
    val df = Detect.complianceReport(act, period)
    // epoch-millis stamp: timezone-free and unique per distinct clock
    // value (a second-truncated stamp made sub-second runs overwrite
    // each other's file while report_log recorded them as distinct)
    val path = s"$outDir/${period}_compliance_${ts.getTime}.pdf"
    Report.writeLoggedPdfReport(df, path,
      s"${period.capitalize} Compliance Report", reportLogDir, period, ts)
    notifier.notify("Compliance Report", "Info",
      s"type=$period file=$path")
    path
  }

  /** Fixed-rate schedule for a period (the in-process analog of the
    * reference's three cron cadences). Errors are swallowed per run
    * like the reference's try/except — the schedule survives.
    */
  def start(period: String, intervalMs: Long,
            initialDelayMs: Long = 0L): Unit = synchronized {
    val task: Runnable = () =>
      try { runOnce(period); () } catch { case _: Exception => () }
    handles = exec.scheduleAtFixedRate(task, initialDelayMs, intervalMs,
      TimeUnit.MILLISECONDS) :: handles
  }

  def stop(): Unit = synchronized {
    handles.foreach(_.cancel(false))
    handles = Nil
    exec.shutdown()
    exec.awaitTermination(10, TimeUnit.SECONDS)
    ()
  }
}
