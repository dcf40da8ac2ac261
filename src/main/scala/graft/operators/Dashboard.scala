package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-layer facade mirroring the reference's read APIs
  * (SURVEY §3 E2/E3). Where the reference fans out 9 sequential SQL
  * round-trips per dashboard load and 13 per charts load
  * (app.py:1070-1089, 738-773), each snapshot here is a fixed small
  * set of Spark jobs over the same scan lineage — the stats block is
  * ONE pass (A2 consolidation), and the chart payload reuses the
  * already-classified frame for both the histogram and the
  * distribution instead of re-scanning per severity level.
  */
object Dashboard {

  final case class Snapshot(
      stats: DataFrame,          // 1 row: totals / failed / per-op / users
      latest: DataFrame,         // latest-50 feed
      alerts: DataFrame,         // active High/Critical alerts
      recentThreats: DataFrame)  // suspicious-only latest-10 feed

  final case class ChartData(
      timeline: DataFrame,          // hourly buckets
      severityHistogram: DataFrame, // severity_level, n
      opsDistribution: DataFrame)   // operation_type, n

  /** E2 — /api/dashboard-data equivalent, including the
    * recent_threats block of the reference's get_stats payload
    * (app.py:305: suspicious-only, ORDER BY ts DESC LIMIT 10 —
    * TakeOrderedAndProject, no full sort).
    */
  def snapshot(activity: DataFrame, blacklist: DataFrame): Snapshot = {
    val classified = Detect.classify(activity, blacklist)
    Snapshot(
      stats = Analytics.stats(activity),
      latest = Analytics.latest(activity, 50),
      alerts = Detect.deriveAlerts(classified)
        .select(col("activity_id"), col("username"), col("alert_type"),
          col("severity_level"), col("access_timestamp"))
        .orderBy(col("access_timestamp").desc, col("activity_id").desc)
        .limit(20),
      recentThreats = classified
        .filter(col("is_suspicious"))
        .select(col("activity_id"), col("username"), col("severity_level"),
          col("suspicious_reasons"), col("access_timestamp"))
        .orderBy(col("access_timestamp").desc, col("activity_id").desc)
        .limit(10))
  }

  /** E3 — /api/v2/charts/all equivalent: one classified frame feeds
    * every chart (the reference re-runs get_stats plus 4 single-value
    * severity counts; here the histogram is one groupBy).
    */
  def charts(activity: DataFrame, blacklist: DataFrame): ChartData = {
    val classified = Detect.classify(activity, blacklist)
    ChartData(
      timeline = Analytics.timelineHourly(activity),
      severityHistogram = classified
        .groupBy(col("severity_level")).agg(count(lit(1)).as("n"))
        .orderBy(col("severity_level")),
      opsDistribution = Analytics.opsByType(activity))
  }
}
