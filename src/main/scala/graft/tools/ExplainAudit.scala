package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints formatted physical plans for selected queries and greps for
  * the scale-relevant plan properties (pushdown, broadcast, codegen).
  * Usage: runMain graft.tools.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
        "dam_severity", "dam_timeline_hourly", "dam_firewall",
        "doc_minhash_neardups", "emb_knn_brute",
        "doc_minhash_novel", "doc_curation_e2e")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val props = Seq(
        "PushedFilters" -> "PushedFilters: \\[[^\\]]".r,
        "BroadcastHashJoin" -> "BroadcastHashJoin".r,
        "SortMergeJoin" -> "SortMergeJoin".r,
        "BroadcastNestedLoop" -> "BroadcastNestedLoopJoin".r,
        "Exchange(shuffle)" -> "(?<!Broadcast)Exchange [^S]".r,
        "TakeOrderedAndProject" -> "TakeOrderedAndProject".r)
      val summary = props.map { case (label, re) =>
        s"$label=${re.findAllIn(plan).size}"
      }.mkString("  ")
      // codegen spans only materialize once AQE finalizes stages —
      // execute THIS queryExecution, then count markers in its plan
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      val codegenSpans = "\\*\\(\\d+\\)".r.findAllIn(finalPlan)
        .map(_.toString).toSet.size
      println(s"[audit] $name :: $summary  WholeStageCodegenSpans=$codegenSpans")
    }
    spark.stop()
  }
}
