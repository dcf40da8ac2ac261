package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch profiler for operator stage timing (not part of the
  * library surface). Uses noop writes (count() would prune the
  * projections under test).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.nonEmpty) {
      // time named SparkEntry queries instead of the fixed battery;
      // the special name "agentparse" decomposes the dam_agent_parse
      // pipeline into stages (round-4 bench regression triage)
      args.foreach {
        case "agentparse" =>
          import graft.functions.Classify
          val raw = Tables.generalLogFeed(spark, d)
          time("raw synth")(raw)
          time("+ skip filter")(raw.filter(Classify.keepQuery(col("argument"))))
          time("+ hex decode")(raw.filter(Classify.keepQuery(col("argument")))
            .withColumn("od",
              substring(Classify.lenientHexDecode(col("argument")), 1, 1000)))
          time("full parse (no sort)")(
            graft.streaming.Ingest.parseGeneralLog(raw))
          time("dam_agent_parse (with sort)")(
            graft.SparkEntry.queries("dam_agent_parse")(spark, d))
        case name =>
          time(name)(graft.SparkEntry.queries(name)(spark, d))
      }
      spark.stop()
      return
    }
    val ev = Tables.events(spark, d)
    time("events scan")(ev)
    time("events + sqlText")(ev.withColumn("sql", Tables.sqlTextFromEvent()))
    val act = Tables.activity(spark, d)
    time("activity view")(act)
    time("activity no-hash")(act.drop("query_hash"))
    time("activity + orderBy")(act.orderBy(col("activity_id")))
    val cls = graft.operators.Detect.classify(act,
      graft.operators.Detect.ipBlacklist(spark))
    time("classified")(cls)
    time("dam_classify full")(
      graft.SparkEntry.queries("dam_classify")(spark, d))
    spark.stop()
  }
}
