package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dashboard, Detect}
import graft.sources.{Tables, TableRegistry}

/** Serving facade, compaction, and bucketed co-located join proofs. */
class DashboardBucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("E2 dashboard snapshot: one-pass stats + capped feeds") {
    val act = Tables.activity(spark, sf("sf0.001"))
    val snap = Dashboard.snapshot(act, Detect.ipBlacklist(spark))
    assert(snap.stats.count() == 1)
    assert(snap.stats.collect()(0).getAs[Long]("total_activities") == 1000L)
    assert(snap.latest.count() == 50)
    val alerts = snap.alerts.collect()
    assert(alerts.length <= 20 && alerts.nonEmpty)
    // recent_threats block (app.py:305): suspicious-only, capped at 10,
    // newest first
    val threats = snap.recentThreats.collect()
    assert(threats.length == 10)
    val ts = threats.map(_.getAs[java.time.LocalDateTime]("access_timestamp"))
    assert(ts.sliding(2).forall(p => !p(0).isBefore(p(1))))
  }

  test("E3 charts payload from a single classified frame") {
    val act = Tables.activity(spark, sf("sf0.001"))
    val cd = Dashboard.charts(act, Detect.ipBlacklist(spark))
    assert(cd.timeline.count() > 0)
    val hist = cd.severityHistogram.as[(String, Long)].collect().toMap
    assert(hist.values.sum == 1000L)
    assert(hist.keySet.subsetOf(Set("Low", "Medium", "High", "Critical")))
    assert(cd.opsDistribution.count() > 0)
  }

  test("compaction reduces file count, preserves rows and partitioning") {
    val root = Files.createTempDirectory("cmp").toString + "/logs"
    val mk = (id: Long, day: Int) => (id, s"2024-01-1$day 10:00:00")
    // simulate 6 micro-batch appends → many small files
    (1 to 6).foreach { b =>
      TableRegistry.appendActivities(
        Seq(mk(b.toLong, 1), mk(b + 10L, 2)).toDF("activity_id", "ts_s")
          .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
          .withColumn("operation_details", lit("SELECT 1")),
        root)
    }
    def fileCount = Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = fileCount
    TableRegistry.compact(spark, root, filesPerPartition = 1)
    assert(fileCount < before)
    val back = spark.read.parquet(root)
    assert(back.count() == 12)
    assert(new java.io.File(s"$root/event_date=2024-01-11").exists())
  }

  test("date-partitioned fact table prunes partitions on date predicates") {
    val root = Files.createTempDirectory("prune").toString + "/logs"
    val rows = (1 to 20).map(i => (i.toLong, f"2024-01-${i % 4 + 10}%02d 10:00:00"))
    graft.sources.TableRegistry.appendActivities(
      rows.toDF("activity_id", "ts_s")
        .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
        .withColumn("operation_details", lit("SELECT 1")),
      root)
    val all = spark.read.parquet(root)
    val q = all.filter($"event_date" === "2024-01-11")
    assert(q.collect().length == 5)
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters") &&
      plan.toString.contains("event_date"),
      s"expected partition filters:\n$plan")
    // the scan's runtime metric shows only the matching partition read
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = all.inputFiles.length
    assert(filesRead < totalFiles,
      s"pruning read $filesRead of $totalFiles files")
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      TableRegistry.writeBucketed(
        Tables.events(spark, sf("sf0.001")).select($"user_id", $"value"),
        "ev_bucketed", "user_id", buckets = 4)
      TableRegistry.writeBucketed(
        Tables.customer(spark, sf("sf0.001"))
          .select($"c_custkey".as("user_id"), $"c_acctbal"),
        "cust_bucketed", "user_id", buckets = 4)
      val j = spark.table("ev_bucketed")
        .join(spark.table("cust_bucketed"), Seq("user_id"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS cust_bucketed")
    }
  }
}
