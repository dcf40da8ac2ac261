package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.{Tables, TableRegistry}

/** Multimodal plumbing + table registry tests. */
class MultimodalRegistrySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val assets =
    Multimodal.syntheticAssets(Tables.documents(spark, sf("sf0.001")))

  test("synthetic assets carry opaque payloads with typed metadata") {
    assert(assets.schema("payload").dataType.typeName == "binary")
    val r = assets.filter($"asset_id" === 0L).collect()(0)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
    assert(r.getAs[Int]("width") >= 16)
  }

  test("decode stub produces deterministic fixed-width features per partition batch") {
    val f1 = Multimodal.decodeAndFeaturize(assets).filter(_.asset_id == 1L).collect()(0)
    val f2 = Multimodal.decodeAndFeaturize(assets.repartition(7))
      .filter(_.asset_id == 1L).collect()(0)
    assert(f1.features.length == 16)
    assert(f1.features.toSeq == f2.features.toSeq) // partitioning-invariant
    assert(f1.features.exists(_ != 0f))
  }

  test("resize plan clamps to max dimension, preserves aspect flow") {
    val planned = Multimodal.withResizePlan(assets, maxDim = 100)
    val bad = planned.filter($"out_width" > 100 || $"out_height" > 100).count()
    assert(bad == 0)
    // scale never upsamples
    assert(planned.filter($"scale" > 1.0).count() == 0)
  }

  test("frame sampling explodes video assets at the requested cadence") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    assert(frames.select($"asset_id").distinct().count() ==
      assets.filter($"media_type" === "video").count())
    val one = frames.filter($"asset_id" === 2L).select($"frame_ts_ms")
      .as[Long].collect().sorted
    assert(one.headOption.contains(0L))
    if (one.length > 1) assert(one(1) == 1000L)
  }

  test("registry bootstrap is idempotent; append writers partition by date") {
    val root = Files.createTempDirectory("reg").toString
    TableRegistry.initWarehouse(spark, root)
    TableRegistry.initWarehouse(spark, root) // second call must not throw
    assert(spark.read.parquet(s"$root/users").count() == 3)
    val rules = spark.read.parquet(s"$root/firewall_rules")
    assert(rules.count() == graft.operators.Detect.FirewallRuleSeed.length)
    // the persisted dim keeps the seeded flags verbatim — the inactive
    // rule and the expired blacklist entry must survive bootstrap
    assert(rules.filter(!$"is_active").count() == 1)
    assert(spark.read.parquet(s"$root/ip_blacklist")
      .filter($"expires_at" < to_timestamp(lit("2001-01-01 00:00:00")))
      .count() == 1)

    val acts = Seq((1L, "SELECT 1", "2024-01-10 10:00:00"),
        (2L, "SELECT 2", "2024-01-11 10:00:00"))
      .toDF("activity_id", "operation_details", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    TableRegistry.appendActivities(acts, s"$root/activity_logs")
    assert(new java.io.File(s"$root/activity_logs/event_date=2024-01-10").exists())
    val back = spark.read.parquet(s"$root/activity_logs")
    assert(back.count() == 2)
    assert(back.columns.contains("query_hash"))
  }

  test("appendIfAbsent skips existing keys (INSERT IGNORE analog)") {
    val root = Files.createTempDirectory("reg2").toString
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y2"), (3L, "z")).toDF("k", "v")
    assert(TableRegistry.appendIfAbsent(spark, a, "k", s"$root/t") == 2)
    assert(TableRegistry.appendIfAbsent(spark, b, "k", s"$root/t") == 1)
    assert(spark.read.parquet(s"$root/t").count() == 3)
  }

  test("CSV export caps rows and ISO-formats timestamps") {
    val out = Files.createTempDirectory("csv").toString + "/export"
    val df = (1 to 20).map(i => (i.toLong, f"2024-01-10 10:00:${i % 60}%02d"))
      .toDF("id", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    TableRegistry.exportCsv(df, Seq("access_timestamp"), out, limit = 5)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 5)
    val ts = back.select("access_timestamp").as[String].collect()(0)
    assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"""))
  }
}
