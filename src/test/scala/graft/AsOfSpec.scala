package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, AsOf}
import graft.sources.Tables

/** As-of join + salted top-k semantics. */
class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("asof join picks latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, 10L, "2024-01-10 12:00:00"),
      (2L, 10L, "2024-01-10 12:30:00"),
      (3L, 10L, "2024-01-09 00:00:00"), // before any right row → null
      (4L, 20L, "2024-01-10 12:00:00")) // key with no right rows → null
      .toDF("id", "k", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val right = Seq(
      (100L, 10L, "2024-01-10 11:00:00", 1.0),
      (101L, 10L, "2024-01-10 12:15:00", 2.0),
      (102L, 10L, "2024-01-10 12:15:00", 3.0)) // same ts → highest key wins
      .toDF("rk", "k", "ts_s", "v")
      .withColumn("rts", to_timestamp($"ts_s")).drop("ts_s")
    val got = AsOf.asofJoin(left, "k", "ts", right, "k", "rts", "rk",
        Seq("rk", "v"))
      .select($"id", $"__asof.rk", $"__asof.v")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(100L), Some(1.0))))
    assert(got(2L) == ((Some(102L), Some(3.0)))) // tie → rk 102
    assert(got(3L) == ((None, None)))
    assert(got(4L) == ((None, None)))
  }

  test("salted top-k equals plain top-k") {
    val act = Tables.activity(spark, sf("sf0.001"))
    val plain = Analytics.topUsers(act).as[(String, Long)].collect().toSeq
    val salted = Analytics.topUsersSalted(act).as[(String, Long)].collect().toSeq
    assert(plain == salted)
  }
}
