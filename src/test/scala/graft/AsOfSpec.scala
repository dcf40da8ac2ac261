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

  test("directed asof: forward, nearest, tolerance, equal-ts eligibility both ways") {
    val left = Seq(
      (1L, 10L, "2024-01-10 12:00:00"), // between rights: back 1h, fwd 15m
      (2L, 10L, "2024-01-10 11:00:00"), // EXACTLY on right 100 → both dirs
      (3L, 10L, "2024-01-01 00:00:00"), // far before all rights
      (4L, 20L, "2024-01-10 12:00:00")) // no rights for key
      .toDF("id", "k", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val right = Seq(
      (100L, 10L, "2024-01-10 11:00:00", 1.0),
      (101L, 10L, "2024-01-10 12:15:00", 2.0))
      .toDF("rk", "k", "ts_s", "v")
      .withColumn("rts", to_timestamp($"ts_s")).drop("ts_s")
    def run(dir: String, tol: Option[Long]): Map[Long, Option[Long]] =
      AsOf.asofJoinDirected(left, "k", "ts", right, "k", "rts", "rk",
          Seq("rk", "v"), direction = dir, toleranceSec = tol)
        .select($"id", $"__asof.rk")
        .as[(Long, Option[Long])].collect().toMap
    // forward: the first right AT or after
    assert(run("forward", None) ==
      Map(1L -> Some(101L), 2L -> Some(100L), 3L -> Some(100L), 4L -> None))
    // nearest: row 1 is 1h back vs 15m forward → forward wins;
    // row 2 is distance 0 both ways → backward (same row here)
    assert(run("nearest", None) ==
      Map(1L -> Some(101L), 2L -> Some(100L), 3L -> Some(100L), 4L -> None))
    // tolerance gates the far match: 30 min cap kills row 1's backward
    // match but keeps its forward one; row 3 loses everything
    assert(run("backward", Some(1800L)) ==
      Map(1L -> None, 2L -> Some(100L), 3L -> None, 4L -> None))
    assert(run("forward", Some(1800L)) ==
      Map(1L -> Some(101L), 2L -> Some(100L), 3L -> None, 4L -> None))
    assert(run("nearest", Some(1800L)) ==
      Map(1L -> Some(101L), 2L -> Some(100L), 3L -> None, 4L -> None))
    // the legacy entry point is exactly directed-backward
    assert(run("backward", None) ==
      AsOf.asofJoin(left, "k", "ts", right, "k", "rts", "rk",
          Seq("rk", "v"))
        .select($"id", $"__asof.rk")
        .as[(Long, Option[Long])].collect().toMap)
    // matched timestamp rides along for distance-aware callers
    val ts1 = AsOf.asofJoinDirected(left, "k", "ts", right, "k", "rts",
        "rk", Seq("rk"), direction = "nearest")
      .filter($"id" === 1L).select($"__asof_ts".cast("string"))
      .as[String].collect()(0)
    assert(ts1 == "2024-01-10 12:15:00")
  }

  test("salted top-k equals plain top-k") {
    val act = Tables.activity(spark, sf("sf0.001"))
    val plain = Analytics.topUsers(act).as[(String, Long)].collect().toSeq
    val salted = Analytics.topUsersSalted(act).as[(String, Long)].collect().toSeq
    assert(plain == salted)
  }
}
