package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Classify
import graft.operators.Detect

/** Property-based invariants (SURVEY §5.4): classifier totality,
  * severity monotonicity, lattice bijection. Generators are driven
  * with fixed seeds (deterministic CI).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val opLabels = Set("SELECT", "INSERT", "UPDATE", "DELETE",
    "CREATE", "DROP", "ALTER", "TRUNCATE", "GRANT", "REVOKE",
    "PROCEDURE", "OTHER")

  test("C1 totality: arbitrary strings classify to exactly one label") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.oneOf("SELECT x", " update T", "zzz", "", "  ",
        "DROP TABLE t", "call p()", "0x41", "\nselect 1", "şELECT"))
    val strs = samples(gen, 200)
    val got = strs.toDF("sql")
      .select(Classify.operationType($"sql")).as[String].collect()
    assert(got.length == strs.length)
    got.foreach(l => assert(opLabels.contains(l)))
  }

  test("C2 totality: extractor always yields a non-empty table name") {
    val strs = samples(Gen.asciiPrintableStr, 200) ++
      Seq("FROM ", "from  x", "INTO\tt", "join j1 join j2")
    val got = strs.toDF("sql")
      .select(Classify.tableNameOf($"sql")).as[String].collect()
    got.foreach(t => assert(t != null && t.nonEmpty))
  }

  test("C4 monotonicity: adding a triggered rule never lowers severity") {
    def ordOf(rows: Seq[(Long, Long, String, String, String, String, String, String, Long)]): Map[Long, Long] = {
      val df = rows.toDF("activity_id", "user_id", "username", "role",
          "operation_type", "table_name", "operation_details", "ip_address",
          "rows_affected")
        .withColumn("access_timestamp", to_timestamp(lit("2024-01-10 12:00:00")))
        .withColumn("operation_status", lit("Success"))
      Detect.classify(df, Detect.ipBlacklist(spark))
        .select($"activity_id", $"severity_ord").as[(Long, Long)].collect().toMap
    }
    // pairs (base, escalated-by-one-more-rule) across rule axes
    val pairs = Seq(
      ((1L, 1L, "u", "User", "SELECT", "products", "SELECT 1", "10.0.0.1", 0L),
       (1L, 1L, "u", "User", "SELECT", "products", "SELECT password FROM t", "10.0.0.1", 0L)),
      ((1L, 1L, "u", "Guest", "DELETE", "products", "DELETE FROM products", "10.0.0.1", 0L),
       (1L, 1L, "u", "Guest", "DELETE", "products", "DELETE FROM products", "10.0.3.7", 0L)),
      ((1L, 1L, "u", "User", "SELECT", "accounts", "SELECT 1 FROM accounts", "10.0.0.1", 0L),
       (1L, 1L, "u", "User", "SELECT", "accounts", "SELECT 1 FROM accounts", "10.0.0.1", 9999L)))
    pairs.zipWithIndex.foreach { case ((b, e), i) =>
      val bo = ordOf(Seq(b))(1L)
      val eo = ordOf(Seq(e))(1L)
      assert(bo <= eo, s"pair $i: base=$bo escalated=$eo")
    }
  }

  test("severity ordinal ↔ name bijection over the lattice") {
    val df = Seq(0, 1, 2, 3).toDF("ord")
      .select(col("ord"), Detect.severityName(col("ord")).as("name"))
    assert(df.as[(Int, String)].collect().toSeq ==
      Seq((0, "Low"), (1, "Medium"), (2, "High"), (3, "Critical")))
  }

  test("stats invariants on real data: failed ≤ total, Σ by-type ≤ total") {
    val act = graft.sources.Tables.activity(spark, sf("sf0.001"))
    val r = graft.operators.Analytics.stats(act).collect()(0)
    val total = r.getAs[Long]("total_activities")
    assert(r.getAs[Long]("failed_activities") <= total)
    val byType = r.getAs[Long]("select_count") + r.getAs[Long]("insert_count") +
      r.getAs[Long]("update_count") + r.getAs[Long]("delete_count")
    assert(byType <= total)
    assert(total == 1000L)
  }
}
