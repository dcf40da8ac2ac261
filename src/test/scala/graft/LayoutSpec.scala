package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

/** Z-order layout: key algebra against a bit-by-bit reference, and the
  * measured file-skipping payoff of the Morton layout over the
  * single-column baseline on the real events table.
  */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def refSpread(x: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 16) { r |= ((x >> i) & 1L) << (2 * i); i += 1 }
    r
  }

  test("spread16 matches the bit-by-bit reference on the 16-bit domain edge cases and a sweep") {
    val samples = (0L to 300L) ++ Seq(0xFFFFL, 0xAAAAL, 0x5555L, 0x8000L,
      0x7FFFL, 12345L, 54321L) ++ (0 until 200).map(i => (i * 32749L) % 65536L)
    val got = samples.toDF("x").select(Layout.spread16(col("x")).as("s"))
      .as[Long].collect()
    samples.zip(got).foreach { case (x, s) =>
      assert(s == refSpread(x), s"spread16($x)")
    }
  }

  private def refSpread3(x: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 21) { r |= ((x >> i) & 1L) << (3 * i); i += 1 }
    r
  }

  test("spread21 / mortonKey3 match the bit-by-bit reference") {
    val samples = (0L to 100L) ++ Seq(0x1FFFFFL, 0x155555L, 0xAAAAAL,
      0x100000L, 999983L) ++ (0 until 100).map(i => (i * 524287L) % 2097152L)
    val got = samples.toDF("x").select(Layout.spread21(col("x")).as("s"))
      .as[Long].collect()
    samples.zip(got).foreach { case (x, s) =>
      assert(s == refSpread3(x), s"spread21($x)")
    }
    val rows = Seq((0x1FFFFFL, 0L, 0L), (0L, 0x1FFFFFL, 0L),
      (0L, 0L, 0x1FFFFFL), (12345L, 67890L, 54321L))
    val k = rows.toDF("x", "y", "z")
      .select(Layout.mortonKey3(col("x"), col("y"), col("z")).as("k"))
      .as[Long].collect()
    rows.zip(k).foreach { case ((x, y, z), kk) =>
      assert(kk == (refSpread3(x) | (refSpread3(y) << 1) |
        (refSpread3(z) << 2)), s"morton3($x,$y,$z)")
    }
    // 21-bit bucket grid spans exactly 0..2097151
    val b = spark.range(0, 4096).toDF("v")
      .select(Layout.bucket21(col("v"), lit(0L), lit(4095L)).as("b"))
    val (mn, mx) = b.agg(min("b"), max("b")).as[(Long, Long)].head()
    assert(mn == 0L && mx == 2097151L)
  }

  test("mortonKey interleaves x into even and y into odd bits") {
    val rows = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (0xAAAAL, 0x5555L), (12345L, 54321L))
    val got = rows.toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")).as("k")).as[Long].collect()
    rows.zip(got).foreach { case ((x, y), k) =>
      assert(k == (refSpread(x) | (refSpread(y) << 1)), s"morton($x,$y)")
    }
  }

  test("bucket16 spans exactly 0..65535 and degenerate domains map to 0") {
    val df = spark.range(0, 1000).toDF("v")
      .select(Layout.bucket16(col("v"), lit(0L), lit(999L)).as("b"))
    val (mn, mx) = df.agg(min("b"), max("b")).as[(Long, Long)].head()
    assert(mn == 0L && mx == 65535L)
    val degen = Seq(7L).toDF("v")
      .select(Layout.bucket16(col("v"), lit(7L), lit(7L)).as("b"))
      .as[Long].head()
    assert(degen == 0L)
  }

  test("z-order layout prunes a per-user box scan the time-sorted layout cannot") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"))
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val nFiles = 16
    Layout.writeLinear(ev, s"$base/linear", "tsec", nFiles)
    Layout.writeZOrdered(ev, s"$base/zorder", "user_id", "tsec", nFiles)

    // same rows either way
    val n = ev.count()
    assert(spark.read.parquet(s"$base/zorder").count() == n)

    // box: one quarter of the user domain, all of time — the scan a
    // per-user/per-cohort pipeline runs daily. Time-sorted files all
    // span the full user range; Morton files have tight user bounds.
    val (uMn, uMx) = ev.agg(min("user_id"), max("user_id"))
      .as[(Long, Long)].head()
    val uHi = uMn + (uMx - uMn) / 4
    val statsL = Layout.fileStats(spark, s"$base/linear", "user_id", "tsec")
    val statsZ = Layout.fileStats(spark, s"$base/zorder", "user_id", "tsec")
    val candL = Layout.candidateFiles(statsL, uMn, uHi, Long.MinValue, Long.MaxValue).count()
    val candZ = Layout.candidateFiles(statsZ, uMn, uHi, Long.MinValue, Long.MaxValue).count()
    assert(statsL.count() == nFiles.toLong && statsZ.count() == nFiles.toLong)
    assert(candL == nFiles.toLong,
      s"time-sorted layout should have no user pruning, got $candL/$nFiles")
    assert(candZ <= nFiles / 2,
      s"z-order should prune at least half the files, got $candZ/$nFiles")

    // and the candidate set is SOUND: files outside it hold no matching rows
    val candSet = Layout.candidateFiles(statsZ, uMn, uHi, Long.MinValue,
      Long.MaxValue).select("file").as[String].collect().toSet
    val matches = spark.read.parquet(s"$base/zorder")
      .withColumn("f", input_file_name())
      .filter(col("user_id").between(uMn, uHi))
      .select("f").distinct().as[String].collect()
    assert(matches.forall(candSet.contains))
  }
}
