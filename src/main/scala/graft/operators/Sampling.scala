package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: train/val/test
  * splits and per-source mixture rates as HASH-THRESHOLD filters.
  *
  * Scale design: `rand()`-based sampling is neither reproducible
  * across runs nor stable under repartitioning; hash thresholding is
  * both, and it is a pure scan-local Column predicate — sampling
  * 100 TB costs one codegen'd comparison per row, zero shuffle, and a
  * re-run (or a different executor layout) selects the SAME rows.
  * The hash family is the portable 60-bit md5 one ([[Dedup.md5Seeded]])
  * so every split/sample is exactly replayable by the DuckDB oracle;
  * thresholds are exact integer literals (p·2^60 computed once,
  * driver-side), so there is no float boundary to disagree on.
  */
object Sampling {

  /** 2^60 — the size of the [[Dedup.md5Seeded]] hash domain. */
  val HashDomain: Long = 1L << 60

  /** Integer threshold selecting fraction `p` of the hash domain —
    * exact at the 2^-60 granularity; BigDecimal avoids double
    * rounding surprises at the boundary.
    */
  def thresholdFor(p: Double): Long = {
    require(p >= 0.0 && p <= 1.0, s"fraction out of range: $p")
    (BigDecimal(p.toString) * BigDecimal(HashDomain)).toLong
  }

  /** The per-row sampling key: seeded portable hash of the key column
    * rendered as a string (stable across engines and runs).
    */
  def sampleHash(key: Column, seed: Int = 0): Column =
    Dedup.md5Seeded(seed, key.cast("string"))

  /** Keep a deterministic ~`p` fraction of rows (by `keyCol`). */
  def sampleByHash(df: DataFrame, keyCol: String, p: Double,
                   seed: Int = 0): DataFrame =
    df.filter(sampleHash(col(keyCol), seed) < thresholdFor(p))

  /** Assign every row to a split by carving the hash domain:
    * `[0, t_val) → "val"`, `[t_val, t_val + t_test) → "test"`, rest →
    * "train". Splits are disjoint, exhaustive, reproducible, and
    * stable as the corpus grows (a doc's split never changes when
    * other docs are added — the property shuffle-based splits lack).
    */
  def withSplit(df: DataFrame, keyCol: String, valFrac: Double = 0.01,
                testFrac: Double = 0.01, seed: Int = 0): DataFrame = {
    require(valFrac + testFrac <= 1.0,
      s"val + test fractions exceed 1.0 ($valFrac + $testFrac) — " +
        "the train split would be silently empty")
    val h = sampleHash(col(keyCol), seed)
    val tVal = thresholdFor(valFrac)
    val tTest = tVal + thresholdFor(testFrac)
    df.withColumn("split",
      when(h < tVal, "val").when(h < tTest, "test").otherwise("train"))
  }

  /** Per-stratum mixture sampling: each stratum value keeps its own
    * deterministic fraction (unlisted strata are dropped). The rate
    * map is a when-chain — strata are FEW by construction (sources,
    * languages), so this stays one scan-local predicate; at thousands
    * of strata a broadcast-joined rates dim would replace it.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       rates: Map[String, Double],
                       seed: Int = 0): DataFrame = {
    val h = sampleHash(col(keyCol), seed)
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (stratum, p)) =>
        acc || (col(stratumCol) === stratum && h < thresholdFor(p))
    }
    df.filter(keep)
  }
}
