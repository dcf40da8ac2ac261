package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Decontam gram-index amortization sweep: measured wall-clock of
  * screening eval suites against the corpus ONE-SHOT (per-suite
  * corpus re-shingle) vs through the durable gram index
  * ([[graft.operators.TextOps.contaminationMatrixIndexed]]), at
  * K = 1, 2, 4 suites, plus the disclosed one-time index build.
  * Suites are doc_id-residue subsets of the corpus (the oracle
  * fixture shape); results are collected fully, so the probe's real
  * output cost is billed (the `.count()` projection-pruning trap is
  * avoided). The break-even claim this measures: the index build
  * costs ~one one-shot screen, so from the second suite (or the
  * second day of a growing battery) the at-rest form wins.
  */
object GramProf {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    val mods = Seq(29L, 31L, 37L, 41L)
    def bench(m: Long) = docs.filter(col("doc_id") % m === 0)
    val train = mods.foldLeft(docs)((df, m) =>
      df.filter(col("doc_id") % m =!= 0))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // disclosed one-time build (xx hash — the engine fast path).
    // 256 buckets: the partition-prune dial scales with corpus size
    // in production; at sf0.1 it lets the targeted-suite row below
    // show real pruning instead of all-buckets saturation.
    val dir = java.nio.file.Files.createTempDirectory("gramprof").toString
    val (_, buildSec) = time {
      TextOps.writeGramIndex(train, dir, n = 8, nBuckets = 256,
        hashFn = Dedup.xxSeeded)
    }
    println(f"[gramprof] index build (train side, n=8): $buildSec%.2f s")
    // JIT/page-cache warm-up on BOTH paths before any timed row —
    // without it the first timed one-shot carries the whole session's
    // codegen warm-up and the sweep reads as if K amortized it
    TextOps.contaminationMatrix(train, Seq("w" -> bench(29L)), n = 8,
      hashFn = Dedup.xxSeeded).collect()
    TextOps.contaminationMatrixIndexed(spark, dir,
      Seq("w" -> bench(29L))).collect()
    for (k <- Seq(1, 2, 4)) {
      val suites = mods.take(k).map(m => s"b$m" -> bench(m))
      val (oneShot, osSec) = time {
        TextOps.contaminationMatrix(train, suites, n = 8,
          hashFn = Dedup.xxSeeded).collect()
      }
      val (indexed, ixSec) = time {
        TextOps.contaminationMatrixIndexed(spark, dir, suites).collect()
      }
      require(oneShot.toSeq == indexed.toSeq,
        s"probe diverged from one-shot at K=$k")
      println(f"[gramprof] K=$k suites: one-shot $osSec%.2f s, " +
        f"indexed probe $ixSec%.2f s (${osSec / ixSec}%.1fx; " +
        f"rows=${indexed.length}, equal)")
    }
    // the targeted probe: ONE benchmark doc (the "did this specific
    // eval item leak?" triage query) — its gram count is far below
    // n_buckets, so the partition filter prunes most of the postings
    val one = docs.filter(col("doc_id") === 29L)
    val (oneShot1, os1) = time {
      TextOps.contamination(train, one, n = 8,
        hashFn = Dedup.xxSeeded).collect()
    }
    val (indexed1, ix1) = time {
      TextOps.contaminationIndexed(spark, dir, one).collect()
    }
    require(oneShot1.toSeq == indexed1.toSeq, "targeted probe diverged")
    println(f"[gramprof] targeted (1 bench doc): one-shot $os1%.2f s, " +
      f"indexed probe $ix1%.2f s (${os1 / ix1}%.1fx; " +
      f"rows=${indexed1.length}, equal)")
    spark.stop()
  }
}
