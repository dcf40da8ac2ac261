package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scaling checkpoint (round-10 verdict #7): every 100 TB
  * claim so far is argued from plan shape + sf0.1 Prof sweeps; this
  * runs the heaviest batch rows once at BOTH scales in one JVM and
  * reports the measured scaling exponent per row
  * (log10(t_sf1 / t_sf01), since the corpus grows exactly 10×) —
  * linear screens should land ≈1.0 (plus fixed-cost dilution below
  * it), the banding families at their measured candidate exponents,
  * and anything > 1.3 is a plan-audit flag.
  *
  * The sf1 fixture is SYNTHESIZED for profiling only (never for
  * correctness — oracles keep running on the driver's parquet): ten
  * copies of the sf0.1 documents with each copy's tokens prefixed by
  * a copy tag (copy 0 unprefixed). Disjoint vocabularies mean no
  * artificial cross-copy near-dups or shared n-grams: per-document
  * structure (dup density, quality signals, within-copy sharing) is
  * EXACTLY sf0.1's, corpus-level dims and joins grow 10× — the clean
  * null model for an engine-scaling exponent. Embeddings are id-
  * shifted copies (vector duplication doesn't change scan/ADC cost).
  */
object Scale1Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")

    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until 10).map { k =>
        val tagged =
          if (k == 0) docs
          else docs.withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(lit(s"c$k"), t)), " "))
        tagged.withColumn("doc_id", col("doc_id") + lit(k * n))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      val m = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until 10).map(k =>
        emb.withColumn("vec_id", col("vec_id") + lit(k * m)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      println(s"[scale1] built $sf1")
    }

    val rows = Seq(
      "doc_substring_dupes", "doc_decontam_normalized",
      "doc_split_leakage", "doc_line_dedup", "doc_cluster_dedup",
      "doc_simhash_clusters", "doc_jaccard_pairs", "doc_bpe_tokens",
      "emb_ivfpq_ann", "doc_phrase_lookup")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[scale1] $name@$dir failed: ${e.getMessage}")
          -1.0
      }
    }
    // one JIT warmup on the small scale so sf0.1 cold-start doesn't
    // deflate the measured ratio
    rows.foreach(time(_, sf01))
    rows.foreach { name =>
      val t01 = time(name, sf01)
      val t1 = time(name, sf1)
      val exp =
        if (t01 > 0 && t1 > 0) math.log10(t1 / t01) else Double.NaN
      println(f"[scale1] $name%-24s sf0.1=$t01%7.2f s  sf1=$t1%8.2f s" +
        f"  ratio=${t1 / t01}%6.2f  exponent=$exp%5.2f")
    }
    spark.stop()
  }
}
