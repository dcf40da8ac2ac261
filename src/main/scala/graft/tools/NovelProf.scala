package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scaling profile for the incremental near-dup ingest path
  * (`Dedup.minhashNovel`): fixed batch, corpus stepped 4× per row.
  * The claim under test is that corpus growth costs a SCAN, not a
  * shuffle — bloom-pruned survivor rows should track the batch's
  * true neighbors plus the fpp leak (≈ fpp · corpus · bands band
  * rows, linear but tiny at 1%), never the corpus pair space, and
  * wall time should grow ≈ linearly with corpus bytes (the
  * scan-local 16-seed md5 signature pass dominates).
  *
  * Prints per corpus size: bloom-surviving corpus band rows, exact
  * band-collision candidates, verified losers, novel batch docs,
  * and wall time. The table lands in SCALE.md.
  */
object NovelProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic docs: 40-token streams over a shared
    // vocabulary (disjoint strides — unrelated docs share no 3-gram)
    def body(seed: Long): String =
      (0 until 40).map(j => s"w${seed * 41 + j}").mkString(" ")
    def corpus(n: Int) = spark.range(n.toLong)
      .map(i => (i, body(i)))
      .toDF("doc_id", "text")
    // batch of 500: every 5th is a near-clone of a corpus doc
    // (same body + 2-token tail → jaccard ≈ 0.9), the rest fresh
    val batch = spark.range(500)
      .map { i =>
        val t =
          if (i % 5 == 0) body(i * 3) + " tail extra"
          else body(1000000L + i)
        (5000000L + i, t)
      }
      .toDF("doc_id", "text").localCheckpoint()

    println("[novelprof] corpus, survivors(bloom band rows), " +
      "candidates(band join), losers, novel, sec  [batch=500, 100 planted]")
    for (n <- Seq(4000, 16000, 64000, 256000)) {
      val ref = corpus(n).localCheckpoint()
      val t0 = System.nanoTime()
      val novel = Dedup.minhashNovel(batch, ref, threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // instruments: rebuild the prune stages the operator runs
      val sh = array_distinct(Dedup.shingles(col("text"), 3))
      val bk = graft.functions.MinHashBandKeys.minhash_band_keys(sh, 16, 4)
      val batchBand = batch.select(explode(bk).as("bk"))
      val numBits = org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(1L << 16, 0.01)
      val bf = lit(batchBand.agg(
        org.apache.spark.sql.graftshim.BloomShim
          .bloomAgg(col("bk"), 1L << 16, numBits).as("bf"))
        .head().getAs[Array[Byte]](0))
      val refBanded = ref.select(col("doc_id").as("ref_id"),
          explode(bk).as("bk"))
        .filter(org.apache.spark.sql.graftshim.BloomShim
          .mightContain(bf, col("bk")))
        .localCheckpoint()
      val survivors = refBanded.count()
      val cand = refBanded
        .join(batch.select(col("doc_id").as("batch_id"), explode(bk).as("bk")),
          Seq("bk"))
        .select(col("batch_id"), col("ref_id")).distinct().count()
      println(f"[novelprof] n=$n%7d survivors=$survivors%8d " +
        f"cand=$cand%6d losers=${500 - novel}%4d novel=$novel%4d " +
        f"($sec%5.1f s)")
      ref.unpersist()
    }

    // ---- embedding leg (Similarity.embeddingNovel): same claim, the
    // GeometryLadder holds per-band bucket occupancy ≈ constant as the
    // corpus steps 4×, so cross candidates ≈ batch · bands · occupancy
    // — flat-ish in corpus size (bands grows ~n^0.22), never the pair
    // space. Every 5th batch vector is a positive-scaled corpus clone
    // (cosine 1.0 — deterministic candidate), the rest fresh noise.
    import graft.operators.Similarity
    def evec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    def ecorpus(n: Int) = spark.range(n.toLong)
      .map(i => (i, evec(i))).toDF("vec_id", "embedding")
    val ebatch = spark.range(500)
      .map { i =>
        val v = if (i % 5 == 0) evec(i * 3).map(x => x * 2.0f)
                else evec(9000000L + i)
        (5000000L + i, v)
      }
      .toDF("vec_id", "embedding").localCheckpoint()
    println("[novelprof] embedding leg: corpus, rung(r,bands), " +
      "candidates(band join), novel, sec  [batch=500, 100 planted]")
    for (n <- Seq(4000, 16000, 64000)) {
      val ref = ecorpus(n).localCheckpoint()
      val t0 = System.nanoTime()
      val novel = Similarity.embeddingNovel(ebatch, ref, minCos = 0.9).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // instrument: the exact band-collision candidate count at the
      // rung the operator selected
      val (pl, bd) = Similarity.nearDupGeometry(500L + n)
      val r = pl / bd
      def keys(df: org.apache.spark.sql.DataFrame, out: String) =
        Similarity.bandedSignatures(df, pl, bd)
          .select(col("vec_id").as(out),
            (col("band").cast("long") * (1L << r) + col("bv").cast("long"))
              .as("bk"))
      val cand = keys(ref, "ref_id")
        .join(keys(ebatch, "batch_id"), Seq("bk"))
        .select(col("ref_id"), col("batch_id")).distinct().count()
      println(f"[novelprof] n=$n%7d rung=($r%2d,$bd%2d) cand=$cand%6d " +
        f"losers=${500 - novel}%4d novel=$novel%4d ($sec%5.1f s)")
      ref.unpersist()
    }
    spark.stop()
  }
}
