package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Candidate-volume sweep for the embedding near-dup GeometryLadder
  * (round-5 verdict #1): on worst-case (fully random Gaussian)
  * corpora the fixed round-5 geometry (36 planes, 6 bands, 6-bit
  * band keys = 64 buckets) generates ~bands·n²/128 candidate pairs —
  * flatly quadratic — while the corpus-size-selected ladder rung
  * holds bucket occupancy ≈ constant, so measured candidates grow
  * sub-quadratically (model O(n^1.22): bands·n·occ/2 per rung, bands
  * ≈ n^0.22 across rungs). Prints both columns per corpus size plus
  * the step-growth ratio; the table lands in SCALE.md.
  */
object NearDupProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rng = new scala.util.Random(41)
    // distributed deterministic Gaussian corpus: per-row seeded RNG so
    // the 10⁶-vector rungs never materialize on the driver
    def corpus(n: Int) = spark.range(n.toLong)
      .map { i =>
        val r = new scala.util.Random(41L * 1000003L + i)
        (i, Array.fill(64)(r.nextGaussian().toFloat))
      }
      .toDF("vec_id", "embedding")
    // skewed-corpus sweep (round-8 verdict #4): clustered real
    // embeddings break the ladder's near-uniform occupancy model — a
    // mega-cluster concentrates its members into one bucket per band,
    // and that bucket is both a candidate blow-up (k²/2 pairs) and ONE
    // skewed shuffle partition. The sweep plants a 20% mega-cluster,
    // measures candidates capless vs maxBandDf=64 (16× the ladder's
    // ~4-row design occupancy), prints the occupancy accounting row
    // (hotBandStats), and scores planted SPREAD-pair recall under the
    // cap — the claim being: volume collapses to ~the uniform column,
    // rare-pair recall holds at the rung model. SPARK_GRAFT_PROF=skew
    // runs only this section.
    val skewOnly = sys.env.get("SPARK_GRAFT_PROF").contains("skew")
    println("[neardupprof] skew sweep: 20% mega-cluster, cap=64")
    val megaBase = {
      val r = new scala.util.Random(99)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    def skewed(n: Int) = spark.range(n.toLong)
      .map { i =>
        val r = new scala.util.Random(99L * 1000003L + i)
        val v =
          if (i % 5 == 0) megaBase.map(x => x + r.nextGaussian().toFloat * 0.005f)
          else if (i % 50 == 1)
            // planted spread clone of the NEXT row (i+1 is ≡2 mod 5 and
            // ≡2 mod 50 — a plain random row, so the pair (i, i+1) is a
            // true spread near-dup): α=0.25 → cos ≈ 0.97
            {
              val rp = new scala.util.Random(99L * 1000003L + (i + 1))
              val base = Array.fill(64)(rp.nextGaussian().toFloat)
              base.map(x => (x + 0.25f * r.nextGaussian().toFloat))
            }
          else Array.fill(64)(r.nextGaussian().toFloat)
        (i, v)
      }
      .toDF("vec_id", "embedding")
    for (n <- Seq(4000, 16000, 64000)) {
      val c = skewed(n).localCheckpoint()
      val (planes, bands) = Similarity.nearDupGeometry(n.toLong)
      val cap = 64
      val occ = Similarity.hotBandStats(c, planes, bands, cap).collect()(0)
      val t0 = System.nanoTime()
      val capped = Similarity.nearDupCandidateCount(c, planes, bands, cap)
      val tCap = (System.nanoTime() - t0) / 1e9
      val capless =
        if (n <= 16000) {
          val t1 = System.nanoTime()
          val x = Similarity.nearDupCandidateCount(c, planes, bands)
          f"capless=$x%10d (${(System.nanoTime() - t1) / 1e9}%5.1f s)"
        } else "capless=(skipped: quadratic in the mega-cluster)"
      val rec = Similarity.nearDupPairRecall(c,
        org.apache.spark.sql.functions.col("vec_id") % 50 === 1 &&
          org.apache.spark.sql.functions.col("vec_id") % 5 =!= 0,
        minCos = 0.9, planes = planes, bands = bands, maxBandDf = cap)
        .collect()(0)
      println(f"[neardupprof] skew n=$n%6d geo=($planes%4d,$bands%2d) " +
        f"capped=$capped%9d ($tCap%5.1f s) $capless " +
        f"hot_buckets=${occ.getAs[Long]("hot_buckets")}%4d " +
        f"rows_in_hot=${occ.getAs[Long]("rows_in_hot_buckets")}%8d " +
        f"max_df=${occ.getAs[Long]("max_df")}%6d " +
        f"spread_recall=${rec.getAs[Double]("recall")}%.4f " +
        f"(${rec.getAs[Long]("hits")}/${rec.getAs[Long]("expected")})")
      c.unpersist()
    }
    if (skewOnly) { spark.stop(); return }

    // the fixed-geometry comparison column is flatly quadratic
    // (model bands·n²/2^(r+1) = 6·n²/128) — countable to 16k vectors,
    // prohibitive past it; the ladder column runs the full sweep to
    // 2^20 vectors (round-6 verdict #2: show the O(n^1.22) trend past
    // the former 2.6×10⁵ ceiling, through the r=18 rung). Step growth
    // at constant occupancy should track 4^1.22 ≈ 5.4× per 4× n.
    println("[neardupprof] n, (planes,bands) auto, cand_auto, growth, " +
      "cand_fixed(36,6), growth_fixed  [model step 4^1.22=5.4x]")
    var prevAuto = 0L
    var prevFixed = 0L
    for (n <- Seq(250, 1000, 4000, 16000, 64000, 256000, 1024000)) {
      val c = corpus(n).localCheckpoint()
      val (planes, bands) = Similarity.nearDupGeometry(n.toLong)
      val t0 = System.nanoTime()
      val auto = Similarity.nearDupCandidateCount(c, planes, bands)
      val tAuto = (System.nanoTime() - t0) / 1e9
      val (fixedTxt, gF) =
        if (n <= 16000) {
          val t1 = System.nanoTime()
          val fixed = Similarity.nearDupCandidateCount(c, 36, 6)
          val tFixed = (System.nanoTime() - t1) / 1e9
          val g = if (prevFixed > 0) f"${fixed.toDouble / prevFixed}%.1fx"
            else "-"
          prevFixed = fixed
          (f"fixed=$fixed%10d ($g%6s, $tFixed%5.1f s)", g)
        } else ("fixed=(skipped: quadratic)", "-")
      val gA = if (prevAuto > 0) f"${auto.toDouble / prevAuto}%.1fx" else "-"
      println(f"[neardupprof] n=$n%7d geo=($planes%4d,$bands%2d) " +
        f"auto=$auto%10d ($gA%6s, $tAuto%6.1f s) " + fixedTxt)
      prevAuto = auto
      c.unpersist()
    }

    // recall dial: measured pair recall (vs in-query brute force) per
    // ladder rung × planted clone tightness — the planes × bands ×
    // minCos tuning table for SCALE.md. Clone = x + α·next(x): for
    // near-orthogonal Gaussian vectors cos ≈ 1/sqrt(1 + α²).
    println("[neardupprof] recall dial: rows = geometry, cols = (α, minCos)")
    // the four upper ladder rungs (r = 16..22) are included so the
    // measured recall of the EXTENDED ladder is on record, not just
    // the model's ≥0.95 claim (the planted corpus is small, but the
    // per-pair find probability depends only on (r, bands), not n)
    for ((planes, bands) <- Seq((36, 6), (72, 9), (130, 13), (560, 35),
        (864, 48), (1300, 65), (1980, 90))) {
      val cells = for ((alpha, minCos) <- Seq((0.25, 0.95), (0.41, 0.90),
          (0.55, 0.85))) yield {
        val base = (0 until 2000).map { i =>
          (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))
        }
        val clones = base.grouped(4).map(_.head).map { case (id, v) =>
          val nxt = base(((id + 1) % 2000).toInt)._2
          (id + 100000L,
            v.zip(nxt).map { case (a, b) => (a + alpha * b).toFloat })
        }.toSeq
        val corpus = (base ++ clones).toDF("vec_id", "embedding")
          .localCheckpoint()
        val row = Similarity.nearDupPairRecall(corpus,
          org.apache.spark.sql.functions.col("vec_id") >= 100000L,
          minCos = minCos, planes = planes, bands = bands).collect()(0)
        corpus.unpersist()
        f"α=$alpha%.2f cos≥$minCos%.2f: ${row.getAs[Double]("recall")}%.4f" +
          f" (${row.getAs[Long]("hits")}/${row.getAs[Long]("expected")})"
      }
      println(f"[neardupprof] geo=($planes%3d,$bands%2d)  " +
        cells.mkString("  "))
    }

    // sketch dial: bands × radius for the 64-bit banded-Hamming
    // blocker. Recall is 1.0 BY PIGEONHOLE whenever radius < bands;
    // the measured column is the CANDIDATE volume (the band-collision
    // join before Hamming verification) on n random sketches — the
    // cost of buying a larger radius with more bands: halving band
    // width squares the collision rate
    import org.apache.spark.sql.functions._
    println("[neardupprof] sketch dial: 64-bit sketches, n=20000 random")
    val sk = (0L until 20000L).map(i => (i, rng.nextLong()))
      .toDF("doc_id", "sk").localCheckpoint()
    for ((bands, radius) <- Seq((4, 3), (8, 7), (16, 15))) {
      val bandBits = 64 / bands
      val mask = if (bandBits == 64) lit(-1L) else lit((1L << bandBits) - 1)
      val banded = sk.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sk"), b * bandBits).bitwiseAND(mask).as("bv"))
        }: _*)).as("e"))
        .select(col("doc_id"), col("e.band").as("band"), col("e.bv").as("bv"))
      val t0 = System.nanoTime()
      val cand = banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).dropDuplicates().count()
      println(f"[neardupprof] bands=$bands%2d bits/band=$bandBits%2d " +
        f"radius<=$radius%2d: candidates=$cand%10d " +
        f"(model ${bands.toDouble * 20000.0 * 20000.0 / 2 / math.pow(2, bandBits)}%.0f, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
