package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Candidate-volume + wall-time comparison of the two durable
  * matryoshka serving paths (round-11 verdict #1's measurement leg):
  * the FLAT stored-prefix probe scans every corpus prefix per query
  * batch (O(n·q) coarse candidates); the IVF-PRUNED layout scans only
  * each query's nprobe of nlist prefix lists. Prints corpus size,
  * coarse-candidate rows of both paths, the candidate ratio, and
  * min-of-5 probe wall seconds. Recall cross-check: the pruned
  * top-k vs the flat top-k (the funnel's own recall dial — the
  * oracle already replays the pruning exactly, this row prices it).
  */
object PrefixIvfProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = args.filterNot(_ == "clustered").headOption
      .getOrElse("/root/testdata/sf0.1")

    // `clustered` mode (round-12 verdict #2's dial-pricing leg): the
    // pruned matryoshka funnel's recall on the CLUSTERED fixture is
    // bounded by `cand` against the cluster size — within a tight
    // cluster every member's PREFIX cosine is nearly equal (the
    // shared center dominates the first 16 dims), so the coarse cut
    // keeps a near-arbitrary `cand` of ~n/8 cluster members and the
    // full-dim rerank can only recover what the cut kept. This sweeps
    // cand (and nprobe) and prints recall@10 vs exact brute force —
    // the table that tells a deployment how to size cand relative to
    // its cluster mass (noise-regime rows are blind to this: there
    // the coarse ranking is informative and cand=50 suffices).
    if (args.contains("clustered")) {
      val ce = graft.SparkEntry.clusteredEmbeddings(spark, d)
        .localCheckpoint()
      val qids = Seq(0L, 1L, 2L)
      val queries = ce.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
      val tmp = java.nio.file.Files
        .createTempDirectory("pivf-clustered").toString
      Similarity.writePrefixIvfIndex(ce, tmp, prefixDim = 16, nlist = 16)
      val exact = Similarity.bruteForceTopK(ce, qids)
      for (nprobe <- Seq(4, 8, 16); cand <- Seq(50, 100, 200, 400)) {
        val rec = Similarity.recallAtK(
          Similarity.prefixIvfSearchIndexed(spark, tmp, queries,
            nprobe = nprobe, cand = cand), exact)
          .agg(avg(col("recall"))).head().getDouble(0)
        println(f"[pivfprof-clustered] nprobe=$nprobe%2d cand=$cand%3d " +
          f"recall@10=$rec%.3f")
      }
      spark.stop()
      return
    }
    val runs = 5
    val emb = graft.sources.Tables.embeddings(spark, d)
    val n = emb.count()
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toSeq.sortBy(_._1)
    val flatDir = Similarity.ensurePrefixIndex(spark,
      s"$d/embeddings.parquet", emb, prefixDim = 16)
    val ivfDir = Similarity.ensurePrefixIvfIndex(spark,
      s"$d/embeddings.parquet", emb, prefixDim = 16, nlist = 16)

    // coarse-candidate volume: rows entering each probe's coarse
    // cosine (flat: every corpus row per query; pruned: rows of the
    // probed lists per query)
    val flatCands = n * queries.size
    val root = graft.operators.IndexGen.root(spark, ivfDir)
    val cents = spark.read.parquet(s"$root/centroids")
      .orderBy(col("cid")).select(col("centroid"))
      .collect().map(_.getSeq[Double](0).toArray)
    val listSizes = spark.read.parquet(s"$root/prefix")
      .groupBy(col("cid")).count()
      .as[(Int, Long)].collect().toMap
    val prunedCands = queries.map { case (_, v) =>
      cents.zipWithIndex.map { case (c, i) =>
        var dd = 0.0; var j = 0
        while (j < 16) { val dl = v(j).toDouble - c(j); dd += dl * dl; j += 1 }
        (dd, i)
      }.sortBy(identity).take(4).map(p => listSizes.getOrElse(p._2, 0L)).sum
    }.sum

    def minOf(f: => Unit): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val tFlat = minOf(Similarity.prefixSearchIndexed(spark, flatDir,
      queries, cand = 50).write.format("noop").mode("overwrite").save())
    val tIvf = minOf(Similarity.prefixIvfSearchIndexed(spark, ivfDir,
      queries, nprobe = 4, cand = 50)
      .write.format("noop").mode("overwrite").save())
    val flat = Similarity.prefixSearchIndexed(spark, flatDir, queries,
      cand = 50).select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val pruned = Similarity.prefixIvfSearchIndexed(spark, ivfDir,
      queries, nprobe = 4, cand = 50).select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = pruned.intersect(flat).size.toDouble / flat.size
    println(f"[pivfprof] corpus=$n queries=${queries.size} " +
      f"flat_cands=$flatCands pruned_cands=$prunedCands " +
      f"ratio=${flatCands.toDouble / prunedCands}%.1fx " +
      f"flat_s=$tFlat%.2f ivf_s=$tIvf%.2f recall_vs_flat=$recall%.2f")
    spark.stop()
  }
}
