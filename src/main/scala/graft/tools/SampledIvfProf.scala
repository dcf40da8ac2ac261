package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** nprobe-compensation sweep for the SAMPLED-TRAINING quantizer
  * (`writeIvfIndexSampled` / `ivfTopK(trainOn = …)`): the r13 recall
  * rows price sampling at the default probe width (nlist=16,
  * nprobe=2 — noise 0.333, clustered 0.867 vs 1.000 full-trained);
  * this measures whether a WIDER probe recovers what sample-training
  * loses — the dial a deployment would actually turn, since probing
  * 2× the lists is far cheaper than 4× the training rows. Prints
  * mean recall@10 for nprobe ∈ {2, 4, 8} × {full-trained,
  * sample-trained(mod 4)} × {noise corpus, clustered fixture}.
  */
object SampledIvfProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qids = Seq(0L, 1L, 2L)

    val noise = graft.sources.Tables.embeddings(spark, d).localCheckpoint()
    val clustered = graft.SparkEntry.clusteredEmbeddings(spark, d)
      .localCheckpoint()

    def meanRecall(emb: DataFrame, nprobe: Int,
                   trainOn: Option[DataFrame]): Double = {
      val approx = Similarity.ivfTopK(emb, qids, nprobe = nprobe,
        trainOn = trainOn)
      val brute = Similarity.bruteForceTopK(emb, qids)
      val r = Similarity.recallAtK(approx, brute)
        .agg(avg(col("recall"))).head().getDouble(0)
      math.round(r * 1000) / 1000.0
    }

    for ((cname, corpus) <- Seq("noise" -> noise, "clustered" -> clustered);
         nprobe <- Seq(2, 4, 8)) {
      val sample = corpus.filter(col("vec_id") % 4 === 0)
      val full = meanRecall(corpus, nprobe, None)
      val sampled = meanRecall(corpus, nprobe, Some(sample))
      println(f"[sampled-ivf] $cname%-9s nprobe=$nprobe%d  " +
        f"full=$full%5.3f  sampled(mod4)=$sampled%5.3f")
    }
    spark.stop()
  }
}
