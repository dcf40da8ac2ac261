package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.Tables
import graft.operators.Similarity

object IvfProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d)
    var t0 = System.nanoTime()
    val cents = Similarity.trainCentroids(emb, 16, 3)
    println(f"[ivfprof] train (cold JIT): ${(System.nanoTime() - t0) / 1e9}%.2f s (k=${cents.length})")
    t0 = System.nanoTime()
    Similarity.ivfTopK(emb, Seq(0L, 1L, 2L))
      .write.format("noop").mode("overwrite").save()
    println(f"[ivfprof] full query (train + search, warm JIT): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // nlist sweep across the unrolled→data-driven quantizer switch
    // (UnrollNlistMax): the large-nlist path must neither blow codegen
    // nor change the answer (same nprobe fraction probed)
    for (nlist <- Seq(16, 64, 256, 1024)) {
      val t = System.nanoTime()
      Similarity.ivfTopK(emb, Seq(0L, 1L, 2L), k = 10, nlist = nlist,
        nprobe = math.max(2, nlist / 8), iters = 1)
        .write.format("noop").mode("overwrite").save()
      println(f"[ivfprof] nlist=$nlist%4d nprobe=${math.max(2, nlist / 8)}%3d: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
