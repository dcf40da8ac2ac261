package graft.tools
import org.apache.spark.sql.SparkSession
import graft.sources.Tables
import graft.operators.Similarity

/** Converging-capture probe for the emb_ivfpq_ann drift audit
  * (round-10 verdict #2): the exact bench row (ivfPqTopK, default
  * params, queries 0/1/2) run N times in one JVM with per-run and
  * min timings, plus a breakdown run separating the two training
  * chains (coarse Lloyd + PQ books) from the probe itself.
  */
object IvfPqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "5").toInt
    val times = (1 to runs).map { i =>
      val emb = Tables.embeddings(spark, d)
      val t0 = System.nanoTime()
      Similarity.ivfPqTopK(emb, Seq(0L, 1L, 2L))
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpqprof] run $i: $s%.2f s")
      s
    }
    println(f"[ivfpqprof] min=${times.min}%.2f s over $runs runs")
    // breakdown: training chains vs probe (pinned once, like the row)
    val emb = Tables.embeddings(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    var t = System.nanoTime()
    val cents = Similarity.trainCentroids(emb, 16, 3)
    println(f"[ivfpqprof] coarse train (16x3): ${(System.nanoTime()-t)/1e9}%.2f s (k=${cents.length})")
    t = System.nanoTime()
    val books = Similarity.pqCodebooks(emb, 4, 16, 2)
    println(f"[ivfpqprof] pq books (4x16x2): ${(System.nanoTime()-t)/1e9}%.2f s (m=${books.length})")
    t = System.nanoTime()
    Similarity.ivfPqTopK(emb, Seq(0L, 1L, 2L))
      .write.format("noop").mode("overwrite").save()
    println(f"[ivfpqprof] full row over PINNED corpus: ${(System.nanoTime()-t)/1e9}%.2f s")
    emb.unpersist()
    spark.stop()
  }
}
