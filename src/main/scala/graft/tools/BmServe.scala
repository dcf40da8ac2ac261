package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

object BmServe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    val idx = TextOps.ensureBm25Index(spark, s"$d/documents.parquet", docs)
    println(s"[bmserve] idx=$idx")
    val qs = docs.select($"doc_id", $"text").as[(Long, String)]
      .limit(512).collect()
    // serve-only loop: the real per-batch unit (one execution + write)
    val tAll = System.nanoTime()
    for (b <- 0 until 4) {
      val batch = qs.slice(b * 128, (b + 1) * 128).toSeq
        .toDF("query_id", "text")
      val t0 = System.nanoTime()
      TextOps.serveBm25Batch(spark, idx, batch, b.toLong,
        "/tmp/bmserve-out")
      println(f"[bmserve] batch $b: serve ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    println(f"[bmserve] 512 q / ${(System.nanoTime()-tAll)/1e9}%.2f s total")
    spark.stop()
  }
}
