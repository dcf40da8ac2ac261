package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Similarity, TextOps}
import graft.sources.Tables

/** Serving-stack throughput sweep (round-9 verdict #6): measured
  * queries/second of the two durable-index serving streams —
  * [[graft.operators.Similarity.startAnnServing]] (k=5,
  * nprobe ∈ {1, 2, 4}) and [[graft.operators.TextOps.startBm25Serving]]
  * (k=5) — against sf0.1 indexes. Queries arrive as micro-batches
  * through a MemoryStream (the spec harness shape), so the measured
  * figure includes the real per-batch costs a production stream pays:
  * micro-batch planning, the index re-read, and the
  * batch_id-partitioned result write. Methodology mirrors the ingest
  * stream's ev/s figure: total queries / wall-clock from stream start
  * to drain, batches pre-enqueued so trigger idle time is not billed.
  */
object ServeProf {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = java.nio.file.Files.createTempDirectory("serveprof").toString

    // durable indexes, built once (the at-rest state serving reads)
    val annIdx = Similarity.ensureIvfIndex(spark, s"$d/embeddings.parquet",
      Tables.embeddings(spark, d))
    val docs = Tables.documents(spark, d)
    val bmIdx = TextOps.ensureBm25Index(spark, s"$d/documents.parquet", docs)

    // ANN query load: real corpus vectors (every probe hits k real
    // neighbors), Q queries split over B micro-batches
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_PROF_BATCHES", "4").toInt
    val perBatch = sys.env.getOrElse("SPARK_GRAFT_PROF_QPB", "512").toInt
    val annQueries = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .limit(nBatches * perBatch).collect()
    for (nprobe <- Seq(1, 2, 4)) {
      val mem = MemoryStream[(Long, Array[Float])]
      annQueries.grouped(perBatch).foreach(b => mem.addData(b.toSeq))
      val out = s"$tmp/ann-$nprobe/out"
      val t0 = System.nanoTime()
      val q = Similarity.startAnnServing(
        mem.toDF().toDF("vec_id", "embedding"), annIdx, out,
        s"$tmp/ann-$nprobe/ckpt", k = 5, nprobe = nprobe, triggerMs = 1L)
      q.processAllAvailable(); q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val served = spark.read.parquet(out)
        .select($"query_id").distinct().count()
      println(f"[serveprof] ann k=5 nprobe=$nprobe: " +
        f"${annQueries.length} queries / $sec%.2f s = " +
        f"${annQueries.length / sec}%.0f q/s (served=$served, " +
        f"batches=$nBatches)")
    }

    // BM25 query load: real document texts (worst-case long queries —
    // every token of the doc is a query term)
    val bmPerBatch = sys.env.getOrElse("SPARK_GRAFT_PROF_BM_QPB", "128").toInt
    val bmQueries = docs.select($"doc_id", $"text").as[(Long, String)]
      .limit(nBatches * bmPerBatch).collect()
    val mem = MemoryStream[(Long, String)]
    bmQueries.grouped(bmPerBatch).foreach(b => mem.addData(b.toSeq))
    val out = s"$tmp/bm25/out"
    val t0 = System.nanoTime()
    val q = TextOps.startBm25Serving(
      mem.toDF().toDF("query_id", "text"), bmIdx, out,
      s"$tmp/bm25/ckpt", k = 5, triggerMs = 1L)
    q.processAllAvailable(); q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val served = spark.read.parquet(out)
      .select($"query_id").distinct().count()
    println(f"[serveprof] bm25 k=5 (whole-doc queries): " +
      f"${bmQueries.length} queries / $sec%.2f s = " +
      f"${bmQueries.length / sec}%.0f q/s (served=$served, " +
      f"batches=$nBatches)")
    spark.stop()
  }
}
