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

    // `lat` mode (round-11 verdict #7): per-probe LATENCY
    // PERCENTILES and a concurrent-client capture — a serving claim
    // needs p50/p99, not just throughput. Single-query probes against
    // the one cached index (the request-path shape), k=5 nprobe=2;
    // then 2 and 4 client threads loop the same query set against the
    // SAME index concurrently, and every concurrent result must be
    // BIT-IDENTICAL to the sequential baseline (the IndexCache /
    // IndexGen reader contract under concurrency).
    if (args.contains("lat")) {
      val qs = Tables.embeddings(spark, d)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        .limit(64).collect().toSeq
      def probe(q: (Long, Array[Float])): (Double, Seq[String]) = {
        val t0 = System.nanoTime()
        val rows = Similarity.ivfSearchIndexed(spark, annIdx, Seq(q),
            k = 5, nprobe = 2)
          .collect().map(_.toString).toSeq
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      def pct(lats: Seq[Double], p: Double): Double = {
        val s = lats.sorted
        s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1).max(0))
      }
      def report(name: String, lats: Seq[Double]): Unit =
        println(f"[serveprof-lat] $name: n=${lats.size} " +
          f"p50=${pct(lats, 0.50) * 1000}%.0f ms " +
          f"p90=${pct(lats, 0.90) * 1000}%.0f ms " +
          f"p99=${pct(lats, 0.99) * 1000}%.0f ms " +
          f"min=${lats.min * 1000}%.0f ms max=${lats.max * 1000}%.0f ms")
      probe(qs.head) // warm: JIT + index cache load
      // sequential baseline: 3 passes over the query set; the result
      // map is the bit-identity reference for the concurrent clients
      val baseline = qs.map(q => q._1 -> probe(q)._2).toMap
      val seqLats = (1 to 2).flatMap(_ => qs.map(q => probe(q)._1))
      report("ann seq 1-client", seqLats)
      for (clients <- Seq(2, 4)) {
        val lats = java.util.Collections.synchronizedList(
          new java.util.ArrayList[Double]())
        @volatile var mismatch: Option[Long] = None
        val threads = (0 until clients).map { t =>
          new Thread(() => {
            qs.foreach { q =>
              val (lat, rows) = probe(q)
              lats.add(lat)
              if (rows != baseline(q._1)) mismatch = Some(q._1)
            }
          })
        }
        val t0 = System.nanoTime()
        threads.foreach(_.start()); threads.foreach(_.join())
        val wall = (System.nanoTime() - t0) / 1e9
        require(mismatch.isEmpty,
          s"concurrent probe diverged from sequential on query " +
            s"${mismatch.get}")
        import scala.jdk.CollectionConverters._
        report(f"ann $clients-client (bit-identical, " +
          f"${clients * qs.size / wall}%.1f q/s aggregate)",
          lats.asScala.toSeq)
      }
      // BM25 single-probe percentiles (whole-doc worst-case queries)
      val bq = docs.select($"doc_id", $"text").as[(Long, String)]
        .limit(32).collect().toSeq
      def bmProbe(q: (Long, String)): Double = {
        val t0 = System.nanoTime()
        TextOps.bm25SearchIndexed(spark, bmIdx,
          Seq(q).toDF("query_id", "text"), k = 5).collect()
        (System.nanoTime() - t0) / 1e9
      }
      bmProbe(bq.head)
      report("bm25 seq 1-client", bq.map(bmProbe))
      spark.stop()
      return
    }

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

    // matryoshka serving leg: the same query load through the
    // pruned-prefix coarse pass + full-dim rerank
    // (startPrefixIvfServing), beside the dense-IVF q/s above
    val pivfIdx = Similarity.ensurePrefixIvfIndex(spark,
      s"$d/embeddings.parquet", Tables.embeddings(spark, d),
      prefixDim = 16, nlist = 16)
    locally {
      val mem = MemoryStream[(Long, Array[Float])]
      annQueries.grouped(perBatch).foreach(b => mem.addData(b.toSeq))
      val out = s"$tmp/pivf/out"
      val t0 = System.nanoTime()
      val q = Similarity.startPrefixIvfServing(
        mem.toDF().toDF("vec_id", "embedding"), pivfIdx, out,
        s"$tmp/pivf/ckpt", k = 5, nprobe = 4, cand = 50,
        triggerMs = 1L)
      q.processAllAvailable(); q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val served = spark.read.parquet(out)
        .select($"query_id").distinct().count()
      println(f"[serveprof] prefix-ivf k=5 nprobe=4 cand=50: " +
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
