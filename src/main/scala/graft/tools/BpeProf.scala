package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Scaling profile for the BPE trainer (`TextOps.trainBpe`): corpus
  * stepped 4× per row at a Zipf-ish vocabulary (new words enter ~
  * logarithmically, as real text does). The claim under test
  * (SCALE.md #22) is that only the FIRST pass is corpus-bound — the
  * k merge iterations run over the weighted word-vocab dim, so their
  * cost tracks |vocab|, which grows far slower than the corpus.
  *
  * Prints per corpus size: corpus rows, corpus tokens, distinct
  * vocab words (the iteration working set), vocab-pass wall time,
  * and the 8-iteration training wall time.
  */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf-ish synthetic text: token j of doc i indexes a shared
    // vocabulary with frequency ∝ 1/rank (word w_r appears when
    // (i*53+j) % (r+1) lands on 0 band) — distinct words grow with
    // corpus size but sub-linearly, as natural text does
    def body(i: Long): String =
      (0 until 40).map { j =>
        val x = i * 53 + j
        val r = (x ^ (x >>> 7)) % (1L + (x % 97) * (x % 89))
        s"w${r % 5000}"
      }.mkString(" ")

    // `1k` mode (round-11 verdict #6): price training at production
    // merge counts. Sequential trainBpe is 2 driver-sequenced jobs
    // per merge — the per-merge floor × 10⁴–10⁵ real-vocab merges is
    // the claim under test; trainBpeBatched amortizes the jobs over
    // batchTopM independent picks per iteration. Prints sequential
    // per-merge cost (128 merges) and batched wall for 1024 merges
    // at m = 16/64, with Spark job counts — the scheduling-bound
    // dial.
    if (args.contains("1k")) {
      @volatile var jobs = 0
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs += 1
        })
      val docs = spark.range(8000L).map(i => (i, body(i)))
        .toDF("doc_id", "text").localCheckpoint()
      def timed(name: String)(f: => Long): Unit = {
        val j0 = jobs
        val t0 = System.nanoTime()
        val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[bpeprof-1k] $name%-22s $n%5d merges  $dt%8.1f s  " +
          f"${jobs - j0}%5d jobs  ${dt / math.max(1L, n)}%6.3f s/merge")
      }
      timed("sequential m=1")(
        TextOps.trainBpe(docs, merges = 128).count())
      timed("batched m=16")(
        TextOps.trainBpeBatched(docs, merges = 1024,
          batchTopM = 16).count())
      timed("batched m=64")(
        TextOps.trainBpeBatched(docs, merges = 1024,
          batchTopM = 64).count())
      spark.stop()
      return
    }

    println("[bpeprof] corpus_docs, tokens, vocab_words, " +
      "vocab_pass_s, train8_s")
    Seq(2000, 8000, 32000, 128000).foreach { n =>
      val docs = spark.range(n.toLong).map(i => (i, body(i)))
        .toDF("doc_id", "text").localCheckpoint()
      val t0 = System.nanoTime()
      val vocab = TextOps.bpeVocab(docs).localCheckpoint()
      val words = vocab.count()
      val tVocab = (System.nanoTime() - t0) / 1e9
      val toks = docs.select(TextOps.tokenCount(col("text")).as("n"))
        .agg(sum(col("n"))).as[Long].collect()(0)
      vocab.unpersist()
      val t1 = System.nanoTime()
      val merges = TextOps.trainBpe(docs, merges = 8).count()
      val tTrain = (System.nanoTime() - t1) / 1e9
      require(merges == 8L)
      println(f"[bpeprof] $n%d, $toks%d, $words%d, " +
        f"$tVocab%.2f, $tTrain%.2f")
      docs.unpersist()
      ()
    }
    spark.stop()
  }
}
