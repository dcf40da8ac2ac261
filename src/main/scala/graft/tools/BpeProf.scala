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

    // `fidelity` mode (round-12 verdict #6): QUANTIFY the batched
    // trainer's cross-iteration approximation against sequential BPE
    // on the real sf0.1 documents. Sequential recounts after every
    // merge; batched (m=64) defers pairs created inside a batch to
    // the next count. Within-iteration equivalence is proven
    // (BpeSpec); this measures what the deferral costs ACROSS
    // iterations: (a) merge-TABLE agreement — the rule SETS compared
    // at equal merge count, plus the order-sensitive common prefix;
    // (b) the tokenization delta — per-doc subword counts under each
    // trained vocab, mean/max relative delta and the corpus total.
    // Sequential is affordable once at a few hundred merges; the
    // agreement trend across M = 64/128/256 is the honest
    // extrapolation basis for the 1k+ production counts.
    // `fidelity zipf` (r13): the sf0.1 fixture's massive pair-count
    // TIE plateaus make rule-set agreement fixture-adversarial (the
    // r12 caveat) — this re-runs the same measurement on a
    // smooth-Zipf corpus: 5000-word vocabulary, rank spelled in
    // letters (alphabet a–p + the 'z' prefix), frequencies ∝ the
    // same Zipf-ish band as `body`, so pair counts are GRADED like
    // natural text instead of tied, and the vocabulary supports far
    // deeper merge chains before saturation.
    if (args.contains("fidelity")) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")
      def alpha(r: Long): String = {
        var v = r; val sb = new StringBuilder("z")
        do { sb.append(('a' + (v % 16)).toChar); v /= 16 } while (v > 0)
        sb.toString
      }
      val zipf = args.contains("zipf")
      val docs =
        (if (zipf)
          spark.range(8000L).map { i =>
            (i, (0 until 40).map { j =>
              val x = i * 53 + j
              val r = (x ^ (x >>> 7)) % (1L + (x % 97) * (x % 89))
              alpha(r % 5000)
            }.mkString(" "))
          }.toDF("doc_id", "text")
        else graft.sources.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))).localCheckpoint()
      def docCounts(vocab: org.apache.spark.sql.DataFrame) = {
        val segLen = vocab.select(col("w"),
          size(col("toks")).cast("long").as("n_sub"))
        docs.select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .join(broadcast(segLen), Seq("w"))
          .groupBy(col("doc_id")).agg(sum(col("n_sub")).as("n_sub"))
      }
      // (M, batchTopM): M=64 sits BELOW the fixture's merge
      // saturation (the synthetic corpus runs dry at ~89 productive
      // merges — real text supports 10⁴⁺), so the m-sweep at fixed
      // M=64 isolates the approximation as a function of batch
      // fraction m/M (m=64 = every merge picked from ONE count, the
      // worst case; m=8 recounts 8×). M=128/256 document the
      // SATURATED fixed point, where both trainers converge to the
      // identical fully-merged vocab.
      (if (zipf) Seq((64, 8), (64, 64), (256, 64))
       else Seq((64, 8), (64, 16), (64, 32), (64, 64), (128, 64),
         (256, 64))).foreach { case (m, topM) =>
        val t0 = System.nanoTime()
        val (seqR, seqV) = TextOps.trainBpeState(docs, m)
        val tSeq = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (batR, batV) = TextOps.trainBpeBatchedState(docs, m, topM)
        val tBat = (System.nanoTime() - t1) / 1e9
        val sPairs = seqR.map(r => (r._2, r._3))
        val bPairs = batR.map(r => (r._2, r._3))
        val agree = (sPairs.toSet & bPairs.toSet).size
        val prefix = sPairs.zip(bPairs).takeWhile(p => p._1 == p._2).size
        val joined = docCounts(seqV).withColumnRenamed("n_sub", "ns")
          .join(docCounts(batV).withColumnRenamed("n_sub", "nb"), Seq("doc_id"))
          .select(col("ns"), col("nb"),
            (abs(col("ns") - col("nb")).cast("double") / col("ns"))
              .as("rel"))
          .agg(sum(col("ns")).as("tot_seq"), sum(col("nb")).as("tot_bat"),
            avg(col("rel")).as("mean_rel"), max(col("rel")).as("max_rel"))
          .collect()(0)
        seqV.unpersist(); batV.unpersist()
        println(f"[bpeprof-fid] M=$m%4d m=$topM%2d  rule_set_agree=$agree%4d/" +
          f"${sPairs.size}%d (${100.0 * agree / sPairs.size}%.1f%%)  " +
          f"order_prefix=$prefix%4d  tokens_seq=${joined.getLong(0)}%d  " +
          f"tokens_bat=${joined.getLong(1)}%d  " +
          f"doc_delta_mean=${100 * joined.getDouble(2)}%.3f%%  " +
          f"doc_delta_max=${100 * joined.getDouble(3)}%.3f%%  " +
          f"t_seq=$tSeq%.1f s  t_bat=$tBat%.1f s")
        ()
      }
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
