package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Connected-components decomposition instrument (round-13
  * optimization): splits the cluster rows' cost into the pair stage
  * (banding + Hamming verify) and the CC loop (propagate + jump +
  * convergence check per round), with Spark job counts per phase —
  * the loop's per-round actions are the suspected scheduler-bound
  * term at bench SF. min-of-3 after a warm pass, noop sink.
  * Usage: `runMain graft.tools.CcProf [sfDir]`
  */
object CcProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    def phase(name: String)(f: => Unit): Unit = {
      f // warm
      val t = (1 to 3).map { _ =>
        val j0 = jobs.get(); val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9 -> (jobs.get() - j0)
      }
      val best = t.minBy(_._1)
      println(f"[ccprof] $name%-28s min3=${best._1}%7.3f s  jobs=${best._2}")
    }

    val docs = Tables.documents(spark, d)
    phase("sketch (simhashPortable)") {
      Dedup.simhashPortable(docs)
        .write.format("noop").mode("overwrite").save()
    }
    phase("pairs (banded+verify)") {
      Dedup.bandedHammingPairs(
        Dedup.simhashPortable(docs).select(col("doc_id"), col("simhash")),
        "simhash", 3, 4, 60)
        .write.format("noop").mode("overwrite").save()
    }
    phase("membership (pairs+CC)") {
      Dedup.simhashClustersRaw(docs)
        .write.format("noop").mode("overwrite").save()
    }
    // how many propagate+jump rounds does the loop take? (min maxIter
    // that converges — the loop throws when the cap is hit)
    locally {
      val pairs = Dedup.bandedHammingPairs(
        Dedup.simhashPortable(docs).select(col("doc_id"), col("simhash")),
        "simhash", 3, 4, 60)
      var it = 1
      var done = false
      while (!done && it <= 12) {
        try {
          Dedup.clusterMembershipRaw(pairs, maxIter = it)
            .write.format("noop").mode("overwrite").save()
          done = true
        } catch { case _: IllegalStateException => it += 1 }
      }
      println(s"[ccprof] rounds to converge = $it")
    }
    phase("doc_cluster_dedup (full row)") {
      Dedup.dedupByClusters(docs, Dedup.simhashClustersRaw(docs))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
