package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Decomposition of the `doc_curation_novel` capture instability
  * (round-11 verdict #2: builder min-of-5 5.9 s vs driver min-of-3
  * 17.4 s SAME DAY — a 3× swing no other row shows; third round this
  * row swings). The hypothesis under test: the path is a LONG SERIAL
  * CHAIN of eager materializations (stateOf's corpus text layer, the
  * batch chain's b3/cross/mem pins, the pointer-jumping iterations
  * inside minhashClusters, minhashNovel's internals) over a ≤300-doc
  * planted frame — per-job scheduler/disk overhead dominates real
  * work, so ambient jitter multiplies across the chain instead of
  * averaging out within one job.
  *
  * Prints, for each of `runs` repetitions: wall seconds and SPARK JOB
  * COUNT (SparkListener) for (a) stateOf, (b) incrementalStages —
  * the eager-pin phase, (c) the funnel aggregation action, plus the
  * totals. The job count is the instability dial: N serial jobs ×
  * per-job jitter = the swing.
  */
object CurationProf {
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
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "5").toInt

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    // the exact doc_curation_novel input shape (SparkEntry's planted
    // line docs over documents, split 6:1 corpus:batch)
    val docs = graft.sources.Tables.documents(spark, d)
    val pl = docs.filter(col("doc_id") < 300)
      .select(col("doc_id"), col("source"), concat_ws("\n",
        lit("NAV MENU HOME"),
        col("text"),
        concat(lit("(c) site "), col("source")),
        when(col("doc_id") % 3 === 0, lit("subscribe now"))
          .otherwise(concat(lit("u"), col("doc_id").cast("string"))))
        .as("text"))
    val corpus = pl.filter(col("doc_id") % 7 =!= 0)
    val batch = pl.filter(col("doc_id") % 7 === 0)

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[curprof]   $name%-18s ${dt}%7.2f s  ${jobs - j0}%3d jobs")
      r
    }

    (1 to runs).foreach { i =>
      val j0 = jobs
      val t0 = System.nanoTime()
      println(s"[curprof] run $i")
      val st = phase("stateOf")(Curation.stateOf(corpus))
      val stages = phase("incrementalStages")(
        Curation.incrementalStages(batch, st))
      phase("funnel action") {
        Curation.funnelOf(stages)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[curprof]   TOTAL              " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs - j0}%3d jobs")
    }
    spark.stop()
  }
}
