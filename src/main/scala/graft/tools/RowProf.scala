package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted battery-row timer: min-of-3 (after one warm pass) for the
  * named `SparkEntry.queries` rows at sf0.1 in one JVM — the
  * single-row iteration loop Bench is too heavy for. Usage:
  * `runMain graft.tools.RowProf emb_ivf_ann emb_semdedup ...`
  * (bench-identical noop-sink materialization).
  */
object RowProf {
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("emb_ivf_ann", "emb_semdedup", "emb_near_dups")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      try {
        once(n)
        val t = Seq(once(n), once(n), once(n)).min
        println(f"[rowprof] $n%-32s min3=$t%7.3f s")
      } catch {
        case e: Throwable =>
          println(s"[rowprof] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
