package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Unrolled-vs-native assignment cost at SMALL k (the battery's
  * regime, k ≤ UnrollNlistMax = 64): decides whether the unrolled
  * per-centroid expression tree keeps its below-the-ceiling seat or
  * the native [[graft.functions.CentroidSqDists]] expression should
  * take over everywhere. Times `array_min(centroidDistArray(...))`
  * scans (min of 3 after a warm pass) over a replicated corpus at
  * k ∈ {8, 16, 64}; both forms are bit-identical by spec, so this is
  * purely a cost race.
  */
object AssignProf {
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
    // 100x the 2k-row table -> 200k rows, enough to see per-row cost
    val base = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val emb = (0 until 100).map(k => base.withColumn("vec_id",
        col("vec_id") + lit(k * 1000000L)))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rng = new scala.util.Random(7)
    for (k <- Seq(8, 16, 64)) {
      val cents = Array.fill(k)(Array.fill(dim)(rng.nextGaussian()))
      def run(unrolled: Boolean): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          emb.select(array_min(Similarity.centroidDistArray(
              col("embedding"), cents, unrolled)).getField("cid").as("cid"))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once(); Seq(once(), once(), once()).min
      }
      val tu = run(unrolled = true)
      val tn = run(unrolled = false)
      println(f"[assign-prof] n=$n k=$k%-3d unrolled=$tu%6.2f s  " +
        f"native=$tn%6.2f s  ratio=${tu / tn}%5.2f")
    }
    spark.stop()
  }
}
