package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Candidate-volume sweep for the embedding near-dup GeometryLadder
  * (round-5 verdict #1): on worst-case (fully random Gaussian)
  * corpora the fixed round-5 geometry (36 planes, 6 bands, 6-bit
  * band keys = 64 buckets) generates ~bands·n²/128 candidate pairs —
  * flatly quadratic — while the corpus-size-selected ladder rung
  * holds bucket occupancy ≈ constant, so measured candidates grow
  * sub-quadratically (model O(n^1.22): bands·n·occ/2 per rung, bands
  * ≈ n^0.22 across rungs). Prints both columns per corpus size plus
  * the step-growth ratio; the table lands in SCALE.md.
  */
object NearDupProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rng = new scala.util.Random(41)
    def corpus(n: Int) = (0L until n.toLong)
      .map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    println("[neardupprof] n, (planes,bands) auto, cand_auto, growth, " +
      "cand_fixed(36,6), growth_fixed")
    var prevAuto = 0L
    var prevFixed = 0L
    for (n <- Seq(250, 1000, 4000, 16000)) {
      val c = corpus(n).localCheckpoint()
      val (planes, bands) = Similarity.nearDupGeometry(n.toLong)
      val t0 = System.nanoTime()
      val auto = Similarity.nearDupCandidateCount(c, planes, bands)
      val tAuto = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val fixed = Similarity.nearDupCandidateCount(c, 36, 6)
      val tFixed = (System.nanoTime() - t1) / 1e9
      val gA = if (prevAuto > 0) f"${auto.toDouble / prevAuto}%.1fx" else "-"
      val gF = if (prevFixed > 0) f"${fixed.toDouble / prevFixed}%.1fx" else "-"
      println(f"[neardupprof] n=$n%6d geo=($planes%3d,$bands%2d) " +
        f"auto=$auto%10d ($gA%6s, $tAuto%5.1f s) " +
        f"fixed=$fixed%10d ($gF%6s, $tFixed%5.1f s)")
      prevAuto = auto; prevFixed = fixed
      c.unpersist()
    }
    spark.stop()
  }
}
