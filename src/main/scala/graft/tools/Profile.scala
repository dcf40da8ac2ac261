package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

/** Scratch profiler for operator stage timing (not part of the
  * library surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, d)
    time("shingles only") {
      docs.select(col("doc_id"),
        Dedup.shingles(col("text"), 3).as("sh")).count()
    }
    time("minhash sig") {
      docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 16, 3).as("sig")).count()
    }
    val banded = docs
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 16, 3).as("sig"))
      .select(col("doc_id"), explode(array((0 until 4).map { b =>
        xxhash64(lit(b), slice(col("sig"), b * 4 + 1, 4))
      }: _*)).as("band_key"))
    time("banded") { banded.count() }
    time("candidate pairs") {
      banded.alias("a").join(banded.alias("b"),
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).count()
    }
    time("full minhashNearDups") {
      Dedup.minhashNearDups(docs, threshold = 0.3).count()
    }
    spark.stop()
  }
}
