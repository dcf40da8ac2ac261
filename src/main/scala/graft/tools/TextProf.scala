package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextOps}
import graft.sources.Tables

/** Decomposition instrument for the window-hash text family
  * (round-13 optimization): where do the leakage/decontam/span rows
  * spend — the shingle+hash scan, the per-(doc,split,hash) groupBy,
  * or the join tail? min-of-3 after a warm pass, noop sink.
  * Usage: `runMain graft.tools.TextProf [sfDir]`
  */
object TextProf {
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

    def phase(name: String)(f: => Unit): Unit = {
      f
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[textprof] $name%-36s min3=${t.min}%7.3f s")
    }

    val docs = Tables.documents(spark, d)
    val n = 10
    val split = Sampling.withSplit(docs, "doc_id", 0.05, 0.05)

    phase("tokens only (split+size)") {
      docs.select(col("doc_id"),
        size(split_part_tokens(col("text"))).as("nt"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("shingles (build strings)") {
      docs.select(col("doc_id"),
        Dedup.shingles(col("text"), n).as("gs"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("shingles+explode+md5hash") {
      docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), n)).as("g"))
        .select(col("doc_id"), Dedup.md5Seeded(0, col("g")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("windowhash groupBy (scan+agg)") {
      split.select(col("doc_id"), col("split"),
        Dedup.shingles(col("text"), n).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"), col("split"),
          size(col("gs")).cast("long").as("n_windows"),
          explode(col("gs")).as("g"))
        .select(col("doc_id"), col("split"), col("n_windows"),
          Dedup.md5Seeded(0, col("g")).as("h"))
        .groupBy(col("doc_id"), col("split"), col("h"))
        .agg(count(lit(1)).as("c"), min(col("n_windows")).as("n_windows"))
        .write.format("noop").mode("overwrite").save()
    }
    phase("doc_split_leakage (full row)") {
      TextOps.splitLeakage(docs, n = 10, valFrac = 0.05,
        testFrac = 0.05, hashFn = Dedup.md5Seeded)
        .write.format("noop").mode("overwrite").save()
    }
    phase("doc_substring_dupes (full row)") {
      TextOps.duplicateSpans(docs, n = 10, hashFn = Dedup.md5Seeded)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }

  private def split_part_tokens(text: org.apache.spark.sql.Column) =
    split(trim(text), "\\s+")
}
