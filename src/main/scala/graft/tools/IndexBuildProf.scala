package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextOps}

/** BUILD-cost table for every durable index (round-12 verdict #7):
  * the sf1 tail audit showed single-run `ensure*` builds dominating
  * several indexed rows (exponents 1.10–1.24 were BUILDS, not
  * probes), but build cost had no first-class table — each index
  * priced only its amortized probe. This measures each `write*Index`
  * rebuild at sf0.1 and the synthesized sf1 fixture (Scale1Prof's
  * 10× corpus — run Scale1Prof once first, or this builds it) and
  * reports wall seconds + input rows/s per index, min of
  * `SPARK_GRAFT_PROF_RUNS` (default 2) fresh rebuilds into a temp
  * dir.
  *
  * Reading the table: rows/s holding ≈ constant across the decade =
  * linear build (the k-means-bound IVF family trains on fixed
  * iters × nlist, so its per-row cost even FALLS as the fixed
  * centroid work amortizes); a falling rows/s flags a super-linear
  * stage. Build is a MAINTENANCE cost paid once per corpus version
  * (generation publish), amortized across every probe between
  * maintenances — the probe tables in SCALE.md price that side.
  */
object IndexBuildProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "2").toInt

    // the Scale1Prof synthesized 10× fixture (disjoint-vocab doc
    // copies, id-shifted embedding copies)
    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$sf01/documents.parquet")
      val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until 10).map { k =>
        val tagged =
          if (k == 0) docs
          else docs.withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(lit(s"c$k"), t)), " "))
        tagged.withColumn("doc_id", col("doc_id") + lit(k * n))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/documents.parquet")
      val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
      val m = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until 10).map(k =>
        emb.withColumn("vec_id", col("vec_id") + lit(k * m)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$sf1/embeddings.parquet")
      println(s"[ixbuild] built $sf1")
    }

    def freshDir(): String = {
      val d = java.nio.file.Files.createTempDirectory("ixbuild")
      d.toFile.deleteOnExit()
      d.toString
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    def timeBuild(build: String => Unit): Double =
      (1 to runs).map { _ =>
        val dir = freshDir()
        val t0 = System.nanoTime()
        build(dir)
        val dt = (System.nanoTime() - t0) / 1e9
        rm(new java.io.File(dir))
        dt
      }.min

    val builds: Seq[(String, (DataFrame, String) => Unit, String)] = Seq(
      ("ivf(nlist=16)", (e, d) => Similarity.writeIvfIndex(e, d), "emb"),
      // the 100 TB recipe row: quantizer trained on the vec_id % 4
      // sample, full corpus assigned — the delta vs the row above is
      // the Lloyd cost the sampling removes
      ("ivf_sampled(mod=4)",
        (e, d) => Similarity.writeIvfIndexSampled(e, d, sampleMod = 4),
        "emb"),
      ("ivfpq(16,4x16)", (e, d) => Similarity.writeIvfPqIndex(e, d), "emb"),
      ("sq8", (e, d) => Similarity.writeSq8Index(e, d), "emb"),
      ("bq", (e, d) => Similarity.writeBqIndex(e, d), "emb"),
      ("prefix(16)",
        (e, d) => Similarity.writePrefixIndex(e, d, prefixDim = 16), "emb"),
      ("prefix_ivf(16,16)",
        (e, d) => Similarity.writePrefixIvfIndex(e, d, prefixDim = 16),
        "emb"),
      ("bm25(64)", (t, d) => TextOps.writeBm25Index(t, d), "doc"),
      ("gram(8,64)", (t, d) => TextOps.writeGramIndex(t, d), "doc"))

    // JVM/JIT warmup: one untimed build of every kind at sf0.1 —
    // without this the sf0.1 row absorbs first-JVM codegen cost and
    // the decade comparison reads backwards (the first capture showed
    // bm25/gram absolute time FALLING at 10×, a pure warmup artifact)
    locally {
      val wEmb = spark.read.parquet(s"$sf01/embeddings.parquet")
        .localCheckpoint()
      val wDocs = spark.read.parquet(s"$sf01/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
        .localCheckpoint()
      builds.foreach { case (_, build, kind) =>
        val dir = freshDir()
        build(if (kind == "emb") wEmb else wDocs, dir)
        rm(new java.io.File(dir))
      }
      wEmb.unpersist(); wDocs.unpersist()
      ()
    }

    for (dir <- Seq(sf01, sf1)) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .localCheckpoint()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
        .localCheckpoint()
      val nEmb = emb.count()
      val nDoc = docs.count()
      builds.foreach { case (name, build, kind) =>
        val (src, n) = if (kind == "emb") (emb, nEmb) else (docs, nDoc)
        val t = timeBuild(d => build(src, d))
        println(f"[ixbuild] ${dir.split('/').last}%-10s $name%-18s " +
          f"rows=$n%7d  build=$t%7.2f s  rows_per_s=${n / t}%9.0f")
      }
      emb.unpersist(); docs.unpersist()
      ()
    }
    spark.stop()
  }
}
