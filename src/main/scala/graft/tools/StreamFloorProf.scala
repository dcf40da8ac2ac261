package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition of the streaming-replay FIXED-COST FLOOR (round-12
  * verdict #4): the two `dam_stream_replay*` bench rows carried
  * 16.7 s of pure machinery (floors 5.6 + 11.1 at 32 state
  * partitions) — 13.5 % of the battery. This instrument prices the
  * floor per component so the cut is measured, not asserted:
  *
  *  - `floor@N` — [[graft.SparkEntry.streamReplayFloor]] (the exact
  *    Bench measurement: empty spool, full Ingest machinery) at N
  *    state partitions via `spark.graft.stream.statePartitions`.
  *    floor@32 is the round-12 configuration; floor@8 the new
  *    default. The delta prices the per-state-partition RocksDB
  *    lifecycle (open + watermark-dedup scan + changelog commit per
  *    micro-batch per partition).
  *  - `stateless@N` — a minimal stream over the SAME empty spool with
  *    NO stateful operator (no watermark dedup): source listing +
  *    trigger scheduling + offset/commit-log I/O + foreachBatch
  *    dispatch only. The irreducible Structured Streaming cost at
  *    this partition count; floor@N − stateless@N is what state
  *    costs.
  *  - `replay@N` — the REAL dam_stream_replay row (full pipeline +
  *    sinks + read-back) at N partitions: confirms the floor cut
  *    survives contact with the steady-state row and that 8
  *    partitions does not slow the data path at sf0.1 volume.
  *
  * Run: SPARK_GRAFT_SF_DIR=… graft.tools.StreamFloorProf
  */
object StreamFloorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMin(f: => Unit): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min

    def floorAt(n: Int, batched: Boolean): Double = {
      spark.conf.set("spark.graft.stream.statePartitions", n.toString)
      try timeMin {
        graft.SparkEntry.streamReplayFloor(spark, sfDir, batched)
          .collect(); ()
      } finally spark.conf.unset("spark.graft.stream.statePartitions")
    }

    def replayAt(n: Int, batched: Boolean): Double = {
      spark.conf.set("spark.graft.stream.statePartitions", n.toString)
      val name = if (batched) "dam_stream_replay_batched"
                 else "dam_stream_replay"
      try timeMin { graft.SparkEntry.queries(name)(spark, sfDir).collect(); () }
      finally spark.conf.unset("spark.graft.stream.statePartitions")
    }

    /** The no-state stream: same empty spool shape, same trigger
      * cadence and checkpoint machinery, foreachBatch counts and
      * discards — everything the floor pays EXCEPT state stores.
      */
    def statelessAt(n: Int, batched: Boolean): Double = timeMin {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", n.toString)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-floorprof").toString
      val feedDir = s"$tmp/feed"
      val empty = graft.sources.Tables.generalLogFeed(ss, sfDir).limit(0)
      if (!batched) {
        empty.coalesce(1).write.mode("overwrite").parquet(feedDir)
      } else {
        new java.io.File(feedDir).mkdirs()
        for (k <- 0 to 2) {
          val stage = s"$tmp/stage$k"
          empty.coalesce(1).write.mode("overwrite").parquet(stage)
          val pf = new java.io.File(stage).listFiles()
            .find(_.getName.startsWith("part-")).get
          val dest = new java.io.File(feedDir, f"batch-$k%02d.parquet")
          java.nio.file.Files.move(pf.toPath, dest.toPath)
          dest.setLastModified(1600000000000L + k * 60000L)
          ()
        }
      }
      val reader = ss.readStream.schema(graft.sources.Tables.GeneralLogSchema)
      val src = (if (batched) reader.option("maxFilesPerTrigger", "1")
                 else reader).parquet(feedDir)
      val q = src.writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.count(); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }

    for (batched <- Seq(false, true)) {
      val tag = if (batched) "batched" else "single"
      for (n <- Seq(32, 8, 2)) {
        println(f"[floorprof] floor/$tag@$n%-2d     = ${floorAt(n, batched)}%.2f s")
        println(f"[floorprof] stateless/$tag@$n%-2d = ${statelessAt(n, batched)}%.2f s")
      }
      for (n <- Seq(32, 8))
        println(f"[floorprof] replay/$tag@$n%-2d    = ${replayAt(n, batched)}%.2f s")
    }
    spark.stop()
  }
}
