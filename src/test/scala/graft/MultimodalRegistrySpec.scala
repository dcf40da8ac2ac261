package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.{Tables, TableRegistry}

/** Multimodal plumbing + table registry tests. */
class MultimodalRegistrySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val assets =
    Multimodal.syntheticAssets(Tables.documents(spark, sf("sf0.001")))

  test("synthetic assets carry opaque payloads with typed metadata") {
    assert(assets.schema("payload").dataType.typeName == "binary")
    val r = assets.filter($"asset_id" === 0L).collect()(0)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
    assert(r.getAs[Int]("width") >= 16)
  }

  test("decode stub produces deterministic fixed-width features per partition batch") {
    val f1 = Multimodal.decodeAndFeaturize(assets).filter(_.asset_id == 1L).collect()(0)
    val f2 = Multimodal.decodeAndFeaturize(assets.repartition(7))
      .filter(_.asset_id == 1L).collect()(0)
    assert(f1.features.length == 16)
    assert(f1.features.toSeq == f2.features.toSeq) // partitioning-invariant
    assert(f1.features.exists(_ != 0f))
  }

  // ---- fixture payload generators (real file bytes) ----

  private def bmp24(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowSize = ((w * 3 + 3) / 4) * 4
    val buf = ByteBuffer.allocate(54 + rowSize * h).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) { // bottom-up rows, BGR, padded
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- 0 until rowSize - w * 3) buf.put(0.toByte)
    }
    buf.array
  }

  private def wavPcm16(rate: Int, samples: Array[Short]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(s => { buf.putShort(s); () })
    buf.array
  }

  private def mediaDf(rows: Seq[(Long, String, Array[Byte])]) =
    rows.toDF("asset_id", "media_type", "payload")
      .withColumn("width", lit(0)).withColumn("height", lit(0))

  test("BMP codec decodes real pixels: dims from header, luminance grid features") {
    // 8×8, left half black / right half white (bottom-up rows + padding
    // exercised by the 8·3 = 24-byte rows → no pad; add a 5-wide image
    // for the padded case)
    val half = bmp24(8, 8)((x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255))
    val (w, h, rgb) = Multimodal.Codecs.decodeBmp24(half).get
    assert((w, h) == ((8, 8)) && rgb.length == 8 * 8 * 3)
    assert(rgb(0) == 0 && rgb((0 * 8 + 7) * 3) == 255) // exact pixel values
    val feats = Multimodal.Codecs.imageFeatures(w, h, rgb)
    assert(feats.grouped(4).forall(row =>
      row(0) < 0.01f && row(1) < 0.01f && row(2) > 0.99f && row(3) > 0.99f))
    // padded rows (5·3 = 15 → 16-byte rows) round-trip exactly too
    val (w5, _, rgb5) = Multimodal.Codecs
      .decodeBmp24(bmp24(5, 3)((x, y) => (x * 40, y * 60, 7))).get
    assert(w5 == 5 && rgb5((2 * 5 + 4) * 3) == 160 && rgb5((2 * 5 + 4) * 3 + 1) == 120)
    // dims + decoder surface through the Dataset operator
    val d = Multimodal.decodeAndFeaturize(
      mediaDf(Seq((1L, "image", half)))).collect()(0)
    assert(d.decoder == "bmp24" && d.width == 8 && d.height == 8)
  }

  test("WAV codec decodes real samples: silence vs full-scale RMS segments") {
    val n = 1600
    val samples = Array.tabulate[Short](n)(i =>
      if (i < n / 2) 0
      else if (i % 2 == 0) 32767 else -32768)
    val (rate, ch, mono) = Multimodal.Codecs
      .decodeWavPcm16(wavPcm16(16000, samples)).get
    assert(rate == 16000 && ch == 1 && mono.length == n)
    assert(mono(0) == 0 && mono(n - 2) == 32767)
    val feats = Multimodal.Codecs.audioFeatures(mono)
    assert(feats.take(8).forall(_ < 0.01f) && feats.drop(8).forall(_ > 0.99f))
    val d = Multimodal.decodeAndFeaturize(
      mediaDf(Seq((2L, "audio", wavPcm16(16000, samples))))).collect()(0)
    assert(d.decoder == "wav-pcm16")
  }

  test("decoded features feed the Similarity operators end-to-end") {
    // two identical gradient images + one inverted: ANN over the
    // DECODED features must pair the identical ones
    val grad = bmp24(16, 16)((x, y) => (x * 16, y * 16, 0))
    val inv = bmp24(16, 16)((x, y) => (255 - x * 16, 255 - y * 16, 128))
    val assets = mediaDf(Seq((0L, "image", grad), (1L, "image", inv),
      (2L, "image", grad.clone())))
    val emb = Multimodal.decodeAndFeaturize(assets)
      .map(d => (d.asset_id, d.features, "img"))
      .toDF("vec_id", "embedding", "label")
    val top1 = graft.operators.Similarity.bruteForceTopK(emb, Seq(0L), k = 1)
      .select($"vec_id", $"cos_sim").as[(Long, Double)].collect()(0)
    assert(top1._1 == 2L && top1._2 == 1.0)
  }

  test("crafted/corrupt headers degrade to the stub instead of failing the task") {
    import java.nio.{ByteBuffer, ByteOrder}
    // BMP whose width overflows Int products (w·3 and w·h·3 go negative
    // in 32-bit arithmetic)
    val evilBmp = ByteBuffer.allocate(100).order(ByteOrder.LITTLE_ENDIAN)
    evilBmp.put('B'.toByte).put('M'.toByte).putInt(100).putInt(0).putInt(54)
    evilBmp.putInt(40).putInt(0x30000000).putInt(1).putShort(1).putShort(24)
      .putInt(0)
    // WAV whose chunk size wraps the Int offset cursor
    val evilWav = ByteBuffer.allocate(100).order(ByteOrder.LITTLE_ENDIAN)
    evilWav.put("RIFF".getBytes).putInt(92).put("WAVE".getBytes)
    evilWav.put("fmt ".getBytes).putInt(0x7FFFFF00)
    // truncated BMP claiming more pixel data than the payload carries
    val truncated = bmp24(8, 8)((_, _) => (1, 2, 3)).take(60)
    val d = Multimodal.decodeAndFeaturize(mediaDf(Seq(
      (10L, "image", evilBmp.array), (11L, "audio", evilWav.array),
      (12L, "image", truncated)))).collect()
    assert(d.length == 3 && d.forall(_.decoder == "synthetic-stub"))
  }

  test("non-media payloads fall back to the documented synthetic stub") {
    val d = Multimodal.decodeAndFeaturize(
      mediaDf(Seq((3L, "video", "not a media file".getBytes)))).collect()(0)
    assert(d.decoder == "synthetic-stub" && d.features.length == 16)
  }

  test("resize plan clamps to max dimension, preserves aspect flow") {
    val planned = Multimodal.withResizePlan(assets, maxDim = 100)
    val bad = planned.filter($"out_width" > 100 || $"out_height" > 100).count()
    assert(bad == 0)
    // scale never upsamples
    assert(planned.filter($"scale" > 1.0).count() == 0)
  }

  test("frame sampling explodes video assets at the requested cadence") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    assert(frames.select($"asset_id").distinct().count() ==
      assets.filter($"media_type" === "video").count())
    val one = frames.filter($"asset_id" === 2L).select($"frame_ts_ms")
      .as[Long].collect().sorted
    assert(one.headOption.contains(0L))
    if (one.length > 1) assert(one(1) == 1000L)
  }

  test("registry bootstrap is idempotent; append writers partition by date") {
    val root = Files.createTempDirectory("reg").toString
    TableRegistry.initWarehouse(spark, root)
    TableRegistry.initWarehouse(spark, root) // second call must not throw
    assert(spark.read.parquet(s"$root/users").count() == 3)
    val rules = spark.read.parquet(s"$root/firewall_rules")
    // a fresh warehouse ships the reference's production seed profile
    // (7 regex rules, app.py:1531-1539), all active
    assert(rules.count() ==
      graft.operators.Detect.ReferenceFirewallSeed.length)
    assert(rules.filter(!$"is_active").count() == 0)
    assert(rules.filter($"match_type" =!= "regex").count() == 0)
    // the expired blacklist entry must survive bootstrap verbatim
    assert(spark.read.parquet(s"$root/ip_blacklist")
      .filter($"expires_at" < to_timestamp(lit("2001-01-01 00:00:00")))
      .count() == 1)

    val acts = Seq((1L, "SELECT 1", "2024-01-10 10:00:00"),
        (2L, "SELECT 2", "2024-01-11 10:00:00"))
      .toDF("activity_id", "operation_details", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    TableRegistry.appendActivities(acts, s"$root/activity_logs")
    assert(new java.io.File(s"$root/activity_logs/event_date=2024-01-10").exists())
    val back = spark.read.parquet(s"$root/activity_logs")
    assert(back.count() == 2)
    assert(back.columns.contains("query_hash"))
  }

  test("appendIfAbsent skips existing keys (INSERT IGNORE analog)") {
    val root = Files.createTempDirectory("reg2").toString
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y2"), (3L, "z")).toDF("k", "v")
    assert(TableRegistry.appendIfAbsent(spark, a, "k", s"$root/t") == 2)
    assert(TableRegistry.appendIfAbsent(spark, b, "k", s"$root/t") == 1)
    assert(spark.read.parquet(s"$root/t").count() == 3)
  }

  test("CSV export caps rows and ISO-formats timestamps") {
    val out = Files.createTempDirectory("csv").toString + "/export"
    val df = (1 to 20).map(i => (i.toLong, f"2024-01-10 10:00:${i % 60}%02d"))
      .toDF("id", "ts_s")
      .withColumn("access_timestamp", to_timestamp($"ts_s")).drop("ts_s")
    TableRegistry.exportCsv(df, Seq("access_timestamp"), out, limit = 5)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 5)
    val ts = back.select("access_timestamp").as[String].collect()(0)
    assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"""))
  }
}
