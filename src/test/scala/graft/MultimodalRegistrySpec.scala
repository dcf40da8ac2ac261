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

  /** Hand-rolled PNG encoder (8-bit RGB, per-row filter selection) —
    * exercises every scanline filter type deterministically.
    */
  private def pngRgb(w: Int, h: Int, filterOf: Int => Int)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    import java.util.zip.{CRC32, Deflater}
    val stride = w * 3
    val plain = Array.tabulate(h, stride) { (y, i) =>
      val (r, g, b) = px(i / 3, y)
      (i % 3 match { case 0 => r; case 1 => g; case _ => b }).toByte
    }
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val ft = filterOf(y)
      raw(y * (stride + 1)) = ft.toByte
      for (i <- 0 until stride) {
        val cur = plain(y)(i) & 0xff
        val a = if (i >= 3) plain(y)(i - 3) & 0xff else 0
        val b = if (y > 0) plain(y - 1)(i) & 0xff else 0
        val c = if (i >= 3 && y > 0) plain(y - 1)(i - 3) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case _ =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + i) = v.toByte
      }
    }
    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new CRC32()
      crc.update(typ.getBytes("US-ASCII"))
      crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def pngVia(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

  test("PNG codec: every filter type de-filters to exact pixels") {
    def gradient(x: Int, y: Int) =
      ((x * 11) % 256, (y * 23) % 256, (x ^ y) % 256)
    // rows cycle through None/Sub/Up/Average/Paeth
    val bytes = pngRgb(23, 11, y => y % 5)(gradient)
    val (w, h, rgb) = Multimodal.Codecs.decodePng(bytes).get
    assert((w, h) == ((23, 11)))
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = gradient(x, y)
      val o = (y * w + x) * 3
      assert(rgb(o) == er && rgb(o + 1) == eg && rgb(o + 2) == eb,
        s"pixel ($x,$y)")
    }
    // dims + decoder surface through the Dataset operator
    val d = Multimodal.decodeAndFeaturize(
      mediaDf(Seq((20L, "image", bytes)))).collect()(0)
    assert(d.decoder == "png" && d.width == 23 && d.height == 11)
  }

  test("PNG codec agrees with the JDK's independent encoder (RGB/RGBA/gray)") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 9, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 28) << 8) | ((x * y) % 256))
    val (w, h, rgb) = Multimodal.Codecs.decodePng(pngVia(img)).get
    assert((w, h) == ((16, 9)))
    for (y <- 0 until 9; x <- 0 until 16) {
      val e = img.getRGB(x, y)
      val o = (y * 16 + x) * 3
      assert(rgb(o) == ((e >> 16) & 0xff) && rgb(o + 1) == ((e >> 8) & 0xff)
        && rgb(o + 2) == (e & 0xff))
    }
    // color type 6: alpha dropped, RGB kept verbatim
    val argb = new BufferedImage(8, 8, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 8; x <- 0 until 8)
      argb.setRGB(x, y, (0x80 << 24) | ((x * 32) << 16) | ((y * 32) << 8) | 5)
    val (aw, ah, apx) = Multimodal.Codecs.decodePng(pngVia(argb)).get
    assert((aw, ah) == ((8, 8)))
    assert(apx((3 * 8 + 2) * 3) == 64 && apx(2) == 5)
    // color type 0: grayscale replicated across RGB
    val gray = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6)
      gray.getRaster.setSample(x, y, 0, x * 40 + y)
    val (gw, gh, gpx) = Multimodal.Codecs.decodePng(pngVia(gray)).get
    assert((gw, gh) == ((6, 4)))
    val o = (2 * 6 + 3) * 3
    assert(gpx(o) == 122 && gpx(o + 1) == 122 && gpx(o + 2) == 122)
  }

  test("hostile/unsupported PNGs degrade to the stub") {
    val good = pngRgb(12, 12, _ => 4)((x, y) => (x * 20, y * 20, 0))
    // truncated IDAT: chop the tail off the file
    val truncated = good.take(good.length - 24)
    // interlaced flag set (Adam7 unsupported → None)
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace byte
    // zip-bomb shape: huge declared dims over a tiny IDAT must be
    // rejected by the deflate-ratio bound before allocation
    val bomb = good.clone()
    val bb = java.nio.ByteBuffer.wrap(bomb)
    bb.putInt(16, 20000)
    bb.putInt(20, 20000)
    val d = Multimodal.decodeAndFeaturize(mediaDf(Seq(
      (30L, "image", truncated), (31L, "image", interlaced),
      (32L, "image", bomb)))).collect()
    assert(d.length == 3 && d.forall(_.decoder == "synthetic-stub"))
  }

  test("decoded features feed the Similarity operators end-to-end") {
    // the same gradient as a PNG and as a BMP + one inverted BMP: ANN
    // over the DECODED features must pair the two encodings of the
    // same image (the luminance grid is codec-independent)
    val gradPng = pngRgb(16, 16, y => y % 5)((x, y) => (x * 16, y * 16, 0))
    val gradBmp = bmp24(16, 16)((x, y) => (x * 16, y * 16, 0))
    val inv = bmp24(16, 16)((x, y) => (255 - x * 16, 255 - y * 16, 128))
    val assets = mediaDf(Seq((0L, "image", gradPng), (1L, "image", inv),
      (2L, "image", gradBmp)))
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

  test("dHash: brightness-invariant, codec-agnostic, separates planted groups") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    // known value: a pure left-to-right brightening ramp sets every bit
    val w = 36; val h = 32
    val ramp = Array.tabulate(w * h * 3) { i =>
      val x = (i / 3) % w
      math.min(255, x * 7)
    }
    assert(Codecs.dhash64(w, h, ramp) == -1L) // all 64 comparison bits set
    // brightness shift moves every cell equally -> identical hash
    val brighter = ramp.map(v => math.min(255, v + 2))
    assert(Codecs.dhash64(w, h, brighter) == Codecs.dhash64(w, h, ramp))
    // the same pixels through BOTH encoders and BOTH decoders agree
    val viaPng = Codecs.decodePng(Codecs.encodePng(w, h, ramp)).get
    val viaBmp = Codecs.decodeBmp24(Codecs.encodeBmp24(w, h, ramp)).get
    assert(viaPng._3.toSeq == ramp.toSeq && viaBmp._3.toSeq == ramp.toSeq)
    // planted corpus: clusters recovered exactly = id % groups structure
    val ids = (0L until 60L).toDF("doc_id")
    val got = Multimodal.phashClusters(Multimodal.plantedImageAssets(ids, groups = 20))
      .as[(Long, Long, Long)].collect().toSet
    val expected = (0L until 60L).map(id => (id, id % 20, 3L)).toSet
    assert(got == expected)
    // hashes: one distinct value per group, >= 9 bits apart across groups
    val hs = Multimodal.phashes(Multimodal.plantedImageAssets(ids, groups = 20))
      .collect().map(p => (p.asset_id % 20, p.phash)).distinct
    assert(hs.length == 20)
    for (Seq((ga, ha), (gb, hb)) <- hs.toSeq.combinations(2))
      assert(java.lang.Long.bitCount(ha ^ hb) >= 9, s"groups $ga/$gb too close")
  }

  test("audio hash: gain-invariant, separates planted groups via the real codec") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    // rising-RMS staircase sets every comparison bit
    val rising = Array.tabulate[Short](65 * 64) { i =>
      val a = 1000 + (i / 64) * 300
      (if (i % 2 == 0) a else -a).toShort
    }
    assert(Codecs.audioHash64(rising) == -1L)
    // global gain scales every segment RMS equally -> identical hash
    val louder = rising.map(s => (s * 1.5).toInt.toShort)
    assert(Codecs.audioHash64(louder) == Codecs.audioHash64(rising))
    // encoder/decoder round-trip preserves samples
    val back = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(8000, rising)).get
    assert(back._1 == 8000 && back._3.toSeq == rising.toSeq)
    // planted corpus: clusters recovered exactly = id % groups
    val ids = (0L until 60L).toDF("doc_id")
    val got = Multimodal.audioHashClusters(
      Multimodal.plantedAudioAssets(ids, groups = 20))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (0L until 60L).map(id => (id, id % 20, 3L)).toSet)
  }

  test("video frames: container split, per-frame decode, planted clusters") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    // two distinct frames concatenated round-trip through the splitter
    val f1 = Codecs.encodePng(8, 8, Array.fill(8 * 8 * 3)(10))
    val f2 = Codecs.encodePng(8, 8, Array.fill(8 * 8 * 3)(240))
    val split = Codecs.splitPngFrames(f1 ++ f2)
    assert(split.length == 2)
    assert(split(0).toSeq == f1.toSeq && split(1).toSeq == f2.toSeq)
    // truncated tail: the complete leading frames are still returned
    assert(Codecs.splitPngFrames((f1 ++ f2).dropRight(7)).length == 1)
    assert(Codecs.splitPngFrames(Array[Byte](1, 2, 3)).isEmpty)
    // planted corpus: frame hashes recover the window-overlap clusters
    val ids = (0L until 60L).toDF("doc_id")
    val assets = Multimodal.plantedVideoAssets(ids, groups = 12)
    val nFrames = Multimodal.videoFrameHashes(assets).count()
    assert(nFrames == 60L * 6, "every member carries its 6-frame window")
    val got = Multimodal.videoClusters(assets)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (0L until 60L).map(id => (id, id % 12, 5L)).toSet)
    // distinct groups share no frames at all
    val pairs = Multimodal.videoNearDups(assets)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, b) => a % 12 == b % 12 })
  }

  test("video stop-frame cap bounds hub-frame candidates without changing clusters") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.Codecs
    // a ubiquitous frame — the black end-card every real corpus has —
    // appended to EVERY video: without a document-frequency cap the
    // shared hash puts all k videos in one bucket and the blocking
    // join emits the full k(k−1)/2 pair space (round-5 verdict #2)
    val ids = (0L until 60L).toDF("doc_id")
    val hub = Codecs.encodePng(36, 32, Array.fill(36 * 32 * 3)(0))
    val hubbed = Multimodal.plantedVideoAssets(ids, groups = 12)
      .select($"asset_id", concat($"payload", lit(hub)).as("payload"))
    val sets = Multimodal.videoFrameHashes(hubbed).toDF()
      .groupBy($"asset_id").agg(collect_set($"phash").as("fs"))
      .localCheckpoint()
    val uncapped =
      Multimodal.videoNearDupCandidates(sets, Int.MaxValue).count()
    assert(uncapped == 60L * 59 / 2,
      "hub frame must blow the uncapped blocking to the full pair space")
    // df cap 8 > the 5-member group size, < the 60-video hub df: real
    // frames keep blocking, the hub is dropped — candidates collapse
    // to exactly the intra-group pairs (12 groups × C(5,2))
    val capped = Multimodal.videoNearDupCandidates(sets, 8).count()
    assert(capped == 12L * 10,
      s"capped blocking should emit only intra-group pairs, got $capped")
    // the Jaccard verdict still scores FULL frame sets, so cluster
    // output is unchanged by both the hub frame and the cap (the hub
    // adds 1 shared element: intra-group similarity only rises,
    // cross-group tops out at 1/13 ≪ 0.45)
    val got = Multimodal.videoClusters(hubbed, maxFrameDf = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (0L until 60L).map(id => (id, id % 12, 5L)).toSet)
  }
}
