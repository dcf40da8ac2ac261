package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces deterministic fake pixels from
  * the payload bytes. Everything around the stub — schema, batch
  * shape, partition-parallel execution, row explosion — is the real
  * Spark plumbing a production decode would use, so swapping in a
  * JNI/javacpp codec is a one-function change.
  *
  * Scale design:
  *  - payloads stay opaque bytes end-to-end; Spark never interprets
  *    them until the decode operator, so column pruning drops them
  *    for metadata-only queries (ReadSchema excludes `payload`);
  *  - decode runs via `mapPartitions` over an iterator — the Scala
  *    analog of `mapInPandas` batches: per-partition setup (codec
  *    init) amortized across rows, no per-row JVM↔native churn;
  *  - frame sampling is a generator (posexplode) — linear output in
  *    frames kept, no shuffle;
  *  - feature vectors come back as fixed-width float arrays ready for
  *    [[Similarity]] operators.
  */
object Multimodal {

  /** media asset schema: opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** Deterministic synthetic media table derived from the documents
    * corpus (fixture generator: payload bytes are the doc text bytes,
    * metadata derived from doc stats). Stands in for a real asset
    * table at the same schema.
    */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") % 480 + 16).cast("int").as("height"),
      (col("n_chars") * 40).cast("long").as("duration_ms"),
      element_at(array(lit("png"), lit("opus"), lit("av1")),
        (col("doc_id") % 3 + 1).cast("int")).as("codec"))

  final case class DecodedAsset(asset_id: Long, media_type: String,
      width: Int, height: Int, features: Array[Float])

  /** STUB decode + feature extraction. A real implementation would
    * initialize a codec per partition and decode `payload`; the stub
    * derives a deterministic 16-dim feature vector from payload bytes
    * (content-sensitive, so downstream dedup/ANN behave realistically).
    * Runs as mapPartitions: batch-shaped, partition-parallel, one
    * codec init per partition — the mapInPandas execution shape.
    */
  def decodeAndFeaturize(assets: DataFrame): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets
      .select(col("asset_id"), col("media_type"), col("width"),
        col("height"), col("payload"))
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition:
        // val codec = Codec.open(...)   // ??? (no media libs in env)
        rows.map { case (id, mt, w, h, payload) =>
          val feats = new Array[Float](16)
          if (payload != null) {
            var i = 0
            while (i < payload.length) {
              feats(i % 16) += (payload(i) & 0xff) / 255.0f
              i += 1
            }
            val n = math.max(1, payload.length / 16)
            var j = 0
            while (j < 16) { feats(j) /= n.toFloat; j += 1 }
          }
          DecodedAsset(id, mt, w, h, feats)
        }
      }
  }

  /** Resize metadata transform: pure column arithmetic (a real resize
    * would be part of the decode stub; target dims and scale factors
    * are engine-side math either way).
    */
  def withResizePlan(assets: DataFrame, maxDim: Int = 224): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)),
      lit(1.0))
    assets
      .withColumn("scale", round(scale, 4))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
  }

  /** Frame sampling for video assets: one row per sampled frame at a
    * fixed interval — posexplode of a generated offset sequence (the
    * decode of each frame would again hit the stub).
    */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val nFrames = greatest((col("duration_ms") / everyMs).cast("long"), lit(1L))
    assets
      .filter(col("media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(transform(sequence(lit(0L), nFrames - 1), i => i * everyMs)))
      .select(col("asset_id"), col("frame_ts_ms"), col("width"),
        col("height"), col("codec"))
  }
}
