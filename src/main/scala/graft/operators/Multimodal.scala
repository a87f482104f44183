package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in bounded batches.
  *
  * The Spark-side machinery here is real and tested — schemas,
  * partition-sized batching, deterministic feature shapes; the actual
  * media codecs are NOT (no image/audio libraries ship in this
  * environment), so `decodeStub` below is a clearly-marked deterministic
  * fake standing where a JNI/codec call would go. Swapping in a real
  * decoder touches exactly one function.
  *
  * Scale design: assets are processed with `mapPartitions` in
  * `batchSize` groups — the executor-singleton/batched pattern every
  * heavy model step in this engine uses (quality LID, NER, tokenize) —
  * so decoder initialization amortizes across a partition and peak
  * memory is bounded by batch, not partition, size.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("data", BinaryType, nullable = false),       // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = false)))

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB — deterministic fake decode: a real build replaces this body
    * with the codec call (e.g. libjpeg / ffmpeg via JNI). Produces a
    * `dim`-length feature vector derived from the bytes, so tests can
    * assert determinism and shape without the codec. */
  def decodeStub(data: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < data.length) { h = h * 31 + (data(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Synthesize a deterministic asset table from any id-bearing frame —
    * exercises the binary plumbing without real media files. */
  def synthesizeAssets(ids: DataFrame, idCol: String): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    ids.select(col(idCol).cast("long").as("asset_id"))
      .withColumn("kind", element_at(kinds, (pmod(col("asset_id"), lit(3)) + 1).cast("int")))
      // fake encoded payload: sha2 of the id, repeated — opaque bytes
      .withColumn("data", repeat(sha2(col("asset_id").cast("string"), 256), 4).cast("binary"))
      .withColumn("meta", struct(
        when(col("kind") === "image", lit(640)).otherwise(lit(null).cast("int")).as("width"),
        when(col("kind") === "image", lit(480)).otherwise(lit(null).cast("int")).as("height"),
        when(col("kind") === "audio", lit(16000)).otherwise(lit(null).cast("int")).as("sample_rate"),
        when(col("kind") === "video", lit(120)).otherwise(lit(null).cast("int")).as("n_frames")))
  }

  /** Batched feature extraction over the binary column. Real plumbing:
    * mapPartitions + grouped(batchSize) + per-batch processing; stubbed
    * decode. */
  def extractFeatures(assets: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets.select("asset_id", "kind", "data").mapPartitions { rows =>
      // per-partition "decoder" init would happen here (executor singleton)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val data = r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), data.length, decodeStub(data, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Video frame sampling: explode `n_frames` metadata into every k-th
    * frame row — pure Column expressions, no decode needed for the
    * sampling plan itself. */
  def sampleFrames(assets: DataFrame, everyK: Int = 30): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** Image resize planning: target dims as metadata transform (the
    * actual pixel op lives behind the same decode stub). */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame =
    assets.filter(col("kind") === "image")
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", (col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("meta.height") * col("scale")).cast("int"))
      .select("asset_id", "out_width", "out_height", "scale")
}
