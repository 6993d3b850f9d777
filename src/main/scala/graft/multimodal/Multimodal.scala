package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/featurized batch-wise on
  * the executors.
  *
  * The Spark-side shape is the real deliverable — schema (binary payload
  * + struct metadata), partition-safe batch iteration (`mapPartitions`
  * over a typed Dataset, one decoder init per partition, never per row),
  * and a fixed-width feature vector output ready for the
  * similarity-search operators (graft.operators.Knn / Ivf).
  *
  * The decode step itself is STUBBED: this container ships no image/audio
  * codecs, so [[decodeStub]] derives a deterministic fake feature vector
  * from the payload bytes (byte histogram moments). Swapping in a real
  * decoder changes only the body of `decodeStub`; every schema,
  * partitioning and batching decision stays identical.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // image | audio | video
      format: String,     // fake container format tag
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      mean_byte: Double,
      feature: Array[Float])

  private val MediaTypes = Array("image", "audio", "video")
  private val Formats = Array("png", "jpeg", "wav", "mp4")
  val FeatureDim = 8

  /** Synthesize a media table from the documents corpus: the text bytes
    * stand in for an encoded payload; metadata is derived
    * deterministically from doc_id. In production this column comes
    * straight off parquet (binary + struct read natively by the
    * vectorized reader). */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(MediaTypes), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      element_at(lit(Formats), (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("format"),
      (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic byte-histogram "features" standing in
    * for a real image/audio decode (??? in spirit; see class doc). */
  private[multimodal] def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = math.max(bytes.length, 1)
    val mean = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    val feature = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      feature((bytes(i) & 0xff) % FeatureDim) += 1.0f
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { feature(j) /= n.toFloat; j += 1 }
    MediaFeatures(r.doc_id, r.media_type, bytes.length,
      math.rint(mean * 1e6) / 1e6, feature)
  }

  /** Batch feature extraction: typed mapPartitions so a real decoder is
    * initialized once per partition and rows stream through it — the
    * Spark equivalent of a batched Pandas-UDF decode. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // real impl: val decoder = Codec.open(...) — once per partition
      rows.map(decodeStub)
    }
  }

  /** Resize: metadata-transforming payload op. The byte transform is a
    * STUB (deterministic truncation/padding standing in for a pixel
    * resample); the real content — schema preservation, narrow map, new
    * dimensions flowing through metadata — is what a production decode
    * swap inherits. */
  def resize(spark: SparkSession, media: DataFrame, newW: Int, newH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // real impl: per-partition codec context, then per-row resample
      rows.map { r =>
        val targetLen = math.max(1, (r.payload.length.toLong * (newW.toLong * newH) /
          math.max(r.width.toLong * r.height, 1L)).toInt)
        val out = java.util.Arrays.copyOf(r.payload, targetLen)
        r.copy(width = newW, height = newH, payload = out)
      }
    }.toDF()
  }

  /** Frame sampling: one video row → every-nth-frame rows. The frame
    * split is a STUB (fixed-size payload chunks standing in for
    * container demux); the real content is the generator shape — a
    * narrow per-row explode whose output count is payload-proportional,
    * never a shuffle. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int,
                   frameBytes: Int = 64): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .filter((r: MediaRecord) => r.media_type == "video")
      .flatMap { r =>
        val nFrames = math.max(r.payload.length / frameBytes, 1)
        (0 until nFrames by everyNth).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          (r.doc_id, f, until - from,
            java.util.Arrays.copyOfRange(r.payload, from, math.max(until, from)))
        }
      }
      .toDF("doc_id", "frame_idx", "n_bytes", "frame")
  }

  /** End-to-end pipeline for the q18 rows-only check: media synthesis →
    * batch featurize → per-media-type rollup (deterministic output). */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, toMediaTable(docs))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("mean_byte"), 6).as("avg_mean_byte"),
        round(sum(element_at(col("feature"), 1)), 6).as("f0_sum"))
      .orderBy("media_type")
  }
}
