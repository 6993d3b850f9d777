package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/featurized batch-wise on
  * the executors.
  *
  * The Spark-side shape — schema (binary payload + struct metadata),
  * partition-safe batch iteration (`mapPartitions` over a typed Dataset,
  * per-partition decoder state, never per row), and a fixed-width
  * feature vector output ready for the similarity-search operators
  * (graft.operators.Knn / Ivf) — is shared by every media type.
  *
  * The IMAGE path is REAL end to end: `toMediaTable` synthesizes valid
  * PNG payloads (deterministic gradient rasters keyed by doc_id),
  * [[decode]] decodes them with `javax.imageio` (in the JDK — no
  * external codecs needed) into pixel-luminance features, and [[resize]]
  * resamples through a Graphics2D raster scale and re-encodes. Audio and
  * video payloads remain synthetic byte blobs with the decode branch
  * falling back to byte-histogram features — the container ships no
  * audio/video codecs; swapping a real demuxer in changes only that
  * branch, as the image path demonstrates.
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // image | audio | video
      format: String,     // png for images (real); container tag otherwise
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      mean_byte: Double,
      decoded_w: Int, // from the actual decode for images; -1 otherwise
      decoded_h: Int,
      feature: Array[Float])

  private val MediaTypes = Array("image", "audio", "video")
  val FeatureDim = 8

  /** Deterministic RGB for pixel (x, y) of doc `docId` — a smooth
    * gradient so the PNGs stay small and encode fast at any SF. */
  private def pixel(docId: Long, x: Int, y: Int): Int = {
    val r = ((x * 7 + docId) % 256).toInt
    val g = ((y * 5 + docId * 3) % 256).toInt
    val b = ((x + y + docId * 5) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def encodePng(docId: Long, w: Int, h: Int, buf: ByteArrayOutputStream): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(docId, x, y)); x += 1 }
      y += 1
    }
    buf.reset()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  /** Synthesize a media table from the documents corpus. Image rows get
    * REAL PNG payloads (encoded on the executors, one reusable buffer
    * per partition); audio/video rows carry the text bytes as an opaque
    * stand-in payload. In production this column comes straight off
    * parquet (binary + struct read natively by the vectorized reader). */
  def toMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val buf = new ByteArrayOutputStream(8192) // per-partition encoder state
        rows.map { case (docId, text) =>
          MediaTypes((docId % 3).toInt) match {
            case "image" =>
              // small rasters: the decode path is equally real at 24x20
              // as at 4k, and the synthetic corpus re-encodes per run
              val w = ((docId % 16) * 4 + 16).toInt
              val h = ((docId % 12) * 4 + 16).toInt
              MediaRecord(docId, "image", "png", w, h, encodePng(docId, w, h, buf))
            case "audio" =>
              MediaRecord(docId, "audio", "wav",
                ((docId % 64) * 16 + 16).toInt, 1, text.getBytes("UTF-8"))
            case _ =>
              MediaRecord(docId, "video", "mp4",
                ((docId % 64) * 16 + 16).toInt, ((docId % 48) * 16 + 16).toInt,
                text.getBytes("UTF-8"))
          }
        }
      }.toDF()
  }

  /** Byte-level payload stats shared by every branch. */
  private def meanByte(bytes: Array[Byte]): Double = {
    val n = math.max(bytes.length, 1)
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    math.rint(sum.toDouble / n * 1e6) / 1e6
  }

  /** Decode one record. PNG → real `javax.imageio` decode to a
    * normalized FeatureDim-bin luminance histogram + decoded dims;
    * other formats → byte-histogram features (documented synthetic
    * fallback — no audio/video codec in the JDK). */
  private[multimodal] def decode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    // Undecodable payloads surface BOTH ways: ImageIO.read returns
    // null when no reader claims the stream (bad magic) and THROWS
    // IIOException when a reader claims it but the body is corrupt or
    // truncated. At lake scale both are certainties — degrade to the
    // byte path, never kill the task.
    val img0 = if (r.format == "png")
      try ImageIO.read(new ByteArrayInputStream(bytes))
      // readers also throw unchecked exceptions on malformed bodies
      // (CMMException for corrupt ICC profiles, IndexOutOfBounds for
      // crafted palettes) — any decode failure means byte fallback
      catch { case scala.util.control.NonFatal(_) => null }
    else null
    if (img0 != null) {
      val img = img0
      val w = img.getWidth
      val h = img.getHeight
      val feature = new Array[Float](FeatureDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          feature(lum * FeatureDim / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w * h).toFloat
      var j = 0
      while (j < FeatureDim) { feature(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_type, bytes.length, meanByte(bytes), w, h, feature)
    } else {
      val feature = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        feature((bytes(i) & 0xff) % FeatureDim) += 1.0f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { feature(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_type, bytes.length, meanByte(bytes), -1, -1, feature)
    }
  }

  /** Batch feature extraction: typed mapPartitions so decoder state is
    * initialized once per partition and rows stream through it — the
    * Spark equivalent of a batched Pandas-UDF decode. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(rows => rows.map(decode))
  }

  /** Resize. PNG payloads are REALLY resampled: decode → Graphics2D
    * raster scale to (newW, newH) → re-encode. Non-image payloads fall
    * back to proportional byte truncation (synthetic, as documented) so
    * the metadata/payload contract — new dims flow through metadata,
    * payload size tracks the raster — holds for every type. */
  def resize(spark: SparkSession, media: DataFrame, newW: Int, newH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      val buf = new ByteArrayOutputStream(8192)
      rows.map { r =>
        val src = if (r.format == "png")
          try ImageIO.read(new ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null } // any decode failure
        else null
        if (src != null) { // null = undecodable → byte fallback below
          val dst = new BufferedImage(newW, newH, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(src, 0, 0, newW, newH, null)
          finally g.dispose()
          buf.reset()
          ImageIO.write(dst, "png", buf)
          r.copy(width = newW, height = newH, payload = buf.toByteArray)
        } else {
          val targetLen = math.max(1, (r.payload.length.toLong * (newW.toLong * newH) /
            math.max(r.width.toLong * r.height, 1L)).toInt)
          val out = java.util.Arrays.copyOf(r.payload, targetLen)
          r.copy(width = newW, height = newH, payload = out)
        }
      }
    }.toDF()
  }

  /** Frame sampling: one video row → every-nth-frame rows. The frame
    * split is SYNTHETIC (fixed-size payload chunks standing in for
    * container demux — no video codec in the JDK); the real content is
    * the generator shape — a narrow per-row explode whose output count
    * is payload-proportional, never a shuffle. */
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
