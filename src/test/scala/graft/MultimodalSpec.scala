package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, partition-safe batch shape, and the
  * metadata contracts a real decoder swap must preserve. */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.toMediaTable(Tables.documents(spark, sf0001))

  test("media table schema: binary payload + typed metadata") {
    val s = media.schema
    assert(s("payload").dataType.typeName === "binary")
    assert(Seq("doc_id", "media_type", "format", "width", "height")
      .forall(s.fieldNames.contains))
  }

  test("feature extraction emits fixed-width vectors, one row per input") {
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() === media.count())
    val dims = feats.select(size(col("feature")).as("d")).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq === Seq(Multimodal.FeatureDim))
  }

  test("PNG payloads really decode: dims match metadata, histogram sums to 1") {
    val feats = Multimodal.extractFeatures(spark,
      media.where(col("media_type") === "image"))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    // javax.imageio round-trip: the decoded raster must report exactly
    // the dimensions the metadata promised.
    val metaDims = media.where(col("media_type") === "image")
      .select("doc_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    rows.foreach { f =>
      assert((f.decoded_w, f.decoded_h) === metaDims(f.doc_id),
        s"doc ${f.doc_id}: decoded dims != metadata dims")
    }
    // Luminance histogram is normalized over all pixels.
    rows.foreach { f =>
      assert(math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("corrupt PNG payloads degrade to the byte fallback, never kill the task") {
    import spark.implicits._
    // a REAL png truncated mid-body: the reader claims the stream via
    // the signature and then THROWS (not returns null) — the harder case
    val realPng = media.where(col("media_type") === "image")
      .select("payload").head().getAs[Array[Byte]](0)
    val truncated = java.util.Arrays.copyOf(realPng, realPng.length / 2)
    val corrupt = Seq(
      Multimodal.MediaRecord(1L, "image", "png", 8, 8, Array[Byte](1, 2, 3)),
      Multimodal.MediaRecord(2L, "image", "png", 8, 8, Array.empty[Byte]),
      Multimodal.MediaRecord(3L, "image", "png", 8, 8, truncated)
    ).toDF()
    val feats = Multimodal.extractFeatures(spark, corrupt).collect()
    assert(feats.length === 3)
    assert(feats.forall(f => f.decoded_w == -1 && f.decoded_h == -1))
    val resized = Multimodal.resize(spark, corrupt, 4, 4).collect()
    assert(resized.length === 3 && resized.forall(_.getInt(3) === 4))
  }

  test("non-image rows use the byte fallback (decoded dims = -1)") {
    val feats = Multimodal.extractFeatures(spark,
      media.where(col("media_type") =!= "image"))
    assert(feats.collect().forall(f => f.decoded_w == -1 && f.decoded_h == -1))
  }

  test("resize really resamples PNGs (decoded dims follow the new raster)") {
    val resized = Multimodal.resize(spark, media.where(col("media_type") === "image"), 20, 12)
    val feats = Multimodal.extractFeatures(spark, resized).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.decoded_w == 20 && f.decoded_h == 12))
  }

  test("resize updates dimensions and scales payload proportionally") {
    val resized = Multimodal.resize(spark, media, 32, 32)
    assert(resized.count() === media.count())
    val dims = resized.select("width", "height").distinct().collect()
    assert(dims.length === 1 && dims.head.getInt(0) === 32 && dims.head.getInt(1) === 32)
    // Payload must shrink when the target raster is smaller than source.
    val shrunk = resized.select(sum(length(col("payload")))).collect().head.getLong(0)
    val orig = media.select(sum(length(col("payload")))).collect().head.getLong(0)
    assert(shrunk < orig)
  }

  test("frame sampling explodes only videos, every nth frame, payload-bounded") {
    val frames = Multimodal.sampleFrames(spark, media, everyNth = 2)
    assert(frames.count() > 0)
    val nVideos = media.where(col("media_type") === "video").count()
    assert(frames.select("doc_id").distinct().count() === nVideos)
    // frame indices step by 2 starting at 0
    val idx = frames.select("frame_idx").distinct().collect().map(_.getInt(0))
    assert(idx.forall(_ % 2 == 0))
    val maxBytes = frames.select(max(length(col("frame")))).collect().head.getInt(0)
    assert(maxBytes <= 64)
  }
}
