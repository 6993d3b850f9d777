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

  test("modality-filtered synthesis ≡ full synthesis filtered after (r19 pushdown)") {
    // the single-modality keys synthesize only their modality's rows;
    // the pushdown must be invisible in the bytes
    for (t <- Seq("image", "audio", "video")) {
      val pushed = Multimodal.toMediaTable(Tables.documents(spark, sf0001), t)
        .orderBy("doc_id").collect()
      val full = media.where(col("media_type") === t)
        .orderBy("doc_id").collect()
      assert(pushed.length === full.length && pushed.nonEmpty, s"$t row count")
      pushed.zip(full).foreach { case (a, b) =>
        assert(a.getLong(0) === b.getLong(0), s"$t doc_id")
        assert(java.util.Arrays.equals(
          a.getAs[Array[Byte]]("payload"), b.getAs[Array[Byte]]("payload")),
          s"$t payload bytes for doc ${a.getLong(0)}")
      }
    }
    intercept[IllegalArgumentException] {
      Multimodal.toMediaTable(Tables.documents(spark, sf0001), "hologram")
    }
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

  test("mp4 container headers parse for real: dims/duration from moov boxes, " +
    "features stay the documented byte fallback, corrupt bytes degrade") {
    // decode: video rows now report the CONTAINER's presentation dims
    // (a header walk, not a codec — features remain byte histograms)
    val vids = media.where(col("media_type") === "video")
    val metaDims = vids.select("doc_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val feats = Multimodal.extractFeatures(spark, vids).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert((f.decoded_w, f.decoded_h) === metaDims(f.doc_id),
        s"doc ${f.doc_id}: container dims != metadata dims")
    }
    // the header report: every clip, exact integer duration
    val hdrs = Multimodal.videoHeaders(spark, vids).collect()
    assert(hdrs.length === metaDims.size)
    hdrs.foreach { r =>
      val (id, w, h, us) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
      assert((w, h) === metaDims(id))
      assert(us === Multimodal.videoDurationMs(id) * 1000L,
        s"doc $id: duration_us $us")
    }
    // unit round-trip incl. a v0 header, and the degrade paths: bad
    // magic and a truncated container both return null (byte fallback)
    val enc = Multimodal.encodeMp4(320, 240, 5000L, Array.fill[Byte](64)(7))
    assert(Multimodal.parseMp4Header(enc) ===
      Multimodal.Mp4Header(320, 240, 5000000L))
    assert(Multimodal.parseMp4Header("not an mp4 at all".getBytes) == null)
    assert(Multimodal.parseMp4Header(java.util.Arrays.copyOf(enc, 40)) == null)
    // corrupt payloads flow through decode as fallback rows, not errors
    val corrupt = vids.limit(3).selectExpr("doc_id", "media_type", "format",
      "width", "height", "cast('junk' as binary) as payload")
    assert(Multimodal.extractFeatures(spark, corrupt).collect()
      .forall(f => f.decoded_w == -1 && f.decoded_h == -1))
  }

  test("WAV payloads really decode: sample rate and frame count come from " +
    "the decoded header, histogram sums to 1") {
    val audio = media.where(col("media_type") === "audio")
    val metaFrames = audio.collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    val feats = Multimodal.extractFeatures(spark, audio).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.decoded_w == 8000, s"sample rate not decoded: $f")
      assert(f.decoded_h == metaFrames(f.doc_id),
        s"decoded frame count ${f.decoded_h} != synthesized ${metaFrames(f.doc_id)}")
      val s = f.feature.sum
      assert(math.abs(s - 1.0f) < 1e-4, s"histogram sum $s")
    }
  }

  test("audioStats: duration/RMS/clipping recompute from the deterministic " +
    "wave; exactly the amp>32767 ids clip") {
    val stats = Multimodal.audioStats(spark, media).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats.nonEmpty)
    stats.foreach { case (docId, (rate, n, durUs, rmsMilli, clipPpm)) =>
      val (period, nFrames, amp) = Multimodal.audioParams(docId)
      assert(rate == 8000 && n == nFrames.toLong)
      assert(durUs == nFrames.toLong * 1000000L / 8000L, s"doc $docId duration")
      // independent recompute of RMS and clipping from the same wave
      var sumSq = 0L; var clipped = 0L; var i = 0
      while (i < nFrames) {
        val s = Multimodal.triSample(i, period, amp)
        sumSq += s.toLong * s; if (s >= 32767 || s <= -32768) clipped += 1
        i += 1
      }
      assert(rmsMilli == (math.sqrt(sumSq.toDouble / nFrames) * 1000.0 / 32768.0).toLong,
        s"doc $docId rms")
      assert(clipPpm == clipped * 1000000L / nFrames, s"doc $docId clip")
      // the synthesis contract: nominal amp past the rail ⟺ real clipping
      assert((clipPpm > 0) == (amp > 32767),
        s"doc $docId amp=$amp clipPpm=$clipPpm — clipping signal broken")
    }
    // both populations must exist or the signal is untested
    assert(stats.values.exists(_._5 > 0) && stats.values.exists(_._5 == 0L))
  }

  test("corrupt WAV payloads degrade to the byte fallback, never kill the task") {
    import spark.implicits._
    val good = media.where(col("media_type") === "audio").limit(1)
      .as[Multimodal.MediaRecord].collect()(0)
    val corrupt = Seq(
      good.copy(doc_id = 900L, payload = good.payload.take(10)),       // truncated header
      good.copy(doc_id = 901L, payload = Array[Byte](1, 2, 3, 4, 5))) // garbage
      .toDF()
    val feats = Multimodal.extractFeatures(spark, corrupt).collect()
    assert(feats.length === 2)
    assert(feats.forall(f => f.decoded_w == -1 && f.decoded_h == -1),
      "corrupt WAV did not fall back to byte features")
    // and audioStats simply drops them
    assert(Multimodal.audioStats(spark, corrupt).count() === 0L)
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
