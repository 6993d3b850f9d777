package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

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
  * TWO modalities are REAL end to end:
  *  - IMAGE: `toMediaTable` synthesizes valid PNG payloads
  *    (deterministic gradient rasters keyed by doc_id), [[decode]]
  *    decodes them with `javax.imageio` (in the JDK) into
  *    pixel-luminance features, and [[resize]] resamples through a
  *    Graphics2D raster scale and re-encodes.
  *  - AUDIO (r14): `toMediaTable` synthesizes valid WAV payloads —
  *    16-bit signed PCM mono, a deterministic integer triangle wave
  *    keyed by doc_id (no trig, so the bytes are a pure function of
  *    the id on any JVM), amplitude-capped so a subset of docs
  *    genuinely CLIPS — written through
  *    `javax.sound.sampled.AudioSystem` (also in the JDK; the earlier
  *    "no audio codecs in the JDK" claim was wrong). [[decode]] reads
  *    them back through `AudioSystem.getAudioInputStream`, and
  *    [[audioStats]] reports duration / sample rate / RMS / clipping
  *    fraction per clip.
  * VIDEO (r15) is honest about exactly what is real: payloads are
  * valid ISO-BMFF containers (ftyp/moov/mdat) whose HEADERS —
  * presentation dims in tkhd, timescale/duration in mvhd — are
  * synthesized and re-parsed for real by a stdlib box walk
  * ([[parseMp4Header]], [[videoHeaders]]); the mdat payload stays
  * opaque and features fall back to byte histograms, because the JDK
  * ships no video demuxer/codec. Swapping a real decoder in changes
  * only that branch, as the image and audio paths demonstrate.
  */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache: every
  // ImageIO.read(InputStream)/write(..., OutputStream) round-trips the
  // payload through a temp file on disk. All payloads here are
  // in-memory byte arrays (KB-scale), so the disk cache is pure
  // per-row overhead — a create/write/delete syscall trio per decode
  // and per encode. Memory-cached streams produce byte-identical
  // results (the cache is transport, not codec). Set once per JVM at
  // object init; executors initialize the object when the first
  // mapPartitions closure touches it.
  ImageIO.setUseCache(false)

  /** Whole-raster RGB grab in ONE call — `getRGB(x, y)` pays a color-
    * model conversion and bounds check per pixel; the bulk overload
    * returns the identical default-RGB values for the full raster in
    * row-major order. Decode-side hot loops index this array. */
  private[multimodal] def rgbRows(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

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

  /** Audio synthesis parameters, all pure functions of doc_id. The
    * nominal amplitude EXCEEDS 16-bit range for ids with
    * `docId % 12 >= 9` (24000 + 9·1000 > 32767), so those clips carry
    * real clipped samples — [[audioStats]]'s clipping fraction has
    * something true to measure. */
  val AudioRateHz = 8000f
  def audioParams(docId: Long): (Int, Int, Int) = {
    val period = 50 + (docId % 50).toInt            // triangle period, frames
    val nFrames = 400 + (docId % 37).toInt * 8      // clip length
    val amp = 24000 + (docId % 12).toInt * 1000     // nominal amplitude
    (period, nFrames, amp)
  }

  /** One 16-bit sample of the deterministic triangle wave — integer
    * arithmetic only, capped to the PCM range (the cap IS the clip). */
  def triSample(i: Int, period: Int, amp: Int): Int = {
    val ph = i % period
    val half = period / 2
    val tri =
      if (ph < half) -amp + (2 * amp * ph) / half
      else amp - (2 * amp * (ph - half)) / (period - half)
    math.max(-32768, math.min(32767, tri))
  }

  /** A valid WAV payload: 16-bit signed PCM, mono, little-endian,
    * written through the JDK's own `AudioSystem` WAV writer. */
  private def encodeWav(docId: Long, buf: ByteArrayOutputStream): Array[Byte] = {
    val (period, nFrames, amp) = audioParams(docId)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = triSample(i, period, amp)
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioRateHz, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    buf.reset()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  /** Video duration in milliseconds, a pure function of doc_id. */
  def videoDurationMs(docId: Long): Long = 3000L + (docId % 240) * 100L

  private def be32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** A minimal ISO-BMFF (MP4) container skeleton:
    * `ftyp` + `moov(mvhd, trak(tkhd))` + `mdat(payload)`. The header
    * boxes carry REAL presentation metadata — movie timescale/duration
    * in `mvhd`, track width/height as 16.16 fixed-point in `tkhd`, the
    * exact fields every container-header reader parses — while `mdat`
    * holds opaque bytes with no sample tables (no codec claim is made;
    * [[parseMp4Header]] is a header walk, not a decode). */
  private[graft] def encodeMp4(w: Int, h: Int, durationMs: Long,
                                    payload: Array[Byte]): Array[Byte] = {
    val timescale = 1000L // movie time units per second → duration in ms
    val out = new ByteArrayOutputStream(payload.length + 256)
    // ftyp
    be32(out, 16); fourcc(out, "ftyp"); fourcc(out, "isom"); be32(out, 0)
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92))
    be32(out, 8 + 108 + 8 + 92); fourcc(out, "moov")
    // mvhd, version 0
    be32(out, 108); fourcc(out, "mvhd")
    be32(out, 0)                 // version + flags
    be32(out, 0); be32(out, 0)   // creation/modification (0 — determinism)
    be32(out, timescale)
    be32(out, durationMs)        // duration in timescale units
    be32(out, 0x00010000L)       // rate 1.0
    be32(out, 0x01000000L)       // volume 1.0 + reserved u16
    be32(out, 0); be32(out, 0)   // reserved
    be32(out, 0x00010000L); be32(out, 0); be32(out, 0) // unity matrix
    be32(out, 0); be32(out, 0x00010000L); be32(out, 0)
    be32(out, 0); be32(out, 0); be32(out, 0x40000000L)
    (0 until 6).foreach(_ => be32(out, 0)) // pre_defined
    be32(out, 2)                 // next_track_id
    // trak(tkhd)
    be32(out, 8 + 92); fourcc(out, "trak")
    be32(out, 92); fourcc(out, "tkhd")
    be32(out, 7)                 // version 0, flags: enabled|in_movie|in_preview
    be32(out, 0); be32(out, 0)   // creation/modification
    be32(out, 1)                 // track_id
    be32(out, 0)                 // reserved
    be32(out, durationMs)
    be32(out, 0); be32(out, 0)   // reserved
    be32(out, 0)                 // layer u16 + alternate_group u16
    be32(out, 0)                 // volume u16 + reserved u16
    be32(out, 0x00010000L); be32(out, 0); be32(out, 0) // unity matrix
    be32(out, 0); be32(out, 0x00010000L); be32(out, 0)
    be32(out, 0); be32(out, 0); be32(out, 0x40000000L)
    be32(out, w.toLong << 16)    // width, 16.16 fixed
    be32(out, h.toLong << 16)    // height, 16.16 fixed
    // mdat
    be32(out, 8L + payload.length); fourcc(out, "mdat"); out.write(payload)
    out.toByteArray
  }

  /** Parsed MP4 presentation header: (width, height, duration_us). */
  private[graft] final case class Mp4Header(width: Int, height: Int,
                                                durationUs: Long)

  /** Stdlib-only ISO-BMFF box walk — `moov`→`mvhd` for
    * timescale/duration, `moov`→`trak`→`tkhd` for the track's 16.16
    * width/height. Returns null when the bytes are not a walkable
    * container (bad magic, truncated box, zero timescale…) — the
    * byte-fallback trigger, same contract as the PNG and WAV branches.
    * Version-1 boxes (64-bit times) are handled at their shifted
    * offsets; nothing here touches sample data, so the parse cost is a
    * few dozen header bytes regardless of payload size. */
  private[graft] def parseMp4Header(bytes: Array[Byte]): Mp4Header = {
    def u32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def boxType(off: Int): String =
      if (off + 8 > bytes.length) ""
      else new String(bytes, off + 4, 4, "US-ASCII")
    // walk [from, until) returning the offset of the first `name` box
    def find(name: String, from: Int, until: Int): Int = {
      var off = from
      while (off + 8 <= until) {
        val size = u32(off)
        if (size < 8 || off + size > until) return -1
        if (boxType(off) == name) return off
        off += size.toInt
      }
      -1
    }
    try {
      val n = bytes.length
      if (find("ftyp", 0, n) != 0) return null
      val moov = find("moov", 0, n)
      if (moov < 0) return null
      val moovEnd = moov + u32(moov).toInt
      val mvhd = find("mvhd", moov + 8, moovEnd)
      if (mvhd < 0) return null
      val mvhdVer = (u32(mvhd + 8) >> 24).toInt
      val (timescale, duration) =
        if (mvhdVer == 0) (u32(mvhd + 20), u32(mvhd + 24))
        else (u32(mvhd + 28), (u32(mvhd + 32) << 32) | u32(mvhd + 36)) // v1: u64 times
      if (timescale <= 0) return null
      val trak = find("trak", moov + 8, moovEnd)
      if (trak < 0) return null
      val tkhd = find("tkhd", trak + 8, trak + u32(trak).toInt)
      if (tkhd < 0) return null
      val tkhdVer = (u32(tkhd + 8) >> 24).toInt
      val whOff = if (tkhdVer == 0) tkhd + 8 + 76 else tkhd + 8 + 88
      val w = (u32(whOff) >> 16).toInt
      val h = (u32(whOff + 4) >> 16).toInt
      if (w <= 0 || h <= 0) return null
      Mp4Header(w, h, duration * 1000000L / timescale)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def encodePng(docId: Long, w: Int, h: Int, buf: ByteArrayOutputStream): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // bulk setRGB: same pixels as the per-pixel loop, one raster store
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(docId, x, y); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
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
              // REAL WAV payload; width carries the frame count, height
              // the channel count (the schema is modality-agnostic).
              val (_, nFrames, _) = audioParams(docId)
              MediaRecord(docId, "audio", "wav", nFrames, 1,
                encodeWav(docId, buf))
            case _ =>
              // real ISO-BMFF container skeleton: parseable ftyp/moov
              // header (dims + duration), text bytes as the opaque mdat
              val w = ((docId % 64) * 16 + 16).toInt
              val h = ((docId % 48) * 16 + 16).toInt
              MediaRecord(docId, "video", "mp4", w, h,
                encodeMp4(w, h, videoDurationMs(docId), text.getBytes("UTF-8")))
          }
        }
      }.toDF()
  }

  /** [[toMediaTable]] restricted to ONE modality. The doc_id % 3
    * routing is the table's own synthesis contract, so filtering the
    * ids BEFORE the synthesis map prunes the other modalities' rows
    * before their payloads are ever encoded — the row-group/predicate
    * pushdown a real lake gives a media_type filter, applied to the
    * synthetic stand-in (r19: the audio/image-only keys were paying
    * full-corpus PNG+WAV+MP4 encode to then drop 2/3 of the rows).
    * Output is bit-identical to
    * `toMediaTable(docs).where(media_type === t)`. */
  def toMediaTable(docs: DataFrame, mediaType: String): DataFrame = {
    val idx = MediaTypes.indexOf(mediaType)
    require(idx >= 0, s"unknown media type: $mediaType")
    toMediaTable(docs.where(pmod(col("doc_id"), lit(3L)) === idx.toLong))
  }

  /** Byte-level payload stats shared by every branch. */
  private def meanByte(bytes: Array[Byte]): Double = {
    val n = math.max(bytes.length, 1)
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    math.rint(sum.toDouble / n * 1e6) / 1e6
  }

  /** Decoded 16-bit mono PCM samples of a WAV payload, or null when no
    * reader claims the bytes / the body is corrupt (the byte-fallback
    * trigger, same contract as the image branch). */
  private[multimodal] def decodeWav(bytes: Array[Byte]): (Array[Int], Float) = {
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) null
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val samples = new Array[Int](n)
          var i = 0
          if (fmt.isBigEndian)
            while (i < n) { samples(i) = (raw(i * 2) << 8) | (raw(i * 2 + 1) & 0xff); i += 1 }
          else
            while (i < n) { samples(i) = (raw(i * 2 + 1) << 8) | (raw(i * 2) & 0xff); i += 1 }
          (samples, fmt.getSampleRate)
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Decode one record. PNG → real `javax.imageio` decode to a
    * normalized FeatureDim-bin luminance histogram + decoded dims;
    * WAV → real `javax.sound.sampled` decode to a normalized
    * FeatureDim-bin |amplitude| histogram, decoded_w = sample rate,
    * decoded_h = frame count; other formats → byte-histogram features
    * (documented synthetic fallback — the JDK ships no video codec). */
  private[multimodal] def decode(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    // Undecodable payloads surface BOTH ways: ImageIO.read returns
    // null when no reader claims the stream (bad magic) and THROWS
    // IIOException when a reader claims it but the body is corrupt or
    // truncated. At lake scale both are certainties — degrade to the
    // byte path, never kill the task.
    var wav0: (Array[Int], Float) = null
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
      val px = rgbRows(img) // identical values to per-pixel getRGB
      var i = 0
      val np = w * h
      while (i < np) {
        val rgb = px(i)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        feature(lum * FeatureDim / 256) += 1.0f
        i += 1
      }
      val n = (w * h).toFloat
      var j = 0
      while (j < FeatureDim) { feature(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_type, bytes.length, meanByte(bytes), w, h, feature)
    } else if (r.format == "wav" && { wav0 = decodeWav(bytes); wav0 != null }) {
      val (samples, rate) = wav0
      val feature = new Array[Float](FeatureDim)
      var i = 0
      while (i < samples.length) {
        val a = math.min(math.abs(samples(i)), 32767)
        feature(a * FeatureDim / 32768) += 1.0f
        i += 1
      }
      val n = math.max(samples.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { feature(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_type, bytes.length, meanByte(bytes),
        rate.toInt, samples.length, feature)
    } else {
      // video (r15): a container-HEADER parse recovers the real
      // presentation dims from moov/tkhd — no codec in the JDK, so the
      // feature stays the byte histogram (documented fallback), but
      // decoded_w/h now come from the container, not a -1 shrug
      val hdr = if (r.format == "mp4") parseMp4Header(bytes) else null
      val feature = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        feature((bytes(i) & 0xff) % FeatureDim) += 1.0f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { feature(j) /= n; j += 1 }
      MediaFeatures(r.doc_id, r.media_type, bytes.length, meanByte(bytes),
        if (hdr != null) hdr.width else -1,
        if (hdr != null) hdr.height else -1, feature)
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

  /** Per-clip video container-header report — the honest video twin of
    * [[audioStats]]: a REAL ftyp/moov box walk on the executors (a few
    * dozen header bytes per clip regardless of payload size; payload
    * bytes never shuffle), reporting the presentation metadata a
    * curation gate can filter on without any codec: container dims and
    * exact integer duration_us. Unparseable payloads drop out (they
    * surface through [[decode]]'s byte-fallback path instead). */
  def videoHeaders(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .filter((r: MediaRecord) => r.media_type == "video")
      .flatMap { r =>
        Option(parseMp4Header(r.payload))
          .map(hd => (r.doc_id, hd.width, hd.height, hd.durationUs))
      }
      .toDF("doc_id", "width", "height", "duration_us")
      .orderBy("doc_id")
  }

  /** Per-clip audio quality report — the audio twin of the image
    * decode path: REAL `javax.sound.sampled` WAV decode on the
    * executors (per-partition iteration, payload bytes never shuffle —
    * the aggregate happens on the extracted scalars), reporting the
    * metrics an audio-corpus curation gate filters on:
    *
    *  - `duration_us`: exact integer microseconds (frames·10⁶/rate —
    *    a double-seconds column would float-drift across engines),
    *  - `sample_rate`, `n_frames`: from the decoded header, not the
    *    synthesis metadata (the decode is the source of truth),
    *  - `rms_milli`: RMS amplitude in integer milli-units of
    *    full-scale (⌊√(Σs²/n)·1000/32768⌋ — loudness proxy),
    *  - `clip_ppm`: fraction of samples at the PCM rails in integer
    *    ppm (⌊hits·10⁶/n⌋ — the standard clipping-detection signal).
    *
    * Undecodable payloads drop out (they surface through [[decode]]'s
    * byte-fallback path and q18's rollup instead). */
  def audioStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .filter((r: MediaRecord) => r.media_type == "audio")
      .flatMap { r =>
        val wav = decodeWav(r.payload)
        if (wav == null) Iterator.empty
        else {
          val (samples, rate) = wav
          val n = samples.length
          var sumSq = 0L
          var clipped = 0L
          var i = 0
          while (i < n) {
            val s = samples(i).toLong
            sumSq += s * s
            if (s >= 32767L || s <= -32768L) clipped += 1
            i += 1
          }
          val durUs = if (rate > 0) (n.toLong * 1000000L / rate.toLong) else 0L
          val rmsMilli =
            if (n == 0) 0L
            else (math.sqrt(sumSq.toDouble / n) * 1000.0 / 32768.0).toLong
          val clipPpm = if (n == 0) 0L else clipped * 1000000L / n
          Iterator.single((r.doc_id, rate.toInt, n.toLong, durUs, rmsMilli, clipPpm))
        }
      }
      .toDF("doc_id", "sample_rate", "n_frames", "duration_us", "rms_milli", "clip_ppm")
      .orderBy("doc_id")
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
