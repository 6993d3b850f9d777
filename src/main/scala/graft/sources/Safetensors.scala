package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Safetensors shard sink + source for embedding tables — the
  * LLM-ecosystem EXCHANGE format for tensors (the huggingface/safetensors
  * public spec): a file is `u64-LE header length | UTF-8 JSON header |
  * raw tensor bytes`, where the header maps tensor names to
  * `{"dtype", "shape", "data_offsets"}` with offsets relative to the
  * byte buffer after the header. Zero-copy, mmap-friendly, and — unlike
  * pickle-era formats — safe to load, which is why trainers and vector
  * stores standardize on it for weights AND precomputed embeddings.
  * Together with fvecs ([[Fvecs]], the ANN-benchmark lineage) and
  * WebDataset tar ([[TarShards]], the sample-delivery lineage) this
  * closes the third interchange family a corpus pipeline meets.
  *
  * Each shard carries TWO tensors: `vec_ids` (I64, shape [n]) and
  * `embeddings` (F32, shape [n, dim]) — row i of one corresponds to row
  * i of the other, so identity survives the round trip (bare safetensors
  * has no row keys; pairing an id tensor with the data tensor is the
  * public convention for embedding dumps). All values little-endian per
  * the spec; the JSON header is emitted with a fixed key order and no
  * whitespace, so shard BYTES are a pure function of the input rows —
  * the determinism contract this repo keeps everywhere.
  *
  * Scale shape: [[write]] is one `foreachPartition` — each task streams
  * its rows into `part-<part>-<seq>.safetensors`, rolling at
  * `shardMaxRows` rows or [[ShardMaxBytes]] bytes, whichever first
  * (tensor sizes must be known before the header, so shards buffer in
  * memory — bounded by the roll budget, NOT the corpus). [[read]] plans each
  * shard as one `binaryFile` row and explodes vectors executor-side —
  * shards are the parallelism unit. No driver involvement on either
  * side beyond listing.
  */
object Safetensors {

  /** Per-shard byte ceiling: a shard is materialized in ONE
    * `ByteBuffer.allocate` (tensor sizes must precede the data in the
    * header), so its total bytes must fit an Int. Rolling at this
    * budget — not only at `shardMaxRows` — keeps large-dim dumps
    * working: at the default 1M rows × 512 floats the row-count roll
    * alone would ask for 4·n·dim ≥ 2^31 bytes and the Int narrowing
    * would throw mid-write. 1 GiB leaves ample header/ids headroom. */
  val ShardMaxBytes: Long = 1L << 30

  /** Minimal JSON emitter for the header: fixed key order, no
    * whitespace — byte-deterministic. */
  private def headerJson(n: Int, dim: Int, idsEnd: Long, embEnd: Long): String =
    s"""{"vec_ids":{"dtype":"I64","shape":[$n],"data_offsets":[0,$idsEnd]},""" +
      s""""embeddings":{"dtype":"F32","shape":[$n,$dim],"data_offsets":[$idsEnd,$embEnd]}}"""

  /** Write (vec_id: long, embedding: array&lt;float&gt;) rows as
    * safetensors shards under `path`, ≤ `shardMaxRows` vectors per
    * shard. Vectors must share one dimension (the first row of a shard
    * pins it; a mismatched row fails fast — a ragged tensor cannot be
    * expressed in the format). */
  def write(df: DataFrame, path: String, shardMaxRows: Int = 1 << 20,
            shardMaxBytes: Long = ShardMaxBytes): Unit = {
    require(shardMaxRows > 0, s"shardMaxRows must be positive: $shardMaxRows")
    require(shardMaxBytes > 0 && shardMaxBytes <= ShardMaxBytes,
      s"shardMaxBytes must be in (0, $ShardMaxBytes]: $shardMaxBytes")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val fs = new Path(path).getFileSystem(conf.value)
        var seq = 0
        val ids = new scala.collection.mutable.ArrayBuffer[Long]()
        val vecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
        def flush(): Unit = {
          if (ids.nonEmpty) {
            val n = ids.length
            val dim = vecs.head.length
            val idsBytes = 8L * n
            val embBytes = 4L * n * dim
            val header = headerJson(n, dim, idsBytes, idsBytes + embBytes)
              .getBytes(StandardCharsets.UTF_8)
            val buf = ByteBuffer.allocate(8 + header.length +
              idsBytes.toInt + embBytes.toInt).order(ByteOrder.LITTLE_ENDIAN)
            buf.putLong(header.length.toLong)
            buf.put(header)
            ids.foreach(i => buf.putLong(i))
            vecs.foreach(v => v.foreach(f => buf.putFloat(f)))
            val out = fs.create(
              new Path(path, f"part-$part%05d-$seq%04d.safetensors"), true)
            out.write(buf.array())
            out.close()
            seq += 1
            ids.clear(); vecs.clear()
          }
        }
        rows.foreach { r =>
          val v = r.getSeq[Float](1).toArray
          if (vecs.nonEmpty && v.length != vecs.head.length)
            throw new IllegalArgumentException(
              s"ragged embedding dim ${v.length} != ${vecs.head.length} (vec_id ${r.getLong(0)})")
          ids += r.getLong(0)
          vecs += v
          if (ids.length >= shardMaxRows ||
              (8L + 4L * v.length) * (ids.length + 1) >= shardMaxBytes) flush()
        }
        flush()
      }
  }

  private def tokenHeaderJson(n: Int, seqLen: Int, idsEnd: Long, tokEnd: Long): String =
    s"""{"example_ids":{"dtype":"I64","shape":[$n],"data_offsets":[0,$idsEnd]},""" +
      s""""input_ids":{"dtype":"I64","shape":[$n,$seqLen],"data_offsets":[$idsEnd,$tokEnd]}}"""

  /** Write (example_id: long, input_ids: array&lt;long&gt;) rows as
    * safetensors shards — the PACKED-TOKEN variant of [[write]]: an
    * `example_ids` I64 [n] tensor paired with an `input_ids` I64
    * [n, seqLen] tensor, which is exactly the file a trainer's data
    * loader mmaps. Same determinism and rolling contract as [[write]]. */
  def writeTokens(df: DataFrame, path: String, shardMaxRows: Int = 1 << 20,
                  shardMaxBytes: Long = ShardMaxBytes): Unit = {
    require(shardMaxRows > 0, s"shardMaxRows must be positive: $shardMaxRows")
    require(shardMaxBytes > 0 && shardMaxBytes <= ShardMaxBytes,
      s"shardMaxBytes must be in (0, $ShardMaxBytes]: $shardMaxBytes")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("example_id").cast("long"), col("input_ids").cast("array<long>"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val fs = new Path(path).getFileSystem(conf.value)
        var seq = 0
        val ids = new scala.collection.mutable.ArrayBuffer[Long]()
        val toks = new scala.collection.mutable.ArrayBuffer[Array[Long]]()
        def flush(): Unit = {
          if (ids.nonEmpty) {
            val n = ids.length
            val seqLen = toks.head.length
            val idsBytes = 8L * n
            val tokBytes = 8L * n * seqLen
            val header = tokenHeaderJson(n, seqLen, idsBytes, idsBytes + tokBytes)
              .getBytes(StandardCharsets.UTF_8)
            val buf = ByteBuffer.allocate(8 + header.length +
              idsBytes.toInt + tokBytes.toInt).order(ByteOrder.LITTLE_ENDIAN)
            buf.putLong(header.length.toLong)
            buf.put(header)
            ids.foreach(i => buf.putLong(i))
            toks.foreach(t => t.foreach(x => buf.putLong(x)))
            val out = fs.create(
              new Path(path, f"part-$part%05d-$seq%04d.safetensors"), true)
            out.write(buf.array())
            out.close()
            seq += 1
            ids.clear(); toks.clear()
          }
        }
        rows.foreach { r =>
          val t = r.getSeq[Long](1).toArray
          if (toks.nonEmpty && t.length != toks.head.length)
            throw new IllegalArgumentException(
              s"ragged example length ${t.length} != ${toks.head.length} (example ${r.getLong(0)})")
          ids += r.getLong(0)
          toks += t
          if (ids.length >= shardMaxRows ||
              (8L + 8L * t.length) * (ids.length + 1) >= shardMaxBytes) flush()
        }
        flush()
      }
  }

  /** Parsed header entry: dtype, shape, [start, end) offsets into the
    * data section. */
  final case class TensorMeta(dtype: String, shape: Seq[Long], start: Long, end: Long)

  /** Parse a safetensors byte buffer's header: returns the name→meta
    * map and the data-section offset. Public for the spec's hand-vector
    * checks. The JSON subset the spec's headers live in (objects,
    * strings, integer arrays) is parsed with a small recursive-descent
    * reader — dependency-free and total: malformed input throws. */
  def parseHeader(bytes: Array[Byte]): (Map[String, TensorMeta], Long) = {
    require(bytes.length >= 8, s"file too short for a safetensors header: ${bytes.length}")
    val hlen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    require(hlen > 0 && 8 + hlen <= bytes.length, s"bad header length $hlen")
    val json = new String(bytes, 8, hlen.toInt, StandardCharsets.UTF_8)
    val metas = parseJsonObject(json).collect {
      case (name, fields: Map[String @unchecked, Any @unchecked]) if name != "__metadata__" =>
        val offs = fields("data_offsets").asInstanceOf[Seq[Long]]
        name -> TensorMeta(fields("dtype").asInstanceOf[String],
          fields("shape").asInstanceOf[Seq[Long]], offs(0), offs(1))
    }
    (metas, 8 + hlen)
  }

  // ---- minimal JSON reader (header grammar: nested objects, strings,
  // arrays, integer numbers; no floats/bools/null appear in safetensors
  // headers we accept) ----
  private def parseJsonObject(s: String): Map[String, Any] = {
    val p = new JsonCursor(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing bytes after JSON header at ${p.pos}")
    v.asInstanceOf[Map[String, Any]]
  }

  private final class JsonCursor(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos in header JSON")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of header JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case c if c == '-' || c.isDigit => num()
        case c => throw new IllegalArgumentException(s"unexpected '$c' at $pos in header JSON")
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{')
      val b = Map.newBuilder[String, Any]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var more = true
      while (more) {
        skipWs()
        val k = str()
        expect(':')
        b += (k -> value())
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect('}')
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('[')
      val b = Seq.newBuilder[Any]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        require(c != '\\', "escapes not used in safetensors tensor names we emit")
        sb += c
        pos += 1
      }
      expect('"')
      sb.toString
    }
    private def num(): Long = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && s.charAt(pos).isDigit) pos += 1
      require(pos > start, s"bad number at $start in header JSON")
      s.substring(start, pos).toLong
    }
  }

  /** Decode one shard's bytes into (vec_id, embedding) pairs. Public
    * for the spec. Validates dtype/shape/offset consistency. */
  def parseShard(bytes: Array[Byte]): Seq[(Long, Array[Float])] = {
    val (metas, dataOff) = parseHeader(bytes)
    val idsM = metas.getOrElse("vec_ids",
      throw new IllegalArgumentException("missing vec_ids tensor"))
    val embM = metas.getOrElse("embeddings",
      throw new IllegalArgumentException("missing embeddings tensor"))
    require(idsM.dtype == "I64", s"vec_ids dtype ${idsM.dtype} != I64")
    require(embM.dtype == "F32", s"embeddings dtype ${embM.dtype} != F32")
    require(idsM.shape.length == 1 && embM.shape.length == 2 &&
      idsM.shape.head == embM.shape.head,
      s"shape mismatch: ids ${idsM.shape} vs emb ${embM.shape}")
    val n = idsM.shape.head.toInt
    val dim = embM.shape(1).toInt
    require(idsM.end - idsM.start == 8L * n, "vec_ids byte extent != 8*n")
    require(embM.end - embM.start == 4L * n * dim, "embeddings byte extent != 4*n*dim")
    require(dataOff + embM.end <= bytes.length, "data section truncated")
    val ib = ByteBuffer.wrap(bytes, (dataOff + idsM.start).toInt, (8 * n))
      .order(ByteOrder.LITTLE_ENDIAN)
    val eb = ByteBuffer.wrap(bytes, (dataOff + embM.start).toInt, 4 * n * dim)
      .order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).map { _ =>
      val id = ib.getLong
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) { v(j) = eb.getFloat; j += 1 }
      (id, v)
    }
  }

  /** Decode one packed-token shard: (example_id, input_ids) pairs.
    * Public for the spec. */
  def parseTokenShard(bytes: Array[Byte]): Seq[(Long, Array[Long])] = {
    val (metas, dataOff) = parseHeader(bytes)
    val idsM = metas.getOrElse("example_ids",
      throw new IllegalArgumentException("missing example_ids tensor"))
    val tokM = metas.getOrElse("input_ids",
      throw new IllegalArgumentException("missing input_ids tensor"))
    require(idsM.dtype == "I64" && tokM.dtype == "I64",
      s"packed-token shard must be I64/I64: ${idsM.dtype}/${tokM.dtype}")
    require(idsM.shape.length == 1 && tokM.shape.length == 2 &&
      idsM.shape.head == tokM.shape.head,
      s"shape mismatch: ids ${idsM.shape} vs input_ids ${tokM.shape}")
    val n = idsM.shape.head.toInt
    val seqLen = tokM.shape(1).toInt
    require(idsM.end - idsM.start == 8L * n, "example_ids byte extent != 8*n")
    require(tokM.end - tokM.start == 8L * n * seqLen, "input_ids byte extent != 8*n*L")
    require(dataOff + tokM.end <= bytes.length, "data section truncated")
    val ib = ByteBuffer.wrap(bytes, (dataOff + idsM.start).toInt, 8 * n)
      .order(ByteOrder.LITTLE_ENDIAN)
    val tb = ByteBuffer.wrap(bytes, (dataOff + tokM.start).toInt, 8 * n * seqLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).map { _ =>
      val id = ib.getLong
      val t = new Array[Long](seqLen)
      var j = 0
      while (j < seqLen) { t(j) = tb.getLong; j += 1 }
      (id, t)
    }
  }

  /** Read a packed-token shard directory back as
    * (shard, example_id, input_ids). */
  def readTokens(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/*.safetensors")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = p.split('/').last
        parseTokenShard(bytes).iterator.map { case (id, t) => (shard, id, t) }
      }
      .toDF("shard", "example_id", "input_ids")
  }

  /** Read a shard directory back as (shard, vec_id, embedding) — one
    * binaryFile row per shard, vectors exploded executor-side. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/*.safetensors")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = p.split('/').last
        parseShard(bytes).iterator.map { case (id, v) => (shard, id, v) }
      }
      .toDF("shard", "vec_id", "embedding")
  }
}
