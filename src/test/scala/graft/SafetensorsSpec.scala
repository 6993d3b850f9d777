package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.Safetensors

/** The safetensors sink/source contract, checked against the PUBLIC
  * format spec by hand in the test (8-byte LE header length, exact
  * header JSON, little-endian tensor bytes at the declared offsets) —
  * a differential against the spec, not self-consistency through our
  * own parser — plus round-trip fidelity on the real corpus,
  * deterministic bytes, row-capped rolling, and fail-fast on ragged
  * input / malformed headers. */
class SafetensorsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_st_$tag"
    val d = new java.io.File(p)
    if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    p
  }

  private def shardFiles(dir: String) = new java.io.File(dir).listFiles()
    .filter(_.getName.endsWith(".safetensors")).sortBy(_.getName)

  test("written bytes match the safetensors spec, decoded BY HAND: " +
    "LE header length, exact JSON, offsets, LE I64/F32 payloads") {
    val dir = freshDir("spec")
    val df = Seq((7L, Seq(1.5f, -2.0f, 3.25f)), (9L, Seq(0.0f, 42.0f, -1.0f)))
      .toDF("vec_id", "embedding").coalesce(1)
    Safetensors.write(df, dir)
    val files = shardFiles(dir)
    assert(files.length == 1, s"expected one shard: ${files.toSeq}")
    val bytes = Files.readAllBytes(Paths.get(files.head.getPath))

    // hand-decode per the public spec — NOT via Safetensors.parseHeader
    val hlen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    val json = new String(bytes, 8, hlen.toInt, "UTF-8")
    val expectedJson =
      """{"vec_ids":{"dtype":"I64","shape":[2],"data_offsets":[0,16]},""" +
        """"embeddings":{"dtype":"F32","shape":[2,3],"data_offsets":[16,40]}}"""
    assert(json == expectedJson, s"header JSON drifted: $json")
    assert(bytes.length == 8 + hlen + 16 + 24, "file length != header + tensors")
    val data = ByteBuffer.wrap(bytes, (8 + hlen).toInt, 40).order(ByteOrder.LITTLE_ENDIAN)
    assert(data.getLong == 7L && data.getLong == 9L, "vec_ids payload")
    val floats = (0 until 6).map(_ => data.getFloat)
    assert(floats == Seq(1.5f, -2.0f, 3.25f, 0.0f, 42.0f, -1.0f), s"F32 payload: $floats")
  }

  test("round-trip on the real corpus is bit-exact, across partitions") {
    val dir = freshDir("rt")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    Safetensors.write(emb.repartition(4), dir, shardMaxRows = 20)
    val back = Safetensors.read(spark, dir)
    assert(back.count() == emb.count(), "row count changed in transit")
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    back.collect().foreach { r =>
      val got = r.getSeq[Float](2).toSeq
      assert(orig(r.getLong(1)) == got, s"vec ${r.getLong(1)} not bit-exact")
    }
  }

  test("rolls a new shard every shardMaxRows; bytes are deterministic " +
    "across writes") {
    val dir1 = freshDir("roll1")
    val dir2 = freshDir("roll2")
    val df = (0 until 25).map(i => (i.toLong, Seq(i.toFloat, -i.toFloat)))
      .toDF("vec_id", "embedding").coalesce(1)
    Safetensors.write(df, dir1, shardMaxRows = 10)
    Safetensors.write(df, dir2, shardMaxRows = 10)
    val f1 = shardFiles(dir1)
    assert(f1.length == 3, s"25 rows / cap 10 should roll 3 shards: ${f1.toSeq}")
    val sizes = f1.map(f => f.getName -> f.length()).toMap
    // 10+10+5 rows; per shard: 8 + hlen + 8n + 8n (dim 2 → 4*2n)
    assert(sizes.values.toSeq.sorted.reverse.head > sizes.values.min,
      "last shard should be the short one")
    f1.zip(shardFiles(dir2)).foreach { case (a, b) =>
      assert(a.getName == b.getName, "shard naming drifted")
      assert(Files.readAllBytes(Paths.get(a.getPath)).toSeq ==
        Files.readAllBytes(Paths.get(b.getPath)).toSeq,
        s"${a.getName}: bytes not deterministic")
    }
  }

  test("rolls by BYTE budget too: a large-dim dump can never ask for an " +
    "over-Int buffer, and budget-rolled shards round-trip exactly") {
    val dir = freshDir("byteroll")
    val dim = 8
    val df = (0 until 20).map(i => (i.toLong, Seq.fill(dim)(i.toFloat)))
      .toDF("vec_id", "embedding").coalesce(1)
    // (8 + 4*dim) bytes of tensor payload per row = 40; a 200-byte
    // budget rolls every 4 rows even though shardMaxRows is huge —
    // exactly the guard that keeps 1M-row × 512-float dumps under
    // ByteBuffer's Int ceiling instead of throwing mid-write.
    Safetensors.write(df, dir, shardMaxRows = 1 << 20, shardMaxBytes = 200L)
    val files = shardFiles(dir)
    assert(files.length == 5, s"20 rows / 4-row byte budget should roll 5 shards: ${files.toSeq}")
    val back = Safetensors.read(spark, dir).collect()
      .map(r => (r.getLong(1), r.getSeq[Float](2).toSeq)).toSet
    assert(back == (0 until 20).map(i => (i.toLong, Seq.fill(dim)(i.toFloat))).toSet,
      "byte-budget rolling lost or corrupted rows")
  }

  test("ragged dims fail fast; malformed headers are rejected") {
    val dir = freshDir("ragged")
    val bad = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Safetensors.write(bad, dir)
    }
    assert(e.getCause != null || e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))

    intercept[IllegalArgumentException] {
      Safetensors.parseHeader(Array[Byte](1, 2, 3))
    }
    // header length pointing past the buffer
    val lying = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(9999L).array()
    intercept[IllegalArgumentException] { Safetensors.parseHeader(lying) }
    // valid length, junk JSON
    val junk = "{oops".getBytes("UTF-8")
    val withLen = ByteBuffer.allocate(8 + junk.length).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(junk.length.toLong).put(junk).array()
    intercept[IllegalArgumentException] { Safetensors.parseHeader(withLen) }
  }

  test("packedTokens equals the driver-side fold of the same recipe: " +
    "shuffle order, vocab ids, EOS placement, tail drop — bit for bit") {
    import graft.operators.{CorpusPipeline, Dedup}
    val L = 128
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val packed = CorpusPipeline.packedTokens(docs, L, epoch = 1, vocabTop = 50)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toSeq
    // driver reference: same recipe, plain Scala (skey via the spec'd
    // hash60 primitive evaluated once per doc)
    val keyed = docs.select(col("doc_id"),
        Dedup.hash60(concat(col("doc_id").cast("string"), lit(":1"))).as("skey"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val freq = keyed.flatMap(d => toks(d._3)).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 2L) }.toMap
    val stream = keyed.sortBy(d => (d._2, d._1))
      .flatMap(d => toks(d._3).map(t => vocab.getOrElse(t, 1L)) :+ 0L)
    val want = stream.grouped(L).filter(_.length == L).zipWithIndex
      .map { case (g, i) => i.toLong -> g.toVector }.toSeq
    assert(packed.sortBy(_._1) == want, "packed examples diverge from the driver fold")
    assert(packed.nonEmpty && packed.forall(_._2.length == L))
  }

  test("packed-token shards roundtrip: spec-valid I64/I64 pair, readTokens " +
    "returns the written examples exactly") {
    import graft.operators.CorpusPipeline
    val L = 64
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val packed = CorpusPipeline.packedTokens(docs, L, 1, 100)
      .repartitionByRange(2, col("example_id")).sortWithinPartitions("example_id")
    val dir = freshDir("packed")
    Safetensors.writeTokens(packed, dir, shardMaxRows = 7)
    val files = shardFiles(dir)
    assert(files.nonEmpty)
    // hand-parse one shard: shapes consistent, rows of length L
    val rows = Safetensors.parseTokenShard(Files.readAllBytes(files.head.toPath))
    assert(rows.nonEmpty && rows.forall(_._2.length == L))
    assert(rows.size <= 7, "shard rolled past shardMaxRows")
    val back = Safetensors.readTokens(spark, dir)
      .select("example_id", "input_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).sortBy(_._1).toSeq
    val want = packed.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).sortBy(_._1).toSeq
    assert(back == want, "token shards did not roundtrip")
  }
}
