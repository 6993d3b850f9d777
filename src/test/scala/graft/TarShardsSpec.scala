package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.TarShards

/** The tar-shard sink/source contract: USTAR validity against the
  * SYSTEM tar binary (the external differential — our writer must be
  * readable by stock tooling, not merely by our own reader),
  * deterministic bytes, roundtrip fidelity, and shard-size rolling. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_tar_$tag"
    val d = new java.io.File(p)
    if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    p
  }

  test("system tar reads our shards: listing and extracted bytes match " +
    "(external differential, not self-consistency)") {
    val dir = freshDir("systar")
    val df = Seq(("doc-0.txt", "hello tar".getBytes("UTF-8")),
      ("doc-1.txt", Array.fill[Byte](700)(42)))
      .toDF("key", "payload").coalesce(1)
    TarShards.write(df, dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val list = new String(new ProcessBuilder("tar", "-tf", shard.getPath)
      .start().getInputStream.readAllBytes(), "UTF-8").trim.split("\n").toSeq
    assert(list == Seq("doc-0.txt", "doc-1.txt"), s"tar -tf saw: $list")
    val extracted = new ProcessBuilder("tar", "-xOf", shard.getPath, "doc-0.txt")
      .start().getInputStream.readAllBytes()
    assert(new String(extracted, "UTF-8") == "hello tar")
    val big = new ProcessBuilder("tar", "-xOf", shard.getPath, "doc-1.txt")
      .start().getInputStream.readAllBytes()
    assert(big.length == 700 && big.forall(_ == 42))
  }

  test("roundtrip over the real corpus: every (key, payload) survives; " +
    "shard bytes are a pure function of the input") {
    val docs = Tables.documents(spark, sf0001)
      .select(concat(lit("doc-"), col("doc_id"), lit(".txt")).as("key"),
        col("text").cast("binary").as("payload"))
      .repartition(3)
    val dir = freshDir("round")
    TarShards.write(docs, dir, shardMaxBytes = 64 * 1024)
    val back = TarShards.read(spark, dir)
    assert(back.count() == docs.count())
    val a = docs.select(col("key"), md5(col("payload")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = back.select(col("key"), md5(col("payload")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b, "payload content drifted through the tar roundtrip")
    // determinism: a second write of the same frame produces byte-equal shards
    val dir2 = freshDir("round2")
    TarShards.write(docs, dir2, shardMaxBytes = 64 * 1024)
    def digest(d: String): Map[String, String] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".tar"))
        .map { f =>
          val bytes = Files.readAllBytes(Paths.get(f.getPath))
          f.getName -> java.util.Base64.getEncoder.encodeToString(
            java.security.MessageDigest.getInstance("MD5").digest(bytes))
        }.toMap
    assert(digest(dir) == digest(dir2), "shard bytes not deterministic")
  }

  test("entry names over USTAR's 100-byte limit fail loudly, not truncate") {
    val df = Seq(("x" * 101, "data".getBytes("UTF-8"))).toDF("key", "payload")
    val dir = freshDir("longname")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.write(df, dir)
    }
    assert(e.getMessage.contains("100") || e.getCause != null,
      "long-name rejection must surface, never silently truncate the key")
  }

  test("shard rolling: entries never split, every shard under the cap " +
    "(+ tar framing), oversized entries get their own shard") {
    val rows = (0 until 40).map(i => (f"k$i%03d", Array.fill[Byte](1000)(i.toByte))) :+
      (("huge", Array.fill[Byte](20000)(7)))
    val df = rows.toDF("key", "payload").coalesce(1)
    val dir = freshDir("roll")
    TarShards.write(df, dir, shardMaxBytes = 8 * 1024)
    val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(shards.length > 3, s"expected several shards, got ${shards.length}")
    val back = TarShards.read(spark, dir)
    assert(back.count() == 41L)
    // the oversized entry is intact in one shard
    val huge = back.where(col("key") === "huge").collect()(0).getAs[Array[Byte]](2)
    assert(huge.length == 20000)
    // no non-final shard exceeds cap + one entry of slack (roll happens
    // BEFORE the entry that would overflow)
    shards.foreach { f =>
      assert(f.length <= 8 * 1024 + 21504 + 1024,
        s"${f.getName} is ${f.length} bytes")
    }
  }
}
