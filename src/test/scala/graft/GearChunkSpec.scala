package graft

import org.apache.spark.sql.functions._
import graft.functions.GearChunk
import graft.operators.Dedup

/** Content-defined chunking (q219): exact stream partition, shift
  * robustness (the property fixed blocks lack), expression==kernel
  * differential, and the dedup report's accounting. */
class GearChunkSpec extends SparkSpec {
  import spark.implicits._

  private def text(n: Int, seed: Int): String = {
    val sb = new StringBuilder
    var x = seed
    (0 until n).foreach { _ =>
      x = x * 1103515245 + 12345
      sb.append(('a' + ((x >>> 16) % 26)).toChar)
    }
    sb.toString
  }

  test("chunksOf partitions the byte stream exactly") {
    val t = text(5000, 7)
    val chunks = GearChunk.chunksOf(t.getBytes("UTF-8"), 5, 16, 128)
    assert(chunks.head._1 == 0)
    chunks.sliding(2).foreach {
      case Array((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(chunks.map(_._2).sum == 5000)
    assert(chunks.forall { case (_, l, _) => l >= 1 && l <= 128 })
    // every chunk except possibly the final partial respects minLen
    assert(chunks.dropRight(1).forall(_._2 >= 16))
    // average respects the mask dial: 16 + 2^5 = ~48 expected
    val avg = 5000.0 / chunks.length
    assert(avg > 20 && avg < 120, s"suspicious average chunk: $avg")
  }

  test("shift robustness: a prefix insertion re-aligns after one chunk " +
    "(fixed-size blocks would lose every boundary)") {
    val a = text(4000, 13)
    val b = "INSERTED-PREFIX-" + a
    def hashes(s: String) =
      GearChunk.chunksOf(s.getBytes("UTF-8"), 5, 16, 128).map(_._3)
    val ha = hashes(a)
    val hb = hashes(b).toSet
    val recovered = ha.count(hb)
    assert(recovered >= ha.length - 3,
      s"CDC must recover nearly all chunks after a shift: " +
        s"${recovered}/${ha.length}")
    // the fixed-block strawman, same average size: loses EVERYTHING
    def fixed(s: String) = s.getBytes("UTF-8").grouped(48)
      .map(g => java.util.Arrays.hashCode(g)).toArray
    val fa = fixed(a)
    val fbSet = fixed(b).toSet
    assert(fa.count(fbSet) <= 1,
      "strawman check broke: fixed blocks unexpectedly survived the shift")
  }

  test("gearChunks expression == chunksOf kernel through a Spark plan") {
    val docs = (1 to 40).map(i => (i.toLong, text(300 + i * 13, i)))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        explode(GearChunk.gearChunks(col("text"), 5, 16, 128)).as("c"))
      .select(col("doc_id"), col("c.off"), col("c.len"), col("c.h"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
        .sortBy(_._1).toSeq).toMap
    docs.collect().foreach { r =>
      val want = GearChunk
        .chunksOf(r.getString(1).getBytes("UTF-8"), 5, 16, 128).toSeq
      assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)} diverged")
    }
  }

  test("cdcDedupReport: an exact copy dedups to ~100%, a one-edit " +
    "re-crawl dedups all but the edited chunk's neighborhood") {
    val base = text(3000, 42)
    val edited = base.substring(0, 1500) + "XYZZY" + base.substring(1500)
    val docs = Seq(
      (1L, base, "orig"),
      (2L, base, "copy"),       // byte-identical re-crawl
      (3L, edited, "edited"))   // one mid-document insertion
      .toDF("doc_id", "text", "source")
    val out = Dedup.cdcDedupReport(docs, 5, 16, 128).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, origTotal, origDup, _) = out("orig")
    assert(origDup == 0L, s"first occurrence must own its bytes: $out")
    val (_, copyTotal, copyDup, copyRatio) = out("copy")
    assert(copyTotal == origTotal && copyDup == copyTotal,
      s"identical copy must dedup 100%: $out")
    assert(copyRatio == 1000000L)
    val (_, edTotal, edDup, edRatio) = out("edited")
    assert(edTotal == origTotal + 5)
    assert(edRatio > 900000L,
      s"one edit must keep >90% of bytes deduplicated: $edRatio")
    assert(edDup < edTotal, "the edited chunk itself must be new bytes")
  }

  test("cdcDedupReport: within-doc repetition is deduplicated and the " +
    "report is partition-invariant") {
    val block = text(600, 9)
    val docs = Seq((1L, block + block + block, "rep"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.cdcDedupReport(docs, 5, 16, 128).head()
    assert(r.getLong(3) > r.getLong(2) / 2,
      s"3x self-repetition must dedup >half its bytes: $r")
    val corpus = Tables.documents(spark, sf001)
    val a = Dedup.cdcDedupReport(corpus, 5, 16, 128).collect().toSeq
    val b = Dedup.cdcDedupReport(corpus.repartition(9), 5, 16, 128)
      .collect().toSeq
    assert(a == b)
  }
}
