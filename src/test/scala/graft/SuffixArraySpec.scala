package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, SuffixArray}

/** Distributed suffix array (prefix doubling): crafted-corpus exact
  * answers for the repeat report and coverage, the q164==q159
  * cross-operator differential (SA+LCP vs windowed hashing must agree
  * exactly at minLen == window), and partition invariance. */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  // docA carries a 9-token quote at offset 3; docB opens with the same
  // quote; docC has an internal 3-token self-repeat. All filler tokens
  // are globally unique so the quote family is the only repeat.
  private val quote = "the quick brown fox jumps over the lazy dog"
  private lazy val crafted = Seq(
    (1L, s"f1 f2 f3 $quote f4"),
    (2L, s"$quote f5 f6"),
    (3L, "x1 y1 z1 x1 y1 z1 w1"))
    .toDF("doc_id", "text")

  test("repeat report: the planted quote is the top repeat, with the " +
    "suffix-cascade below it and the self-repeat found") {
    val rows = SuffixArray.repeatReport(crafted, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // top row: the full 9-token quote between (doc 1, off 3) and (doc 2, off 0)
    val top = rows.head
    assert(top._5 == 9L, s"top lcp: $top")
    assert(Set((top._1, top._2), (top._3, top._4)) == Set((1L, 3L), (2L, 0L)), s"top sites: $top")
    // the suffix cascade: offsets (3+t, t) share lcp 9-t — all surface
    (1 to 8).foreach { t =>
      assert(rows.exists(r => r._5 == 9L - t &&
        Set((r._1, r._2), (r._3, r._4)) == Set((1L, 3L + t), (2L, t.toLong))),
        s"missing cascade row t=$t")
    }
    // the within-doc self-repeat: "x1 y1 z1" at offsets 0 and 3 of doc 3
    assert(rows.exists(r => r._5 == 3L &&
      Set((r._1, r._2), (r._3, r._4)) == Set((3L, 0L), (3L, 3L))),
      "self-repeat not found")
    // lcp column is non-increasing (orderBy contract)
    assert(rows.map(_._5).sliding(2).forall(p => p.head >= p.last))
  }

  test("coverage: exact extents and island merge on the crafted corpus") {
    val out = SuffixArray.exactSubstrCoverage(crafted, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // docA: rep(3+t) = 9-t >= 3 for t<=6 -> 7 positions, union [3,11]
    assert(out(1L) == ((13L, 7L, 9L, 1L, round6(9.0 / 13))), s"docA: ${out(1L)}")
    // docB: rep(t) = 9-t >= 3 for t<=6 -> 7 positions, union [0,8]
    assert(out(2L) == ((11L, 7L, 9L, 1L, round6(9.0 / 11))), s"docB: ${out(2L)}")
    // docC: rep(0)=3, rep(3)=3 -> extents [0,2] and [3,5] touch -> one island
    assert(out(3L) == ((7L, 2L, 6L, 1L, round6(6.0 / 7))), s"docC: ${out(3L)}")
  }

  private def round6(d: Double) = math.round(d * 1e6) / 1e6

  test("SA coverage == windowed repeatedSubstrings at minLen == window " +
    "(the cross-machinery differential, real corpus)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sa = SuffixArray.exactSubstrCoverage(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    val win = CorpusPipeline.repeatedSubstrings(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(sa.nonEmpty, "differential corpus produced no rows")
    assert(sa == win, "SA and windowed coverage disagree")
  }

  test("repeat report minLen floor: thresholded run equals the " +
    "unthresholded run filtered") {
    val all = SuffixArray.repeatReport(crafted, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val thr = SuffixArray.repeatReport(crafted, 30, minLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(thr.toSeq == all.filter(_._5 >= 4).toSeq,
      "minLen fast path changed the surviving rows")
  }

  test("removal: later occurrences cut over their full repeat extent, " +
    "first occurrences survive untouched, self-repeats keep the earlier site") {
    val out = SuffixArray.exactSubstrRemove(crafted, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // docA holds the quote's FIRST occurrence: nothing cut
    assert(out(1L) == ((13L, 0L, 13L, out(1L)._4)), s"docA: ${out(1L)}")
    // docB: positions 0..6 duplicate docA (extents 9..3) -> island [0,8]
    assert(out(2L) == ((11L, 9L, 2L, out(2L)._4)), s"docB: ${out(2L)}")
    // docC: the self-repeat's SECOND site [3,5] cut, first site kept
    assert(out(3L) == ((7L, 3L, 4L, out(3L)._4)), s"docC: ${out(3L)}")
    // fingerprint sanity: docB's kept text is exactly "f5 f6"
    val fp = spark.sql("SELECT conv(substring(md5('f5 f6'), 1, 15), 16, 10)")
      .collect()(0).getString(0).toLong
    assert(out(2L)._4 == fp, s"docB fingerprint: ${out(2L)._4} vs $fp")
  }

  test("removal is idempotent on the cleaned corpus (crafted)") {
    val cleanedTexts = Map(
      1L -> s"f1 f2 f3 $quote f4", // unchanged
      2L -> "f5 f6",
      3L -> "x1 y1 z1 w1")
    val cleaned = cleanedTexts.toSeq.toDF("doc_id", "text")
    val again = SuffixArray.exactSubstrRemove(cleaned, 3).collect()
    assert(again.forall(_.getLong(2) == 0L),
      s"second pass cut something: ${again.toSeq}")
  }

  test("removal conservation on the real corpus: kept + cut = tokens, " +
    "and cuts never exceed the coverage mass") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rem = SuffixArray.exactSubstrRemove(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cov = SuffixArray.exactSubstrCoverage(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rem.nonEmpty && rem.values.forall { case (n, c, k) => n == c + k })
    rem.foreach { case (id, (_, c, _)) =>
      assert(c <= cov(id), s"doc $id cut $c > covered ${cov(id)}")
    }
    val totalCut = rem.values.map(_._2).sum
    val totalCov = cov.values.sum
    assert(totalCut > 0 && totalCut < totalCov,
      s"keepers must survive: cut $totalCut vs covered $totalCov")
  }

  test("edges: all-unique corpus yields no repeats and zero coverage; " +
    "a single one-token doc survives the whole pipeline") {
    val unique = Seq((1L, "u1 u2 u3"), (2L, "u4 u5")).toDF("doc_id", "text")
    assert(SuffixArray.repeatReport(unique, 10).count() == 0)
    val cov = SuffixArray.exactSubstrCoverage(unique, 2).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(5)))
    assert(cov.toSet == Set((1L, 0L, 0L, 0.0), (2L, 0L, 0L, 0.0)))
    val tiny = Seq((7L, "solo")).toDF("doc_id", "text")
    assert(SuffixArray.repeatReport(tiny, 10).count() == 0)
    val tc = SuffixArray.exactSubstrCoverage(tiny, 1).collect()
    assert(tc.length == 1 && tc(0).getLong(3) == 0L)
  }

  test("repeat report is partition-invariant") {
    val a = SuffixArray.repeatReport(crafted, 30).collect().toSeq
    val b = SuffixArray.repeatReport(crafted.repartition(7), 30).collect().toSeq
    assert(a == b)
  }

  test("serve legs off ONE shared build equal the standalone entry points " +
    "(the bench's build/serve split cannot drift from the headline keys)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val minLen = 8
    val (st, lcp) = SuffixArray.build(docs, minLen.toLong)
    assert(SuffixArray.repeatReportFrom(st, lcp, 20, minLen).collect().toSeq ==
      SuffixArray.repeatReport(docs, 20, minLen).collect().toSeq,
      "shared-build repeat report drifted")
    assert(SuffixArray.exactSubstrCoverageFrom(docs, st, lcp, minLen)
      .collect().toSeq ==
      SuffixArray.exactSubstrCoverage(docs, minLen).collect().toSeq,
      "shared-build coverage drifted")
    assert(SuffixArray.exactSubstrRemoveFrom(st, lcp, minLen).collect().toSeq ==
      SuffixArray.exactSubstrRemove(docs, minLen).collect().toSeq,
      "shared-build removal drifted")
  }
}
