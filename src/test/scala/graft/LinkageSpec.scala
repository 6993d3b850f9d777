package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Linkage

/** Fellegi-Sunter linkage (q215): hand-computed log-likelihood weights,
  * frequency-priced evidence, blocking semantics, occupancy cap. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Reference scorer: same formula, independent arithmetic. */
  private def handScore(
      corpus: Seq[(Long, String, String, String, Long)],
      a: Long, b: Long, ms: Map[String, Double]): Double = {
    val n = corpus.size.toLong
    def fieldOf(r: (Long, String, String, String, Long), f: String): Any =
      f match {
        case "lang" => r._3
        case "source" => r._4
        case "lb" => r._5 / 100
        case "w2" => r._2.split(" ", -1).drop(1).headOption.getOrElse("")
      }
    def u(f: String): Double = {
      val s = corpus.groupBy(fieldOf(_, f)).values
        .map(g => g.size.toLong * (g.size - 1)).sum
      (s + 1.0) / (n * (n - 1) + 2.0)
    }
    val ra = corpus.find(_._1 == a).get
    val rb = corpus.find(_._1 == b).get
    Seq("lang", "source", "lb", "w2").map { f =>
      if (fieldOf(ra, f) == fieldOf(rb, f)) math.log(ms(f) / u(f))
      else math.log((1 - ms(f)) / (1 - u(f)))
    }.sum
  }

  private val ms = Map("lang" -> 0.95, "source" -> 0.9, "lb" -> 0.8,
    "w2" -> 0.85)

  test("score == hand-computed FS log-likelihood ratio on a crafted block") {
    val corpus = Seq(
      (1L, "alpha beta x", "en", "src0", 150L),
      (2L, "alpha beta y", "en", "src0", 180L),  // agrees with 1 on all 4
      (3L, "alpha gamma z", "de", "src1", 450L), // disagrees with 1 on all 4
      (4L, "other word q", "en", "src0", 150L))  // different block (w1)
    val out = Linkage.linkageScores(docs(corpus), 128, 50,
      0.95, 0.9, 0.8, 0.85).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // only in-block pairs (w1 = "alpha") appear
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val full = out((1L, 2L))
    assert((full.getInt(2), full.getInt(3), full.getInt(4), full.getInt(5))
      == ((1, 1, 1, 1)), s"agreement flags: $full")
    val want12 = handScore(corpus, 1L, 2L, ms)
    assert(math.abs(full.getDouble(6) - want12) < 1e-5,
      s"score(1,2)=${full.getDouble(6)} want $want12")
    val none = out((1L, 3L))
    assert((none.getInt(2), none.getInt(3), none.getInt(4), none.getInt(5))
      == ((0, 0, 0, 0)))
    val want13 = handScore(corpus, 1L, 3L, ms)
    assert(math.abs(none.getDouble(6) - want13) < 1e-5)
    assert(full.getDouble(6) > none.getDouble(6))
  }

  test("frequency prices evidence: with near-constant companion fields, " +
    "rare-w2 agreement dominates the ranking by exactly its price gap") {
    // lang/source/lb constant across the block (u ≈ 1 → agreement worth
    // ~0); w2 mostly unique (u small → agreement worth a lot). The only
    // discriminating field is w2, and its price gap is checkable by hand.
    val corpus = Seq(
      (1L, "k rare a", "en", "s0", 100L),
      (2L, "k rare b", "en", "s0", 110L),
      (3L, "k w3 c",   "en", "s0", 120L),
      (4L, "k w4 d",   "en", "s0", 130L),
      (5L, "k w5 e",   "en", "s0", 140L),
      (6L, "k w6 f",   "en", "s0", 150L))
    val out = Linkage.linkageScores(docs(corpus), 128, 50,
      0.95, 0.9, 0.8, 0.85).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    val others = out.filterNot(_._1 == (1L, 2L)).values
    assert(others.forall(out((1L, 2L)) > _),
      s"the only w2-agreeing pair must rank first: $out")
    // margin over any non-agreeing pair = ln(m/u) − ln((1−m)/(1−u))
    val n = 6L
    val u = (2L * 1 + 1.0) / (n * (n - 1) + 2.0) // w2 "rare" appears twice
    val gap = math.log(0.85 / u) - math.log(0.15 / (1.0 - u))
    assert(math.abs(out((1L, 2L)) - out((1L, 3L)) - gap) < 1e-5,
      s"price gap: ${out((1L, 2L)) - out((1L, 3L))} want $gap")
  }

  test("occupancy cap: a mega-block is sub-blocked, pairs sharing the " +
    "sub-key survive, and small blocks are untouched") {
    // 300 docs share w1="big" (cap 64 → sub-blocked); two of them share
    // w2="twin" so they land in the same sub-block by construction.
    val big = (1L to 300L).map(i =>
      (i, s"big w$i x", "en", "s", 100L))
    val twins = Seq(
      (901L, "big twin a", "en", "s", 100L),
      (902L, "big twin b", "en", "s", 100L))
    val small = Seq(
      (801L, "tiny pair a", "en", "s", 100L),
      (802L, "tiny pair b", "en", "s", 100L))
    val out = Linkage.linkageScores(docs(big ++ twins ++ small), 64, 5000,
      0.95, 0.9, 0.8, 0.85).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((901L, 902L)), "twin pair lost to the cap")
    assert(out.contains((801L, 802L)), "small block must be exhaustive")
    // the cap really bounds the mega-block: far fewer than 302² pairs
    assert(out.size < 302 * 301 / 2 / 2,
      s"cap did not bound the mega-block: ${out.size} pairs")
  }

  test("deterministic across partitionings") {
    val corpus = (1L to 200L).map(i =>
      (i, s"w${i % 11} t${i % 7} z", s"l${i % 3}", s"s${i % 5}",
        (i % 9) * 100L))
    val a = Linkage.linkageScores(docs(corpus), 32, 100,
      0.95, 0.9, 0.8, 0.85).collect().toSeq
    val b = Linkage.linkageScores(docs(corpus).repartition(13), 32, 100,
      0.95, 0.9, 0.8, 0.85).collect().toSeq
    assert(a == b, "linkage ranking depends on partitioning")
  }
}
