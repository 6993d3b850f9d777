package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Profile}

/** Round-10 additions: φ-heavy hitters (exact + Misra-Gries twin),
  * two-sample χ² token drift, and the Q6-shape filter-aggregate. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._
  import SparkEntry.Params.{HeavyPhiInv, Q6From, Q6Until, Q6DiscLo, Q6DiscHi,
    Q6MaxQty, Q10From, Q10Until, Q10TopN}

  test("heavyHitters: exact phi set on a crafted stream; strict integer gate edge") {
    // N = 10 tokens: a x5, b x3, c x2
    val docs = Seq((1L, "a a a a a b b"), (2L, "b c c")).toDF("doc_id", "text")
    val out3 = Analytics.heavyHitters(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // c*3 > 10: only a (15); b hits 9 < 10
    assert(out3 == Seq(("a", 5L)))
    // c*5 > 10: a (25), b (15); c lands EXACTLY on 10 — strict gate excludes
    val out5 = Analytics.heavyHitters(docs, 5).collect().map(_.getString(0)).toSeq
    assert(out5 == Seq("a", "b"), "c at exactly N/phi must NOT be a heavy hitter")
  }

  test("heavyHitters: pigeonhole bound holds on the real corpus; shares consistent") {
    val docs = Tables.documents(spark, sf001)
    val rows = Analytics.heavyHitters(docs, HeavyPhiInv).collect()
    assert(rows.nonEmpty, "gate tuned to be non-empty at sf0.01")
    assert(rows.length <= HeavyPhiInv, "more than phiInv heavy hitters is impossible")
    // counts strictly decreasing-or-tied in emitted order, ties by term
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted, "output order must be (c desc, term asc)")
  }

  test("heavyHittersSketch: MG candidates are a superset of the exact heavy set") {
    val docs = Tables.documents(spark, sf001)
    val exact = Analytics.heavyHitters(docs, HeavyPhiInv).collect()
      .map(_.getString(0)).toSet
    val cand = Analytics.heavyHittersSketch(docs, HeavyPhiInv).toSet
    assert(exact.subsetOf(cand),
      s"MG guarantee violated: exact hitters missing from sketch: ${exact -- cand}")
  }

  test("tokenDrift: planted one-sided terms rank first, ties break on term; " +
    "identical shared counts score zero") {
    // equal-size slices (80 tokens each) so a term with identical counts
    // has d = 0 exactly; one planted term per side
    val docs = (
      Seq.tabulate(20)(i => (i.toLong, "common words here planted_a", "A")) ++
        Seq.tabulate(20)(i => ((100 + i).toLong, "common words here planted_b", "B"))
      ).toDF("doc_id", "text", "source")
    val out = Profile.tokenDrift(docs, "source", "A", "B", 5, 10).collect()
    val byTerm = out.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byTerm("planted_a") == ((20L, 0L, byTerm("planted_a")._3)))
    assert(byTerm("planted_b") == ((0L, 20L, byTerm("planted_b")._3)))
    assert(byTerm("planted_a")._3 == byTerm("planted_b")._3,
      "symmetric one-sided terms must score identically")
    // the two planted terms outrank everything; tie broken by term asc
    assert(out.take(2).map(_.getString(0)).toSeq == Seq("planted_a", "planted_b"))
    assert(byTerm("common")._3 == 0.0,
      "identical counts in equal-size slices must score exactly zero")
  }

  test("forecastRevenue: decimal-exact on crafted rows, each predicate excludes") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (ts("1997-06-01"), 0.05, 10.0, 100.0), // in: 5.00
      (ts("1997-06-01"), 0.07, 23.0, 200.0), // in: 14.00
      (ts("1997-06-01"), 0.08, 10.0, 100.0), // out: discount above band
      (ts("1998-06-01"), 0.05, 10.0, 100.0), // out: past the window
      (ts("1997-06-01"), 0.05, 24.0, 100.0)) // out: quantity at the cap
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    val r = Analytics.forecastRevenue(li, "1997-01-01", "1998-01-01",
      "0.05", "0.07", 24).collect()(0)
    assert(r.getDouble(0) == 19.0 && r.getLong(1) == 2L, s"got $r")
  }

  test("winsorizedStats: clamp bounds are exact order statistics; a planted " +
    "outlier moves the raw mean, not the winsorized one") {
    // n = 10: values 1..9 plus a 1000 outlier. Ranks: lo = ceil(10*0.1) = 1
    // -> value 1; hi = ceil(10*0.9) = 9 -> value 9 (the outlier clamps).
    val docs = ((1 to 9).map(i => (i.toLong, "A", i.toLong)) :+ ((10L, "A", 1000L)))
      .toDF("doc_id", "source", "n_chars")
    val r = Profile.winsorizedStats(docs, "source", "n_chars", 100, 900).collect()(0)
    assert(r.getString(0) == "A" && r.getLong(1) == 10L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 9L, s"bounds wrong: $r")
    assert(r.getDouble(4) == 104.5, s"raw mean: $r")
    assert(r.getDouble(5) == 5.4, s"winsorized mean: $r")
  }

  test("madOutliers: lower-median convention, hand-computed MAD, constant group") {
    // group A: 1,2,3,4,5,100 — lower median (rank (6+1) div 2 = 3) = 3;
    // deviations 2,1,0,1,2,97 → lower median = 1 → MAD 1; gate d > 3:
    // only the 100 (d=97) flags
    // group B: constant 5s — median 5, MAD 0, gate d > 0 never fires
    val docs = (Seq(1L, 2L, 3L, 4L, 5L, 100L).zipWithIndex.map {
      case (v, i) => (i.toLong, "A", v)
    } ++ Seq((10L, "B", 5L), (11L, "B", 5L), (12L, "B", 5L)))
      .toDF("doc_id", "source", "n_chars")
    val out = Profile.madOutliers(docs, "source", "n_chars", 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") == ((6L, 3L, 1L, 1L)), s"group A: ${out("A")}")
    assert(out("B") == ((3L, 5L, 0L, 0L)), s"group B: ${out("B")}")
  }

  test("strataChiSq: exact-independence grid scores 0, perfect association " +
    "scores N, absent cells enter the grid as zeros, df = (R-1)(C-1)") {
    // product distribution: o(r,c) = rowShare·colShare·N exactly →
    // every o·N − r·c = 0 → chi2 = 0
    val indep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y")))
      .toDF("lang", "source")
    val oi = Profile.strataChiSq(indep, "lang", "source").collect()
    assert(oi.length == 4)
    assert(oi.forall(_.getLong(6) == 0L), "independent grid must score 0")
    assert(oi.forall(_.getLong(7) == 0L) && oi.forall(_.getLong(8) == 1L))
    // perfect association on a 2×2: χ² = N; the off-diagonal cells are
    // ABSENT from the data and must still appear with obs 0
    val dep = (Seq.fill(6)(("a", "x")) ++ Seq.fill(4)(("b", "y")))
      .toDF("lang", "source")
    val od = Profile.strataChiSq(dep, "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(od.keySet == Set(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")))
    assert(od(("a", "y"))._1 == 0L && od(("b", "x"))._1 == 0L)
    // cell (a,x): e = 6·6/10 = 3.6 → 3_600_000 micro; contribution
    // (6·10 − 36)²/(10·6·6) = 576/360 = 1.6 → 1_600_000
    assert(od(("a", "x"))._2 == 3600000L, s"expected: ${od(("a", "x"))}")
    assert(od(("a", "x"))._3 == 1600000L, s"contrib: ${od(("a", "x"))}")
    // χ² total = N = 10 → 10_000_000 micro on every row
    assert(od.values.forall(_._4 == 10000000L), s"chi2: $od")
    // df on a 3×2
    val tri = (Seq(("a", "x"), ("b", "x"), ("c", "y"), ("a", "y")))
      .toDF("lang", "source")
    val dfv = Profile.strataChiSq(tri, "lang", "source")
      .select("df").distinct().collect().map(_.getLong(0)).toSeq
    assert(dfv == Seq(2L), s"df: $dfv")
  }

  test("upsert: replace, insert, persist; null-key base rows survive the anti-join") {
    import graft.operators.Merge
    val base = Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "n"))
      .toDF("doc_id", "v")
    val upd = Seq((Option(1L), "A"), (Option(9L), "Z")).toDF("doc_id", "v")
    val out = Merge.upsert(base, upd, "doc_id").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
      .toMap
    assert(out == Map(Some(1L) -> "A", Some(2L) -> "b", Some(9L) -> "Z",
      None -> "n"))
  }

  test("percentileNormalize: hand-computed percent ranks with deterministic ties") {
    // order (value, id): (10,1) (20,2) (20,3) (30,4) -> (rank-1)/3
    val docs = Seq((1L, "g", 10L), (2L, "g", 20L), (3L, "g", 20L), (4L, "g", 30L))
      .toDF("doc_id", "lang", "n_chars")
    val out = Profile.percentileNormalize(docs, "lang", "n_chars", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.333333, 3L -> 0.666667, 4L -> 1.0),
      s"got $out")
  }

  test("fuzzyPairs: threshold inclusive, blocking excludes lang/first-word mismatches") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "en", "hello world abc"),
      (2L, "en", "hello worlds abc"),  // dist 1 from doc 1
      (3L, "en", "goodbye world abc"), // first word differs → never compared
      (4L, "de", "hello world abc"),   // lang differs → never compared
      (5L, "en", "hello world ab"))    // dist 1 from doc 1, dist 2 from doc 2
      .toDF("doc_id", "lang", "text")
    val out = Dedup.fuzzyPairs(docs, 24, 1).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(out == Set((1L, 2L, 1), (1L, 5L, 1)), s"got $out")
  }

  test("fuzzyPairs: thresholded (banded, early-abandon) DP equals the " +
    "unbanded reference on the real corpus, including dist == maxDist pairs") {
    import graft.operators.Dedup
    // The r14 rewrite switches to the thresholded levenshtein, which is
    // exactness-preserving by construction — pin that against the plain
    // full-DP formulation over real data at the shipped parameters.
    val docs = Tables.documents(spark, sf0001)
    val got = Dedup.fuzzyPairs(docs, 24, 8).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val d = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        element_at(split(col("text"), " "), 1).as("w1"),
        substring(col("text"), 1, 24).as("p"))
    val a = d.select(col("lang"), col("w1"), col("doc_id").as("a"), col("p").as("pa"))
    val b = d.select(col("lang"), col("w1"), col("doc_id").as("b"), col("p").as("pb"))
    val want = a.join(b, Seq("lang", "w1")).where(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")))
      .where(col("dist") <= 8)
      .select(col("a"), col("b"), col("dist")).orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want, s"banded DP diverged: got ${got.size} want ${want.size}")
    assert(want.exists(_._3 == 8) || want.nonEmpty,
      "corpus produced no pairs — parameter drift, re-pin")
  }

  test("fuzzyPairs occupancy cap: a capped block still finds its planted pair, " +
    "sub-blocking prunes cross-sub candidates, and a cap above the block is a no-op") {
    import graft.operators.Dedup
    // one (en, "hello") mega-block of 6; docs 1/2 share w2 ("worlda")
    // so they land in the same sub-block at any split count
    val docs = Seq(
      (1L, "en", "hello worlda xx"),
      (2L, "en", "hello worlda xy"),
      (3L, "en", "hello beta xx"),
      (4L, "en", "hello gamma xx"),
      (5L, "en", "hello delta xx"),
      (6L, "en", "hello epsilon xx"))
      .toDF("doc_id", "lang", "text")
    def pairs(maxBlock: Int) =
      Dedup.fuzzyPairs(docs, 24, 24, maxBlock).collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped == (for (a <- 1L to 6L; b <- 1L to 6L if a < b) yield (a, b)).toSet,
      s"uncapped block should compare all 15 pairs, got $uncapped")
    val capped = pairs(2) // splits = ceil(6/2) = 3
    assert(capped.contains((1L, 2L)), s"planted same-w2 pair lost under the cap: $capped")
    assert(capped.size < uncapped.size,
      "cap produced no pruning — sub-blocking is not splitting the mega-block")
    assert(pairs(6) == uncapped, "cap >= block size must be byte-identical to uncapped")
  }

  test("promoRevenueShare: hand-computed split on crafted rows") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (ts("1997-09-10"), 1L, 100.0, 0.10), // promo: 90.00
      (ts("1997-09-11"), 2L, 200.0, 0.00), // plain: 200.00
      (ts("1997-10-05"), 1L, 999.0, 0.00)) // outside the window
      .toDF("l_shipdate", "l_partkey", "l_extendedprice", "l_discount")
    val part = Seq((1L, "PROMO BRUSHED"), (2L, "STANDARD BURNISHED"))
      .toDF("p_partkey", "p_type")
    val r = Analytics.promoRevenueShare(li, part, "1997-09-01", "1997-10-01")
      .collect()(0)
    assert(r.getDouble(1) == 90.0 && r.getDouble(2) == 290.0, s"got $r")
    assert(r.getDouble(0) == math.BigDecimal(100.0 * 90 / 290)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"share: $r")
  }

  test("returnedItemRanking: only R lineitems count; ranking and ties deterministic") {
    val out = Analytics.returnedItemRanking(
      Tables.customer(spark, sf001), Tables.orders(spark, sf001),
      Tables.lineitem(spark, sf001), Tables.nation(spark, sf001),
      Q10From, Q10Until, Q10TopN).collect()
    assert(out.length == Q10TopN)
    val revs = out.map(r => r.getDouble(r.fieldIndex("revenue")))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "revenue must be non-increasing")
    assert(out.forall(_.getLong(4) >= 1L))
  }

  test("linearFit: exact fit on a perfect line, hand-computed on a noisy one") {
    // group A: y = 3x + 2 exactly → slope 3, intercept 2, r2 = 1
    val a = Seq((1L, "A", 1L, 5L), (2L, "A", 2L, 8L), (3L, "A", 3L, 11L),
      (4L, "A", 4L, 14L))
    // group B: (0,0),(1,1),(2,1) → n=3 sx=3 sy=2 sxy=3 sxx=5 syy=2
    // slope = (9-6)/(15-9) = 0.5; intercept = (2 - 0.5*3)/3 = 1/6;
    // r2 = 9/(6*(6-4)) = 0.75
    val b = Seq((10L, "B", 0L, 0L), (11L, "B", 1L, 1L), (12L, "B", 2L, 1L))
    val df = (a ++ b).toDF("doc_id", "source", "n_chars", "n_tokens")
    val out = Profile.linearFit(df, "source", "n_chars", "n_tokens").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("A") == ((4L, 3.0, 2.0, 1.0)), s"A: ${out("A")}")
    assert(out("B") == ((3L, 0.5, 0.166667, 0.75)), s"B: ${out("B")}")
  }

  test("priceQuantityCorrelation: r = 1 on proportional columns, sign flips with slope") {
    val li = Seq(
      ("A", 1.0, 100.0), ("A", 2.0, 200.0), ("A", 3.0, 300.0), // y = 100x → r 1
      ("R", 1.0, 300.0), ("R", 2.0, 200.0), ("R", 3.0, 100.0)) // y = -100x + 400 → r -1
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = Analytics.priceQuantityCorrelation(li).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("A") == ((1.0, 100.0)), s"A: ${out("A")}")
    assert(out("R") == ((-1.0, -100.0)), s"R: ${out("R")}")
  }

  test("bandRevenue: cross-clause halves must NOT match; per-clause conjunction exact") {
    val part = Seq(
      (1L, "Brand#12", 3),   // clause-1 part (size in 1..5)
      (2L, "Brand#23", 8),   // clause-2 part (size in 1..10)
      (3L, "Brand#12", 40)). // clause-1 brand, size outside every band
      toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0),   // clause 1: qty in 1..11 → counts, rev 100
      (1L, 15.0, 999.0, 0.0),  // clause-1 part but clause-2 qty → trap row
      (2L, 15.0, 200.0, 0.5),  // clause 2 → counts, rev 100
      (3L, 5.0, 999.0, 0.0)).  // right brand+qty, size fails → no clause
      toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val bands = Seq(("Brand#12", 1, 5, 1, 11), ("Brand#23", 1, 10, 10, 20))
    val out = Analytics.bandRevenue(li, part, bands).collect()(0)
    assert(out.getLong(1) == 2L, s"exactly the two true-clause rows: $out")
    assert(out.getDouble(0) == 200.0, s"100 + 200*(1-0.5): $out")
  }

  test("bandRevenue: each side's pre-filter reaches its parquet scan") {
    val plan = Analytics.bandRevenue(Tables.lineitem(spark, sf001),
      Tables.part(spark, sf001), SparkEntry.Params.Q19Bands)
      .queryExecution.executedPlan.toString
    // the OR-of-halves must push to BOTH scans, not wait for the join
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"lineitem qty pre-filter not pushed:\n$plan")
    assert(plan.contains("p_brand"), s"part brand pre-filter missing:\n$plan")
  }

  test("dormantHighBalance: strict above-average gate, windowed anti-join") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    // positive balances: 100, 200, 300 → avg 200 exactly
    val cust = Seq(
      (1L, "SEG_A", 100.0),  // below avg → out
      (2L, "SEG_A", 200.0),  // EXACTLY avg → strict > excludes
      (3L, "SEG_A", 300.0),  // above avg, no orders → counted
      (4L, "SEG_B", -50.0),  // negative: excluded from avg AND below it
      (5L, "SEG_B", 250.0)). // above avg but active in window → out
      toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val ords = Seq(
      (5L, ts("1999-06-01")),  // in window → cust 5 active
      (3L, ts("1998-06-01"))). // BEFORE window → cust 3 still dormant
      toDF("o_custkey", "o_orderdate")
    val out = Analytics.dormantHighBalance(cust, ords, "1999-01-01", "2002-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("SEG_A", 1L, 300.0)), s"got ${out.toSeq}")
  }

  test("forecastRevenue: filters push into the parquet scan") {
    val plan = Analytics.forecastRevenue(Tables.lineitem(spark, sf001),
      Q6From, Q6Until, Q6DiscLo, Q6DiscHi, Q6MaxQty)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate predicate not pushed:\n$plan")
  }

  test("smallQuantityRevenue: strict cross-multiplied gate, brand pre-filter, " +
    "exact-boundary row excluded") {
    val part = Seq((1L, "Brand#12"), (2L, "Brand#99"), (3L, "Brand#12"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      // part 1: qtys 1,1,6 → Σ=8, n=3; gate qty·3·2 < 8 admits the two 1s
      (1L, 1.0, 10.0), (1L, 1.0, 20.0), (1L, 6.0, 999.0),
      // part 3: qtys 1,3 → Σ=4, n=2; qty=1 lands EXACTLY on the gate
      // (1·2·2 = 4 = Σ) — strict < must exclude it
      (3L, 1.0, 555.0), (3L, 3.0, 666.0),
      // part 2: wrong brand — pruned before the window ever sees it
      (2L, 1.0, 777.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Analytics.smallQuantityRevenue(li, part, "Brand#12", 2).collect()(0)
    assert(r.getDouble(0) == 30.0 && r.getLong(1) == 2L, s"got $r")
  }

  test("largeOrders: strict HAVING threshold; (totalprice desc, orderkey) cut is exact") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 6.0), (1L, 5.0),   // order 1: Σ=11 > 10 → survives
      (2L, 10.0),             // order 2: Σ=10 EXACTLY → strict > excludes
      (3L, 12.0),             // order 3: survives
      (4L, 11.0))             // order 4: survives, cut by topN
      .toDF("l_orderkey", "l_quantity")
    val ords = Seq(
      (1L, 10L, ts("1997-01-01"), 500.0),
      (2L, 20L, ts("1997-01-02"), 999.0),  // filtered before the join-back
      (3L, 20L, ts("1997-01-03"), 800.0),
      (4L, 10L, ts("1997-01-04"), 500.0))  // ties order 1 on price → orderkey asc
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((10L, "Cust#10"), (20L, "Cust#20")).toDF("c_custkey", "c_name")
    val out = Analytics.largeOrders(li, ords, cust, 10L, 2).collect()
      .map(r => (r.getLong(2), r.getDouble(4), r.getLong(5)))
    // price desc: order 3 (800) first; 500-tie broken by orderkey → order 1
    assert(out.toSeq == Seq((3L, 800.0, 12L), (1L, 500.0, 11L)), s"got ${out.toSeq}")
  }

  test("largeOrders: broadcast survivor set stays a thin tail on the real corpus") {
    // The plan broadcasts the HAVING survivors into orders. That is safe
    // exactly because Q18MinQty sits above the p99 of per-order volume, so
    // survivors are a vanishing fraction at every SF — pin that assumption.
    val li = Tables.lineitem(spark, sf001)
    val orders = li.select("l_orderkey").distinct.count()
    val survivors = li.groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
      .where(col("q") > SparkEntry.Params.Q18MinQty).count()
    assert(survivors.toDouble / orders < 0.05,
      s"survivor fraction $survivors/$orders breaks the broadcast assumption; " +
        "raise Q18MinQty or switch the join-back to a shuffle join")
  }

  test("topSupplierRevenue: decimal-exact max keeps BOTH tied suppliers") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, ts("1997-02-01"), 100.0, 0.10),            // supp 1: 90.00
      (2L, ts("1997-02-01"), 50.0, 0.10),             // supp 2: 45 + 45
      (2L, ts("1997-03-01"), 50.0, 0.10),             //   = 90.00 → exact tie
      (3L, ts("1997-02-01"), 80.0, 0.00),             // supp 3: 80 < max
      (4L, ts("1997-06-01"), 99999.0, 0.00))          // outside the window
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val supp = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"), (4L, "S4"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.topSupplierRevenue(li, supp, "1997-01-01", "1997-04-01")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 90.0), (2L, 90.0)),
      s"a decimal-exact tie must keep both suppliers: ${out.toSeq}")
  }

  test("revenueConcentration: share-vs-average gate is strict; boundary part excluded") {
    // parts with revenue 10, 20, 30 → np=3, avg=20. Gate num/den = 1/1:
    // r·np > tot ⟺ r > 20. The 20-part lands EXACTLY on the average and
    // the strict > must exclude it; only the 30-part reports, x_avg = 1.5.
    val li = Seq(
      (1L, 10.0, 0.0),
      (2L, 20.0, 0.0),
      (3L, 15.0, 0.0), (3L, 15.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Analytics.revenueConcentration(li, 1, 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((3L, 30.0, 2L, 1.5)), s"got ${out.toSeq}")
  }

  test("cheapestSupplierPerPart: decimal-exact tie kept; wrong-region and " +
    "wrong-part offers never win") {
    val region = Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "FRANCE", 1), (20, "CHINA", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supp = Seq(
      (1L, "S1", 500.0, 10), (2L, "S2", 100.0, 10),
      (3L, "S3", 999.0, 20)) // right price, wrong region → pruned pre-agg
      .toDF("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val part = Seq((1L, "ECONOMY", 15), (2L, "ECONOMY", 99))
      .toDF("p_partkey", "p_type", "p_size")
    val li = Seq(
      (1L, 1L, 100.0, 0.0),  // s1 offer: 100.00
      (1L, 1L, 120.0, 0.0),  // s1 worse offer → min keeps 100.00
      (1L, 2L, 200.0, 0.5),  // s2 offer: 200·(1−0.5) = 100.00 EXACT tie
      (1L, 3L, 10.0, 0.0),   // cheapest of all, but wrong region
      (2L, 1L, 1.0, 0.0))    // wrong part (size 99)
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Analytics.cheapestSupplierPerPart(li, part, supp, nation,
      region, "ECONOMY", Seq(15), "EUROPE", 100).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getDouble(5)))
    assert(out.toSeq == Seq(("S1", 1L, 100.0), ("S2", 1L, 100.0)),
      s"decimal tie must keep both; got ${out.toSeq}")
  }

  test("cheapestSupplierPerPart: the Q2 parameter set is non-empty at the " +
    "smallest gate scale") {
    // The r12 snapshot went red because a single (type, size) cell held
    // zero parts at sf0.001. The parameters are now a size CLASS SET;
    // this pins the data assumption the smoke gate depends on: at least
    // one in-class part has a lineitem from a EUROPE supplier on the
    // smallest corpus the driver smokes.
    import SparkEntry.Params.{Q2Type, Q2Sizes, Q2Region}
    val survivors = Analytics.cheapestSupplierPerPart(
      Tables.lineitem(spark, sf0001), Tables.part(spark, sf0001),
      Tables.supplier(spark, sf0001), Tables.nation(spark, sf0001),
      Tables.region(spark, sf0001), Q2Type, Q2Sizes, Q2Region, 100).count()
    assert(survivors > 0,
      s"Q2 parameters ($Q2Type, sizes ${Q2Sizes.mkString(",")}, $Q2Region) " +
        "match nothing at sf0.001 — widen Q2Sizes")
  }

  test("q109/q111/q112: no forced broadcast hint on an SF-growing side — " +
    "only fixed-cardinality dimensions may carry hints") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import SparkEntry.Params._
    val frames = Map(
      "q109" -> Analytics.cheapestSupplierPerPart(
        Tables.lineitem(spark, sf001), Tables.part(spark, sf001),
        Tables.supplier(spark, sf001), Tables.nation(spark, sf001),
        Tables.region(spark, sf001), Q2Type, Q2Sizes, Q2Region, Q2TopN),
      "q111" -> Analytics.supplierDiversity(
        Tables.lineitem(spark, sf001), Tables.part(spark, sf001),
        Tables.supplier(spark, sf001), Q16ExclBrand, Q16Sizes),
      "q112" -> Analytics.dominantSuppliers(
        Tables.lineitem(spark, sf001), Tables.supplier(spark, sf001),
        Tables.nation(spark, sf001), Q20From, Q20Until, Q20Num, Q20Den),
      "q104" -> Analytics.smallQuantityRevenue(
        Tables.lineitem(spark, sf001), Tables.part(spark, sf001),
        Q17Brand, Q17FracInv),
      "q105" -> Analytics.largeOrders(
        Tables.lineitem(spark, sf001), Tables.orders(spark, sf001),
        Tables.customer(spark, sf001), Q18MinQty, Q18TopN),
      "q154" -> Analytics.q9Profit(
        Tables.lineitem(spark, sf001), Tables.orders(spark, sf001),
        Tables.part(spark, sf001), Tables.supplier(spark, sf001),
        Tables.nation(spark, sf001), Q9NameLike))
    frames.foreach { case (name, df) =>
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      hints.foreach { h =>
        val leaves = h.child.collectLeaves().map(_.toString).mkString("\n")
        assert(leaves.contains("nation") || leaves.contains("region"),
          s"$name force-broadcasts a non-dimension (SF-growing) input:\n$leaves")
      }
    }
  }

  test("priorityShipping: one-pass conditional counts; window excludes") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, "A", ts("1997-06-01")),  // critical (order 1 urgent)
      (2L, "A", ts("1997-06-01")),  // other (order 2 low)
      (3L, "A", ts("1998-06-01")),  // out of window despite urgent order
      (1L, "N", ts("1997-06-01")))  // critical, flag N
      .toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val ords = Seq((1L, "1-URGENT"), (2L, "5-LOW"), (3L, "1-URGENT"))
      .toDF("o_orderkey", "o_orderpriority")
    val out = Analytics.priorityShipping(li, ords, "1997-01-01", "1998-01-01",
      Seq("1-URGENT", "2-HIGH")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", 1L, 1L), ("N", 1L, 0L)), s"got ${out.toSeq}")
  }

  test("supplierDiversity: pair dedup before the count; at-risk, excluded-brand " +
    "and off-size rows never reach a bucket") {
    val part = Seq(
      (1L, "Brand#1", "T", 4),   // in
      (2L, "Brand#1", "T", 4),   // same bucket, different part
      (3L, "Brand#45", "T", 4),  // excluded brand
      (4L, "Brand#1", "T", 7))   // size outside the class set
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supp = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
    val li = Seq(
      (1L, 1L), (1L, 1L),  // duplicate pair → one supplier
      (2L, 1L),            // same bucket via part 2, same supplier → still 1
      (1L, 2L),            // at-risk supplier (bal < 0) → anti-joined away
      (1L, 3L),            // bal 0 is NOT at risk → counts
      (3L, 1L), (4L, 1L))  // excluded brand / size
      .toDF("l_partkey", "l_suppkey")
    val out = Analytics.supplierDiversity(li, part, supp, "Brand#45",
      Seq(1, 4, 9)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq(("Brand#1", "T", 4, 2L)), s"got ${out.toSeq}")
  }

  test("dominantSuppliers: exactly-half share excluded by the strict gate; " +
    "sole supplier of a part qualifies") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 1L, 5.0, ts("1997-06-01")),   // part 1: 5 of 10 — EXACTLY half
      (1L, 2L, 5.0, ts("1997-06-01")),   //   → 2q = total, strict > excludes
      (2L, 1L, 6.0, ts("1997-06-01")),   // part 2: 6 of 10 → s1 dominates
      (2L, 2L, 4.0, ts("1997-06-01")),
      (3L, 3L, 3.0, ts("1997-06-01")),   // part 3: sole supplier → qualifies
      (4L, 4L, 99.0, ts("1998-06-01")))  // out of window
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val supp = Seq((1L, "SA", 10), (2L, "SB", 10), (3L, "SC", 10), (4L, "SD", 10))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((10, "FRANCE")).toDF("n_nationkey", "n_name")
    val out = Analytics.dominantSuppliers(li, supp, nation,
      "1997-01-01", "1998-01-01", 1, 2).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "SA"), (3L, "SC")), s"got ${out.toSeq}")
  }

  test("biNationVolume: only the two cross-nation directions count; " +
    "same-nation and third-nation flows excluded; window excludes") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val nation = Seq((1, "FR"), (2, "DE"), (3, "IT"))
      .toDF("n_nationkey", "n_name")
    val supp = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("s_suppkey", "s_nationkey")
    val cust = Seq((100L, 1), (200L, 2), (300L, 3)).toDF("c_custkey", "c_nationkey")
    val ords = Seq((1L, 200L), (2L, 100L), (3L, 100L), (4L, 300L), (5L, 200L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (1L, 10L, ts("1996-06-01"), 100.0, 0.0),  // FR→DE 1996: 100
      (2L, 20L, ts("1997-06-01"), 200.0, 0.5),  // DE→FR 1997: 100
      (3L, 10L, ts("1996-06-01"), 999.0, 0.0),  // FR→FR: same nation, out
      (4L, 10L, ts("1996-06-01"), 999.0, 0.0),  // FR→IT: third nation, out
      (5L, 10L, ts("1999-06-01"), 999.0, 0.0))  // FR→DE but out of window
      .toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val out = Analytics.biNationVolume(li, ords, cust, supp, nation,
      "FR", "DE", "1996-01-01", "1998-01-01").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("DE", "FR", 1997, 100.0), ("FR", "DE", 1996, 100.0)),
      s"got ${out.toSeq}")
  }

  test("biNationVolume: the Q7 nation pair is non-empty at the smallest " +
    "gate scale") {
    import SparkEntry.Params.{Q7NationA, Q7NationB, Q7From, Q7Until}
    val n = Analytics.biNationVolume(Tables.lineitem(spark, sf0001),
      Tables.orders(spark, sf0001), Tables.customer(spark, sf0001),
      Tables.supplier(spark, sf0001), Tables.nation(spark, sf0001),
      Q7NationA, Q7NationB, Q7From, Q7Until).count()
    assert(n > 0, s"Q7 pair ($Q7NationA, $Q7NationB) has no in-window " +
      "traffic at sf0.001 — pick a busier pair")
  }

  test("q9Profit: margin over the pair's best historical offer, exact on " +
    "crafted rows; non-matching parts excluded; year attribution by order") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val part = Seq((1L, "red widget"), (2L, "blue bolt"))
      .toDF("p_partkey", "p_name")
    val supp = Seq((10L, 1)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((1, "FR")).toDF("n_nationkey", "n_name")
    val ords = Seq((1L, ts("1996-03-01")), (2L, ts("1997-03-01")),
      (3L, ts("1996-03-01"))).toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 10L, 100.0, 0.0),  // red, the pair's best offer → profit 0
      (2L, 1L, 10L, 200.0, 0.25), // red, disc 150 → profit 50 in 1997
      (3L, 2L, 10L, 999.0, 0.0))  // blue: name-filtered out entirely
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Analytics.q9Profit(li, ords, part, supp, nation, "red")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("FR", 1997, 50.0), ("FR", 1996, 0.0)),
      s"got ${out.toSeq}")
  }

  test("q9Profit: the name token is non-empty at the smallest gate scale") {
    import SparkEntry.Params.Q9NameLike
    val n = Analytics.q9Profit(Tables.lineitem(spark, sf0001),
      Tables.orders(spark, sf0001), Tables.part(spark, sf0001),
      Tables.supplier(spark, sf0001), Tables.nation(spark, sf0001),
      Q9NameLike).count()
    assert(n > 0, s"Q9 name token '$Q9NameLike' matches nothing at sf0.001")
  }

  test("marketShare: conditional share exact on crafted rows; wrong-type " +
    "and out-of-region rows never enter the denominator") {
    val ts = (s: String) => Timestamp.valueOf(s + " 00:00:00")
    val nation = Seq((1, "FR", 1), (2, "CN", 2)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val part = Seq((1L, "STANDARD"), (2L, "PROMO")).toDF("p_partkey", "p_type")
    val supp = Seq((10L, 1), (20L, 2)).toDF("s_suppkey", "s_nationkey")
    val cust = Seq((100L, 1), (200L, 2)).toDF("c_custkey", "c_nationkey")
    val ords = Seq(
      (1L, 100L, ts("1996-03-01")),  // EUROPE customer, 1996
      (2L, 100L, ts("1997-03-01")),  // EUROPE customer, 1997
      (3L, 200L, ts("1996-03-01")))  // ASIA customer → out of region
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 10L, 100.0, 0.0),  // FR supplier: numerator 100
      (1L, 1L, 20L, 300.0, 0.0),  // CN supplier: denominator only
      (1L, 2L, 10L, 999.0, 0.0),  // wrong part type → excluded
      (2L, 1L, 20L, 50.0, 0.0),   // 1997: denominator only → share 0
      (3L, 1L, 10L, 999.0, 0.0))  // out-of-region order → excluded
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Analytics.marketShare(li, ords, cust, supp, part, nation,
      region, "STANDARD", "EUROPE", "FR", "1996-01-01", "1998-01-01")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1996, 0.25, 100.0, 400.0), (1997, 0.0, 0.0, 50.0)),
      s"got ${out.toSeq}")
  }

  test("soleSupplierOrders: multi-lineitem same-supplier order still counts; " +
    "shared order counts for nobody") {
    val li = Seq(
      (1L, 7L), (1L, 7L),  // order 1: two items, ONE distinct supplier → solo 7
      (2L, 7L), (2L, 8L),  // order 2: two suppliers → excluded entirely
      (3L, 8L),            // order 3: solo 8
      (4L, 7L))            // order 4: solo 7
      .toDF("l_orderkey", "l_suppkey")
    val supp = Seq((7L, "S7"), (8L, "S8")).toDF("s_suppkey", "s_name")
    val out = Analytics.soleSupplierOrders(li, supp, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 2L), (8L, 1L)), s"got ${out.toSeq}")
  }

  test("bootstrapMeans: constant column collapses the interval to the mean; deterministic; " +
    "interval brackets the point estimate on the real corpus") {
    // Constant length: every Poisson resample's mean IS the constant,
    // so lo == mean == hi exactly (in micro-units).
    val const = (0L until 200L).map(i => (i, s"src${i % 4}", 100L))
      .toDF("doc_id", "source", "n_chars")
    Profile.bootstrapMeans(const, reps = 16).collect().foreach { r =>
      assert(r.getLong(2) == 100000000L && r.getLong(3) == 100000000L &&
        r.getLong(4) == 100000000L, s"constant column widened the interval: $r")
    }
    // Hash-seeded weights: two runs are bit-identical (rand() would not be).
    val docs = Tables.documents(spark, sf0001)
    val a = Profile.bootstrapMeans(docs).collect().toSeq
    val b = Profile.bootstrapMeans(docs).collect().toSeq
    assert(a == b, "bootstrap is not deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= hi, s"inverted interval: $r")
      assert(lo <= mean && mean <= hi,
        s"replicate envelope misses the point estimate (deterministic check): $r")
      assert(lo < hi, s"real data produced a degenerate interval: $r")
    }
  }

  test("scd2: restated rows collapse, changes open history, bounds chain") {
    import spark.implicits._
    import graft.operators.Merge
    // key 1: v1 state A, v2 RESTATED A (must collapse), v3 changed B
    // key 2: v1 only (single open row)
    // key 3: null -> value transition must count as a change
    val feed = Seq(
      (1L, 1L, "web", 100L), (1L, 2L, "web", 100L), (1L, 3L, "web", 250L),
      (2L, 1L, "book", 50L),
      (3L, 1L, null.asInstanceOf[String], 10L), (3L, 2L, "wiki", 10L)
    ).toDF("doc_id", "version", "source", "n_chars")
    val out = Merge.scd2(feed, "doc_id", "version", Seq("source", "n_chars"))
      .orderBy("doc_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "web", 100L, 1L, 3L, false),   // v2 restate collapsed: valid_to jumps to 3
      (1L, "web", 250L, 3L, -1L, true),
      (2L, "book", 50L, 1L, -1L, true),
      (3L, null, 10L, 1L, 2L, false),     // null -> value IS a change
      (3L, "wiki", 10L, 2L, -1L, true)))
  }

  test("scd2: exactly one current row per key; one exchange serves both windows") {
    import graft.operators.Merge
    val base = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
    val feed = base.withColumn("version", lit(1L))
      .unionByName(base.where(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
        .withColumn("version", lit(2L)))
    val hist = Merge.scd2(feed, "doc_id", "version", Seq("source", "n_chars"))
    val perKey = hist.groupBy("doc_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_cur"))
      .where(col("n_cur") =!= 1L)
    assert(perKey.count() === 0, "a key without exactly one current row")
    // Plan shape: the two windows (lag change-detect, lead bounds) must
    // share ONE hash exchange and ONE sort — a second sort would mean
    // the filter broke ordering propagation.
    val plan = hist.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size === 1, plan)
    assert("\\+- Sort \\[doc_id".r.findAllIn(plan).size === 1, plan)
  }

  test("checksum ranges: row order and partitioning never change the fold") {
    val docs = Tables.documents(spark, sf0001)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val base = Profile.checksumRanges(docs, "doc_id", cols, 8).collect().toSeq
    val shuffled = Profile.checksumRanges(
      docs.orderBy(col("n_chars").desc).repartition(7), "doc_id", cols, 8)
      .collect().toSeq
    assert(base === shuffled, "checksum depends on physical layout")
    assert(Profile.checksumDiff(docs, docs.repartition(3), "doc_id", cols, 8)
      .count() === 0, "identical replicas reported drift")
  }

  test("checksum diff: drift localizes to exactly the buckets holding changed keys") {
    import spark.implicits._
    val a = Seq((0L, "x", 10L), (1L, "y", 20L), (2L, "z", 30L), (9L, "w", 40L))
      .toDF("doc_id", "text", "n_chars")
    // replica b: key 9 changed (bucket 9 % 4 = 1), key 2 dropped (bucket 2)
    val b = Seq((0L, "x", 10L), (1L, "y", 20L), (9L, "w", 41L))
      .toDF("doc_id", "text", "n_chars")
    val drift = Profile.checksumDiff(a, b, "doc_id",
      Seq("doc_id", "text", "n_chars"), 4).collect()
    assert(drift.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // bucket 2: present in a only -> b side null counts as drift
    val b2 = drift.find(_.getLong(0) == 2L).get
    assert(!b2.isNullAt(1) && b2.isNullAt(3), s"missing-bucket drift wrong: $b2")
  }

  test("checksum: null placement is load-bearing (concat_ws would erase it)") {
    import spark.implicits._
    val a = Seq((0L, "a", null.asInstanceOf[String])).toDF("doc_id", "u", "v")
    val b = Seq((0L, null.asInstanceOf[String], "a")).toDF("doc_id", "u", "v")
    assert(Profile.checksumDiff(a, b, "doc_id", Seq("u", "v"), 2).count() === 1,
      "(a, null) and (null, a) hashed equal — sentinel coalesce broken")
  }

  test("checksum: no field-boundary aliasing and no NULL-sentinel aliasing " +
    "(the r14 fixed-width per-column digest closes both channels)") {
    import spark.implicits._
    // ("a|b","c") vs ("a","b|c"): distinct rows a delimited concat folds
    // to the same string — a false-negative channel in a drift detector.
    val a = Seq((0L, "a|b", "c")).toDF("doc_id", "u", "v")
    val b = Seq((0L, "a", "b|c")).toDF("doc_id", "u", "v")
    assert(Profile.checksumDiff(a, b, "doc_id", Seq("u", "v"), 2).count() === 1,
      "delimiter-aliased rows hashed equal")
    // a literal "<NULL>" STRING must not collide with NULL
    val c = Seq((0L, "<NULL>")).toDF("doc_id", "u")
    val d = Seq((0L, null.asInstanceOf[String])).toDF("doc_id", "u")
    assert(Profile.checksumDiff(c, d, "doc_id", Seq("u"), 2).count() === 1,
      "string '<NULL>' collided with NULL")
  }

  test("revenue cube: the subtotal lattice is additive and gid separates " +
    "rolled-up dimensions from literal values; Expand above the pre-aggregate") {
    val li = Tables.lineitem(spark, sf0001)
    val out = Analytics.revenueCube(li).collect()
    // grand total row: all dims null, gid = 7 (all three rolled up)
    val grand = out.filter(_.getInt(3) == 7)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
    assert(grand.head.getLong(4) === li.count())
    // additivity: per-flag subtotals (gid=3: status+year rolled) sum to grand
    val perFlag = out.filter(_.getInt(3) == 3)
    assert(perFlag.map(_.getLong(4)).sum === grand.head.getLong(4))
    assert(math.abs(perFlag.map(_.getDouble(5)).sum - grand.head.getDouble(5)) < 1e-3)
    // the finest cells (gid=0) carry no nulls
    assert(out.filter(_.getInt(3) == 0)
      .forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)))
    // plan (r19 shape): the Expand must sit ABOVE the fine-grain
    // pre-aggregate — cubing the raw fact table fans every input row
    // ×2³ through Expand; pre-aggregated, Expand fans tens of group
    // rows. Two hash exchanges total (fine grain + lattice), and the
    // subtree below Expand must already aggregate.
    val p = Analytics.revenueCube(li).queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"cube must plan an Expand:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 2, s"expected 2 exchanges (pre-agg + lattice), got $shuffles:\n$p")
    val expandIdx = p.indexOf("Expand")
    val aggBelow = p.indexOf("HashAggregate", expandIdx)
    assert(aggBelow > 0, s"Expand must read the pre-aggregated grain:\n$p")
  }

  test("functionalDeps (q201): a key FD, a violated FD, NULL groups as a value") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "en", "web"), (Some(2L), "en", "api"),
      (Some(3L), "de", "web"), (Some(4L), "de", "web"),
      (None, "fr", "web"), (None, "fr", "web"))
      .toDF("id", "lang", "src")
    val out = Profile.functionalDeps(df,
        Seq(("id", "lang"), ("lang", "src"), ("src", "lang")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5)))).toMap
    // id→lang: dets {1,2,3,4,NULL} = 5, all single-valued → holds
    assert(out(("id", "lang")) == ((5L, 5L, 1, 0L)), s"got $out")
    // lang→src: en has {web,api} → 1 of 3 dets violates → 333333 micro
    assert(out(("lang", "src")) == ((3L, 4L, 0, 333333L)), s"got $out")
    // src→lang: web → {en,de,fr}, api → {en}: 1 of 2 violates
    assert(out(("src", "lang")) == ((2L, 4L, 0, 500000L)), s"got $out")
  }

  test("associationRules (q216): hand-computed support/confidence/lift, " +
    "distinct collapse, support gate, directional confidence") {
    import spark.implicits._
    // o1 {A,B} (A twice — distinct must collapse), o2 {A,B}, o3 {A,C},
    // o4 {B,C}: n=4, sup A=3 B=3 C=2, AB=2 AC=1 BC=1
    val li = Seq((1L, 10L), (1L, 11L), (1L, 20L), (2L, 10L), (2L, 21L),
      (3L, 12L), (3L, 30L), (4L, 22L), (4L, 31L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "A"), (11L, "A"), (12L, "A"), (20L, "B"),
      (21L, "B"), (22L, "B"), (30L, "C"), (31L, "C"))
      .toDF("p_partkey", "p_brand")
    // pct=50: sup*100 >= n*50 ⟺ sup ≥ 2 → only AB survives
    val gated = graft.operators.Analytics.associationRules(li, part, 50, 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(gated.keySet == Set(("A", "B"), ("B", "A")),
      s"support gate failed: ${gated.keySet}")
    // conf = 2/3 both ways (sup_a = sup_b = 3); lift = 2·4/(3·3)
    assert(gated(("A", "B")) == ((2L, 0.666667, 0.888889)), s"$gated")
    assert(gated(("B", "A")) == ((2L, 0.666667, 0.888889)))
    // pct=25 admits every pair; confidence is DIRECTIONAL for A→C vs C→A
    val all = graft.operators.Analytics.associationRules(li, part, 25, 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(all.size == 6)
    assert(all(("A", "C")) == ((1L, 0.333333, 0.666667)), s"$all")
    assert(all(("C", "A")) == ((1L, 0.5, 0.666667)),
      "confidence must condition on the antecedent's support")
  }

  test("rfmSegments (q221): quintiles assign 5 to the best on every " +
    "axis; census preserves customers and cents") {
    import spark.implicits._
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2026-01-${d + 1}%02d 00:00:00")
    // customer k (1..10): last order day k, k orders, spend 100·k per
    // order → recency/freq/monetary all rank in the same direction:
    // customer 10 is 555, customer 1 is 111
    val orders = (1 to 10).flatMap { k =>
      (1 to k).map(i => (k * 100L + i, k.toLong, day(k), k * 100.0))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.Analytics.rfmSegments(orders).collect()
    val byCell = out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      (r.getLong(3), r.getLong(4))).toMap
    // 10 customers, 5 buckets of 2: customers (2k-1, 2k) share all
    // three scores k (perfectly aligned ranks) → 5 diagonal cells
    assert(byCell.keySet == (1 to 5).map(k => (k, k, k)).toSet,
      s"aligned ranks must land on the diagonal: ${byCell.keySet}")
    (1 to 5).foreach { k =>
      val (n, cents) = byCell((k, k, k))
      val (a, b) = (2 * k - 1, 2 * k)
      assert(n == 2L)
      // customer k spends k orders × 100k cents... = k·k·100·100 cents
      assert(cents == 10000L * (a * a + b * b), s"cell $k cents: $cents")
    }
    assert(out.map(_.getLong(3)).sum == 10L)
  }

  test("associationRules: deterministic across partitionings on the gate corpus") {
    val li = Tables.lineitem(spark, sf001)
    val pt = Tables.part(spark, sf001)
    val a = graft.operators.Analytics.associationRules(li, pt, 1, 50)
      .collect().toSeq
    val b = graft.operators.Analytics.associationRules(li.repartition(7), pt,
      1, 50).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getDouble(4) >= a.last.getDouble(4)),
      "rules must arrive lift-descending")
  }

  test("waitBlockers (q227): only the UNIQUELY-last supplier of a " +
    "multi-supplier order is charged; ties and single-supplier orders " +
    "charge nobody") {
    import spark.implicits._
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // order 1: A ships last alone → A charged. order 2: A/B tie at the
    // max → nobody. order 3: single supplier → nobody. order 4: B last
    // among three (two lines for B — the per-supplier max matters) → B.
    val li = Seq(
      (1L, 10L, d("2024-01-05")), (1L, 20L, d("2024-01-03")),
      (2L, 10L, d("2024-01-05")), (2L, 20L, d("2024-01-05")),
      (3L, 30L, d("2024-01-09")),
      (4L, 10L, d("2024-01-02")), (4L, 20L, d("2024-01-01")),
      (4L, 20L, d("2024-01-04")), (4L, 30L, d("2024-01-01"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "alpha"), (20L, "beta"), (30L, "gamma"))
      .toDF("s_suppkey", "s_name")
    val out = graft.operators.Analytics.waitBlockers(li, supp, 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // numwait ties broken by name: alpha before beta
    assert(out === Seq((10L, "alpha", 1L), (20L, "beta", 1L)), s"got $out")
  }

  test("waitBlockers: deterministic across partitionings on the gate corpus") {
    val li = Tables.lineitem(spark, sf001)
    val supp = Tables.supplier(spark, sf001)
    val a = graft.operators.Analytics.waitBlockers(li, supp, 25).collect().toSeq
    val b = graft.operators.Analytics.waitBlockers(li.repartition(7), supp, 25)
      .collect().toSeq
    assert(a == b)
  }
}
