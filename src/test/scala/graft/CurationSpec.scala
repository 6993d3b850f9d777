package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Dedup, Events, Ivf, Sampling}

/** Round-7 curation operators: stratified sampling (exact counts,
  * determinism, nesting), embedding outlier flagging, event funnels
  * (strict ordering semantics). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("stratified sample: exactly n per stratum, capped by stratum size") {
    val out = Sampling.stratifiedSample(docs, 5)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.keySet == sizes.keySet, "a stratum disappeared")
    perSource.foreach { case (s, n) => assert(n == math.min(5L, sizes(s))) }
  }

  test("stratified sample: deterministic and nested (top-5 subset of top-10)") {
    def ids(n: Int) = Sampling.stratifiedSample(docs, n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(5) == ids(5), "sample not reproducible")
    assert(ids(5).subsetOf(ids(10)), "md5-order samples must nest")
  }

  test("weighted reservoir: exactly min(k, stratum) per source, partition-invariant") {
    val out = Sampling.weightedReservoir(docs, 5)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.keySet == sizes.keySet, "a stratum disappeared")
    perSource.foreach { case (s, n) => assert(n == math.min(5L, sizes(s))) }
    // a pure function of (data, seed, k): repartitioning cannot move it
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSeq
    val re = Sampling.weightedReservoir(docs.repartition(7), 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == re, "sample depends on input partitioning")
  }

  test("weighted reservoir: matches the driver-side A-ES formula exactly") {
    val expected = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
      .map { case (id, src, w) =>
        val u = ((id * 1103515245L + 2026L) % 2147483648L + 1).toDouble / 2147483649.0
        val key = BigDecimal(math.log(u) / w.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, (-key, id), id)
      }
      .groupBy(_._1).iterator.flatMap { case (_, rows) =>
        rows.sortBy(_._2).take(5).map(_._3)
      }.toSet
    val got = Sampling.weightedReservoir(docs, 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "operator disagrees with the brute-force A-ES selection")
  }

  test("weighted reservoir: heavier rows dominate selection across seeds") {
    // one heavy doc (w = 100000) against nine featherweights (w = 1):
    // at k = 1 the heavy doc's win probability is 1 - 9e-5 per seed, so
    // across 20 fixed seeds it must take every draw
    val crafted = (0L to 9L).map(i =>
      (i, "g", if (i == 3L) 100000L else 1L)).toDF("doc_id", "source", "n_chars")
    val wins = (1L to 20L).map { seed =>
      Sampling.weightedReservoir(crafted, 1, seed)
        .select("doc_id").collect().head.getLong(0)
    }
    assert(wins.forall(_ == 3L), s"featherweight beat a 1e5x weight: $wins")
  }

  test("outliers: a far point flags at 2x its cluster mean, the huddle does not") {
    // centroid stride 4 over 8 vectors → centroids from vec 0 (origin)
    // and vec 4 (10,10) — the far point's id is NOT on the stride, so
    // it cannot seed its own zero-distance cluster. Cluster 1 holds a
    // tight huddle plus the far point, whose dist (3200) dwarfs the
    // cluster mean (~800); vec 3 sits at EXACTLY 2x cluster-0's mean,
    // pinning the strict-inequality edge.
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(0.0f, 0.1f)),
      (3L, Array(0.1f, 0.1f)),
      (4L, Array(10.0f, 10.0f)),
      (5L, Array(10.1f, 10.0f)),
      (6L, Array(10.0f, 10.1f)),
      (7L, Array(50.0f, 50.0f)))
      .toDF("vec_id", "embedding")
    val out = Clusters.outliers(vecs, 4, 2, 1).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out.size == 8)
    assert(out(7L) == 1, "far point not flagged")
    assert((0L to 6L).forall(out(_) == 0),
      "cluster body misflagged (vec 3 at exactly 2x mean must NOT flag)")
  }

  test("outliers: flags are relative to each cluster's own mean") {
    val emb = Tables.embeddings(spark, sf001)
    // default 5/4 gate: on a uniform-random 64-dim corpus the distance
    // distribution concentrates (max/mean ~1.27), so 1.25x catches the
    // genuine tail and 2x catches nothing — see Clusters.outliers
    val out = Clusters.outliers(emb, 25)
    val agg = out.agg(
      count(lit(1)).as("n"),
      sum("is_outlier").as("flagged")).collect().head
    // every in-dimension vector is scored; a 2x-mean gate flags a
    // minority tail, never the bulk
    assert(agg.getLong(0) == emb.count())
    assert(agg.getLong(1) > 0 && agg.getLong(1) < agg.getLong(0) / 5,
      s"flagged=${agg.getLong(1)} of ${agg.getLong(0)}")
  }

  test("funnel: strict temporal ordering — wrong-order steps do not convert") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      // u1: full path in order
      (1L, ts(0), 10L, "view", 1.0, "{}"),
      (2L, ts(1), 10L, "click", 1.0, "{}"),
      (3L, ts(2), 10L, "purchase", 1.0, "{}"),
      // u2: clicked BEFORE viewing — converts to view only
      (4L, ts(0), 20L, "click", 1.0, "{}"),
      (5L, ts(1), 20L, "view", 1.0, "{}"),
      // u3: view + click, no purchase
      (6L, ts(0), 30L, "view", 1.0, "{}"),
      (7L, ts(1), 30L, "click", 1.0, "{}"),
      // u4: purchase at the SAME instant as click — strict > excludes
      (8L, ts(0), 40L, "view", 1.0, "{}"),
      (9L, ts(1), 40L, "click", 1.0, "{}"),
      (10L, ts(1), 40L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows("view") == 4L)
    assert(rows("click") == 3L, "u2's pre-view click must not count")
    assert(rows("purchase") == 1L, "same-instant purchase must not count")
  }

  test("funnel: conversion rates derive from adjacent stages") {
    val rows = Events.funnel(Tables.events(spark, sf001),
      Seq("view", "click", "purchase")).collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(3) == 1.0)
    val n = rows.map(_.getLong(2))
    assert(n(0) >= n(1) && n(1) >= n(2), "funnel must shrink monotonically")
    assert(math.abs(rows(1).getDouble(3) - n(1).toDouble / n(0)) < 1e-6)
  }

  test("percentiles: hand-computed ranks on a crafted group, ties collapse correctly") {
    import graft.operators.Profile
    // values (sorted): 1,2,2,3,100 -> n=5; rank(q) = (4q)//100 + 1
    // p50 -> rank 3 -> 2; p90 -> rank 4 -> 3; p99 -> rank 4 -> 3; p100 -> rank 5 -> 100
    val df = Seq[(String, java.lang.Long)](("a", 3L), ("a", 1L), ("a", 2L),
      ("a", 100L), ("a", 2L), ("b", 7L), ("b", null))
      .toDF("source", "n_chars")
    val out = Profile.percentiles(df, "source", "n_chars", Seq(0, 50, 90, 99, 100))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 5L)
    assert(Seq(a.getLong(2), a.getLong(3), a.getLong(4), a.getLong(5), a.getLong(6))
      == Seq(1L, 2L, 3L, 3L, 100L))
    val b = out("b") // null value excluded: n=1, every percentile = 7
    assert(b.getLong(1) == 1L)
    assert(Seq(b.getLong(2), b.getLong(3), b.getLong(6)) == Seq(7L, 7L, 7L))
  }

  test("percentiles: approx twin lands within one order-statistic of exact") {
    import graft.operators.Profile
    // exact pins rank ((n-1)q)//100+1; the sketch's discrete-rank
    // convention differs by at most one position (and its rank error is
    // <1 at accuracy 10k with these stratum sizes), so the approx value
    // must be one of the order statistics at ranks r-1..r+1.
    val vals = docs.select("source", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val approx = Profile.percentilesApprox(docs, "source", "n_chars", Seq(50, 90, 99))
      .collect()
    assert(approx.length == vals.size)
    approx.foreach { r =>
      val vs = vals(r.getString(0))
      Seq((50, 2), (90, 3), (99, 4)).foreach { case (q, i) =>
        val rank = ((vs.length - 1) * q) / 100 + 1
        val lo = vs(math.max(rank - 2, 0))
        val hi = vs(math.min(rank, vs.length - 1))
        val v = r.getLong(i)
        assert(v >= lo && v <= hi,
          s"p$q for ${r.getString(0)}: $v outside order-stat window [$lo, $hi]")
      }
    }
  }

  test("pps sample: hits telescope to exactly n; heavy docs guaranteed in; " +
    "zero-weight docs never selected; deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf001)
    val n = SparkEntry.Params.PpsN
    val out = Sampling.ppsSample(docs, n).collect()
    assert(out.map(_.getLong(2)).sum == n, "pin count did not telescope to n")
    assert(out.forall(_.getLong(1) > 0), "a zero-weight doc was selected")
    // pigeonhole: any doc with w*n > total spans a full pin interval
    val total = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    val heavy = docs.where(col("n_chars") * n > total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(heavy.subsetOf(out.map(_.getLong(0)).toSet),
      "a heavier-than-interval doc missed the sample")
    val again = Sampling.ppsSample(docs, n).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq, "sample not deterministic")
    // crafted corpus: the 10x-weight doc takes ~10x the pins of a peer
    val crafted = (0L until 20L).map(i => (i, if (i == 7L) 1000L else 100L))
      .toDF("doc_id", "n_chars")
    val c = Sampling.ppsSample(crafted, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(c.getOrElse(7L, 0L) >= 3, s"10x-weight doc under-sampled: $c")
  }

  test("retention: offset-0 diagonal equals cohort size; users partition across cohorts") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf0001)
    val rows = graft.operators.Events.retention(events).collect()
    assert(rows.nonEmpty)
    // offset 0 = the cohort's own first week: everyone is active
    rows.filter(_.getInt(1) == 0).foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"offset-0 cell not full: $r")
      assert(r.getDouble(4) == 1.0)
    }
    // cohort sizes partition the distinct-user universe
    val sizes = rows.filter(_.getInt(1) == 0).map(_.getLong(3)).sum
    val users = events.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(sizes == users, s"cohort sizes $sizes != distinct users $users")
    // retention never exceeds 1 and later offsets never exceed cohort size
    rows.foreach { r => assert(r.getLong(2) <= r.getLong(3) && r.getDouble(4) <= 1.0) }
  }

  test("anomalies: a planted spike hour flags with positive z; steady hours stay quiet; " +
    "constant series produces no flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 24 steady hours of 10 events + one spike hour of 100
    val rows = (0 until 24).flatMap { h =>
      val n = if (h == 12) 100 else 10
      (0 until n).map(i => ("click", f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    } ++ (0 until 24).flatMap { h => // constant control series
      (0 until 10).map(i => ("view", f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    }
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    val out = graft.operators.Events.anomalies(events, 2).collect()
    val clicks = out.filter(_.getString(0) == "click")
    assert(clicks.length == 1 && clicks.head.getString(1).startsWith("2024-03-01 12"),
      s"spike hour not the sole click flag: ${out.toSeq}")
    assert(clicks.head.getDouble(3) > 2.0, "spike z-score not positive beyond the gate")
    assert(!out.exists(_.getString(0) == "view"),
      "constant series produced a false positive (zero-variance guard failed)")
  }

  test("changepoint: a planted level shift localizes to the exact hour, " +
    "with exact before/after means; a constant series reports zero shift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // click: 10 hours at 3/hour then 10 hours at 9/hour — the CUSUM
    // argmax must land on t=10 (the last pre-shift hour)
    val rows = (0 until 20).flatMap { h =>
      val n = if (h < 10) 3 else 9
      (0 until n).map(i => ("click", f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    } ++ (0 until 20).flatMap { h => // constant control: 5/hour
      (0 until 5).map(i => ("view", f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    }
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    val out = graft.operators.Events.changepoint(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val (nh, hour, t, before, after, shift) = out("click")
    assert(nh == 20L && t == 10L && hour == "2024-03-01 09:00:00",
      s"shift not localized: ${out("click")}")
    assert(before == 3.0 && after == 9.0 && shift == 6.0, s"means: ${out("click")}")
    // constant series: every S_t is 0, earliest-t tie-break wins, shift 0
    val (_, _, tv, bv, av, sv) = out("view")
    assert(tv == 1L && bv == 5.0 && av == 5.0 && sv == 0.0, s"constant: ${out("view")}")
  }

  test("seasonal anomalies: a night-hour spike invisible to the flat q73 " +
    "baseline is flagged against its hour-of-day slot, with the exact z") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 days, diurnal profile: busy 9-17h at 30/hr, quiet hours at 2/hr;
    // day 5's 03:00 spikes to 10 — tiny vs daytime variance, huge vs its slot
    val rows = for {
      d <- 1 to 10; h <- 0 until 24
      n = if (d == 5 && h == 3) 10 else if (h >= 9 && h <= 17) 30 else 2
      i <- 0 until n
    } yield ("view", f"2024-03-$d%02d $h%02d:${i / 60}%02d:${i % 60}%02d")
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    val seasonal = graft.operators.Events.seasonalAnomalies(events, 2).collect()
    val spike = seasonal.filter(_.getString(1) == "2024-03-05 03:00:00")
    assert(spike.length == 1, s"slot spike not flagged: ${seasonal.map(_.getString(1)).toSeq}")
    // exact integers: cnt=10, sum=28, sum2=136 -> num=72, den2=576, z=3.0
    assert(spike.head.getInt(2) == 3 && spike.head.getLong(3) == 10L
      && spike.head.getDouble(4) == 3.0, s"spike row: ${spike.head}")
    // no other hour clears its slot gate (all other slots are constant)
    assert(seasonal.length == 1, s"false positives: ${seasonal.toSeq}")
    // the flat baseline is blind to it: q73 does not flag that hour
    val flat = graft.operators.Events.anomalies(events, 2).collect()
    assert(!flat.exists(_.getString(1) == "2024-03-05 03:00:00"),
      "flat baseline unexpectedly flagged the slot spike — the differential is moot")
  }

  test("holt forecast: constant series pins level with zero trend; " +
    "linear ramp converges onto the ramp; driver-fold differential") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // view: constant 5/hour; click: exact ramp 2,4,6,...,40 per hour
    val rows = (0 until 20).flatMap { h =>
      (0 until 5).map(i => ("view", f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    } ++ (0 until 20).flatMap { h =>
      (0 until 2 * (h + 1)).map(i => ("click", f"2024-03-01 $h%02d:${i / 60}%02d:${i % 60}%02d"))
    }
    val events = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    val out = graft.operators.Events.holtForecast(events, 2, 1, 10, 3).collect()
      .map(r => r.getString(0) -> r).toMap
    // constant series: l stays x*1e6 exactly, b stays 0, forecasts flat
    val v = out("view")
    assert(v.getLong(3) === 5000000L && v.getLong(4) === 0L)
    assert(v.getLong(5) === 5000000L && v.getLong(7) === 5000000L)
    // exact ramp: the fitted trend must approach the true slope
    // (2/hour) and the 1-step forecast must overshoot the last level
    val c = out("click")
    assert(c.getLong(1) === 20L && c.getString(2) === "2024-03-01 19:00:00")
    val trend = c.getLong(4)
    assert(trend > 1000000L && trend < 3000000L, s"ramp trend off: $trend")
    assert(c.getLong(5) === c.getLong(3) + trend)
    assert(c.getLong(7) === c.getLong(3) + 3 * trend)
    // driver differential: the exact integer fold, re-run in plain Scala
    val xs = (0 until 20).map(h => 2L * (h + 1))
    var l = xs.head * 1000000L; var b = 0L
    xs.zipWithIndex.drop(1).foreach { case (x, t) =>
      val bEff = if (t == 1) (x - xs.head) * 1000000L else b
      val lNew = (2L * x * 1000000L + 8L * (l + bEff)) / 10L
      b = (1L * (lNew - l) + 9L * bEff) / 10L
      l = lNew
    }
    assert(c.getLong(3) === l && c.getLong(4) === b,
      s"distributed fold != driver fold: (${c.getLong(3)}, ${c.getLong(4)}) vs ($l, $b)")
  }

  test("covisitation: crafted incidence pins exact cosines; the user cap " +
    "bounds pair mass; top-k and ordering are deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ev(user: Long, item: Int, times: Int) =
      (0 until times).map(i => (user, s"""{"k": $item}""", f"2024-03-01 00:$i%02d:00"))
    // users 1-3 all touch items 10+20; user 3 alone adds 30.
    val rows = Seq(1L, 2L, 3L).flatMap(u => ev(u, 10, 1) ++ ev(u, 20, 1)) ++
      ev(3L, 30, 1)
    val events = rows.toDF("user_id", "props", "ts_s")
      .select(col("user_id"), col("props"), to_timestamp(col("ts_s")).as("ts"))
    val out = graft.operators.Events.covisitation(events, 15, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // co(10,20)=3 users, n=3 each -> cosine exactly 1; co(20,30)=1, n 3x1 -> 1/sqrt(3)
    assert(out((10L, 20L)) === ((3L, 1.0)))
    assert(out((20L, 10L)) === ((3L, 1.0)))
    assert(out((20L, 30L)) === ((1L, 0.57735)))
    assert(out((30L, 20L)) === ((1L, 0.57735)))
    assert(out.size === 6) // 3 items x 2 neighbors each

    // cap: a bot user touching 10 items with cap 3 keeps its TOP-3 by
    // (count desc, item asc) — pair mass C(3,2), not C(10,2)
    val bot = (0 until 10).flatMap(i => ev(9L, 100 + i, if (i < 3) 2 else 1))
    val botEvents = bot.toDF("user_id", "props", "ts_s")
      .select(col("user_id"), col("props"), to_timestamp(col("ts_s")).as("ts"))
    val capped = graft.operators.Events.covisitation(botEvents, 3, 10).collect()
    val items = capped.map(_.getLong(0)).toSet
    assert(items === Set(100L, 101L, 102L), s"cap kept wrong items: $items")
    assert(capped.length === 6) // 3 items x 2 neighbors

    // partition invariance
    val a = graft.operators.Events.covisitation(events.repartition(1), 15, 5)
      .collect().toSeq
    val b = graft.operators.Events.covisitation(events.repartition(7), 15, 5)
      .collect().toSeq
    assert(a === b)
  }

  test("zipf report: an exact 1/rank corpus fits slope -1; shape counts exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // freq(rank r) = 12/r for r = 1..4 → ln f = ln 12 − ln r: slope is
    // exactly −1, intercept ln 12; plus one hapax ("e" appears once)
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d") ++ Seq("e")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = graft.operators.Analytics.zipfReport(docs, 4).collect()(0)
    assert(r.getLong(0) == 26L && r.getLong(1) == 5L && r.getLong(2) == 1L,
      s"shape: $r")
    assert(r.getDouble(3) == math.round(12.0 / 26 * 1e6) / 1e6, s"top1: $r")
    assert(r.getLong(4) == 4L)
    assert(math.abs(r.getDouble(5) + 1.0) < 1e-4, s"slope: ${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - math.log(12.0)) < 1e-4,
      s"intercept: ${r.getDouble(6)}")
  }

  test("dsir: target-vocabulary docs score positive, anti-target negative, determinism") {
    import graft.operators.Sampling
    // tgt-source docs speak {alpha beta}, raw-pool docs speak {delta
    // omega} — four tokens chosen to land in DISTINCT hash buckets mod
    // 64 (59/43/17/52). Token counts are large enough (30 per doc) that
    // the Laplace +1/+B smoothing doesn't swamp the signal (with 3-token
    // docs the B=64 prior pulls every ratio below 1).
    def rep(t: String, n: Int) = Seq.fill(n)(t).mkString(" ")
    val df = Seq(
      (1L, rep("alpha", 30), "tgt"),
      (2L, rep("beta", 30), "tgt"),
      (3L, rep("delta", 30), "web"),
      (4L, rep("omega", 30), "web"),
      (5L, "alpha beta", "web"),   // target-looking doc IN the raw pool
      (6L, "delta omega", "web"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.dsirWeights(df, Seq("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 6)
    assert(out(5L) > 0, "target-vocabulary doc must score positive")
    assert(out(6L) < 0, "anti-target doc must score negative")
    assert(out(1L) > out(3L), "target docs must outrank raw docs")
    val again = Sampling.dsirWeights(df, Seq("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out, "weights must be a pure function of the data")
  }

  test("dsir: power-of-two bucket fast path equals the general pmod(hash60) " +
    "bucket for every token (and a non-power-of-two B still works)") {
    import graft.operators.Dedup
    // The r14 rewrite converts only the trailing ⌈m/4⌉ hex chars of the
    // md5 window when B = 2^m (B | 16^k ⟹ higher digits ≡ 0 mod B).
    // Pin the number theory over real corpus tokens for the shipped
    // B=256 and a second power of two that is NOT a whole hex-digit
    // boundary (B=32, m=5 → k=2, pmod still required).
    val toks = docs.select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
    for (b <- Seq(32, 256)) {
      val k = (java.lang.Long.numberOfTrailingZeros(b.toLong) + 3) / 4
      val mismatches = toks.select(
          pmod(Dedup.hash60(col("t")), lit(b.toLong)).as("full"),
          pmod(conv(substring(md5(col("t")), (16 - k).toInt, k.toInt), 16, 10)
            .cast("long"), lit(b.toLong)).as("fast"))
        .where(col("full") =!= col("fast")).count()
      assert(mismatches == 0L, s"trailing-hex bucket diverges at B=$b")
    }
    // Non-power-of-two B exercises the general path end-to-end.
    val odd = graft.operators.Sampling.dsirWeights(docs, Seq("src0"), buckets = 100)
    assert(odd.count() > 0)
  }

  test("dsir: empty docs drop out; per-doc sum is n_tokens-consistent") {
    import graft.operators.Sampling
    val out = Sampling.dsirWeights(docs, Seq("src0", "src1"), buckets = 256)
    val rows = out.collect()
    val nDocsWithTokens = docs
      .where(length(trim(col("text"))) > 0).count()
    assert(rows.length == nDocsWithTokens)
    // avg_lw_micro must equal floor(sum/n) recomputed (self-consistency)
    rows.foreach { r =>
      val want = math.floor(r.getLong(2).toDouble / r.getLong(1)).toLong
      assert(r.getLong(3) == want, s"avg_lw_micro drifted on ${r.getLong(0)}")
    }
  }

  test("ppsSample: overflow guard rejects weight sums past Long.MaxValue/n") {
    import graft.operators.Sampling
    val big = Seq((1L, Long.MaxValue / 2), (2L, Long.MaxValue / 2 - 1))
      .toDF("doc_id", "n_chars")
    val e = intercept[IllegalArgumentException] { Sampling.ppsSample(big, 5) }
    assert(e.getMessage.contains("pre-scale"))
  }

  test("temperatureSample: sqrt rule lifts the tail, nests, caps at source size") {
    import graft.operators.Sampling
    // 900/100 split: s = 30000/10000, so budget 100 quotas 75/25 —
    // proportional sampling would give 90/10; sqrt lifts the tail 2.5x
    val docs = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureSample(docs, 100L)
    val per = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("big" -> 75L, "small" -> 25L), s"got $per")
    // deterministic hash order → smaller budgets nest inside larger
    val ids100 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids40 = Sampling.temperatureSample(docs, 40L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids40.size == 40 && ids40.subsetOf(ids100))
    // a budget beyond the corpus caps every quota at the source size
    val all = Sampling.temperatureSample(docs, 100000L).count()
    assert(all == 1000L)
  }

  test("conversionLatencyDeciles: first-to-first, same-instant converts, " +
    "pre-signup purchases don't") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val evs = Seq(
      (1L, t(0L), "signup"), (1L, t(100L), "purchase"),  // latency 100
      (2L, t(50L), "signup"), (2L, t(40L), "purchase"),  // purchase BEFORE signup only → no row
      (3L, t(50L), "signup"), (3L, t(50L), "purchase"),  // same instant → latency 0
      (4L, t(10L), "purchase"))                          // never signed up → no row
      .zipWithIndex.map { case ((u, ts0, ty), i) => (i.toLong, ts0, u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.conversionLatencyDeciles(evs, "signup", "purchase", 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // two converting users: u3 at 0 s, u1 at 100 s → one per bucket
    assert(out == Map(1 -> ((1L, 0L, 0L, 0.0)), 2 -> ((1L, 100L, 100L, 100.0))),
      s"got $out")
  }

  test("sessionPaths (q83): gap boundary, tie order, maxSteps truncation, ranking") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val evs = Seq(
      // user 1: gap EXACTLY 30 min (1800 s) is NOT > gap → same session;
      // 3601 s later → new session of one event
      (1L, t(0L), 10L, "a"),
      (1L, t(1800L), 11L, "b"),
      (1L, t(5401L), 12L, "c"),
      // user 2: five events in one session (truncates to 3 steps); the
      // t=100 tie must order by event_id (21 before 22) even though the
      // rows arrive reversed
      (2L, t(0L), 20L, "a"),
      (2L, t(100L), 22L, "c"),
      (2L, t(100L), 21L, "b"),
      (2L, t(200L), 23L, "d"),
      (2L, t(300L), 24L, "e"),
      // user 3: a second "a>b" session so the count ranking is exercised
      (3L, t(0L), 30L, "a"),
      (3L, t(10L), 31L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.sessionPaths(evs, gapMinutes = 30, maxSteps = 3, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("a>b" -> 2L, "a>b>c" -> 1L, "c" -> 1L),
      s"got $out")
  }

  test("sessionPaths: topN cuts after the (count desc, path asc) order") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val evs = (0L until 6L).map(u => (u, t(0L), u * 10, s"t$u"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.sessionPaths(evs, 30, 3, 4)
      .collect().map(_.getString(0)).toSeq
    // six single-event paths all tie at count 1 → first 4 by path asc
    assert(out == Seq("t0", "t1", "t2", "t3"))
  }

  test("compressionSignal: repetitive text flags, varied text passes, values recompute") {
    import graft.functions.Deflate
    import graft.operators.TextAnalysis
    import org.apache.spark.unsafe.types.UTF8String
    val boiler = "click here click here click here " * 30
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "astronomers quarrel about parallax, cepheids, and the distance ladder."
    val docs = Seq((1L, boiler), (2L, prose), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // empty/null rows are absent by contract
    assert(out.keySet == Set(1L, 2L))
    val (bBytes, bDef, bRatio, bFlag) = out(1L)
    val (pBytes, pDef, pRatio, pFlag) = out(2L)
    // exact recompute against the kernel
    assert(bDef == Deflate.deflateLen(UTF8String.fromString(boiler)).toLong)
    assert(bRatio == bDef * 1000000L / bBytes)
    assert(pRatio == pDef * 1000000L / pBytes)
    // the signal: boilerplate compresses far better than prose, and only it flags
    assert(bRatio < pRatio / 3)
    assert(bFlag == 1 && pFlag == 0)
  }

  test("compressionSignal on the real corpus: ratios bounded, gate fires on a minority") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.compressionSignal(Tables.documents(spark, sf0001)).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val ratio = r.getLong(3)
      ratio > 0 && ratio < 1200000L // deflate overhead can exceed 1.0 only slightly
    })
    val flagged = out.count(_.getInt(4) == 1)
    assert(flagged < out.length, "gate must not flag the whole corpus")
  }

  test("movingDailyRevenue: RANGE frame is calendar-aware — gaps shrink the window where " +
    "a ROWS frame would lie; exact cents and integer-micro averages") {
    val ev = Seq(
      ("purchase", "2026-01-01 10:00:00", 10.0),
      ("purchase", "2026-01-02 10:00:00", 20.0),
      ("purchase", "2026-01-10 10:00:00", 40.0),   // 8-day gap
      ("view",     "2026-01-02 09:00:00", 99.0)    // other type: separate partition
    ).toDF("event_type", "ts_s", "value")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"), col("value"))
    val out = Events.movingDailyRevenue(ev, 7).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("purchase", "2026-01-02")) == ((30.0, 2L, 15.0)))
    // Day 10's 7-day window spans days 4-10: ONLY itself — a last-3-ROWS
    // frame would have smuggled in days 1 and 2.
    assert(out(("purchase", "2026-01-10")) == ((40.0, 1L, 40.0)))
    assert(out(("view", "2026-01-02")) == ((99.0, 1L, 99.0)))
    assert(out.size == 4)
  }

  test("sessionizeNative == sessionize on the real corpus; an exact-gap pair chains in BOTH " +
    "(the inclusive-merge boundary)") {
    val events = Tables.events(spark, sf0001)
    val native = graft.operators.Events.sessionizeNative(events, 30).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val classic = graft.operators.Events.sessionize(events, 30).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(native == classic,
      "native session_window sessions != lag/cumsum sessions (as multisets)")
    // Exactly-gap pair: 30:00 apart — sessionize chains (> gap splits),
    // and Spark's inclusive window merge must chain too.
    val pair = Seq(
      (1L, "2026-01-01 10:00:00", 5.0),
      (1L, "2026-01-01 10:30:00", 7.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("value"))
    val one = graft.operators.Events.sessionizeNative(pair, 30).collect()
    assert(one.length == 1 && one.head.getLong(3) == 2L,
      s"exact-gap pair must form ONE session: ${one.toSeq}")
    assert(one.head.getString(2) == "2026-01-01 11:00:00",
      "session_end should be last_ts + gap")
  }

  test("clusterBalancedSample: ≤ cap per cell, every non-empty cell kept, " +
    "subset of the assignment, partition-invariant") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val out = Sampling.clusterBalancedSample(emb, 25, 8).collect()
    val perCell = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val assigned = Ivf.build(emb, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cellSizes = assigned.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perCell.keySet == cellSizes.keySet, "a non-empty cell disappeared")
    perCell.foreach { case (c, n) =>
      assert(n == math.min(8, cellSizes(c)), s"cell $c: got $n of ${cellSizes(c)}")
    }
    // every sampled row IS an assignment row (same cell, same dist)
    val asgSet = assigned.map(t => (t._2, t._1, t._3)).toSet
    out.foreach { r =>
      val t = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(asgSet.contains(t), s"sampled row $t not in the assignment")
    }
    val re = Sampling.clusterBalancedSample(emb.repartition(7), 25, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == re,
      "sample depends on input partitioning")
  }

  test("containmentPairs: a verbatim quote inside a longer doc scores " +
    "containment 1.0 on the short side while its Jaccard stays low") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = "one two three four five six seven eight nine ten " +
      short + " eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val docs = Seq(
      (1L, "en", "web", short),
      (2L, "en", "web", long),
      (3L, "en", "web", "totally different words entirely here now")
    ).toDF("doc_id", "lang", "source", "text")
    val pairs = Dedup.containmentPairs(docs, 3, 0.5).collect()
    assert(pairs.length == 1, s"expected only the (1,2) pair: ${pairs.toSeq}")
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getDouble(2) == 1.0, "short side fully contained")
    assert(p.getDouble(3) < 0.5, "long side only partially covered")
    // the same pair under Jaccard is BELOW the near-dup bar — the case
    // this operator exists for
    val j = Dedup.ngramJaccard(docs, 3).collect()
      .find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    assert(j < 0.25, s"quote-inclusion pair should have low Jaccard, got $j")
  }

  test("containmentPairs: blocked (cross-source pair invisible), directed " +
    "ratios match a driver-side recompute on the real corpus") {
    val crafted = Seq(
      (1L, "en", "web", "alpha beta gamma delta"),
      (2L, "en", "books", "alpha beta gamma delta")
    ).toDF("doc_id", "lang", "source", "text")
    assert(Dedup.containmentPairs(crafted, 3, 0.1).isEmpty,
      "pairs must not cross the (lang, source) block")

    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Dedup.containmentPairs(docs, 3, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    // brute-force recompute
    def shingleSet(t: String) =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val rows = docs.select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), shingleSet(r.getString(3))))
    val expected = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3 && a._4.nonEmpty && b._4.nonEmpty
      inter = (a._4 & b._4).size
      ca = BigDecimal(inter.toDouble / a._4.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      cb = BigDecimal(inter.toDouble / b._4.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if math.max(ca, cb) >= 0.5
    } yield ((a._1, b._1), (ca, cb))).toMap
    assert(got == expected,
      s"containment mismatch: got ${got.size} pairs, expected ${expected.size}")
  }

  test("leakageSafeSplit (q203): zero straddling clusters by construction; " +
    "the naive rule leaks on a crafted boundary cluster") {
    import graft.operators.CorpusPipeline
    // craft a near-dup pair whose two doc_ids hash to DIFFERENT naive
    // splits (searched offline over hash60 % 100 at trainPct 50), plus
    // distinct singleton docs
    val base = "the quick brown fox jumps over the lazy dog again and again"
    def naive(id: Long): String = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 15), 16)
      if (h % 100 < 50) "train" else "eval"
    }
    // find two ids with opposite naive splits (deterministic search)
    val a = (1L to 100L).find(i => naive(i) == "train").get
    val b = (1L to 100L).find(i => naive(i) == "eval").get
    val docs = Seq(
      (a, base, "en", "s", base.length.toLong),
      (b, base + " tail", "en", "s", base.length.toLong + 5),
      (900L, "completely different words about snow and ice", "en", "s", 40L),
      (901L, "unrelated content mentioning ships and harbors", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPipeline.leakageSafeSplit(docs, 3, 12, 2, 0.5, 50)
      .collect()
    val safeLeaks = out.head.getLong(out.head.fieldIndex("leaky_clusters_safe"))
    val naiveLeaks = out.head.getLong(out.head.fieldIndex("leaky_clusters_naive"))
    assert(safeLeaks == 0L, s"cluster-keyed split must never straddle: $safeLeaks")
    assert(naiveLeaks == 1L,
      s"the crafted cluster must leak under the doc-keyed rule: $naiveLeaks")
    // the dup pair follows its representative: both docs in ONE split
    val dupDocs = out.map(r =>
      r.getString(0) -> r.getLong(r.fieldIndex("n_dup_docs"))).toMap
    assert(dupDocs.values.sum == 2L && dupDocs.values.max == 2L,
      s"both near-dups must land in one split: $dupDocs")
  }

  test("peakConcurrency: half-open intervals, per-instant netting, " +
    "day-boundary offset carry, first-peak tie-break, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted view sessions (value = duration seconds):
    //   A [00:00, 00:10), B [00:05, 00:15), C [00:10, 00:20)
    // at 00:10 A closes exactly as C opens (half-open: net 0) → conc
    // stays 2; peak 2 first attained at 00:05.
    // click: one session crossing MIDNIGHT [23:59:50 +20s) plus one
    // the next day [00:00:05 +10s) → overlap 2 via the day-offset carry.
    val rows = Seq(
      ("view", "2024-03-01 00:00:00", 10.0),
      ("view", "2024-03-01 00:00:05", 10.0),
      ("view", "2024-03-01 00:00:10", 10.0),
      ("click", "2024-03-01 23:59:50", 20.0),
      ("click", "2024-03-02 00:00:05", 10.0))
    val events = rows.toDF("event_type", "ts_s", "value")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"), col("value"))
    val out = graft.operators.Events.peakConcurrency(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000L
    assert(out("view") == ((2L, us("2024-03-01 00:00:05"))),
      s"view: ${out("view")} — half-open close-at-open must not read 3, " +
        "and the FIRST instant attaining the peak must win")
    assert(out("click") == ((2L, us("2024-03-02 00:00:05"))),
      s"click: ${out("click")} — the midnight-crossing session's open " +
        "count must carry into the next day bucket")
    // real-corpus partition invariance (the two-phase prefix sum must
    // not depend on task layout)
    val corpus = Tables.events(spark, sf0001)
    assert(graft.operators.Events.peakConcurrency(corpus).collect().toSeq ==
      graft.operators.Events.peakConcurrency(corpus.repartition(13)).collect().toSeq)
  }
}
