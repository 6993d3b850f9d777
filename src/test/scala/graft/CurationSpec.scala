package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Events, Sampling}

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
}
