package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn, Nsw}

/** Per-cell NSW graph ANN: deterministic builds, degree bounds,
  * exact-mode equivalence with brute force, recall at defaults,
  * save/load parity. */
class NswSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val query = Knn.queryVector(emb, 0L)
  private val step = 25

  test("build is deterministic: two builds are bit-identical") {
    def snap() = Nsw.build(emb, step, m = 8, efC = 32)
      .select("centroid_id", "vec_id", "neighbors")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snap() == snap())
  }

  test("degree bound and connectivity: every list ≤ m; no isolated vertex in cells of ≥ 2") {
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    val h = Nsw.health(g).collect()
    assert(h.nonEmpty)
    h.foreach { r =>
      val (n, maxDeg, isolated) = (r.getLong(1), r.getInt(3), r.getLong(4))
      assert(maxDeg <= 8, s"cell ${r.getLong(0)}: degree $maxDeg > m")
      if (n >= 2) assert(isolated == 0,
        s"cell ${r.getLong(0)}: $isolated isolated of $n (insert must always link)")
    }
  }

  test("exact mode: ef ≥ cell size and nprobe ≥ #cells equals brute force bit for bit") {
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    val nsw = Nsw.search(g, cents, query, nprobe = 10000, k = 20, ef = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Ivf.searchInline(emb, step, query, nprobe = 10000, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(nsw == exact)
  }

  test("filtered exact mode equals brute-force filtered KNN bit for bit") {
    import org.apache.spark.sql.functions._
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    val pred = col("label") === 3
    val nsw = Nsw.searchFiltered(g, cents, query,
        emb.where(pred).select("vec_id"), nprobe = 10000, k = 20, ef = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Knn.topKDotFiltered(emb, pred, query, 20)
      .select("vec_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(nsw == exact)
    assert(nsw.nonEmpty)
  }

  test("boundary replication (spill): nprobe=1 recall recovers cross-border " +
    "neighbors on a crafted straddling corpus; eps=0 == plain build; exact mode stays exact") {
    import spark.implicits._
    // Unit circle corpus: cell A anchored at 0°, cell B at 40°; ten
    // points straddle the border at 21°–23.7° (assigned B by a hair);
    // a query at 10° routes to A at nprobe=1 and — without spill —
    // cannot see the straddlers, which ARE its true nearest neighbors.
    def v(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    val rows: Seq[(Long, Array[Float])] =
      Seq((0L, v(0.0))) ++
        (1 to 15).map(i => (i.toLong, v(-30.0 + i))) ++
        (0 until 10).map(i => ((20 + i).toLong, v(21.0 + 0.3 * i))) ++
        Seq((30L, v(40.0))) ++
        (1 to 15).map(i => ((30 + i).toLong, v(38.0 + 0.5 * i)))
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Ivf.centroids(corpus, 30)
    val q = Seq(Tuple1(v(10.0))).toDF("qv")
    val k = 8
    val exact = Ivf.searchInline(corpus, 30, q, nprobe = 10000, k = k)
      .collect().map(_.getLong(0)).toSet
    assert((20L to 26L).toSet.subsetOf(exact), s"craft broken: $exact")
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSet
    def recall(got: Set[Long]) = got.intersect(exact).size.toDouble / k
    val plain = ids(Nsw.search(Nsw.build(corpus, 30, m = 8, efC = 32),
      cents, q, nprobe = 1, k = k, ef = 64))
    val spillG = Nsw.buildSpilled(corpus, cents, eps = 0.1, m = 8, efC = 32)
    val spilled = ids(Nsw.search(spillG, cents, q, nprobe = 1, k = k, ef = 64))
    assert(recall(plain) <= 0.25, s"craft broken: plain recall ${recall(plain)}")
    assert(recall(spilled) == 1.0,
      s"spill must recover the boundary band: ${recall(spilled)}")
    // the replicas are exactly the ε-band: each boundary point appears
    // in BOTH cells, core points in one
    val spillCounts = spillG.groupBy("vec_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (20L to 29L).foreach(i => assert(spillCounts(i) == 2L, s"straddler $i not replicated"))
    (1L to 15L).foreach(i => assert(spillCounts(i) == 1L, s"core $i replicated"))
    // eps = 0 replicates nothing here — bit-identical to the plain build
    def snap(g: org.apache.spark.sql.DataFrame) = g
      .select("centroid_id", "vec_id", "neighbors")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(snap(Nsw.buildSpilled(corpus, cents, eps = 0.0, m = 8, efC = 32)) ==
      snap(Nsw.build(corpus, 30, m = 8, efC = 32)))
    // exact mode over the spilled graph: duplicate candidates collapse
    // exactly (bit-identical scores), brute-force equality holds
    val nswExact = Nsw.search(spillG, cents, q, nprobe = 10000, k = k, ef = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bf = Ivf.searchInline(corpus, 30, q, nprobe = 10000, k = k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(nswExact == bf)
  }

  test("filtered walk traverses non-matching vertices (sparse scattered predicate)") {
    import org.apache.spark.sql.functions._
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    // ~6% of ids, scattered across every cell: if the walk pruned
    // non-matching vertices from the FRONTIER, it could not reach
    // matched nodes routed behind them and would drop results the
    // brute-force filter finds.
    val pred = pmod(col("vec_id"), lit(17L)) === 5
    val nsw = Nsw.searchFiltered(g, cents, query,
        emb.where(pred).select("vec_id"), nprobe = 10000, k = 10, ef = 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Knn.topKDotFiltered(emb, pred, query, 10)
      .select("vec_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(nsw == exact)
    assert(nsw.forall(_._1 % 17 == 5))
  }

  test("recall@20 at default ef/nprobe clears 0.8 on the real corpus") {
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    val approx = Nsw.search(g, cents, query, nprobe = 4, k = 20, ef = 64)
      .collect().map(_.getLong(0)).toSet
    val exact = Ivf.searchInline(emb, step, query, nprobe = 10000, k = 20)
      .collect().map(_.getLong(0)).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@20 = $recall")
  }

  test("save/load roundtrip searches identically and partition-prunes probed cells") {
    val dir = Files.createTempDirectory("graft_nsw").toString
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    Nsw.save(g, dir)
    val loaded = Nsw.load(spark, dir)
    val a = Nsw.search(g, cents, query, nprobe = 4, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Nsw.search(loaded, cents, query, nprobe = 4, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
    // Partition pruning: the probed-cell filter must reach the scan as
    // a partition filter, not a post-scan one.
    val probedPlan = loaded.where(col("centroid_id") === 0L)
      .queryExecution.executedPlan.toString
    assert(probedPlan.contains("PartitionFilters: [isnotnull(centroid_id"),
      s"expected centroid_id partition filter in:\n$probedPlan")
  }

  test("searchBatch equals the per-query loop (routing + walks + top-k, bit for bit)") {
    val cents = Ivf.centroids(emb, step)
    val g = Nsw.build(emb, step, m = 8, efC = 32)
    val ids = Seq(0L, 25L, 111L)
    val batch = Nsw.searchBatch(g, cents, Knn.queryPanel(emb, ids),
        nprobe = 4, k = 10, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val singles = ids.flatMap { qid =>
      Nsw.search(g, cents, Knn.queryVector(emb, qid), nprobe = 4, k = 10, ef = 64)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    assert(batch == singles)
  }

  test("append == rebuild bit for bit when delta ids are higher (the q55 contract)") {
    val base = emb.where(col("vec_id") < 1000L)
    val delta = emb.where(col("vec_id") >= 1000L)
    // FROZEN centroids from the base corpus — the append contract.
    val cents = Ivf.centroids(base, step)
    val g0 = Nsw.build(base, step, m = 8, efC = 32)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("centroid_id", "vec_id", "neighbors")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val appended = Nsw.append(g0, cents, delta, m = 8, efC = 32)
    // Rebuild against the SAME frozen centroids over the union.
    val rebuilt = Nsw.buildWith(emb, cents, m = 8, efC = 32)
    assert(canon(appended) == canon(rebuilt))
    // Re-appending the same delta is a no-op (ids already present).
    assert(canon(Nsw.append(appended, cents, delta, m = 8, efC = 32)) == canon(appended))
  }

  test("tiny crafted cell: neighbors are the true nearest under dot distance") {
    import spark.implicits._
    // 5 colinear vectors — nearest by dot = largest magnitude pairs.
    val vs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(2.0f, 0.0f)), (2L, Array(3.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    // step ≥ n → single centroid/cell.
    val g = Nsw.build(vs, step = 5, m = 2, efC = 8)
    val nodes = g.select("vec_id", "neighbors").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(nodes.size == 5)
    // Graph connected: union-find over edges reaches all 5.
    val edges = nodes.toSeq.flatMap { case (v, ns) => ns.map(v -> _) }
    val reach = collection.mutable.Set(0L)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        if (reach(a) && !reach(b)) { reach += b; changed = true }
        if (reach(b) && !reach(a)) { reach += a; changed = true }
      }
    }
    assert(reach.size == 5, s"graph not connected: $nodes")
  }
}
