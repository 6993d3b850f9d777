package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.plans.GroupedTopK

/** In-engine recall audit for the ANN serving ladder (q62) — the
  * compression-ladder counterpart of [[Dedup.lshRecallReport]] (q60):
  * recall@k of the BATCHED serving paths ([[Ivf.searchBatch]],
  * [[Pq.searchAdcBatch]], [[Pq.searchAdcCellsBatch]]) against exact
  * top-k truth, per query of a sampled panel, as a queryable DataFrame
  * instead of spec prose. The reference eyeballs its index quality by
  * printing one search's neighbors (Program.cs:216-227); a 100 TB
  * pipeline needs the dial as data — run the audit per index build and
  * alert on regression.
  *
  * Scale contract: the panel is a SAMPLE (tens of queries — the audit
  * estimates a distribution, it is not production serving), so the
  * exact-truth legs are q-bounded crossJoins of broadcast queries —
  * n × q scored rows through [[GroupedTopK]]'s bounded heaps, no sort,
  * the same block-bounded-truth shape q60 uses. Each audited method
  * runs its real batched serving plan, so the report measures the
  * exact code path production queries take.
  *
  * Output: one row per (query_id, method) — `ivf` (probed exact-dot
  * rerank, truth = exact dot top-k), `pq_adc` (flat 32×-compressed
  * ADC, truth = exact L2 top-k), `ivfpq` (probed ADC, truth = exact L2
  * top-k) — with n_hits and recall = n_hits / k.
  */
object RecallAudit {

  def annRecallReport(vectors: DataFrame, step: Int, m: Int,
                      queryIds: Seq[Long], nprobe: Int, k: Int): DataFrame = {
    val queries = Knn.queryPanel(vectors, queryIds)
    val joined = vectors.crossJoin(broadcast(queries))
    val truthDot = GroupedTopK.topK(
      joined.select(col("query_id"), col("vec_id"),
        round(dot(col("embedding"), col("qv")), 6).as("s")),
      Seq(col("query_id")), Seq(col("s").desc, col("vec_id").asc), k)
      .select("query_id", "vec_id")
    val truthL2 = GroupedTopK.topK(
      joined.select(col("query_id"), col("vec_id"),
        round(l2Sq(col("embedding"), col("qv")), 6).as("d")),
      Seq(col("query_id")), Seq(col("d").asc, col("vec_id").asc), k)
      .select("query_id", "vec_id")

    val cents = Ivf.centroids(vectors, step)
    val cbs = Pq.codebooks(vectors, step, m)
    val ivfRes = Ivf.searchBatch(Ivf.inlinePostings(vectors, cents), cents,
      queries, nprobe, k).select("query_id", "vec_id")
    val adcRes = Pq.searchAdcBatch(Pq.encode(vectors, cbs), cbs, queries, k)
      .select("query_id", "vec_id")
    val ivfpqRes = Pq.searchAdcCellsBatch(Pq.encodeWithCell(vectors, cents, cbs),
      cents, cbs, queries, nprobe, k).select("query_id", "vec_id")

    // hits = |method ∩ truth| per query; the left join keeps a query
    // whose method leg missed EVERYTHING visible as recall 0, not absent
    def leg(method: String, res: DataFrame, truth: DataFrame): DataFrame = {
      val hits = res.join(truth, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      queries.select("query_id")
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), lit(method).as("method"),
          coalesce(col("n"), lit(0L)).as("n_hits"),
          round(coalesce(col("n"), lit(0L)).cast("double") / k, 6).as("recall"))
    }
    leg("ivf", ivfRes, truthDot)
      .unionByName(leg("pq_adc", adcRes, truthL2))
      .unionByName(leg("ivfpq", ivfpqRes, truthL2))
      .orderBy("query_id", "method")
  }

  /** The GRAPH family's recall audit (q145, r14) — [[annRecallReport]]'s
    * fourth serving path, reported under its own key because the q62
    * report is oracle-hashed and a beam walk is not SQL-expressible:
    * [[Nsw.searchBatch]] against exact-DOT truth (the walk minimizes
    * negated dot — Nsw.dist — so dot top-k is its exact target, the
    * same truth as the `ivf` leg), same per-(query, method) schema so
    * operators can union the families into one dashboard. The graph
    * build runs inside the audit (per-index-build cadence, like the
    * IVF legs rebuilding their postings); production audits pass over
    * a [[Nsw.load]]-ed graph via [[nswRecallFor]]. */
  def nswRecallReport(vectors: DataFrame, step: Int, queryIds: Seq[Long],
                      nprobe: Int, k: Int, m: Int = 8, efC: Int = 32,
                      ef: Int = 64): DataFrame = {
    val cents = Ivf.centroids(vectors, step)
    nswRecallFor(vectors, Nsw.build(vectors, step, m, efC), cents,
      queryIds, nprobe, k, ef)
  }

  /** Audit an EXISTING graph (the serve-side entry point). `method`
    * labels the rows ("nsw" plain; "nsw_spill" for a
    * [[Nsw.buildSpilled]] boundary-replicated graph) so variants union
    * into one dashboard. */
  def nswRecallFor(vectors: DataFrame, graph: DataFrame, cents: DataFrame,
                   queryIds: Seq[Long], nprobe: Int, k: Int,
                   ef: Int = 64, method: String = "nsw"): DataFrame = {
    val queries = Knn.queryPanel(vectors, queryIds)
    val truthDot = GroupedTopK.topK(
      vectors.crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          round(dot(col("embedding"), col("qv")), 6).as("s")),
      Seq(col("query_id")), Seq(col("s").desc, col("vec_id").asc), k)
      .select("query_id", "vec_id")
    val res = Nsw.searchBatch(graph, cents, queries, nprobe, k, ef)
      .select("query_id", "vec_id")
    val hits = res.join(truthDot, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n"))
    queries.select("query_id")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(method).as("method"),
        coalesce(col("n"), lit(0L)).as("n_hits"),
        round(coalesce(col("n"), lit(0L)).cast("double") / k, 6).as("recall"))
      .orderBy("query_id", "method")
  }

  /** The kNN-GRAPH stage's recall audit — the q62 discipline applied
    * to the q218 candidate seam: how much of the exact directed
    * cosine-kNN edge set does a bounded candidate generator
    * ([[Dedup.lshCandidatesMultiProbe]], [[Ivf.cellCandidatePairs]])
    * recover? Truth is exact top-k over ALL vectors for a SAMPLED
    * source set (`vec_id % sampleMod == 0` — deterministic, any sf);
    * the audited leg is the SAME [[Clusters.candidateScores]] →
    * [[Clusters.directedKnn]] pipeline the communities operator runs,
    * restricted to the sampled sources after the fact, so the audit
    * measures the exact code path. One summary row per call:
    * (method, k, n_sources, n_truth_edges, n_hits, recall_micro) —
    * integer micro so the number is engine-exact.
    *
    * Scale shape: truth is a sample-bounded broadcast crossJoin
    * (n × n/sampleMod scored rows through GroupedTopK heaps); the
    * candidate leg inherits its generator's quasi-linear bound. */
  def knnGraphRecall(vectors: DataFrame, candidates: DataFrame,
                     sampleMod: Long, k: Int, method: String,
                     dim: Int = 64): DataFrame = {
    // audit over the in-dimension universe both generators operate on —
    // off-dim/null rows belong to no bucket and no cell, and counting
    // them as missed truth would deflate every method identically
    val base = vectors.select(col("vec_id"), col("embedding"))
      .where(size(col("embedding")) === dim)
    val sample = base
      .where(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id").as("a"), col("embedding").as("ea"))
    val truth = GroupedTopK.topK(
      base.crossJoin(broadcast(sample))
        .where(col("vec_id") =!= col("a"))
        .select(col("a"), col("vec_id").as("b"),
          round(cosine(col("ea"), col("embedding")), 6).as("sim")),
      Seq(col("a")), Seq(col("sim").desc, col("b").asc), k)
      .select("a", "b")
    val candKnn = Clusters.directedKnn(
        Clusters.candidateScores(base, candidates), k)
      .where(pmod(col("a"), lit(sampleMod)) === 0)
    truth
      .join(candKnn.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
      .agg(lit(method).as("method"), lit(k).as("k"),
        countDistinct(col("a")).as("n_sources"),
        count(lit(1)).as("n_truth_edges"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"),
        // integer floor-division (`div`), not `/` — the double quotient
        // would make the audit row JVM-rounding-dependent
        expr("coalesce(sum(hit), 0L) * 1000000 div count(1)")
          .as("recall_micro"))
  }

  /** ONE serving-audit dashboard (q152, r15): every serving family's
    * recall rows (the q62 exact/ivf/pq/ivfpq legs + the q145 graph
    * legs, plain AND boundary-spilled) full-outer-joined with the rank
    * metrics (q136 exact + q146 nsw) on (query_id, method) — the union
    * the per-family audits were schema-aligned for since r14. A method
    * audited only for recall carries null rank columns and vice versa;
    * per-family rows are BY CONSTRUCTION the standalone audits'
    * (RecallAuditSpec pins the equality), so one frame answers "which
    * serving path is losing quality, and how" without re-deriving
    * anything. */
  def servingAudit(vectors: DataFrame, step: Int, m: Int,
                   queryIds: Seq[Long], nprobe: Int, k: Int,
                   ef: Int = 64): DataFrame = {
    val cents = Ivf.centroids(vectors, step)
    // The plain graph feeds BOTH its recall leg and its rank leg —
    // build once, materialize (index-sized, the build-cadence cost the
    // audit already pays once per family).
    val plainGraph = Nsw.build(vectors, step).localCheckpoint(true)
    val recall = annRecallReport(vectors, step, m, queryIds, nprobe, k)
      .unionByName(nswRecallFor(vectors, plainGraph, cents, queryIds, nprobe, k, ef))
      .unionByName(nswRecallFor(vectors,
        Nsw.buildSpilled(vectors, cents, Nsw.spillEps(vectors, cents)),
        cents, queryIds, nprobe, k, ef, method = "nsw_spill"))
    val queries = Knn.labeledPanel(vectors, queryIds)
    val nswRes = Nsw.searchBatch(plainGraph, cents,
      Knn.queryPanel(vectors, queryIds), nprobe, k, ef)
    val rank = rankMetricsReport(vectors, queryIds, k)
      .withColumn("method", lit("exact"))
      .unionByName(rankMetricsOf(vectors, queries, nswRes, k)
        .withColumn("method", lit("nsw")))
    recall.join(rank, Seq("query_id", "method"), "full_outer")
      .orderBy("query_id", "method")
  }

  /** The re-tuning rule the q62 audit calls for (r10): pick nprobe by
    * MEASURED recall, not folklore. Doubles nprobe from `start` until
    * the real [[Ivf.searchBatch]] serving plan's mean recall@k over a
    * sampled query panel reaches `target`, capping at the cell count
    * (where probed search IS exact search and recall is 1 by the
    * full-probe degeneracy this suite pins). The answer to the sf1
    * finding that motivated this: a fixed nprobe=4 carried from an
    * 80-cell index to an 800-cell re-train probed 10× less corpus mass
    * and recall@20 fell to 0.05-0.55 — re-tuning against the audit
    * restores the target at a probe budget the DATA sets.
    *
    * Scale contract: geometric stepping = O(log C) audit rounds; each
    * round is one q-bounded batched search plus a q·k-row collect (the
    * [[graft.operators.Pq.distTables]] bounded-collect class — tens of
    * queries × k ids, never corpus-scale). The exact-truth leg runs
    * ONCE and is reused across rounds. Re-run per re-train/re-build —
    * this is an offline index-maintenance step beside [[Ivf.cellBalance]],
    * not per-query work; between re-tunes [[Ivf.autoNProbe]]'s √-rule
    * is the zero-measurement default. */
  def tuneNProbe(vectors: DataFrame, step: Int, queryIds: Seq[Long],
                 k: Int, target: Double, start: Int = 1): Int = {
    require(target > 0 && target <= 1, s"target must be in (0, 1], got $target")
    val queries = Knn.queryPanel(vectors, queryIds)
    val truth = GroupedTopK.topK(
      vectors.crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          round(dot(col("embedding"), col("qv")), 6).as("s")),
      Seq(col("query_id")), Seq(col("s").desc, col("vec_id").asc), k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Ivf.centroids(vectors, step)
    val postings = Ivf.inlinePostings(vectors, cents)
    val cells = math.max(1L, cents.count())
    var np = math.min(math.max(1, start).toLong, cells).toInt
    while (true) {
      val got = Ivf.searchBatch(postings, cents, queries, np, k)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
      if (recall >= target || np >= cells) return np
      np = math.min(np.toLong * 2, cells).toInt
    }
    np // unreachable
  }

  /** Graded ranking metrics — the serving-eval face beyond recall@k
    * (q62 answers "did the right ids come back"; MRR and nDCG answer
    * "in the right ORDER"): per panel query, exact top-k under
    * label-match relevance (a labeled corpus's standard qrels; the
    * query's own row is relevant to itself and ranks first by
    * construction — documented, and the spec pins the no-self case).
    * MRR = 1/first-relevant-rank; nDCG = DCG/IDCG with IDCG from the
    * CORPUS-side relevant count capped at k (a query whose label has
    * only 3 corpus members can't be punished for k=20).
    *
    * Exactness discipline (SURVEY §6): each rank's discount
    * 1/ln(rank+1) rounds to integer MICRO-UNITS before summation, so
    * DCG and IDCG are exact 64-bit sums (a double Σ of 20 discounts
    * would be partial-agg-order-dependent); nDCG is one shared-IEEE
    * division of two longs, rounded 6 dp; MRR is a pure integer
    * division. Base-invariance makes ln correct here: nDCG is a ratio,
    * so the conventional log₂ cancels — and ln is the one log both
    * engines compute bit-identically (the q34 precedent).
    *
    * Plan shape: the q67 one-scan batched serve + per-query rank
    * windows over ≤ k·|panel| rows; label sizes are a broadcast
    * O(labels) aggregate; IDCG unrolls a ≤ k-element `sequence` per
    * query — panel-bounded driver-free arithmetic. */
  def rankMetricsReport(vectors: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = Knn.labeledPanel(vectors, queryIds)
    val scored = vectors.crossJoin(broadcast(queries))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        round(dot(col("embedding"), col("qv")), 6).as("score"))
    val top = GroupedTopK.topK(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("vec_id").asc), k)
    rankMetricsOf(vectors, queries, top.select("query_id", "vec_id", "score"), k)
  }

  /** Rank metrics for ANY serving result set (q146's NSW leg, r14) —
    * the generalized scorer behind [[rankMetricsReport]]: `results`
    * carries (query_id, vec_id, score) from whatever serving plan is
    * under audit (exact, IVF, PQ, NSW…); relevance labels join in from
    * the corpus and the panel, and the identical micro-unit DCG/IDCG
    * arithmetic applies — so an approximate path's ORDERING quality is
    * directly comparable with the exact path's numbers. */
  def rankMetricsOf(vectors: DataFrame, queries: DataFrame,
                    results: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = results
      .join(vectors.select(col("vec_id"), col("label")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qlabel"))), "query_id")
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        col("score"))
    val ranked = top
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id").asc)))
      .withColumn("rel", (col("label") === col("qlabel")).cast("int"))
      .withColumn("gain_micro",
        when(col("rel") === 1,
          round(lit(1000000.0) / log(col("rank") + lit(1.0))).cast("long"))
          .otherwise(0L))
    val perQuery = ranked.groupBy("query_id", "qlabel").agg(
      sum("rel").cast("long").as("n_rel_at_k"),
      min(when(col("rel") === 1, col("rank"))).cast("long").as("first_rel_rank"),
      sum("gain_micro").as("dcg_micro"))
    val labelSizes = vectors.groupBy(col("label").as("qlabel"))
      .agg(count(lit(1)).as("n_rel_corpus"))
    perQuery.join(broadcast(labelSizes), "qlabel")
      .withColumn("idcg_micro",
        aggregate(sequence(lit(1L), least(lit(k.toLong), col("n_rel_corpus"))),
          lit(0L),
          (acc, i) => acc +
            round(lit(1000000.0) / log(i.cast("double") + lit(1.0))).cast("long")))
      .select(
        col("query_id"), col("n_rel_at_k"), col("first_rel_rank"),
        when(col("first_rel_rank").isNull, 0L)
          .otherwise(expr("1000000 div first_rel_rank")).as("mrr_micro"),
        col("dcg_micro"), col("idcg_micro"),
        round(col("dcg_micro").cast("double") / col("idcg_micro").cast("double"), 6)
          .as("ndcg"))
      .orderBy("query_id")
  }
}
