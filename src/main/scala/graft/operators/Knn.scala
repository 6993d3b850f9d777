package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Exact K-nearest-neighbor search over an embedding column.
  *
  * Re-expresses the reference's KNN search (reference Program.cs:207-227:
  * `graph.KNNSearch(searchVector, 20)` + order by distance, take 20) as a
  * declarative plan: score every vector against a 1-row broadcast query
  * vector, then `ORDER BY score LIMIT k`.
  *
  * Scale shape: Catalyst compiles the top-k into `TakeOrderedAndProject`
  * — a per-partition bounded heap of k rows followed by a driver merge of
  * P*k rows. No global sort, no collect of the scored table; at 100 TB the
  * scan streams through codegen'd score evaluation and only k rows per
  * partition survive. The query vector joins via a 1-row broadcast
  * (BroadcastNestedLoopJoin degenerate case), never a shuffle.
  *
  * Scores are ordered AND emitted rounded to 6 dp with a vec_id tiebreak,
  * so double-precision summation noise between engines cannot flip the
  * result hash (see SURVEY.md §6).
  */
object Knn {

  /** The scored table: every row of `vectors` against the single row of
    * `query` (columns `qv` = query embedding). */
  private def scored(vectors: DataFrame, query: DataFrame, score: (Column, Column) => Column): DataFrame =
    vectors.crossJoin(broadcast(query))
      .withColumn("score", round(score(col("embedding"), col("qv")), 6))

  /** Exact top-k by dot product (the reference's distance metric,
    * Program.cs:207: DotProductOptimized). Higher = closer. */
  def topKDot(vectors: DataFrame, query: DataFrame, k: Int): DataFrame =
    scored(vectors, query, dot)
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)

  /** Exact top-k by cosine similarity. */
  def topKCosine(vectors: DataFrame, query: DataFrame, k: Int): DataFrame =
    scored(vectors, query, cosine)
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)

  /** Filtered exact search: top-k among rows satisfying a metadata
    * predicate — the "WHERE label = X" face of vector search every
    * serving stack needs next to the unfiltered path. Expressed as
    * filter-below-scorer, which is the PRE-filter strategy: Catalyst
    * pushes the predicate into the parquet scan (`PushedFilters`), so
    * non-matching rows never reach the distance kernel and, with
    * row-group statistics, often never leave the disk. Exact search
    * composes with any predicate at full recall — unlike the probed
    * variant ([[Ivf.searchInlineFiltered]]) there is no
    * selectivity/recall trade to manage. */
  def topKDotFiltered(vectors: DataFrame, pred: Column, query: DataFrame, k: Int): DataFrame =
    topKDot(vectors.where(pred), query, k)

  /** Matryoshka-style two-stage search (Kusupati et al. 2022,
    * "Matryoshka Representation Learning"): rank by the dot product of
    * the first `prefixDim` components only, keep a `shortlist`, re-rank
    * just those rows at full dimension. With MRL-trained embeddings the
    * prefix carries most of the signal, so stage 1 reads dim/prefixDim×
    * less float data per row — at 100 TB that is the difference between
    * scanning 100 TB and scanning 25 TB, with stage 2 touching only
    * `shortlist` rows via a broadcast join. (The synthetic test
    * embeddings are not MRL-trained, so the prefix here is just a
    * projection — the recall the spec pins is the untrained floor; the
    * PLAN is the deliverable.) Stage 1's slice-then-dot stays inside
    * whole-stage codegen (slice is native, [[DotProduct]] is
    * codegen'd); both stages end in `TakeOrderedAndProject`. In a real
    * deployment the prefix lives as its OWN parquet column so column
    * pruning makes stage 1's scan physically narrow; the slice
    * formulation keeps the oracle on the same table. */
  def topKPrefixRerank(vectors: DataFrame, query: DataFrame, prefixDim: Int,
                       shortlist: Int, k: Int): DataFrame = {
    val cand = vectors.crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(dot(slice(col("embedding"), 1, prefixDim),
          slice(col("qv"), 1, prefixDim)), 6).as("pscore"))
      .orderBy(desc("pscore"), asc("vec_id"))
      .limit(shortlist)
      .select("vec_id")
    vectors.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(dot(col("embedding"), col("qv")), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** Batched exact top-k: a whole (query_id, qv) table answered in ONE
    * plan — the offline-inference twin of [[topKDot]] and the exact
    * counterpart of [[Ivf.searchBatch]]. A driver loop of single-query
    * plans would pay one scan of the corpus PER query; this pays one
    * scan total: queries broadcast into the scan, per-(query, row)
    * scores flow through [[graft.plans.GroupedTopK]]'s bounded heaps
    * (≤ k rows per query per partition cross the exchange — no sort,
    * no rank column). Scales to thousands of queries per pass; beyond
    * what fits a broadcast, chunk the query table and union. */
  def topKDotBatch(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import graft.plans.GroupedTopK
    val scored = vectors.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("embedding"), col("qv")), 6).as("score"))
    GroupedTopK.topK(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("vec_id").asc), k)
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
  }

  /** (query_id, qv) panel from corpus ids — the batched-search input
    * shape ([[topKDotBatch]], [[Ivf.searchBatch]], [[Pq.searchAdcBatch]]). */
  def queryPanel(vectors: DataFrame, ids: Seq[Long]): DataFrame =
    vectors.where(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** MMR-diversified top-k (Carbonell & Goldstein 1998): re-rank an
    * exact shortlist so results are relevant to the query but not
    * near-duplicates of each other — the serving-side answer to a
    * corpus whose top-k is ten copies of the same document. Greedy
    * selection maximizes λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s).
    *
    * Two-phase by construction: the DISTRIBUTED phase is the exact
    * top-`shortlist` scan (all the heavy work — one corpus pass); the
    * greedy phase is inherently sequential (each pick depends on all
    * previous picks), so it runs driver-side over the COLLECTED
    * shortlist — a contractually bounded collect of `shortlist` rows
    * (~100 × dim floats, kB-scale: the same bound class as
    * [[Pq.distTables]]). λ and all similarities round to 6 dp with
    * vec_id tie-breaks, so selection is deterministic. Non-positive
    * `lambda` would ignore relevance entirely; the conventional range
    * is [0.5, 0.9]. */
  def topKDotMmr(vectors: DataFrame, query: DataFrame, shortlist: Int,
                 k: Int, lambda: Double): DataFrame = {
    import graft.functions.VecUtil.round6
    val spark = vectors.sparkSession
    val cand = vectors.crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qv")), 6).as("qsim"),
        col("embedding").cast("array<double>").as("emb"))
      .orderBy(desc("qsim"), asc("vec_id"))
      .limit(shortlist)
      .collect()
      .map { r =>
        // normalize once on collect: greedy-side dot of unit vectors IS
        // cosine — MMR's two similarity terms must share a scale, and
        // unnormalized dots let one long vector's redundancy term
        // swamp (or never reach) the relevance term
        val e = r.getSeq[Double](2).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        (r.getLong(0), r.getDouble(1), if (n == 0) e else e.map(_ / n))
      }
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double], Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, qsim, emb) =>
        val maxSel =
          if (selected.isEmpty) 0.0
          else selected.map(s => round6(dotD(emb, s._3))).max
        (id, qsim, emb, round6(lambda * qsim - (1 - lambda) * maxSel))
      }
      val best = scored.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected += best
      remaining.remove(remaining.indexWhere(_._1 == best._1))
    }
    import spark.implicits._
    selected.toSeq.map { case (id, qsim, _, mmr) => (id, qsim, mmr) }
      .toDF("vec_id", "qsim", "mmr_score")
  }

  /** 1-row query-vector frame: the embedding of `vecId` (the reference
    * searches with `sampleVectors[0]`, Program.cs:210). */
  def queryVector(vectors: DataFrame, vecId: Long): DataFrame =
    vectors.filter(col("vec_id") === vecId).select(col("embedding").as("qv"))

  /** Late-interaction (ColBERT-style) MaxSim retrieval: documents are
    * SETS of token vectors, and a document's score against a query
    * token set is Σ_q max_d ⟨q, d⟩ — each query token finds its best
    * match in the doc, matches sum. This is the retrieval model
    * multi-vector encoders serve; the single-vector [[topKDot]] is its
    * k=1 degenerate case.
    *
    * The corpus carries one vector per row, so documents are the
    * contiguous-id groups `vec_id div tokensPerDoc` (the q119
    * convention for deriving structure from the synthetic corpus); the
    * query is doc `queryDocId`'s own token set. Plan shape is the
    * SERVING shape at any scale: the query's ≤ tokensPerDoc vectors
    * broadcast into the corpus scan (never a shuffle of the big side),
    * dots run in the codegen'd [[graft.functions.VectorFunctions.dot]]
    * kernel, and the two aggregations — max per (doc, query-token),
    * sum per doc — partial-aggregate map-side first, so their
    * exchanges carry docs×qtokens and docs rows respectively, never
    * corpus-sized traffic. Scores move
    * through integer micro-units after a 6-dp round (SURVEY §6: max
    * and sum stay exact 64-bit, no cross-engine float-sum drift). */
  def maxSim(vectors: DataFrame, tokensPerDoc: Int, queryDocId: Long,
             topN: Int): DataFrame = {
    val docd = vectors.select(
      expr(s"vec_id DIV $tokensPerDoc").as("mdoc_id"),
      col("embedding"))
    val qTokens = vectors
      .where(expr(s"vec_id DIV $tokensPerDoc") === queryDocId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    docd.crossJoin(broadcast(qTokens))
      .select(col("mdoc_id"), col("q_id"),
        round(round(dot(col("embedding"), col("qv")), 6) * 1e6).cast("long")
          .as("dot_micro"))
      .groupBy("mdoc_id", "q_id").agg(max("dot_micro").as("best_micro"))
      .groupBy("mdoc_id")
      .agg(sum("best_micro").as("maxsim_micro"), count(lit(1)).as("n_qtokens"))
      .orderBy(desc("maxsim_micro"), asc("mdoc_id"))
      .limit(topN)
  }

  /** Batched [[maxSim]] — a PANEL of query documents answered in one
    * plan, the serving-batch parity every index family carries
    * ([[Ivf.searchBatch]], [[Bq.searchBatch]], [[Nsw.searchBatch]]).
    * All panel token sets ride ONE broadcast into ONE corpus scan (the
    * corpus is read once regardless of panel size), `q_doc` joins the
    * aggregation keys, and the per-query top-n is a [[graft.plans.GroupedTopK]]
    * heap — no global sort at any panel size. Bit-equal per query to
    * the [[maxSim]] loop (MaxSimSpec). */
  def maxSimBatch(vectors: DataFrame, tokensPerDoc: Int,
                  queryDocIds: Seq[Long], topN: Int): DataFrame = {
    val docd = vectors.select(
      expr(s"vec_id DIV $tokensPerDoc").as("mdoc_id"),
      col("embedding"))
    val qTokens = vectors
      .where(expr(s"vec_id DIV $tokensPerDoc").isin(queryDocIds: _*))
      .select(expr(s"vec_id DIV $tokensPerDoc").as("q_doc"),
        col("vec_id").as("q_id"), col("embedding").as("qv"))
    val scored = docd.crossJoin(broadcast(qTokens))
      .select(col("q_doc"), col("mdoc_id"), col("q_id"),
        round(round(dot(col("embedding"), col("qv")), 6) * 1e6).cast("long")
          .as("dot_micro"))
      .groupBy("q_doc", "mdoc_id", "q_id").agg(max("dot_micro").as("best_micro"))
      .groupBy("q_doc", "mdoc_id")
      .agg(sum("best_micro").as("maxsim_micro"), count(lit(1)).as("n_qtokens"))
    graft.plans.GroupedTopK.topK(scored, Seq(col("q_doc")),
        Seq(col("maxsim_micro").desc, col("mdoc_id").asc), topN)
      .orderBy(col("q_doc"), desc("maxsim_micro"), asc("mdoc_id"))
  }

  /** IVF-routed late-interaction serve (q228) — the PLAID idea
    * (Santhanam et al. 2022) distilled onto the [[Ivf]] machinery:
    * [[maxSim]]'s full-corpus token scan is the EXACT twin, and at
    * 100 TB the serving path must not score every doc per query.
    * Route: each query token probes its `nprobe` nearest cells of the
    * token-vector index (broadcast centroids, GroupedTopK heap); any
    * document with ≥1 token resident in a probed cell becomes a
    * candidate; exact MaxSim (the SAME micro-unit scorer) then runs
    * over candidate docs' FULL token sets only.
    *
    * Scale shape: token→cell assignment is the q09 zero-shuffle
    * broadcast argmin riding the corpus scan; the candidate cut is one
    * semi-join on mdoc_id; the scoring crossJoin shrinks from
    * |corpus| × |qtokens| to |candidate tokens| × |qtokens| — the
    * probe dial trades recall for exactly that factor. A query doc is
    * ALWAYS its own candidate (each query token's rank-1 probe is its
    * own assigned cell), so self-retrieval recall is structural. */
  def maxSimIvf(vectors: DataFrame, tokensPerDoc: Int, queryDocId: Long,
                topN: Int, step: Int, nprobe: Int): DataFrame = {
    import graft.plans.GroupedTopK
    val cents = Ivf.centroids(vectors, step)
    val posted = Ivf.inlinePostings(vectors, cents)
      .select(expr(s"vec_id DIV $tokensPerDoc").as("mdoc_id"),
        col("centroid_id"), col("embedding"))
    val qTokens = vectors
      .where(expr(s"vec_id DIV $tokensPerDoc") === queryDocId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val qc = qTokens.crossJoin(broadcast(cents))
      .where(Pq.cleanCentroid(col("c_emb"), size(col("qv"))))
      .select(col("q_id"), col("centroid_id"),
        round(l2Sq(col("c_emb"), col("qv")), 6).as("cdist"))
    val probed = GroupedTopK.topK(qc, Seq(col("q_id")),
        Seq(col("cdist").asc, col("centroid_id").asc), nprobe)
      .select("centroid_id").distinct()
    val candDocs = posted.join(broadcast(probed), "centroid_id")
      .select("mdoc_id").distinct()
    posted.join(candDocs, Seq("mdoc_id"), "left_semi")
      .crossJoin(broadcast(qTokens))
      .select(col("mdoc_id"), col("q_id"),
        round(round(dot(col("embedding"), col("qv")), 6) * 1e6).cast("long")
          .as("dot_micro"))
      .groupBy("mdoc_id", "q_id").agg(max("dot_micro").as("best_micro"))
      .groupBy("mdoc_id")
      .agg(sum("best_micro").as("maxsim_micro"), count(lit(1)).as("n_qtokens"))
      .orderBy(desc("maxsim_micro"), asc("mdoc_id"))
      .limit(topN)
  }

  /** (query_id, qv, qlabel) panel from corpus ids — the labeled input
    * shape [[hardNegatives]] mines against. */
  def labeledPanel(vectors: DataFrame, ids: Seq[Long]): DataFrame =
    vectors.where(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))

  /** Hard-negative mining for contrastive embedding training (the
    * DPR/SBERT recipe): per training query, the top-k HIGHEST-cosine
    * corpus vectors carrying a DIFFERENT label, capped below a
    * near-duplicate ceiling. The top of the score range that is not a
    * positive is precisely what a contrastive loss wants as negatives
    * — random negatives are trivially separable and teach nothing.
    * The ceiling guards the known failure mode: cosine ≈ 1 under a
    * different label is almost always a labeling error or an unmarked
    * duplicate, and training against it teaches the model to separate
    * identical texts (false negatives poison the loss). The query's
    * own row is excluded for free — it shares the query's label.
    *
    * Scale shape: the labeled query panel BROADCASTS into ONE corpus
    * scan regardless of panel size (the corpus never shuffles for the
    * join — the [[topKDotBatch]]/[[maxSimBatch]] serving shape); the
    * label-mismatch predicate and the ceiling both evaluate inside
    * whole-stage codegen on the rounded score BEFORE any exchange, so
    * only surviving candidates reach [[graft.plans.GroupedTopK]]'s
    * bounded per-query heaps (≤ k rows per query per partition cross
    * the exchange — no sort, no rank column). Scores round to 6 dp
    * with vec_id tie-breaks (SURVEY §6), and the ceiling compares the
    * ROUNDED score on both engines, so the boundary cannot flip on
    * float noise. */
  def hardNegatives(vectors: DataFrame, queries: DataFrame, k: Int,
                    dupCeiling: Double): DataFrame = {
    import graft.plans.GroupedTopK
    val scored = vectors.crossJoin(broadcast(queries))
      .where(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("qv")), 6).as("score"))
      .where(col("score") < dupCeiling)
    GroupedTopK.topK(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("vec_id").asc), k)
      .orderBy(col("query_id"), col("score").desc, col("vec_id"))
  }
}
