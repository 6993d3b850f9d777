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

  /** 1-row query-vector frame: the embedding of `vecId` (the reference
    * searches with `sampleVectors[0]`, Program.cs:210). */
  def queryVector(vectors: DataFrame, vecId: Long): DataFrame =
    vectors.filter(col("vec_id") === vecId).select(col("embedding").as("qv"))
}
