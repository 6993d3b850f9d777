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

  /** 1-row query-vector frame: the embedding of `vecId` (the reference
    * searches with `sampleVectors[0]`, Program.cs:210). */
  def queryVector(vectors: DataFrame, vecId: Long): DataFrame =
    vectors.filter(col("vec_id") === vecId).select(col("embedding").as("qv"))
}
