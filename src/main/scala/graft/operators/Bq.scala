package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Binary quantization (BQ) — the cheapest rung of the
  * embedding-compression ladder: one SIGN BIT per component, so the
  * 64-dim float corpus compresses 32× (256 B → 8 B per vector) and
  * similarity becomes Hamming distance over machine words. Every
  * production ANN stack ships this codec as its coarse pre-filter
  * (sign-random-projection LSH with the identity projection; Charikar
  * 2002 — for unit-ish vectors the Hamming distance between sign
  * patterns is a monotone estimate of angular distance), and the
  * reference's cosine-ranked search (reference Program.cs:207-227)
  * admits exactly this two-stage serve: Hamming shortlist over packed
  * words, exact re-rank on the shortlist.
  *
  * Spark-first shape: the sign bits of each half of the vector pack
  * into a long via 32 codegen'd `when` terms OR-folded per row — a
  * narrow projection, zero shuffles, identical cost at any corpus
  * size. Search scans ONLY the packed table: per row the distance is
  * two XORs + two POPCNTs against query-word literals
  * (`bit_count(code ^ lit)`), the tightest possible inner loop
  * whole-stage codegen can emit — no float math, no array access.
  * Top-k compiles to `TakeOrderedAndProject` (per-partition bounded
  * heaps, driver merge of P·k rows). At 100 TB the packed table is
  * ~3 TB and the Hamming scan is memory-bandwidth-bound, which is the
  * point of the codec.
  *
  * Both stages are oracle-checked: the bit pack is exact (x > 0 is the
  * same predicate in both engines — no float-accumulation noise), so
  * the DuckDB mirror computes the identical Hamming integer from the
  * UNPACKED sign vectors and must agree row for row.
  */
object Bq {

  /** OR-fold of `n` sign bits starting at 1-based component `lo` into
    * one long: bit i set ⇔ component lo+i > 0. Each term is a codegen'd
    * `when`; the fold is a flat sum of disjoint powers of two (no
    * carries possible), which Catalyst folds into one projection
    * expression. Halves stay ≤ 32 bits so no shift ever touches the
    * sign bit in either engine. */
  private def packHalf(v: Column, lo: Int, n: Int): Column = {
    require(n <= 62, s"half width $n would overflow a signed long")
    (0 until n).map { i =>
      when(element_at(v, lo + i) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** BQ encode: vec_id + the sign pattern packed into two longs
    * (`code_lo` = components 1..dim/2, `code_hi` = the rest). Dirty
    * rows (null / off-dim / null-element) are dropped by the same
    * raw-column [[Pq.cleanVec]] predicate as every other encoder —
    * they have no sign pattern. */
  def encode(vectors: DataFrame, dim: Int): DataFrame = {
    val h = dim / 2
    vectors.where(Pq.cleanVec(col("embedding"), dim))
      .select(col("vec_id"),
        packHalf(col("embedding"), 1, h).as("code_lo"),
        packHalf(col("embedding"), 1 + h, dim - h).as("code_hi"))
  }

  /** The query's packed sign words, driver-side (the per-query model is
    * two longs — the BQ analogue of [[Pq.distTables]]). */
  private def packQuery(q: Array[Double], dim: Int): (Long, Long) = {
    require(q.length == dim, s"query dim ${q.length} != $dim")
    val h = dim / 2
    def pack(lo: Int, n: Int): Long =
      (0 until n).foldLeft(0L)((acc, i) => if (q(lo + i) > 0) acc | (1L << i) else acc)
    (pack(0, h), pack(h, dim - h))
  }

  /** Hamming top-k over the packed table: distance =
    * popcount(lo ⊕ q_lo) + popcount(hi ⊕ q_hi), ascending, vec_id
    * tie-break (Hamming is a small integer — ties are the common case,
    * so the tie-break carries the determinism). `query` is the 1-row
    * (`qv`) frame ([[Knn.queryVector]]). */
  def search(encoded: DataFrame, query: DataFrame, dim: Int, k: Int): DataFrame = {
    val (qlo, qhi) = packQuery(Pq.collectQuery(query), dim)
    val ham = (bit_count(col("code_lo").bitwiseXOR(lit(qlo))) +
      bit_count(col("code_hi").bitwiseXOR(lit(qhi)))).cast("long")
    encoded.select(col("vec_id"), ham.as("hamming"))
      .orderBy(asc("hamming"), asc("vec_id"))
      .limit(k)
  }

  /** Batched Hamming search — the BQ member of the batched serving
    * family ([[Knn.topKDotBatch]], [[Ivf.searchBatch]],
    * [[Pq.searchAdcBatch]]): the (query_id, qv) panel is sign-packed
    * COLUMNAR-side by the same [[encode]] projection as the corpus (no
    * per-query driver work at all — the panel can be another table),
    * broadcast into the packed scan, and per-(query, row) distances
    * flow through [[graft.plans.GroupedTopK]]'s bounded heaps. Still
    * two XORs + two POPCNTs per scored pair; one corpus scan answers
    * the whole panel. */
  def searchBatch(encoded: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    import graft.plans.GroupedTopK
    val qenc = encode(
      queries.select(col("query_id").as("vec_id"), col("qv").as("embedding")), dim)
      .select(col("vec_id").as("query_id"),
        col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
    val scored = encoded.crossJoin(broadcast(qenc))
      .select(col("query_id"), col("vec_id"),
        (bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("code_hi").bitwiseXOR(col("q_hi")))).cast("long").as("hamming"))
    GroupedTopK.topK(scored, Seq(col("query_id")),
        Seq(col("hamming").asc, col("vec_id").asc), k)
      .orderBy(col("query_id"), col("hamming"), col("vec_id"))
  }

  /** Two-stage serve: Hamming shortlist of `shortlist` candidates over
    * the packed words, then exact-dot re-rank of ONLY those rows
    * against the real query vector — the standard BQ recall recovery
    * (the shortlist is the only float work, so the full-precision scan
    * cost scales with `shortlist`, not the corpus). The shortlist is
    * a k-row broadcast into the raw table's join, so stage 2 is a
    * broadcast-hash-join + `TakeOrderedAndProject`, never a shuffle. */
  def searchRerank(vectors: DataFrame, dim: Int, query: DataFrame,
                   shortlist: Int, k: Int): DataFrame = {
    val cand = search(encode(vectors, dim), query, dim, shortlist).select("vec_id")
    vectors.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(dot(col("embedding"), col("qv")), 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }
}
