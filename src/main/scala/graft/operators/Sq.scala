package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the third point on the
  * embedding-compression ladder next to raw floats (1×) and product
  * quantization ([[Pq]], 32×): each vector component quantizes
  * independently to one byte against per-dimension corpus [min, max]
  * ranges, giving 4× compression with near-exact recall (the standard
  * "SQ8" codec every ANN engine ships alongside PQ; the uniform-scalar
  * case of Jégou et al. 2011's quantization framework).
  *
  * Scale story: the range model is dim×2 doubles — one partial-agg
  * exchange of per-task (pos, min, max) states, O(dim) rows, then a
  * kB-scale broadcast back as literals. Encode is a narrow projection
  * of `dim` codegen'd arithmetic expressions (no HOF — interpreted
  * lambdas cost 10× here, the r2 lesson), zero shuffles at any corpus
  * size. Search reads the 4×-compressed codes table and reconstructs
  * against the query asymmetrically (codes never decode to a new
  * float column on disk); the only exchange is the final top-k merge
  * (`TakeOrderedAndProject`).
  *
  * Everything is oracle-checkable because both engines evaluate the
  * SAME IEEE-double expression tree: (x−mn)·255/(mx−mn) floored, and
  * reconstruction mn+(c+0.5)·(mx−mn)/255 — association order matches
  * the SQL mirror term by term.
  */
object Sq {

  /** Per-dimension [min, max] over the clean corpus, collected
    * driver-side (dim rows — the same contractually-bounded collect as
    * [[Ivf.collectCentroids]]). */
  def ranges(vectors: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val rows = vectors
      .where(Pq.cleanVec(col("embedding"), dim))
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .collect()
    require(rows.length == dim, s"expected $dim dimensions, got ${rows.length}")
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    rows.foreach { r =>
      mn(r.getInt(0)) = r.getDouble(1)
      mx(r.getInt(0)) = r.getDouble(2)
    }
    (mn, mx)
  }

  /** SQ8 encode: vec_id + a dim-length int array of byte codes,
    * `least(255, floor((x_i − mn_i)·255/(mx_i − mn_i)))` per component
    * (0 for degenerate zero-range dims). Codes land in [0, 255] by
    * construction — x_i ∈ [mn_i, mx_i] for the corpus the ranges were
    * fit on; `least` caps the x = mx edge. Dirty rows (null / off-dim /
    * null-element) are dropped by the same [[Pq.cleanVec]] raw-column
    * predicate as PQ encode. */
  def encode(vectors: DataFrame, mn: Array[Double], mx: Array[Double]): DataFrame = {
    val dim = mn.length
    val codes = array((0 until dim).map { i =>
      if (mx(i) == mn(i)) lit(0)
      else {
        val x = element_at(col("embedding").cast("array<double>"), i + 1)
        least(lit(255L),
          floor((x - lit(mn(i))) * lit(255.0) / lit(mx(i) - mn(i)))).cast("int")
      }
    }: _*)
    vectors.where(Pq.cleanVec(col("embedding"), dim))
      .select(col("vec_id"), codes.as("codes"))
  }

  /** Asymmetric SQ top-k: reconstruct each component at its bucket
    * midpoint mn_i + (c_i + 0.5)·(mx_i − mn_i)/255 and dot it with the
    * REAL query vector (queries never quantize — the asymmetric
    * distance computation, exactly like [[Pq.searchAdc]]). One narrow
    * codegen'd 64-term sum over the codes scan, then
    * `TakeOrderedAndProject`. `query` is a 1-row frame with column
    * `qv` ([[Knn.queryVector]]). */
  def search(encoded: DataFrame, mn: Array[Double], mx: Array[Double],
             query: DataFrame, k: Int): DataFrame = {
    val qv = Pq.collectQuery(query)
    val dim = mn.length
    require(qv.length == dim, s"query dim ${qv.length} != $dim")
    val score: Column = (0 until dim).map { i =>
      val rec: Column =
        if (mx(i) == mn(i)) lit(mn(i))
        else lit(mn(i)) +
          (element_at(col("codes"), i + 1).cast("double") + lit(0.5)) *
            lit(mx(i) - mn(i)) / lit(255.0)
      rec * lit(qv(i))
    }.reduce(_ + _)
    encoded
      .select(col("vec_id"), round(score, 6).as("score"))
      .orderBy(desc("score"), asc("vec_id"))
      .limit(k)
  }

  /** Encode + search without persist (the oracle-checked composition). */
  def searchInline(vectors: DataFrame, dim: Int, query: DataFrame, k: Int): DataFrame = {
    val (mn, mx) = ranges(vectors, dim)
    search(encode(vectors, mn, mx), mn, mx, query, k)
  }
}
