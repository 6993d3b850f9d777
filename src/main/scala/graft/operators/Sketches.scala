package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ThetaSketch._

/** Sketch-backed set algebra over segment audiences (q194) — the
  * rollup-table pattern [[graft.functions.Bitmap]] serves, re-based on
  * theta sketches so it survives id spaces where bitmaps don't: the
  * per-segment state is O(k) bytes REGARDLESS of audience size, and —
  * unlike the q140b HLL twin — it intersects and differences, not just
  * unions.
  *
  * Shape: one hash exchange builds a sketch per segment (map-side
  * partials — each task ships one k-value sketch per segment, never
  * ids); the pair report is a self-join of the SEGMENT frame (rows =
  * #segments, broadcast-sized by construction) with all set operations
  * as codegen'd scalar expressions over the serialized bytes. At 100 TB
  * the only full-data pass is the sketch build; every audience-overlap
  * question after that is metadata.
  *
  * Exactness contract: sketches are exact below k distinct (the gate
  * corpus sits there, so the DuckDB oracle states the EXACT distinct
  * algebra); above k the estimates carry ~1/√(k−2) relative error. */
object Sketches {

  /** q194: customer-audience algebra across order-priority segments —
    * for every segment pair: per-side audience, union, intersection,
    * and one-sided difference, all off the per-segment sketches. */
  def audienceAlgebra(orders: DataFrame, k: Int): DataFrame = {
    val sk = orders
      .select(
        col("o_orderpriority").as("segment"),
        xxhash64(col("o_custkey")).as("h"))
      .groupBy("segment")
      .agg(thetaSketch(col("h"), k).as("sk"))

    val a = sk.select(col("segment").as("seg_a"), col("sk").as("sk_a"))
    val b = sk.select(col("segment").as("seg_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(
        col("seg_a"), col("seg_b"),
        thetaEstimate(col("sk_a")).as("n_a"),
        thetaEstimate(col("sk_b")).as("n_b"),
        thetaUnionCard(col("sk_a"), col("sk_b")).as("n_union"),
        thetaIntersectCard(col("sk_a"), col("sk_b")).as("n_intersect"),
        thetaDiffCard(col("sk_a"), col("sk_b")).as("n_diff_a"))
      .orderBy("seg_a", "seg_b")
  }

  /** q213: Count-Min term-frequency panel with built-in accuracy audit
    * (the q60/q62 discipline applied to the frequency sketch): build
    * ONE d×w CMS over every token of the corpus — a single-row
    * aggregate whose partials are fixed-size grids, zero token-grain
    * exchange — then grade its point queries against the exact counts
    * of the top-`panelK` terms. Output per panel term: exact count,
    * CMS estimate, and the overestimate (≥ 0 by the sketch's one-sided
    * error guarantee — a negative value anywhere is a bug, which the
    * oracle would catch).
    *
    * The exact side exists only to GRADE the sketch (it is the audit's
    * truth, like q60's block-bounded exact pairs); the serving path a
    * 100 TB user runs is the sketch build alone. Both engines compute
    * bit-identical grids because the d row hashes are carved from one
    * md5 (see [[graft.functions.CountMin]]). */
  def cmsTermPanel(docs: DataFrame, d: Int, w: Int, panelK: Int): DataFrame = {
    import graft.functions.CountMin._
    val toks = docs.select(
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
    val sketch = toks.agg(cmsSketch(col("term"), d, w).as("sk"))
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
    val panel = exact.orderBy(col("exact_cnt").desc, col("term").asc)
      .limit(panelK)
    panel.crossJoin(broadcast(sketch))
      .select(
        col("term"), col("exact_cnt"),
        cmsEstimate(col("sk"), col("term")).as("cms_cnt"))
      .withColumn("overest", col("cms_cnt") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term").asc)
  }

  /** q220: sketch-based JOIN-SIZE estimate — the Cormode-Muthukrishnan
    * inner-product estimator ([[graft.functions.CountMin.innerProductOf]])
    * asked the planner's question: how many rows would
    * `σ(lineitem) ⋈ σ(orders)` produce, WITHOUT executing the join?
    * Two filtered key streams fold into same-shape CMS grids (map-only
    * passes, fixed-size partials); est = min over rows of the
    * row-wise counter dot — an upper bound on Σ_k fA(k)·fB(k), the
    * exact equi-join cardinality. At 100 TB this is two cheap scans +
    * 2·d·w longs of state vs actually shuffling both sides; the
    * expected overestimate is ~n_a·n_b/w per row (collision mass is
    * additive and one-sided), so the answer is trustworthy exactly
    * when the join is selective — the regime where a planner needs it.
    *
    * The key output GRADES the estimate against the executed join
    * (the q213 audit discipline): n_a, n_b, est, exact, overest ≥ 0.
    * Keys hash as their decimal-string form so both engines' md5
    * windows agree (the q213 determinism contract). */
  def cmsJoinEstimate(lineitem: DataFrame, orders: DataFrame,
      d: Int, w: Int): DataFrame = {
    import graft.functions.CountMin._
    val a = lineitem.select(col("l_orderkey").cast("string").as("k"))
    val b = orders.select(col("o_orderkey").cast("string").as("k"))
    val skA = a.agg(count(lit(1)).as("n_a"), cmsSketch(col("k"), d, w).as("sk_a"))
    val skB = b.agg(count(lit(1)).as("n_b"), cmsSketch(col("k"), d, w).as("sk_b"))
    val exact = a.join(b, "k").agg(count(lit(1)).as("exact_join"))
    skA.crossJoin(broadcast(skB)).crossJoin(broadcast(exact))
      .select(col("n_a"), col("n_b"),
        cmsInnerProduct(col("sk_a"), col("sk_b")).as("est_join"),
        col("exact_join"))
      .withColumn("overest", col("est_join") - col("exact_join"))
  }
}
