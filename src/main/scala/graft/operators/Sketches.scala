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
}
