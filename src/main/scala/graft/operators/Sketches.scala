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
}
