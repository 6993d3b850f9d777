package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max —
  * the "describe my lake table" operator every engine grows once data
  * outnumbers its documentation (the schema half of this is
  * [[Metadata]]'s footer walk; this is the VALUE half).
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's statistics together (map-side partial aggs; the shuffle
  * carries one partial-state row per task), then the single result row
  * unpivots into one output row per column — a driver-sized explode of
  * a 1-row frame, not a data operation. Exact multi-column distinct
  * counts make Catalyst plan an Expand (input rows × #profiled
  * columns before partial aggregation); that is the price of EXACT
  * profiling and is how SQL engines execute multi-distinct anyway. At
  * 100 TB one would flip `n_distinct` to `approx_count_distinct` (HLL,
  * no Expand) — kept exact here so the DuckDB oracle can verify
  * bit-for-bit.
  *
  * min/max are rendered through CAST(... AS STRING) so every column
  * type shares one output schema; profiled columns here are
  * integer/string (engine-identical rendering — float rendering
  * differs per engine and would need a decimal cast first).
  */
object Profile {

  /** Profile `cols` of `df`: one row per column with n_rows, n_nulls,
    * n_distinct (exact, null-excluded), min/max as strings. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            countDistinct(col(c)).as(s"__dist_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(rows).as("p"))
      .select("p.*")
      .orderBy("column")
  }
}
