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

  /** Per-group EXACT discrete percentiles of an integer column (q56):
    * for percent q, the value at 1-based rank ((n-1)·q) div 100 + 1 of
    * the group's sorted non-null values — all-integer rank arithmetic,
    * so Spark and any SQL oracle agree bit-for-bit.
    *
    * Scale shape: NOT a per-group sort of the data. Pass 1 collapses to
    * a (group, value) histogram — map-side partial agg, the exchange
    * carries distinct (group, value) pairs, not rows. Pass 2 windows
    * over the distinct VALUES per group (cardinality = distinct values,
    * data-independent for bounded domains like lengths/scores) to get
    * each value's cumulative rank range [hi−c+1, hi], then one
    * partial-agg groupBy picks the value whose range covers each target
    * rank. 100 TB of docs with ~10⁴ distinct lengths windows over 10⁴
    * rows per source. For unbounded/continuous domains, flip to
    * [[percentilesApprox]] (t-digest-style sketch, no window at all).
    */
  def percentiles(df: DataFrame, groupCol: String, valCol: String,
                  qs: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100), s"bad percents: $qs")
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__hi", sum("__c").over(
        Window.partitionBy(groupCol).orderBy("__v")))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    val rank = (q: Int) => expr(s"((__n - 1) * $q) DIV 100 + 1")
    val qcols = qs.map { q =>
      max(when(col("__hi") - col("__c") < rank(q) && rank(q) <= col("__hi"),
        col("__v"))).as(s"p$q")
    }
    cum.groupBy(groupCol)
      .agg(max("__n").cast("long").as("n_values"), qcols: _*)
      .orderBy(groupCol)
  }

  /** Production twin of [[percentiles]] for unbounded domains:
    * `approx_percentile` is a mergeable sketch (partial-agg shaped, one
    * exchange of per-task sketches, no window, no histogram), trading
    * exactness for scale-independence. Spec-checked against the exact
    * operator within the sketch's accuracy contract. */
  def percentilesApprox(df: DataFrame, groupCol: String, valCol: String,
                        qs: Seq[Int], accuracy: Int = 10000): DataFrame = {
    val fracs = array(qs.map(q => lit(q / 100.0)): _*)
    df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_values"),
        percentile_approx(col(valCol), fracs, lit(accuracy)).as("__ps"))
      .select(col(groupCol) +: col("n_values") +:
        qs.zipWithIndex.map { case (q, i) => col("__ps")(i).as(s"p$q") }: _*)
      .orderBy(groupCol)
  }

  /** Per-group POSITIONAL decile profile (q80): ntile(b) over the
    * group's rows ordered (value, id), then per-bucket count/min/max/
    * mean — the distribution fingerprint curation dashboards plot per
    * language. Positional ntile (equal ROW counts per bucket, ties may
    * straddle a boundary) complements [[percentiles]]' value-based
    * ranks; the (value, id) compound order makes the straddle
    * deterministic, so both engines cut identically.
    *
    * Scale shape: one exchange on the group key feeds the window; the
    * SQL-standard ntile needs each group's rows ordered in one
    * partition, which holds while a single group's rows fit one
    * executor (languages at 100 TB do not — flip to [[percentiles]]'
    * histogram ranks or bucket by a q08-style two-pass cumsum count
    * when a group outgrows a partition). The bucket aggregate is
    * map-side partial onto groups×b cells; the mean divides two exact
    * integers. */
  def valueDeciles(df: DataFrame, groupCol: String, valCol: String,
                   idCol: String, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    df.where(col(valCol).isNotNull)
      .withColumn("decile", ntile(nBuckets).over(w))
      .groupBy(col(groupCol), col("decile"))
      .agg(
        count(lit(1)).as("n_values"),
        min(col(valCol)).as("min_value"),
        max(col(valCol)).as("max_value"),
        round(sum(col(valCol)).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_value"))
      .orderBy(col(groupCol), col("decile"))
  }
}
