package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — the dashboard-refresh
  * contract at 100 TB: a corpus-wide summary must refresh at the cost
  * of the DAY'S data, not the table's. The classical condition is
  * ALGEBRAIC aggregation state (Gray et al. 1997, "Data Cube"):
  * count/sum/min/max (and anything derivable from them — means,
  * micro-averages) merge associatively, so
  * `summary(base ∪ delta) = merge(summary(base), summarize(delta))`
  * EXACTLY, never approximately. Composes with [[Snapshots]]: an
  * append commit's [[Snapshots.deltaOf]] frame is precisely the
  * delta-summarize input, so a view stays current under the table's
  * own commit protocol without ever rescanning history. (Non-algebraic
  * stats — exact medians, distinct counts — need sketch state; the
  * library's mergeable twins are q56's percentile sketch and q41's
  * HLL distinct.)
  *
  * Scale shape: `summarize` is one partial-agg exchange over its
  * input (O(groups) out); `merge` unions two O(groups) summary tables
  * and re-aggregates — group-bounded work, no fact-table access. The
  * derived per-group mean is emitted as integer micro-units
  * (`div` over exact longs, the SURVEY §6 q54 recipe) so the
  * incremental and recomputed paths are bit-identical, not just
  * close. */
object Mv {

  private val cols = Seq("n_docs", "sum_chars", "min_chars", "max_chars")

  /** Mergeable per-source summary state over a documents frame. */
  def summarize(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("sum_chars"),
      min("n_chars").as("min_chars"),
      max("n_chars").as("max_chars"))

  /** Associative merge of two summary tables: counts and sums add,
    * bounds take min/max — sources present in only one side pass
    * through (the union's group simply has one row). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select("source", cols: _*).unionByName(b.select("source", cols: _*))
      .groupBy("source").agg(
        sum("n_docs").as("n_docs"),
        sum("sum_chars").as("sum_chars"),
        min("min_chars").as("min_chars"),
        max("max_chars").as("max_chars"))

  /** Refresh a maintained view with a delta: delta-sized scan +
    * O(groups) merge. */
  def refresh(view: DataFrame, delta: DataFrame): DataFrame =
    merge(view, summarize(delta))

  /** Render a summary for reporting: the derived mean lands as exact
    * integer micro-units so incremental == recomputed bit-for-bit. */
  def report(view: DataFrame): DataFrame =
    view.select(col("source"), col("n_docs"), col("sum_chars"),
        col("min_chars"), col("max_chars"),
        expr("(sum_chars * 1000000) div n_docs").as("mean_chars_micro"))
      .orderBy("source")
}
