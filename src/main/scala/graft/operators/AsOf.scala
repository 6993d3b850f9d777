package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark has no native
  * form of, composed from existing ops per SURVEY.md §4 preference (a):
  * no range join, no cross join, no custom physical operator needed.
  *
  * For each left row, find the right row with the greatest
  * `ts <= left.ts` within the same key group (DuckDB/kdb ASOF JOIN
  * semantics, `ON l.key = r.key AND l.ts >= r.ts`).
  *
  * Implementation: union both sides (right rows carry their payload in
  * one struct so a match is always a CONSISTENT right row, never a
  * column-wise mix), then a running `last(ignoreNulls)` over a
  * (key, ts, side) window — right rows order before left rows at equal
  * ts, giving the `>=` bound. One shuffle on the key columns; window
  * state is a single struct per group. At 100 TB this is the same
  * sort-merge shape as sessionization; skewed keys split via AQE.
  */
object AsOf {

  /** Generic as-of join. `rightCols` are carried from the matched right
    * row as `asof_<name>`; the matched right timestamp arrives as
    * `asof_ts` (NULL when no right row precedes the left row). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(col(tsCol).as("ts") +: rightCols.map(col): _*)
    val r = right.select(keys.map(col) :+ col(tsCol) :+ payload.as("__asof"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__asof", lit(null).cast(r.schema("__asof").dataType))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__asof"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__asof", "__side")
      .withColumn("asof_ts", col("__match.ts"))
      .withColumns(rightCols.map(c => s"asof_$c" -> col(s"__match.$c")).toMap)
      .drop("__match")
  }

  /** q19: purchase→view attribution — each purchase joined as-of to the
    * user's most recent view at-or-before the purchase. Right side is
    * pre-deduplicated per (user_id, ts) so ties are deterministic in
    * every engine. Inner semantics (unattributed purchases dropped). */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    def secs(c: Column) = c.cast("timestamp").cast("long")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("value").as("view_value"))
    asofJoin(purchases, views, Seq("user_id"), "ts", Seq("view_value"))
      .where(col("asof_ts").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        round(col("value"), 6).as("value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        round(col("asof_view_value"), 6).as("view_value"),
        (secs(col("ts")) - secs(col("asof_ts"))).as("secs_since_view"))
      .orderBy("event_id")
  }

  /** Banded RANGE join (q74) — the interval-predicate join class as-of
    * doesn't cover: for every `targetType` event, count `sourceType`
    * events in the half-open window [t − windowSec, t). A naive
    * formulation is a full non-equi join (Spark plans
    * BroadcastNestedLoop or CartesianProduct — O(n·m) comparisons);
    * the standard distributed answer is BANDING: bucket both sides by
    * `windowSec`-wide time bins (integer epoch-micros division, exact
    * in any engine), probe each target's bin and its predecessor
    * (every qualifying source lies in one of the two — each source has
    * ONE bin, so no pair can double-count), equi-join on the bin, and
    * apply the exact range predicate to the ~2·uniform-density
    * candidates. Turns the quadratic comparison into a hash join +
    * constant-factor filter; skewed hot bins split by AQE like any
    * equi-join key.
    *
    * Zero-match targets survive via the final left join (a monitoring
    * query's "errors with NO recent clicks" rows are the interesting
    * ones). */
  def precededByCount(events: DataFrame, targetType: String, sourceType: String,
                      windowSec: Int): DataFrame = {
    val w = windowSec * 1000000L
    val tgt = events.where(col("event_type") === targetType)
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
    val src = events.where(col("event_type") === sourceType)
      .select(unix_micros(col("ts")).as("s_us"))
      .withColumn("bucket", expr(s"s_us div ${w}L"))
    val probes = tgt.withColumn("bucket",
      explode(array(expr(s"t_us div ${w}L"), expr(s"t_us div ${w}L - 1L"))))
    val counts = probes.join(src, "bucket")
      .where(col("s_us") >= col("t_us") - w && col("s_us") < col("t_us"))
      .groupBy("event_id").agg(count(lit(1)).as("n"))
    tgt.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_preceding"))
      .orderBy("event_id")
  }

  /** Tolerance as-of join (q91): [[asofJoin]] with a match-staleness
    * bound — a prior right row older than `toleranceSec` is NO match
    * (kdb's `wj`, pandas `merge_asof(tolerance=...)`; every
    * feature-store point-in-time join has this knob, because a
    * "most recent" feature from last month is worse than no feature).
    * Expired matches null out BOTH the match timestamp and its
    * payload columns atomically — a half-expired row would be a
    * column-wise lie. Same one-exchange window plan as [[asofJoin]];
    * the tolerance is a post-window projection, free at any scale. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                        tsCol: String, rightCols: Seq[String],
                        toleranceSec: Long): DataFrame = {
    def secs(c: Column) = c.cast("timestamp").cast("long")
    val joined = asofJoin(left, right, keys, tsCol, rightCols)
    val fresh = col("asof_ts").isNotNull &&
      secs(col(tsCol)) - secs(col("asof_ts")) <= toleranceSec
    joined
      .withColumns(rightCols.map(c =>
        s"asof_$c" -> when(fresh, col(s"asof_$c"))).toMap)
      .withColumn("asof_ts", when(fresh, col("asof_ts")))
  }

  /** Windowed click→purchase attribution (q91): every purchase with
    * its user's most recent click at-or-before it, but only within the
    * attribution window — stale clicks don't get credit, and
    * unattributed purchases SURVIVE with null attribution (they are
    * the rows a marketing report counts as organic). The
    * [[purchaseAttribution]] (q19) composition with the tolerance
    * semantics production attribution actually uses. */
  def clickAttribution(events: DataFrame, windowSec: Long): DataFrame = {
    def secs(c: Column) = c.cast("timestamp").cast("long")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = events.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    asofJoinTolerance(purchases, clicks, Seq("user_id"), "ts",
      Seq("click_id"), windowSec)
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        round(col("value"), 6).as("value"),
        col("asof_click_id").as("click_id"),
        when(col("asof_ts").isNotNull,
          secs(col("ts")) - secs(col("asof_ts"))).as("secs_since_click"),
        when(col("asof_ts").isNotNull, lit(1)).otherwise(lit(0))
          .cast("int").as("attributed"))
      .orderBy("event_id")
  }
}
