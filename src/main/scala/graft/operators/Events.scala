package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the event stream table (`events`): time-bucketed
  * rollups and sessionization. The streaming twin of `rollup` lives in
  * graft.streaming.EventsStream and shares its aggregation logic.
  *
  * Scale shape: group keys are (event_type, hour) — low cardinality, so
  * partial aggregation collapses each task's rows to a handful of
  * partials before the exchange. Sessionization shuffles once on user_id
  * and uses a per-user window (bounded by per-user event counts, skew
  * handled by AQE).
  */
object Events {

  /** Hourly rollup per event_type: count, value sum/avg, distinct users.
    * `value` is 2-decimal money stored as double, so the sum runs in
    * exact cents-longs (the q103 c_acctbal pattern): a raw double sum
    * is accumulation-order-dependent, and at 10× group sizes (the sf1
    * probe) Spark's partial-agg order vs DuckDB's serial order diverged
    * past the 6-dp hash. Cents sums are order-free and exact; one
    * double division at emission is bit-identical everywhere. */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"),
        countDistinct("user_id").as("n_users"))
      .withColumn("sum_value", round(col("cents").cast("double") / 100, 6))
      // avg at 6 dp via integer HALF-UP division — (2a + b) div (2b)
      // for a/b in micro-units. A double quotient can land an ulp
      // below an exact 6-dp tie (sf1 hit 13911.3/320 = 43.4728125
      // exactly: Spark's BigDecimal saw ...2499 and rounded down,
      // DuckDB rounded its scaled double up); integer half-up has no
      // ulp to disagree about. cents·2·10⁴ stays far under 2⁶³.
      // PRECONDITION: cents >= 0. The formula (and the `div`-vs-`//`
      // cross-engine agreement — Spark truncates toward zero, DuckDB
      // floors) is only half-up for NON-NEGATIVE sums; events.value is
      // money, min 0.01 in this corpus. A signed-value corpus needs a
      // sign-symmetric rounding on both sides first. (Same formula in
      // streaming/EventsStream.scala and OracleSql q17.)
      .withColumn("avg_value",
        expr("(2 * cents * 10000 + n_events) div (2 * n_events)")
          .cast("double") / lit(1000000.0))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("sum_value"), col("avg_value"), col("n_users"))
      .orderBy("event_type", "hour")

  /** Semi-structured props parsing: the events `props` column is a JSON
    * payload; parse it with an explicit schema (`from_json` — schema'd
    * parse beats per-field `get_json_object` re-parsing when extracting
    * multiple fields) and aggregate the extracted field per event_type.
    * Integer-only outputs — no cross-engine float concerns. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Sessionize: split each user's event stream at gaps > `gapMinutes`,
    * emit per-session aggregates. Classic two-window pattern: lag to mark
    * session starts, running sum to assign session ids. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    // epoch-second truncation (cast ts→timestamp→long) matches
    // date_diff('second', …) boundary counting in the oracle; ts may read
    // as TIMESTAMP_NTZ from parquet, the session tz is pinned to UTC.
    def secs(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")
    val marked = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          secs(col("ts")) - secs(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(byUser))
    marked.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** [[sessionize]] through Spark's NATIVE `session_window` — the
    * declarative face of the same gaps-and-islands semantics (Catalyst
    * plans merging session aggregation; in streaming this is the
    * form that gets watermark-driven state eviction for free, where
    * the lag/cumsum formulation cannot run at all). Boundary
    * alignment, the subtle part: [[sessionize]] SPLITS at
    * `diff > gap` (a gap of exactly `gap` chains), and Spark's session
    * merge is INCLUSIVE on the window close (`next.start <= prev.end`
    * — touching windows merge), so `d = gap` splits at exactly
    * `diff > gap`: the two split sets are identical and the
    * differential against [[sessionize]] is exact (EventsStream's
    * stateful twin shares the same contract). `session_end` is the
    * window's close, `last_ts + gap` — the "session expires at"
    * instant a serving cache would use. */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMinutes * 60} seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Ordered conversion funnel: how many users performed `steps(0)`,
    * then `steps(1)` STRICTLY AFTER it, then `steps(2)` strictly after
    * that, … Each stage keeps the user's EARLIEST qualifying timestamp
    * (first view → first click after that view → first purchase after
    * that click), the standard product-analytics funnel semantics.
    *
    * Scale shape: stage s is a conditional min-aggregate over events
    * joined to the stage-(s−1) frontier on user_id — partial (map-side)
    * min before each exchange, and every join/agg keys on user_id, so
    * one hash partitioning is planned once and reused across all
    * stages (Spark's ReusedExchange; no re-shuffle per stage). State
    * per stage is one (user_id, ts) row per surviving user — shrinking
    * monotonically down the funnel. Output is `steps.length` rows. */
  /** Time-to-convert decile profile (q97): for every user whose first
    * `toType` event lands at-or-after their first `fromType` event,
    * the conversion latency in whole seconds, cut into ntile
    * positional deciles with per-decile count/min/max/mean — the
    * latency-distribution report that sits on top of [[funnel]]'s
    * conversion COUNTS (product teams act on "p90 signup→purchase is
    * 3 days", not on the mean). Same-instant conversion counts (≥, a
    * documented contrast with the funnel's strict order — the oracle
    * mirrors it).
    *
    * Scale shape: two conditional min-aggregations on user_id (AQE
    * reuses the exchange), then the decile window over CONVERTING
    * USERS — a set ≪ the event stream; if even that outgrows one
    * partition, q08's two-pass bucket scheme replaces the global
    * ntile (the q80 flip, documented there). Mean divides two exact
    * integers. */
  def conversionLatencyDeciles(events: DataFrame, fromType: String,
                               toType: String, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def secs(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")
    val tFrom = events.where(col("event_type") === fromType)
      .groupBy("user_id").agg(min("ts").as("t_from"))
    val lat = events.where(col("event_type") === toType)
      .select(col("user_id"), col("ts"))
      .join(tFrom, "user_id")
      .where(col("ts") >= col("t_from"))
      .groupBy("user_id", "t_from").agg(min("ts").as("t_to"))
      .select(col("user_id"),
        (secs(col("t_to")) - secs(col("t_from"))).as("latency"))
    lat
      .withColumn("decile",
        ntile(nBuckets).over(Window.orderBy(col("latency"), col("user_id"))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        min("latency").as("min_secs"), max("latency").as("max_secs"),
        round(sum("latency").cast("double") / count(lit(1)), 6).as("mean_secs"))
      .orderBy("decile")
  }

  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // frontier s: (user_id, t) = earliest completion time of the
    // step-prefix of length s — each one a conditional min-agg joined
    // to the previous frontier
    val frontiers = steps.tail.scanLeft(
      events.where(col("event_type") === steps.head)
        .groupBy("user_id").agg(min("ts").as("t"))) { (prev, step) =>
      events.where(col("event_type") === step)
        .join(prev, "user_id")
        .where(col("ts") > col("t"))
        .groupBy("user_id").agg(min("ts").as("t"))
    }
    // ONE plan: union the tagged frontiers and count per stage. The
    // stage-s branch contains the stage-(s−1) subplan verbatim, so
    // Spark plans the shared exchanges once (ReusedExchange) instead
    // of recomputing the prefix per stage the way per-stage count()
    // jobs would.
    val tagged = frontiers.zipWithIndex.map { case (f, i) =>
      f.select(lit(i + 1).as("stage_idx"), lit(steps(i)).as("stage"),
        col("user_id"))
    }.reduce(_ union _)
    val counts = tagged.groupBy("stage_idx", "stage")
      .agg(count(lit(1)).as("n_users"))
    // conversion vs the PREVIOUS stage (stage 1 = 1.0), over the
    // steps.length-row output frame — the constant partitionBy(lit)
    // only suppresses the benign no-partition window warning
    val prev = lag("n_users", 1).over(
      Window.partitionBy(lit(0)).orderBy("stage_idx"))
    counts.select(col("stage_idx"), col("stage"), col("n_users"),
      round(col("n_users").cast("double") /
        greatest(coalesce(prev, col("n_users")), lit(1L)).cast("double"),
        6).as("conv_rate"))
      .orderBy("stage_idx")
  }

  /** Hourly anomaly report (q73): flag (event_type, hour) cells whose
    * event count sits more than `z` population standard deviations
    * from that type's hourly mean — the monitoring staple over the
    * same rollup q17 serves. The GATE is pure integer arithmetic:
    * |n−μ| > z·σ  ⟺  (n·cnt − Σn)² > z²·(cnt·Σn² − (Σn)²), with every
    * term an exact integer (no float mean/stddev accumulation order to
    * disagree across engines — `stddev_pop` would hash-flip boundary
    * cells). The reported z-score itself is one sqrt of an exact
    * integer and one division, both IEEE-correctly-rounded, then 6-dp.
    *
    * Scale shape: the hourly aggregate is ONE exchange (same keys as
    * [[rollup]]); per-type moment stats are a types-row frame
    * broadcast back. Nothing materializes per event downstream. */
  def anomalies(events: DataFrame, z: Int): DataFrame = {
    val hourly = events.groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type").agg(
      count(lit(1)).as("cnt"), sum("n").as("sum_n"),
      sum(col("n") * col("n")).as("sum_n2"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("num", col("n") * col("cnt") - col("sum_n"))
      .withColumn("den2", col("cnt") * col("sum_n2") - col("sum_n") * col("sum_n"))
      .where(col("num") * col("num") > lit(z.toLong * z) * col("den2"))
      .select(col("event_type"), col("hour"), col("n").as("n_events"),
        round(col("num").cast("double") / sqrt(col("den2").cast("double")), 6).as("z"))
      .orderBy("event_type", "hour")
  }

  /** Rolling active users (q183): per corpus day, DAU / WAU (trailing
    * 7 calendar days) / MAU (trailing 30) — THE product north-star
    * triple, and the operator that makes [[graft.functions.Bitmap]]'s
    * re-aggregation face pay off: per-day distinct-user BITMAPS build
    * once (one (day) exchange with map-side partial combine), then
    * every rolling window is an OR of ≤7/≤30 serialized bitmaps — the
    * naive per-window `count(distinct)` rescans and re-shuffles the
    * raw stream 30× (every day's events land in 30 window groups;
    * here a day's events collapse to ONE bitmap before any fan-out,
    * and only KB-scale bitmaps replicate). Exact counts, not HLL —
    * the q140/q140b contrast at window granularity.
    *
    * Shape: day-bitmap explode to its ≤30 target days (array
    * `sequence`, codegen), inner-join against the corpus day list
    * (drops phantom trailing days), one bitmap-OR exchange per
    * window, popcount scalar at emission. Early days report unions
    * over available history — the standard convention. */
  def activeUsers(events: DataFrame): DataFrame = {
    import graft.functions.Bitmap
    val daily = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(Bitmap.bitmapBuild(col("user_id")).as("bm"))
    val days = daily.select("day")
    def rolled(n: Int, name: String) = daily
      .select(explode(sequence(col("day"), date_add(col("day"), n - 1))).as("day"),
        col("bm"))
      .join(days, "day")
      .groupBy("day").agg(Bitmap.bitmapOr(col("bm")).as("u"))
      .select(col("day"), Bitmap.bitmapCard(col("u")).as(name))
    daily.select(col("day"), Bitmap.bitmapCard(col("bm")).as("dau"))
      .join(rolled(7, "wau"), "day")
      .join(rolled(30, "mau"), "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("mau"))
      .orderBy("day")
  }

  /** Audience overlap matrix (q186): for every event-type pair, the
    * EXACT user-set intersection and Jaccard — the audience-analysis
    * staple ("how much of the purchase audience also errors?") and the
    * set-ALGEBRA face of the bitmap family: q140 re-aggregates by OR,
    * this intersects by the
    * [[graft.functions.BitmapAndCardinality]] codegen'd sorted-merge
    * AND — distinct-user sets collapse to one KB-scale bitmap per type
    * BEFORE the pair fan-out, so the pair join carries |types|² bitmap
    * rows, never per-user rows (the naive pair-distinct re-shuffles
    * the user stream per pair). Counts exact; the one float (Jaccard)
    * rounds at emission. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    import graft.functions.Bitmap
    val perType = events
      .groupBy(col("event_type"))
      .agg(Bitmap.bitmapBuild(col("user_id")).as("bm"))
    val a = perType.select(col("event_type").as("type_a"), col("bm").as("ba"))
    val b = perType.select(col("event_type").as("type_b"), col("bm").as("bb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        Bitmap.bitmapCard(col("ba")).as("n_a"),
        Bitmap.bitmapCard(col("bb")).as("n_b"),
        Bitmap.bitmapAndCard(col("ba"), col("bb")).as("overlap"))
      .withColumn("jaccard", round(col("overlap").cast("double") /
        (col("n_a") + col("n_b") - col("overlap")).cast("double"), 6))
      .orderBy("type_a", "type_b")
  }

  /** Seasonality-adjusted anomaly report (q182): each hour scored
    * against its HOUR-OF-DAY slot's distribution per event type, not
    * the flat per-type baseline — the diurnal-profile upgrade of
    * [[anomalies]]/q73 (under a flat baseline a 3 AM traffic spike
    * hides inside noon-dominated variance, and every quiet night hour
    * reads as a negative anomaly; slot-conditioning is the first
    * seasonal correction every ops pipeline grows). Same exact-integer
    * gate as q73 — `num² > z²·den2` with num = n·cnt − Σn and
    * den2 = cnt·Σn² − (Σn)² over the (type, slot) population, so
    * membership can never hash-flip; the reported z divides exact
    * integers once, 6-dp. Slots with one observation or zero variance
    * have num = 0 and drop out by math.
    *
    * Scale shape: one (event_type, hour) partial-agg exchange (the
    * q17/q73 keys), then a broadcast join against the (types × 24)-row
    * slot-stats frame — nothing materializes per event past the first
    * aggregate, at any corpus size. The hour-of-day slot derives from
    * the hour STRING (chars 12-13), the same 1-based substring in both
    * engines. */
  def seasonalAnomalies(events: DataFrame, z: Int): DataFrame = {
    val hourly = events.groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hod", substring(col("hour"), 12, 2).cast("int"))
    val stats = hourly.groupBy("event_type", "hod").agg(
      count(lit(1)).as("cnt"), sum("n").as("sum_n"),
      sum(col("n") * col("n")).as("sum_n2"))
    hourly.join(broadcast(stats), Seq("event_type", "hod"))
      .withColumn("num", col("n") * col("cnt") - col("sum_n"))
      .withColumn("den2", col("cnt") * col("sum_n2") - col("sum_n") * col("sum_n"))
      .where(col("num") * col("num") > lit(z.toLong * z) * col("den2"))
      .select(col("event_type"), col("hour"), col("hod"),
        col("n").as("n_events"),
        round(col("num").cast("double") / sqrt(col("den2").cast("double")), 6).as("z_slot"))
      .orderBy("event_type", "hour")
  }

  /** CUSUM changepoint localization (q165; Page 1954's cumulative-sum
    * statistic, offline single-changepoint form): per event type, the
    * hour at which the hourly-count level SHIFTED — argmax_t |S_t| with
    * S_t = Σ_{i≤t}(x_i − x̄) — plus the before/after means and the step
    * size. The drift-localization complement of q73 (which flags
    * outlier CELLS; this finds the moment the LEVEL moved) and the
    * time-axis sibling of q142's key-range checksum localization.
    *
    * Determinism discipline: S_t·T = T·Σ_{i≤t}x_i − t·ΣX is EXACT
    * INTEGER arithmetic, so the argmax (and its earliest-t tie-break)
    * can never hash-flip across engines; floats appear only in the
    * final reported means/score, each one division of exact integers,
    * 6-dp rounded. The last index is excluded (a changepoint must
    * split the series).
    *
    * Scale shape: the hourly aggregate is ONE exchange (q17/q73's
    * keys); the cumulative sum and the argmax run per-type windows —
    * partitions are event TYPES and rows are HOURS (time-bounded, not
    * corpus-bounded: a year is 8 760 rows per type at any data size).
    * Nothing materializes per event past the first aggregate. */
  def changepoint(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events.groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
    val byHour = Window.partitionBy("event_type").orderBy("hour")
    val cum = hourly
      .withColumn("t", row_number().over(byHour).cast("long"))
      .withColumn("cum", sum(col("n")).over(byHour))
    val stats = cum.groupBy("event_type")
      .agg(max(col("t")).as("t_max"), sum(col("n")).as("total"))
    val scored = cum.join(broadcast(stats), "event_type")
      .where(col("t") < col("t_max"))
      .withColumn("s_scaled", col("t_max") * col("cum") - col("t") * col("total"))
      .withColumn("s_abs", abs(col("s_scaled")))
    val best = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("s_abs").desc, col("t"))))
      .where(col("rn") === 1)
    best.select(col("event_type"), col("t_max").as("n_hours"),
        col("hour").as("change_hour"), col("t").as("t_index"),
        round(col("cum").cast("double") / col("t").cast("double"), 6).as("mean_before"),
        round((col("total") - col("cum")).cast("double") /
          (col("t_max") - col("t")).cast("double"), 6).as("mean_after"),
        round(((col("total") - col("cum")).cast("double") /
          (col("t_max") - col("t")).cast("double")) -
          (col("cum").cast("double") / col("t").cast("double")), 6).as("level_shift"),
        round(col("s_abs").cast("double") / col("t_max").cast("double"), 6).as("cusum_peak"))
      .orderBy("event_type")
  }

  /** Holt double-exponential smoothing forecast (q177, Holt 1957 /
    * Hyndman & Athanasopoulos' standard init): per event type, fold
    * the hourly-count series through level+trend recursions
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}),
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1},
    * l_1 = x_1, b_1 = x_2 − x_1, and report the fitted end state plus
    * the h-step-ahead linear forecasts l_n + h·b_n — the trend-aware
    * sibling of q87's OLS forecast (q87 fits one global line; Holt
    * tracks a DRIFTING level, which is what capacity planning on
    * living event streams actually wants) and the forecasting
    * complement of q165's retrospective changepoint.
    *
    * Exactness: α and β are RATIONALS (αNum/SmoothDen, βNum/SmoothDen)
    * and the whole recursion runs in integer micro-units with
    * truncating division — Spark's `div` and DuckDB's `//` both
    * truncate toward zero, so a fixed-length fold is hash-exact
    * cross-engine (the q88 fixed-rounds discipline applied to a
    * data-length recursion; no float accumulates anywhere).
    *
    * Scale shape: ONE (event_type, hour) partial-agg exchange builds
    * the hourly series; the fold is a codegen'd `aggregate` HOF over a
    * per-type array bounded by HOURS (the q165 argument: a year is
    * 8 760 entries per type at any corpus size — time-bounded, not
    * data-bounded), so no window, no iteration, no driver state.
    * Overflow headroom: α·x·10⁶ stays under 2⁶³ to ~10¹² events per
    * (type, hour) — past any real stream's hourly rate. */
  def holtForecast(events: DataFrame, alphaNum: Int, betaNum: Int,
                   den: Int, horizon: Int): DataFrame = {
    require(alphaNum > 0 && betaNum > 0 && den > 0 &&
      alphaNum <= den && betaNum <= den, "smoothing rationals must be in (0, 1]")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val hourly = events.groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
    val series = hourly.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("hour"), col("n")))).as("xs"),
        count(lit(1)).as("n_hours"), max(col("hour")).as("last_hour"))
    // b_eff resolves the init: at t=1 the trend is x_2 − x_1 (not yet
    // in acc), afterwards acc.b. l' appears twice because a struct
    // field cannot reference its sibling — same expression, same value.
    val bEff = s"(CASE WHEN acc.t = 1L THEN (x.n - acc.x1) * 1000000L ELSE acc.b END)"
    val lNew = s"(($alphaNum * x.n * 1000000L + ${den - alphaNum} * (acc.l + $bEff)) div $den)"
    val fold = s"""aggregate(
      xs,
      named_struct('t', 0L, 'l', 0L, 'b', 0L, 'x1', 0L),
      (acc, x) -> CASE WHEN acc.t = 0L
        THEN named_struct('t', 1L, 'l', x.n * 1000000L, 'b', 0L, 'x1', x.n)
        ELSE named_struct(
          't', acc.t + 1L,
          'l', $lNew,
          'b', (($betaNum * ($lNew - acc.l) + ${den - betaNum} * $bEff) div $den),
          'x1', acc.x1)
      END)"""
    val forecasts = (1 to horizon).map(h =>
      (col("st.l") + lit(h.toLong) * col("st.b")).as(s"f${h}_micro"))
    series.withColumn("st", expr(fold))
      .select(Seq(col("event_type"), col("n_hours"), col("last_hour"),
        col("st.l").as("level_micro"), col("st.b").as("trend_micro")) ++ forecasts: _*)
      .orderBy("event_type")
  }

  /** Item co-visitation similarity (q178) — the classic
    * collaborative-filtering item-item matrix (the covisitation-graph
    * construction behind item-to-item recommenders, Linden et al.
    * 2003) over the events stream's prop items: two items are similar
    * when the same users touch both, scored by the cosine of their
    * binary user-incidence vectors, co(i,j)/√(n_i·n_j). Beside the
    * session-path and transition reports this is the third
    * relatedness readout — and in an LLM-data pipeline the same
    * machinery scores document co-retrieval affinity.
    *
    * Scale discipline — the two places a naive covisit matrix
    * explodes, closed: (1) per-user fan-out is CAPPED: each user
    * contributes at most `userItemCap` items (their most-interacted,
    * ties to the smaller item id — the standard heavy-user clamp: an
    * account touching 10⁵ items is a bot/aggregator and would alone
    * emit 10¹⁰ pairs; capped, per-user pair mass is ≤ C(cap, 2)), via
    * [[graft.plans.GroupedTopK]] bounded heaps — no window sort. (2)
    * pair counting is one (item_a, item_b) partial-agg exchange over
    * the capped per-user pair stream. Counts n_i are measured AFTER
    * the cap so the cosine's norm matches the pair stream it scores.
    * Per-item top-k again through GroupedTopK. Both directions are
    * emitted ((a,b) and (b,a)) so every item carries its own
    * neighbor list — the serving shape.
    *
    * Exactness: counts are integers; the one float op
    * (co/√(n_i·n_j)) rounds to 6 dp at emission, and the top-k order
    * key is (rounded sim desc, neighbor asc) — the q67 rounded-before-ranking
    * convention, so ranking never hangs on a raw
    * double. */
  def covisitation(events: DataFrame, userItemCap: Int, simTopK: Int): DataFrame = {
    require(userItemCap >= 2, s"userItemCap must be >= 2, got $userItemCap")
    require(simTopK >= 1, s"simTopK must be >= 1, got $simTopK")
    val ui = events
      .select(col("user_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .groupBy("user_id", "item").agg(count(lit(1)).as("cnt"))
    val kept = graft.plans.GroupedTopK.topK(ui, Seq(col("user_id")),
        Seq(col("cnt").desc, col("item").asc), userItemCap)
      .select("user_id", "item")
    val itemUsers = kept.groupBy("item").agg(count(lit(1)).as("n_users"))
    val co = kept.as("a").join(kept.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("co_users"))
    val both = co.select(col("ia").as("item"), col("ib").as("neighbor"), col("co_users"))
      .union(co.select(col("ib").as("item"), col("ia").as("neighbor"), col("co_users")))
    val scored = both
      .join(itemUsers.select(col("item"), col("n_users").as("ni")), "item")
      .join(itemUsers.select(col("item").as("neighbor"), col("n_users").as("nj")),
        "neighbor")
      .select(col("item"), col("neighbor"), col("co_users"),
        round(col("co_users").cast("double") /
          sqrt((col("ni") * col("nj")).cast("double")), 6).as("cosine_sim"))
    graft.plans.GroupedTopK.topK(scored, Seq(col("item")),
        Seq(col("cosine_sim").desc, col("neighbor").asc), simTopK)
      .orderBy(col("item"), col("cosine_sim").desc, col("neighbor"))
  }

  /** Cohort retention matrix (q70) — the product-analytics staple next
    * to [[rollup]]/[[funnel]]: users cohort by FIRST-ACTIVITY week
    * (ISO weeks, `date_trunc` to Monday — identical truncation in
    * DuckDB), and each (cohort_week, week_offset) cell counts the
    * cohort's users still active that many weeks later, with the
    * retention ratio against cohort size. All counts are integers and
    * the ratio divides two exact integers — no float drift surface.
    *
    * Scale shape: the (user, week) distinct and the per-user min are
    * ONE exchange each on user_id, and AQE reuses the partitioning for
    * the cohort join (same key); the matrix aggregate's key space is
    * weeks², trivially small. At 100 TB of events the cost is the two
    * user_id exchanges — nothing materializes per event after the
    * first distinct. */
  /** Top session paths (q83): the first `maxSteps` event types of each
    * session joined into a path string ("view>click>purchase"), ranked
    * by session count — the navigation-pattern report product analytics
    * builds on top of sessionize (and the longer-horizon companion to
    * q79's one-step transitions). Session assignment is [[sessionize]]'s
    * two-window pattern with the order pinned by (ts, event_id) so tie
    * rows join the path in the same position in both engines.
    *
    * Scale shape: the one user_id exchange feeds BOTH windows and the
    * per-session collect — hash partitioning on user_id satisfies the
    * (user_id, session_seq) clustering, so no second exchange. The
    * collect_list is bounded per SESSION (not per user): a session is
    * gap-delimited human activity, and the path then truncates to
    * maxSteps — for adversarially long sessions, pre-filter with a
    * row_number ≤ maxSteps window on the same partitioning before
    * collecting. The path groupBy exchanges ≤|types|^maxSteps short
    * strings and the final top-n is TakeOrderedAndProject. */
  def sessionPaths(events: DataFrame, gapMinutes: Int, maxSteps: Int,
                   topN: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    def secs(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          secs(col("ts")) - secs(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(byUser))
    flagged
      .groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        transform(slice(col("evs"), 1, maxSteps), e => e.getField("event_type")))
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(topN)
  }

  /** Event-type transition matrix (q79): for each consecutive pair in a
    * user's stream, count (event_type → next_type) and the per-source
    * transition probability — the first-order Markov view of behavior
    * (feeds session simulation and bot/anomaly detection beside the
    * q73 volume gate).
    *
    * Scale shape: ONE exchange on user_id feeds the lead() window — the
    * same partitioning sessionize uses, so a pipeline computing both
    * reuses the exchange. The pair aggregate is map-side partial onto
    * an event_type² grid (25 cells here — bounded by the type
    * vocabulary, not the data), and the probability divides two exact
    * integers from that grid, windowed over the ≤|types| rows per
    * source type. Order within ties is pinned by event_id so the
    * pairing is deterministic across engines and scales. */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val bySource = Window.partitionBy("event_type")
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(bySource).cast("double"), 6))
      .orderBy("event_type", "next_type")
  }

  def retention(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .join(sizes, "cohort_week")
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size").cast("double"), 6)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Gap-aware trailing moving window over daily revenue — the RANGE
    * frame class of window analytics, distinct from q24's ROWS frame
    * in exactly the way that matters on real calendars: a ROWS frame
    * slides over whatever rows EXIST ("last 7 rows" spans 7 weeks on a
    * sparse series), a RANGE frame slides over the ordering VALUE
    * ("last `days` calendar days", absent days contribute nothing).
    * Revenue days are usually dense; per-type × per-day often is not —
    * the distinction is where trailing-7-day dashboards silently lie.
    *
    * Plan: the daily pre-aggregation collapses the event stream to
    * O(types × days) rows (map-side partials — the q17 shape), and the
    * window runs over THAT, so the sort under the window frame touches
    * the tiny aggregate, never the corpus; one exchange on event_type.
    * Money in exact cents-longs; the trailing average divides cents by
    * PRESENT days in integer micro-units (`div` — floor-consistent,
    * cents ≥ 0, the q17 precondition) so no float sum or quotient can
    * drift cross-engine. */
  def movingDailyRevenue(events: DataFrame, days: Int): DataFrame = {
    require(days >= 1, s"days must be positive, got $days")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("day_num")
      .rangeBetween(-(days - 1L), 0L)
    daily
      .withColumn("win_cents", sum("cents").over(w))
      .withColumn("win_days", count(lit(1)).over(w))
      .select(
        col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(col("cents").cast("double") / 100, 6).as("day_value"),
        round(col("win_cents").cast("double") / 100, 6).as("win_value"),
        col("win_days"),
        (expr("(win_cents * 10000) div win_days").cast("double") / lit(1000000.0))
          .as("avg_day_value"))
      .orderBy("event_type", "day")
  }

  /** Hourly distinct-user BITMAP rollup — the pre-aggregated
    * COUNT DISTINCT pattern ([[graft.functions.Bitmap]]; ClickHouse
    * groupBitmap / Druid bitmap metrics). One scan of the raw events
    * builds, per (event_type, hour), the exact user-id SET as a
    * serialized bitmap plus the algebraic counters. Distinct counts
    * are not algebraic over counters (hours can't sum to a day), but
    * they are over id-sets — so ANY coarser rollup or ad-hoc range
    * question answers exactly from this table via [[distinctDaily]]
    * without touching raw rows again.
    *
    * Scale shape: ObjectHashAggregate with map-side partials — each
    * task ships ONE bitmap per (type, hour) group, not its raw ids;
    * the exchange carries O(groups × distinct-users/8) bytes. The
    * rollup persists as plain parquet (binary column), partitionable
    * by day for range pruning at serve time. */
  def userBitmapRollup(events: DataFrame): DataFrame = {
    import graft.functions.Bitmap.bitmapBuild
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        bitmapBuild(col("user_id")).as("user_bm"))
  }

  /** Fixed-size sketch twin of [[userBitmapRollup]] — Datasketches HLL
    * via Spark's built-in `hll_sketch_agg` (codegen'd, mergeable). The
    * bitmap rollup is EXACT but its bytes grow with the distinct count
    * (O(distinct/8) worst case); the HLL sketch is capped at ~2^lgK
    * bytes NO MATTER the cardinality — the right rollup column when
    * the id space is unbounded (web client ids, not bounded user
    * tables) and ±1-2 % is acceptable. Mergeability is exact by
    * construction (register-wise max), so serving coarser buckets from
    * finer sketches loses NOTHING vs sketching the coarse bucket
    * directly — spec-pinned bit-equality of the two estimates. */
  def userSketchRollup(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id"), lgK).as("user_hll"))

  /** Serve approximate daily distinct users from the HLL rollup:
    * union the hour sketches per day, estimate once at emission
    * (LONG — Spark's hll_sketch_estimate rounds the Datasketches
    * double internally). Rows-only key (no engine-portable oracle —
    * DuckDB's approx_count_distinct is a different HLL), differential
    * spec vs the exact path bounds the error. */
  def approxDistinctDaily(sketchRollup: DataFrame): DataFrame =
    sketchRollup
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("hour")), "yyyy-MM-dd").as("day"))
      .agg(
        sum("n_events").as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("user_hll"))).as("n_users_est"))
      .orderBy("event_type", "day")

  /** Serve exact daily distinct users FROM THE ROLLUP: OR-merge the
    * 24 hourly bitmaps per (event_type, day) and popcount — never
    * rescanning raw events. n_events re-aggregates algebraically.
    * The merge agg is O(day-groups) tiny bitmaps; the popcount is a
    * codegen'd scalar over the merged buffer. */
  def distinctDaily(rollup: DataFrame): DataFrame = {
    import graft.functions.Bitmap.{bitmapCard, bitmapOr}
    rollup
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("hour")), "yyyy-MM-dd").as("day"))
      .agg(
        sum("n_events").as("n_events"),
        bitmapCard(bitmapOr(col("user_bm"))).as("n_users"))
      .orderBy("event_type", "day")
  }

  /** Peak concurrency (q211) — interval algebra via sweep line: the
    * maximum number of simultaneously open sessions per event type,
    * and the first instant attaining it. A session is the half-open
    * interval [ts, ts + value seconds) in exact epoch-microsecond
    * integers; concurrency at t counts sessions with start ≤ t < end,
    * which is precisely the running sum of per-instant NET deltas
    * (+1 starts, −1 ends — netting per instant makes the running value
    * independent of intra-instant event order, so the answer is
    * well-defined and partition-invariant).
    *
    * Scale shape — a DISTRIBUTED prefix sum, not one monolithic
    * window: a plain `sum over (partition by type order by t)` puts an
    * entire type's history in one task (5 types at 100 TB = 5 tasks).
    * Instead: (1) net deltas per (type, instant) — one hash exchange
    * with map-side combine; (2) running sum WITHIN (type, day) range
    * partitions; (3) per-(type, day) totals — a days×types-sized
    * frame — prefix-summed and BROADCAST back as day offsets, so step
    * 2's within-day runs lift to global concurrency without any
    * type-wide ordering exchange. Sessions crossing a day boundary are
    * handled by construction: their −1 lands in a later bucket and the
    * offset carries the open count forward. */
  def peakConcurrency(events: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val deltas = events
      .select(col("event_type"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          round(greatest(col("value"), lit(0.0)) * 1e6).cast("long")).as("e"))
      .select(col("event_type"), explode(array(
        struct(col("s").as("t"), lit(1L).as("d")),
        struct(col("e").as("t"), lit(-1L).as("d")))).as("x"))
      .select(col("event_type"), col("x.t").as("t"), col("x.d").as("d"))
      .groupBy("event_type", "t").agg(sum("d").as("net"))
      .withColumn("bucket", floor(col("t") / lit(DayUs)).cast("long"))
    val within = deltas.withColumn("run_in",
      sum("net").over(Window.partitionBy("event_type", "bucket")
        .orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = deltas
      .groupBy("event_type", "bucket").agg(sum("net").as("btot"))
      .withColumn("off", coalesce(
        sum("btot").over(Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("event_type", "bucket", "off")
    within.join(broadcast(offsets), Seq("event_type", "bucket"))
      .withColumn("conc", col("run_in") + col("off"))
      .groupBy("event_type")
      .agg(max(struct(col("conc").as("c"), (-col("t")).as("nt"))).as("m"))
      .select(col("event_type"),
        col("m.c").as("peak_concurrency"),
        (-col("m.nt")).as("peak_at_us"))
      .orderBy("event_type")
  }
}

