package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event analytics
  * (graft.operators.Events) — same aggregation logic declared over a
  * `readStream` source (SURVEY.md §2 row 17).
  *
  * Scale shape: the hourly rollup is a watermarked tumbling-window agg —
  * state is bounded to windows newer than the watermark, partial
  * aggregation applies before the exchange exactly as in batch.
  * Sessionization keeps explicit per-user state via
  * `flatMapGroupsWithState`; state is one (lastTs, seq) pair per user,
  * shuffled once on user_id.
  */
object EventsStream {

  /** Hourly tumbling-window rollup per event_type. Shared shape with
    * Events.rollup; distinct-user counting is approximate here because
    * exact distinct aggregation is unsupported over unbounded streams. */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      // exact cents sum + integer half-up avg — see Events.rollup.
      .withColumn("sum_value", round(col("cents").cast("double") / 100, 6))
      .withColumn("avg_value",
        expr("(2 * cents * 10000 + n_events) div (2 * n_events)")
          .cast("double") / lit(1000000.0))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))

  /** EXACT distinct users per hourly window on an unbounded stream —
    * closing the gap [[rollup]] documents (Spark's countDistinct is
    * unsupported in streaming aggregation; approx_count_distinct is
    * the usual fallback). The bitmap aggregate
    * ([[graft.functions.Bitmap]]) is a plain TypedImperativeAggregate,
    * so streaming state handles it like any other buffer: state per
    * OPEN window is the window's id bitmap (O(distinct-ids-that-hour/8)
    * bytes), evicted when the watermark closes the window — bounded
    * state on an unbounded stream, and the count is exact, not a
    * sketch. The same state-compatibility holds for the HLL twin
    * (swap bitmapCard∘bitmapBuild for hll_sketch_agg) when the id
    * space is unbounded. */
  def distinctRollup(events: DataFrame): DataFrame = {
    import graft.functions.Bitmap.{bitmapBuild, bitmapCard}
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        bitmapCard(bitmapBuild(col("user_id"))).as("n_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("n_users"))
  }

  /** Open a parquet directory as a stream with watermarked event time. */
  def readEvents(spark: SparkSession, path: String, watermark: String = "2 hours"): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path).withWatermark("ts", watermark)
  }

  /** Streaming exact dedup twin of Dedup.exact: drop rows whose key was
    * already seen within the watermark horizon. State is bounded — keys
    * older than the watermark are evicted, which is the only dedup
    * contract that survives an unbounded stream. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(lastTsMs: Long, seq: Long)
  case class Session(user_id: Long, session_seq: Long, n_events: Long, sum_value: Double)

  /** Per-user sessionization with explicit state: events within
    * `gapMinutes` of the previous event share a session. Each batch
    * emits the sessions it completed or extended (Update semantics);
    * state carries only (last event time, session counter) per user.
    *
    * Ordering contract: events are sorted within a batch, but an event
    * arriving in a LATER batch with an earlier timestamp than state has
    * already advanced past is late data — it is DROPPED (the same
    * decision a watermark makes), never applied, because rewinding
    * lastTs would corrupt the gap computation for every subsequent
    * on-time event. Pair the source with `withWatermark` to bound how
    * late data can be before it reaches this operator at all. */
  /** Live corpus/stream monitoring: approximate value percentiles per
    * tumbling window and event_type. `approx_percentile` is a mergeable
    * sketch, so it aggregates partially before the exchange and keeps
    * bounded state per open window — the streaming-legal twin of
    * [[graft.operators.Profile.percentiles]]'s exact histogram (exact
    * distincts can't close over an unbounded stream; the watermark
    * closes windows instead). Percents are integer 0-100, matching the
    * batch operator's contract. */
  def valueQuantiles(events: DataFrame, qs: Seq[Int],
                     windowLen: String = "1 hour",
                     accuracy: Int = 10000): DataFrame = {
    val fracs = array(qs.map(q => lit(q / 100.0)): _*)
    events
      .where(col("value").isNotNull)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_values"),
        percentile_approx(col("value"), fracs, lit(accuracy)).as("__ps"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour") +:
          col("event_type") +: col("n_values") +:
          qs.zipWithIndex.map { case (q, i) => round(col("__ps")(i), 6).as(s"p$q") }: _*)
  }

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(stageIdx: Int, tsMs: Long)
  case class FunnelHit(user_id: Long, stage_idx: Int, stage: String, ts: Timestamp)

  /** Streaming twin of Events.funnel: per-user stage progression as ONE
    * stateful operator keyed by user_id — state is just (stage index,
    * timestamp it was reached), O(1) per user. Emits a [[FunnelHit]]
    * transition row each time a user advances a stage (append-style;
    * stage counts are a downstream aggregation).
    *
    * Semantics contract vs batch: within a batch, events process in
    * event-time order with the same STRICT ts > previous-stage-ts rule,
    * so a single-batch run emits exactly the batch funnel's earliest
    * qualifying transitions (differential-tested in StreamingSpec).
    * Across batches the pass is prefix-greedy: an event in a later
    * batch with an earlier timestamp than a stage the state already
    * passed is late data and cannot rewind the stage (the same decision
    * [[sessionize]] documents) — pair the source with `withWatermark`
    * to bound that lateness. Stage-skipping input (click before any
    * view) is ignored at every batch boundary exactly as in batch. */
  def funnelTransitions(events: Dataset[FunnelEvent],
                        steps: Seq[String]): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    val stageOf = steps.zipWithIndex.toMap
    events
      .filter(e => e.event_type != null && stageOf.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[FunnelState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
          val out = Seq.newBuilder[FunnelHit]
          sorted.foreach { e =>
            val next = st.stageIdx + 1
            if (next < steps.length && stageOf(e.event_type) == next &&
              (st.stageIdx == -1 || e.ts.getTime > st.tsMs)) {
              st = FunnelState(next, e.ts.getTime)
              out += FunnelHit(userId, next + 1, steps(next), e.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          val out = scala.collection.mutable.Map.empty[Long, (Long, Double)]
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (st.lastTsMs == Long.MinValue || t >= st.lastTsMs) {
              val seq = if (st.lastTsMs == Long.MinValue || t - st.lastTsMs > gapMs) st.seq + 1 else st.seq
              st = SessionState(t, seq)
              val (n, s) = out.getOrElse(seq, (0L, 0.0))
              out(seq) = (n + 1, s + e.value)
            } // else: late event from a previous batch — dropped (see doc)
          }
          state.update(st)
          out.toSeq.sortBy(_._1).map { case (seq, (n, s)) => Session(userId, seq, n, s) }.iterator
      }
  }

  /** Sessionization via NATIVE `session_window` on a stream — the
    * declarative alternative to [[sessionize]]'s hand-managed
    * `flatMapGroupsWithState`: Spark's merging-session aggregation
    * keeps one state row per OPEN session and the watermark closes and
    * EVICTS sessions whose gap has passed (append-mode emits each
    * session exactly once, finalized — the hand-rolled twin must emit
    * updates and let the consumer reconcile). Same duration = gap
    * boundary contract as the batch [[graft.operators.Events.sessionizeNative]]
    * (inclusive window-close merge ⟺ split at diff > gap), so the
    * StreamingSpec differential compares all three faces. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMinutes * 60} seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
}
