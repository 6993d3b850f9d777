package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the online face of
  * [[graft.operators.Events.funnel]]: per user, the earliest strictly-
  * ordered completion chain (first `steps(0)`, then `steps(1)` after
  * it, …) maintained as O(|steps|) state, emitting a STAGE-COMPLETION
  * LOG row the moment a user first reaches each stage — the signal a
  * live conversion dashboard folds into counts, without ever rescanning
  * history.
  *
  * Exactness contract: under per-user EVENT-TIME-ORDERED arrival
  * (micro-batches sliced on time, the file-replay shape — within a
  * batch the buffer sorts by (ts, event_id) itself), the greedy
  * frontier update is provably the batch semantics: processing in time
  * order, frontier s−1 holds its final (earliest) value before any
  * stage-s candidate arrives, so "first qualifying event wins" IS the
  * earliest chain — StreamingSpec pins completions ≡ batch frontiers
  * bit-for-bit, counts included. Out-of-order arrival ACROSS batches
  * degrades explicitly: an event older than an already-set frontier
  * cannot retro-improve it (that would need per-stage event history,
  * unbounded state — the documented trade every streaming funnel
  * makes). Ties follow the batch rule: strictly-greater timestamps
  * only.
  *
  * State: one Long per stage per user — bounded by the funnel length,
  * independent of stream length. */
object FunnelStream {

  final case class StageCompletion(user_id: Long, stage_idx: Int, stage: String,
                                   ts_us: Long)
  // public: the state encoder's generated code constructs it reflectively
  final case class FunnelState(frontiers: Array[Long])

  private val Unset = Long.MinValue

  /** `events` is a streaming frame with (user_id, event_type, ts,
    * event_id). Emits one [[StageCompletion]] per (user, stage) first
    * completion (OutputMode.Update — each row appears exactly once). */
  def completions(events: DataFrame, steps: Seq[String]): Dataset[StageCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stageOf = steps.zipWithIndex.toMap
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id").cast("long"))
      .where(col("event_type").isin(steps: _*))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StageCompletion](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[FunnelState]) =>
          val f = state.getOption.map(_.frontiers)
            .getOrElse(Array.fill(steps.length)(Unset))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageCompletion]
          // within-batch order: (ts, event_id) — the batch tie discipline
          it.toArray.sortBy(e => (e._3, e._4)).foreach { case (_, tpe, ts, _) =>
            val s = stageOf(tpe)
            val prevOk = s == 0 || (f(s - 1) != Unset && ts > f(s - 1))
            if (f(s) == Unset && prevOk) {
              f(s) = ts
              out += StageCompletion(user, s + 1, steps(s), ts)
            }
          }
          state.update(FunnelState(f))
          out.iterator
      }
  }
}
