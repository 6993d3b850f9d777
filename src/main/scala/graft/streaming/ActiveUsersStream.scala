package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Bitmap

/** Streaming DAU — the online face of
  * [[graft.operators.Events.activeUsers]]'s day leg: per calendar day,
  * the EXACT distinct-user count maintained as one
  * [[Bitmap.ChunkedBitmap]] of state and re-emitted whenever the day's
  * count changes — the live headline number, exact (not HLL), without
  * rescanning the day's history per micro-batch.
  *
  * This is the state shape the bitmap family was built for: the
  * ChunkedBitmap's `add` is idempotent, so REPLAYED events can never
  * inflate the count — the one streaming-correctness property a plain
  * `count` accumulator lacks, and the reason the exactly-once caveat
  * other counters need does not arise here at all. Late events within
  * the retained window fold correctly by the same idempotence.
  *
  * State: one serialized bitmap per ACTIVE day key — O(users/8) bytes
  * worst case; days stop receiving events and their state goes cold
  * (a production deployment sets a state TTL at the lateness horizon —
  * here the contract is documented rather than defaulted, keeping the
  * operator deterministic for the spec differential). The rolling
  * WAU/MAU faces stay batch-side ([[graft.operators.Events
  * .activeUsers]]): a 7/30-day OR is a rollup over persisted day
  * bitmaps, not per-event state. */
object ActiveUsersStream {

  final case class DayCount(day: String, dau: Long)
  // public: the state encoder's generated code constructs it reflectively
  final case class DayState(bitmap: Array[Byte])

  /** `events` is a streaming frame with (ts, user_id). Emits (day, dau)
    * whenever a day's exact count changes (OutputMode.Update). */
  def dau(events: DataFrame): Dataset[DayCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DayState, DayCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (day, it, state: GroupState[DayState]) =>
          val bm = state.getOption
            .map(s => Bitmap.ChunkedBitmap.deserialize(s.bitmap))
            .getOrElse(new Bitmap.ChunkedBitmap())
          val before = bm.cardinality
          it.foreach { case (_, u) => bm.add(u) }
          val after = bm.cardinality
          state.update(DayState(bm.serialize))
          if (after != before) Iterator.single(DayCount(day, after))
          else Iterator.empty
      }
  }
}
