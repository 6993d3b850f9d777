package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt smoothing — the ONLINE face of
  * [[graft.operators.Events.holtForecast]]: the batch operator refits
  * the whole hourly series; this one carries the (level, trend) pair
  * as per-type state and folds each hour as it CLOSES, emitting the
  * refreshed one-step forecast — the live capacity dial a serving
  * dashboard reads. Exponential smoothing is the canonical
  * streaming-native forecaster (O(1) state, no window replay), which
  * is exactly why the batch fold was built on integer micro-units:
  * the SAME recurrence runs here and StreamingSpec pins stream ≡
  * batch bit-for-bit.
  *
  * Hour closure is [[ChangepointStream]]'s contract verbatim: a
  * state's OPEN set keeps the latest `graceHours` distinct hours
  * (late events within grace still count), older hours close in
  * ascending order, matching the batch operator's observed-hours
  * series. `graceHours = 0` closes every buffered hour at each
  * micro-batch end and therefore requires hour-aligned arrival (an
  * hour split across micro-batches would fold twice); the default 1
  * tolerates within-hour splits.
  *
  * State: 4 longs + the open-hour buffer per event type — bounded by
  * `graceHours`, independent of stream length. Exactness: the fold is
  * [[graft.operators.Events.holtForecast]]'s integer recurrence
  * (truncating division, micro-units) — replaying the same closed-hour
  * sequence reproduces the same state bit-for-bit. */
object HoltStream {

  final case class Forecast(event_type: String, hour: String, n_hours: Long,
                            level_micro: Long, trend_micro: Long, f1_micro: Long)
  // public: the state encoder's generated code constructs it reflectively
  final case class HoltState(t: Long, l: Long, b: Long, x1: Long,
                             openHours: Array[String], openCounts: Array[Long])

  /** `events` is a streaming frame with (event_type, ts). Emits one
    * [[Forecast]] row per CLOSED hour (OutputMode.Update) carrying the
    * state after folding that hour. */
  def forecast(events: DataFrame, alphaNum: Int, betaNum: Int, den: Int,
               graceHours: Int = 1): Dataset[Forecast] = {
    require(alphaNum > 0 && betaNum > 0 && den > 0 &&
      alphaNum <= den && betaNum <= den, "smoothing rationals must be in (0, 1]")
    require(graceHours >= 0)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltState, Forecast](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (etype, it, state: GroupState[HoltState]) =>
          val s0 = state.getOption.getOrElse(
            HoltState(0L, 0L, 0L, 0L, Array.empty, Array.empty))
          val open = scala.collection.mutable.TreeMap.empty[String, Long]
          s0.openHours.zip(s0.openCounts).foreach { case (h, c) => open(h) = c }
          it.foreach { case (_, h) => open(h) = open.getOrElse(h, 0L) + 1L }
          var (t, l, b, x1) = (s0.t, s0.l, s0.b, s0.x1)
          val out = scala.collection.mutable.ArrayBuffer.empty[Forecast]
          while (open.size > graceHours) {
            val (h, x) = open.head
            open.remove(h)
            if (t == 0L) { t = 1L; l = x * 1000000L; b = 0L; x1 = x }
            else {
              // the batch fold verbatim (Events.holtForecast)
              val bEff = if (t == 1L) (x - x1) * 1000000L else b
              val lNew = (alphaNum * x * 1000000L + (den - alphaNum) * (l + bEff)) / den
              b = (betaNum * (lNew - l) + (den - betaNum) * bEff) / den
              l = lNew
              t += 1L
            }
            out += Forecast(etype, h, t, l, b, l + b)
          }
          state.update(HoltState(t, l, b, x1, open.keys.toArray, open.values.toArray))
          out.iterator
      }
  }
}
