package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detector — the ONLINE (sequential) face of
  * [[graft.operators.Events.changepoint]]: the batch operator answers
  * "where did the level shift?" after the fact; this one runs Page's
  * 1954 sequential recurrence per event type and raises the alarm AS
  * the shift happens:
  *
  *   S⁺ ← max(0, S⁺ + x − μ₀ − κ)      alarm "up"   when S⁺ > H
  *   S⁻ ← min(0, S⁻ + x − μ₀ + κ)      alarm "down" when S⁻ < −H
  *
  * with μ₀ the reference mean learned from the first `refHours` closed
  * hours, κ the allowance and H the decision threshold (both in
  * events/hour). After an alarm the statistic resets — the standard
  * restart so a sustained shift raises one alarm, not one per hour.
  *
  * Determinism discipline (the q165 convention): μ₀ = refSum/refN is
  * never materialized as a float — the recurrence runs SCALED BY refN
  * (S·refN, all exact integers), and the alarm test compares against
  * refN·H. The emitted statistic is one division at alarm time. Replay
  * of the same closed-hour sequence reproduces the same alarms
  * bit-for-bit.
  *
  * Hour closure: events bucket into hour strings; a state's OPEN set
  * keeps the latest `graceHours` distinct hours (late events within
  * grace still count), and older hours CLOSE in ascending order —
  * matching the batch operator's observed-hours series (gaps carry no
  * rows there either). Hours still open when a micro-batch ends wait
  * for the next one.
  *
  * State contract: O(graceHours + 5 scalars) per event type — bounded
  * by construction, independent of stream length. Keying by event type
  * means a type's hourly counts never split across state rows.
  */
object ChangepointStream {

  final case class Alarm(event_type: String, hour: String, direction: String,
                         statistic: Double, mean_ref: Double)
  // public: the state encoder's generated code constructs it reflectively
  final case class CpState(refSum: Long, refN: Long, sPos: Long, sNeg: Long,
                           openHours: Array[String], openCounts: Array[Long])

  /** `events` is a streaming frame with (event_type, ts). Emits one
    * [[Alarm]] row per threshold crossing (OutputMode.Update). */
  def detect(events: DataFrame, refHours: Int, kappa: Long, hThreshold: Long,
             graceHours: Int = 1): Dataset[Alarm] = {
    require(refHours >= 1 && kappa >= 0 && hThreshold > 0 && graceHours >= 0)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CpState, Alarm](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (etype, it, state: GroupState[CpState]) =>
          val s0 = state.getOption.getOrElse(
            CpState(0L, 0L, 0L, 0L, Array.empty, Array.empty))
          val open = scala.collection.mutable.TreeMap.empty[String, Long]
          s0.openHours.zip(s0.openCounts).foreach { case (h, c) => open(h) = c }
          it.foreach { case (_, h) => open(h) = open.getOrElse(h, 0L) + 1L }
          var (refSum, refN, sPos, sNeg) = (s0.refSum, s0.refN, s0.sPos, s0.sNeg)
          val alarms = scala.collection.mutable.ArrayBuffer.empty[Alarm]
          // close everything but the latest graceHours hours, ascending
          while (open.size > graceHours) {
            val (h, c) = open.head
            open.remove(h)
            if (refN < refHours) { refSum += c; refN += 1 }
            else {
              // scaled recurrence: every term exact-integer
              sPos = math.max(0L, sPos + refN * c - refSum - refN * kappa)
              sNeg = math.min(0L, sNeg + refN * c - refSum + refN * kappa)
              if (sPos > refN * hThreshold) {
                alarms += Alarm(etype, h, "up",
                  sPos.toDouble / refN, refSum.toDouble / refN)
                sPos = 0L
              }
              if (sNeg < -refN * hThreshold) {
                alarms += Alarm(etype, h, "down",
                  sNeg.toDouble / refN, refSum.toDouble / refN)
                sNeg = 0L
              }
            }
          }
          state.update(CpState(refSum, refN, sPos, sNeg,
            open.keys.toArray, open.values.toArray))
          alarms.iterator
      }
  }
}
