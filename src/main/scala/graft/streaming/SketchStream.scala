package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{CountMin, ThetaSketch}

/** Streaming theta-sketch audience rollup — the online face of
  * [[graft.operators.Sketches.audienceAlgebra]]'s build leg: per
  * segment, the KMV sketch of distinct members maintained as state and
  * re-emitted (serialized, canonical bytes) whenever it changes. A
  * downstream consumer answers union/intersection/difference questions
  * across segments from the LATEST emitted sketches alone — the set
  * algebra never touches the stream again.
  *
  * Correctness under replay, by construction: `Kmv.add` is idempotent
  * (a hash already retained, or above θ, changes nothing), so
  * at-least-once delivery can never inflate an estimate — the
  * [[ActiveUsersStream]] bitmap argument, carried to the sketch whose
  * state stays O(k) bytes per segment however large the audience
  * grows (the property that lets this stream run forever where the
  * exact bitmap's state grows with distinct users).
  *
  * The spec pins stream == batch BYTES: canonical serialization makes
  * the incremental fold land on the identical sketch the one-shot
  * aggregate builds. */
object SketchStream {

  final case class SegmentSketch(segment: String, n_est: Long, sketch: Array[Byte])
  // public: the state encoder's generated code constructs it reflectively
  final case class SketchState(bytes: Array[Byte])

  /** `rows` is a streaming frame with (segment: String, member id
    * column `id`: Long). Emits (segment, estimate, sketch bytes) on
    * every change (OutputMode.Update). */
  def segmentSketches(rows: DataFrame, k: Int): Dataset[SegmentSketch] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col("segment"), xxhash64(col("id")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SketchState, SegmentSketch](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (segment, it, state: GroupState[SketchState]) =>
          val sk = state.getOption
            .map(s => ThetaSketch.Kmv.deserialize(s.bytes))
            .getOrElse(new ThetaSketch.Kmv(k))
          val before = sk.serialize
          it.foreach { case (_, h) => sk.add(h) }
          val after = sk.serialize
          state.update(SketchState(after))
          if (!java.util.Arrays.equals(before, after))
            Iterator.single(SegmentSketch(
              segment, ThetaSketch.estimateOf(after), after))
          else Iterator.empty
      }
  }

  final case class SegmentCms(segment: String, sketch: Array[Byte])

  /** Streaming Count-Min maintenance — the online face of
    * [[graft.operators.Sketches.cmsTermPanel]]'s build leg: per
    * segment, the d×w frequency grid folded incrementally and
    * re-emitted (serialized) every batch it changes. A monitoring
    * consumer answers "how often has this term occurred so far" from
    * the latest grid alone ([[CountMin.estimateOf]]), no stream
    * replay.
    *
    * Unlike the theta sketch above, CMS addition is NOT idempotent —
    * a replayed row increments its counters again — so this stream's
    * exactly-once story leans on the checkpointed offsets Structured
    * Streaming guarantees for flatMapGroupsWithState, and estimates
    * remain UPPER bounds under any failure mode (over-count, never
    * under: the safe direction for a frequency alarm, same argument
    * direction as the sketch family's one-sided error). State is
    * O(d·w) longs per segment forever.
    *
    * The spec pins stream == batch BYTES: elementwise-add merge makes
    * the incremental fold land on the identical grid the one-shot
    * aggregate builds. */
  def segmentCms(rows: DataFrame, d: Int, w: Int): Dataset[SegmentCms] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col("segment"), col("term"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SketchState, SegmentCms](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (segment, it, state: GroupState[SketchState]) =>
          val sk = state.getOption
            .map(s => CountMin.Cms.deserialize(s.bytes))
            .getOrElse(new CountMin.Cms(d, w))
          var changed = false
          it.foreach { case (_, t) =>
            if (t != null) { sk.add(t, 1L); changed = true }
          }
          val after = sk.serialize
          state.update(SketchState(after))
          if (changed) Iterator.single(SegmentCms(segment, after))
          else Iterator.empty
      }
  }
}
