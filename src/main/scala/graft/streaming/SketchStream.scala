package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ThetaSketch

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
}
