package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted reservoir — the continuous twin of
  * [[graft.operators.Sampling.weightedReservoir]], and the reason the
  * A-ES formulation earns its place next to PPS in the sampling
  * family: the exponential-keys rule needs NO global weight total, so
  * a reservoir can FOLD NEW ROWS FOREVER — each group's state is just
  * its current top-k keys, and a row either displaces the k-th key or
  * vanishes. PPS would have to re-cumsum the whole history on every
  * batch.
  *
  * Convergence contract (StreamingSpec-pinned): the ranking key is the
  * SAME pure function of the row as the batch face
  * ([[graft.operators.Sampling.aesKey]] — LCG on doc_id, round-6
  * ln(u)/w, doc_id tie-break), and top-k of a set is insensitive to
  * arrival order and batching, so after any partitioning of the same
  * rows into micro-batches the final state equals the batch operator's
  * output bit for bit. Re-delivery is idempotent by construction:
  * insertion keys on doc_id, so a replayed row merges into the slot it
  * already owns instead of occupying a second one.
  *
  * State contract: O(k) per source — ids, weights, and keys of the
  * current reservoir, independent of stream length. No watermark: like
  * the Misra-Gries twin, state is bounded by construction, and the
  * reservoir summarizes the whole stream so far. Emission is
  * OutputMode.Update — each micro-batch re-emits the current reservoir
  * of every source it touched.
  */
object ReservoirStream {

  final case class ReservoirRow(source: String, doc_id: Long, n_chars: Long)
  // public: the state encoder's generated code constructs it reflectively
  final case class ReservoirState(ids: Array[Long], chars: Array[Long],
                                  keys: Array[Double])

  /** `docs` is a streaming frame with (doc_id, source, n_chars).
    * Emits each touched source's current reservoir per micro-batch. */
  def weightedReservoir(docs: DataFrame, k: Int,
                        seed: Long = 2026L): Dataset[ReservoirRow] = {
    require(k > 0, s"sample size must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.operators.Sampling.aesKey(seed).as("skey"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ReservoirState, ReservoirRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (source, it, state: GroupState[ReservoirState]) =>
          // doc_id-keyed merge: replays land in their existing slot
          val pool = scala.collection.mutable.HashMap.empty[Long, (Long, Double)]
          state.getOption.foreach { s =>
            var i = 0
            while (i < s.ids.length) {
              pool(s.ids(i)) = (s.chars(i), s.keys(i)); i += 1
            }
          }
          it.foreach { case (_, id, w, key) => pool(id) = (w, key) }
          val top = pool.toArray
            .map { case (id, (w, key)) => (id, w, key) }
            .sortBy { case (id, _, key) => (-key, id) }
            .take(k)
          state.update(ReservoirState(top.map(_._1), top.map(_._2),
            top.map(_._3)))
          top.iterator.map { case (id, w, _) => ReservoirRow(source, id, w) }
      }
  }
}
