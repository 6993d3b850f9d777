package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming φ-heavy hitters — the continuous twin of
  * [[graft.operators.Analytics.heavyHitters]] via sharded Misra-Gries:
  * the term stream shards by term hash, each shard's state holds at
  * most `k` counters (decrement-all on overflow — the MG invariant),
  * and each micro-batch emits the shard's CURRENT summary. The batch
  * operator's merge argument applies verbatim: any term with true
  * frequency > N/k within its shard survives in that shard's
  * counters, so the union of shard summaries is a superset of the
  * stream's heavy set — confirm candidates with one exact counting
  * pass (or accept MG's overcount bound), exactly the batch
  * sketch-then-confirm discipline.
  *
  * State contract: O(k) PER SHARD — `numShards × k` counters total,
  * independent of stream length or vocabulary size (the whole point:
  * exact streaming term counts are unbounded state). Sharding by term
  * hash means a term's counts never split across shards, which is
  * what keeps the per-shard MG guarantee meaningful. No watermark
  * needed: the state is bounded by construction, not by eviction
  * (processing-time semantics — the summary covers the whole stream
  * so far, like any one-pass sketch).
  */
object HeavyHittersStream {

  final case class ShardSummary(shard: Int, term: String, count: Long)
  // public: the state encoder's generated code constructs it reflectively
  final case class MgState(terms: Array[String], counts: Array[Long])

  /** `docs` is a streaming frame with a `text` column. Emits each
    * shard's MG summary per micro-batch (OutputMode.Update — later
    * batches re-emit updated counters for the same (shard, term)). */
  def heavyHitters(docs: DataFrame, k: Int, numShards: Int): Dataset[ShardSummary] = {
    require(k >= 1 && numShards >= 1, s"need k >= 1, shards >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .select(
        pmod(graft.operators.Dedup.hash60(col("term")), lit(numShards.toLong))
          .cast("int").as("shard"),
        col("term"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, ShardSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (shard, it, state: GroupState[MgState]) =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach { s =>
            s.terms.zip(s.counts).foreach { case (t, c) => counters(t) = c }
          }
          it.foreach { case (_, t) =>
            if (counters.contains(t)) counters(t) += 1L
            else if (counters.size < k) counters(t) = 1L
            else {
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              counters.keysIterator.foreach { key =>
                counters(key) -= 1L
                if (counters(key) == 0L) dead += key
              }
              dead.foreach(counters.remove)
            }
          }
          val snap = counters.toArray.sortBy { case (t, c) => (-c, t) }
          state.update(MgState(snap.map(_._1), snap.map(_._2)))
          snap.iterator.map { case (t, c) => ShardSummary(shard, t, c) }
      }
  }
}
