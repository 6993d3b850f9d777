package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.VectorFunctions.dot
import graft.plans.GroupedTopK

/** Streaming KNN serving: answer a stream of query vectors against a
  * static corpus, micro-batch at a time.
  *
  * Per-query top-k needs a rank, which Structured Streaming forbids
  * over an unbounded stream — `foreachBatch` is the supported shape:
  * each micro-batch is a normal DataFrame, so the exact batch KNN plan
  * (query rows broadcast, codegen'd `vector_dot` scores, per-query
  * top-k through the same GroupedTopK partial/final heaps as the
  * batched path, Ivf.searchBatch) runs unchanged per batch against the
  * static corpus. This is the Spark-native answer to "online ANN
  * serving": micro-batched exact (or IVF-probed) search, not a
  * resident point-query index.
  */
object KnnServe {

  /** Start serving `queries` (streaming frame with `query_id`, `qv`)
    * against `corpus` (static frame with `vec_id`, `embedding`).
    * `sink` receives the (query_id, vec_id, score) top-k rows of each
    * micro-batch. */
  def serve(queries: DataFrame, corpus: DataFrame, k: Int)
           (sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val scored = corpus
          .crossJoin(broadcast(batch.select(col("query_id"), col("qv"))))
          .select(col("query_id"), col("vec_id"),
            round(dot(col("embedding"), col("qv")), 6).as("score"))
        // Heap-only per-query top-k — no per-partition sort, no rank
        // column; one code path with the batched search (Ivf.scala).
        sink(GroupedTopK.topK(scored, Seq(col("query_id")),
          Seq(col("score").desc, col("vec_id").asc), k))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** IVF-probed serving against a PERSISTED index (graft.operators.Ivf
    * layout): each micro-batch of query vectors runs the batched ANN
    * plan — per-query probe of nprobe centroids, postings join touches
    * only probed cells, GroupedTopK heaps — so serving cost per batch
    * is nprobe/k of the exact scan. The static frames are planned once
    * per batch against the same partition-pruned layout the offline
    * search uses. */
  def serveIvf(queries: DataFrame, postings: DataFrame, cents: DataFrame,
               nprobe: Int, k: Int)(sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Ivf.searchBatch(
          postings, cents, batch.select(col("query_id"), col("qv")), nprobe, k))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
