package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Mv, Snapshots}

/** Continuous materialized-view maintenance — the streaming twin of
  * the batch [[graft.operators.Mv]] refresh (q133), and the layer
  * composition that makes it durable: each micro-batch folds into the
  * view through the SAME algebraic merge, and the updated view lands
  * as a NEW SNAPSHOT of a [[Snapshots]] table. Reading version N and
  * committing N+1 sidesteps the read-overwrite conflict a plain
  * parquet view hits (you cannot overwrite the files you are reading),
  * keeps every historical view state time-travelable ("what did the
  * dashboard say before batch 17?"), and makes the maintenance
  * crash-safe for free — a batch that dies before its manifest rename
  * leaves the previous view intact and [[Snapshots.vacuum]] reclaims
  * the orphan.
  *
  * State is the O(groups) summary table itself — no Spark state store,
  * so the query restarts from the persisted view rather than replaying
  * the stream. Exactly-once note: foreachBatch is at-least-once on
  * retry boundaries; a production deployment records the committed
  * batchId inside the manifest and skips replays (one line in
  * [[Snapshots.commit]]'s JSON) — elided here to keep the key's
  * surface the MERGE, which is the load-bearing part. */
object MvStream {

  /** Maintain the per-source summary view at `viewPath` (a
    * [[Snapshots]] table) over a streaming documents source. */
  def maintain(docs: DataFrame, viewPath: String): StreamingQuery =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val next =
        if (Snapshots.latest(spark, viewPath) == 0) Mv.summarize(batch)
        else Mv.refresh(Snapshots.read(spark, viewPath), batch)
      // The summary is O(groups); localCheckpoint materializes it
      // BEFORE the commit so the new snapshot's write doesn't re-read
      // the view table it is superseding mid-write.
      Snapshots.overwrite(next.localCheckpoint(true), viewPath): Unit
    }.start()
}
