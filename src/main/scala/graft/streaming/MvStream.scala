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
  * the stream (pass the SAME `checkpoint` so the source resumes at the
  * first unfolded batch).
  *
  * EXACTLY-ONCE (r15): foreachBatch is at-least-once on retry
  * boundaries — a task retry or a restart from checkpoint re-delivers
  * a micro-batch, and because the fold is algebraic a second merge
  * would silently double-count it. [[foldBatch]] closes the gap with
  * the idempotent-sink recipe every Spark exactly-once sink uses: the
  * commit that publishes the folded view carries its `batchId` inside
  * the snapshot MANIFEST (one field, atomic with the data by the
  * manifest-rename protocol), and a replayed batch whose id is already
  * committed no-ops. The view table is owned by its stream: out-of-band
  * commits to it (a manual compact) drop the marker and forfeit the
  * replay guard until the next batch commits. */
object MvStream {

  /** Fold ONE micro-batch into the view table; returns true when the
    * batch was applied, false when it was a replay of an
    * already-committed batch (the view is untouched — exactly-once).
    * Public so the replay semantics are directly testable without
    * driving a streaming query through a crafted task failure. */
  def foldBatch(batch: DataFrame, batchId: Long, viewPath: String): Boolean = {
    val spark = batch.sparkSession
    val latest = Snapshots.latest(spark, viewPath)
    val committed =
      if (latest == 0) None else Snapshots.committedBatchId(spark, viewPath)
    if (committed.exists(_ >= batchId)) false
    else {
      val next =
        if (latest == 0) Mv.summarize(batch)
        else Mv.refresh(Snapshots.read(spark, viewPath), batch)
      // The summary is O(groups); localCheckpoint materializes it
      // BEFORE the commit so the new snapshot's write doesn't re-read
      // the view table it is superseding mid-write.
      Snapshots.overwrite(next.localCheckpoint(true), viewPath,
        batchId = Some(batchId))
      true
    }
  }

  /** Maintain the per-source summary view at `viewPath` (a
    * [[Snapshots]] table) over a streaming documents source. Pass a
    * stable `checkpoint` for restartable exactly-once maintenance: the
    * checkpoint pins source offsets ↔ batch ids, the manifest's
    * batchId pins which of those folded — together a crash at ANY
    * point resumes without loss or double-count. */
  def maintain(docs: DataFrame, viewPath: String,
               checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, viewPath): Unit
    }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}
