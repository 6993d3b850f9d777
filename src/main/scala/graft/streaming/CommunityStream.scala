package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming community maintenance — the serving twin of
  * [[graft.operators.Graph.labelPropagation]] (q218's LPA stage), the
  * same batch-fixes/stream-attaches split as [[IndexIngest]]: batch
  * LPA computes the partition over the persisted mutual-kNN edge frame
  * (global rounds, shuffle-heavy, re-run per corpus snapshot); edges
  * then ARRIVE (new near-dup pairs from the crawl's LSH pass, fresh
  * mutual-kNN links from [[IndexIngest]]-ingested vectors) and each
  * micro-batch attaches the NEW vertices to existing communities by
  * one neighbor-majority vote — the standard incremental-LPA serve,
  * no global round re-run.
  *
  * Vote semantics are [[graft.operators.Graph.lpaRound]]'s exactly
  * (count desc, label asc; deterministic for any orderable id), so a
  * vertex the stream attaches gets the SAME label one fresh sync
  * round over the union graph would give it when all its neighbors
  * are already settled — StreamingSpec pins that equivalence on
  * planted cliques. Vertices with NO labeled neighbor in the batch
  * are held back (they re-vote in a later batch once a neighbor
  * lands) rather than seeded as singletons — seeding is the batch
  * pass's job.
  *
  * Scale shape per trigger: one equi-join of the batch's edges onto
  * the label store (batch-sized, broadcast-able), one (vertex, label)
  * count + argmax, one anti-join against the store, one append —
  * delta-sized throughout; the store is never rewritten. Drift is
  * answered like IVF centroid drift (q63's dial): re-run batch LPA on
  * cadence, not per edge. Append-only + AvailableNow: a replayed
  * batch re-votes to the same labels but double-appends rows — pass a
  * durable checkpoint for anything beyond a one-shot attach, same
  * contract as [[IndexIngest.ingest]].
  */
object CommunityStream {

  /** One micro-batch attach step (exposed for direct batch use and
    * the spec's equivalence pin): vertices touched by `edges` that
    * are NOT in `labels` (columns `v`, `label`) vote over their
    * labeled neighbors; returns (v, label) rows for newly attached
    * vertices only. */
  def attachStep(edges: DataFrame, labels: DataFrame): DataFrame = {
    // Vote over the DISTINCT store: duplicate (v, label) rows — e.g.
    // left by a checkpoint-less replay that appended twice — must not
    // double-count a neighbor's vote and flip a later majority.
    val lab = labels.select(col("v"), col("label")).distinct()
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val votes = und
      .join(lab, col("dst") === col("v"))
      .groupBy(col("src"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("src"))
      .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
      .select(col("src").as("v"), col("m.l").as("label"))
    votes.join(lab.select(col("v")), Seq("v"), "left_anti")
  }

  /** Start attaching streaming `edges` (columns `src`, `dst`) to the
    * label store at `labelsPath` (parquet (v, label), seeded by a
    * batch [[graft.operators.Graph.labelPropagation]] run). Processes
    * all available data then terminates (AvailableNow) — swap the
    * trigger for continuous attach in production.
    *
    * Idempotence: each batch re-reads the store and [[attachStep]]
    * anti-joins its votes against it, so a replayed batch whose prior
    * append committed attaches nothing new; the vote pass itself
    * dedupes the store, so even duplicate rows left by a crashed
    * append cannot double-count votes. ALWAYS pass a durable
    * `checkpoint` for anything beyond a one-shot attach (the same
    * contract as [[IndexIngest.ingest]]), and never run two attach
    * queries against the same store concurrently — the read-vote-append
    * cycle is per-query, not a cross-process transaction. */
  def attach(edges: DataFrame, labelsPath: String,
             checkpoint: Option[String] = None): StreamingQuery = {
    val writer = edges.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val labels = batch.sparkSession.read.parquet(labelsPath)
        attachStep(batch, labels)
          .write.mode("append").parquet(labelsPath)
      }
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.start()
  }
}
