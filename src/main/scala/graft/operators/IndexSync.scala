package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Snapshot-driven index maintenance (q151) — the composition that
  * closes the table-layer ↔ index-family loop: a serving index kept in
  * line with a [[Snapshots]] table of embeddings by consuming the
  * table's own commit history, instead of ad-hoc "remember what I
  * indexed" bookkeeping.
  *
  * The sync rule mirrors what every production indexer converges on:
  *  - an APPEND-only span advances INCREMENTALLY — each new snapshot's
  *    [[Snapshots.deltaOf]] rows assign against the index's FROZEN
  *    centroids ([[Ivf.appendWith]]; the q55 contract), so the cost is
  *    delta-sized and the corpus never re-shuffles;
  *  - any overwrite / compact / delete / rollback in the span forces a
  *    REBUILD — those commits can remove or rewrite rows the postings
  *    reference, and a tombstone-aware patch of a stale index is
  *    exactly the complexity this layer exists to avoid (the rebuild
  *    reads the snapshot's logical content, so merge-on-read deletes
  *    are applied by construction).
  *
  * The index remembers the snapshot it reflects in a `_synced_snapshot`
  * marker (KB-scale driver I/O, the manifest cost class) — re-running
  * sync is an idempotent no-op until the table commits again, which is
  * what makes this safe to run on a schedule. */
object IndexSync {

  private def markerPath(indexPath: String) = new Path(indexPath, "_synced_snapshot")

  /** The snapshot id the index at `indexPath` reflects; 0 if never
    * synced (or the marker was removed — which forces a rebuild, the
    * conservative direction). */
  def syncedSnapshot(spark: SparkSession, indexPath: String): Long = {
    val f = markerPath(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = markerPath(indexPath)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      body.trim.toLong
    }
  }

  private def writeMarker(spark: SparkSession, indexPath: String, id: Long): Unit = {
    val f = markerPath(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(markerPath(indexPath), true)
    try out.write(id.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Bring the IVF index at `indexPath` in line with the snapshot table
    * at `tablePath`. Returns (snapshot now reflected, mode) where mode
    * ∈ noop | append | rebuild. */
  def sync(spark: SparkSession, tablePath: String, indexPath: String,
           step: Int): (Long, String) = {
    val target = Snapshots.latest(spark, tablePath)
    require(target > 0, s"no snapshot to index under $tablePath")
    val from = syncedSnapshot(spark, indexPath)
    if (from == target) return (target, "noop")
    val span = Snapshots.snapshotIds(spark, tablePath)
      .filter(id => id > from && id <= target)
    val appendOnly = from > 0 && span.nonEmpty &&
      span.forall(id => Snapshots.opOf(spark, tablePath, id) == "append")
    if (appendOnly) {
      val cs = Ivf.collectCentroids(Ivf.load(spark, indexPath)._2)
      span.foreach { id =>
        Ivf.appendWith(cs, indexPath,
          Snapshots.deltaOf(spark, tablePath, id))
      }
      writeMarker(spark, indexPath, target)
      (target, "append")
    } else {
      Ivf.save(Snapshots.read(spark, tablePath), step, indexPath)
      writeMarker(spark, indexPath, target)
      (target, "rebuild")
    }
  }

  /** One sync step as a 1-row report frame — the auditable face the
    * q151 lifecycle key rolls up. */
  def syncReport(spark: SparkSession, tablePath: String, indexPath: String,
                 step: Int): DataFrame = {
    import spark.implicits._
    val (id, mode) = sync(spark, tablePath, indexPath, step)
    val (postings, cents) = Ivf.load(spark, indexPath)
    Seq((id, mode, postings.count(), cents.count()))
      .toDF("synced_snapshot", "mode", "n_postings", "n_centroids")
  }

  private def inflightPath(indexPath: String) = new Path(indexPath, "_sync_inflight")

  private def setInflight(spark: SparkSession, indexPath: String): Unit = {
    val p = inflightPath(indexPath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    try out.write("1".getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def clearInflight(spark: SparkSession, indexPath: String): Unit = {
    val p = inflightPath(indexPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  private def isInflight(spark: SparkSession, indexPath: String): Boolean = {
    val p = inflightPath(indexPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Bring the TEXT (BM25/inverted) index at `indexPath` in line with
    * the snapshot table of documents at `tablePath` — [[sync]]'s rule
    * applied to the sparse-retrieval family (q180): append-only spans
    * advance by [[Search.appendTextIndex]] (delta-sized postings into
    * the same bucket layout, stats refolded from exact totals), any
    * other op forces a rebuild over the snapshot's logical content.
    *
    * Crash contract, the part [[Search.appendTextIndex]]'s scaladoc
    * defers here: the postings append and the stats rewrite are two
    * writes. An `_sync_inflight` marker brackets the mutation — set
    * before the first write, cleared after the snapshot marker lands —
    * so a sync that died mid-append leaves the marker behind and the
    * NEXT sync refuses the incremental path and rebuilds (the
    * conservative recovery: duplicated postings can never serve).
    * Re-running after success stays an idempotent noop. */
  def syncText(spark: SparkSession, tablePath: String, indexPath: String,
               nBuckets: Int = 64): (Long, String) = {
    val target = Snapshots.latest(spark, tablePath)
    require(target > 0, s"no snapshot to index under $tablePath")
    val from = syncedSnapshot(spark, indexPath)
    if (from == target && !isInflight(spark, indexPath)) return (target, "noop")
    val span = Snapshots.snapshotIds(spark, tablePath)
      .filter(id => id > from && id <= target)
    val appendOnly = from > 0 && span.nonEmpty && !isInflight(spark, indexPath) &&
      span.forall(id => Snapshots.opOf(spark, tablePath, id) == "append")
    setInflight(spark, indexPath)
    val mode =
      if (appendOnly) {
        span.foreach { id =>
          Search.appendTextIndex(Snapshots.deltaOf(spark, tablePath, id),
            indexPath, nBuckets)
        }
        "append"
      } else {
        Search.saveTextIndex(Snapshots.read(spark, tablePath), indexPath, nBuckets)
        "rebuild"
      }
    writeMarker(spark, indexPath, target)
    clearInflight(spark, indexPath)
    (target, mode)
  }

  /** Bring a perceptual-hash sidecar in line with a snapshot table of
    * MEDIA rows ([[graft.multimodal.Multimodal.MediaRecord]] schema) —
    * [[sync]]'s rule applied to the image-dedup family: the decode is
    * the dominant cost (per-image PNG raster + dHash; 42.7 s at sf1 in
    * the r15 bench, linear in images), so re-deduping after an append
    * must NOT re-decode the corpus. An append-only span featurizes ONLY
    * each snapshot's [[Snapshots.deltaOf]] rows and appends the
    * (doc_id, dhash, width, height, lum_micro) rows
    * ([[graft.multimodal.ImageHash.featurizeImages]]) to
    * `indexPath/hashes`; any other op rebuilds from the snapshot's
    * logical content. The sidecar carries the decoded FEATURE columns
    * beside the hash — clustering reads `dhash`
    * ([[graft.multimodal.ImageHash.dupClustersFromHashes]], banded
    * pairs + CC), luminance-drift or quality passes read `lum_micro` —
    * so every re-run after the sync pays zero decodes, not just the
    * hash-only ones.
    *
    * Crash contract = [[syncText]]'s: `_sync_inflight` brackets the
    * mutation, a died-mid-append sync forces the next run to rebuild
    * (duplicated hash rows would inflate cluster sizes), re-running
    * after success is an idempotent noop. */
  def syncImageHashes(spark: SparkSession, tablePath: String,
                      indexPath: String): (Long, String) = {
    val target = Snapshots.latest(spark, tablePath)
    require(target > 0, s"no snapshot to index under $tablePath")
    val from = syncedSnapshot(spark, indexPath)
    if (from == target && !isInflight(spark, indexPath)) return (target, "noop")
    val span = Snapshots.snapshotIds(spark, tablePath)
      .filter(id => id > from && id <= target)
    val appendOnly = from > 0 && span.nonEmpty && !isInflight(spark, indexPath) &&
      span.forall(id => Snapshots.opOf(spark, tablePath, id) == "append")
    setInflight(spark, indexPath)
    val hashDir = s"$indexPath/hashes"
    val mode =
      if (appendOnly) {
        span.foreach { id =>
          graft.multimodal.ImageHash.featurizeImages(Snapshots.deltaOf(spark, tablePath, id))
            .write.mode("append").parquet(hashDir)
        }
        "append"
      } else {
        graft.multimodal.ImageHash.featurizeImages(Snapshots.read(spark, tablePath))
          .write.mode("overwrite").parquet(hashDir)
        "rebuild"
      }
    writeMarker(spark, indexPath, target)
    clearInflight(spark, indexPath)
    (target, mode)
  }

  /** The persisted (doc_id, dhash, width, height, lum_micro) sidecar
    * [[syncImageHashes]] maintains. */
  def imageHashes(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/hashes")

  /** One image-hash sync step as a 1-row report — the q193 lifecycle
    * currency: which snapshot the sidecar reflects, how it got there,
    * and the corpus/cluster sizes served off it (hash-only work). */
  def imageHashSyncReport(spark: SparkSession, tablePath: String,
                          indexPath: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val (id, mode) = syncImageHashes(spark, tablePath, indexPath)
    val hashes = imageHashes(spark, indexPath)
    val clusters = graft.multimodal.ImageHash.dupClustersFromHashes(hashes, maxHamming)
    val nDup = clusters.agg(count(lit(1)), sum(col("keep"))).head()
    Seq((id, mode, hashes.count(), nDup.getLong(0),
        nDup.getLong(0) - (if (nDup.isNullAt(1)) 0L else nDup.getLong(1))))
      .toDF("synced_snapshot", "mode", "n_hashes", "n_clustered", "n_dropped")
  }

  /** One text-sync step as a 1-row report — the q180 lifecycle
    * currency: which snapshot the index now reflects, how it got
    * there, and the served corpus size (off the exact stats sidecar —
    * KB-scale, no postings scan). */
  def textSyncReport(spark: SparkSession, tablePath: String, indexPath: String,
                     nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val (id, mode) = syncText(spark, tablePath, indexPath, nBuckets)
    val stats = spark.read.parquet(s"$indexPath/stats")
      .select("n_docs", "sum_dl").head()
    Seq((id, mode, stats.getLong(0), stats.getLong(1)))
      .toDF("synced_snapshot", "mode", "n_docs", "sum_dl")
  }
}
