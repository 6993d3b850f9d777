package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.{IndexSync, Ivf, Knn, Snapshots}

/** Snapshot-driven index maintenance: the append-only fast path equals
  * save+append against the same frozen centroids (the q55 contract),
  * structure-changing commits force rebuilds, and re-sync is a no-op. */
class IndexSyncSpec extends SparkSpec {

  private def fresh(tag: String): (String, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_idxsyncspec_$tag"
    val p = new Path(base)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    (s"$base/table", s"$base/index")
  }

  private lazy val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
  private val step = SparkEntry.Params.IvfStep

  test("append-only history advances incrementally and serves bit-identically " +
    "to a hand-built save+append index; re-sync is a noop") {
    val (tPath, iPath) = fresh("appendonly")
    val cut = emb.agg(max("vec_id")).head().getLong(0) / 2
    Snapshots.overwrite(emb.where(col("vec_id") <= cut), tPath)
    val (id1, m1) = IndexSync.sync(spark, tPath, iPath, step)
    assert((id1, m1) == (1L, "rebuild"))
    Snapshots.append(emb.where(col("vec_id") > cut), tPath)
    val (id2, m2) = IndexSync.sync(spark, tPath, iPath, step)
    assert((id2, m2) == (2L, "append"), s"got ($id2, $m2)")
    assert(IndexSync.sync(spark, tPath, iPath, step) == ((2L, "noop")))
    // differential: the synced index == save(v1) + appendWith(delta)
    val (refT, refI) = fresh("appendref")
    Ivf.save(emb.where(col("vec_id") <= cut), step, refI)
    Ivf.append(spark, refI, emb.where(col("vec_id") > cut))
    val q = Knn.queryVector(emb, 0L)
    val (sp, sc) = Ivf.load(spark, iPath)
    val (rp, rc) = Ivf.load(spark, refI)
    val got = Ivf.search(sp, sc, q, 4, 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Ivf.search(rp, rc, q, 4, 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, "synced index diverged from the hand-built twin")
    // and the postings COVER the whole table (no row lost in the advance)
    assert(sp.count() == emb.count())
  }

  test("a compact (or any non-append commit) in the span forces a rebuild " +
    "whose postings reflect the snapshot's logical content") {
    val (tPath, iPath) = fresh("rebuild")
    Snapshots.overwrite(emb, tPath)
    IndexSync.sync(spark, tPath, iPath, step)
    // delete a slice merge-on-read, then compact; sync must rebuild and
    // the tombstoned rows must be GONE from the postings
    Snapshots.deleteWhere(spark, tPath, col("vec_id") < 10L, "vec_id")
    val (id, mode) = IndexSync.sync(spark, tPath, iPath, step)
    assert(mode == "rebuild", s"delete in span must rebuild, got $mode")
    val (postings, _) = Ivf.load(spark, iPath)
    assert(postings.where(col("vec_id") < 10L).count() == 0L,
      "rebuilt index still carries tombstoned rows")
    assert(postings.count() == emb.where(col("vec_id") >= 10L).count())
  }

  test("a missing marker (never-synced index path) rebuilds rather than " +
    "trusting stale postings") {
    val (tPath, iPath) = fresh("marker")
    Snapshots.overwrite(emb, tPath)
    Snapshots.append(emb.limit(0), tPath) // an append the index never saw
    val (_, mode) = IndexSync.sync(spark, tPath, iPath, step)
    assert(mode == "rebuild")
  }

  private lazy val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
  private val terms = SparkEntry.Params.Bm25Terms

  private def served(iPath: String) =
    graft.operators.Search.searchTextIndex(spark, iPath, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

  test("text index sync: append advances serve bit-identically to a fresh " +
    "build; noop is idempotent; a delete commit rebuilds the postings") {
    val (tPath, iPath) = fresh("text")
    val cut = docs.agg(max("doc_id")).head().getLong(0) / 2
    Snapshots.overwrite(docs.where(col("doc_id") <= cut), tPath)
    assert(IndexSync.syncText(spark, tPath, iPath) == ((1L, "rebuild")))
    Snapshots.append(docs.where(col("doc_id") > cut), tPath)
    assert(IndexSync.syncText(spark, tPath, iPath) == ((2L, "append")))
    assert(IndexSync.syncText(spark, tPath, iPath) == ((2L, "noop")))
    // served BM25 off the appended index == a fresh one-shot build
    val (_, refI) = fresh("textref")
    graft.operators.Search.saveTextIndex(docs, refI)
    assert(served(iPath) === served(refI),
      "appended text index serves differently from a fresh build")
    // stats refolded exactly (not drifted): same sidecar values
    val a = spark.read.parquet(s"$iPath/stats").head()
    val b = spark.read.parquet(s"$refI/stats").head()
    assert(a === b, s"stats diverged: $a vs $b")
    // a delete commit forces a rebuild and the tombstoned docs leave
    Snapshots.deleteWhere(spark, tPath, col("doc_id") <= cut, "doc_id")
    assert(IndexSync.syncText(spark, tPath, iPath)._2 == "rebuild")
    val postDocs = spark.read.parquet(s"$iPath/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(postDocs.forall(_ > cut), "rebuilt postings still carry deleted docs")
  }

  test("text index sync: a stranded inflight marker forces rebuild instead " +
    "of double-appending") {
    val (tPath, iPath) = fresh("textinflight")
    val cut = docs.agg(max("doc_id")).head().getLong(0) / 2
    Snapshots.overwrite(docs.where(col("doc_id") <= cut), tPath)
    IndexSync.syncText(spark, tPath, iPath)
    // simulate a crash mid-append: marker set, postings half-written
    val p = new Path(iPath, "_sync_inflight")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true); out.write('1'); out.close()
    Snapshots.append(docs.where(col("doc_id") > cut), tPath)
    val (_, mode) = IndexSync.syncText(spark, tPath, iPath)
    assert(mode == "rebuild", s"inflight marker must force rebuild, got $mode")
    assert(!f.exists(p), "inflight marker must clear after a successful sync")
    // and the rebuilt index serves exactly the fresh-build answer
    val (_, refI) = fresh("textinflightref")
    graft.operators.Search.saveTextIndex(docs, refI)
    assert(served(iPath) === served(refI))
  }

  test("image-hash sync: the append path decodes ONLY the delta (proved by " +
    "deleting the base snapshot's bytes), clusters are bit-identical to a " +
    "full decode, and non-append commits rebuild") {
    import graft.multimodal.{ImageHash, Multimodal}
    val (tPath, iPath) = fresh("imghash")
    val media = Multimodal.toMediaTable(docs.limit(24))
    val imgs = media.where(col("format") === "png").orderBy("doc_id").limit(6)
    // renditions under shifted ids — the delta that must collide with
    // its originals after the hash-only re-cluster
    val copies = imgs.withColumn("doc_id", col("doc_id") + lit(1000000L))
    Snapshots.overwrite(media, tPath)                          // v1
    val (id1, m1) = IndexSync.syncImageHashes(spark, tPath, iPath)
    assert((id1, m1) == ((1L, "rebuild")))
    Snapshots.append(copies, tPath)                            // v2
    // DELTA-ONLY PROOF: physically remove v1's data files. deltaOf
    // reads only the appended dir, so an append-path sync succeeds; any
    // full re-decode would crash on the missing base bytes.
    val dataDir = new Path(tPath, "data/s1")
    val f = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(dataDir))
    f.delete(dataDir, true)
    val (id2, m2) = IndexSync.syncImageHashes(spark, tPath, iPath)
    assert((id2, m2) == ((2L, "append")), s"got ($id2, $m2)")
    assert(IndexSync.syncImageHashes(spark, tPath, iPath) == ((2L, "noop")))
    // bit-identical to a full decode of the same logical content
    val synced = ImageHash.dupClustersFromHashes(
      IndexSync.imageHashes(spark, iPath)).collect().toSeq
    val full = ImageHash.imageDupClusters(
      media.unionByName(copies)).collect().toSeq
    assert(synced === full, "hash-sidecar clusters drifted from full decode")
    assert(synced.nonEmpty, "rendition copies must cluster with their originals")
    // sidecar ≡ fresh decode, FEATURE columns included: the appended
    // rows (hashed off the delta alone) must carry the same dhash,
    // dims, and luminance grid a cold featurize of the same logical
    // content computes
    def featKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getSeq[Long](4).toList)
    val sidecarFeats = IndexSync.imageHashes(spark, iPath)
      .select("doc_id", "dhash", "width", "height", "lum_micro")
      .collect().map(featKey).toSet
    val freshFeats = ImageHash.featurizeImages(media.unionByName(copies))
      .collect().map(featKey).toSet
    assert(sidecarFeats === freshFeats,
      "sidecar feature columns drifted from a fresh decode")
    // a non-append commit forces the rebuild path (fresh table — the
    // mutilated one above can't serve a full read)
    val (tPath2, iPath2) = fresh("imghash2")
    Snapshots.overwrite(media, tPath2)
    IndexSync.syncImageHashes(spark, tPath2, iPath2)
    Snapshots.deleteWhere(spark, tPath2, col("doc_id") <= 5L, "doc_id")
    val (_, m3) = IndexSync.syncImageHashes(spark, tPath2, iPath2)
    assert(m3 == "rebuild")
    assert(IndexSync.imageHashes(spark, iPath2)
      .where(col("doc_id") <= 5L).count() == 0L,
      "rebuilt sidecar still carries deleted docs")
  }
}
