package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Snapshot / time-travel table layer — the commit protocol face of a
  * table format (Iceberg/Delta distilled to its load-bearing core).
  * At 100 TB a corpus cannot be rewritten per day: ingest lands as
  * APPEND commits, corrections as copy-on-write OVERWRITE commits
  * ([[Merge.upsert]] produces the rows), and every historical snapshot
  * stays readable until expired — reproducibility of a training run
  * REQUIRES pinning the exact snapshot it read ("trained on v12"), not
  * "whatever the directory held that day".
  *
  * Design (Iceberg's two load-bearing ideas, nothing else):
  *  - Each commit's data is an immutable directory (`data/s<id>/`);
  *    nothing ever rewrites another commit's files.
  *  - Each manifest `meta/v<id>.json` lists the COMPLETE directory set
  *    of its snapshot (full-state manifests, not a delta log) — a read
  *    is one tiny manifest fetch + a parquet scan of the listed dirs;
  *    no log replay, no O(history) planning cost.
  *
  * Commit atomicity: the manifest is written to a temp name and
  * RENAMEd into place — on HDFS-like stores rename is atomic, so a
  * reader sees either the old table or the new one, never a torn
  * manifest; a crash between data-write and rename leaves orphan data
  * dirs that [[vacuum]] reclaims (the unreferenced-files sweep every
  * format runs) and that id allocation steps past (ids derive from
  * manifests AND data dirs, so an orphan never wedges the next
  * commit). Readers never lock: snapshots are immutable, and
  * [[vacuum]] only deletes dirs no surviving manifest references.
  *
  * The driver-side work per commit is one ≤ KB-scale manifest write —
  * the same bounded class as [[Pq.distTables]]; all data movement is
  * executor-side parquet I/O.
  */
object Snapshots {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaDir(path: String) = new Path(path, "meta")

  /** All committed snapshot ids, ascending. Not assumed dense: an
    * orphan-skipping id allocation (see [[nextId]]) can leave gaps
    * after a crashed commit, so every history walk enumerates what
    * exists instead of counting 1..latest. */
  def snapshotIds(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val md = metaDir(path)
    if (!f.exists(md)) Seq.empty
    else
      f.listStatus(md).map(_.getPath.getName)
        .collect { case VPat(id) => id.toLong }
        .sorted.toSeq
  }

  /** Highest committed snapshot id, 0 if none. */
  def latest(spark: SparkSession, path: String): Long =
    snapshotIds(spark, path).lastOption.getOrElse(0L)

  private val VPat = "v(\\d+)\\.json".r
  private val DirsPat = "\"dirs\":\\[(.*?)\\]".r
  private val OpPat = "\"op\":\"(.*?)\"".r

  private def readManifest(spark: SparkSession, path: String, id: Long): (String, Seq[String]) = {
    val f = fs(spark, path)
    val p = new Path(metaDir(path), s"v$id.json")
    require(f.exists(p), s"snapshot $id does not exist under $path")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val dirs = DirsPat.findFirstMatchIn(body).map(_.group(1)) match {
      case Some("") => Seq.empty
      case Some(l)  => l.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
      case None     => throw new IllegalStateException(s"torn manifest v$id.json")
    }
    (OpPat.findFirstMatchIn(body).map(_.group(1)).getOrElse("?"), dirs)
  }

  /** Next free snapshot id, scanning BOTH manifests and data dirs: a
    * crash between data-write and manifest-rename leaves an orphan
    * `data/sN` with no `vN.json`, and deriving the id from manifests
    * alone would re-pick N forever, failing on `errorifexists` until a
    * manual vacuum. The orphan stays unreferenced (vacuum reclaims
    * it); new commits simply step past it. */
  private def nextId(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val dd = new Path(path, "data")
    val SPat = "s(\\d+)".r
    val maxData =
      if (!f.exists(dd)) 0L
      else f.listStatus(dd).map(_.getPath.getName)
        .collect { case SPat(id) => id.toLong }
        .foldLeft(0L)(math.max)
    math.max(latest(spark, path), maxData) + 1
  }

  private def commit(df: DataFrame, path: String, op: String,
                     carry: Seq[String]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val id = nextId(spark, path)
    val dataDir = s"data/s$id"
    df.write.mode("errorifexists").parquet(new Path(path, dataDir).toString)
    val dirs = carry :+ dataDir
    val body = s"""{"snapshot":$id,"op":"$op","dirs":[${
      dirs.map(d => "\"" + d + "\"").mkString(",")}]}"""
    // Writer-UNIQUE temp name: two same-id committers sharing one
    // .tmp name could interleave write/rename and silently clobber;
    // with distinct temp files the loser's rename is the one that
    // observes the existing destination.
    val tmp = new Path(metaDir(path),
      s".v$id.json.tmp.${java.util.UUID.randomUUID.toString.take(8)}")
    val dst = new Path(metaDir(path), s"v$id.json")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // Conflict guard: HDFS-like stores make rename fail when dst
    // exists, so the rename itself is the check. RawLocalFileSystem
    // delegates to rename(2), which silently REPLACES — the explicit
    // exists() precheck restores the guard there (local FS is the
    // test/single-writer environment; concurrent multi-writer safety
    // is only claimed on stores with non-overwriting atomic rename).
    val clash = f.exists(dst) || !f.rename(tmp, dst)
    if (clash) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict: snapshot $id already exists under $path")
    }
    id
  }

  /** First commit / full replace: the new snapshot references ONLY the
    * new data (prior snapshots stay readable — their files are not
    * touched until [[vacuum]]). */
  def overwrite(df: DataFrame, path: String): Long =
    commit(df, path, "overwrite", Seq.empty)

  /** Append commit: the new snapshot = parent's directory set + one
    * new directory. No data movement for existing rows — the append
    * cost is the delta's write alone, at any table size. */
  def append(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val parent = latest(spark, path)
    val carry = if (parent == 0) Seq.empty
                else readManifest(spark, path, parent)._2
    commit(df, path, "append", carry)
  }

  /** Copy-on-write MERGE commit: [[Merge.upsert]] resolves the rows,
    * the result lands as a full-replace snapshot. (A file-pruned CoW —
    * rewrite only intersecting files — is the [[Ivf.compact]]
    * affected-cells discipline at table scope; rows here model the
    * post-prune rewrite set, same as q92.) */
  def mergeCommit(base: String, updates: DataFrame, key: String): Long = {
    val cur = read(updates.sparkSession, base)
    overwrite(Merge.upsert(cur, updates, key), base)
  }

  /** Read snapshot `asOf` (default: latest). One manifest fetch, then
    * a parquet scan of the listed immutable dirs — column pruning and
    * predicate pushdown apply exactly as on a plain parquet table. */
  def read(spark: SparkSession, path: String, asOf: Long = 0L): DataFrame = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val (_, dirs) = readManifest(spark, path, id)
    require(dirs.nonEmpty, s"snapshot $id of $path lists no data")
    spark.read.parquet(dirs.map(d => new Path(path, d).toString): _*)
  }

  /** The rows snapshot `id` ADDED over its parent — the delta an
    * incremental consumer (index append, materialized-view refresh,
    * downstream CDC) processes instead of rescanning the table. For an
    * append commit this is exactly the appended directory set; for an
    * overwrite it is the whole new snapshot (dir sets are disjoint by
    * construction — every commit writes a fresh `data/s<id>`). */
  def deltaOf(spark: SparkSession, path: String, id: Long): DataFrame = {
    val (_, dirs) = readManifest(spark, path, id)
    // Parent = the latest EXISTING manifest below id (ids can gap past
    // a crashed commit's orphan; see nextId).
    val parent = snapshotIds(spark, path).filter(_ < id).lastOption
    val parentDirs = parent match {
      case Some(p) => readManifest(spark, path, p)._2.toSet
      case None    => Set.empty[String]
    }
    val added = dirs.filterNot(parentDirs)
    require(added.nonEmpty,
      s"snapshot $id added no data over ${parent.getOrElse(0L)}")
    spark.read.parquet(added.map(d => new Path(path, d).toString): _*)
  }

  /** Row-level change feed between two snapshots — the CDC read every
    * downstream consumer (search-index sync, replication, audit) wants
    * from a table format: what would I have to apply to `from`'s rows
    * to get `to`'s? Computed as symmetric multiset difference
    * (`exceptAll` both ways, bag semantics — duplicate rows carry
    * their multiplicity), so an updated row surfaces as a
    * ('delete', old) + ('insert', new) pair, a pure append as inserts
    * only, and untouched rows — the overwhelming mass — appear
    * nowhere. No row ids or merge keys are assumed: the diff is
    * defined on row VALUES, which is the only contract a format-level
    * feed can promise about arbitrary tables.
    *
    * Scale shape: Catalyst plans `exceptAll` as a counted hash
    * aggregate + join on the full row — one exchange per side keyed on
    * row content. For append-heavy histories the practical fast path
    * is [[deltaOf]] (zero comparison work); this is the general-case
    * read that also covers overwrites and merges. */
  def diff(spark: SparkSession, path: String, from: Long, to: Long): DataFrame = {
    val a = read(spark, path, from)
    val b = read(spark, path, to)
    b.exceptAll(a).withColumn("change", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("delete")))
  }

  /** Apply a [[diff]]-shaped CDC feed to a table: multiset-subtract
    * the delete rows, union the insert rows. This is the exact
    * algebraic inverse of [[diff]] — `applyCdc(a, diff(a, b)) == b`
    * as MULTISETS by construction (diff emits per-occurrence rows via
    * exceptAll; key-based application would break on legitimate
    * duplicate rows) — which is the contract a downstream replica
    * needs to follow a table by consuming its change feed instead of
    * re-copying snapshots.
    *
    * Scale shape: one full-row hash exchange for the exceptAll (the
    * same cost class as producing the diff); the feed side is
    * change-sized, not table-sized, so AQE broadcasts it when small.
    * A keyed table with a uniqueness contract can use
    * [[Merge.upsert]]-style keyed application instead; this is the
    * contract-free general case. */
  def applyCdc(base: DataFrame, feed: DataFrame): DataFrame = {
    val cols = base.columns.map(col)
    val deletes = feed.where(col("change") === "delete").select(cols: _*)
    val inserts = feed.where(col("change") === "insert").select(cols: _*)
    base.exceptAll(deletes).unionByName(inserts)
  }

  /** Commit log as a DataFrame: (snapshot, op, n_dirs). */
  def log(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    snapshotIds(spark, path).map { id =>
      val (op, dirs) = readManifest(spark, path, id)
      (id, op, dirs.size.toLong)
    }.toDF("snapshot", "op", "n_dirs")
  }

  /** Expire history: drop manifests below `keepFrom`, then delete data
    * dirs no SURVIVING manifest references. Ordering is crash-safe in
    * the conservative direction — manifests go first, so a crash
    * mid-vacuum strands unreferenced dirs (re-vacuum reclaims) but can
    * never leave a manifest pointing at deleted data. Returns the
    * number of data dirs removed. */
  def vacuum(spark: SparkSession, path: String, keepFrom: Long): Int = {
    val f = fs(spark, path)
    val ids = snapshotIds(spark, path)
    val last = ids.lastOption.getOrElse(0L)
    require(keepFrom >= 1 && keepFrom <= last,
      s"keepFrom must be in [1, $last], got $keepFrom")
    ids.filter(_ < keepFrom).foreach { id =>
      f.delete(new Path(metaDir(path), s"v$id.json"), false)
    }
    val live = ids.filter(_ >= keepFrom)
      .flatMap(id => readManifest(spark, path, id)._2).toSet
    val dataRoot = new Path(path, "data")
    val dead = f.listStatus(dataRoot).map(_.getPath)
      .filter(p => !live.contains(s"data/${p.getName}"))
    dead.foreach(p => f.delete(p, true))
    dead.length
  }
}
