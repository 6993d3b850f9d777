package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** A manifest rename lost the race to a concurrent committer at the
  * same id. The commutative ops ([[Snapshots.append]],
  * [[Snapshots.deleteKeys]]) catch this internally and rebase; the
  * rewrite family ([[Snapshots.compact]]/[[Snapshots.optimize]])
  * rebases over pure appends and propagates anything else;
  * [[Snapshots.overwrite]] always propagates — a full replace that
  * raced ANOTHER writer needs a human (or caller policy) to decide
  * whose replacement wins. */
final class CommitConflictException(msg: String) extends IllegalStateException(msg)

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

  /** Sidecar file key: the path of `fileUri` RELATIVE to its data dir.
    * Basenames are NOT unique within one commit — Spark's dynamic
    * partition writer reuses `part-00000-<jobUUID>.c000.parquet` in
    * every partition subdirectory it writes — so a `partitionBy` +
    * `statsCols`/`bloomCols` commit keyed by basename would build a
    * colliding map (last entry wins) and pruning could apply another
    * file's bounds. Keying by the dir-relative path
    * (`day=3/part-00000-….parquet`) is collision-free; for flat
    * commits it degrades to the basename, so pre-existing sidecars
    * keep working. */
  private def sidecarKey(fileUri: String, dataDir: String): String = {
    val marker = dataDir + "/"
    val i = fileUri.indexOf(marker)
    require(i >= 0, s"file $fileUri not under data dir $dataDir")
    fileUri.substring(i + marker.length)
  }

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
  private val SchemaPat = "\"schemaB64\":\"(.*?)\"".r
  private val BatchPat = "\"batchId\":(\\d+)".r
  private val PartsPat = "\"partitionBy\":\\[(.*?)\\]".r

  /** One equality-delete file and the data dirs it applies OVER — the
    * Iceberg sequence-number idea made explicit: a delete scopes to the
    * snapshot's data dirs AT DELETE TIME, so a later append of the same
    * key is immune (dirs born after the delete are never in `over`). */
  private[operators] final case class DelEntry(file: String, over: Set[String])

  private final case class Manifest(op: String, dirs: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      dels: Seq[DelEntry], batchId: Option[Long] = None,
      parts: Seq[String] = Seq.empty)

  private def readManifest(spark: SparkSession, path: String, id: Long): (String, Seq[String]) = {
    val m = readManifestFull(spark, path, id)
    (m.op, m.dirs)
  }

  private val DelEntryPat = """\{"d":"(.*?)","over":\[(.*?)\]\}""".r

  /** Full manifest. The schema rides base64-encoded (StructType.json)
    * so reads plan with the SNAPSHOT's schema — see [[read]] — without
    * touching any file footer; absent on pre-r14 manifests (None →
    * schema comes from the files, the old behavior). `dels` carries
    * the merge-on-read equality-delete files with their scopes. */
  private def readManifestFull(spark: SparkSession, path: String,
      id: Long): Manifest = {
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
    val schema = SchemaPat.findFirstMatchIn(body).map(_.group(1)).map { b64 =>
      org.apache.spark.sql.types.DataType.fromJson(new String(
        java.util.Base64.getDecoder.decode(b64), StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val dels = DelEntryPat.findAllMatchIn(body).map { m =>
      val over = m.group(2) match {
        case "" => Set.empty[String]
        case l  => l.split(",").map(_.stripPrefix("\"").stripSuffix("\"")).toSet
      }
      DelEntry(m.group(1), over)
    }.toSeq
    val batchId = BatchPat.findFirstMatchIn(body).map(_.group(1).toLong)
    val parts = PartsPat.findFirstMatchIn(body).map(_.group(1)) match {
      case Some("") | None => Seq.empty[String]
      case Some(l) => l.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
    }
    Manifest(OpPat.findFirstMatchIn(body).map(_.group(1)).getOrElse("?"),
      dirs, schema, dels, batchId, parts)
  }

  /** Next free DIRECTORY id, scanning manifests, data dirs, and delete
    * dirs: a crash between data-write and manifest-rename leaves an
    * orphan `data/sN` with no manifest, and deriving the id from
    * manifests alone would re-pick N forever, failing on
    * `errorifexists` until a manual vacuum. The orphan stays
    * unreferenced (vacuum reclaims it); new commits simply step past
    * it.
    *
    * This allocates DIR names only (r15): the MANIFEST id is always
    * `latest + 1` — a dense version sequence, deliberately decoupled —
    * so that every committer who observed the same parent targets the
    * SAME manifest name and the atomic rename becomes a true
    * compare-and-swap (the Iceberg HadoopTableOperations protocol).
    * Were manifest ids entangled with dir allocation, a committer that
    * saw a rival's data dir land before its manifest would allocate
    * PAST it and the two commits would serialize without ever
    * conflicting — a silent lost update instead of a caught clash. On
    * a clean single-writer table the two sequences coincide, so dir
    * and manifest numbers still line up. */
  private def nextId(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val SPat = "s(\\d+)".r
    val DPat = "d(\\d+)".r
    def maxUnder(dir: String, pat: scala.util.matching.Regex): Long = {
      val p = new Path(path, dir)
      if (!f.exists(p)) 0L
      else f.listStatus(p).map(_.getPath.getName)
        .collect { case pat(id) => id.toLong }
        .foldLeft(0L)(math.max)
    }
    math.max(latest(spark, path),
      math.max(maxUnder("data", SPat), maxUnder("deletes", DPat))) + 1
  }

  /** Render + atomically install a manifest. Writer-UNIQUE temp name
    * (two same-id committers sharing one .tmp could interleave
    * write/rename and silently clobber), then rename into place. On
    * HDFS-like stores the rename fails when dst exists — the conflict
    * check itself; RawLocalFileSystem delegates to rename(2), which
    * silently REPLACES, so the explicit exists() precheck restores the
    * guard there (local FS is the test/single-writer environment;
    * concurrent multi-writer safety is only claimed on stores with
    * non-overwriting atomic rename). */
  private def installManifest(spark: SparkSession, path: String, id: Long,
      op: String, dirs: Seq[String], dels: Seq[DelEntry],
      schema: org.apache.spark.sql.types.StructType,
      batchId: Option[Long] = None,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val f = fs(spark, path)
    val schemaB64 = java.util.Base64.getEncoder.encodeToString(
      schema.json.getBytes(StandardCharsets.UTF_8))
    val delsJson = dels.map { d =>
      s"""{"d":"${d.file}","over":[${d.over.toSeq.sorted
        .map("\"" + _ + "\"").mkString(",")}]}"""
    }.mkString(",")
    val batchJson = batchId.fold("")(b => s""","batchId":$b""")
    val partsJson =
      if (partitionBy.isEmpty) ""
      else s""","partitionBy":[${partitionBy.map("\"" + _ + "\"").mkString(",")}]"""
    val body = s"""{"snapshot":$id,"op":"$op","dirs":[${
      dirs.map(d => "\"" + d + "\"").mkString(",")
    }],"dels":[$delsJson]$batchJson$partsJson,"schemaB64":"$schemaB64"}"""
    val tmp = new Path(metaDir(path),
      s".v$id.json.tmp.${java.util.UUID.randomUUID.toString.take(8)}")
    val dst = new Path(metaDir(path), s"v$id.json")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val clash = f.exists(dst) || !f.rename(tmp, dst)
    if (clash) {
      f.delete(tmp, false)
      throw new CommitConflictException(
        s"commit conflict: snapshot $id already exists under $path")
    }
  }

  /** Write one commit's data dir (plus optional stats sidecar). Hive
    * partitioning is per-DIR: a partitioned commit's files land under
    * `<dir>/<col>=<val>/…`; readers recover partition values through
    * normal partition discovery (multi-dir scans treat each listed dir
    * as a discovery root), so partitioned and flat dirs coexist in one
    * table history. */
  private def writeData(df: DataFrame, path: String, dataDir: String,
                        statsCols: Seq[String], partitionBy: Seq[String],
                        bloomCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("errorifexists")
    val w2 = if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*)
    w2.parquet(new Path(path, dataDir).toString)
    if (statsCols.nonEmpty) writeStats(df.sparkSession, path, dataDir, statsCols)
    if (bloomCols.nonEmpty) writeBloom(df.sparkSession, path, dataDir, bloomCols)
  }

  /** Sidecar column-type validation, hoisted ABOVE the data write: a
    * DATE statsCol (or a float bloomCol) must fail before any
    * `data/sN` dir lands — the writeStats/writeBloom `require`s run
    * after the parquet write and would orphan the dir they reject
    * (reads stay correct, the manifest never installs, but the r15
    * "reject before the data dir is written" bar wants no orphan at
    * all). The post-write requires stay as defense in depth against
    * parquet round-trip type drift. */
  private def validateSidecarCols(schema: org.apache.spark.sql.types.StructType,
                                  statsCols: Seq[String], bloomCols: Seq[String]): Unit = {
    statsCols.foreach { c =>
      val dt = schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte").contains(dt),
        s"stats column $c has non-integral type $dt")
    }
    bloomCols.foreach { c =>
      val dt = schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte", "string").contains(dt),
        s"bloom column $c has unsupported type $dt")
    }
  }

  private def commit(df: DataFrame, path: String, op: String,
                     carry: Seq[String], statsCols: Seq[String] = Seq.empty,
                     schema: Option[org.apache.spark.sql.types.StructType] = None,
                     dels: Seq[DelEntry] = Seq.empty,
                     batchId: Option[Long] = None,
                     partitionBy: Seq[String] = Seq.empty,
                     bloomCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    validateSidecarCols(df.schema, statsCols, bloomCols)
    // Manifest id pinned at ENTRY (dense CAS sequence, see nextId's
    // doc): anything a rival lands after this point makes the install
    // clash rather than silently supersede.
    val id = latest(spark, path) + 1
    val dataDir = s"data/s${nextId(spark, path)}"
    writeData(df, path, dataDir, statsCols, partitionBy, bloomCols)
    onCommitAttempt()
    installManifest(spark, path, id, op, carry :+ dataDir, dels,
      schema.getOrElse(df.schema), batchId, partitionBy)
    id
  }

  /** Test seam for the optimistic-retry paths: invoked once per
    * attempt between a commit's data write and its manifest install —
    * the window where a concurrent committer can win the race.
    * Package-private, default no-op; SnapshotSpec injects a competing
    * commit here to exercise the rebase deterministically. */
  private[graft] var onCommitAttempt: () => Unit = () => ()

  /** True when `e` is the data/delete-file write losing an allocation
    * race (another committer claimed the same id's directory first) —
    * retryable by re-deriving the id from the now-visible state. */
  private def isPathClash(e: Throwable): Boolean = e match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case a: org.apache.spark.sql.AnalysisException =>
      a.getMessage != null && a.getMessage.contains("already exists")
    case _ => false
  }

  /** First commit / full replace: the new snapshot references ONLY the
    * new data (prior snapshots stay readable — their files are not
    * touched until [[vacuum]]). `statsCols` (integral columns) records
    * per-file min/max in a stats sidecar so [[readRange]] can skip
    * files at planning time. `partitionBy` lays the commit's files out
    * hive-partitioned (directory-level pruning via [[readPartition]]).
    * `batchId` stamps the manifest with a streaming micro-batch id —
    * the exactly-once handle [[graft.streaming.MvStream]] checks via
    * [[committedBatchId]] to no-op replayed batches. Fail-fast on a
    * concurrent-commit clash ([[CommitConflictException]]): a raced
    * full replace has no safe automatic rebase. */
  def overwrite(df: DataFrame, path: String,
                statsCols: Seq[String] = Seq.empty,
                partitionBy: Seq[String] = Seq.empty,
                batchId: Option[Long] = None,
                bloomCols: Seq[String] = Seq.empty): Long =
    commit(df, path, "overwrite", Seq.empty, statsCols,
      batchId = batchId, partitionBy = partitionBy, bloomCols = bloomCols)

  /** Append commit: the new snapshot = parent's directory set + one
    * new directory. No data movement for existing rows — the append
    * cost is the delta's write alone, at any table size. Earlier
    * commits' stats sidecars stay valid (data dirs are immutable), so
    * per-commit `statsCols` compose across the history.
    *
    * SCHEMA EVOLUTION (add-column, Iceberg semantics): an appended
    * frame may carry columns the parent lacks — the snapshot schema
    * becomes parent ∪ new (new fields appended in order), old files
    * read NULL for them via the manifest schema ([[read]]), and no
    * byte of existing data is rewritten. A column sharing a name must
    * share its type (the only safe automatic rule; widenings are a
    * rewrite, not an append), and dropping columns is not an append
    * (a delta missing parent columns null-fills its OWN rows — the
    * parent schema still governs). */
  private def mergedAppendSchema(pm: Option[Manifest],
      df: DataFrame): org.apache.spark.sql.types.StructType =
    pm.flatMap(_.schema) match {
      case None => df.schema // first commit / pre-r14 table: file-derived
      case Some(ps) =>
        ps.fields.foreach { pf =>
          df.schema.fields.find(_.name == pf.name).foreach { nf =>
            require(nf.dataType == pf.dataType,
              s"append changes type of ${pf.name}: ${pf.dataType} -> ${nf.dataType}" +
                " (type changes need an overwrite commit)")
          }
        }
        val newFields = df.schema.fields.filterNot(f => ps.fieldNames.contains(f.name))
        org.apache.spark.sql.types.StructType(ps.fields ++ newFields)
    }

  /** Optimistic-concurrency commit (r15, Iceberg's commit-retry loop
    * for commutative operations): an append that loses the manifest
    * race does NOT fail — its data dir is already written and
    * immutable, so the retry re-reads the NEW latest manifest, rebases
    * (winner's dirs + this append's dir, winner's delete files carried,
    * schema re-merged against the winner's), and installs at a fresh
    * id. The data writes ONCE; only KB-scale manifest work repeats.
    * Two appenders racing on the same observed state also contend on
    * the data-dir name itself — the loser's `errorifexists` write
    * fails, the retry re-derives the dir id from the now-visible state
    * and writes its own dir. After `maxAttempts` losses the last
    * conflict propagates (a pathologically hot table needs caller
    * backoff).
    *
    * Conflict detection is COMPLETE at the manifest level: manifest
    * ids are a dense version sequence (see [[nextId]]'s doc), so every
    * committer that observed parent P targets `v(P+1).json` and the
    * atomic rename is a true compare-and-swap — concurrent commits
    * either rebase or fail, never silently supersede. The residual
    * store-dependent window is the data-dir `errorifexists`
    * check-then-write on stores without atomic directory claims; a
    * catalog-backed deployment closes it by allocating unique dir
    * names, with this manifest layout unchanged. */
  def append(df: DataFrame, path: String,
             statsCols: Seq[String] = Seq.empty,
             partitionBy: Seq[String] = Seq.empty,
             maxAttempts: Int = 5,
             bloomCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    var dataDir: Option[String] = None
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val parent = latest(spark, path)
        val pm = if (parent == 0) None else Some(readManifestFull(spark, path, parent))
        val merged = mergedAppendSchema(pm, df) // type clash: not retryable, throws through
        val dir = dataDir.getOrElse {
          val d = s"data/s${nextId(spark, path)}"
          writeData(df, path, d, statsCols, partitionBy, bloomCols)
          dataDir = Some(d); d
        }
        onCommitAttempt()
        // parent delete files carry forward UNCHANGED: their `over`
        // scopes exclude the new dir, so appended rows are immune even
        // when they reuse a previously-deleted key.
        installManifest(spark, path, parent + 1, "append",
          pm.map(_.dirs).getOrElse(Seq.empty) :+ dir,
          pm.map(_.dels).getOrElse(Seq.empty), merged,
          partitionBy = partitionBy)
        return parent + 1
      } catch {
        case e: CommitConflictException => last = e
        case e: Throwable if isPathClash(e) => last = e
      }
    }
    throw last
  }

  /** Merge-on-read equality DELETE commit (r14, Iceberg v2's delete
    * files distilled): instead of rewriting any data file, write the
    * matching keys as a delete file scoped OVER the snapshot's current
    * data dirs and commit a manifest that carries data unchanged. The
    * delete job is match-sized (one filtered scan projecting the key);
    * at 100 TB deleting a crawl day from a corpus costs the keys'
    * write, not a table rewrite — [[compact]] later folds the
    * tombstones in. Reads anti-join the delete keys against exactly
    * the dirs in scope, so a later [[append]] that re-inserts a
    * deleted key is NOT affected (its dir postdates the delete — the
    * sequence-number semantics, carried here as the explicit `over`
    * set). Returns the new snapshot id. */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column,
                  keyCol: String): Long =
    deleteKeys(spark, path,
      read(spark, path).where(predicate).select(keyCol), keyCol)

  /** Key-set form of [[deleteWhere]] — the API a DISTRIBUTED producer
    * of delete keys needs (a dedup pass, a GDPR id list, a downstream
    * CDC feed): the keys frame is written as the delete file directly,
    * never collected or folded into an `isin` predicate, so the delete
    * scales with the key set like any other write. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
                 keyCol: String, maxAttempts: Int = 5): Long = {
    var delDir: Option[String] = None
    // The delete's scope freezes at the dirs visible when the keys were
    // produced: a rebase after losing the race to a concurrent APPEND
    // must not widen the tombstone onto data it never saw (the appended
    // rows postdate the delete — sequence semantics); a rebase after a
    // concurrent OVERWRITE intersects to nothing and the tombstone
    // becomes a harmless no-op over the replaced dirs.
    var overDirs: Option[Set[String]] = None
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val parent = latest(spark, path)
        require(parent > 0, s"no snapshot to delete from under $path")
        val pm = readManifestFull(spark, path, parent)
        if (overDirs.isEmpty) overDirs = Some(pm.dirs.toSet)
        val dd = delDir.getOrElse {
          val d = s"deletes/d${nextId(spark, path)}"
          keys.select(col(keyCol)).distinct()
            .write.mode("errorifexists").parquet(new Path(path, d).toString)
          delDir = Some(d); d
        }
        onCommitAttempt()
        installManifest(spark, path, parent + 1, "delete", pm.dirs,
          pm.dels :+ DelEntry(dd, overDirs.get.intersect(pm.dirs.toSet)),
          pm.schema.getOrElse(read(spark, path, parent).schema))
        return parent + 1
      } catch {
        case e: CommitConflictException => last = e
        case e: Throwable if isPathClash(e) => last = e
      }
    }
    throw last
  }

  /** The streaming micro-batch id the table's snapshot `asOf` (default
    * latest) was committed under, if any — see [[overwrite]]'s
    * `batchId` and [[graft.streaming.MvStream.foldBatch]]. */
  def committedBatchId(spark: SparkSession, path: String,
                       asOf: Long = 0L): Option[Long] = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    if (id == 0) None else readManifestFull(spark, path, id).batchId
  }

  /** The partition columns snapshot `asOf` (default latest) committed
    * its OWN data dir under; empty for flat commits. Carried dirs from
    * earlier commits keep their own layout — readers never need this
    * (partition discovery recovers values per dir), it is the
    * audit/contract face. */
  def partitionColsOf(spark: SparkSession, path: String,
                      asOf: Long = 0L): Seq[String] = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    if (id == 0) Seq.empty else readManifestFull(spark, path, id).parts
  }

  /** Fold merge-on-read state back into plain data (the table-format
    * OPTIMIZE step): materialize the current logical content as ONE
    * fresh commit — tombstones applied, small files bin-packed by the
    * writer, optional fresh [[writeStats]] sidecar. History stays time
    * travelable; [[vacuum]] reclaims the superseded dirs and delete
    * files when their snapshots expire. */
  def compact(spark: SparkSession, path: String,
              statsCols: Seq[String] = Seq.empty,
              partitionBy: Seq[String] = Seq.empty,
              bloomCols: Seq[String] = Seq.empty): Long = {
    val base = latest(spark, path)
    rewriteCommit(spark, path, base, read(spark, path, base), "compact",
      statsCols, partitionBy, bloomCols)
  }

  /** Shared commit tail of the REWRITE family ([[compact]],
    * [[optimize]], [[optimizeZ]]): `df` reproduces the logical content
    * of snapshot `base` (its plan pins base's immutable dirs, so it
    * stays valid however the table advances). Iceberg's
    * validate-and-retry, specialized to what a rewrite can PROVE safe:
    * losing the manifest CAS to concurrent APPENDs rebases — the new
    * manifest carries the rivals' appended dirs (and re-merged schema)
    * alongside the rewritten dir, so no append is ever lost and the
    * rewrite work is never thrown away (the data dir writes once; only
    * KB-scale manifest work repeats). Losing to anything that MUTATED
    * visible rows (delete / overwrite / another rewrite) fails clean
    * with [[CommitConflictException]] — the rewrite's content no
    * longer reproduces the table and there is no safe automatic merge;
    * the orphan data dir is [[vacuum]]-reclaimable, the rival's commit
    * stands untouched. */
  private def rewriteCommit(spark: SparkSession, path: String, base: Long,
                            df: DataFrame, op: String,
                            statsCols: Seq[String], partitionBy: Seq[String],
                            bloomCols: Seq[String],
                            maxAttempts: Int = 5): Long = {
    val baseM = readManifestFull(spark, path, base)
    var dataDir: Option[String] = None
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      val parent = latest(spark, path)
      val (extraDirs, schema) =
        if (parent == base) (Seq.empty[String], df.schema)
        else {
          // Rivals landed since the rewrite read `base`. Safe to
          // rebase ONLY over pure appends: their dirs are disjoint
          // additions the rewrite simply carries. Any other op changed
          // rows the rewrite already re-materialized — that conflict
          // propagates (validation sits OUTSIDE the retry catch).
          val rivals = snapshotIds(spark, path)
            .filter(id => id > base && id <= parent)
            .map(id => readManifestFull(spark, path, id))
          rivals.find(_.op != "append").foreach { r =>
            throw new CommitConflictException(
              s"$op of snapshot $base raced a '${r.op}' commit on $path — " +
                "rebase is only safe over appends; re-run the rewrite")
          }
          val pm = readManifestFull(spark, path, parent)
          (pm.dirs.filterNot(baseM.dirs.contains), pm.schema.getOrElse(df.schema))
        }
      try {
        val dir = dataDir.getOrElse {
          val d = s"data/s${nextId(spark, path)}"
          writeData(df, path, d, statsCols, partitionBy, bloomCols)
          dataDir = Some(d); d
        }
        onCommitAttempt()
        // Base's delete files fold into the rewritten dir; dels scoped
        // over carried rival-append dirs would survive, but appends
        // never create dels, so the rebased manifest carries none.
        installManifest(spark, path, parent + 1, op, extraDirs :+ dir,
          Seq.empty, schema, partitionBy = partitionBy)
        return parent + 1
      } catch {
        case e: CommitConflictException => last = e
        case e: Throwable if isPathClash(e) => last = e
      }
    }
    throw last
  }

  /** Partial (bin-pack) compaction (q205) — Iceberg's
    * `rewrite_data_files` with the small-file filter, distilled: fold
    * ONLY the data dirs whose on-disk bytes fall below `smallBytes`
    * into one rewritten dir (tombstones applied), CARRYING every
    * healthy dir untouched. This is the difference between a
    * maintenance job that pays O(small tail) and one that pays
    * O(table) — at 100 TB the full-table [[compact]]/[[optimize]]
    * rewrite is a planned migration, while this runs nightly: a
    * streaming ingest's thousand drip-appends fold for the cost of
    * reading just them.
    *
    * Fewer than two qualifying dirs → no-op (nothing to merge),
    * returning (current snapshot, 0). Delete files: scopes covering a
    * rewritten dir are APPLIED during the rewrite read and intersected
    * down to the surviving dirs in the new manifest (an entry whose
    * scope empties is dropped — its keys are physically gone from the
    * rewritten dir). Concurrency is [[compact]]'s validate-and-retry:
    * losing the manifest CAS to rival APPENDs rebases (their dirs and
    * merged schema carried — rival dirs are never candidates, they
    * postdate the size scan); any row-mutating rival fails clean, the
    * orphan dir vacuum-reclaimable.
    *
    * Returns (snapshot id, dirs rewritten). */
  def compactSmall(spark: SparkSession, path: String, smallBytes: Long,
                   statsCols: Seq[String] = Seq.empty,
                   maxAttempts: Int = 5): (Long, Int) = {
    require(smallBytes > 0, s"smallBytes must be positive, got $smallBytes")
    val f = fs(spark, path)
    val base = latest(spark, path)
    require(base > 0, s"no snapshot to compact under $path")
    val m = readManifestFull(spark, path, base)
    val small = m.dirs.filter { d =>
      listFilesRec(f, new Path(path, d)).map(_.getLen).sum < smallBytes
    }
    if (small.size < 2) return (base, 0)
    // Rewrite read: the small dirs under the manifest schema with their
    // delete files applied (scanKept's contract, dir-exact).
    val df = small.sorted.map { d =>
      val reader = m.schema.fold(spark.read)(s => spark.read.schema(s))
      val scan = reader
        .option("basePath", new Path(path, d).toString)
        .parquet(new Path(path, d).toString)
      applyDelFiles(spark, path,
        m.dels.filter(_.over.contains(d)).map(_.file), scan)
    }.reduce(_ unionByName _)

    var dataDir: Option[String] = None
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      val parent = latest(spark, path)
      val (rivalDirs, schema) =
        if (parent == base) (Seq.empty[String], m.schema.getOrElse(df.schema))
        else {
          val rivals = snapshotIds(spark, path)
            .filter(id => id > base && id <= parent)
            .map(id => readManifestFull(spark, path, id))
          rivals.find(_.op != "append").foreach { r =>
            throw new CommitConflictException(
              s"compactSmall of snapshot $base raced a '${r.op}' commit on " +
                s"$path — rebase is only safe over appends")
          }
          val pm = readManifestFull(spark, path, parent)
          (pm.dirs.filterNot(m.dirs.contains),
            pm.schema.getOrElse(m.schema.getOrElse(df.schema)))
        }
      try {
        val dir = dataDir.getOrElse {
          val d = s"data/s${nextId(spark, path)}"
          writeData(df, path, d, statsCols, Seq.empty)
          dataDir = Some(d); d
        }
        onCommitAttempt()
        val surviving = m.dirs.filterNot(small.contains) ++ rivalDirs :+ dir
        val keptDels = m.dels
          .map(de => DelEntry(de.file, de.over.filterNot(small.contains)))
          .filter(_.over.nonEmpty)
        installManifest(spark, path, parent + 1, "compact_small",
          surviving, keptDels, schema)
        return (parent + 1, small.size)
      } catch {
        case e: CommitConflictException => last = e
        case e: Throwable if isPathClash(e) => last = e
      }
    }
    throw last
  }

  /** OPTIMIZE commit (q187 — Delta `OPTIMIZE ZORDER BY` / Iceberg
    * rewrite-with-sort-order, distilled): rewrite the snapshot's
    * LOGICAL content range-clustered on `colName` — `numFiles` sorted,
    * disjoint-range files — committed with that column's stats sidecar,
    * so from this snapshot on [[readRange]]/[[pruneRange]] open
    * O(matching) files for any range on the cluster key. [[compact]]
    * folds tombstones and merges small files but keeps arrival order;
    * this is the read-optimizing rewrite a table gets once a dominant
    * query key emerges. History semantics are compact's: a fresh
    * full-content dir, prior snapshots readable until [[vacuum]],
    * time travel and rollback untouched.
    *
    * Cost shape: one range exchange + within-partition sort of the
    * table's content — the same class as the rewrite it amortizes
    * (every range probe after it skips cold files at KB-scale planning
    * cost). `repartitionByRange` samples range bounds internally;
    * file CONTENT ranges are disjoint regardless, which is all the
    * stats-sidecar pruning needs. */
  def optimize(spark: SparkSession, path: String, colName: String,
               numFiles: Int): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val base = latest(spark, path)
    val clustered = read(spark, path, base)
      .repartitionByRange(numFiles, col(colName))
      .sortWithinPartitions(colName)
    rewriteCommit(spark, path, base, clustered, "optimize",
      statsCols = Seq(colName), partitionBy = Seq.empty, bloomCols = Seq.empty)
  }

  /** Two-dimensional [[optimize]]: cluster on the Z-interleaving of two
    * integral columns ([[Layout.zValue]]) and record BOTH columns'
    * stats sidecars — Z-locality makes each file's min/max box tight
    * on BOTH axes, so range probes on EITHER column (or both) skip
    * files. The single-column rewrite sorts one axis perfectly and
    * scatters the other; this is the standard multi-key compromise
    * (Delta's `ZORDER BY (a, b)`). */
  def optimizeZ(spark: SparkSession, path: String, aCol: String, bCol: String,
                bits: Int, numFiles: Int): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val base = latest(spark, path)
    val z = Layout.zValue(col(aCol).cast("long"), col(bCol).cast("long"), bits)
    val clustered = read(spark, path, base)
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    rewriteCommit(spark, path, base, clustered, "optimize",
      statsCols = Seq(aCol, bCol), partitionBy = Seq.empty, bloomCols = Seq.empty)
  }

  /** Right-to-erasure as a table operation (q189): the GDPR/CCPA
    * deletion story stated end-to-end — [[deleteKeys]] alone makes the
    * rows INVISIBLE (merge-on-read tombstones) but the bytes remain in
    * immutable history and time travel can resurrect them; real
    * erasure is the three-step composition this method drives:
    *   1. tombstone commit (distributed key set, never collected),
    *   2. [[compact]] — the first snapshot whose FILES physically
    *      exclude the keys,
    *   3. [[vacuum]] to the compacted snapshot — every pre-compaction
    *      manifest and data dir (the bytes) reclaimed; tagged
    *      snapshots would pin history, so erasure REFUSES to run while
    *      tags exist rather than silently keeping the data.
    * Returns a 1-row auditable report: rows before/after, snapshots
    * remaining, data dirs reclaimed — the record a compliance log
    * wants. The trade is explicit: erasure collapses time travel to
    * the current content (that is the point). */
  def erase(spark: SparkSession, path: String, keys: DataFrame,
            keyCol: String): DataFrame = {
    import spark.implicits._
    require(tags(spark, path).isEmpty,
      s"erase refuses to run with tags pinning history on $path — drop them first")
    val before = read(spark, path).count()
    deleteKeys(spark, path, keys, keyCol)
    val compacted = compact(spark, path)
    val reclaimed = vacuum(spark, path, keepFrom = compacted)
    val after = read(spark, path).count()
    Seq((before, after, snapshotIds(spark, path).length.toLong, reclaimed.toLong))
      .toDF("rows_before", "rows_after", "snapshots_remaining", "dirs_reclaimed")
  }

  /** Table health report — the "should I compact / optimize?" dial:
    * one row per LIVE data dir of the current snapshot with file
    * count, byte totals, and small-file share. Pure KB-scale driver
    * metadata (listStatus per dir — the manifest cost class, no data
    * read): exactly what a table-maintenance scheduler polls. A
    * `small_file_frac` near 1 under many files says compact; a high
    * dir count says the append cadence outran maintenance. */
  def tableHealth(spark: SparkSession, path: String,
                  smallFileBytes: Long = 8L << 20): DataFrame = {
    import spark.implicits._
    val id = latest(spark, path)
    val m = readManifestFull(spark, path, id)
    val f = fs(spark, path)
    m.dirs.map { d =>
      val files = listFilesRec(f, new Path(path, d))
        .filter(st => st.getPath.getName.endsWith(".parquet"))
      val sizes = files.map(_.getLen)
      val nSmall = sizes.count(_ < smallFileBytes)
      (d, id, files.length.toLong, sizes.sum,
        if (sizes.isEmpty) 0L else sizes.min,
        if (sizes.isEmpty) 0L else sizes.max,
        if (files.isEmpty) 0.0
        else math.rint(nSmall.toDouble / files.length * 1e6) / 1e6)
    }.toDF("data_dir", "snapshot", "n_files", "total_bytes",
      "min_file_bytes", "max_file_bytes", "small_file_frac")
      .orderBy("data_dir")
  }

  private def listFilesRec(f: FileSystem, p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    f.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) listFilesRec(f, st.getPath) else Seq(st)
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

  /** Metadata-only commit: append ALREADY-WRITTEN table-root-relative
    * data dirs to the current snapshot's dir list without moving a
    * byte — the zero-copy primitive behind [[Branches.merge]] (a lakeFS
    * merge is exactly this: new manifest, same objects). Parent delete
    * files carry forward unchanged; their scopes exclude the new dirs,
    * so merged rows are immune to pre-merge tombstones (the same
    * sequence-number argument as [[append]]). Single CAS attempt —
    * callers that must revalidate cross-branch invariants on a lost
    * race own the retry loop. */
  /** The data dirs (table-root-relative) snapshot `id` references —
    * the metadata [[Branches.merge]] rebases onto main. */
  private[graft] def dirsOf(spark: SparkSession, path: String,
      id: Long): Seq[String] =
    readManifestFull(spark, path, id).dirs

  /** Metadata-only commit of extra dirs onto an EXPLICIT parent. The
    * caller passes the head it VALIDATED (r17: the old re-read of
    * `latest` here was a TOCTOU — a rival commit landing between the
    * caller's validation read and this one was silently rebased over
    * without re-validation, because the install adopted the new head
    * instead of clashing at validatedHead+1). Installing at
    * expectedParent+1 unconditionally means any rival turns into a
    * manifest CAS clash ([[CommitConflictException]]), returning
    * control to the caller's revalidate-and-retry loop. */
  private[operators] def commitDirs(spark: SparkSession, path: String,
      op: String, extraDirs: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      expectedParent: Long): Long = {
    val pm = if (expectedParent == 0) None
      else Some(readManifestFull(spark, path, expectedParent))
    onCommitAttempt()
    installManifest(spark, path, expectedParent + 1, op,
      pm.map(_.dirs).getOrElse(Seq.empty) ++ extraDirs,
      pm.map(_.dels).getOrElse(Seq.empty), schema)
    expectedParent + 1
  }

  /** Read snapshot `asOf` (default: latest). One manifest fetch, then
    * a parquet scan of the listed immutable dirs — column pruning and
    * predicate pushdown apply exactly as on a plain parquet table.
    * The scan plans with the MANIFEST's schema (not the files'): files
    * from commits that predate an added column read NULL for it — the
    * add-column backfill — with O(1) planning cost (no mergeSchema
    * footer sweep; the vectorized reader fills missing columns
    * natively). Each historical snapshot reads under ITS OWN schema,
    * so time travel reproduces exactly what that snapshot's readers
    * saw.
    *
    * Merge-on-read deletes ([[deleteWhere]]) apply here: data dirs are
    * GROUPED by the set of delete files scoping them (usually two
    * groups — pre-delete dirs with tombstones, post-delete appends
    * without), each group scans once and left-anti joins its delete
    * keys (broadcast — tombstone sets are match-sized), and the groups
    * union. A snapshot with no deletes takes the plain single-scan
    * path unchanged. */
  def read(spark: SparkSession, path: String, asOf: Long = 0L): DataFrame = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val m = readManifestFull(spark, path, id)
    require(m.dirs.nonEmpty, s"snapshot $id of $path lists no data")
    def scan(dirs: Seq[String]): DataFrame = {
      val reader = m.schema.fold(spark.read)(s => spark.read.schema(s))
      reader.parquet(dirs.map(d => new Path(path, d).toString): _*)
    }
    // Dirs group by (applicable delete files, partition layout): a
    // multi-root scan needs every root hive-structured the same way —
    // a flat dir next to a partitioned one trips Spark's
    // CONFLICTING_DIRECTORY_STRUCTURES check — so mixed-layout
    // histories scan per layout group and union (same driver cost
    // class as the delete grouping: one listStatus walk per dir).
    val f = fs(spark, path)
    m.dirs.groupBy(d => (m.dels.filter(_.over.contains(d)).map(_.file),
        partSig(f, new Path(path, d))))
      .toSeq.sortBy(_._2.head)
      .map { case ((delFiles, _), dirs) =>
        applyDelFiles(spark, path, delFiles, scan(dirs))
      }
      .reduce(_ unionByName _)
  }

  /** Partition-layout signature of one data dir: the `col=`-chain of
    * directory levels under it ("" for a flat dir, "lang" for
    * partitionBy(lang), "a/b" for partitionBy(a, b)) — KB-scale
    * planning I/O, used to group scan roots with identical hive
    * structure. */
  private def partSig(f: FileSystem, dirAbs: Path): String = {
    val sig = Seq.newBuilder[String]
    var cur = dirAbs
    var go = true
    while (go) {
      val parts = f.listStatus(cur)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (parts.isEmpty) go = false
      else {
        sig += parts.head.getPath.getName.takeWhile(_ != '=')
        cur = parts.head.getPath
      }
    }
    sig.result().mkString("/")
  }

  /** Anti-join a frame against the given delete files' key sets
    * (broadcast — tombstone sets are match-sized). */
  private def applyDelFiles(spark: SparkSession, path: String,
      delFiles: Seq[String], df: DataFrame): DataFrame =
    delFiles.foldLeft(df) { (d, delFile) =>
      val keys = spark.read.parquet(new Path(path, delFile).toString)
      d.join(broadcast(keys), keys.columns.toSeq, "left_anti")
    }

  /** Per-file min/max stats sidecar for one immutable data dir — the
    * Iceberg-manifest idea at its smallest: planning can skip a file
    * from KB-scale metadata without opening its footer. ONE delta-sized
    * executor job (groupBy input file) computes every requested
    * column's bounds; the sidecar is written BEFORE the manifest
    * rename, so a visible snapshot always has its stats (a crash in
    * between orphans sidecar+data together). Integral columns only —
    * long bounds are exact in JSON; float/string bounds invite the
    * cross-engine comparison swamps the rest of the repo avoids. */
  private def writeStats(spark: SparkSession, path: String, dataDir: String,
                         statsCols: Seq[String]): Unit = {
    val dirPath = new Path(path, dataDir).toString
    val df = spark.read.parquet(dirPath)
    statsCols.foreach { c =>
      val dt = df.schema(c).dataType.typeName
      // integral ONLY: a DATE column cannot cast to long under ANSI
      // (the min/max aggregate below would throw AFTER the data dir
      // landed, orphaning it) — date-keyed pruning wants an explicit
      // epoch-day long column (datediff from 1970-01-01) instead.
      require(Seq("long", "integer", "short", "byte").contains(dt),
        s"stats column $c has non-integral type $dt")
    }
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"mn_$c"), max(col(c).cast("long")).as(s"mx_$c")))
    val rows = df
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per written FILE — bounded by the commit's file count
    val entries = rows.map { r =>
      val fileName = sidecarKey(r.getString(0), dataDir)
      val stats = statsCols.zipWithIndex.map { case (c, i) =>
        val mn = if (r.isNullAt(1 + 2 * i)) "null" else r.getLong(1 + 2 * i).toString
        val mx = if (r.isNullAt(2 + 2 * i)) "null" else r.getLong(2 + 2 * i).toString
        s""""$c":[$mn,$mx]"""
      }.mkString(",")
      s"""{"f":"$fileName",$stats}"""
    }
    val body = s"""{"files":[${entries.mkString(",")}]}"""
    val f = fs(spark, path)
    val out = f.create(new Path(path, s"$dataDir.stats.json"), true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  // ~1% false positives at 10 bits/key with 7 probes (the classic
  // k = m/n·ln2 operating point, rounded)
  private val BloomK = 7
  private val BloomBitsPerKey = 10

  private def bloomSize(n: Long): Long = {
    var m = 1024L
    val want = BloomBitsPerKey * math.max(n, 1L)
    while (m < want && m < (1L << 27)) m <<= 1
    m
  }

  /** Per-file Bloom sidecar for equality-predicate file skipping
    * (Iceberg/Delta's bloom file index distilled): one bloom per
    * (file, column), sized at [[BloomBitsPerKey]] bits per row.
    * Probe positions derive from ONE xxhash64 split into two 31-bit
    * halves combined as h1 + i·h2 (the Kirsch-Mitzenmacher
    * double-hashing scheme Guava's BloomFilter uses), so build and
    * probe agree from a single hash evaluation. False negatives are
    * impossible — every row's positions are set — so [[pruneEq]]'s
    * skipping is always sound; a false positive merely scans a file
    * the filter then empties.
    *
    * Scale shape: one scan of the freshly written dir; positions
    * aggregate into per-file bitmaps via
    * [[graft.functions.Bitmap.bitmapBuild]] (map-side partial
    * combine), so the driver handles one bitmap-sized row per written
    * FILE — bounded by the commit's file count × m/8 bytes — never raw
    * values. Integral columns hash through cast("long") so the probe
    * literal's width never matters; strings hash as-is. */
  private def writeBloom(spark: SparkSession, path: String, dataDir: String,
                         bloomCols: Seq[String]): Unit = {
    import spark.implicits._
    val dirPath = new Path(path, dataDir).toString
    val df = spark.read.parquet(dirPath)
    val mDf = df.groupBy(input_file_name().as("__f")).count().collect()
      .map(r => (r.getString(0), bloomSize(r.getLong(1)))).toSeq
      .toDF("__f", "m")
    val enc = java.util.Base64.getEncoder
    bloomCols.foreach { c =>
      val dt = df.schema(c).dataType.typeName
      require(Seq("long", "integer", "short", "byte", "string").contains(dt),
        s"bloom column $c has unsupported type $dt")
      val keyExpr = if (dt == "string") col(c) else col(c).cast("long")
      val rows = df.where(col(c).isNotNull)
        .select(input_file_name().as("__f"), xxhash64(keyExpr).as("h"))
        .join(broadcast(mDf), "__f")
        .select(col("__f"), col("m"), col("h"),
          explode(sequence(lit(0), lit(BloomK - 1))).as("i"))
        .withColumn("h1", col("h").bitwiseAND(lit(0x7fffffffL)))
        .withColumn("h2", shiftrightunsigned(col("h"), 31)
          .bitwiseAND(lit(0x7fffffffL)).bitwiseOR(lit(1L)))
        .withColumn("pos", (col("h1") + col("i") * col("h2")) % col("m"))
        .groupBy("__f")
        .agg(graft.functions.Bitmap.bitmapBuild(col("pos")).as("bits"),
          first("m").as("m"))
        .collect() // one bitmap-sized row per written file
      val entries = rows.map { r =>
        val f = sidecarKey(r.getString(0), dataDir)
        s"""{"f":"$f","m":${r.getLong(2)},"b":"${enc.encodeToString(r.getAs[Array[Byte]](1))}"}"""
      }
      val body = s"""{"col":"$c","k":$BloomK,"files":[${entries.mkString(",")}]}"""
      val out = fs(spark, path).create(new Path(path, s"$dataDir.bloom.$c.json"), true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
  }

  /** Parsed bloom sidecar of one (data dir, column): file → (m, bits).
    * None when the commit recorded no bloom for this column. */
  private def readBloom(spark: SparkSession, path: String, dataDir: String,
      colName: String): Option[Map[String, (Long, Array[Byte])]] = {
    val f = fs(spark, path)
    val p = new Path(path, s"$dataDir.bloom.$colName.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val Pat = """\{"f":"(.*?)","m":(\d+),"b":"([^"]*)"\}""".r
      val dec = java.util.Base64.getDecoder
      Some(Pat.findAllMatchIn(body).map(m =>
        m.group(1) -> (m.group(2).toLong, dec.decode(m.group(3)))).toMap)
    }
  }

  private def bloomContains(m: Long, bits: Array[Byte], h: Long): Boolean = {
    val bm = graft.functions.Bitmap.ChunkedBitmap.deserialize(bits)
    val h1 = h & 0x7fffffffL
    val h2 = ((h >>> 31) & 0x7fffffffL) | 1L
    (0 until BloomK).forall { i =>
      val pos = (h1 + i * h2) % m
      (bm.words.getOrElse(pos >> 6, 0L) & (1L << (pos & 63L).toInt)) != 0L
    }
  }

  /** The probe-side twin of [[writeBloom]]'s xxhash64: the same Spark
    * expression evaluated over a literal on the driver, so build and
    * probe can never drift (integral values widen to long exactly as
    * the build's cast("long") does). */
  private def driverXxHash(value: Any): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLiteral, XxHash64}
    val litE = value match {
      case s: String => CatLiteral(s)
      case b: Byte => CatLiteral(b.toLong)
      case sh: Short => CatLiteral(sh.toLong)
      case i: Int => CatLiteral(i.toLong)
      case l: Long => CatLiteral(l)
      case other => throw new IllegalArgumentException(
        s"bloom probe supports integral and string values, got ${other.getClass}")
    }
    XxHash64(Seq(litE), 42L).eval(null).asInstanceOf[Long]
  }

  /** The file set an equality predicate `col = value` needs from
    * snapshot `asOf`: (kept, skipped) absolute paths. A file is
    * skipped only when its bloom sidecar PROVES the value absent;
    * dirs without a bloom for this column — or files the sidecar does
    * not list — are kept conservatively, the [[pruneRange]] contract.
    * KB-scale driver work: one sidecar read per data dir, no footers
    * touched. */
  def pruneEq(spark: SparkSession, path: String, colName: String,
              value: Any, asOf: Long = 0L): (Seq[String], Seq[String]) = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val (_, dirs) = readManifest(spark, path, id)
    val f = fs(spark, path)
    val h = driverXxHash(value)
    val kept = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    dirs.foreach { d =>
      val dirAbs = new Path(path, d)
      readBloom(spark, path, d, colName) match {
        case None => kept += dirAbs.toString
        case Some(blooms) =>
          val it = f.listFiles(dirAbs, true)
          while (it.hasNext) {
            val fp = it.next().getPath
            if (fp.getName.endsWith(".parquet")) {
              blooms.get(sidecarKey(fp.toString, d)) match {
                case Some((m, bits)) if !bloomContains(m, bits, h) =>
                  skipped += fp.toString
                case _ => kept += fp.toString
              }
            }
          }
      }
    }
    (kept.result(), skipped.result())
  }

  /** Point-lookup read planning ONLY the files whose bloom sidecar
    * might contain `value` ([[pruneEq]]), then applying the equality
    * as a normal filter too — correctness never depends on the
    * sidecar (a bloom-less dir degrades to a filtered scan of that
    * dir, the [[readRange]] degradation contract; a false positive
    * scans one extra file and filters it empty). The needle-in-100-TB
    * read: "fetch document X from the corpus table" opens O(1) files
    * when commits carried `bloomCols`, where min/max stats can prove
    * nothing for a high-cardinality unclustered key. Merge-on-read
    * deletes and the manifest schema compose via [[scanKept]]. */
  def readEq(spark: SparkSession, path: String, colName: String,
             value: Any, asOf: Long = 0L): DataFrame = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val m = readManifestFull(spark, path, id)
    require(m.dirs.nonEmpty, s"snapshot $id of $path lists no data")
    val (kept, _) = pruneEq(spark, path, colName, value, asOf)
    val base =
      if (kept.isEmpty) read(spark, path, asOf).where(lit(false))
      else scanKept(spark, path, m, kept)
    base.where(col(colName) === lit(value))
  }

  private val FileEntryPat = """\{"f":"(.*?)"(.*?)\}""".r

  /** Parsed stats sidecar of one data dir: file → col → (min, max).
    * None when the dir has no sidecar (commit without statsCols). */
  private def readStats(spark: SparkSession, path: String,
      dataDir: String): Option[Map[String, Map[String, (Long, Long)]]] = {
    val f = fs(spark, path)
    val p = new Path(path, s"$dataDir.stats.json")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val ColPat = """"([^"]+)":\[(-?\d+|null),(-?\d+|null)\]""".r
      Some(FileEntryPat.findAllMatchIn(body).map { m =>
        val cols = ColPat.findAllMatchIn(m.group(2)).flatMap { cm =>
          if (cm.group(2) == "null" || cm.group(3) == "null") None
          else Some(cm.group(1) -> (cm.group(2).toLong, cm.group(3).toLong))
        }.toMap
        m.group(1) -> cols
      }.toMap)
    }
  }

  /** The file set a range predicate `lo <= col <= hi` needs from
    * snapshot `asOf`: (kept, skipped) as absolute paths. A file is
    * skipped only when its sidecar PROVES disjointness
    * (max < lo or min > hi); files in dirs without stats — or without
    * this column's stats, or with an all-null bound — are kept
    * conservatively. Exposed so callers (and the spec) can count what
    * planning actually skipped. */
  def pruneRange(spark: SparkSession, path: String, colName: String,
                 lo: Long, hi: Long, asOf: Long = 0L): (Seq[String], Seq[String]) = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val (_, dirs) = readManifest(spark, path, id)
    val f = fs(spark, path)
    val kept = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    dirs.foreach { d =>
      val dirAbs = new Path(path, d)
      readStats(spark, path, d) match {
        case None => kept += dirAbs.toString
        case Some(stats) =>
          // recursive: a hive-partitioned commit's files live under
          // <dir>/<col>=<val>/…, one level (or more) down
          val it = f.listFiles(dirAbs, true)
          while (it.hasNext) {
            val fp = it.next().getPath
            if (fp.getName.endsWith(".parquet")) {
              stats.get(sidecarKey(fp.toString, d)).flatMap(_.get(colName)) match {
                case Some((mn, mx)) if mx < lo || mn > hi => skipped += fp.toString
                case _ => kept += fp.toString
              }
            }
          }
      }
    }
    (kept.result(), skipped.result())
  }

  /** Range read with MANIFEST-LEVEL file skipping: plan only the files
    * [[pruneRange]] keeps, then apply the predicate as a normal filter
    * too (row-group pruning inside kept files, and correctness never
    * depends on the sidecar — a stats-less dir degrades to a filtered
    * full scan of that dir). This is what makes
    * [[graft.operators.Layout.writeClustered]]-style commits cheap to
    * probe: a clustered table's files cover disjoint key ranges, so a
    * point/range query opens O(matching) files at any table size. */
  def readRange(spark: SparkSession, path: String, colName: String,
                lo: Long, hi: Long, asOf: Long = 0L): DataFrame = {
    val (kept, _) = pruneRange(spark, path, colName, lo, hi, asOf)
    require(kept.nonEmpty || pruneRange(spark, path, colName, Long.MinValue,
      Long.MaxValue, asOf)._1.nonEmpty, s"snapshot of $path lists no data")
    val id = if (asOf > 0) asOf else latest(spark, path)
    val m = readManifestFull(spark, path, id)
    val base =
      if (kept.isEmpty)
        // every file provably disjoint: an empty frame with the right schema
        read(spark, path, asOf).where(lit(false))
      else scanKept(spark, path, m, kept)
    base.where(col(colName).cast("long") >= lo && col(colName).cast("long") <= hi)
  }

  /** Scan an explicit kept file/root list under snapshot manifest `m`:
    * paths group by the data dir they came from and scan per dir —
    * merge-on-read deletes scope by dir, partitioned dirs need their
    * own `basePath` so pruned leaf files recover their
    * partition-column values, and every scan plans under the MANIFEST
    * schema (the read() discipline — a plan spanning pre-/
    * post-evolution dirs must return ONE schema, with absent columns
    * null-backfilled, never whatever each footer happens to hold).
    * The shared tail of every pruned read ([[readRange]],
    * [[readPartition]], [[readEq]]). */
  private def scanKept(spark: SparkSession, path: String, m: Manifest,
                       kept: Seq[String]): DataFrame = {
    val RelDir = ".*/(data/s\\d+)(?:/.*)?$".r
    kept.groupBy { p => p match { case RelDir(d) => d; case _ => p } }
      .toSeq.sortBy(_._1)
      .map { case (relDir, files) =>
        val reader = m.schema.fold(spark.read)(s => spark.read.schema(s))
        val df = reader
          .option("basePath", new Path(path, relDir).toString)
          .parquet(files: _*)
        applyDelFiles(spark, path,
          m.dels.filter(_.over.contains(relDir)).map(_.file), df)
      }
      .reduce(_ unionByName _)
  }

  /** Directory-level partition pruning for an equality predicate on a
    * hive-partitioned column: (kept, skipped) scan roots across
    * snapshot `asOf`'s data dirs. A dir whose immediate children are
    * `colName=<val>` subdirs keeps only the matching child (a missing
    * child contributes nothing — provably empty); a flat dir — or one
    * partitioned by some OTHER column — is kept whole, the
    * conservative direction, exactly [[pruneRange]]'s contract for
    * missing stats. KB-scale driver listing work (one listStatus per
    * data dir), no file footers touched. */
  def prunePartitions(spark: SparkSession, path: String, colName: String,
                      value: String, asOf: Long = 0L): (Seq[String], Seq[String]) = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val m = readManifestFull(spark, path, id)
    val f = fs(spark, path)
    val kept = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    val prefix = s"$colName="
    m.dirs.foreach { d =>
      val dirAbs = new Path(path, d)
      val children = f.listStatus(dirAbs)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      if (children.isEmpty) kept += dirAbs.toString
      else children.foreach { st =>
        if (st.getPath.getName == s"$prefix$value") kept += st.getPath.toString
        else skipped += st.getPath.toString
      }
    }
    (kept.result(), skipped.result())
  }

  /** Equality read on a partition column planning ONLY the matching
    * partition directories ([[prunePartitions]]), then applying the
    * predicate as a normal filter too — correctness never depends on
    * the layout (a flat dir degrades to a filtered scan of that dir),
    * the [[readRange]] degradation contract. Merge-on-read deletes
    * apply per source dir; every scan carries the manifest schema and
    * its dir's `basePath` so partition values survive subdir-rooted
    * scans. */
  def readPartition(spark: SparkSession, path: String, colName: String,
                    value: String, asOf: Long = 0L): DataFrame = {
    val id = if (asOf > 0) asOf else latest(spark, path)
    val m = readManifestFull(spark, path, id)
    require(m.dirs.nonEmpty, s"snapshot $id of $path lists no data")
    val (kept, _) = prunePartitions(spark, path, colName, value, asOf)
    val base =
      if (kept.isEmpty) read(spark, path, asOf).where(lit(false))
      else scanKept(spark, path, m, kept)
    base.where(col(colName).cast("string") === value)
  }

  /** The rows snapshot `id` ADDED over its parent — the delta an
    * incremental consumer (index append, materialized-view refresh,
    * downstream CDC) processes instead of rescanning the table. For an
    * append commit this is exactly the appended directory set; for an
    * overwrite it is the whole new snapshot (dir sets are disjoint by
    * construction — every commit writes a fresh `data/s<id>`). */
  def deltaOf(spark: SparkSession, path: String, id: Long): DataFrame = {
    val m = readManifestFull(spark, path, id)
    val (dirs, schema) = (m.dirs, m.schema)
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
    // The delta reads under the snapshot's schema too, so incremental
    // consumers see the same column set a full read would.
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    reader.parquet(added.map(d => new Path(path, d).toString): _*)
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

  /** Roll the table back to an earlier snapshot's state — as a NEW
    * commit whose manifest replicates the target's dirs, delete files,
    * and schema (Iceberg rollback semantics: history is append-only,
    * so "undo" is a forward commit referencing old data; ZERO data
    * movement — manifests are KB-scale). The bad commits stay time
    * travelable until vacuumed; readers flip atomically with the
    * manifest rename. */
  def rollback(spark: SparkSession, path: String, toId: Long): Long = {
    val target = readManifestFull(spark, path, toId)
    require(target.dirs.nonEmpty, s"snapshot $toId of $path lists no data")
    val id = latest(spark, path) + 1
    installManifest(spark, path, id, "rollback", target.dirs, target.dels,
      target.schema.getOrElse(read(spark, path, toId).schema))
    id
  }

  /** Tag a snapshot with a stable name — the reproducibility handle
    * ("trained on tag `corpus-2026-08-14`") that outlives id
    * arithmetic: tags PROTECT their snapshot from [[vacuum]] (its
    * manifest, data dirs, and delete files survive any keepFrom until
    * the tag is dropped), exactly Iceberg's tag retention contract.
    * One tiny exclusive-create file per tag; re-tagging a name fails
    * rather than silently moving it (drop first — an audit trail
    * should see the move). */
  def tag(spark: SparkSession, path: String, name: String, id: Long = 0L): Long = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid tag name: $name")
    val target = if (id > 0) id else latest(spark, path)
    // existence check (readManifestFull throws on a dangling target)
    readManifestFull(spark, path, target)
    val f = fs(spark, path)
    val p = new Path(metaDir(path), s"tag.$name.json")
    if (f.exists(p))
      throw new IllegalStateException(s"tag $name already exists under $path")
    val out = f.create(p, false)
    try out.write(s"""{"snapshot":$target}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    target
  }

  def dropTag(spark: SparkSession, path: String, name: String): Unit =
    fs(spark, path).delete(new Path(metaDir(path), s"tag.$name.json"), false)

  /** All tags: name → snapshot id. */
  def tags(spark: SparkSession, path: String): Map[String, Long] = {
    val f = fs(spark, path)
    val md = metaDir(path)
    val TagPat = "tag\\.(.+)\\.json".r
    val IdPat = "\"snapshot\":(\\d+)".r
    if (!f.exists(md)) Map.empty
    else f.listStatus(md).map(_.getPath).flatMap { p =>
      p.getName match {
        case TagPat(name) =>
          val in = f.open(p)
          val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                     finally in.close()
          IdPat.findFirstMatchIn(body).map(m => name -> m.group(1).toLong)
        case _ => None
      }
    }.toMap
  }

  /** Read the snapshot a tag names. */
  def readTag(spark: SparkSession, path: String, name: String): DataFrame = {
    val id = tags(spark, path).getOrElse(name,
      throw new IllegalArgumentException(s"no tag $name under $path"))
    read(spark, path, id)
  }

  /** The op recorded for one snapshot ("overwrite" / "append" /
    * "delete" / "compact" / "rollback") — the dispatch signal
    * incremental consumers ([[graft.operators.IndexSync]]) use to
    * decide between delta-advance and rebuild. */
  def opOf(spark: SparkSession, path: String, id: Long): String =
    readManifestFull(spark, path, id).op

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
    // Tagged snapshots are PINNED: their manifests (and hence their
    // dirs and delete files, via the surviving-reference sweep below)
    // survive any keepFrom until the tag is dropped.
    val tagged = tags(spark, path).values.toSet
    ids.filter(id => id < keepFrom && !tagged.contains(id)).foreach { id =>
      f.delete(new Path(metaDir(path), s"v$id.json"), false)
    }
    val surviving = ids.filter(id => id >= keepFrom || tagged.contains(id))
      .map(id => readManifestFull(spark, path, id))
    val live = surviving.flatMap(_.dirs).toSet
    val liveDels = surviving.flatMap(_.dels.map(_.file)).toSet
    val dataRoot = new Path(path, "data")
    // A sidecar (`sN.stats.json`, `sN.bloom.<col>.json`) shares its
    // data dir's lifetime: live iff `data/sN` is live (it is metadata
    // OF that dir, and pruning degrades gracefully without it, so the
    // conservative rule is simply dir-coupled deletion).
    val SidecarPat = """^(s\d+)\..+\.json$""".r
    def liveName(n: String) =
      live.contains(s"data/$n") ||
        (n match {
          case SidecarPat(base) => live.contains(s"data/$base")
          case _ => false
        })
    val dead = f.listStatus(dataRoot).map(_.getPath)
      .filter(p => !liveName(p.getName))
    dead.foreach(p => f.delete(p, true))
    // Delete files expire exactly like data dirs: referenced by no
    // surviving manifest → reclaimed.
    val delRoot = new Path(path, "deletes")
    val deadDels =
      if (!f.exists(delRoot)) Array.empty[Path]
      else f.listStatus(delRoot).map(_.getPath)
        .filter(p => !liveDels.contains(s"deletes/${p.getName}"))
    deadDels.foreach(p => f.delete(p, true))
    // Report reclaimed data DIRS (sidecars — stats AND bloom — ride
    // along and would double-count the same reclaim).
    dead.count(p => SidecarPat.findFirstIn(p.getName).isEmpty)
  }
}
