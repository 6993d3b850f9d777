package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Branches over the [[Snapshots]] table layer (q199) — lakeFS/Nessie
  * semantics distilled to the append workflow that dominates corpus
  * engineering: fork the table, land experimental batches in
  * isolation, merge back with ZERO data movement or throw the whole
  * branch away.
  *
  * Design: a branch is its own [[Snapshots]] table rooted at
  * `<table>/branches/<name>` holding ONLY the rows added on the
  * branch, plus a marker pinning the MAIN snapshot it forked from.
  * Reads compose `main asOf base ∪ branch` — time travel gives the
  * fork isolation for free (main may advance; the branch keeps seeing
  * its base). Merge is METADATA-ONLY: manifest dir entries are
  * table-root-relative strings, so main's merge commit simply
  * REFERENCES the branch's data dirs (`branches/<name>/data/sN`) —
  * one CAS manifest install, no bytes copied, exactly how lakeFS
  * merges objects.
  *
  * Merge safety (validate-and-retry, the [[Snapshots.append]]
  * protocol): both sides must be APPEND-ONLY since the fork — a
  * row-mutating op on either side (overwrite, delete, compact,
  * OPTIMIZE) makes "merge = union of additions" wrong, so it fails
  * clean instead of guessing; schemas must match exactly. Losing the
  * CAS to a concurrent append revalidates and retries; losing to
  * anything else propagates the conflict. A MERGED branch's dirs are
  * referenced by main, so [[drop]] refuses to delete them. */
object Branches {

  private val NamePat = "[A-Za-z0-9._-]+".r

  private def branchRoot(path: String, name: String) = s"$path/branches/$name"

  private def markerPath(path: String, name: String) =
    new Path(branchRoot(path, name), "BRANCH.json")

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val BasePat = """"base":(\d+)""".r
  private val MergedPat = """"merged":(true|false)""".r

  private def readMarker(spark: SparkSession, path: String,
      name: String): (Long, Boolean) = {
    val f = fs(spark, path)
    val p = markerPath(path, name)
    require(f.exists(p), s"branch $name does not exist under $path")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    (BasePat.findFirstMatchIn(body).map(_.group(1).toLong).getOrElse(0L),
      MergedPat.findFirstMatchIn(body).exists(_.group(1) == "true"))
  }

  private def writeMarker(spark: SparkSession, path: String, name: String,
      base: Long, merged: Boolean): Unit = {
    val f = fs(spark, path)
    val out = f.create(markerPath(path, name), true)
    try out.write(s"""{"branch":"$name","base":$base,"merged":$merged}"""
      .getBytes("UTF-8")) finally out.close()
  }

  /** Fork a branch at main's current snapshot. Returns the base id. */
  def create(spark: SparkSession, path: String, name: String): Long = {
    require(NamePat.pattern.matcher(name).matches(),
      s"branch name must match ${NamePat.regex}, got '$name'")
    val f = fs(spark, path)
    require(!f.exists(markerPath(path, name)),
      s"branch $name already exists under $path")
    val base = Snapshots.latest(spark, path)
    writeMarker(spark, path, name, base, merged = false)
    base
  }

  /** Append rows on the branch — a normal [[Snapshots.append]] on the
    * branch's own table; main is untouched. */
  def append(df: DataFrame, path: String, name: String): Long = {
    val (_, merged) = readMarker(df.sparkSession, path, name)
    require(!merged, s"branch $name is already merged")
    Snapshots.append(df, branchRoot(path, name))
  }

  /** Branch view: main as of the fork point ∪ branch additions. */
  def read(spark: SparkSession, path: String, name: String): DataFrame = {
    val (base, _) = readMarker(spark, path, name)
    val shadowHead = Snapshots.latest(spark, branchRoot(path, name))
    val parts =
      (if (base > 0) Seq(Snapshots.read(spark, path, base)) else Seq.empty) ++
      (if (shadowHead > 0)
        Seq(Snapshots.read(spark, branchRoot(path, name))) else Seq.empty)
    require(parts.nonEmpty, s"branch $name of $path has no data")
    parts.reduce(_ unionByName _)
  }

  private def appendOnly(spark: SparkSession, root: String,
      ids: Seq[Long]): Boolean =
    ids.forall(id => Snapshots.opOf(spark, root, id) == "append")

  /** Merge the branch into main: one metadata-only commit referencing
    * the branch's data dirs. Fails with [[CommitConflictException]]
    * when either side mutated rows since the fork or schemas diverged;
    * retries (revalidating) when it merely loses the CAS to a
    * concurrent append. Returns main's new snapshot id. */
  def merge(spark: SparkSession, path: String, name: String,
      maxAttempts: Int = 5): Long = {
    val (base, merged) = readMarker(spark, path, name)
    require(!merged, s"branch $name is already merged")
    val root = branchRoot(path, name)
    val shadowHead = Snapshots.latest(spark, root)
    require(shadowHead > 0, s"branch $name has no commits to merge")
    if (!appendOnly(spark, root, Snapshots.snapshotIds(spark, root)))
      throw new CommitConflictException(
        s"merge conflict: branch $name has row-mutating commits")
    val branchDf = Snapshots.read(spark, root)
    val branchDirs = Snapshots.dirsOf(spark, root, shadowHead)
      .map(d => s"branches/$name/$d")

    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      val head = Snapshots.latest(spark, path)
      val mainSince = ((base + 1) to head)
      if (!appendOnly(spark, path, mainSince))
        throw new CommitConflictException(
          s"merge conflict: main mutated rows since branch $name forked " +
            s"(snapshots ${mainSince.mkString(",")})")
      if (head > 0) {
        val mainSchema = Snapshots.read(spark, path, head).schema
        if (mainSchema != branchDf.schema)
          throw new CommitConflictException(
            s"merge conflict: branch $name schema diverged from main")
      }
      try {
        // commit onto the VALIDATED head: a rival landing after the
        // validation read above makes the manifest CAS clash at
        // head+1 and re-enters this revalidating loop, instead of
        // being silently rebased over unvalidated (r17 TOCTOU fix)
        val id = Snapshots.commitDirs(spark, path, s"merge:$name",
          branchDirs, branchDf.schema, expectedParent = head)
        writeMarker(spark, path, name, base, merged = true)
        return id
      } catch {
        case e: CommitConflictException => last = e // lost the CAS: revalidate
      }
    }
    throw last
  }

  /** Delete an UNMERGED branch — marker, manifests, and data dirs.
    * Refuses on a merged branch: main references its dirs.
    *
    * The merged marker is NOT trusted alone (r17): merge's manifest
    * install and its marker write are two non-atomic steps, so a crash
    * between them leaves main referencing `branches/<name>/data/sN`
    * while the marker still says unmerged — and a marker-only check
    * would then delete dirs main's manifests list (data loss on the
    * MAIN table). Ground truth is main's manifest history itself:
    * refuse whenever ANY main snapshot references a dir under this
    * branch root. O(#snapshots) manifest reads, metadata-only. */
  def drop(spark: SparkSession, path: String, name: String): Unit = {
    val (_, merged) = readMarker(spark, path, name)
    require(!merged,
      s"branch $name is merged: its data dirs are referenced by main")
    val prefix = s"branches/$name/"
    val referenced = Snapshots.snapshotIds(spark, path).filter { id =>
      Snapshots.dirsOf(spark, path, id).exists(_.startsWith(prefix))
    }
    require(referenced.isEmpty,
      s"branch $name dirs are referenced by main snapshot(s) " +
        s"${referenced.mkString(",")} (marker says unmerged — torn merge?); " +
        "refusing to delete data main can read")
    fs(spark, path).delete(new Path(branchRoot(path, name)), true)
    ()
  }

  /** One row per branch: name, base, merged, branch-only commits. */
  def list(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, path)
    val dir = new Path(path, "branches")
    val rows =
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq.filter(_.isDirectory).map { st =>
        val name = st.getPath.getName
        val (base, merged) = readMarker(spark, path, name)
        (name, base, merged,
          Snapshots.snapshotIds(spark, branchRoot(path, name)).size.toLong)
      }
    rows.toDF("branch", "base", "merged", "n_commits").orderBy("branch")
  }
}
