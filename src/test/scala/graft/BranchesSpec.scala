package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.{Branches, CommitConflictException, Snapshots}

/** Branch/merge lifecycle (q199): isolation, zero-copy merge, clean
  * conflicts, and the validate-and-retry race with a concurrent
  * append. */
class BranchesSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_branch_spec_$tag"
    val hp = new Path(p)
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(hp)) f.delete(hp, true)
    p
  }

  private def docs(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

  private def dataDirs(path: String): Set[String] = {
    val hp = new Path(path, "data")
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(hp)) Set.empty
    else f.listStatus(hp).map(_.getPath.getName).toSet
  }

  test("branch lifecycle: isolation, zero-copy merge, merged view") {
    val path = freshPath("life")
    Snapshots.overwrite(docs(0, 10), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(100, 105), path, "dev")
    Snapshots.append(docs(200, 203), path) // main advances past the fork

    // isolation both ways
    val branchIds = Branches.read(spark, path, "dev")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(branchIds == ((0L until 10L) ++ (100L until 105L)).toSet,
      s"branch view must not see main's post-fork append: $branchIds")
    val mainIds = Snapshots.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mainIds == ((0L until 10L) ++ (200L until 203L)).toSet,
      s"main must not see branch rows before merge: $mainIds")

    val mainDirsBefore = dataDirs(path)
    val mergeId = Branches.merge(spark, path, "dev")
    assert(dataDirs(path) == mainDirsBefore,
      "merge must be metadata-only: no new dir under main's data/")
    assert(Snapshots.opOf(spark, path, mergeId) == "merge:dev")
    val merged = Snapshots.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(merged ==
      ((0L until 10L) ++ (100L until 105L) ++ (200L until 203L)).toSet)
    // merged branch is frozen: no more appends, no drop
    intercept[IllegalArgumentException] {
      Branches.append(docs(300, 301), path, "dev")
    }
    intercept[IllegalArgumentException] { Branches.drop(spark, path, "dev") }
    intercept[IllegalArgumentException] { Branches.merge(spark, path, "dev") }
  }

  test("merge fails clean when main mutated rows since the fork") {
    val path = freshPath("conflict_main")
    Snapshots.overwrite(docs(0, 10), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(100, 102), path, "dev")
    Snapshots.deleteWhere(spark, path, col("doc_id") === 3L, "doc_id")
    val before = Snapshots.latest(spark, path)
    intercept[CommitConflictException] { Branches.merge(spark, path, "dev") }
    assert(Snapshots.latest(spark, path) == before, "failed merge must not commit")
    // the unmerged branch can still be dropped, data dirs and all
    Branches.drop(spark, path, "dev")
    intercept[IllegalArgumentException] { Branches.read(spark, path, "dev") }
  }

  test("merge fails clean when the BRANCH mutated rows") {
    val path = freshPath("conflict_branch")
    Snapshots.overwrite(docs(0, 10), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(100, 105), path, "dev")
    Snapshots.deleteWhere(spark, s"$path/branches/dev",
      col("doc_id") === 101L, "doc_id")
    intercept[CommitConflictException] { Branches.merge(spark, path, "dev") }
  }

  test("merge fails clean when the branch schema diverged") {
    val path = freshPath("conflict_schema")
    Snapshots.overwrite(docs(0, 5), path)
    Branches.create(spark, path, "dev")
    Branches.append(
      docs(100, 102).withColumn("extra", lit(1L)), path, "dev")
    intercept[CommitConflictException] { Branches.merge(spark, path, "dev") }
  }

  test("merge losing the CAS to a concurrent append rebases over it") {
    val path = freshPath("race")
    Snapshots.overwrite(docs(0, 5), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(100, 102), path, "dev")
    var fired = false
    Snapshots.onCommitAttempt = () => {
      if (!fired) {
        fired = true
        val saved = Snapshots.onCommitAttempt
        Snapshots.onCommitAttempt = () => ()
        try Snapshots.append(docs(200, 201), path)
        finally Snapshots.onCommitAttempt = saved
      }
    }
    try {
      val id = Branches.merge(spark, path, "dev")
      assert(Snapshots.opOf(spark, path, id) == "merge:dev")
    } finally Snapshots.onCommitAttempt = () => ()
    val ids = Snapshots.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ((0L until 5L) ++ (100L until 102L) ++ (200L until 201L)).toSet,
      s"both the rival append and the merge must survive: $ids")
  }

  test("merge racing a row-MUTATING rival fails clean instead of silently " +
    "rebasing over it (commitDirs TOCTOU): main keeps the rival's content") {
    val path = freshPath("racemut")
    Snapshots.overwrite(docs(0, 5), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(100, 102), path, "dev")
    // rival OVERWRITE lands between merge's validation read and its
    // manifest install — the window where the old latest-re-read in
    // commitDirs adopted the rival as parent without re-validation
    var fired = false
    Snapshots.onCommitAttempt = () => {
      if (!fired) {
        fired = true
        val saved = Snapshots.onCommitAttempt
        Snapshots.onCommitAttempt = () => ()
        try Snapshots.overwrite(docs(500, 503), path)
        finally Snapshots.onCommitAttempt = saved
      }
    }
    try {
      intercept[CommitConflictException] {
        Branches.merge(spark, path, "dev")
      }
    } finally Snapshots.onCommitAttempt = () => ()
    val ids = Snapshots.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == (500L until 503L).toSet,
      s"main must be exactly the rival overwrite — no silent merge over it: $ids")
    val (_, merged) = {
      val l = Branches.list(spark, path).collect()
        .map(r => r.getString(0) -> r.getBoolean(2)).toMap
      ("dev", l("dev"))
    }
    assert(!merged, "failed merge must not mark the branch merged")
  }

  test("drop refuses a TORN merge (manifest installed, marker write lost): " +
    "main's manifests are ground truth, not the marker") {
    val path = freshPath("torn")
    Snapshots.overwrite(docs(0, 3), path)
    Branches.create(spark, path, "dev")
    Branches.append(docs(50, 52), path, "dev")
    Branches.merge(spark, path, "dev")
    // simulate the crash window: manifest landed, marker write lost —
    // rewrite the marker back to merged=false
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mk = new Path(s"$path/branches/dev/BRANCH.json")
    val out = f.create(mk, true)
    try out.write("""{"branch":"dev","base":1,"merged":false}""".getBytes("UTF-8"))
    finally out.close()
    val ex = intercept[IllegalArgumentException] {
      Branches.drop(spark, path, "dev")
    }
    assert(ex.getMessage.contains("referenced by main"), ex.getMessage)
    // main's data is intact: the branch rows are still readable
    val ids = Snapshots.read(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ((0L until 3L) ++ (50L until 52L)).toSet, s"got $ids")
  }

  test("branch listing reports base, merge state, commit count") {
    val path = freshPath("list")
    Snapshots.overwrite(docs(0, 3), path)
    Branches.create(spark, path, "a")
    Branches.append(docs(10, 12), path, "a")
    Branches.create(spark, path, "b")
    val l = Branches.list(spark, path).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(l("a") == ((1L, false, 1L)), s"got $l")
    assert(l("b") == ((1L, false, 0L)), s"got $l")
  }
}
