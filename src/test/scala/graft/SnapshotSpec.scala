package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Snapshots

/** The snapshot layer's contract: immutable history, atomic commits,
  * conservative vacuum. */
class SnapshotSpec extends SparkSpec {

  private def freshPath(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_snapspec_$tag"
    val hp = new Path(p)
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(hp)) f.delete(hp, true)
    p
  }

  test("sidecar type validation rejects BEFORE the data write: a DATE statsCol " +
    "(and a float bloomCol) commit throws and leaves NO orphan data dir") {
    import spark.implicits._
    val path = freshPath("statsreject")
    val df = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 0.5))
      .toDF("id", "d", "x")
    intercept[IllegalArgumentException] {
      Snapshots.overwrite(df, path, statsCols = Seq("d"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.overwrite(df, path, bloomCols = Seq("x"))
    }
    val hp = new Path(path)
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans = if (!f.exists(new Path(path, "data"))) Seq.empty
      else f.listStatus(new Path(path, "data")).toSeq
    assert(orphans.isEmpty, s"rejected commit still wrote data dirs: $orphans")
    // and a valid commit on the same table still goes through
    Snapshots.overwrite(df.select($"id", $"x"), path, statsCols = Seq("id"))
    assert(Snapshots.read(spark, path).count() == 1)
  }

  test("append chains onto the parent; every historical snapshot stays readable unchanged") {
    import spark.implicits._
    val path = freshPath("chain")
    val base = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
    val delta = Seq((3L, 30L)).toDF("doc_id", "n_chars")
    assert(Snapshots.overwrite(base, path) == 1L)
    assert(Snapshots.append(delta, path) == 2L)
    val v1 = Snapshots.read(spark, path, 1L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v2 = Snapshots.read(spark, path, 2L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1 == Set((1L, 10L), (2L, 20L)))
    assert(v2 == Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // Default read = latest.
    assert(Snapshots.read(spark, path).count() == 3L)
    // A merge commit rewrites forward; v2 is untouched (time travel is
    // the reproducibility contract: "trained on v2" must re-read v2).
    Snapshots.mergeCommit(path,
      Seq((2L, 999L)).toDF("doc_id", "n_chars"), "doc_id")
    val v3 = Snapshots.read(spark, path, 3L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v3 == Set((1L, 10L), (2L, 999L), (3L, 30L)))
    assert(Snapshots.read(spark, path, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == v2,
      "history mutated by a later commit")
    assert(Snapshots.log(spark, path).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq.sortBy(_._1) == Seq((1L, "overwrite"), (2L, "append"), (3L, "overwrite")))
  }

  test("a torn (un-renamed) manifest is invisible; commit ids advance past it only on rename") {
    import spark.implicits._
    val path = freshPath("torn")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)
    // Simulate a writer that crashed before rename: temp manifest present.
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/meta/.v2.json.tmp")
    val out = f.create(tmp, true)
    out.write("{\"snapshot\":2,\"op\":\"append\",\"dirs\":[\"data/s2\"]}".getBytes("UTF-8"))
    out.close()
    assert(Snapshots.latest(spark, path) == 1L, "a torn manifest became visible")
    assert(Snapshots.read(spark, path).count() == 1L)
  }

  test("an orphan data dir (crash between data-write and manifest-rename) " +
    "never wedges the next commit; the gapped history stays fully operable") {
    import spark.implicits._
    val path = freshPath("orphan")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)
    // Simulate the crash: data/s2 written, v2.json never renamed in.
    Seq((99L, 99L)).toDF("doc_id", "n_chars")
      .write.parquet(s"$path/data/s2")
    // The r13 allocation re-derived dir id 2 from manifests alone and
    // died on errorifexists forever; DIR allocation now steps past the
    // orphan (data lands in s3) while the MANIFEST id stays the dense
    // version sequence (v2 — the CAS contract, see nextId's doc).
    val id = Snapshots.append(Seq((3L, 30L)).toDF("doc_id", "n_chars"), path)
    assert(id == 2L, s"manifest ids must stay dense, got id $id")
    val f2 = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f2.exists(new Path(s"$path/data/s3")), "dir allocation must step past the orphan")
    // The orphan's rows are NOT part of any snapshot.
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // History walks stay operable around the orphan: log, deltaOf, vacuum.
    assert(Snapshots.log(spark, path).collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(Snapshots.deltaOf(spark, path, 2L).collect().map(_.getLong(0)).toSeq == Seq(3L))
    // vacuum reclaims the orphan (no surviving manifest references it).
    val removed = Snapshots.vacuum(spark, path, keepFrom = 1L)
    assert(removed == 1, s"expected the orphan dir reclaimed, removed=$removed")
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("manifest column stats: a range read PLANS only intersecting files, " +
    "answers exactly, degrades conservatively without stats, and vacuum " +
    "couples sidecar lifetime to its data dir") {
    import spark.implicits._
    val path = freshPath("stats")
    // Clustered commit: 8 range-partitioned files over doc_id 0..799,
    // so each file covers a ~100-id band — the writeClustered shape.
    val docs = (0L until 800L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
      .repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
    Snapshots.overwrite(docs, path, statsCols = Seq("doc_id"))
    val (kept, skipped) = Snapshots.pruneRange(spark, path, "doc_id", 150L, 249L)
    assert(skipped.size >= 5,
      s"range probe should skip most of 8 clustered files; skipped=${skipped.size}")
    assert(kept.nonEmpty && kept.size + skipped.size == 8)
    // exactness: pruned read == filtered full read
    val got = Snapshots.readRange(spark, path, "doc_id", 150L, 249L)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (150L to 249L).toSeq, "pruned read lost or invented rows")
    // an APPEND WITHOUT stats stays conservatively un-pruned but correct
    Snapshots.append(Seq((900L, 1L)).toDF("doc_id", "n_chars"), path)
    val (kept2, skipped2) = Snapshots.pruneRange(spark, path, "doc_id", 150L, 249L)
    assert(kept2.exists(_.contains("data/s2")), "stats-less dir must be kept whole")
    assert(skipped2.size == skipped.size)
    assert(Snapshots.readRange(spark, path, "doc_id", 150L, 249L).count() == 100L)
    assert(Snapshots.readRange(spark, path, "doc_id", 900L, 900L).count() == 1L)
    // a fully-disjoint range returns empty, not an error
    assert(Snapshots.readRange(spark, path, "doc_id", 5000L, 6000L).count() == 0L)
    // vacuum to the latest snapshot: s1 (and ITS sidecar) die together;
    // re-prune still works (no stats anywhere now — all conservative)
    val v3 = Snapshots.overwrite(Seq((1L, 1L)).toDF("doc_id", "n_chars"), path)
    assert(Snapshots.vacuum(spark, path, keepFrom = v3) == 2)
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$path/data/s1.stats.json")),
      "dead dir's stats sidecar survived vacuum")
    assert(Snapshots.readRange(spark, path, "doc_id", 0L, 10L).count() == 1L)
  }

  test("schema evolution: an added column null-backfills old files on read, " +
    "history keeps its own schema, type changes are rejected") {
    import spark.implicits._
    val path = freshPath("evolve")
    Snapshots.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars"), path)
    // v2 appends WITH a new column
    Snapshots.append(Seq((3L, 30L, "en")).toDF("doc_id", "n_chars", "lang"), path)
    val v2 = Snapshots.read(spark, path, 2L)
    assert(v2.columns.toSeq == Seq("doc_id", "n_chars", "lang"),
      s"merged schema wrong: ${v2.columns.toSeq}")
    val rows = v2.collect().map(r => (r.getLong(0),
      if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(rows == Map(1L -> null, 2L -> null, 3L -> "en"),
      "old files must read NULL for the added column")
    // time travel: v1 still reads with v1's 2-column schema
    assert(Snapshots.read(spark, path, 1L).columns.toSeq == Seq("doc_id", "n_chars"))
    // the delta carries the snapshot schema as well
    assert(Snapshots.deltaOf(spark, path, 2L).columns.toSeq ==
      Seq("doc_id", "n_chars", "lang"))
    // a delta MISSING a parent column null-fills its own rows only
    Snapshots.append(Seq((4L, 40L)).toDF("doc_id", "n_chars"), path)
    val v3 = Snapshots.read(spark, path, 3L).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(v3 == Map(1L -> null, 2L -> null, 3L -> "en", 4L -> null))
    // same-name different-type is rejected — that's a rewrite, not an append
    val ex = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((5L, "wide")).toDF("doc_id", "n_chars"), path)
    }
    assert(ex.getMessage.contains("n_chars"))
  }

  test("merge-on-read deletes: tombstones hide rows without rewriting data, " +
    "scope excludes later appends, compact folds them in, vacuum reclaims") {
    import spark.implicits._
    val path = freshPath("mor")
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.overwrite(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("doc_id", "n_chars"), path)
    // v2: delete two keys — data files untouched, one delete file written
    val v2 = Snapshots.deleteWhere(spark, path, col("doc_id").isin(2L, 3L), "doc_id")
    assert(v2 == 2L)
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(Snapshots.read(spark, path, 1L).count() == 4L, "time travel lost pre-delete rows")
    assert(f.exists(new Path(s"$path/data/s1")), "delete must not rewrite data")
    assert(f.exists(new Path(s"$path/deletes/d2")))
    // v3: append RE-INSERTS key 2 — the delete's scope predates this
    // dir, so the new row survives (sequence-number semantics)
    Snapshots.append(Seq((2L, 222L)).toDF("doc_id", "n_chars"), path)
    val v3rows = Snapshots.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v3rows == Map(1L -> 10L, 2L -> 222L, 4L -> 40L),
      s"re-inserted key must survive the older tombstone: $v3rows")
    // stacked delete on the new state: kills BOTH the old dir's 4 and
    // would kill a matching row in the appended dir
    Snapshots.deleteWhere(spark, path, col("doc_id") === 4L, "doc_id")
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // readRange honors tombstones too (stats present on no dir -> conservative)
    assert(Snapshots.readRange(spark, path, "doc_id", 0L, 100L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // compact: content identical, fresh single data dir, no dels
    val vc = Snapshots.compact(spark, path)
    assert(Snapshots.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 10L, 2L -> 222L))
    assert(Snapshots.log(spark, path).collect().map(_.getString(1)).toSeq ==
      Seq("overwrite", "delete", "append", "delete", "compact"))
    // vacuum to the compacted snapshot reclaims superseded dirs AND
    // both delete files
    Snapshots.vacuum(spark, path, keepFrom = vc)
    assert(!f.exists(new Path(s"$path/deletes/d2")) &&
      !f.exists(new Path(s"$path/deletes/d4")),
      "expired delete files survived vacuum")
    assert(Snapshots.read(spark, path).count() == 2L)
  }

  test("tags: named refs read their snapshot, pin it through vacuum, and " +
    "names are exclusive until dropped") {
    import spark.implicits._
    val path = freshPath("tags")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)
    Snapshots.tag(spark, path, "train-v1") // defaults to latest (=1)
    Snapshots.overwrite(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path)
    Snapshots.overwrite(Seq((3L, 30L)).toDF("doc_id", "n_chars"), path)
    assert(Snapshots.tags(spark, path) == Map("train-v1" -> 1L))
    assert(Snapshots.readTag(spark, path, "train-v1")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // vacuum to 3 would normally drop v1 and v2; the tag pins v1
    val removed = Snapshots.vacuum(spark, path, keepFrom = 3L)
    assert(removed == 1, s"only the untagged v2 dir should go, removed=$removed")
    assert(Snapshots.readTag(spark, path, "train-v1").count() == 1L,
      "tagged snapshot lost its data to vacuum")
    intercept[IllegalStateException] { Snapshots.tag(spark, path, "train-v1", 3L) }
    intercept[IllegalArgumentException] { Snapshots.readTag(spark, path, "nope") }
    // drop + re-vacuum reclaims the previously pinned snapshot
    Snapshots.dropTag(spark, path, "train-v1")
    assert(Snapshots.vacuum(spark, path, keepFrom = 3L) == 1)
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("rollback: a forward commit restores an old snapshot's state with " +
    "zero data movement; shared dirs survive vacuum of the bad history") {
    import spark.implicits._
    val path = freshPath("rollback")
    Snapshots.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars"), path)
    Snapshots.overwrite(Seq((9L, 999L)).toDF("doc_id", "n_chars"), path) // bad
    val v3 = Snapshots.rollback(spark, path, toId = 1L)
    assert(v3 == 3L)
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // the bad commit stays time travelable; ops read as a history
    assert(Snapshots.read(spark, path, 2L).collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(Snapshots.log(spark, path).collect().map(_.getString(1)).toSeq ==
      Seq("overwrite", "overwrite", "rollback"))
    // rollback preserves merge-on-read state too: delete, then break,
    // then roll back across the break
    Snapshots.deleteWhere(spark, path, col("doc_id") === 2L, "doc_id") // v4
    Snapshots.overwrite(Seq((8L, 888L)).toDF("doc_id", "n_chars"), path) // v5 bad
    Snapshots.rollback(spark, path, toId = 4L)                           // v6
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSeq == Seq(1L),
      "rollback must carry the target's tombstones")
    // vacuum to the rollback: s1 (shared with v1's lineage) must SURVIVE
    // because v6 references it; the bad dirs go
    Snapshots.vacuum(spark, path, keepFrom = 6L)
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("format features compose: stats-pruned clustered base + schema " +
    "evolution + merge-on-read delete + compact + rollback on one table") {
    import spark.implicits._
    val path = freshPath("compose")
    // v1: clustered, stats-tracked base (4 files over doc_id 0..399)
    val base = (0L until 400L).map(i => (i, i * 2)).toDF("doc_id", "n_chars")
      .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
    Snapshots.overwrite(base, path, statsCols = Seq("doc_id"))
    // v2: evolving append (new column) — also stats-tracked
    Snapshots.append(Seq((400L, 1L, "en")).toDF("doc_id", "n_chars", "lang"),
      path, statsCols = Seq("doc_id"))
    // v3: delete a band that lives in exactly one base file
    Snapshots.deleteWhere(spark, path, col("doc_id").between(100L, 199L), "doc_id")
    // pruned range read over the deleted band: stats skip 3 of 4 base
    // files, tombstones empty the rest
    // 3 of 4 base files + the [400,400] appended file are provably
    // disjoint from [100,199] — only the one in-band base file is kept
    val (kept, skipped) = Snapshots.pruneRange(spark, path, "doc_id", 100L, 199L)
    assert(skipped.size == 4 && kept.size == 1,
      s"stats should skip 4/5 files, got skipped=${skipped.size} kept=${kept.size}")
    assert(Snapshots.readRange(spark, path, "doc_id", 100L, 199L).count() == 0L)
    // full read: evolved schema + tombstones together
    val cur = Snapshots.read(spark, path)
    assert(cur.columns.toSeq == Seq("doc_id", "n_chars", "lang"))
    assert(cur.count() == 301L) // 400 - 100 deleted + 1 appended
    // v4: compact with fresh stats; the evolved schema and the delete
    // survive the rewrite
    Snapshots.compact(spark, path, statsCols = Seq("doc_id"))
    val compacted = Snapshots.read(spark, path)
    assert(compacted.count() == 301L && compacted.columns.length == 3)
    assert(Snapshots.readRange(spark, path, "doc_id", 100L, 199L).count() == 0L)
    assert(Snapshots.readRange(spark, path, "doc_id", 400L, 400L).count() == 1L)
    // v5: rollback to v1 — pre-evolution schema, pre-delete content
    Snapshots.rollback(spark, path, toId = 1L)
    val rolled = Snapshots.read(spark, path)
    assert(rolled.columns.toSeq == Seq("doc_id", "n_chars") && rolled.count() == 400L)
    // and the v1 stats sidecar still prunes after rollback
    val (k2, s2) = Snapshots.pruneRange(spark, path, "doc_id", 0L, 50L)
    assert(s2.size == 3, s"rollback lost stats pruning: skipped=${s2.size}")
  }

  test("dedupCommit: canonical-pick tombstones the duplicate copies in one " +
    "delete commit; pre-dedup stays time travelable and rollback undoes it") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    val path = freshPath("dedupcommit")
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "lorem ipsum dolor"),
      (3L, "the quick brown fox"),      // exact dup of 1 — higher id loses
      (4L, "THE quick brown fox!!!"))   // dirtier normalized dup — loses on stop_hits
      .toDF("doc_id", "text")
    Snapshots.overwrite(docs, path)
    val v2 = CorpusPipeline.dedupCommit(spark, path)
    assert(v2 == 2L)
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(Snapshots.read(spark, path, 1L).count() == 4L,
      "the pre-dedup corpus must stay time travelable")
    Snapshots.rollback(spark, path, toId = 1L)
    assert(Snapshots.read(spark, path).count() == 4L, "rollback must undo the dedup")
  }

  test("vacuum drops expired manifests and unreferenced data dirs, keeps live snapshots whole") {
    import spark.implicits._
    val path = freshPath("vac")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)   // v1 (replaced below)
    Snapshots.overwrite(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path)   // v2: only data/s2 live
    Snapshots.append(Seq((3L, 30L)).toDF("doc_id", "n_chars"), path)      // v3: s2 + s3
    // Orphan from a crashed commit (data written, never renamed in).
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, 90L)).toDF("doc_id", "n_chars").write.parquet(s"$path/data/s99")
    val removed = Snapshots.vacuum(spark, path, keepFrom = 2L)
    // data/s1 (expired with v1) and data/s99 (orphan) go; s2/s3 stay.
    assert(removed == 2, s"expected 2 dirs reclaimed, got $removed")
    assert(!f.exists(new Path(s"$path/data/s1")) && !f.exists(new Path(s"$path/data/s99")))
    assert(Snapshots.read(spark, path, 2L).count() == 1L)
    assert(Snapshots.read(spark, path, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 20L), (3L, 30L)))
    intercept[IllegalArgumentException](Snapshots.read(spark, path, 1L))
  }

  test("MV maintenance: refresh(summary(v1), deltaOf(v2)) == summarize(read(v2)) bit-for-bit; " +
    "merge is associative and min/max survive partial views") {
    import graft.operators.Mv
    val path = freshPath("mv")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
    val isDelta = pmod(col("doc_id"), lit(10L)) === 3
    Snapshots.overwrite(docs.where(!isDelta), path)
    Snapshots.append(docs.where(isDelta), path)
    val incremental = Mv.report(Mv.refresh(
      Mv.summarize(Snapshots.read(spark, path, 1L)),
      Snapshots.deltaOf(spark, path, 2L))).collect().toSeq
    val recomputed = Mv.report(Mv.summarize(Snapshots.read(spark, path, 2L)))
      .collect().toSeq
    assert(incremental == recomputed, "incremental refresh diverged from recompute")
    // deltaOf(2) must be exactly the appended split.
    assert(Snapshots.deltaOf(spark, path, 2L).count() == docs.where(isDelta).count())
    // Associativity across a three-way split (the multi-day chain).
    val Seq(a, b, c) = Seq(0, 1, 2).map(r => docs.where(pmod(col("doc_id"), lit(3L)) === r))
    val chained = Mv.report(Mv.merge(Mv.merge(Mv.summarize(a), Mv.summarize(b)), Mv.summarize(c)))
      .collect().toSeq
    val whole = Mv.report(Mv.summarize(docs)).collect().toSeq
    assert(chained == whole, "three-way merge diverged from whole-table summary")
  }

  test("diff: appends read as pure inserts, a CoW update reads as delete+insert, and bag " +
    "semantics count duplicate-row multiplicity") {
    import spark.implicits._
    val path = freshPath("cdc")
    // Base holds TWO identical (5, 50) rows — multiplicity matters below.
    Snapshots.overwrite(Seq((1L, 10L), (5L, 50L), (5L, 50L)).toDF("doc_id", "n_chars"), path)
    Snapshots.append(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path)
    val d12 = Snapshots.diff(spark, path, 1L, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(d12.toSeq == Seq((2L, 20L, "insert")), s"append diff wrong: ${d12.toSeq}")
    // v3 drops ONE of the duplicate (5, 50) rows and rewrites doc 1.
    Snapshots.overwrite(Seq((1L, 11L), (2L, 20L), (5L, 50L)).toDF("doc_id", "n_chars"), path)
    val d23 = Snapshots.diff(spark, path, 2L, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(x => (x._1, x._3)).toSeq
    assert(d23 == Seq((1L, 10L, "delete"), (1L, 11L, "insert"), (5L, 50L, "delete")),
      s"CoW diff wrong (bag semantics must yield exactly one (5,50) delete): $d23")
  }

  test("compactSmall racing a rival append rebases (both effects present); " +
    "racing a row-mutating rival fails clean — never silent loss") {
    import spark.implicits._
    import graft.operators.CommitConflictException
    val path = freshPath("cc_compactsmall")
    // two small dirs to compact
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)
    Snapshots.append(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path)
    // rival APPEND in the commit window: compactSmall must lose the
    // CAS, rebase, and carry BOTH the compacted dir and the rival's
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.append(Seq((3L, 30L)).toDF("doc_id", "n_chars"), path): Unit
    }
    try {
      val (id, n) = Snapshots.compactSmall(spark, path, smallBytes = 1L << 30)
      assert(n == 2, s"expected both small dirs rewritten, got $n")
      assert(id == 4L, s"rebased compact_small should land at v4, got $id")
    } finally Snapshots.onCommitAttempt = () => ()
    val rows = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      s"rebase lost rows — rival append and compaction must both survive: $rows")
    // rival OVERWRITE in the window: no safe rebase — clean conflict,
    // table content is exactly the rival's
    Snapshots.append(Seq((4L, 40L)).toDF("doc_id", "n_chars"), path)
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.overwrite(Seq((9L, 90L)).toDF("doc_id", "n_chars"), path): Unit
    }
    try {
      intercept[CommitConflictException] {
        Snapshots.compactSmall(spark, path, smallBytes = 1L << 30)
      }
    } finally Snapshots.onCommitAttempt = () => ()
    assert(Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((9L, 90L)),
      "failed compact_small must leave the rival overwrite untouched")
  }

  test("optimistic concurrency: two appenders racing on the same observed state " +
    "both land — the loser rebases and the final content is the union") {
    import spark.implicits._
    val path = freshPath("cc_append")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path)
    // Deterministic race via the commit seam: the rival append runs in
    // the window between the victim's data write and manifest install,
    // so the victim's v2 rename clashes and must rebase onto the
    // rival's commit. The seam self-clears (fires once).
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.append(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path): Unit
    }
    try {
      val id = Snapshots.append(Seq((3L, 30L)).toDF("doc_id", "n_chars"), path)
      assert(id == 3L, s"rebased append should land at v3, got $id")
    } finally Snapshots.onCommitAttempt = () => ()
    assert(Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "a raced append lost rows — rebase must carry BOTH commits")
    assert(Snapshots.log(spark, path).collect().map(_.getString(1)).toSeq ==
      Seq("overwrite", "append", "append"))
    // History readable at every version; v2 is the rival's commit.
    assert(Snapshots.read(spark, path, 2L).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("optimistic concurrency: a delete racing an append rebases without " +
    "widening its tombstone onto the appended rows; overwrite stays fail-fast") {
    import spark.implicits._
    import graft.operators.CommitConflictException
    val path = freshPath("cc_delete")
    Snapshots.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars"), path)
    // Rival append lands doc 1 AGAIN (new dir) while a delete of doc 1
    // is mid-commit. The delete's keys were computed against v1 only,
    // so after the rebase the appended copy must SURVIVE (its dir
    // postdates the delete's scope — sequence semantics).
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.append(Seq((1L, 111L)).toDF("doc_id", "n_chars"), path): Unit
    }
    try {
      val id = Snapshots.deleteKeys(spark, path,
        Seq(Tuple1(1L)).toDF("doc_id"), "doc_id")
      assert(id == 3L, s"rebased delete should land at v3, got $id")
    } finally Snapshots.onCommitAttempt = () => ()
    val rows = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 111L), (2L, 20L)),
      s"delete must kill only the pre-append copy of doc 1: $rows")
    // Full-replace ops do NOT rebase: a raced overwrite propagates the
    // conflict (no safe automatic winner).
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.append(Seq((9L, 90L)).toDF("doc_id", "n_chars"), path): Unit
    }
    try {
      intercept[CommitConflictException] {
        Snapshots.overwrite(Seq((7L, 70L)).toDF("doc_id", "n_chars"), path)
      }
    } finally Snapshots.onCommitAttempt = () => ()
    // The rival append that won is intact.
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 9L))
  }

  test("partition spec: a partitioned commit prunes to matching partition dirs, " +
    "flat dirs degrade conservatively, and merge-on-read deletes compose") {
    import spark.implicits._
    val path = freshPath("parts")
    val base = Seq((1L, 10L, "en"), (2L, 20L, "de"), (3L, 30L, "en"), (4L, 40L, "fr"))
      .toDF("doc_id", "n_chars", "lang")
    Snapshots.overwrite(base, path, partitionBy = Seq("lang"))
    assert(Snapshots.partitionColsOf(spark, path) == Seq("lang"))
    // directory-level pruning: only lang=en kept, the rest skipped
    val (kept, skipped) = Snapshots.prunePartitions(spark, path, "lang", "en")
    assert(kept.size == 1 && kept.head.endsWith("lang=en"), s"kept=$kept")
    assert(skipped.size == 2, s"skipped=$skipped")
    val en = Snapshots.readPartition(spark, path, "lang", "en")
    assert(en.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(en.columns.toSet == base.columns.toSet,
      "partition column must survive a subdir-rooted scan")
    // v2: FLAT append (no partitioning) — kept whole, still correct
    Snapshots.append(Seq((5L, 50L, "en")).toDF("doc_id", "n_chars", "lang"), path)
    val (kept2, _) = Snapshots.prunePartitions(spark, path, "lang", "en")
    assert(kept2.exists(_.endsWith("data/s2")), "flat dir must be kept whole")
    assert(Snapshots.readPartition(spark, path, "lang", "en")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
    // full read across mixed layouts stays whole and schema-stable
    assert(Snapshots.read(spark, path).count() == 5L)
    // v3: tombstone doc 3; the partition read honors it
    Snapshots.deleteWhere(spark, path, col("doc_id") === 3L, "doc_id")
    assert(Snapshots.readPartition(spark, path, "lang", "en")
      .collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    // a partition value with no dir anywhere reads empty, not an error
    assert(Snapshots.readPartition(spark, path, "lang", "zz").count() == 0L)
    // stats + partitioning compose: partitioned commit with a stats
    // sidecar prunes files RECURSIVELY under the partition subdirs
    val path2 = freshPath("parts_stats")
    Snapshots.overwrite(base, path2, statsCols = Seq("doc_id"), partitionBy = Seq("lang"))
    val (k3, s3) = Snapshots.pruneRange(spark, path2, "doc_id", 1L, 1L)
    assert(k3.nonEmpty && s3.nonEmpty,
      s"stats sidecar must prune partitioned files: kept=${k3.size} skipped=${s3.size}")
    assert(Snapshots.readRange(spark, path2, "doc_id", 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "en")),
      "range read over a partitioned dir must recover partition values")
  }

  test("bloom sidecar: a point lookup opens O(1) files, an absent key ~none, " +
    "and pruning composes across commits") {
    import spark.implicits._
    val path = freshPath("bloom")
    val base = (0L until 1000L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_chars")
      .repartitionByRange(8, col("doc_id"))
    Snapshots.overwrite(base, path, bloomCols = Seq("doc_id"))
    val (kept, skipped) = Snapshots.pruneEq(spark, path, "doc_id", 500L)
    assert(kept.size + skipped.size == 8, s"expected 8 files, saw ${kept.size + skipped.size}")
    // the holder file is kept (no false negatives, asserted via the
    // row coming back); FPs may keep a stray file but never most
    assert(kept.nonEmpty && kept.size <= 3, s"point lookup kept ${kept.size} of 8 files")
    val hit = Snapshots.readEq(spark, path, "doc_id", 500L).collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(500L))
    // absent key: provably-empty scan (modulo ~1% FP per file)
    val (keptA, _) = Snapshots.pruneEq(spark, path, "doc_id", 5000L)
    assert(keptA.size <= 2, s"absent key kept ${keptA.size} files")
    assert(Snapshots.readEq(spark, path, "doc_id", 5000L).count() == 0L)
    // append composes: both generations probe their own sidecars
    Snapshots.append(Seq((5000L, 99L)).toDF("doc_id", "n_chars"), path,
      bloomCols = Seq("doc_id"))
    assert(Snapshots.readEq(spark, path, "doc_id", 5000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5000L, 99L)))
    val (kept2, skipped2) = Snapshots.pruneEq(spark, path, "doc_id", 500L)
    assert(skipped2.size >= skipped.size, "old generation stopped pruning")
    assert(Snapshots.readEq(spark, path, "doc_id", 500L).count() == 1L)
    // merge-on-read compose: a tombstoned key stays gone on the pruned scan
    Snapshots.deleteKeys(spark, path,
      Seq(500L).toDF("doc_id"), "doc_id")
    assert(Snapshots.readEq(spark, path, "doc_id", 500L).count() == 0L,
      "bloom-pruned read must still apply merge-on-read tombstones")
  }

  test("bloom sidecar: string columns probe, bloom-less commits degrade to " +
    "kept-whole, and vacuum reclaims sidecars with their dir") {
    import spark.implicits._
    val path = freshPath("bloomstr")
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // range layout on doc_id makes each file single-source
    val docs = (0L until 400L).map(i =>
      (i, if (i < 200) "wiki" else "crawl")).toDF("doc_id", "source")
      .repartitionByRange(4, col("doc_id"))
    Snapshots.overwrite(docs, path, bloomCols = Seq("source"))
    val (kept, skipped) = Snapshots.pruneEq(spark, path, "source", "wiki")
    assert(skipped.nonEmpty, "single-source files must prune on the other source")
    assert(Snapshots.readEq(spark, path, "source", "wiki").count() == 200L)
    // a bloom-less commit keeps its dir whole — correctness never
    // depends on the sidecar
    Snapshots.append(Seq((400L, "wiki")).toDF("doc_id", "source"), path)
    assert(Snapshots.readEq(spark, path, "source", "wiki").count() == 201L)
    val (kept2, _) = Snapshots.pruneEq(spark, path, "source", "news")
    assert(kept2.exists(_.contains("/data/s2")), "bloom-less dir must be kept whole")
    // vacuum couples sidecar lifetime to the dir
    assert(f.exists(new Path(s"$path/data/s1.bloom.source.json")))
    Snapshots.overwrite(Seq((1L, "x")).toDF("doc_id", "source"), path)
    Snapshots.vacuum(spark, path, keepFrom = 3L)
    assert(!f.exists(new Path(s"$path/data/s1.bloom.source.json")),
      "expired dir's bloom sidecar must be reclaimed")
    assert(!f.exists(new Path(s"$path/data/s1")))
  }

  test("readRange spans schema evolution: pre-evolution files null-backfill " +
    "the added column under the manifest schema (never footer-dependent)") {
    import spark.implicits._
    val path = freshPath("range_evolve")
    Snapshots.overwrite((0L until 100L).map(i => (i, i * 2)).toDF("doc_id", "n_chars"),
      path, statsCols = Seq("doc_id"))
    Snapshots.append(Seq((100L, 1L, "en")).toDF("doc_id", "n_chars", "lang"),
      path, statsCols = Seq("doc_id"))
    val spanning = Snapshots.readRange(spark, path, "doc_id", 90L, 100L)
    assert(spanning.columns.toSeq == Seq("doc_id", "n_chars", "lang"),
      s"range scan must plan under the manifest schema: ${spanning.columns.toSeq}")
    val rows = spanning.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(rows == (90L until 100L).map(_ -> null).toMap + (100L -> "en"),
      "old files must read NULL for the added column in a spanning range")
    // merge-on-read + evolution + range together (the composition the
    // r14 advisor flagged as union-incompatible)
    Snapshots.deleteWhere(spark, path, col("doc_id") === 95L, "doc_id")
    assert(Snapshots.readRange(spark, path, "doc_id", 90L, 100L)
      .collect().map(_.getLong(0)).toSet == ((90L to 100L).toSet - 95L))
  }

  test("optimize: range probes go from every-file to O(matching) files, " +
    "content bit-identical, history and time travel untouched") {
    import spark.implicits._
    val path = freshPath("optimize")
    // 8 arrival-order files: ids interleave, every file spans the range
    val rows = (0L until 800L).map(i => (i, s"t$i", i % 97))
    Snapshots.overwrite(rows.toDF("doc_id", "text", "n_chars")
      .repartition(8), path, statsCols = Seq("doc_id"))
    val (keptBefore, _) = Snapshots.pruneRange(spark, path, "doc_id", 100L, 180L)
    assert(keptBefore.size == 8, s"interleaved layout should keep all files: ${keptBefore.size}")
    val before = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val v2 = Snapshots.optimize(spark, path, "doc_id", 8)
    assert(v2 == 2L && Snapshots.opOf(spark, path, 2L) == "optimize")
    // disjoint file ranges: an ~10% probe now opens ~1-2 of 8 files
    val (keptAfter, skippedAfter) = Snapshots.pruneRange(spark, path, "doc_id", 100L, 180L)
    assert(keptAfter.size <= 2 && keptAfter.size + skippedAfter.size == 8,
      s"optimize did not tighten pruning: kept ${keptAfter.size}")
    // logical content unchanged, range read exact
    val after = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(after === before)
    assert(Snapshots.readRange(spark, path, "doc_id", 100L, 180L)
      .collect().map(_.getLong(0)).toSet === (100L to 180L).toSet)
    // time travel to the pre-optimize snapshot still serves the old layout
    assert(Snapshots.read(spark, path, asOf = 1L).count() == 800L)
    // and tombstones fold into the rewrite: delete then re-optimize
    Snapshots.deleteWhere(spark, path, col("doc_id") < 100L, "doc_id")
    Snapshots.optimize(spark, path, "doc_id", 4)
    val m = Snapshots.read(spark, path).collect().map(_.getLong(0))
    assert(m.length == 700 && m.min == 100L)
  }

  test("optimizeZ: range probes prune on BOTH axes; single-column optimize " +
    "only on its own; table health reads the layout") {
    import spark.implicits._
    val path = freshPath("optimizez")
    // 16x16 grid: both axes uniform, arrival order interleaves both
    val rows = (0L until 1024L).map(i => (i % 256, (i * 37) % 256, i))
    Snapshots.overwrite(rows.toDF("a", "b", "pk").repartition(8), path,
      statsCols = Seq("a", "b"))
    def kept(colName: String) =
      Snapshots.pruneRange(spark, path, colName, 0L, 31L)._1.size
    assert(kept("a") == 8 && kept("b") == 8, "interleaved layout must keep all")
    Snapshots.optimizeZ(spark, path, "a", "b", bits = 8, numFiles = 16)
    val (ka, kb) = (kept("a"), kept("b"))
    assert(ka <= 8 && kb <= 8 && ka + kb < 16,
      s"z-layout should prune both axes: a=$ka b=$kb of 16")
    // content identical
    assert(Snapshots.read(spark, path).collect().map(_.getLong(2)).sorted
      === (0L until 1024L).toArray)
    // health report: one row per live dir, counts match the fs
    val h = Snapshots.tableHealth(spark, path).collect()
    assert(h.length == 1) // optimize replaced the dir set
    assert(h.head.getLong(2) == 16L, s"n_files: ${h.head}")
    assert(h.head.getDouble(6) == 1.0, "tiny files must all read small")
  }

  test("erase: the keys leave the BYTES, not just the view — no live file " +
    "contains them, history collapses, tags refuse") {
    import spark.implicits._
    val path = freshPath("erase")
    val rows = (0L until 500L).map(i => (i, s"payload_$i"))
    Snapshots.overwrite(rows.toDF("doc_id", "text"), path)
    Snapshots.append(rows.take(10).map { case (i, t) => (i + 1000L, t) }
      .toDF("doc_id", "text"), path)
    val victims = Seq(3L, 7L, 1002L).toDF("doc_id")
    val report = Snapshots.erase(spark, path, victims, "doc_id").head()
    assert(report.getLong(0) === 510L && report.getLong(1) === 507L)
    assert(report.getLong(2) === 1L, "history must collapse to the compacted snapshot")
    assert(report.getLong(3) >= 2L, s"old data dirs must be reclaimed: $report")
    // the PHYSICAL check: scan every parquet file left under the table
    // root — the erased keys appear nowhere on disk
    val left = spark.read.parquet(s"$path/data/*").where(col("doc_id").isin(3L, 7L, 1002L))
    assert(left.count() === 0L, "erased keys still present in live bytes")
    assert(Snapshots.read(spark, path).count() === 507L)
    // a pinned tag must block erasure (it would silently retain bytes)
    val path2 = freshPath("erase_tagged")
    Snapshots.overwrite(rows.take(10).toDF("doc_id", "text"), path2)
    Snapshots.tag(spark, path2, "release")
    intercept[IllegalArgumentException] {
      Snapshots.erase(spark, path2, Seq(1L).toDF("doc_id"), "doc_id")
    }
  }

  test("sidecar keys survive partitionBy: stats and bloom pruning stay exact " +
    "when every partition subdir reuses the same file basename") {
    import spark.implicits._
    val path = freshPath("part_sidecar")
    // ONE task writing a dynamic-partitioned commit reuses the same
    // basename (part-00000-<jobUUID>…) in EVERY day=N subdir — the
    // exact layout where basename-keyed sidecars collide (last entry
    // wins) and pruning would apply day 3's bounds to day 1's file,
    // silently dropping matching rows.
    val rows = Seq(
      (1L, 5L, 1L), (2L, 9L, 1L),        // day 1: n_chars 5..9
      (3L, 105L, 2L), (4L, 109L, 2L),    // day 2: 105..109
      (5L, 205L, 3L), (6L, 209L, 3L))    // day 3: 205..209
      .toDF("doc_id", "n_chars", "day").repartition(1)
    Snapshots.overwrite(rows, path, statsCols = Seq("n_chars"),
      partitionBy = Seq("day"), bloomCols = Seq("doc_id"))
    // Same basename in every subdir — the collision precondition holds.
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = {
      val it = f.listFiles(new Path(path, "data/s1"), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) b += p.getName }
      b.result()
    }
    assert(names.distinct.size == 1 && names.size == 3,
      s"precondition: dynamic-partition writer should reuse one basename, got $names")
    // Range pruning: day 2's band keeps exactly its file, skips the other two.
    val (kept, skipped) = Snapshots.pruneRange(spark, path, "n_chars", 100L, 110L)
    assert(kept.size == 1 && skipped.size == 2,
      s"stats pruning must be per-FILE under partitionBy: kept=$kept skipped=$skipped")
    assert(Snapshots.readRange(spark, path, "n_chars", 100L, 110L)
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L),
      "colliding stats sidecar keys dropped rows")
    // Bloom point lookup: doc 5 lives in day 3's file only.
    val (keptB, skippedB) = Snapshots.pruneEq(spark, path, "doc_id", 5L)
    assert(keptB.size == 1 && skippedB.size == 2,
      s"bloom pruning must be per-FILE under partitionBy: kept=$keptB skipped=$skippedB")
    assert(Snapshots.readEq(spark, path, "doc_id", 5L)
      .collect().map(_.getLong(0)).toSet == Set(5L),
      "colliding bloom sidecar keys dropped rows")
    // All three pruning layers composed on one read: partition dirs,
    // stats, bloom — file counts drop at each layer, rows stay exact
    // (the r15 verdict's composed-pruning ask).
    Snapshots.append(Seq((7L, 7L, 1L)).toDF("doc_id", "n_chars", "day"), path,
      statsCols = Seq("n_chars"), partitionBy = Seq("day"), bloomCols = Seq("doc_id"))
    val (keptP, _) = Snapshots.prunePartitions(spark, path, "day", "1")
    assert(keptP.size == 2, s"one day=1 subdir per commit, got $keptP")
    assert(Snapshots.readPartition(spark, path, "day", "1")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 7L))
    assert(Snapshots.readEq(spark, path, "doc_id", 7L)
      .collect().map(_.getLong(0)).toSet == Set(7L))
  }

  test("a rewrite raced by appends rebases: optimize carries the rivals' dirs " +
    "and re-merged schema, no append lost, clustering stats intact") {
    import spark.implicits._
    val path = freshPath("cc_optimize")
    Snapshots.overwrite(
      Seq((1L, 10L), (2L, 220L), (3L, 130L)).toDF("doc_id", "n_chars"), path)
    // Rival append lands in optimize's data-write→manifest-install
    // window — WITH an added column, so the rebase must also adopt the
    // rival's evolved schema.
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.append(Seq((9L, 90L, "en")).toDF("doc_id", "n_chars", "lang"), path): Unit
    }
    val id = try Snapshots.optimize(spark, path, "n_chars", 3)
             finally Snapshots.onCommitAttempt = () => ()
    assert(id == 3L, s"rebased optimize should land at v3, got $id")
    val got = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, 10L, None), (2L, 220L, None), (3L, 130L, None),
      (9L, 90L, Some("en"))),
      s"rebase lost rows or the evolved column: $got")
    assert(Snapshots.log(spark, path).collect().map(_.getString(1)).toSeq ==
      Seq("overwrite", "append", "optimize"))
    // The rewritten dir's stats sidecar still prunes (rival dir has no
    // stats → kept conservatively).
    val (kept, skipped) = Snapshots.pruneRange(spark, path, "n_chars", 0L, 50L)
    assert(skipped.nonEmpty, "optimize's clustering stats must still skip files")
    assert(Snapshots.readRange(spark, path, "n_chars", 0L, 100L)
      .collect().map(_.getLong(0)).toSet == Set(1L, 9L))
  }

  test("a rewrite raced by a non-append fails clean: the rival's delete stands, " +
    "no rows lost, the orphan dir is vacuum-reclaimable") {
    import spark.implicits._
    import graft.operators.CommitConflictException
    val path = freshPath("cc_optimize_del")
    Snapshots.overwrite(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_chars"), path)
    Snapshots.onCommitAttempt = () => {
      Snapshots.onCommitAttempt = () => ()
      Snapshots.deleteKeys(spark, path, Seq(Tuple1(2L)).toDF("doc_id"), "doc_id"): Unit
    }
    try intercept[CommitConflictException] {
      Snapshots.optimize(spark, path, "n_chars", 2)
    } finally Snapshots.onCommitAttempt = () => ()
    // The delete won and stands; optimize's half-written dir is orphan.
    assert(Snapshots.read(spark, path).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L), "raced rewrite corrupted the table")
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirsBefore = f.listStatus(new Path(path, "data")).count(_.isDirectory)
    assert(dirsBefore == 2, s"expected base dir + orphan rewrite dir, got $dirsBefore")
    Snapshots.vacuum(spark, path, keepFrom = Snapshots.latest(spark, path))
    val dirsAfter = f.listStatus(new Path(path, "data")).count(_.isDirectory)
    assert(dirsAfter == 1, "vacuum must reclaim the failed rewrite's orphan dir")
  }

  test("erase raced by an append keeps the append: the compact step rebases, " +
    "erased keys gone from live bytes, appended rows survive") {
    import spark.implicits._
    val path = freshPath("cc_erase")
    Snapshots.overwrite(
      Seq((1L, "secret"), (2L, "keep")).toDF("doc_id", "text"), path)
    // Fire the rival on erase's SECOND commit attempt (the compact;
    // the first is the tombstone install).
    var calls = 0
    Snapshots.onCommitAttempt = () => {
      calls += 1
      if (calls == 2) {
        Snapshots.onCommitAttempt = () => ()
        Snapshots.append(Seq((3L, "late")).toDF("doc_id", "text"), path): Unit
      }
    }
    val report = try Snapshots.erase(spark, path,
        Seq(Tuple1(1L)).toDF("doc_id"), "doc_id").collect().head
      finally Snapshots.onCommitAttempt = () => ()
    val live = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(live == Set((2L, "keep"), (3L, "late")),
      s"erase must drop key 1 and keep the raced append: $live")
    assert(report.getLong(0) == 2L, "rows_before should reflect the pre-erase table")
    // No surviving manifest may reference a dir containing doc 1's bytes.
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def liveBytes: String = {
      val it = f.listFiles(new Path(path, "data"), true)
      val sb = new StringBuilder
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) {
          val in = f.open(p)
          val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
          try in.readFully(bytes) finally in.close()
          sb.append(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))
        }
      }
      sb.toString
    }
    assert(!liveBytes.contains("secret"), "erased bytes survived the raced erase")
  }

  test("vacuum's reclaim count excludes bloom sidecars, not just stats") {
    import spark.implicits._
    val path = freshPath("vac_count")
    Snapshots.overwrite(Seq((1L, 10L)).toDF("doc_id", "n_chars"), path,
      statsCols = Seq("n_chars"), bloomCols = Seq("doc_id"))
    Snapshots.overwrite(Seq((2L, 20L)).toDF("doc_id", "n_chars"), path)
    // v1's data dir dies with its TWO sidecars riding along; the
    // report must say 1 dir, not 3 paths.
    assert(Snapshots.vacuum(spark, path, keepFrom = 2L) == 1,
      "vacuum count must not include stats/bloom sidecar files")
  }

  test("compactSmall (q205): folds only sub-threshold dirs, carries the " +
    "healthy dir by reference, second run is a no-op") {
    import spark.implicits._
    val path = freshPath("binpack")
    // one healthy dir (800 rows) + three drips (1 row each)
    Snapshots.overwrite((1L to 800L).map(i => (i, s"body $i" * 8))
      .toDF("doc_id", "text"), path)
    (1 to 3).foreach(i =>
      Snapshots.append(Seq((1000L + i, s"drip $i")).toDF("doc_id", "text"), path))
    val rowsBefore = Snapshots.read(spark, path).count()
    val bigBytes = new org.apache.hadoop.fs.Path(path, "data/s1")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(path, "data/s1"))
      .getLength
    val (id, n) = Snapshots.compactSmall(spark, path, bigBytes / 2)
    assert(n == 3, s"exactly the three drips must fold, got $n")
    assert(Snapshots.opOf(spark, path, id) == "compact_small")
    assert(Snapshots.read(spark, path).count() == rowsBefore)
    val dirs = Snapshots.dirsOf(spark, path, id)
    assert(dirs.contains("data/s1"), s"healthy dir must be CARRIED: $dirs")
    assert(dirs.size == 2, s"3 drips must fold into one dir: $dirs")
    // idempotence: the folded dir + healthy dir are both above threshold
    // or alone — nothing left to merge
    val (id2, n2) = Snapshots.compactSmall(spark, path, bigBytes / 2)
    assert(id2 == id && n2 == 0, s"second run must no-op: ($id2, $n2)")
    // history intact: the pre-compact snapshot still reads
    assert(Snapshots.read(spark, path, id - 1).count() == rowsBefore)
  }

  test("compactSmall folds tombstones over rewritten dirs and narrows " +
    "their scopes; carried dirs keep theirs") {
    import spark.implicits._
    val path = freshPath("binpack_dels")
    Snapshots.overwrite((1L to 800L).map(i => (i, s"body $i" * 8))
      .toDF("doc_id", "text"), path)
    (1 to 3).foreach(i =>
      Snapshots.append(Seq((1000L + i, s"drip $i")).toDF("doc_id", "text"), path))
    // tombstone one drip row AND one healthy row (scope = all 4 dirs)
    Snapshots.deleteKeys(spark, path,
      Seq(1001L, 5L).toDF("doc_id"), "doc_id")
    val expect = Snapshots.read(spark, path).count()
    val bigBytes = new org.apache.hadoop.fs.Path(path, "data/s1")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(path, "data/s1"))
      .getLength
    val (id, n) = Snapshots.compactSmall(spark, path, bigBytes / 2)
    assert(n == 3)
    val ids = Snapshots.read(spark, path).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(Snapshots.read(spark, path).count() == expect)
    assert(!ids.contains(1001L), "folded dir must have the tombstone applied")
    assert(!ids.contains(5L), "carried dir must keep its delete scope")
    assert(ids.contains(1002L) && ids.contains(6L))
    // re-inserting a deleted key works: the narrowed scope excludes new dirs
    Snapshots.append(Seq((1001L, "back")).toDF("doc_id", "text"), path)
    assert(Snapshots.read(spark, path).where(col("doc_id") === 1001L).count() == 1L)
    assert(Snapshots.opOf(spark, path, id) == "compact_small")
  }

  test("compactSmall: rival append rebases; row-mutating rival fails clean") {
    import spark.implicits._
    val path = freshPath("binpack_race")
    Snapshots.overwrite((1L to 800L).map(i => (i, s"body $i" * 8))
      .toDF("doc_id", "text"), path)
    (1 to 2).foreach(i =>
      Snapshots.append(Seq((1000L + i, s"drip $i")).toDF("doc_id", "text"), path))
    val bigBytes = new org.apache.hadoop.fs.Path(path, "data/s1")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(path, "data/s1"))
      .getLength
    var fired = false
    Snapshots.onCommitAttempt = () => {
      if (!fired) {
        fired = true
        val saved = Snapshots.onCommitAttempt
        Snapshots.onCommitAttempt = () => ()
        try Snapshots.append(Seq((2000L, "rival")).toDF("doc_id", "text"), path)
        finally Snapshots.onCommitAttempt = saved
      }
    }
    try {
      val (_, n) = Snapshots.compactSmall(spark, path, bigBytes / 2)
      assert(n == 2)
    } finally Snapshots.onCommitAttempt = () => ()
    val ids = Snapshots.read(spark, path).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(2000L), "the rival append must survive the rebase")
    assert(ids.contains(1001L) && ids.contains(1002L))
    // row-mutating rival → clean fail, no commit
    Snapshots.append(Seq((3001L, "d1")).toDF("doc_id", "text"), path)
    Snapshots.append(Seq((3002L, "d2")).toDF("doc_id", "text"), path)
    val before = Snapshots.latest(spark, path)
    var fired2 = false
    Snapshots.onCommitAttempt = () => {
      if (!fired2) {
        fired2 = true
        val saved = Snapshots.onCommitAttempt
        Snapshots.onCommitAttempt = () => ()
        try Snapshots.deleteKeys(spark, path, Seq(3001L).toDF("doc_id"), "doc_id")
        finally Snapshots.onCommitAttempt = saved
      }
    }
    try {
      intercept[graft.operators.CommitConflictException] {
        Snapshots.compactSmall(spark, path, bigBytes / 2)
      }
    } finally Snapshots.onCommitAttempt = () => ()
    assert(Snapshots.latest(spark, path) == before + 1, // only the rival delete
      "failed compactSmall must not leave a commit")
  }

  test("applyCdc is the algebraic inverse of diff, multiset semantics included") {
    import spark.implicits._
    // Duplicate rows on BOTH sides: a has (5,50) twice, b keeps one and
    // adds (7,70) twice — keyed application would collapse these.
    val a = Seq((1L, 10L), (2L, 20L), (5L, 50L), (5L, 50L)).toDF("doc_id", "n_chars")
    val b = Seq((1L, 11L), (2L, 20L), (5L, 50L), (7L, 70L), (7L, 70L)).toDF("doc_id", "n_chars")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val feed = b.exceptAll(a).withColumn("change", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("delete")))
    assert(multiset(Snapshots.applyCdc(a, feed)) === multiset(b),
      "apply(a, diff(a,b)) != b")
    // Degenerate feeds: empty diff is identity; delete-only shrinks.
    assert(multiset(Snapshots.applyCdc(a, feed.where(lit(false)))) === multiset(a))
    val delOnly = a.where(col("doc_id") === 5L).limit(1).withColumn("change", lit("delete"))
    assert(multiset(Snapshots.applyCdc(a, delOnly)) ===
      Seq((1L, 10L), (2L, 20L), (5L, 50L)), "one delete must remove ONE occurrence")
  }
}
