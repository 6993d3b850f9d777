package graft

import org.apache.spark.sql.functions._
import graft.functions.Bitmap
import graft.functions.Bitmap.ChunkedBitmap
import graft.operators.Events

/** Bitmap rollup (q140): the kernel's set semantics, the canonical
  * serialization contract, and the load-bearing algebra — distinct
  * counts served from the pre-aggregated hourly rollup must equal a
  * direct distinct over the raw rows. */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: add/union/cardinality, negative ids included") {
    val a = new ChunkedBitmap
    Seq(0L, 1L, 63L, 64L, 65L, -1L, -64L, 1000000L).foreach(a.add)
    a.add(63L) // idempotent
    assert(a.cardinality === 8)

    val b = new ChunkedBitmap
    Seq(65L, 2L, -1L).foreach(b.add)
    a.or(b)
    assert(a.cardinality === 9) // only 2L is new

    val rt = ChunkedBitmap.deserialize(a.serialize)
    assert(rt.cardinality === 9)
    assert(Bitmap.cardinalityOf(a.serialize) === 9)
  }

  test("serialization is canonical: insert order never shows in the bytes") {
    val xs = (0L until 500L).map(i => i * 37 % 1009)
    val fwd = new ChunkedBitmap
    val rev = new ChunkedBitmap
    xs.foreach(fwd.add)
    xs.reverse.foreach(rev.add)
    assert(java.util.Arrays.equals(fwd.serialize, rev.serialize))
  }

  test("empty bitmap: zero bytes-payload, zero cardinality") {
    val e = new ChunkedBitmap
    assert(e.cardinality === 0)
    assert(Bitmap.cardinalityOf(e.serialize) === 0)
    assert(ChunkedBitmap.deserialize(e.serialize).cardinality === 0)
  }

  test("rollup-served daily distincts equal the raw-scan truth") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val served = Events.distinctDaily(Events.userBitmapRollup(events))
    val direct = events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type", "day")
    assert(served.collect().toSeq === direct.collect().toSeq)
  }

  test("re-aggregation is real: hour bitmaps OR to the day set, not a rescan") {
    // A user active in two different hours of one day must count once
    // in the day total; two users sharing an hour count twice.
    val rows = Seq(
      ("click", "2026-01-05 01:10:00", 7L),
      ("click", "2026-01-05 09:45:00", 7L), // same user, later hour
      ("click", "2026-01-05 09:50:00", 8L),
      ("click", "2026-01-06 03:00:00", 7L)  // next day: counts again
    ).toDF("event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val rollup = Events.userBitmapRollup(rows)
    assert(rollup.count() === 3) // hours 01,09 on day 1 + hour 03 on day 2
    val byDay = Events.distinctDaily(rollup).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byDay("2026-01-05") === ((3L, 2L)))
    assert(byDay("2026-01-06") === ((1L, 1L)))
  }

  test("HLL twin: merged-hour estimates EQUAL direct-day estimates (exact mergeability)") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val merged = Events.approxDistinctDaily(Events.userSketchRollup(events))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // Direct: sketch each (type, day) bucket from raw rows — no hour step.
    val direct = events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged.keySet === direct.keySet)
    // Register-wise max union loses nothing: the union of hour sketches
    // IS the day sketch, so estimates are bit-identical, not just close.
    merged.foreach { case (k, v) => assert(v === direct(k), s"merge lost info at $k") }
  }

  test("HLL twin: estimates land within 5% of the exact bitmap path") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val approx = Events.approxDistinctDaily(Events.userSketchRollup(events))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val exact = Events.distinctDaily(Events.userBitmapRollup(events))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.05, s"$k: est ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("HLL sketch bytes stay capped where bitmap bytes grow with cardinality") {
    import spark.implicits._
    // 200k distinct ids in ONE bucket: bitmap ~ O(distinct/8) bytes,
    // HLL capped near 2^lgK regardless.
    val rows = (0L until 200000L)
      .toDF("user_id")
      .withColumn("event_type", lit("x"))
      .withColumn("ts", lit("2026-01-05 01:00:00").cast("timestamp"))
    val bmBytes = Events.userBitmapRollup(rows)
      .select(max(length(col("user_bm")))).collect()(0).getInt(0)
    val hllBytes = Events.userSketchRollup(rows)
      .select(max(length(col("user_hll")))).collect()(0).getInt(0)
    assert(bmBytes > 200000 / 8, s"bitmap unexpectedly small: $bmBytes")
    assert(hllBytes < 8192, s"sketch not fixed-size: $hllBytes")
    assert(hllBytes * 10 < bmBytes,
      s"sketch ($hllBytes B) should be >10x smaller than bitmap ($bmBytes B) here")
  }

  test("BitmapCardinality survives codegen over a persisted rollup") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm_rollup"
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    // The rollup is a plain parquet table (binary column) — persist,
    // reload, and serve from the REREAD bytes.
    Events.userBitmapRollup(events).write.parquet(path)
    val served = Events.distinctDaily(spark.read.parquet(path))
    val direct = events
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type", "day")
    assert(served.collect().toSeq === direct.collect().toSeq)
  }

  test("day-partitioned rollup: a range probe prunes partitions at the scan") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm_rollup_part"
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    Events.userBitmapRollup(events)
      .withColumn("day", to_date(col("hour")))
      .write.partitionBy("day").parquet(path)
    val days = spark.read.parquet(path).select("day").distinct()
      .orderBy("day").collect().map(_.getDate(0).toString)
    assert(days.length >= 2, s"need >=2 days to show pruning, got ${days.toSeq}")
    val probe = spark.read.parquet(path).where(col("day") === days.head)
    val served = Events.distinctDaily(probe.drop("day"))
    // The scan must list ONLY the probed day's directory.
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter did not reach partition pruning:\n$plan")
    // And the pruned serve still answers exactly for that day.
    val want = events
      .where(to_date(col("ts")) === days.head)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy("event_type", "day")
    assert(served.collect().toSeq === want.collect().toSeq)
  }

  test("bitmap AND cardinality: sorted-merge intersection exact across " +
    "word boundaries, disjoint and empty sets") {
    import graft.functions.Bitmap
    def ser(ids: Long*): Array[Byte] = {
      val bm = new Bitmap.ChunkedBitmap()
      ids.foreach(bm.add)
      bm.serialize
    }
    // same word, different words, negative ids (floor word indexing)
    assert(Bitmap.andCardinalityOf(ser(1L, 2L, 100L, 1000L), ser(2L, 100L, 999L)) === 2L)
    assert(Bitmap.andCardinalityOf(ser(1L, 2L), ser(3L, 4L)) === 0L)
    assert(Bitmap.andCardinalityOf(ser(), ser(1L)) === 0L)
    assert(Bitmap.andCardinalityOf(ser(-1L, -65L, 7L), ser(-65L, 7L, 500L)) === 2L)
    // cross-word-boundary sets agree with the driver set intersection
    val a = (0L until 300L by 3L).toSeq
    val b = (0L until 300L by 5L).toSeq
    assert(Bitmap.andCardinalityOf(ser(a: _*), ser(b: _*)) ===
      a.toSet.intersect(b.toSet).size.toLong)
  }

  test("audience overlap: crafted incidence pins exact counts and jaccard; " +
    "zero-overlap pairs present") {
    import spark.implicits._
    val rows = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 2L),
      ("B", 2L), ("B", 3L), ("B", 4L), ("B", 5L),
      ("C", 9L))
      .map { case (t, u) => (t, u, "2024-01-01 10:00:00") }
    val events = rows.toDF("event_type", "user_id", "ts_s")
      .select(col("event_type"), col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val out = Events.audienceOverlap(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("A", "B")) === ((3L, 4L, 2L, 0.4)))
    assert(out(("A", "C")) === ((3L, 1L, 0L, 0.0)))
    assert(out(("B", "C")) === ((4L, 1L, 0L, 0.0)))
    assert(out.size === 3)
  }

  test("active users: crafted visit pattern pins exact DAU/WAU/MAU; " +
    "bitmap plan == naive distinct on the corpus") {
    import spark.implicits._
    // day 1: users 1,2 · day 5: users 2,3 · day 10: user 4 · day 40: user 1
    val rows = Seq((1, 1L), (1, 2L), (5, 2L), (5, 3L), (10, 4L), (40, 1L))
      .map { case (d, u) =>
        (u, java.time.LocalDate.of(2023, 12, 31).plusDays(d).toString + " 12:00:00")
      }
    val events = rows.toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    val out = Events.activeUsers(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("2024-01-01") === ((2L, 2L, 2L)))
    // day 5: window [Dec 30..Jan 5] catches day 1 -> wau {1,2,3}
    assert(out("2024-01-05") === ((2L, 3L, 3L)))
    // day 10: 7-day window [Jan 4..10] = days 5,10 -> {2,3,4}; 30-day all -> 4
    assert(out("2024-01-10") === ((1L, 3L, 4L)))
    // day 40: everything else aged out of both windows
    assert(out("2024-02-09") === ((1L, 1L, 1L)))
    assert(out.size === 4)

    // corpus differential: bitmap rollup == naive windowed distinct
    val ev = Tables.events(spark, sf0001)
    val got = Events.activeUsers(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val du = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val want = du.map(_._1).distinct.sorted.map { d =>
      def win(n: Int) = du.filter { case (dd, _) =>
        !dd.isAfter(d) && dd.isAfter(d.minusDays(n)) }.map(_._2).distinct.length.toLong
      (d.toString, win(1), win(7), win(30))
    }
    assert(got === want, "bitmap rollup diverged from the naive distinct")
  }
}
