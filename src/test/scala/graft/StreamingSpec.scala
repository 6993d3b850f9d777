package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Events
import graft.streaming.EventsStream

/** The streaming twins must agree with their batch counterparts when fed
  * the same (finite) input. */
class StreamingSpec extends SparkSpec {

  private lazy val stageDir = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_events_stream_src"
    // Stage the events table as clean parquet (micros timestamps) so the
    // streaming source can read it with a static schema.
    Tables.events(spark, sf0001).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly rollup matches the batch rollup") {
    val streamed = EventsStream.rollup(EventsStream.readEvents(spark, stageDir))
    val q = streamed.writeStream
      .format("memory").queryName("rollup_sink").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("rollup_sink")
      .select("hour", "event_type", "n_events", "sum_value", "avg_value")
      .orderBy("event_type", "hour").collect()
    val want = Events.rollup(Tables.events(spark, sf0001))
      .select(col("hour"), col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("event_type", "hour").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }


  test("streaming EXACT distinct rollup matches the batch bitmap path") {
    val streamed = EventsStream.distinctRollup(
      EventsStream.readEvents(spark, stageDir))
    val q = streamed.writeStream
      .format("memory").queryName("bm_rollup_sink").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("bm_rollup_sink")
      .orderBy("event_type", "hour").collect()
    // Batch truth: exact countDistinct per (type, hour) over the same rows.
    val want = Tables.events(spark, sf0001)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .select("hour", "event_type", "n_events", "n_users")
      .orderBy("event_type", "hour").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming dedup drops duplicates within the watermark") {
    val dupDir = s"${System.getProperty("java.io.tmpdir")}/graft_events_dup_src"
    val events = Tables.events(spark, sf0001)
    events.union(events).coalesce(1).write.mode("overwrite").parquet(dupDir)
    val deduped = EventsStream.dedupEvents(
      spark.readStream.schema(spark.read.parquet(dupDir).schema).parquet(dupDir))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_sink").count() === events.count())
  }

  test("streaming Misra-Gries heavy hitters: superset of the exact heavy set, bounded state") {
    import graft.streaming.HeavyHittersStream
    import graft.operators.Analytics
    import SparkEntry.Params.HeavyPhiInv
    val docsDir = s"${System.getProperty("java.io.tmpdir")}/graft_hh_stream_src"
    val docs = Tables.documents(spark, sf0001)
    docs.select("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(docsDir)
    val k = HeavyPhiInv
    val numShards = 4
    val streamed = HeavyHittersStream.heavyHitters(
      spark.readStream.schema(spark.read.parquet(docsDir).schema).parquet(docsDir),
      k, numShards)
    val q = streamed.writeStream
      .format("memory").queryName("hh_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per (shard, term) is the final counter value
    val sink = spark.table("hh_sink")
    val candidates = sink.select("term").distinct()
      .collect().map(_.getString(0)).toSet
    val exact = Analytics.heavyHitters(docs, HeavyPhiInv).collect()
      .map(_.getString(0)).toSet
    assert(exact.nonEmpty && exact.subsetOf(candidates),
      s"MG stream lost heavy hitters: ${exact -- candidates}")
    // the state bound: no batch's snapshot carries more than k terms
    // per shard (the whole point vs exact streaming counts)
    val maxPerShard = sink.groupBy("shard").agg(
      countDistinct("term").as("n")).collect().map(_.getLong(1)).max
    assert(maxPerShard <= k.toLong * 2,
      s"shard summary grew past the MG bound: $maxPerShard")
  }

  test("streaming MinHash near-dup twin matches the batch star candidates") {
    import graft.streaming.DedupStream
    val docsDir = s"${System.getProperty("java.io.tmpdir")}/graft_docs_stream_src"
    // Arrival time synthesized from doc_id — the streaming source's
    // event-time column (watermark anchor on a real feed).
    val docs = Tables.documents(spark, sf0001)
      .withColumn("ts",
        timestamp_seconds(lit(1767225600L) + col("doc_id")))
    docs.coalesce(1).write.mode("overwrite").parquet(docsDir)

    val streamed = DedupStream.nearDupPairs(
      spark.readStream.schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
        .withWatermark("ts", "2 hours"))
    val q = streamed.writeStream
      .format("memory").queryName("neardup_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("neardup_sink")
      .select("a", "b").distinct().orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = DedupStream.nearDupPairsBatch(docs)
      .select("a", "b").distinct().orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("per-row streaming signature equals the aggregate batch signature") {
    import graft.streaming.DedupStream
    val docs = Tables.documents(spark, sf0001).withColumn("ts", current_timestamp())
    val perRow = DedupStream.bandedDocs(docs, 3, 12, 2)
      .select("doc_id", "band_id", "band_key")
    val agg = {
      val sig = graft.operators.Dedup.minhashSignatures(Tables.documents(spark, sf0001), 3, 12)
      sig.select(col("doc_id"),
        explode(graft.operators.Dedup.bandStructs(col("sig"), 6, 2)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
    }
    assert(perRow.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(perRow).count() === 0)
  }

  test("streaming corpus prep: dedup-within-watermark + gate over a duplicated stream") {
    import graft.streaming.DedupStream
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_docs_prep_src"
    val docs = Tables.documents(spark, sf0001)
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("doc_id")))
    // feed every doc twice — exact dedup must collapse the copies
    docs.union(docs).coalesce(1).write.mode("overwrite").parquet(dir)
    val streamed = DedupStream.corpusPrep(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir))
    val q = streamed.writeStream
      .format("memory").queryName("prep_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("prep_sink").select("doc_id").distinct().count()
    // batch reference: unique contents, then the same gate
    val want = graft.operators.CorpusPipeline.qualityGate(
      docs.dropDuplicates("text")).count()
    assert(spark.table("prep_sink").count() === got) // no duplicate rows emitted
    assert(got === want)
  }

  test("stateless quality gate is batch/stream identical (same function)") {
    import graft.operators.CorpusPipeline
    val docsDir = s"${System.getProperty("java.io.tmpdir")}/graft_docs_gate_src"
    Tables.documents(spark, sf0001).coalesce(1).write.mode("overwrite").parquet(docsDir)
    val streamed = CorpusPipeline.qualityGate(
      spark.readStream.schema(spark.read.parquet(docsDir).schema).parquet(docsDir))
    val q = streamed.writeStream
      .format("memory").queryName("gate_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("gate_sink").orderBy("doc_id").collect()
    val want = CorpusPipeline.qualityGate(Tables.documents(spark, sf0001))
      .orderBy("doc_id").collect()
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("streaming windowed quantile sketch matches the batch sketch exactly") {
    // the same mergeable sketch evaluated streaming (watermark closes
    // windows) vs batch over identical finite input must agree row-ish
    // for row: both sides are approx_percentile at the same accuracy
    val streamed = EventsStream.valueQuantiles(
      EventsStream.readEvents(spark, stageDir), Seq(50, 90, 99))
    val q = streamed.writeStream
      .format("memory").queryName("quant_sink").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("quant_sink")
      .orderBy("hour", "event_type").collect()
    val want = EventsStream.valueQuantiles(Tables.events(spark, sf0001), Seq(50, 90, 99))
      .orderBy("hour", "event_type").collect()
    assert(got.nonEmpty && got.toSeq === want.toSeq)
  }

  test("streaming funnel transitions match the batch funnel stage counts") {
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    val events = spark.readStream
      .schema(spark.read.parquet(stageDir).schema).parquet(stageDir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[EventsStream.FunnelEvent]
    val hits = EventsStream.funnelTransitions(events, steps)
    val q = hits.writeStream
      .format("memory").queryName("funnel_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("funnel_sink")
      .groupBy("stage_idx", "stage").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Events.funnel(Tables.events(spark, sf0001), steps)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want, "per-stage user counts must match the batch funnel")
    // each user emits at most one transition per stage
    val dups = spark.table("funnel_sink")
      .groupBy("user_id", "stage_idx").count().where(col("count") > 1).count()
    assert(dups === 0)
  }

  test("streaming index ingest == batch append: same postings, frozen centroids untouched") {
    import graft.operators.Ivf
    val tmp = System.getProperty("java.io.tmpdir")
    val emb = Tables.embeddings(spark, sf0001)
    val base = emb.where(col("vec_id") < 40)
    val delta = emb.where(col("vec_id") >= 40)

    // two identical indexes from the base corpus
    val streamPath = s"$tmp/graft_ingest_stream_idx"
    val batchPath = s"$tmp/graft_ingest_batch_idx"
    Ivf.save(base, 10, streamPath)
    Ivf.save(base, 10, batchPath)
    val centsBefore = spark.read.parquet(s"$streamPath/centroids")
      .orderBy("centroid_id").collect().toSeq

    // batch twin appends directly; streaming twin reads the delta as a
    // file stream and ingests micro-batch-wise
    Ivf.append(spark, batchPath, delta)
    val deltaDir = s"$tmp/graft_ingest_delta_src"
    delta.select("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(deltaDir)
    val ckpt = s"$tmp/graft_ingest_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def deltaStream() = spark.readStream
      .schema(spark.read.parquet(deltaDir).schema).parquet(deltaDir)
    val q = graft.streaming.IndexIngest.ingest(deltaStream(), streamPath, Some(ckpt))
    q.awaitTermination(120000)

    // partition-dir column comes back int-inferred — normalize to long
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .select(col("vec_id"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(postings(streamPath) == postings(batchPath),
      "streamed ingest postings diverge from the batch append")
    assert(postings(streamPath).map(_._1) ==
      emb.select("vec_id").collect().map(_.getLong(0)).toSet,
      "ingest lost or duplicated vectors")
    val centsAfter = spark.read.parquet(s"$streamPath/centroids")
      .orderBy("centroid_id").collect().toSeq
    assert(centsAfter == centsBefore, "ingest mutated the frozen centroids")

    // restart against the SAME checkpoint: the source offset log marks
    // the delta as consumed, so the non-idempotent appendWith must not
    // run again (without the checkpoint this replays and double-appends)
    val q2 = graft.streaming.IndexIngest.ingest(deltaStream(), streamPath, Some(ckpt))
    q2.awaitTermination(120000)
    assert(postings(streamPath) == postings(batchPath),
      "checkpointed restart double-appended the delta")
  }

  test("stream-stream interval join: streamed touchpoints == batch twin, report == as-of " +
    "attribution on every attributed purchase") {
    import graft.streaming.AttributionStream
    import graft.operators.AsOf
    val windowSec = 86400L
    // Raw stream — touchpoints defines its OWN per-side watermarks on
    // the renamed time columns (readEvents' ts watermark would clash).
    val streamed = AttributionStream.touchpoints(
      spark.readStream.schema(spark.read.parquet(stageDir).schema).parquet(stageDir),
      windowSec)
    val q = streamed.writeStream
      .format("memory").queryName("attr_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("attr_sink")
    assert(got.count() > 0, "no touchpoints emitted")
    // The SAME function on the static frame is the differential
    // (withWatermark is a no-op on batch).
    val want = AttributionStream.touchpoints(Tables.events(spark, sf0001), windowSec)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(2), r.getLong(3))
    assert(got.select("event_id", "user_id", "click_id", "secs_before")
        .collect().map(key).toSet ===
      want.collect().map(key).toSet,
      "streamed touchpoint log != batch interval join")
    // Folding the log must reproduce the q91 as-of attribution on
    // every ATTRIBUTED purchase (same window, same tie rule).
    val rep = AttributionStream.toReport(got).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val asof = AsOf.clickAttribution(Tables.events(spark, sf0001), windowSec)
      .where(col("attributed") === 1)
      .select("event_id", "click_id", "secs_since_click").collect()
    assert(asof.nonEmpty)
    assert(rep.size === asof.length, "report rows != attributed purchases")
    asof.foreach { r =>
      assert(rep(r.getLong(0)) === ((r.getLong(1), r.getLong(2))),
        s"purchase ${r.getLong(0)}: report's most-recent click diverged from as-of")
    }
  }

  test("stateful streaming sessionization matches the batch sessionize") {
    import spark.implicits._
    val events = spark.readStream
      .schema(spark.read.parquet(stageDir).schema).parquet(stageDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventsStream.Event]
    val sessions = EventsStream.sessionize(events, gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("session_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("session_sink")
      .select(col("user_id"), col("session_seq"), col("n_events"),
        round(col("sum_value"), 6).as("sum_value"))
      .orderBy("user_id", "session_seq").collect()
    val want = Events.sessionize(Tables.events(spark, sf0001), 30)
      .orderBy("user_id", "session_seq").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming weighted reservoir converges to the batch sample bit-for-bit " +
    "across micro-batch boundaries") {
    import graft.streaming.ReservoirStream
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft_resv_stream_src"
    // 3 files + maxFilesPerTrigger=1 → the same rows arrive over 3
    // micro-batches; top-k of a set is batching-insensitive, so the
    // final reservoirs must match the batch operator exactly
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val streamed = ReservoirStream.weightedReservoir(
      spark.readStream.schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir), k = 5)
    val q = streamed.writeStream
      .format("memory").queryName("resv_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // every survivor was emitted when it entered its reservoir, and
    // every emitted row is real data — so the deterministic top-k over
    // the distinct emissions IS the final state
    val emitted = spark.table("resv_sink").distinct()
    val got = Sampling.weightedReservoir(emitted, 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = Sampling.weightedReservoir(docs, 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want, s"stream reservoir diverged from batch")
    assert(emitted.count() >= want.length.toLong,
      "stream emitted fewer rows than the final reservoirs hold")
  }

  test("streaming MV maintenance: the folded view equals the batch summary bit-for-bit and " +
    "each micro-batch left a time-travelable view version") {
    import graft.operators.{Mv, Snapshots}
    import graft.streaming.MvStream
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
    // Stage as MULTIPLE files + maxFilesPerTrigger=1 so the fold runs
    // across several micro-batches, not one.
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft_mv_stream_src"
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val viewPath = s"${System.getProperty("java.io.tmpdir")}/graft_mv_stream_view"
    val vp = new org.apache.hadoop.fs.Path(viewPath)
    val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(vp)) fs.delete(vp, true)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = MvStream.maintain(stream, viewPath)
    q.processAllAvailable(); q.stop()
    val versions = Snapshots.latest(spark, viewPath)
    assert(versions >= 3, s"expected one view version per micro-batch, got $versions")
    val folded = Mv.report(Snapshots.read(spark, viewPath)).collect().toSeq
    val direct = Mv.report(Mv.summarize(docs)).collect().toSeq
    assert(folded == direct, "continuously-folded view diverged from the batch summary")
    // Earlier view versions remain readable (fewer docs accounted).
    val v1n = Snapshots.read(spark, viewPath, 1L)
      .agg(sum("n_docs")).head().getLong(0)
    assert(v1n < docs.count(), "version 1 should cover only the first micro-batch")
  }

  test("streaming MV exactly-once: a replayed micro-batch no-ops bit-identically " +
    "(at-least-once delivery cannot double-fold the algebraic view)") {
    import graft.operators.{Mv, Snapshots}
    import graft.streaming.MvStream
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
    val viewPath = s"${System.getProperty("java.io.tmpdir")}/graft_mv_replay_view"
    val vp = new org.apache.hadoop.fs.Path(viewPath)
    val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(vp)) fs.delete(vp, true)
    val b0 = docs.where(pmod(col("doc_id"), lit(2L)) === 0)
    val b1 = docs.where(pmod(col("doc_id"), lit(2L)) === 1)
    assert(MvStream.foldBatch(b0, 0L, viewPath), "first delivery must apply")
    val v1 = Mv.report(Snapshots.read(spark, viewPath)).collect().toSeq
    // the retry re-delivers the SAME batch id (foreachBatch's
    // at-least-once contract) — the fold must recognize and no-op
    assert(!MvStream.foldBatch(b0, 0L, viewPath), "replay must be skipped")
    assert(Snapshots.latest(spark, viewPath) == 1L, "replay committed a view version")
    assert(Mv.report(Snapshots.read(spark, viewPath)).collect().toSeq == v1,
      "replay double-folded the summary")
    assert(MvStream.foldBatch(b1, 1L, viewPath), "the next batch must apply")
    // a LATE replay of an old batch after newer commits also no-ops
    assert(!MvStream.foldBatch(b0, 0L, viewPath))
    assert(Snapshots.committedBatchId(spark, viewPath).contains(1L))
    assert(Mv.report(Snapshots.read(spark, viewPath)).collect().toSeq ==
      Mv.report(Mv.summarize(docs)).collect().toSeq,
      "after replays, the folded view must still equal the batch summary")
  }

  test("streaming MV restart: the same checkpoint resumes at the first unfolded " +
    "batch — no re-fold of committed batches, new data still lands") {
    import graft.operators.{Mv, Snapshots}
    import graft.streaming.MvStream
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mv_restart"
    val bp = new org.apache.hadoop.fs.Path(base)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(bp)) fs.delete(bp, true)
    val srcDir = s"$base/src"; val viewPath = s"$base/view"; val ckpt = s"$base/ckpt"
    val half = pmod(col("doc_id"), lit(2L)) === 0
    docs.where(half).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def run(): Unit = {
      val q = MvStream.maintain(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
        viewPath, checkpoint = Some(ckpt))
      q.processAllAvailable(); q.stop()
    }
    run()
    val versionsAfterFirst = Snapshots.latest(spark, viewPath)
    // restart with NOTHING new: checkpoint says all batches folded — the
    // view must not move (a fresh checkpoint here would re-fold batch 0)
    run()
    assert(Snapshots.latest(spark, viewPath) == versionsAfterFirst,
      "restart with no new data must not commit")
    // new files + restart: only the new batches fold, totals exact
    docs.where(!half).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(Mv.report(Snapshots.read(spark, viewPath)).collect().toSeq ==
      Mv.report(Mv.summarize(docs)).collect().toSeq,
      "restarted maintenance diverged from the batch summary")
  }

  test("streaming CUSUM detector: a planted shift alarms at the exact hours the " +
    "scaled recurrence predicts, a constant stream never alarms, and batching " +
    "cannot move an alarm") {
    import graft.streaming.ChangepointStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // click: 10 hours at 3/hr (first 5 = baseline -> mu0 = 3), then 10 at
    // 9/hr. kappa=1, H=6, scaled by refN=5: pre-shift hours add
    // max(0, 5*3-15-5) = 0; each shifted hour adds 5*9-15-5 = 25 against
    // the 30 gate -> alarms at the 2nd, 4th, ... shifted hour (reset
    // after each): hours 11, 13, 15, 17, 19, statistic 50/5 = 10.0
    def mk(tpe: String, perHour: Int => Int) = (0 until 20).flatMap { h =>
      (0 until perHour(h)).map(i => (tpe, f"2024-03-01 $h%02d:00:${i % 60}%02d"))
    }
    val rows = mk("click", h => if (h < 10) 3 else 9) ++ mk("view", _ => 5)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cusum_stream_src"
    val df = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    def runDetect(srcDir: String, name: String, oneFilePerTrigger: Boolean) = {
      val reader = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      val src = (if (oneFilePerTrigger) reader.option("maxFilesPerTrigger", 1) else reader)
        .parquet(srcDir)
      val q = ChangepointStream.detect(src, refHours = 5, kappa = 1L,
        hThreshold = 6L, graceHours = 0)
        .writeStream.format("memory").queryName(name).outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getDouble(3), r.getDouble(4))).sortBy(t => (t._1, t._2))
    }
    val got = runDetect(dir, "cusum_sink", oneFilePerTrigger = false)
    val wantHours = Seq(11, 13, 15, 17, 19).map(h => f"2024-03-01 $h%02d:00:00")
    assert(got.map(_._2).toSeq == wantHours, s"alarm hours: ${got.toSeq}")
    assert(got.forall(a => a._1 == "click" && a._3 == "up" &&
      a._4 == 10.0 && a._5 == 3.0), s"alarm payload: ${got.toSeq}")
    // batching-invariance: the same rows over 4 micro-batches, hour-sliced
    val dir4 = s"${System.getProperty("java.io.tmpdir")}/graft_cusum_stream_src4"
    (0 until 4).foreach { part =>
      df.where(hour(col("ts")) >= part * 5 && hour(col("ts")) < (part + 1) * 5)
        .coalesce(1).write.mode(if (part == 0) "overwrite" else "append").parquet(dir4)
      Thread.sleep(1100) // distinct mtimes: FileStreamSource replays in file order
    }
    val got4 = runDetect(dir4, "cusum_sink4", oneFilePerTrigger = true)
    assert(got4.toSeq == got.toSeq, "micro-batch slicing moved an alarm")
  }

  test("native session_window stream == batch sessionizeNative == stateful sessionize " +
    "(three faces, one contract)") {
    val streamed = EventsStream.sessionWindows(
      spark.readStream.schema(spark.read.parquet(stageDir).schema).parquet(stageDir))
    val q = streamed.writeStream
      .format("memory").queryName("swin_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("swin_sink")
      .select(col("user_id"), date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Events.sessionizeNative(Tables.events(spark, sf0001), 30)
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.nonEmpty)
    // Append-mode emits only watermark-FINALIZED sessions; on a finite
    // AvailableNow run the tail inside the watermark horizon may be
    // withheld, so streamed ⊆ batch, covering all but that horizon.
    assert(got.subsetOf(want), s"streamed sessions not a subset of batch: ${(got -- want).take(3)}")
    assert(got.size >= want.size / 2,
      s"streamed emitted too few finalized sessions: ${got.size} of ${want.size}")
  }

  test("streaming DAU: final per-day counts equal the batch operator; " +
    "replayed rows cannot inflate (bitmap idempotence)") {
    import graft.streaming.ActiveUsersStream
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001).select("ts", "user_id")
    // replay the corpus TWICE in two files: duplicate delivery of every
    // event — the at-least-once worst case; counts must not move
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_dau_stream_src"
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    Thread.sleep(1100)
    ev.coalesce(1).write.mode("append").parquet(dir)
    val q = ActiveUsersStream.dau(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir))
      .writeStream.format("memory").queryName("dau_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last emission per day = the settled count
    // counts only grow, so the settled value is the max (order-robust)
    val got = spark.table("dau_sink").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = graft.operators.Events.activeUsers(Tables.events(spark, sf0001))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want, "streamed DAU diverged from batch (or replay inflated it)")
  }

  test("streaming funnel: completion log under time-sliced replay equals the " +
    "batch earliest-chain semantics, counts and frontier times both") {
    import graft.streaming.FunnelStream
    import org.apache.spark.sql.functions._
    val steps = SparkEntry.Params.FunnelSteps
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "ts", "event_id")
    // time-sliced replay: 4 files in event-time order (the contract)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_funnel_stream_src"
    val bounds = ev.select(
      percentile_approx(col("ts").cast("double"), array(lit(0.25), lit(0.5), lit(0.75)),
        lit(1000))).head().getSeq[Double](0)
    val slices = (Double.MinValue +: bounds) :+ Double.MaxValue
    (0 until 4).foreach { i =>
      ev.where(col("ts").cast("double") >= slices(i) &&
          col("ts").cast("double") < slices(i + 1))
        .coalesce(1).write.mode(if (i == 0) "overwrite" else "append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes: FileStreamSource replays in file order
    }
    val q = FunnelStream.completions(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), steps)
      .writeStream.format("memory").queryName("funnel_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("funnel_sink").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    // driver-computed batch semantics: earliest strictly-ordered chain
    val byUser = ev.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val want = byUser.flatMap { case (u, evs) =>
      val f = Array.fill(steps.length)(Long.MinValue)
      evs.sortBy(e => (e._3, e._4)).foreach { case (_, tpe, ts, _) =>
        val s = steps.indexOf(tpe)
        if (s >= 0 && f(s) == Long.MinValue &&
          (s == 0 || (f(s - 1) != Long.MinValue && ts > f(s - 1)))) f(s) = ts
      }
      f.zipWithIndex.collect { case (t, i) if t != Long.MinValue => (u, i + 1) -> t }
        .toSeq
    }
    assert(got === want.toMap, "streamed funnel diverged from the batch chain")
    // and the aggregated counts equal the batch funnel report
    val batchCounts = graft.operators.Events.funnel(Tables.events(spark, sf0001), steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val streamCounts = got.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(streamCounts === batchCounts.filter(_._2 > 0),
      s"counts: $streamCounts vs $batchCounts")
  }

  test("streaming Holt forecast: closed-hour folds equal the batch operator " +
    "bit-for-bit, under one batch and under hour-sliced micro-batches") {
    import graft.streaming.HoltStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the CurationSpec holt corpus: constant 5/hr view + exact ramp click,
    // hours 0-19, plus a FLUSH hour 20 so grace=1 closes all real hours
    def mk(tpe: String, perHour: Int => Int) = (0 until 20).flatMap { h =>
      (0 until perHour(h)).map(i => (tpe, f"2024-03-01 $h%02d:${i / 60}%02d:${i % 60}%02d"))
    }
    val real = mk("view", _ => 5) ++ mk("click", h => 2 * (h + 1))
    val flush = Seq(("view", "2024-03-01 20:00:00"), ("click", "2024-03-01 20:00:00"))
    val df = (real ++ flush).toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_holt_stream_src"
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    def run(srcDir: String, name: String, oneFilePerTrigger: Boolean) = {
      val reader = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      val src = (if (oneFilePerTrigger) reader.option("maxFilesPerTrigger", 1) else reader)
        .parquet(srcDir)
      val q = HoltStream.forecast(src, 2, 1, 10, graceHours = 1)
        .writeStream.format("memory").queryName(name).outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    }
    val got = run(dir, "holt_sink", oneFilePerTrigger = false)
    // the hour-19 emission state == the batch fit over the real hours
    val batchRows = graft.operators.Events.holtForecast(
      real.toDF("event_type", "ts_s")
        .select(col("event_type"), to_timestamp(col("ts_s")).as("ts")), 2, 1, 10, 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    Seq("view", "click").foreach { tpe =>
      val last = got.filter(t => t._1 == tpe && t._2 == "2024-03-01 19:00:00")
      assert(last.length == 1, s"$tpe: hour-19 emission missing")
      val (_, _, nh, l, b, f1) = last.head
      assert((nh, l, b, f1) === batchRows(tpe), s"$tpe: stream != batch fold")
    }
    // every real hour emitted exactly once per type
    assert(got.count(_._1 == "click") == 20 && got.count(_._1 == "view") == 20)
    // micro-batch slicing (4 hour-aligned files) changes nothing
    val dir4 = s"${System.getProperty("java.io.tmpdir")}/graft_holt_stream_src4"
    (0 until 4).foreach { part =>
      df.where(hour(col("ts")) >= part * 6 && hour(col("ts")) < (part + 1) * 6)
        .coalesce(1).write.mode(if (part == 0) "overwrite" else "append").parquet(dir4)
      Thread.sleep(1100) // distinct mtimes: FileStreamSource replays in file order
    }
    val got4 = run(dir4, "holt_sink4", oneFilePerTrigger = true)
    assert(got4.toSeq == got.toSeq, "micro-batch slicing changed a fold")
  }

  test("streaming theta sketch: settled per-segment bytes equal the batch " +
    "aggregate bit-for-bit; duplicate delivery cannot inflate") {
    import graft.streaming.SketchStream
    import graft.functions.ThetaSketch
    import org.apache.spark.sql.functions._
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority").as("segment"), col("o_custkey").as("id"))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sketch_stream_src"
    // replay twice: at-least-once worst case — KMV add is idempotent
    rows.coalesce(1).write.mode("overwrite").parquet(dir)
    Thread.sleep(1100)
    rows.coalesce(1).write.mode("append").parquet(dir)
    val q = SketchStream.segmentSketches(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), 1024)
      .writeStream.format("memory").queryName("sketch_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last emission per segment = the settled sketch (estimates only grow)
    val got = spark.table("sketch_sink").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val want = rows
      .select(col("segment"), xxhash64(col("id")).as("h"))
      .groupBy("segment")
      .agg(ThetaSketch.thetaSketch(col("h"), 1024).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (seg, (_, est, bytes)) =>
      assert(java.util.Arrays.equals(bytes, want(seg)),
        s"segment $seg: streamed sketch bytes diverged from batch")
      assert(est == ThetaSketch.estimateOf(want(seg)))
    }
  }

  test("streaming CMS: settled per-segment grid equals the batch " +
    "aggregate bit-for-bit; point queries answer off the last emission") {
    import graft.streaming.SketchStream
    import graft.functions.CountMin
    import org.apache.spark.sql.functions._
    val rows = Tables.documents(spark, sf0001)
      .select(col("lang").as("segment"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cms_stream_src"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // two files → two micro-batches: the grid folds incrementally
    rows.where(length(col("term")) % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Thread.sleep(1100)
    rows.where(length(col("term")) % 2 === 1)
      .coalesce(1).write.mode("append").parquet(dir)
    val q = SketchStream.segmentCms(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), 4, 256)
      .writeStream.format("memory").queryName("cms_sink").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // total mass only grows across emissions → the max-mass row per
    // segment is the settled grid
    def mass(b: Array[Byte]) = CountMin.Cms.deserialize(b).tab.sum
    val got = spark.table("cms_sink").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(mass)).toMap
    val want = rows.groupBy("segment")
      .agg(CountMin.cmsSketch(col("term"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (seg, bytes) =>
      assert(java.util.Arrays.equals(bytes, want(seg)),
        s"segment $seg: streamed CMS grid diverged from batch")
    }
    // a point query off the settled grid upper-bounds the true count
    val truth = rows.where(col("segment") === got.keySet.head)
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.take(20).foreach { case (t, c) =>
      val est = CountMin.estimateOf(got(got.keySet.head),
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(est >= c, s"CMS under-counted '$t': $est < $c")
    }
  }

  test("streaming community attach: a streamed vertex lands on the SAME " +
    "label one fresh sync round over the union graph would give it; " +
    "no-labeled-neighbor vertices are held back, replays are re-votes") {
    import spark.implicits._
    import graft.operators.Graph
    import graft.streaming.CommunityStream
    val tmp = System.getProperty("java.io.tmpdir")
    // two planted cliques, batch LPA seeds the store
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val base = (clique(1L to 5L) ++ clique(11L to 15L)).toDF("src", "dst")
    val labelsPath = s"$tmp/graft_community_labels"
    val lp = new org.apache.hadoop.fs.Path(labelsPath)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lp)) fs.delete(lp, true)
    Graph.labelPropagation(base, 5).write.parquet(labelsPath)
    val seeded = spark.read.parquet(labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // arriving edges: vertex 6 attaches to the left clique (two votes),
    // vertex 16 to the right (one vote), vertex 99 touches only the
    // UNLABELED 98 — it must be held back, not seeded
    val delta = Seq((6L, 1L), (6L, 2L), (16L, 11L), (99L, 98L))
      .toDF("src", "dst")
    val deltaDir = s"$tmp/graft_community_delta"
    delta.coalesce(1).write.mode("overwrite").parquet(deltaDir)
    val ckpt = s"$tmp/graft_community_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def deltaStream() = spark.readStream
      .schema(spark.read.parquet(deltaDir).schema).parquet(deltaDir)
    CommunityStream.attach(deltaStream(), labelsPath, Some(ckpt))
      .awaitTermination(120000)

    val after = spark.read.parquet(labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(6L) == seeded(1L), s"vertex 6 must join the left clique: $after")
    assert(after(16L) == seeded(11L), s"vertex 16 must join the right clique: $after")
    assert(!after.contains(99L) && !after.contains(98L),
      s"no-labeled-neighbor vertices must be held back: $after")
    // equivalence pin: one fresh sync round over the union graph gives
    // the streamed vertices the same labels (their neighbors settled)
    val union = base.union(delta.where(col("src") =!= 99L))
    val oneRound = Graph.labelPropagation(union, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneRound(6L) == after(6L) && oneRound(16L) == after(16L),
      "streamed attach diverged from the settled batch labeling")
    // checkpointed restart: the consumed delta must not re-append
    val n1 = spark.read.parquet(labelsPath).count()
    CommunityStream.attach(deltaStream(), labelsPath, Some(ckpt))
      .awaitTermination(120000)
    assert(spark.read.parquet(labelsPath).count() == n1,
      "checkpointed restart re-appended the attach rows")
  }

  test("community attach is robust to a poisoned store: duplicate " +
    "(v,label) rows cannot double-count votes, and an already-attached " +
    "vertex re-attaches nothing") {
    import spark.implicits._
    import graft.streaming.CommunityStream
    // vertex 50's true majority is label 200 (neighbors 2 and 3) over
    // label 100 (neighbor 1 only); a duplicated (1,100) store row —
    // what a checkpoint-less replay's double-append leaves — would tie
    // the naive count 2:2 and the label-asc tiebreak would flip the
    // vote to 100
    val poisoned = Seq((1L, 100L), (1L, 100L), (2L, 200L), (3L, 200L))
      .toDF("v", "label")
    val edges = Seq((50L, 1L), (50L, 2L), (50L, 3L)).toDF("src", "dst")
    val got = CommunityStream.attachStep(edges, poisoned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(50L -> 200L),
      s"duplicate store rows double-counted a vote: $got")
    // replay shape: the vertex is already in the store (possibly
    // duplicated) — the anti-join must attach nothing
    val replayed = poisoned.union(Seq((50L, 200L), (50L, 200L)).toDF("v", "label"))
    assert(CommunityStream.attachStep(edges, replayed).isEmpty,
      "replayed batch re-attached an already-labeled vertex")
  }
}
