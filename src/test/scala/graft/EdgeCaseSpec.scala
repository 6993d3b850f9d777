package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup, Events, Profile, TextAnalysis}

/** Degenerate-input behavior: empty/whitespace documents, malformed
  * JSON, empty tables — operators must degrade to well-defined results,
  * not throw or emit garbage rows. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val oddDocs = Seq(
    (1L, "", "en", "web", 0L),
    (2L, "   \t  \n ", "en", "web", 8L),
    (3L, "one", "en", "web", 3L),
    (4L, "one two three four", "en", "web", 18L),
    (5L, "one two three four", "de", "mail", 18L) // cross-block dup
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token counts: empty and whitespace-only docs count zero tokens") {
    val rows = TextAnalysis.tokenCount(oddDocs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(1L) === 0 && rows(2L) === 0 && rows(3L) === 1 && rows(4L) === 4)
  }

  test("shingling: docs shorter than k drop out instead of emitting partials") {
    val sh = Dedup.shingleRows(oddDocs, 3).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sh === Set(4L, 5L), s"unexpected shingle docs: $sh")
  }

  test("minhash LSH: identical docs across blocks are found, empty docs ignored") {
    val pairs = Dedup.minhashLsh(oddDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((4L, 5L, 1.0)))
  }

  test("quality score: zero-token docs divide by the greatest(1) guard, not by zero") {
    val rows = TextAnalysis.qualityScore(oddDocs).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => !r.isNullAt(3) && !r.getDouble(3).isNaN))
  }

  test("props parsing: malformed JSON yields null k, aggregates skip it") {
    val events = Seq(
      (1L, "purchase", "{\"k\": 3}"),
      (2L, "purchase", "not json"),
      (3L, "purchase", "{}"),
      (4L, "view", "{\"k\": 7}")
    ).toDF("event_id", "event_type", "props")
    val rows = Events.propsStats(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // count(*) counts all rows; sum skips the null ks.
    assert(rows("purchase") === ((3L, 3L)))
    assert(rows("view") === ((1L, 7L)))
  }

  test("dedup exact on an empty table returns no rows without failing") {
    val empty = oddDocs.where(lit(false))
    assert(Dedup.exact(empty).count() === 0)
    assert(Dedup.minhashLsh(empty).count() === 0)
  }

  test("chunking: overlap-stripped concatenation reconstructs every document") {
    import graft.operators.TextAnalysis
    val (size, overlap) = (7, 3)
    val chunks = TextAnalysis.chunk(oddDocs, size, overlap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val texts = oddDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      if (t.isEmpty) assert(!chunks.contains(id), s"doc $id: empty doc emitted chunks")
      else {
        val cs = chunks(id)
        assert(cs.nonEmpty)
        val rebuilt = cs.head + cs.tail.map(_.drop(overlap)).mkString
        assert(rebuilt === t, s"doc $id: reconstruction mismatch")
        // every chunk but the last is exactly `size` chars
        assert(cs.init.forall(_.length == size))
      }
    }
  }

  test("token chunking: overlap-stripped token windows reconstruct the token stream") {
    import graft.operators.TextAnalysis
    val (maxT, overlap) = (3, 1)
    val chunks = TextAnalysis.chunkByTokens(oddDocs, maxT, overlap).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // docs 1 and 2 have zero tokens → no chunks
    assert(!chunks.contains(1L) && !chunks.contains(2L))
    val texts = oddDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.foreach { case (id, cs) =>
      val want = texts(id).split("\\s+").filter(_.nonEmpty).toSeq
      val rebuilt = cs.head._3.split(" ").toSeq ++
        cs.tail.flatMap(_._3.split(" ").drop(overlap).toSeq)
      assert(rebuilt === want, s"doc $id: token reconstruction mismatch")
      // declared chunk_tokens matches the actual token count per chunk
      cs.foreach { case (_, _, chunk, nt) => assert(chunk.split(" ").length === nt) }
    }
  }

  test("packing: token conservation, contiguous pack ids, bounded overflow") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val (maxT, ov, budget, buckets) = (30, 5, 256, 8)
    val chunks = TextAnalysis.chunkByTokens(docs, maxT, ov)
    val packs = TextAnalysis.packChunks(chunks, budget, buckets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packs.nonEmpty)
    // conservation: pack tokens per bucket == chunk tokens per bucket
    val chunkTotals = chunks
      .groupBy(pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"))
      .agg(sum("chunk_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packTotals = packs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(packTotals === chunkTotals)
    // contiguous pack ids from 0 within each bucket
    packs.groupBy(_._1).foreach { case (b, ps) =>
      val ids = ps.map(_._2).sorted.toSeq
      assert(ids === (0L until ids.length), s"bucket $b pack ids not contiguous: $ids")
    }
    // a pack overflows its budget by at most one chunk's tokens
    assert(packs.forall(_._4 < budget + maxT))
  }

  test("PII redaction: emails/IPs/phones scrubbed with exact counts; clean text untouched") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "contact a.user+tag@example.co.uk or admin@host.org today"),
      (2L, "server at 192.168.0.1 and backup 10.0.0.255 ok"),
      (3L, "call +14155550123 now"),
      (4L, "no pii here at all"),
      (5L, "mixed: x@y.io from 8.8.8.8 dial +4930123456")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.redactPii(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(rows(1L)._1 === 2 && rows(1L)._4 === "contact <EMAIL> or <EMAIL> today")
    assert(rows(2L)._2 === 2 && rows(2L)._4 === "server at <IP> and backup <IP> ok")
    assert(rows(3L)._3 === 1 && rows(3L)._4 === "call <PHONE> now")
    assert(rows(4L) === ((0, 0, 0, "no pii here at all")))
    assert(rows(5L) === ((1, 1, 1, "mixed: <EMAIL> from <IP> dial <PHONE>")))
  }

  test("PII redaction: overlapping patterns — counts equal actual replacements") {
    import graft.operators.TextAnalysis
    // the email pattern consumes the phone-looking local part; the
    // phone count must be 0 because no phone remains to redact
    val docs = Seq((1L, "call +14155550123@example.com now")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs).collect()(0)
    assert(r.getInt(1) === 1 && r.getInt(3) === 0)
    assert(r.getString(4) === "call <EMAIL> now")
  }

  test("contamination: cross-split exact dups are counted, unique eval docs are not") {
    import graft.operators.{CorpusPipeline, Dedup}
    val docs = ((0L until 20L).map(i => (i, "shared leaked text")) ++
      (20L until 40L).map(i => (i, s"unique text number $i")))
      .toDF("doc_id", "text")
    // ground truth split per doc via the ONE shared rule
    val splits = docs.select(col("doc_id"), CorpusPipeline.splitCol(90).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sharedEval = (0L until 20L).count(splits(_) == "eval")
    val sharedTrain = (0L until 20L).count(splits(_) == "train")
    val uniqueEval = (20L until 40L).count(splits(_) == "eval")
    val row = CorpusPipeline.contamination(docs, 90).collect()(0)
    assert(row.getLong(0) === sharedEval + uniqueEval)
    val expectedLeaked = if (sharedTrain > 0) sharedEval else 0
    assert(row.getLong(1) === expectedLeaked)
  }

  test("nearest-centroid: empty centroid set and off-dim centroids yield null assignment") {
    import graft.operators.Ivf
    val vecs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    // empty centroid frame → every row unassigned (null), not a crash
    val emptyCents = Seq.empty[(Long, Array[Float])].toDF("centroid_id", "c_emb")
    val a1 = Ivf.assign(vecs, emptyCents).collect()
    assert(a1.length === 2 && a1.forall(_.isNullAt(1)))
    // dimension-mismatched centroids are skipped, same as a NULL l2sq
    val badCents = Seq((0L, Array(1.0f, 2.0f, 3.0f))).toDF("centroid_id", "c_emb")
    val a2 = Ivf.assign(vecs, badCents).collect()
    assert(a2.forall(_.isNullAt(1)))
    // one good centroid among bad dims wins for every row
    val mixed = Seq((0L, Array(9.0f, 9.0f, 9.0f)), (1L, Array(0.0f, 0.0f)))
      .toDF("centroid_id", "c_emb")
    val a3 = Ivf.assign(vecs, mixed).collect()
    assert(a3.forall(r => !r.isNullAt(1) && r.getLong(1) === 1L))
    // a centroid with a NULL element never wins (NaN distance), but
    // doesn't crash collection or poison the other centroids
    val nullElem = Seq(
      (0L, Array[java.lang.Float](1.0f, null)),
      (1L, Array[java.lang.Float](0.0f, 0.0f)))
      .toDF("centroid_id", "c_emb")
    val a4 = Ivf.assign(vecs, nullElem).collect()
    assert(a4.forall(r => !r.isNullAt(1) && r.getLong(1) === 1L))
  }

  test("Lloyd refinement survives unassignable vectors (null element / off-dim)") {
    import graft.operators.Ivf
    val vecs = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f)),
      (2L, Array[java.lang.Float](3.0f, 4.0f)),
      (3L, Array[java.lang.Float](1.0f, null)),       // null element
      (4L, Array[java.lang.Float](1.0f, 2.0f, 3.0f))) // off-dim
      .toDF("vec_id", "embedding")
    val init = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(5.0f, 5.0f)))
      .toDF("centroid_id", "c_emb")
    // two iterations: the unassignable rows must not become a null-id
    // centroid that crashes the second collect
    val refined = Ivf.refineCentroids(vecs, init, iters = 2).collect()
    assert(refined.nonEmpty)
    assert(refined.forall(!_.isNullAt(0)))
  }

  test("span dedup: span conservation and untouched docs reassemble exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CorpusPipeline.spanDedup(docs, 8)
    // conservation: every doc with >0 tokens appears with
    // n_spans == ceil(n_tokens / 8), and removed <= spans
    val check = out
      .join(TextAnalysis.tokenCount(docs), "doc_id")
      .select(col("doc_id"), col("n_spans"), col("n_removed"),
        ceil(col("n_tokens").cast("double") / 8).cast("long").as("want"))
      .collect()
    assert(check.nonEmpty)
    check.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"span count off for doc ${r.getLong(0)}")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
    }
    // reassembly: docs with nothing removed rebuild their token stream
    val untouched = out.filter(col("n_removed") === 0)
      .join(docs, "doc_id")
      .select(col("clean_text"),
        array_join(split(trim(col("text")), "\\s+"), " ").as("orig"))
      .collect()
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("span dedup: a repeated leading span is removed from the later doc only") {
    val docs = Seq(
      (10L, "a b c d e f g h", "en", "web", 15L),
      (11L, "a b c d e f g h x y", "en", "web", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusPipeline.spanDedup(docs, 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows(10L) === ((1L, 0L, "a b c d e f g h")), "first occurrence must survive")
    assert(rows(11L) === ((2L, 1L, "x y")), "later duplicate span must be removed")
  }

  test("profile: per-column stats match hand-computed values, nulls excluded from distinct") {
    val df = Seq(
      (1L, Some("x"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("y"), None),
      (4L, Some("x"), Some(10)))
      .toDF("id", "s", "v")
    val rows = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(rows("id") === ((4L, 0L, 4L, "1", "4")))
    assert(rows("s") === ((4L, 1L, 2L, "x", "y")))
    assert(rows("v") === ((4L, 1L, 2L, "10", "30")))
  }

  test("BPE: empty text, no-merge vocab, and null text degrade cleanly") {
    import graft.functions.Bpe
    import org.apache.spark.unsafe.types.UTF8String
    val empty = Bpe.Ranks(Map.empty)
    assert(Bpe.countTokens(UTF8String.fromString(""), empty) === 0)
    // no merges → one token per UTF-8 byte of each pre-token
    assert(Bpe.countTokens(UTF8String.fromString("ab cd"), empty) === 5)
    // learner on an empty/degenerate corpus yields an empty merge table
    assert(Bpe.learn(Seq("", " ", "a"), 8).ranks.isEmpty)
    // null text flows through the expression as null, not an NPE
    val df = Seq((1L, "hello"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bc = spark.sparkContext.broadcast(empty)
    val out = df.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.SqlBridge.column(
        graft.functions.BpeCount(
          org.apache.spark.sql.graftbridge.SqlBridge.expression(col("text")), bc)).as("n"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) === 5 && out(1).isNullAt(1))
  }

  test("quality report: each rule fires on its crafted doc, reasons in fixed order") {
    val docs = Seq(
      // clean: 20 tokens, rich stopwords, short tokens, en-predicted
      (1L, "the cat sat on the mat and it is a fine day to be in the sun with it now", "en"),
      (2L, "short doc here", "en"),
      (3L, "cat dog fox run sun sky red hat box car pen cup map key net jar rug fan log bat bee cow elk owl pig", "en"),
      (4L, Seq.fill(25)("wonderfulness").mkString(" "), "en"),
      (5L, Seq.fill(4)("el la de que y").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = graft.operators.TextAnalysis
      .qualityReport(docs, minTokens = 20, minStopword = 0.02, maxMeanTokenLen = 6.0)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(3))).toMap
    assert(out(1L) == ("", 1), "clean doc must keep with no reasons")
    assert(out(2L) == ("too_few_tokens,low_stopword", 0))
    assert(out(3L) == ("low_stopword", 0))
    assert(out(4L) == ("low_stopword,long_tokens", 0))
    assert(out(5L) == ("low_stopword,lang_mismatch", 0))
  }

  test("normalized dedup: case/punct/whitespace variants collapse, distinct text survives") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello world"),
      (3L, "HELLO   WORLD"),
      (4L, "hello-world"),   // hyphen -> space -> same normal form
      (5L, "goodbye world"), // genuinely different
      (6L, "!!! ,,,"),       // punctuation-only -> empty normal form
      (7L, ""))              // already empty -> same group as 6
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.normalizedExact(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 3, s"expected 3 normal forms, got ${out.toSeq}")
    val byKeeper = out.map(r => r._3 -> r._2).toMap
    assert(byKeeper(1L) === 4L, "hello-world variants must collapse to doc 1")
    assert(byKeeper(5L) === 1L)
    assert(byKeeper(6L) === 2L, "punct-only and empty must share the empty form")
    // exact dedup on the same input finds NO duplicates — normalization
    // is what collapses them (the operators are distinct rungs)
    assert(graft.operators.Dedup.exact(df).collect()
      .forall(_.getLong(1) == 1L))
  }

  test("r13 operators degrade cleanly: empty/degenerate inputs") {
    import graft.operators.{Knn, Quality, Snapshots}
    // Boilerplate removal: empty and whitespace docs drop out (no
    // tokens -> no spans -> no output row), clean docs untouched.
    val bp = CorpusPipeline.boilerplateRemoval(oddDocs, spanTokens = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!bp.contains(1L) && !bp.contains(2L), "token-less docs must not emit rows")
    assert(bp(4L) == 1L && bp(5L) == 1L, "the cross-block dup span is corpus-boilerplate")
    // Bootstrap on a single-row group: every resample is that row or
    // empty; sources with any all-zero replicate drop deterministically,
    // survivors collapse to the exact mean.
    val one = Seq((1L, "solo", 100L)).toDF("doc_id", "source", "n_chars")
    Profile.bootstrapMeans(one, reps = 4).collect().foreach { r =>
      assert(r.getLong(2) == 100000000L && r.getLong(3) == 100000000L &&
        r.getLong(4) == 100000000L)
    }
    // Hard negatives when k exceeds the eligible pool: returns the
    // whole pool, never pads.
    val tiny = Seq(
      (0L, Array(1.0f, 0f), 1), (1L, Array(0.5f, 0.1f), 2)
    ).toDF("vec_id", "embedding", "label")
    assert(Knn.hardNegatives(tiny, Knn.labeledPanel(tiny, Seq(0L)), 5, 2.0).count() == 1L)
    // Reading a snapshot that never existed is a clear error, not an
    // empty frame.
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, s"${System.getProperty("java.io.tmpdir")}/graft_no_such_table", 1L)
    }
    // checkRows on an empty table: zero rows, zero violations, pass.
    val emptyDocs = oddDocs.where(lit(false))
    Quality.checkRows(emptyDocs, Seq(Quality.notNull("doc_id"))).collect().foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(3))
    }
  }

  test("r15 curation ops degrade on degenerate corpora: empty input, " +
    "whitespace docs, vocab smaller than the fit head") {
    val emptyDocs = oddDocs.where(lit(false))
    // funnel on an empty corpus: 4 rule rows, all zero
    val f = CorpusPipeline.attritionFunnel(emptyDocs, 5, 0.0, 10.0).collect()
    assert(f.length == 4 && f.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    // fertility: whitespace-only docs contribute zero words AND zero
    // subwords but still count as docs in their stratum
    val fert = graft.operators.TextAnalysis.fertility(oddDocs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(fert(("en", "web"))._1 == 4L, s"stratum doc count: $fert")
    // zipf with topN far beyond the vocabulary: fit over what exists
    val z = graft.operators.Analytics.zipfReport(oddDocs, 1000).collect()(0)
    assert(z.getLong(4) == 4L && z.getLong(1) == 4L,
      s"fit_n should clamp to the vocab: $z")
    // sample index and vocab growth on empty input: empty frames, no throw
    assert(CorpusPipeline.sampleIndex(emptyDocs, 16, 1).count() == 0)
    assert(CorpusPipeline.vocabGrowth(emptyDocs).count() == 0)
    assert(CorpusPipeline.packedTokens(emptyDocs, 16, 1, 10).count() == 0)
    // packed tokens when the corpus is smaller than one example: no rows
    val tiny = Seq((1L, "one two")).toDF("doc_id", "text")
    assert(CorpusPipeline.packedTokens(tiny, 16, 1, 10).count() == 0)
  }

  test("changepoint degrades on thin series: single-hour types drop out, " +
    "empty events give an empty report") {
    val one = Seq(("click", "2024-03-01 05:00:01"), ("click", "2024-03-01 05:00:02"))
      .toDF("event_type", "ts_s")
      .select(col("event_type"), to_timestamp(col("ts_s")).as("ts"))
    assert(Events.changepoint(one).count() == 0,
      "a one-hour series cannot have a changepoint")
    assert(Events.changepoint(one.where(lit(false))).count() == 0)
  }

  test("late-r15 operators degrade cleanly on thin/empty input") {
    val one = Seq(("click", "2024-03-01 05:00:01"), ("click", "2024-03-01 05:00:02"))
      .toDF("event_type", "ts_s")
      .select(col("event_type"), lit(7L).as("user_id"),
        lit("""{"k": 3}""").as("props"), to_timestamp(col("ts_s")).as("ts"))
    val noEvents = one.where(lit(false))
    // Holt on a single hour: level = count, zero trend, flat forecasts
    val h = Events.holtForecast(one, 2, 1, 10, 2).collect()
    assert(h.length == 1 && h.head.getLong(3) == 2000000L && h.head.getLong(4) == 0L)
    assert(Events.holtForecast(noEvents, 2, 1, 10, 2).count() == 0)
    // seasonal anomalies: one observation per slot -> num = 0, no rows
    assert(Events.seasonalAnomalies(one, 2).count() == 0)
    assert(Events.seasonalAnomalies(noEvents, 2).count() == 0)
    // covisitation: a single item has no pairs; empty stream is empty
    assert(Events.covisitation(one, 5, 5).count() == 0)
    assert(Events.covisitation(noEvents, 5, 5).count() == 0)
    // active users / audience overlap on empty: empty frames, no throw
    assert(Events.activeUsers(noEvents).count() == 0)
    assert(Events.audienceOverlap(one).count() == 0) // one type -> no pairs
    // triangles: empty and pair-free edge lists
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.triangles(noEdges).count() == 0)
    assert(graft.operators.Graph.triangles(
      Seq((1L, 1L)).toDF("src", "dst")).count() == 0) // self-loop only
    // snippets/fuzzy/more-like-this on an empty corpus
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(graft.operators.Search.snippets(emptyDocs, "hash", 2, 5).count() == 0)
    assert(graft.operators.Search.fuzzyTerms(emptyDocs, "hash", 5).count() == 0)
    assert(graft.operators.Search.moreLikeThis(emptyDocs, 1L, 5).count() == 0)
  }

  test("r16 operators degrade cleanly on empty and degenerate inputs") {
    import java.sql.Timestamp
    // skyline: empty frame → empty frontier, no carry-map crash
    val noPts = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(graft.operators.Skyline.paretoMax(noPts, "x", "y").count() == 0)
    // KM: a corpus with zero conversions → every user censored, no
    // event rows, no divide-by-zero
    val censoredOnly = Seq(
      (1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2026-01-01 10:05:00"), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.operators.Survival
      .kaplanMeier(censoredOnly, "view", "purchase").count() == 0)
    // Markov attribution without a single conversion: channels score 0
    val eff = graft.operators.Attribution
      .removalEffects(censoredOnly, "purchase").collect()
    assert(eff.forall(_.getLong(2) == 0L), s"no-conversion effects: ${eff.toSeq}")
    // core decomposition on an empty edge list
    val noEdges2 = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.coreDecomposition(noEdges2).count() == 0)
    assert(graft.operators.Graph.neighborhoodLevels(noEdges2, 2).count() == 0)
    // FD audit on an empty table: one row per pair, trivially holding
    val emptyDocs2 = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "source")
    val fd = Profile.functionalDeps(emptyDocs2, Seq(("lang", "source"))).head()
    assert(fd.getLong(2) == 0L && fd.getInt(4) == 1 && fd.getLong(5) == 0L)
    // leakage-safe split with no near-dups: every doc is its own
    // representative — the safe split IS the naive split, zero leaks
    val uniq = Seq((1L, "alpha beta gamma delta", "en", "s", 20L),
      (2L, "omega psi chi phi", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val split = CorpusPipeline.leakageSafeSplit(uniq, 3, 12, 2, 0.5, 50).collect()
    assert(split.map(_.getLong(1)).sum == 2L)
    assert(split.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L))
  }
}
