package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, LanguageModel, Search, TextAnalysis}

/** Round-4 corpus operators: repetition signals, n-gram contamination,
  * domain mixing, bigram-LM scoring. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  /** doc_ids 0..199 partitioned by the SHARED split rule (so crafted
    * cross-split fixtures use the real assignment, not a guess). */
  private lazy val (trainIds, evalIds) = {
    val assigned = (0L until 200L).toDF("doc_id")
      .withColumn("split", CorpusPipeline.splitCol(90))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    (assigned.filter(_._2 == "train").map(_._1), assigned.filter(_._2 == "eval").map(_._1))
  }

  test("canonicalPick keeps the CLEANEST copy of a normalized-dup group, " +
    "ties fall to the lowest id, uniques keep themselves") {
    import graft.operators.Dedup
    val docs = Seq(
      // one normalized group, three copies of descending cleanliness:
      // raw stop-hits 3 ("the","in","the"), 2 ("in","the" — 'THE' is a
      // cap, 'hat!!!' breaks nothing), 1 ("the" only, the rest mangled)
      (10L, "the cat sat in the hat"),
      (11L, "THE cat sat in the hat!!!"),
      (12L, "THE cat sat IN the, hat"),
      // an exact-tie pair (identical raw text): lower id wins
      (20L, "alpha beta gamma"),
      (21L, "alpha beta gamma"),
      // a unique doc keeps itself
      (30L, "solo document"))
      .toDF("doc_id", "text")
    val out = Dedup.canonicalPick(docs).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 3L, 20L -> 2L, 30L -> 1L),
      s"keeper/count wrong: $out")
    // the quality key really drove the pick: remove doc 10 and the
    // next-cleanest (11) wins, not the lowest id (11 < 12 anyway — so
    // ALSO check the reverse-id variant where quality beats id order)
    val rev = Seq(
      (12L, "the cat sat in the hat"),      // cleanest now has the HIGHEST...
      (11L, "THE cat sat in the hat!!!"),
      (10L, "THE cat sat IN the, hat"))     // lowest id is the dirtiest
      .toDF("doc_id", "text")
    val keeper = Dedup.canonicalPick(rev).collect()(0).getLong(2)
    assert(keeper == 12L, s"quality must beat id order, kept $keeper")
  }

  test("canonicalPick: NULL-text docs share the null hash group (the exact/" +
    "normalizedExact convention) and the lowest id keeps") {
    import graft.operators.Dedup
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "real text")).toDF("doc_id", "text")
    val out = Dedup.canonicalPick(docs).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    // same contract as exact()/normalizedExact(): null content is ONE
    // group (sha2(null) = null key), keeper = lowest id
    assert(out == Map(1L -> 2L, 3L -> 1L), s"null-group convention drifted: $out")
  }

  test("repetition: degenerate, mixed and all-distinct gram streams") {
    val docs = Seq(
      (1L, "a a a a"),          // 3 grams, all "a a"
      (2L, "w x y z"),          // 3 distinct grams
      (3L, "a b a b a"),        // grams: ab ba ab ba → 2 distinct of 4
      (4L, "solo")              // <2 tokens → absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(!out.contains(4L))
    assert(out(1L) == ((3L, 1L, 1.0, 0.666667)))
    assert(out(2L) == ((3L, 3L, 0.333333, 0.0)))
    assert(out(3L) == ((4L, 2L, 0.5, 0.5)))
  }

  test("ngramContamination flags a crafted leak and clears clean docs") {
    val leaked = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (trainIds(0), leaked),
      (trainIds(1), "one two three four five six"),
      (evalIds(0), leaked),                               // verbatim leak
      (evalIds(1), "unique words never seen anywhere here")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.ngramContamination(docs, k = 3, trainPct = 90, flagFrac = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(out.keySet == Set(evalIds(0), evalIds(1)))     // eval docs only
    val (nSh, nOv, frac, flag) = out(evalIds(0))
    assert(nSh == 4 && nOv == 4 && frac == 1.0 && flag == 1)
    val (_, nOv2, frac2, flag2) = out(evalIds(1))
    assert(nOv2 == 0 && frac2 == 0.0 && flag2 == 0)
  }

  test("bloomNgramContamination is bit-identical to the plain operator (differential, real corpus)") {
    val docs = Tables.documents(spark, sf0001)
    val plain = CorpusPipeline.ngramContamination(docs, k = 3, trainPct = 90, flagFrac = 0.25)
    val bloom = CorpusPipeline.bloomNgramContamination(docs, k = 3, trainPct = 90,
      flagFrac = 0.25, mBits = 1 << 18, nProbes = 5)
    assert(plain.collect().toSeq == bloom.collect().toSeq)
  }

  test("bloomNgramContamination: the gate passes all true hits and prunes the train side") {
    val leaked = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (trainIds(0), leaked),
      (trainIds(1), "one two three four five six seven eight nine ten"),
      (evalIds(0), leaked),
      (evalIds(1), "unique words never seen anywhere here")
    ).toDF("doc_id", "text")
    // Exactness on the crafted leak (no false negatives by construction).
    val out = CorpusPipeline.bloomNgramContamination(docs, k = 3, trainPct = 90,
      flagFrac = 0.25, mBits = 1 << 12, nProbes = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(out(evalIds(0)) == ((4L, 4L, 1.0, 1)))
    assert(out(evalIds(1))._2 == 0L)
    // Pruning: on the real corpus the gated train-side candidate set
    // must be a superset of the true hits (no false negatives) and a
    // strict subset of the full distinct train set — the 100 TB claim
    // is exactly "candidate << corpus, ⊇ truth".
    val real = Tables.documents(spark, sf0001)
    val k = 3
    val tagged = real.withColumn("split", CorpusPipeline.splitCol(90))
    import graft.operators.Dedup
    val trainAll = Dedup.shingleRows(tagged.where(col("split") === "train"), k)
      .select(Dedup.hash60(col("s")).as("h")).distinct()
    val evalH = Dedup.shingleRows(tagged.where(col("split") === "eval"), k)
      .select(Dedup.hash60(col("s")).as("h")).distinct()
    val gate = CorpusPipeline.bloomGate(evalH, mBits = 1 << 18, nProbes = 5)
    val nAll = trainAll.count()
    val nCandidate = trainAll.where(gate).count()
    val trueHits = trainAll.join(evalH, Seq("h"), "left_semi").count()
    val hitsSurviving = trainAll.join(evalH, Seq("h"), "left_semi").where(gate).count()
    assert(hitsSurviving == trueHits, "Bloom gate dropped a true hit (false negative)")
    assert(nCandidate >= trueHits && nCandidate < nAll,
      s"gate should prune: candidate=$nCandidate, all=$nAll, hits=$trueHits")
  }

  test("boilerplateRemoval drops EVERY copy of a cross-doc span, keeps in-doc repeats, " +
    "and differs from spanDedup exactly on the first occurrence") {
    import graft.operators.CorpusPipeline
    val boiler = "cookie notice accept all"                // 4-token span, planted in 3 docs
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, s"$boiler iota kappa lambda mu"),
      (4L, "solo solo solo solo solo solo solo solo"),     // in-DOC repeat: two identical
                                                           // spans, ONE document — not boilerplate
      (5L, "unique words appearing nowhere else")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.boilerplateRemoval(docs, spanTokens = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      val (nSpans, nRemoved, clean) = out(id)
      assert(nSpans == 2 && nRemoved == 1, s"doc $id: expected the planted span removed")
      assert(!clean.contains("cookie"), s"doc $id kept a boilerplate copy: $clean")
    }
    assert(out(4L) == ((2L, 0L, "solo solo solo solo solo solo solo solo")),
      "in-document repetition must not trip the cross-document gate")
    assert(out(5L)._2 == 0L)
    // spanDedup on the same corpus KEEPS the first copy (doc 1) — the
    // two operators must disagree exactly there.
    val dedup = CorpusPipeline.spanDedup(docs, spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(dedup(1L).contains("cookie") && !dedup(2L).contains("cookie"),
      "spanDedup first-occurrence baseline changed — differential premise broken")
    // In-doc repeat IS dedup'd by spanDedup (second span dropped) but
    // untouched here: the operators' scopes are genuinely different.
    assert(dedup(4L) == "solo solo solo solo")
  }

  test("domainMix water-fills to the binding source and keeps rates integral") {
    // A: 100 docs at 50% target, B: 10 docs at 50% → B binds:
    // budget = 20, target 10 each, keep_ppm A=100000 B=1000000.
    val docs = ((0L until 100L).map(i => (i, "A")) ++ (100L until 110L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val out = CorpusPipeline.domainMix(docs, lit(500000L)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (na, _, keepA, keptA, _) = out("A")
    val (nb, _, keepB, keptB, _) = out("B")
    assert(na == 100 && nb == 10)
    assert(keepA == 100000L && keepB == 1000000L)
    assert(keptB == 10)                    // binding source keeps everything
    assert(keptA <= 100 && keptA >= 0)     // hash-sampled ≈ 10
    // achieved ppm sums to ≤ 1e6 and each is n_kept*1e6/total
    val total = keptA + keptB
    assert(out("A")._5 == keptA * 1000000L / total)
  }

  test("domainMix on testdata: every source rate bounded, audit consistent") {
    val out = CorpusPipeline.domainMix(
      Tables.documents(spark, sf001), CorpusPipeline.srcTargetPpm).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (nDocs, keepPpm, nKept) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(keepPpm >= 0 && keepPpm <= 1000000L)
      assert(nKept <= nDocs)
    }
  }

  test("lmScore: in-distribution text outscores unseen-alphabet text") {
    val docs = Seq(
      (trainIds(0), "abababababababab"),
      (trainIds(1), "abababbabababab"),
      (evalIds(0), "abababababab"),   // pure in-distribution bigrams
      (evalIds(1), "qzqzqzqzqzqz")    // alphabet never seen in train
    ).toDF("doc_id", "text")
    val out = LanguageModel.lmScore(docs, 90).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 4)
    val (nBg, _, good) = out(evalIds(0))
    assert(nBg == 11)                            // len-1 bigrams
    val bad = out(evalIds(1))._3
    assert(good > bad && good <= 0.0 && bad < 0.0)
  }

  test("sourceInfluence: count-subtraction LOO matches a literal retrain " +
    "(including the lost-vocabulary term), and sign tracks source value") {
    import graft.operators.LanguageModel
    // A dominates the eval distribution; B is alphabet-disjoint junk;
    // C appears ONLY in eval (no train contribution → delta must be 0).
    val docs = Seq(
      (trainIds(0), "srcA", "abababababab"),
      (trainIds(1), "srcA", "babababa"),
      (trainIds(2), "srcB", "qzqzqzqz"),
      (evalIds(0), "srcA", "ababab"),
      (evalIds(1), "srcC", "abba")
    ).toDF("doc_id", "source", "text")
    val out = LanguageModel.sourceInfluence(docs, 90).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set("srcA", "srcB", "srcC"))

    // independent reference: literally retrain without the source
    val trainSet = trainIds.take(3).toSet
    val fixture = Seq(
      (trainIds(0), "srcA", "abababababab"), (trainIds(1), "srcA", "babababa"),
      (trainIds(2), "srcB", "qzqzqzqz"),
      (evalIds(0), "srcA", "ababab"), (evalIds(1), "srcC", "abba"))
    def bgs(t: String) = t.sliding(2).toSeq
    val evalBgs = fixture.filter(f => !trainSet.contains(f._1)).flatMap(f => bgs(f._3))
    def ref(excl: Option[String]): (Long, Long) = {
      val cnt = fixture.filter(f => trainSet.contains(f._1) && !excl.contains(f._2))
        .flatMap(f => bgs(f._3)).groupBy(identity).map { case (b, g) => b -> g.size.toLong }
      val ctx = cnt.groupBy(_._1.take(1)).map { case (c, g) => c -> g.values.sum }
      val v = cnt.keys.map(_.substring(1)).toSet.size.toLong
      val s = evalBgs.map { b =>
        math.floor(math.log((cnt.getOrElse(b, 0L) + 1).toDouble /
          (ctx.getOrElse(b.take(1), 0L) + v)) * 1e6).toLong
      }.sum
      (s, v)
    }
    val (fullSum, _) = ref(None)
    for (src <- Seq("srcA", "srcB", "srcC")) {
      val (refSum, refV) = ref(Some(src))
      val (_, vLoo, fullOut, looOut, delta) = out(src)
      assert(fullOut == fullSum, s"$src full: $fullOut vs $fullSum")
      assert(looOut == refSum, s"$src loo: $looOut vs $refSum")
      assert(vLoo == refV, s"$src v_loo: $vLoo vs $refV")
      assert(delta == refSum - fullSum)
    }
    // removing the in-distribution source hurts; removing disjoint junk
    // helps (its mass only dilutes); an eval-only source changes nothing
    assert(out("srcA")._5 < 0, s"srcA delta: ${out("srcA")}")
    assert(out("srcB")._5 > 0, s"srcB delta: ${out("srcB")}")
    assert(out("srcC")._5 == 0 && out("srcC")._1 == 0L,
      s"srcC must be a no-op: ${out("srcC")}")
  }

  test("backoffScore: seen bigrams score cnt/ctx; unseen pairs back off " +
    "through the Laplace unigram leg; sub-2-token docs contribute nothing") {
    val docs = Seq(
      (trainIds(0), "the cat sat"),
      (trainIds(1), "the cat ran"),
      (evalIds(0), "the cat"),   // seen bigram: cnt=2, ctx(the)=2 → ln 1 = 0
      (evalIds(1), "cat the"),   // unseen; w2 "the" never a train w2 → floor leg
      (evalIds(2), "solo"),      // 1 token → no rows
      (evalIds(3), "")           // empty → no rows
    ).toDF("doc_id", "text")
    val out = LanguageModel.backoffScore(docs, 90).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(trainIds(0), trainIds(1), evalIds(0), evalIds(1)))
    assert(out(evalIds(0)) == ((1L, 0L, 0.0)), s"seen bigram: ${out(evalIds(0))}")
    // train pairs: (the,cat)x2 (cat,sat) (cat,ran) → N=4, V=|{cat,sat,ran}|=3
    val floorLp = math.floor(math.log(0.4 * 1.0 / (4 + 3)) * 1e6).toLong
    val (n1, s1, a1) = out(evalIds(1))
    assert(n1 == 1L && s1 == floorLp && math.abs(a1 - floorLp / 1e6) < 1e-9,
      s"backoff leg: ${out(evalIds(1))} vs $floorLp")
  }

  test("embeddingContamination: only eval ids, every match above threshold") {
    import SparkEntry.Params._
    val out = CorpusPipeline.embeddingContamination(
      Tables.embeddings(spark, sf001), NPlanes, NTables, CosineThreshold, TrainPct).collect()
    assert(out.nonEmpty)
    val splitOf = (id: Long) => (0L until 1L).map(_ => id).toDF("doc_id")
      .withColumn("s", CorpusPipeline.splitCol(TrainPct)).collect().head.getString(1)
    out.take(5).foreach(r => assert(splitOf(r.getLong(0)) == "eval"))
    out.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(2) >= CosineThreshold)
    }
  }

  test("tfidfTopTerms matches the window formulation and bounds k") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf0001)
    val k = 3
    val fast = Search.tfidfTopTerms(docs, k)
    assert(fast.groupBy("doc_id").count().agg(max("count")).collect().head.getLong(0) <= k)
    // differential vs the pure-window reference plan
    val tf = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.count().toDouble
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val slow = tf.join(dfreq, "term")
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * log(lit(n) / col("df")), 6).as("tfidf"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))))
      .where(col("rn") <= k).drop("rn")
    assert(fast.select("doc_id", "term", "tf", "tfidf").collect().toSet ==
      slow.collect().toSet)
  }

  test("vocabStats: approx twin lands within its rsd bound of exact") {
    import graft.operators.Analytics
    val docs = Tables.documents(spark, sf001)
    val exact = Analytics.vocabStats(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Analytics.vocabStatsApprox(docs, rsd = 0.05).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (src, n) =>
      assert(math.abs(approx(src) - n).toDouble / n <= 0.15, // 3× rsd
        s"$src: approx ${approx(src)} vs exact $n")
    }
    // type-token ratio bounded (0, 1]
    Analytics.vocabStats(docs).collect()
      .foreach(r => assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
  }

  test("centroidStats: known vectors produce exact mean/variance") {
    import graft.operators.Analytics
    val vecs = Seq(
      (1L, Seq(0.0f, 2.0f), 7),
      (2L, Seq(2.0f, 2.0f), 7),
      (3L, Seq(4.0f, 2.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val out = Analytics.centroidStats(vecs).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0) == ((3L, 2.0, 2.666667)))  // mean 2, var (4+0+4)/3, 6 dp
    assert(out(1) == ((3L, 2.0, 0.0)))
  }

  test("CharNgrams matches the HOF twin and is UTF-8-char-correct") {
    import org.apache.spark.sql.graftbridge.SqlBridge
    import graft.functions.CharNgrams
    val docs = Seq("hello", "héllo wörld", "日本語テキスト", "ab", "a", "")
      .toDF("text")
    // differential vs the HOF twin on texts where the twin is well-defined
    val both = docs.where(length(col("text")) >= 2).select(
      SqlBridge.column(CharNgrams(SqlBridge.expression(col("text")), 2)).as("fast"),
      expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        .as("slow"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
    // degenerate lengths → empty array
    val short = docs.where(length(col("text")) < 2).select(
      SqlBridge.column(CharNgrams(SqlBridge.expression(col("text")), 2)).as("g"))
      .collect()
    assert(short.length == 2 && short.forall(_.getSeq[String](0).isEmpty))
    // trigram sanity on multibyte text
    val tri = docs.where(length(col("text")) === 7).select(
      SqlBridge.column(CharNgrams(SqlBridge.expression(col("text")), 3)).as("g"))
      .collect().head.getSeq[String](0)
    assert(tri == Seq("日本語", "本語テ", "語テキ", "テキス", "キスト"))
  }

  test("char_ngrams is SQL-registered via GraftExtensions") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT char_ngrams('abcd', 2) AS g")
      .collect().head.getSeq[String](0)
    assert(out == Seq("ab", "bc", "cd"))
  }

  test("lmScore excludes sub-2-char docs and handles empty text") {
    val docs = Seq((trainIds(0), "abcd"), (trainIds(1), "x"), (evalIds(0), ""))
      .toDF("doc_id", "text")
    val ids = LanguageModel.lmScore(docs, 90).collect().map(_.getLong(0)).toSet
    assert(ids == Set(trainIds(0)))
  }

  test("corpusShuffle is a total, dense, seed-reproducible assignment") {
    val docs = (0L until 200L).toDF("doc_id")
    val a = CorpusPipeline.corpusShuffle(docs, epoch = 1, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // total: every doc exactly once; shards in range
    assert(a.map(_._1).sorted.toSeq == (0L until 200L))
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // dense: each shard's positions are exactly 0..n-1
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == rows.indices.map(_.toLong))
    }
    // reproducible: a second run is bit-identical
    val b = CorpusPipeline.corpusShuffle(docs, epoch = 1, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("corpusShuffle reshuffles across epochs and actually permutes") {
    val docs = (0L until 200L).toDF("doc_id")
    def order(epoch: Int): Seq[Long] =
      CorpusPipeline.corpusShuffle(docs, epoch, nShards = 4)
        .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    val e1 = order(1)
    val e2 = order(2)
    assert(e1 != e2)               // epoch seed changes the order
    assert(e1 != (0L until 200L))  // and it is not the identity order
    assert(e1.sorted == (0L until 200L)) // but still a permutation
  }

  test("repeatedSubstrings: UNALIGNED cross-doc repeat caught (the case " +
    "aligned spans miss), self-repeat counted, islands merge, zeros for clean docs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),                 // shares c..g with doc 2
      (2L, "z1 z2 z3 c d e f g z4 z5"),            // at a DIFFERENT offset
      (3L, "p q r s t u v w"),                     // clean
      (4L, "m n o p XX m n o p")                   // self-repeat, 2 islands
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.repeatedSubstrings(docs, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // doc 1: dup windows "c d e f"@2, "d e f g"@3 → one island [2,6],
    // 5 covered of 10 tokens
    assert(out(1L) == ((10L, 2L, 5L, 1L, 0.5)), s"doc1: ${out(1L)}")
    // doc 2: same two windows at pos 3,4 → island [3,7]
    assert(out(2L) == ((10L, 2L, 5L, 1L, 0.5)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((8L, 0L, 0L, 0L, 0.0)), s"doc3: ${out(3L)}")
    // doc 4: "m n o p" at pos 0 AND 5 (two sites in ONE doc) →
    // islands [0,3] and [5,8], 8 of 9 tokens covered
    assert(out(4L) == ((9L, 2L, 8L, 2L,
      BigDecimal(8.0 / 9.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      s"doc4: ${out(4L)}")
    // the aligned-span operator misses the doc1/doc2 repeat entirely at
    // the same window size (offsets 2 and 3 straddle span boundaries) —
    // the reason this operator exists
    val spans = CorpusPipeline.spanDedup(docs.select(col("doc_id"), col("text")), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(spans(2L) == 0L,
      "aligned spans should NOT see the unaligned repeat (else this test is stale)")
  }

  test("repeatedSubstrings: docs shorter than the window report zero windows, " +
    "adjacent-touching hit runs merge into one island") {
    val docs = Seq(
      (1L, "only three tokens"),
      // "w1..w12 w1..w12": every window duplicated, hits 0..8 and 13..21
      // → but pos 9..12 windows (straddling the seam) are unique →
      // islands [0,11] and [13,24]... compute below
      (2L, ((1 to 12).map(i => s"w$i") ++ (1 to 12).map(i => s"w$i")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.repeatedSubstrings(docs, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((3L, 0L, 0L, 0L, 0.0)), s"short doc: ${out(1L)}")
    // doc 2 (24 tokens, L=4): window at pos p covers w_{p+1..p+4} of the
    // doubled sequence; pos 0..8 ≡ pos 12..20 pairwise (offset 12), so
    // hits = {0..8, 12..20}; seam windows 9,10,11 are unique; island 1 =
    // [0, 11], island 2 = [12, 23] — they TOUCH (12 = 11+1) and merge →
    // one island [0,23], 24 covered, frac 1.0
    assert(out(2L) == ((24L, 18L, 24L, 1L, 1.0)), s"doubled doc: ${out(2L)}")
  }

  test("attrition funnel: additive (Σ removed + survivors = corpus), " +
    "sequential charging, and n_out agrees with qualityReport's keep count") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val funnel = CorpusPipeline.attritionFunnel(docs, 20, 0.02, 6.0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val total = docs.count()
    assert(funnel.map(_._2).toSeq ==
      Seq("too_few_tokens", "low_stopword", "long_tokens", "lang_mismatch"))
    // funnel chaining: each stage's n_in is the previous stage's n_out,
    // stage 1 sees the whole corpus
    assert(funnel.head._3 == total, "stage 1 must see the whole corpus")
    funnel.sliding(2).foreach { case Array(prev, next) =>
      assert(next._3 == prev._5, s"n_in(${next._1}) != n_out(${prev._1})")
    }
    // additivity: total removals + final survivors = corpus size
    assert(funnel.map(_._4).sum + funnel.last._5 == total)
    // survivors equal the monolithic gate's keep count (q59 is the same
    // four rules applied at once; first-fail decomposition must agree)
    val kept = TextAnalysis.qualityReport(docs, 20, 0.02, 6.0)
      .where(col("keep") === 1).count()
    assert(funnel.last._5 == kept, s"funnel ${funnel.last._5} vs gate $kept")
  }

  test("attrition funnel: a doc failing several rules is charged only to " +
    "the FIRST, and a rule nothing fails passes its input through") {
    // 3 docs: d0 fails rule1 (too few tokens) AND would fail rule4
    // (lang_mismatch: English text labeled fr); d1 is a clean long
    // English doc labeled en; d2 fails only rule4. Rules 2 and 3 are
    // disabled by thresholds (0.0 / huge).
    val en = "the cat and the dog walk to the park and the store is open " +
      "to all of the people in town every day of the week and more"
    val docs = Seq(
      (0L, "tiny text", "fr", "s", 9L),
      (1L, en, "en", "s", en.length.toLong),
      (2L, en, "fr", "s", en.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = CorpusPipeline.attritionFunnel(docs, 5, 0.0, 1e9)
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(f(1) == ((3L, 1L, 2L)), s"rule1: ${f(1)}")  // d0 charged here only
    assert(f(2) == ((2L, 0L, 2L)), s"rule2 passthrough: ${f(2)}")
    assert(f(3) == ((2L, 0L, 2L)), s"rule3 passthrough: ${f(3)}")
    assert(f(4) == ((2L, 1L, 1L)), s"rule4: ${f(4)}")  // d2 only — d0 already gone
  }

  test("sample index: token-conserving, contiguous fixed-length examples, " +
    "bucket-count and partition invariant") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val L = 128
    val idx = CorpusPipeline.sampleIndex(docs, L, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // contiguous example ids from 0
    assert(idx.map(_._1).toSeq == (0L until idx.length.toLong))
    // conservation: the virtual stream is Σ (n_tokens(doc) + 1 EOS)
    val streamLen = docs.select(sum(size(graft.operators.TextAnalysis.tokens(col("text"))) + 1))
      .collect()(0).getLong(0)
    assert(idx.map(_._3).sum == streamLen)
    // every example except possibly the last is exactly L tokens; the
    // last carries the remainder
    assert(idx.dropRight(1).forall(_._3 == L))
    assert(idx.last._3 == (if (streamLen % L == 0) L else streamLen % L))
    // n_docs ≥ 1 and start_offset always inside the starting doc's span
    assert(idx.forall(_._2 >= 1))
    val lens = docs.select(col("doc_id"),
      (size(graft.operators.TextAnalysis.tokens(col("text"))) + 1).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx.forall { case (_, _, _, sd, so) => so >= 0 && so < lens(sd) })
    // placement must not depend on HOW the stream was bucketed or the
    // input partitioned — the index is a pure function of (data, epoch)
    val idx8 = CorpusPipeline.sampleIndex(docs.repartition(7), L, 1, numBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(idx8.toSeq == idx.toSeq, "bucket/partition count changed the index")
    // a different epoch reshuffles: some example must start elsewhere
    val idxE2 = CorpusPipeline.sampleIndex(docs, L, 2).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(idxE2.map(t => (t._2, t._3)).toSeq !=
      idx.map(t => (t._4, t._5)).toSeq, "epoch 2 must reorder the stream")
  }

  test("vocab growth: single-doc corpus gives the exact hand-computed curve; " +
    "real corpus curve is monotone and ends at the full vocabulary") {
    // one doc -> stream order is irrelevant: "a b a b c", cuts=5:
    // first occurrences a@0 b@1 c@4 -> deciles 0,1,4; curve 1,2,2,2,3
    val solo = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val curve = CorpusPipeline.vocabGrowth(solo, cuts = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(curve.toSeq == Seq((1, 1L, 1L), (2, 2L, 2L), (3, 3L, 2L),
      (4, 4L, 2L), (5, 5L, 3L)), s"curve: ${curve.toSeq}")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val real = CorpusPipeline.vocabGrowth(docs, 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(real.map(_._3).sliding(2).forall(p => p.head <= p.last), "curve not monotone")
    val vocab = docs.select(explode(graft.operators.TextAnalysis.tokens(col("text"))))
      .distinct().count()
    assert(real.last._3 == vocab, s"curve end ${real.last._3} != vocab $vocab")
    val total = docs.select(sum(size(graft.operators.TextAnalysis.tokens(col("text")))))
      .collect()(0).getLong(0)
    assert(real.last._2 == total)
  }

  test("fertility: zh-style unsegmented text shows high subwords-per-word; " +
    "clean English ~1 per word; totals are exact") {
    val docs = Seq(
      // 4 words, 4 letter-runs → fertility 1.0; 16 chars
      (0L, "the cat sat down", "en", "a", 16L),
      // 1 whitespace word, 12 one-char symbol tokens (CJK chars are
      // non-[A-Za-z0-9] symbols to the proxy) → fertility 12.0
      (1L, "欢迎来到火车站大楼前面好", "zh", "a", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.fertility(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(out("en") == ((1L, 16L, 4L, 4L, 1.0, 4.0)), s"en: ${out("en")}")
    assert(out("zh") == ((1L, 12L, 1L, 12L, 12.0, 1.0)), s"zh: ${out("zh")}")
  }

  test("corpusCard: every dial exact on a crafted corpus") {
    import spark.implicits._
    // 4 docs: one exact dup pair; 3 en 1 fr; tokens: a appears 5 times
    // of 8 total; vocab {a,b,c}, hapax {c}
    val docs = Seq(
      (1L, "a a b", "en"), (2L, "a a b", "en"),
      (3L, "a c", "fr"), (4L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val card = CorpusPipeline.corpusCard(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card == Map(
      "n_docs" -> 4.0, "total_tokens" -> 8.0, "mean_doc_tokens" -> 2.0,
      "exact_dup_frac" -> 0.25, "top_lang_share" -> 0.75,
      "vocab" -> 3.0, "hapax_frac" -> 0.333333, "top_token_share" -> 0.625),
      s"card: $card")
    // empty corpus degrades to zeros, not nulls or division errors
    val zero = CorpusPipeline.corpusCard(docs.where(lit(false))).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(zero.values.forall(_ == 0.0) && zero.size == 8, s"empty card: $zero")
  }

  test("tokenEntropy (q222): hand-computed micro-nats — uniform text " +
    "maxes out, repetition collapses to zero, rollup is exact") {
    val docs = Seq(
      // 4 distinct tokens, uniform → H = ln 4; per-term micro floor:
      // floor(0.25·ln4·1e6) = floor(346573.59) = 346573, ×4
      (1L, "a b c d", "uni"),
      // one token repeated → p = 1 → H = 0
      (2L, "x x x x x", "rep"),
      // {a:2, b:2}: two TERMS, each floor(0.5·ln2·1e6) = 346573
      (3L, "a a b b", "half"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("uni") == ((1L, 4 * 346573L, 4 * 346573L, 4 * 346573L)),
      s"got $out")
    assert(out("rep") == ((1L, 0L, 0L, 0L)))
    assert(out("half") == ((1L, 2 * 346573L, 2 * 346573L, 2 * 346573L)))
    // diverse prose must outscore keyword stuffing of the same length
    val pair = Seq(
      (10L, (1 to 40).map(i => s"w$i").mkString(" "), "prose"),
      (11L, Seq.fill(40)("buy").mkString(" "), "stuffed"))
      .toDF("doc_id", "text", "source")
    val p = graft.operators.TextAnalysis.tokenEntropy(pair).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p("prose") > p("stuffed") && p("stuffed") == 0L, s"$p")
  }

  test("tokenEntropy: partition-invariant on the gate corpus, " +
    "tokenless docs excluded") {
    val docs = Tables.documents(spark, sf001)
    val a = graft.operators.TextAnalysis.tokenEntropy(docs).collect().toSeq
    val b = graft.operators.TextAnalysis.tokenEntropy(docs.repartition(7))
      .collect().toSeq
    assert(a == b)
    val empty = Seq((1L, "   ", "blank")).toDF("doc_id", "text", "source")
    assert(graft.operators.TextAnalysis.tokenEntropy(empty).collect().isEmpty,
      "a doc with no tokens has no distribution to score")
  }

  test("goodTuringReport (q223): hand freq-of-freqs — p0 = N1/N, " +
    "c1* = 2 N2/N1; hapax-free source reads zero unseen mass") {
    import spark.implicits._
    // src A: tokens a a b c  -> N=4 V=3 N1=2(b,c) N2=1(a)
    // src B: tokens x x y y  -> N=4 V=2 N1=0 N2=2 -> p0=0, c1*=0
    val docs = Seq((1L, "A", "a a b c"), (2L, "B", "x x y y"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.LanguageModel.goodTuringReport(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getDouble(5), r.getDouble(6))).toMap
    assert(out("A") == ((4L, 3L, 2L, 1L, 0.5, 1.0)), s"got ${out("A")}")
    assert(out("B") == ((4L, 2L, 0L, 2L, 0.0, 0.0)), s"got ${out("B")}")
  }

  test("ngramDiversity (q224): hand distinct-n ratios; template " +
    "repetition collapses trigram diversity while unigrams stay high") {
    import spark.implicits._
    val docs = Seq((1L, "A", "a a b")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.ngramDiversity(docs)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // unigrams a,a,b -> 3 total 2 distinct; bigrams "a a","a b" -> 2/2;
    // trigram "a a b" -> 1/1
    assert(out(1) == ((3L, 2L, 0.666667)), s"got ${out(1)}")
    assert(out(2) == ((2L, 2L, 1.0)), s"got ${out(2)}")
    assert(out(3) == ((1L, 1L, 1.0)), s"got ${out(3)}")
    // a boilerplate source: same sentence repeated across docs — its
    // trigram diversity must land far below a varied source's
    val rep = (1 to 20).map(i => (i.toLong, "T", "the quick brown fox jumps"))
    val varied = (1 to 20).map(i =>
      (100L + i, "V", s"doc $i body token${i * 7 % 13} tail${i * 11 % 17}"))
    val d2 = (rep ++ varied).toDF("doc_id", "source", "text")
    val div = graft.operators.TextAnalysis.ngramDiversity(d2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(div(("T", 3)) <= 0.05 && div(("V", 3)) > 0.5,
      s"template source must collapse trigram diversity: $div")
    // sub-n docs yield no n-gram rows (no phantom groups)
    val short = Seq((1L, "S", "one two")).toDF("doc_id", "source", "text")
    val sd = graft.operators.TextAnalysis.ngramDiversity(short).collect()
    assert(sd.map(_.getInt(1)).toSet == Set(1, 2), s"got ${sd.mkString(";")}")
    // the HLL twin tracks the exact dial within its rsd on a real corpus
    val corpus = Tables.documents(spark, sf001)
    val ex = graft.operators.TextAnalysis.ngramDiversity(corpus).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    val ap = graft.operators.TextAnalysis.ngramDiversityApprox(corpus).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(ex.keySet == ap.keySet)
    ex.foreach { case (k, v) =>
      assert(math.abs(ap(k) - v) <= 0.15 * math.max(v, 0.01),
        s"approx diversity drifted past 3x rsd at $k: exact $v approx ${ap(k)}")
    }
  }
}
