package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Search}

/** BM25 + hybrid-RRF retrieval (operators/Search.scala). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // doc 1: "cat" twice in 4 tokens; doc 2: once in 4; doc 3: no hit;
    // doc 4: once but longer (8 tokens) → length-normalized below doc 2.
    (1L, "cat cat dog bird"),
    (2L, "cat dog dog bird"),
    (3L, "dog dog bird bird"),
    (4L, "cat dog dog bird dog bird dog bird")
  ).toDF("doc_id", "text")

  test("bm25 ranks higher tf first, length-normalizes, drops non-matches") {
    val out = Search.bm25(docs, Seq("cat"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L)) // doc 3 absent
    val scores = out.map(_.getDouble(2))
    assert(scores.sorted.reverse.toSeq == scores.toSeq && scores.forall(_ > 0))
  }

  test("bm25 multi-term sums per-term contributions and counts matches") {
    val out = Search.bm25(docs, Seq("cat", "bird"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2 && out(2L) == 2 && out(3L) == 1 && out(4L) == 2)
  }

  test("bm25 respects k") {
    assert(Search.bm25(docs, Seq("dog"), k = 2).count() == 2)
  }

  test("hybridRrf fuses both legs and scores absent legs as zero") {
    val emb = Tables.embeddings(spark, sf001)
    val corpus = Tables.documents(spark, sf001)
    val q = Knn.queryVector(emb, 0L)
    val terms = SparkEntry.Params.Bm25Terms
    val out = Search.hybridRrf(corpus, emb, q, terms, k = 20, depth = 50)
    val rows = out.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Int])
      val expected = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-6)
      assert(lex.forall(x => x >= 1 && x <= 50) && sem.forall(x => x >= 1 && x <= 50))
      assert(lex.nonEmpty || sem.nonEmpty)
    }
    // both-leg docs outrank single-leg docs of comparable rank depth
    assert(rows.map(_.getDouble(3)).toSeq == rows.map(_.getDouble(3)).sorted.reverse.toSeq)
  }

  test("collocations: an always-together pair tops the lift ranking; " +
    "independent pairs score ~1; min-support prunes") {
    // "alpha beta" co-occur in every one of their 6 docs (df 6 each,
    // n_ab 6 → lift = 6·12/36 = 2.0); "x y" co-occur in 6 of 12 docs
    // where both are near-ubiquitous (df 12 → lift 0.5); rare pair
    // "p q" (n_ab 2) dies to min-support 3.
    val docs = (0 until 12).map { i =>
      val ab = if (i < 6) "alpha beta" else "gamma delta"
      val pq = if (i < 2) "p q" else ""
      (i.toLong, s"$ab x y $pq")
    }.toDF("doc_id", "text")
    val out = Search.collocations(docs, 3, 20).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    assert(out(("alpha", "beta")) == 2.0, s"always-together lift wrong: $out")
    assert(out(("x", "y")) == 1.0, "ubiquitous pair should have lift 1")
    assert(!out.contains(("p", "q")), "min-support failed to prune the rare pair")
    assert(out(("alpha", "beta")) > out(("alpha", "x")),
      "dependent pair did not outrank the mixed pair")
  }

  test("bm25 plan: no cartesian product, broadcast df join") {
    val plan = Search.bm25(docs, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("persisted text index: served BM25 == inline BM25 bit-for-bit; bucket pruning " +
    "reaches the postings scan; hash60Jvm matches the Spark hash") {
    val corpus = Tables.documents(spark, sf0001)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_index_spec"
    Search.saveTextIndex(corpus, path)
    val terms = Seq("vector", "hash", "spark")
    val served = Search.searchTextIndex(spark, path, terms, 20)
    val inline = Search.bm25(corpus, terms, 20)
    assert(served.collect().toSeq == inline.collect().toSeq,
      "index-served BM25 diverged from the inline plan")
    // The bucket predicate must prune PARTITIONS (directory-level),
    // not filter post-scan.
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning missing from the postings scan:\n$plan")
    // Driver-side bucket routing uses the same 60-bit hash as the
    // executor-side partitioner.
    val sparkSide = corpus.sparkSession.range(1)
      .select(graft.operators.Dedup.hash60(lit("vector"))).head().getLong(0)
    assert(Search.hash60Jvm("vector") == sparkSide,
      "JVM hash60 twin diverged from Spark's conv(md5) hash")
  }

  // a: phrase at 1 and 5 (overlapping-adjacent runs), b: phrase absent
  // (order broken), c: phrase at 0; d: duplicate-token phrase material
  private lazy val phraseCorpus = Seq(
    (1L, "x0 big cat sat big cat sat y0"),
    (2L, "cat big sat big sat cat"),
    (3L, "big cat sat"),
    (4L, "the the end the the")).toDF("doc_id", "text")

  test("phrase search: exact consecutive-run semantics, multi-hit counts, " +
    "first position, order-sensitivity") {
    val out = Search.phraseSearch(phraseCorpus, "big cat sat", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // n_hits desc, doc_id asc: doc 1 has 2 hits (starts 1 and 4), doc 3 one
    assert(out == Seq((1L, 2L, 1L), (3L, 1L, 0L)), s"got $out")
  }

  test("phrase search: duplicate phrase tokens need all offsets to land") {
    val out = Search.phraseSearch(phraseCorpus, "the the", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 4: "the the" at 0 and at 3 — NOT at 1 (pos 1,2 = "the end")
    assert(out == Seq((4L, 2L, 0L)), s"got $out")
    assert(Search.phraseSearch(phraseCorpus, "sat big cat", 10).count() == 1) // doc 2? no: doc 1 pos 3
  }

  test("phrase search: k bound and single-token phrase degenerate to " +
    "term lookup") {
    val one = Search.phraseSearch(phraseCorpus, "cat", 2).collect()
    assert(one.length == 2) // k caps the doc list
    val all = Search.phraseSearch(phraseCorpus, "cat", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(all == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("proximity search: window bound is inclusive and order-free, pair " +
    "counts are exact, self-term rejected") {
    // doc1: cat@2,5; dog@3 -> |2-3|=1, |5-3|=2 — both within 2
    // doc2: cat@0; dog@4 -> distance 4, outside
    val docs = Seq(
      (1L, "x0 y0 cat dog z0 cat"),
      (2L, "cat a b c dog")).toDF("doc_id", "text")
    val out = Search.proximitySearch(docs, "cat", "dog", 2, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 1L)), s"got $out")
    val incl = Search.proximitySearch(docs, "cat", "dog", 4, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(incl == Map(1L -> 2L, 2L -> 1L), s"inclusive bound: $incl")
    intercept[IllegalArgumentException] {
      Search.proximitySearch(docs, "cat", "cat", 2, 10)
    }
  }

  test("persisted positional index: served phrase == inline bit-for-bit; " +
    "bucket pruning reaches the postings scan; partition invariance") {
    val corpus = Tables.documents(spark, sf0001)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_pos_index_spec"
    Search.savePositionalIndex(corpus, path)
    // a phrase the corpus certainly contains: the first doc's opening trigram
    val phrase = corpus.orderBy("doc_id").select("text").head()
      .getString(0).trim.split("\\s+").take(3).mkString(" ")
    val served = Search.phraseSearchIndex(spark, path, phrase, 20)
    val inline = Search.phraseSearch(corpus, phrase, 20)
    val servedRows = served.collect().toSeq
    assert(servedRows.nonEmpty, "test phrase missing from the corpus")
    assert(servedRows == inline.collect().toSeq,
      "index-served phrase search diverged from the inline plan")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning missing from the postings scan:\n$plan")
    assert(Search.phraseSearch(corpus.repartition(7), phrase, 20)
      .collect().toSeq == servedRows, "phrase search is partition-sensitive")
  }

  test("fuzzy lookup: substitution/insert/delete neighbors all surface at " +
    "dist<=1, a transposition (dist 2) does not, ranking is df-first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash hash hash hase"), // hase = substitution neighbor
      (2L, "has hashe ahsh"),      // has = delete, hashe = exact-ish, ahsh = transposition
      (3L, "hash zzz")
    ).toDF("doc_id", "text")
    // query "hash": expect hash (dist 0), hase/has/hashe (dist 1); NOT ahsh (dist 2)
    val out = Search.fuzzyTerms(docs, "hash", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet === Set("hash", "hase", "has", "hashe"),
      s"candidate set wrong: ${out.toSeq}")
    assert(out.head._1 === "hash" && out.head._3 === 0L, "df-first ranking broken")
    assert(!out.exists(_._1 == "ahsh"), "transposition (dist 2) leaked through")
    // partition invariance
    val corpus = Tables.documents(spark, sf0001)
    assert(Search.fuzzyTerms(corpus, "hashe", 5).collect().toSeq ===
      Search.fuzzyTerms(corpus.repartition(7), "hashe", 5).collect().toSeq)
  }

  test("trigramLookup: pg_trgm padding + Jaccard hand-computed, graded " +
    "similarity ranking, floor applied, partition-invariant") {
    import spark.implicits._
    // trigramsOf follows pg_trgm: '  w' + word + ' ' padding, distinct
    assert(Search.trigramsOf("hash") ==
      Seq("  h", " ha", "has", "ash", "sh "))
    assert(Search.trigramsOf("Hash") == Search.trigramsOf("hash"), "case-folding")
    val docs = Seq(
      (1L, "hashing hashing hashing"), // df 1, high tf — sim must outrank df
      (2L, "hash join"), (3L, "hash scan"), (4L, "hash merge"),
      (5L, "hasher probe"), (6L, "zebra quux")
    ).toDF("doc_id", "text")
    val out = Search.trigramLookup(docs, "hashing", 0.2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // hand-computed: q = trigrams("hashing") (8 of them);
    // "hashing" sim 1.0; "hasher": p="  hasher ", tg 7, shared
    // {  h, ha,has,ash,shi? no} → {'  h',' ha','has','ash','she'?...}
    // shared = 4 ('  h',' ha','has','ash') → 4/(7+8-4)=0.363636;
    // "hash": tg 5, shared 4 → 4/(5+8-4)=0.444444
    assert(out.map(_._1).toSeq == Seq("hashing", "hash", "hasher"), s"got ${out.toSeq}")
    assert(out(0)._3 == 1.0)
    assert(out(1)._3 == 0.444444, s"got ${out(1)}")
    assert(out(2)._3 == 0.363636, s"got ${out(2)}")
    assert(!out.exists(_._1 == "zebra"), "no shared trigram must mean no row")
    // floor prunes: at 0.4 only the top two survive
    assert(Search.trigramLookup(docs, "hashing", 0.4, 10).collect()
      .map(_.getString(0)).toSeq == Seq("hashing", "hash"))
    val corpus = Tables.documents(spark, sf0001)
    assert(Search.trigramLookup(corpus, "hashing", 0.25, 5).collect().toSeq ===
      Search.trigramLookup(corpus.repartition(7), "hashing", 0.25, 5).collect().toSeq)
  }

  test("source confusion: separable vocabularies read a perfect diagonal; " +
    "an impostor doc lands on the profile it actually matches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "A"), (2L, "alpha beta delta", "A"),
      (3L, "omega psi chi", "B"), (4L, "omega psi phi", "B"),
      // labeled B but written in A's vocabulary: must predict A
      (5L, "alpha beta gamma delta", "B")
    ).toDF("doc_id", "text", "source")
    val out = Search.sourceConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("A", "A")) === 2L)
    assert(out(("B", "B")) === 2L)
    assert(out(("B", "A")) === 1L, s"impostor not detected: $out")
    assert(out.values.sum === 5L)
  }

  test("more-like-this: an exact duplicate scores cosine 1.0 on top, disjoint " +
    "vocabulary never appears, the query doc excludes itself; partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector search spark hash"),
      (2L, "vector search spark hash"),   // exact duplicate of the query
      (3L, "vector search other words"),  // partial overlap
      (4L, "completely disjoint tokens")
    ).toDF("doc_id", "text")
    val out = Search.moreLikeThis(docs, 1L, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.head._1 === 2L && out.head._3 === 1.0,
      s"duplicate must rank first at cosine 1: ${out.toSeq}")
    assert(out.map(_._1).toSet === Set(2L, 3L), s"candidate set wrong: ${out.toSeq}")
    assert(!out.exists(_._1 == 1L), "query doc leaked into its own results")
    val corpus = Tables.documents(spark, sf0001)
    val a = Search.moreLikeThis(corpus, 1L, 10).collect().toSeq
    val b = Search.moreLikeThis(corpus.repartition(7), 1L, 10).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("prefix search: served == inline, partition + pushed-prefix pruning " +
    "reach the scan, crafted dictionary exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash hash hat ham x"),
      (2L, "hash hat y"),
      (3L, "zebra hash")
    ).toDF("doc_id", "text")
    val inline = Search.prefixTerms(docs, "ha", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inline === Seq(("hash", 3L, 4L), ("hat", 2L, 2L), ("ham", 1L, 1L)))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_term_dict_spec"
    Search.saveTermDict(docs, path)
    val served = Search.prefixSearchIndex(spark, path, "ha", 10)
    assert(served.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === inline, "served autocomplete diverged from inline")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p1"),
      s"first-char partition pruning missing:\n$plan")
    assert(plan.contains("StartsWith"),
      s"prefix filter not pushed to the scan:\n$plan")
    // corpus differential at k-bound
    val corpus = Tables.documents(spark, sf0001)
    val cpath = s"${System.getProperty("java.io.tmpdir")}/graft_term_dict_spec_c"
    Search.saveTermDict(corpus, cpath)
    val a = Search.prefixTerms(corpus, "ha", 5).collect().toSeq
    val b = Search.prefixSearchIndex(spark, cpath, "ha", 5).collect()
      .map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2))).toSeq
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  test("snippets: first-occurrence window exact, edges clip, absent term drops, " +
    "plan stays exchange-free before the top-k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c hash d e f hash"),   // interior match, repeat counted
      (2L, "hash x y z"),              // window clipped at the start
      (3L, "p q r s hash"),            // window clipped at the end
      (4L, "no match here")
    ).toDF("doc_id", "text")
    val out = Search.snippets(docs, "hash", 2, 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((4L, 2L, "b c hash d e")))
    assert(out(2L) === ((1L, 1L, "hash x y")))
    assert(out(3L) === ((5L, 1L, "r s hash")))
    assert(!out.contains(4L))
    // ordering (n_matches desc, doc_id) and the k bound
    val top = Search.snippets(docs, "hash", 2, 2).collect().map(_.getLong(0)).toSeq
    assert(top === Seq(1L, 2L))
    // the snippet pass is array-expression work inside the scan stage:
    // no shuffle exchange below the TakeOrdered top-k
    val plan = Search.snippets(docs, "hash", 2, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"snippets plan shuffles:\n$plan")
  }
}
