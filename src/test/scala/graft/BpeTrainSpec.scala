package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.BpeTrain

/** Distributed BPE trainer (q121): the distributed merge loop must be
  * BIT-IDENTICAL to the driver-side [[Bpe.learn]] run over the same
  * texts — same pre-tokenizer, same weighted pair counts, same
  * (max-count, lexicographically-smallest) tie-break, same
  * left-to-right merge application. Any divergence is train/encode skew.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is left-to-right non-overlapping (the learn/tiktoken rule)") {
    // aaa + merge (a,a): leftmost pair wins, no overlap → [aa, a]
    assert(BpeTrain.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(BpeTrain.applyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
  }

  test("distributed train == driver learn, bit for bit (crafted corpus)") {
    // Repetition-heavy texts so merges chain into composite tokens, plus
    // a tie at round 1 ("ab" vs "ba" shapes) to exercise the tie-break.
    val texts = Seq(
      "banana banana bandana",
      "an analyst ban bananas",
      "a banana and an anaconda",
      "nab nab nab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val n = 16
    val got = BpeTrain.train(docs, n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val want = Bpe.learn(texts, n)
    // learn returns Ranks((l, r) -> rank); compare as rank-ordered pairs.
    val wantPairs = want.ranks.toSeq.sortBy(_._2).map { case ((a, b), r) => (r, a, b) }
    assert(got == wantPairs)
    // Sanity: merges happened and chained into composite tokens.
    assert(got.nonEmpty)
    assert(got.exists { case (_, a, b) => a.length > 1 || b.length > 1 })
  }

  test("distributed train == driver learn on a real corpus slice") {
    val docs = Tables.documents(spark, sf0001)
      .where(col("doc_id") < 40).select("doc_id", "text")
    val texts = docs.orderBy("doc_id").select("text").as[String].collect().toSeq
    val n = 12
    val got = BpeTrain.train(docs, n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val wantPairs = Bpe.learn(texts, n).ranks.toSeq.sortBy(_._2)
      .map { case ((a, b), r) => (r, a, b) }
    assert(got == wantPairs)
  }

  test("batched rounds == driver learn at exhaustion depth (the deep-tail regime " +
    "where selectBatch takes multiple merges per recount)") {
    val docs = Tables.documents(spark, sf0001)
      .where(col("doc_id") < 40).select("doc_id", "text")
    val texts = docs.orderBy("doc_id").select("text").as[String].collect().toSeq
    val n = 400 // beyond this slice's vocabulary: trains to exhaustion
    val got = BpeTrain.train(docs, n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val wantPairs = Bpe.learn(texts, n).ranks.toSeq.sortBy(_._2)
      .map { case ((a, b), r) => (r, a, b) }
    assert(got.length > 50, s"exhaustion depth too shallow to exercise batching: ${got.length}")
    assert(got == wantPairs,
      "batched merge selection diverged from the sequential driver learner")
  }

  test("1024-merge budget: bit-identical to the driver learner, rounds ≪ merges " +
    "(the batching claim at real-tokenizer scale, r15 verdict #6)") {
    // The driver's synthetic corpus has a ~30-word dictionary and
    // EXHAUSTS at 127 merges at every SF (vocabulary is structural, not
    // size-driven — measured and recorded in BASELINE.md), so real
    // tokenizer depth needs a corpus with real lexical diversity:
    // 4,000 deterministic pseudo-words (base-26 spellings, 1–6 chars,
    // Zipf-ish reuse via the i % (j+1) inner loop) — enough pair
    // vocabulary for 1024+ merges, fully reproducible.
    def word(i: Int): String = {
      var n = i; val sb = new StringBuilder
      while (sb.isEmpty || n > 0) { sb.append(('a' + n % 26).toChar); n /= 26 }
      sb.toString
    }
    val texts = (0 until 400).map { d =>
      (0 until 60).map(j => word((d * 60 + j) % 4000 / (j % 7 + 1))).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val n = 1024
    val t0 = System.nanoTime()
    val got = BpeTrain.train(docs, n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val wall = (System.nanoTime() - t0) / 1e9
    val rounds = BpeTrain.lastTrainRounds
    info(f"1024 merges in $rounds rounds, $wall%.1f s wall")
    assert(got.length == n,
      s"corpus vocabulary must support the full budget, exhausted at ${got.length}")
    val wantPairs = Bpe.learn(texts, n).ranks.toSeq.sortBy(_._2)
      .map { case ((a, b), r) => (r, a, b) }
    assert(got == wantPairs,
      "batched selection diverged from the sequential learner at depth 1024")
    // Batching depth is corpus-dependent: top pairs INTERACT early
    // (shared symbols force one-merge batches) and spread out in the
    // tail. Measured here: ~1.3× fewer rounds than merges at depth
    // 1024 (vs ~2× at exhaustion depth on the gate slice — the regime
    // a 32k-merge run lives in). Pin a 10% floor so a regression to
    // strict one-merge-per-round fails loudly, and record the real
    // numbers in BASELINE.md rather than inflating the floor.
    assert(rounds * 10 <= n * 9, s"batching degraded: $rounds rounds for $n merges")
  }

  test("train exhausts gracefully when the corpus runs out of pairs") {
    // Tiny corpus; a large budget must stop at exhaustion, not loop.
    // Pre-tokens: "ab" ×2 and " ab" ×1 (the cl100k pattern keeps the
    // leading space) → merge (a,b), then (" ", "ab"), then nothing.
    val docs = Seq((0L, "ab ab"), (1L, "ab")).toDF("doc_id", "text")
    val out = BpeTrain.train(docs, 100).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq((0, "a", "b"), (1, " ", "ab")))
  }

  test("toRanks plugs the trained table into the shared encode loop") {
    val texts = Seq("banana banana", "bandana")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ranks = BpeTrain.toRanks(BpeTrain.train(docs, 8))
    // Trained merges must COMPRESS the training text vs raw bytes, and
    // the count must equal the driver learner's own encode.
    val wantRanks = Bpe.learn(texts, 8)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8").length
      val enc = Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(t), ranks)
      val ref = Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(t), wantRanks)
      assert(enc == ref)
      assert(enc < bytes)
    }
  }

  test("saveTiktoken → loadTiktoken → encode matches the pair-keyed table") {
    // The full lifecycle: distributed train → vocab file on disk →
    // reload → encode. Counts must match encoding with the original
    // pair-keyed ranks on training AND unseen text.
    val docs = Tables.documents(spark, sf0001)
      .where(col("doc_id") < 60).select("doc_id", "text")
    val trained = BpeTrain.toRanks(BpeTrain.train(docs, 16))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_trained.tiktoken"
    Bpe.saveTiktoken(trained, path)
    val loaded = Bpe.loadTiktoken(path)
    assert(loaded.concat.size == trained.ranks.size)
    val texts = docs.orderBy("doc_id").select("text").as[String].collect().toSeq :+
      "wholly unseen zebra-text 12345 !!"
    texts.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      assert(Bpe.countTokens(u, loaded) == Bpe.countTokens(u, trained),
        s"roundtrip count drift on: ${t.take(40)}")
    }
  }

  test("q121 output is non-empty and rank-dense on the gate corpus") {
    val out = SparkEntry.queries("q121_bpe_train")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getInt(0)).toSeq == out.indices.map(identity))
    // every winning pair was counted from at least one adjacent occurrence
    assert(out.forall(_.getLong(3) >= 1L))
  }
}
