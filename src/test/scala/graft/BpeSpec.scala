package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.operators.TextAnalysis

/** Byte-level BPE: merge-loop fixtures against hand-computed token
  * counts, learner determinism, and the distributed operator shape. */
class BpeSpec extends SparkSpec {

  private def piece(s: String): Array[String] = s.map(String.valueOf).toArray

  test("merge loop applies ranks lowest-first (hand-computed fixtures)") {
    // Rank order deliberately exercises precedence: "he" must merge
    // before "ll" even when "ll" appears earlier in the string.
    val r = Bpe.Ranks(Map(
      ("h", "e") -> 0,
      ("l", "l") -> 1,
      ("he", "ll") -> 2,
      ("hell", "o") -> 3))
    // hello: h e l l o → he l l o → he ll o → hell o → hello
    assert(Bpe.encodeCount(piece("hello"), r) === 1)
    // hell: h e l l → he l l → he ll → hell
    assert(Bpe.encodeCount(piece("hell"), r) === 1)
    // llhe: ll merges, he merges, (he,ll) rank keys don't match "llhe" order
    assert(Bpe.encodeCount(piece("llhe"), r) === 2)
    // no applicable merges → one token per byte
    assert(Bpe.encodeCount(piece("xyz"), r) === 3)
    // empty / single byte
    assert(Bpe.encodeCount(piece(""), r) === 0)
    assert(Bpe.encodeCount(piece("h"), r) === 1)
  }

  test("cl100k pre-tokenizer splits contractions, digits, space runs") {
    def pieces(s: String): Seq[String] = {
      val m = Bpe.Cl100kPattern.matcher(s)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    assert(pieces("it's") === Seq("it", "'s"))
    assert(pieces("I'll go") === Seq("I", "'ll", " go"))
    // 1-3 digit grouping — the cl100k number rule
    assert(pieces("12345") === Seq("123", "45"))
    assert(pieces("hello  world") === Seq("hello", " ", " world"))
    assert(pieces("a, b") === Seq("a", ",", " b"))
  }

  test("learner is deterministic and learns frequent pairs first") {
    val corpus = Seq("aaab aaab aaab", "the the the cat")
    val r1 = Bpe.learn(corpus, 8)
    val r2 = Bpe.learn(corpus, 8)
    assert(r1 === r2)
    // "aa" dominates the pair counts (2 per "aaab" × 3 + …)
    assert(r1.ranks.contains(("a", "a")))
    // Encoding compresses seen words below their byte length.
    assert(Bpe.encodeCount(piece("aaab"), r1) < 4)
  }

  test("UTF-8 multibyte text round-trips through the byte-level encoder") {
    val r = Bpe.learn(Seq("héllo héllo"), 16)
    // é is 2 UTF-8 bytes; with enough merges the word collapses fully.
    assert(Bpe.encodeCount(
      "héllo".getBytes("UTF-8").map(b => String.valueOf((b & 0xff).toChar)), r) >= 1)
    val n = Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString("héllo héllo"), r)
    assert(n >= 2) // two pre-tokens at minimum
  }

  test("property: count bounded by UTF-8 bytes, deterministic, monotone in merges") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar), (2, Gen.const(' ')),
      (1, Gen.oneOf('é', 'ü', 'λ', '中', '!', ',', '\n')))
    val strGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    var seed = Seed(7L)
    val samples = (1 to 120).map { _ =>
      val s = strGen.apply(Gen.Parameters.default, seed).get; seed = seed.next; s
    }
    val r0 = Bpe.Ranks(Map.empty)
    val r64 = Bpe.learn(samples, 64)
    val r256 = Bpe.learn(samples, 256)
    samples.foreach { s =>
      val u = UTF8String.fromString(s)
      val bytes = s.getBytes("UTF-8").length
      val (n0, n64, n256) = (Bpe.countTokens(u, r0), Bpe.countTokens(u, r64),
        Bpe.countTokens(u, r256))
      assert(n0 <= bytes, s"'$s': no-merge count exceeds bytes")
      // merges only ever REDUCE the token count, monotonically in vocab size
      assert(n64 <= n0 && n256 <= n64, s"'$s': merge monotonicity violated")
      assert(n256 === Bpe.countTokens(u, r256)) // deterministic
      // the cl100k pattern's classes cover every char, so any non-empty
      // string produces at least one token
      assert(s.isEmpty || n256 >= 1)
    }
  }

  test("q05b operator: one row per doc, trained-vocab counts <= byte counts") {
    val docs = Tables.documents(spark, sf0001)
    val out = TextAnalysis.bpeCorpusTokens(docs)
    assert(out.count() === docs.count())
    // BPE can never produce MORE tokens than UTF-8 BYTES (octet_length,
    // not char length — multibyte text has more bytes than chars).
    val bad = out.join(docs, "doc_id")
      .where(col("n_bpe_real") > octet_length(col("text")) + lit(1))
    assert(bad.count() === 0)
    // Compression sanity: trained BPE ≤ raw bytes on average, and the
    // plan is a narrow projection (no shuffle except the output sort).
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("bpe_count"), s"expression missing from plan:\n$p")
    assert(!p.contains("hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("loadTiktoken: shipped merge-table fixture drives tiktoken concat-rank merges") {
    import org.apache.spark.unsafe.types.UTF8String
    val path = getClass.getResource("/mini.tiktoken").getPath
    val r = Bpe.loadTiktoken(path)
    assert(r.concat.size == 7 && r.ranks.isEmpty)
    // hand-traced tiktoken merge order on "hello" with vocab
    // {h,e,l,o, ll:4, he:5, llo:6}: ll (rank 4) first -> h,e,ll,o;
    // he (5) -> he,ll,o; llo (6) -> he,llo. Two tokens.
    assert(Bpe.countTokens(UTF8String.fromString("hello"), r) == 2)
    // no merge in vocab applies -> one token per byte
    assert(Bpe.countTokens(UTF8String.fromString("xyz"), r) == 3)
    // pre-tokenizer splits "hello" / " hello"; the leading space can't
    // merge (no " he" token), so 2 + 3
    assert(Bpe.countTokens(UTF8String.fromString("hello hello"), r) == 5)
  }

  test("bpeFileTokens: file-vocab operator counts match the kernel per row") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val path = getClass.getResource("/mini.tiktoken").getPath
    val r = Bpe.loadTiktoken(path)
    val docs = Seq((1L, "hello"), (2L, "xyz"), (3L, "hello hello"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeFileTokens(docs, path).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 3, 3L -> 5))
    out.foreach { case (id, n) =>
      val text = Map(1L -> "hello", 2L -> "xyz", 3L -> "hello hello")(id)
      assert(n == Bpe.countTokens(UTF8String.fromString(text), r))
    }
  }

  test("REAL-VOCAB SCALE: a synthetic cl100k-sized vocabulary (100,256 " +
    "entries) loads, drives deep merge cascades bit-equal to an " +
    "independent reference loop, and encodes the corpus") {
    import org.apache.spark.unsafe.types.UTF8String
    // No egress and no cl100k_base.tiktoken on disk (SURVEY row 5), so
    // the claim testable here is the loader + merge loop AT THE REAL
    // TABLE SIZE: 256 single-byte ranks + 100,000 multi-byte merges =
    // 100,256 entries, cl100k's exact table size. Tokens are letter
    // n-grams in length-major rank order; every k-gram = (k-1)-gram +
    // 1-gram, so each entry is derivable by one merge of two earlier
    // tokens — the BPE validity property a real vocab has.
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val enc = java.util.Base64.getEncoder
    val sb = new StringBuilder
    var rank = 0
    def emit(tok: String): Unit = {
      sb.append(enc.encodeToString(
        tok.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
        .append(' ').append(rank).append('\n')
      rank += 1
    }
    (0 until 256).foreach(b => emit(String.valueOf((b & 0xff).toChar)))
    val g2 = for (a <- letters; b <- letters) yield s"$a$b"
    val g3 = for (a <- letters; b <- letters; c <- letters) yield s"$a$b$c"
    g2.foreach(emit); g3.foreach(emit) // 676 + 17,576
    val need4 = 100000 - g2.size - g3.size
    (for (a <- letters; b <- letters; c <- letters; d <- letters)
      yield s"$a$b$c$d").take(need4).foreach(emit)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_big.tiktoken"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)

    val t0 = System.nanoTime()
    val r = Bpe.loadTiktoken(path)
    val loadMs = (System.nanoTime() - t0) / 1e6
    assert(r.concat.size == 100256, s"table size ${r.concat.size}")

    // independent reference merge loop (fresh implementation over the
    // concat map — no shared buffer mechanics with encodeCount)
    def refCount(piece: String): Int = {
      var parts = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => String.valueOf((b & 0xff).toChar)).toList
      var go = true
      while (go && parts.length > 1) {
        val ranked = parts.zip(parts.tail).zipWithIndex
          .map { case ((a, b), i) => (r.concat.getOrElse(a + b, Int.MaxValue), i) }
          .minBy(_._1)
        if (ranked._1 == Int.MaxValue) go = false
        else {
          val i = ranked._2
          parts = parts.take(i) ::: (parts(i) + parts(i + 1)) :: parts.drop(i + 2)
        }
      }
      parts.length
    }
    def refTokens(text: String): Int = {
      val m = Bpe.Cl100kPattern.matcher(text)
      var n = 0
      while (m.find()) n += refCount(m.group())
      n
    }
    val rnd = new scala.util.Random(7)
    val samples = Seq("the quick brown fox jumps over the lazy dog",
      "zzzz", "a", "hello world", "naïve café ☕ 寿司",
      "it's 1234 tokens, isn't it?") ++
      (1 to 40).map(_ => (1 to rnd.nextInt(12) + 1)
        .map(_ => (1 to rnd.nextInt(9) + 1)
          .map(_ => letters(rnd.nextInt(26))).mkString).mkString(" "))
    samples.foreach { s =>
      val got = Bpe.countTokens(UTF8String.fromString(s), r)
      assert(got == refTokens(s), s"'$s': kernel $got != reference ${refTokens(s)}")
    }
    // deep cascade really fires: a 4-gram word is ONE token (3 merges)
    assert(Bpe.countTokens(UTF8String.fromString("abcd"), r) == 1)

    // corpus encode at real vocab size: the operator path (broadcast
    // 100k-entry table, codegen'd per-row count) over real documents
    val docs = Tables.documents(spark, sf0001).limit(100)
    val t1 = System.nanoTime()
    val out = graft.operators.TextAnalysis.bpeFileTokens(docs, path).collect()
    val encMs = (System.nanoTime() - t1) / 1e6
    assert(out.length == 100 && out.forall(_.getInt(1) > 0))
    info(f"cl100k-size vocab: load $loadMs%.0f ms, 100-doc encode $encMs%.0f ms")
  }
}
