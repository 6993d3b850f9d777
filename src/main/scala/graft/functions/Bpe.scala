package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Byte-level BPE with the exact tiktoken mechanics — the faithful
  * re-expression of the reference's cl100k_base tokenization
  * (Program.cs:40,80: SharpToken `GetEncoding("cl100k_base")`).
  *
  *  - Pre-tokenization uses the PUBLIC cl100k_base regex (contractions,
  *    letter runs, 1-3 digit runs, punctuation clusters, whitespace
  *    classes), translated to java.util.regex.
  *  - Encoding is the standard BPE loop: a pre-token's UTF-8 bytes are
  *    repeatedly merged at the lowest-rank adjacent pair until no ranked
  *    pair remains — byte-for-byte what tiktoken's `byte_pair_encode`
  *    does.
  *  - The MERGE TABLE is corpus-trained (deterministic greedy pair-count
  *    learner over a bounded driver-side sample) rather than OpenAI's
  *    shipped cl100k vocab: this environment has no egress, and the
  *    ~1.7 MB tiktoken vocab file is not on disk, so exact cl100k token
  *    COUNTS are out of reach — but the algorithm, data flow (broadcast
  *    ranks, codegen'd per-row encode) and scale shape are exactly what
  *    dropping the real vocab file in would use. Swapping vocabs changes
  *    one constructor argument.
  *
  * Bytes are carried as latin-1 strings (chars 0-255 ↔ bytes 1:1), so
  * ranks keys are cheap JVM strings without a codec round-trip.
  */
object Bpe {

  /** The public cl100k_base pre-tokenization pattern (tiktoken's
    * `pat_str`), in Java regex form. */
  val Cl100kPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""")

  /** Broadcastable merge table; lower rank merges first. Two keying
    * schemes, one semantics:
    *
    *  - `ranks`: (left, right) → rank — what the corpus [[learn]]er
    *    emits (it knows which pair it merged).
    *  - `concat`: merged-token-bytes → rank — what a tiktoken vocab
    *    file ships (token → id), and exactly how tiktoken's own
    *    byte_pair_merge ranks a candidate pair: by the rank of the
    *    CONCATENATED bytes. [[loadTiktoken]] fills this.
    *
    * [[pairRank]] consults both, so the merge loop is byte-for-byte
    * tiktoken's under either vocabulary source. */
  final case class Ranks(ranks: Map[(String, String), Int],
                         concat: Map[String, Int] = Map.empty)
      extends Serializable {
    /** Rank of merging (a, b), or Int.MaxValue when unmergeable. */
    def pairRank(a: String, b: String): Int = {
      val p = ranks.getOrElse((a, b), Int.MaxValue)
      if (p != Int.MaxValue || concat.isEmpty) p
      else concat.getOrElse(a + b, Int.MaxValue)
    }
  }

  /** Load a tiktoken-format vocabulary file — one `<base64-token>
    * <rank>` pair per line, the shipped format of cl100k_base.tiktoken
    * and every other OpenAI encoding — into a [[Ranks]] table. This is
    * the drop-in path the corpus-trained default documents: with the
    * real cl100k file on disk, [[graft.operators.TextAnalysis.bpeFileTokens]]
    * counts are exactly SharpToken's (reference Program.cs:40,80);
    * nothing else about the pipeline changes. Token bytes are carried
    * as latin-1 strings like every other key in this object. */
  def loadTiktoken(path: String): Ranks = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val concat = src.getLines()
        .map(_.trim).filter(_.nonEmpty)
        .map { line =>
          val parts = line.split("\\s+")
          require(parts.length == 2, s"malformed tiktoken line: '$line'")
          val bytes = java.util.Base64.getDecoder.decode(parts(0))
          new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1) ->
            parts(1).toInt
        }
        .toMap
      Ranks(Map.empty, concat)
    } finally src.close()
  }

  /** Write a [[Ranks]] table in tiktoken's shipped format — one
    * `<base64-token> <rank>` line per merged token (the format
    * [[loadTiktoken]] reads back). Pair-keyed ranks serialize as their
    * CONCATENATED bytes, which is exactly how tiktoken keys its vocab
    * and how [[Ranks.pairRank]]'s concat path scores candidates — so
    * save → load → encode is count-identical to encoding with the
    * original pair-keyed table (BpeTrainSpec pins the roundtrip).
    * Driver-side by design: a merge table is KB-to-MB at any corpus
    * scale (cl100k is ~1.7 MB). */
  def saveTiktoken(r: Ranks, path: String): Unit = {
    val enc = java.util.Base64.getEncoder
    val lines = (r.ranks.map { case ((a, b), rank) => (a + b, rank) } ++ r.concat)
      .toSeq.sortBy(_._2)
      .map { case (tok, rank) =>
        enc.encodeToString(tok.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) +
          " " + rank
      }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def latin1(bytes: Array[Byte]): Array[String] = {
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf((bytes(i) & 0xff).toChar)
      i += 1
    }
    out
  }

  /** Pre-tokenize into byte-piece words (each an array of 1-byte latin-1
    * strings, ready for the merge loop). `private[graft]` so
    * [[graft.operators.BpeTrain]]'s distributed learner shares the ONE
    * pre-tokenizer definition with [[learn]] and [[countTokens]] —
    * train/encode skew is how tokenizers silently break. */
  private[graft] def preTokenize(text: String): Iterator[Array[String]] = {
    val m = Cl100kPattern.matcher(text)
    new Iterator[Array[String]] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): Array[String] = {
        val piece = m.group()
        has = m.find()
        latin1(piece.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  /** tiktoken's byte_pair_encode merge loop over one pre-token: merge
    * the lowest-rank adjacent pair until none is ranked; returns the
    * number of resulting tokens. */
  def encodeCount(word: Array[String], r: Ranks): Int = {
    if (word.length <= 1) return word.length
    val parts = mutable.ArrayBuffer.from(word)
    var done = false
    while (!done && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val rank = r.pairRank(parts(i), parts(i + 1))
        if (rank < bestRank) { bestRank = rank; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
      }
    }
    parts.length
  }

  /** Token count of a full text: pre-tokenize, BPE-encode each piece,
    * sum. Static entry point shared by interpreted eval and codegen. */
  def countTokens(text: UTF8String, r: Ranks): Int = {
    var n = 0
    val it = preTokenize(text.toString)
    while (it.hasNext) n += encodeCount(it.next(), r)
    n
  }

  /** Deterministic greedy BPE learner: count adjacent byte-piece pairs
    * across the (weighted) pre-token vocabulary, merge the most frequent
    * pair (ties to the lexicographically smallest), repeat. The sample
    * is a BOUNDED driver-side collect — vocabulary training is a
    * fixed-size job by design at any corpus scale (like any tokenizer
    * train step); only ENCODING runs distributed. */
  def learn(sample: Seq[String], numMerges: Int): Ranks = {
    // Pre-token frequency table (the learner's working set).
    val wordFreq = mutable.LinkedHashMap.empty[List[String], Long]
    sample.foreach { text =>
      preTokenize(text).foreach { w =>
        if (w.length > 1) {
          val key = w.toList
          wordFreq.update(key, wordFreq.getOrElse(key, 0L) + 1L)
        }
      }
    }
    var words = wordFreq.toVector
    val merges = mutable.LinkedHashMap.empty[(String, String), Int]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        w.iterator.zip(w.iterator.drop(1)).foreach { p =>
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (bestPair, _) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges.update(bestPair, rank)
        rank += 1
        words = words.map { case (w, f) =>
          val out = mutable.ListBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i < w.length - 1 && (w(i), w(i + 1)) == bestPair) {
              out += w(i) + w(i + 1); i += 2
            } else { out += w(i); i += 1 }
          }
          (out.toList, f)
        }.filter(_._1.length > 1)
        if (words.isEmpty) exhausted = true
      }
    }
    Ranks(merges.toMap)
  }
}

/** Per-row BPE token count as a codegen'd unary expression over a
  * broadcast [[Bpe.Ranks]] — same Expression-over-Broadcast ladder rung
  * as [[NearestCentroid]]: the merge table ships once per executor, the
  * per-row encode runs inside whole-stage codegen, no UDF. */
case class BpeCount(child: Expression, bc: Broadcast[Bpe.Ranks])
    extends UnaryExpression {

  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input, got $t")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    Bpe.countTokens(s.asInstanceOf[UTF8String], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bpeRanksBc", bc,
      classOf[Broadcast[Bpe.Ranks]].getName)
    val ranksCls = classOf[Bpe.Ranks].getName // binary name resolves in janino
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Bpe.countTokens($c, ($ranksCls) $bcRef.value());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
