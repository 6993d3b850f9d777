package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Distributed BPE merge training — the corpus-scale twin of
  * [[graft.functions.Bpe.learn]] (which trains on a bounded driver-side
  * sample, the fixed-cost default for token COUNTING). When the
  * tokenizer itself is the product — training a vocab ON the corpus the
  * model will see, the way GPT-2/cl100k vocabs were built on their
  * crawls (reference Program.cs:40,80 consumes such a vocab) — the pair
  * statistics must come from ALL the text, and at 100 TB no driver
  * holds the working set. The classic trick (every single-node BPE
  * trainer uses it too) makes this tractable: merges never cross
  * pre-token boundaries, so the corpus collapses to a DISTINCT-WORD
  * frequency table first, and the merge loop runs over that — bounded
  * by vocabulary size, not corpus size.
  *
  * Scale shape:
  *  - ONE corpus-sized pass: pre-tokenize (the shared cl100k regex) +
  *    hash-exchange on the byte-piece word → (word, freq). This is the
  *    only stage that sees every byte; it is a straight map + partial
  *    agg, the q13 exact-dedup shape.
  *  - numMerges rounds over the collapsed table: adjacent-pair counts
  *    via a `transform` index lambda + explode + groupBy (the shuffle
  *    carries one row per distinct PAIR, ≪ distinct words), a 1-ROW
  *    argmax collect (bounded, like the PageRank convergence probe),
  *    then a distributed map applying the merge. `localCheckpoint`
  *    each round keeps the lineage flat (the q88 discipline); the
  *    table only shrinks (words fully merged to one symbol drop out).
  *  - Words are distinct byte strings, and a word's symbol split is a
  *    deterministic function of its bytes + the merge table — so two
  *    distinct rows can never converge and no re-group is needed.
  *
  * Determinism: tie-break is (max count, lexicographically smallest
  * (left, right)) — identical to [[Bpe.learn]]'s `minBy((-c, a, b))`.
  * Spark's ORDER BY on strings compares UTF-8 bytes = code-point order;
  * Java String compares UTF-16 units — equal for these tokens (latin-1
  * chars only, no surrogates), so BpeTrainSpec pins distributed ==
  * driver BIT FOR BIT on the same corpus.
  */
object BpeTrain {

  /** One learned merge: `rank` is merge order (lower merges first),
    * `left`/`right` the merged symbol pair (latin-1 byte strings),
    * `n_pairs` the weighted adjacent-pair count that won the round. */
  final case class Merge(rank: Int, left: String, right: String, n_pairs: Long)

  private[graft] final case class WordRow(syms: Seq[String], f: Long)

  /** Left-to-right non-overlapping application of one merge — the same
    * rule as [[Bpe.learn]]'s inner loop (and tiktoken's). */
  private[graft] def applyMerge(w: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val n = w.length
    var i = 0
    while (i < n) {
      if (i < n - 1 && w(i) == a && w(i + 1) == b) { out += (a + b); i += 2 }
      else { out += w(i); i += 1 }
    }
    out.toList
  }

  /** The corpus-sized pass: distinct byte-piece words with frequencies.
    * Single-symbol words carry no mergeable pair and are dropped at the
    * source (before the exchange), exactly like the driver learner. */
  private[graft] def wordFreq(docs: DataFrame): Dataset[WordRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text")).where(col("text").isNotNull).as[String]
      .flatMap(t => Bpe.preTokenize(t).filter(_.length > 1).map(_.toSeq))
      .groupBy(col("value").as("syms"))
      .agg(count(lit(1)).as("f"))
      .as[WordRow]
  }

  /** Train `numMerges` merges on the full corpus; returns the merge
    * table (rank, left, right, n_pairs) ordered by rank. The result is
    * driver-sized by construction (one row per merge), so building the
    * output frame locally is not a collect smell. */
  def train(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    var words = wordFreq(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // Adjacent pairs of each word, weighted by word frequency. The
      // index lambda pairs syms[i] with syms[i+1]; slice bounds the
      // transform to n-1 elements so no null partner appears.
      val best = words.toDF()
        .select(explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), (x, i) -> struct(x AS a, syms[i + 1] AS b))"))
          .as("p"), col("f"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, a, b, n)
        rank += 1
        val next = words
          .map(w => WordRow(applyMerge(w.syms, a, b), w.f))
          .filter(_.syms.lengthCompare(1) > 0)
          .localCheckpoint(true)
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    spark.createDataFrame(merges.toSeq).orderBy("rank")
  }

  /** The trained table as a [[Bpe.Ranks]] — plugs straight into
    * [[graft.functions.BpeCount]] / [[TextAnalysis.bpeCorpusTokens]]'s
    * broadcast-encode path, so corpus-trained merges serve encoding
    * with zero format conversion. */
  def toRanks(mergeTable: DataFrame): Bpe.Ranks =
    Bpe.Ranks(mergeTable.select("left", "right", "rank").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap)
}
