package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-bigram language-model quality scoring — the CCNet-style
  * "perplexity filter" of LLM corpus pipelines, with the KenLM stand-in
  * re-expressed as a Spark plan: train an add-one-smoothed bigram LM on
  * the train split, score every document by mean token log-probability,
  * low scores = out-of-distribution / garbage text.
  *
  *   P(c2|c1) = (cnt(c1c2) + 1) / (ctx(c1) + V),  V = |distinct c2|
  *
  * Cross-engine exactness (SURVEY.md §6): each bigram's log-prob is
  * quantized to integer MICRO-units — floor(ln(p)·1e6) as BIGINT — so
  * per-document accumulation is exact integer arithmetic, immune to
  * float summation order; only the final mean divides (identical exact
  * operands on both engines).
  *
  * Scale shape: the "model" is the bigram/context count tables — at
  * most alphabet² rows regardless of corpus size — built by one
  * partial-agg exchange over the exploded bigram stream (the exchange
  * carries per-task partial counts, bounded by alphabet², not data).
  * Scoring joins each bigram row against the BROADCAST model and
  * partial-aggs straight to one row per doc: the only per-doc shuffle
  * is O(n_docs). The bigram explode is 2× text bytes of narrow rows —
  * linear, never materialized.
  */
object LanguageModel {

  /** (doc_id, split, bg) rows: every adjacent character pair of every
    * document with ≥ 2 chars. [[graft.functions.CharNgrams]] is a
    * codegen'd single-pass slider (the HOF transform/sequence twin ran
    * interpreted and 4× slower); sub-2-char docs yield an empty array →
    * no rows, null text → null → no rows, matching `range`-based
    * engines. */
  private def bigramRows(tagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    import graft.functions.CharNgrams
    tagged.select(col("doc_id"), col("split"),
      explode(SqlBridge.column(CharNgrams(SqlBridge.expression(col("text")), 2))).as("bg"))
  }

  /** Train-split LM + all-document scores: doc_id, n_bigrams,
    * sum_logp_micro, avg_logp (6 dp). */
  def lmScore(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    val rows = bigramRows(docs.withColumn("split", CorpusPipeline.splitCol(trainPct)))
    val trn = rows.where(col("split") === "train")
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
    val ctx = trn.groupBy(substring(col("bg"), 1, 1).as("c"))
      .agg(sum("cnt").as("ctx_cnt"))
    val v = trn.agg(countDistinct(substring(col("bg"), 2, 1)).as("vs"))
    val logpMicro = floor(
      log((coalesce(col("cnt"), lit(0L)) + 1L).cast("double") /
        (coalesce(col("ctx_cnt"), lit(0L)) + col("vs"))) * 1000000.0)
      .cast("long")
    rows
      .join(broadcast(trn), Seq("bg"), "left")
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("c"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), logpMicro.as("lp"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum("lp").as("sum_logp_micro"),
        round(sum("lp").cast("double") / (lit(1000000.0) * count(lit(1))), 6).as("avg_logp"))
      .orderBy("doc_id")
  }
}
