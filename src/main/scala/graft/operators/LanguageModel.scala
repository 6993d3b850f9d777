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

  /** WORD-bigram Stupid Backoff scoring (q155; Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the
    * distributed-model complement of [[lmScore]]: where the char model
    * is alphabet²-bounded and BROADCASTS, a word-bigram model is
    * vocabulary-sized — at web scale it does not fit one node, which
    * is precisely the setting Stupid Backoff was published for: an
    * unnormalized score, S(w₂|w₁) = cnt(w₁w₂)/ctx(w₁) when the bigram
    * was seen in training, else α·(cnt(w₂)+1)/(N+V) (α = 0.4, the
    * paper's constant; the backoff leg is Laplace-smoothed so unseen
    * words score a well-defined floor) — chosen exactly because it
    * needs no cross-row normalization pass and serves from count
    * tables as they are.
    *
    * Scale shape: the model IS two count tables (bigram, unigram)
    * partitioned by their keys; scoring joins each document's pair
    * stream against them by HASH JOIN on (bg) and (w₂) — no broadcast
    * of unbounded state anywhere, and the model-side shuffles reuse
    * the groupBy exchanges that built the counts (same keys). Per-doc
    * accumulation then partial-aggs to one row per doc. Contrast
    * [[lmScore]], whose whole model rides the broadcast: these are the
    * two serving shapes a corpus-scale LM filter can take, and WHICH
    * one is right depends only on model cardinality.
    *
    * Cross-engine exactness: same micro-unit discipline as [[lmScore]]
    * — both legs quantize floor(ln(s)·1e6) per pair, integer-sum, one
    * final division. Context counts come from the PAIR stream (ctx(w₁)
    * = Σ_w₂ cnt(w₁w₂)), so seen-bigram scores are ≤ 1 by
    * construction. */
  def backoffScore(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    val tagged = docs.withColumn("split", CorpusPipeline.splitCol(trainPct))
    // adjacent word pairs; sub-2-token docs are filtered BEFORE the
    // sequence (Spark's sequence(1, 0) steps BACKWARD rather than
    // yielding empty) and contribute no rows — the CharNgrams
    // convention, matched by a length gate in the SQL mirror
    val pairs = tagged
      .select(col("doc_id"), col("split"),
        TextAnalysis.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), col("split"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("p"))
      .select(col("doc_id"), col("split"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val trn = pairs.where(col("split") === "train")
    // ONE corpus-sized model pass: every other model table derives
    // from the vocabulary-bounded bigram counts (uni(w₂) = Σ_w₁ cnt,
    // N = Σ cnt, V = |distinct w₂| — identities over the pair stream),
    // and the four legs share the bgCnt subtree CANONICALLY, so AQE's
    // exchange reuse computes the corpus aggregation once. The whole
    // job is two passes over the text: one to build the model, one to
    // score against it.
    val bgCnt = trn.groupBy("w1", "w2").agg(count(lit(1)).as("cnt_bg"))
    val ctx = bgCnt.groupBy("w1").agg(sum("cnt_bg").as("cnt_ctx"))
    val uni = bgCnt.groupBy(col("w2").as("u_w"))
      .agg(sum("cnt_bg").as("cnt_uni"))
    val nv = bgCnt.agg(sum("cnt_bg").as("n_pairs_train"),
      countDistinct(col("w2")).as("vs"))
    val lp = floor(
      when(col("cnt_bg").isNotNull,
        log(col("cnt_bg").cast("double") / col("cnt_ctx")))
        .otherwise(log(lit(0.4) *
          (coalesce(col("cnt_uni"), lit(0L)) + 1L).cast("double") /
          (col("n_pairs_train") + col("vs"))))
        * 1000000.0).cast("long")
    pairs
      .join(bgCnt, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni, col("w2") === col("u_w"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"), lp.as("lp"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum("lp").as("sum_logp_micro"),
        round(sum("lp").cast("double") / (lit(1000000.0) * count(lit(1))), 6).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** q230: leave-one-source-out data valuation of the char-bigram LM —
    * "which source is my held-out quality coming from?", the
    * data-attribution dial (Data Shapley's first-order cousin) a
    * mixing/curation loop reads before re-weighting: for every source
    * s, how much worse (or better) does the [[lmScore]] model score a
    * FIXED eval slice when s's training contribution is removed?
    *
    * The naive form retrains |sources| models — |S| full corpus
    * passes. The Spark-first form exploits that the model IS additive
    * count tables: LOO counts are SUBTRACTION, cnt₋ₛ(bg) = cnt(bg) −
    * cntₛ(bg), ctx₋ₛ(c) = ctx(c) − ctxₛ(c), and the LOO vocabulary is
    * V₋ₛ = V − |{u : glob(u) = srcₛ(u)}| (second-chars whose ENTIRE
    * global mass came from s). So ONE bigram pass builds the
    * (source, bg) grain, every per-source model derives by algebra on
    * alphabet²-bounded frames, and scoring is the distinct-eval-bigram
    * grid × |S| — broadcast joins end to end, no second corpus scan,
    * no per-source retrain. At 100 TB this is |S| retrains → one scan
    * + KB-scale arithmetic.
    *
    * Same micro-unit exactness as [[lmScore]]: per-bigram
    * floor(ln(p)·1e6) BIGINTs, weighted by exact eval counts, integer
    * sums (order-immune); delta_micro = sum_loo − sum_full, NEGATIVE =
    * removing the source hurts (it was contributing mass the eval
    * slice needed), so the most valuable source has the most negative
    * delta. avg_delta divides two exact operands at the end. */
  def sourceInfluence(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    import graft.functions.CharNgrams
    val rows = docs.withColumn("split", CorpusPipeline.splitCol(trainPct))
      .select(col("source"), col("split"),
        explode(SqlBridge.column(CharNgrams(
          SqlBridge.expression(col("text")), 2))).as("bg"))
    // (source, bg) train grain — everything below derives from it
    val srcCnt = rows.where(col("split") === "train")
      .groupBy("source", "bg").agg(count(lit(1)).as("cnt_s"))
    val glob = srcCnt.groupBy("bg").agg(sum("cnt_s").as("cnt"))
    val ctxS = srcCnt.groupBy(col("source"),
        substring(col("bg"), 1, 1).as("c"))
      .agg(sum("cnt_s").as("ctx_s"))
    val ctx = glob.groupBy(substring(col("bg"), 1, 1).as("c"))
      .agg(sum("cnt").as("ctx_cnt"))
    // LOO vocabulary: V minus second-chars monopolized by the source
    val globU = glob.groupBy(substring(col("bg"), 2, 1).as("u"))
      .agg(sum("cnt").as("u_cnt"))
    val srcU = srcCnt.groupBy(col("source"),
        substring(col("bg"), 2, 1).as("u"))
      .agg(sum("cnt_s").as("u_s"))
    val v = globU.agg(count(lit(1)).as("vs"))
    val vLoo = srcU.join(broadcast(globU), Seq("u"))
      .where(col("u_s") === col("u_cnt"))
      .groupBy("source").agg(count(lit(1)).as("lost_u"))
    // fixed eval slice, reduced to its distinct-bigram grid
    val evalBg = rows.where(col("split") === "eval")
      .groupBy("bg").agg(count(lit(1)).as("ecnt"))
    val nEval = evalBg.agg(sum("ecnt").as("n_eval"))
    def lpMicro(cnt: org.apache.spark.sql.Column,
                ctxCnt: org.apache.spark.sql.Column,
                vocab: org.apache.spark.sql.Column) =
      floor(log((cnt + 1L).cast("double") / (ctxCnt + vocab)) * 1000000.0)
        .cast("long")
    // full-model score of the eval slice (one BIGINT)
    val full = evalBg
      .join(broadcast(glob), Seq("bg"), "left")
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("c"), "left")
      .crossJoin(broadcast(v))
      .select((col("ecnt") * lpMicro(coalesce(col("cnt"), lit(0L)),
        coalesce(col("ctx_cnt"), lit(0L)), col("vs"))).as("w"))
      .agg(sum("w").as("sum_logp_full_micro"))
    // every source × the eval grid: LOO counts by subtraction
    val sources = docs.select(col("source")).distinct()
    val loo = sources.crossJoin(evalBg)
      .join(broadcast(srcCnt), Seq("source", "bg"), "left")
      .join(broadcast(glob), Seq("bg"), "left")
      .withColumn("c", substring(col("bg"), 1, 1))
      .join(broadcast(ctxS), Seq("source", "c"), "left")
      .join(broadcast(ctx), Seq("c"), "left")
      .join(broadcast(vLoo), Seq("source"), "left")
      .crossJoin(broadcast(v))
      .withColumn("v_loo", col("vs") - coalesce(col("lost_u"), lit(0L)))
      .select(col("source"), col("v_loo"),
        (col("ecnt") * lpMicro(
          coalesce(col("cnt"), lit(0L)) - coalesce(col("cnt_s"), lit(0L)),
          coalesce(col("ctx_cnt"), lit(0L)) - coalesce(col("ctx_s"), lit(0L)),
          col("v_loo"))).as("w"))
      .groupBy("source", "v_loo")
      .agg(sum("w").as("sum_logp_loo_micro"))
    val trainMass = srcCnt.groupBy("source")
      .agg(sum("cnt_s").as("n_train_bigrams"))
    loo
      .join(broadcast(trainMass), Seq("source"), "left")
      .crossJoin(broadcast(full))
      .crossJoin(broadcast(nEval))
      .select(col("source"),
        coalesce(col("n_train_bigrams"), lit(0L)).as("n_train_bigrams"),
        col("v_loo"),
        col("sum_logp_full_micro"),
        col("sum_logp_loo_micro"),
        (col("sum_logp_loo_micro") - col("sum_logp_full_micro")).as("delta_micro"),
        round((col("sum_logp_loo_micro") - col("sum_logp_full_micro"))
          .cast("double") / (lit(1000000.0) * col("n_eval")), 6).as("avg_delta"))
      .orderBy("source")
  }

  /** q223: Good-Turing unseen-mass report per source — the smoothing
    * dial every LM built on a corpus needs read BEFORE training: the
    * Good-Turing estimate says the probability mass of token types the
    * corpus has NEVER seen is p₀ = N₁/N (hapax count over token
    * count, Good 1953), and the discounted effective count of a
    * singleton is c₁* = 2·N₂/N₁. Per source because the dial drives
    * per-source mixing decisions (a source with high unseen mass is
    * under-sampled relative to its domain; the q37/q95 weighting
    * consumers read exactly this kind of signal).
    *
    * Exactness: N, V, N₁, N₂ are exact integers off one (source, term)
    * rollup; the two ratios divide exact operands and round 6 dp —
    * nothing float-order-dependent. Scale shape: the q41 vocab-stats
    * grain — one explode + one partial-agg exchange on (source, term),
    * then a source-grain rollup; no joins, no windows. */
  def goodTuringReport(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(sum(col("c")).as("total_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("total_tokens"), col("vocab_size"),
        col("n1"), col("n2"),
        round(col("n1").cast("double") / col("total_tokens").cast("double"), 6)
          .as("p0_unseen"),
        round(when(col("n1") > 0,
          lit(2.0) * col("n2").cast("double") / col("n1").cast("double"))
          .otherwise(lit(0.0)), 6).as("c1_star"))
      .orderBy("source")
  }
}
