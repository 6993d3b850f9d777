package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier over documents (q197) — the
  * fastText-shaped linear model every production pretraining pipeline
  * runs as its quality gate (Joulin et al., EACL 2017 "Bag of Tricks";
  * the GPT-3 / CCNet / DCLM quality filters are exactly this: hashed
  * bag-of-ngrams features into a linear classifier, labels from a
  * trusted-vs-crawl split). DSIR (q54) reweights by n-gram likelihood
  * ratios; this LEARNS the boundary instead.
  *
  * Model: logistic regression over `buckets` hashed unigram+bigram
  * token features plus a bias, trained by full-batch gradient descent
  * for a FIXED round count.
  *
  * Exactness contract (the q88/q177 integer discipline): weights live
  * in integer MICRO-units. Each round broadcasts the weight vector as
  * a literal array; every document's margin is an exact integer
  * aggregate (`functions.aggregate` over its feature array — codegen,
  * no UDF), the per-document gradient `σ(margin) − label` is quantized
  * to micro BEFORE the feature fan-out, and the per-bucket gradient
  * sum is a LONG aggregate — commutative, so the distributed sum is
  * bit-equal to a sequential fold (ClassifierSpec runs that
  * differential). The only float op, σ on an exact int margin, is
  * deterministic IEEE on every JVM.
  *
  * Scale shape per round: one scan of the featurized corpus (cached) +
  * one `buckets`-row gradient aggregate (explode → groupBy bucket with
  * map-side partials) + one bounded driver collect (`buckets` rows,
  * metadata-sized) to step the weights. T rounds = T scans, no
  * shuffle of raw text; the featurize pass itself is one projection.
  * The broadcast weight literal is `buckets` longs (~8 KB at 1024) —
  * executor-side constant folding territory, NOT a join. */
object Classifier {

  /** Hashed unigram+bigram feature buckets of whitespace tokens —
    * the visible-plan featurizer (xxhash64 pmod buckets, distinct per
    * doc: presence features, the fastText default for small models). */
  def featurize(docs: DataFrame, buckets: Int): DataFrame = {
    val b = lit(buckets.toLong)
    docs
      .select(col("doc_id"), col("source"),
        filter(split(col("text"), "\\s+"), t => length(t) > 0).as("toks"))
      .select(col("doc_id"), col("source"),
        array_distinct(concat(
          transform(col("toks"), t => pmod(xxhash64(t), b)),
          when(size(col("toks")) > 1,
            transform(slice(col("toks"), lit(1), size(col("toks")) - 1),
              (t, i) => pmod(
                xxhash64(concat(t, lit(" "), get(col("toks"), i + 1))), b)))
            .otherwise(array().cast("array<bigint>")))).as("feats"))
  }

  /** Exact integer margin of one document against micro-unit weights:
    * bias + Σ w[f] over its feature buckets. */
  /** Mean-pooled margin (the fastText average, not the sum — a summed
    * margin scales with document LENGTH and saturates σ): bias +
    * (Σ w[f]) / |feats|, the division in double then truncated back to
    * long micro (deterministic: magnitudes sit far below 2⁵³; the
    * sequential fold states the identical expression). */
  private def marginMicro(weights: Array[Long], bias: Long): Column = {
    val s = aggregate(col("feats"), lit(0L),
      (acc, f) => acc + get(typedlit(weights), f.cast("int")))
    lit(bias) +
      (s.cast("double") / greatest(size(col("feats")), lit(1))).cast("long")
  }

  /** Micro quantization with floor(x + 0.5) semantics — identical in
    * the local fold (Spark's `round` half-up differs from
    * `math.round` on negative halves; floor(+0.5) is one rule both
    * sides state). */
  private def toMicro(x: Column): Column =
    floor(x * 1e6 + lit(0.5)).cast("long")

  private def sigmoid(weights: Array[Long], bias: Long): Column =
    lit(1.0) / (lit(1.0) + exp(-marginMicro(weights, bias) / lit(1e6)))

  /** Train `iters` full-batch GD rounds; returns (weights, bias) in
    * micro-units. `labelExpr` marks the positive ("high-quality")
    * class. Learning rate is lrNum/lrDen (micro-exact stepping:
    * w −= lr · Σgrad div n). */
  def train(featurized: DataFrame, buckets: Int, iters: Int,
      lrNum: Long = 5, lrDen: Long = 1): (Array[Long], Long) = {
    val n = featurized.count()
    require(n > 0, "empty training corpus")
    val weights = Array.fill(buckets)(0L)
    var bias = 0L
    for (_ <- 1 to iters) {
      // Mean pooling makes the per-FEATURE gradient g/|feats| (the
      // chain rule through the average); the bias keeps the full g.
      // Both micro-quantized per doc BEFORE the fan-out so the bucket
      // sums stay exact longs. σ is PROJECTED once per document below
      // the Generate — inlining it into the per-element lambda re-runs
      // the weight-array aggregate once per feature (O(|feats|²) per
      // doc: measured 88.2 s → 10.7 s at sf1 for the full key, 8.9 →
      // 3.0 s at sf0.1).
      val withP = featurized.select(col("feats"), col("label"),
        sigmoid(weights, bias).as("p"))
      val gBias = toMicro(col("p") - col("label"))
      val gFeat = toMicro(
        (col("p") - col("label")) / greatest(size(col("feats")), lit(1)))
      // Per-bucket gradient sums + the bias row (bucket −1) in one
      // aggregate; bounded collect: `buckets`+1 rows of metadata.
      val grads = withP
        .select(explode(concat(
          transform(col("feats"), f => struct(f.as("bucket"), gFeat.as("g"))),
          array(struct(lit(-1L).as("bucket"), gBias.as("g"))))).as("e"))
        .groupBy(col("e.bucket").as("bucket"))
        .agg(sum(col("e.g")).as("gsum"))
        .collect()
      grads.foreach { r =>
        val b = r.getLong(0)
        val step = (lrNum * r.getLong(1)) / (lrDen * n) // floor: exact
        if (b < 0) bias -= step else weights(b.toInt) -= step
      }
    }
    (weights, bias)
  }

  /** q197: train on the DSIR framing (target sources = positive) and
    * report the per-source readout: corpus size, mean micro score
    * (floor), fraction scored ≥ 0.5 — the numbers a gate threshold is
    * picked from. */
  def qualityReport(docs: DataFrame, targetSources: Seq[String],
      buckets: Int, iters: Int): DataFrame = {
    val feat = featurized(docs, targetSources, buckets)
    feat.persist()
    try {
      val (w, b) = train(feat, buckets, iters)
      scoreReport(feat, w, b)
    } finally { feat.unpersist(); () }
  }

  /** The SERVE leg: per-source readout of an already-trained model —
    * one cached scan, weights as a broadcast literal (what a pipeline
    * re-runs per corpus snapshot; training amortizes across them). */
  def scoreReport(featurized: DataFrame, weights: Array[Long],
      bias: Long): DataFrame = {
    val p = lit(1.0) / (lit(1.0) + exp(-marginMicro(weights, bias) / lit(1e6)))
    featurized
      .select(col("source"), col("label"), toMicro(p).as("score_micro"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("label").cast("long")).as("is_target"),
        expr("sum(score_micro) div count(1)").as("mean_score_micro"),
        sum(when(col("score_micro") >= 500000L, 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source")
  }

  /** q206: reliability diagram + expected calibration error for the
    * trained classifier (Naeini et al., AAAI 2015 — the ECE binning
    * every model card reports; a gate threshold is only meaningful if
    * score ≈ P(high-quality)). Scores bin into `bins` equal-width
    * buckets; per bin: count, mean predicted micro-probability,
    * empirical positive rate, absolute gap — plus the corpus-level ECE
    * (bin-count-weighted mean gap) repeated as a column. All integer
    * micro arithmetic after the one σ hop; one scan to score (cached
    * featurized frame) + one `bins`-row aggregate + a broadcast 1-row
    * total. */
  def calibrationReport(docs: DataFrame, targetSources: Seq[String],
      buckets: Int, iters: Int, bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val feat = featurized(docs, targetSources, buckets)
    feat.persist()
    try {
      val (w, b) = train(feat, buckets, iters)
      val p = lit(1.0) / (lit(1.0) + exp(-marginMicro(w, b) / lit(1e6)))
      val scored = feat.select(
        col("label").cast("long").as("pos"),
        toMicro(p).as("score_micro"))
      val perBin = scored
        .groupBy(least(
          expr(s"score_micro * $bins div 1000000"), lit(bins - 1L)).as("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          expr("sum(score_micro) div count(1)").as("mean_score_micro"),
          expr("sum(pos) * 1000000L div count(1)").as("pos_rate_micro"))
        .withColumn("gap_micro",
          abs(col("mean_score_micro") - col("pos_rate_micro")))
      val ece = perBin.agg(
        expr("sum(n_docs * gap_micro) div sum(n_docs)").as("ece_micro"))
      perBin.crossJoin(broadcast(ece)).orderBy("bin")
    } finally { feat.unpersist(); () }
  }

  /** Featurize + label in one projection (cached across GD rounds by
    * the caller). */
  def featurized(docs: DataFrame, targetSources: Seq[String],
      buckets: Int): DataFrame =
    featurize(docs, buckets)
      .withColumn("label",
        col("source").isin(targetSources: _*).cast("double"))

  /** Sequential reference fold of the SAME arithmetic — the
    * differential target ClassifierSpec pins the distributed trainer
    * against, bit for bit. Rows: (feats, label). */
  private[graft] def localTrain(rows: Seq[(Seq[Long], Double)], buckets: Int,
      iters: Int, lrNum: Long = 5, lrDen: Long = 1): (Array[Long], Long) = {
    val n = rows.size.toLong
    val weights = Array.fill(buckets)(0L)
    var bias = 0L
    for (_ <- 1 to iters) {
      val gsum = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      rows.foreach { case (feats, label) =>
        val margin = bias + (feats.map(f => weights(f.toInt)).sum.toDouble /
          math.max(feats.size, 1)).toLong
        val p = 1.0 / (1.0 + math.exp(-margin / 1e6))
        val gb = math.floor((p - label) * 1e6 + 0.5).toLong
        val gf = math.floor(
          (p - label) / math.max(feats.size, 1) * 1e6 + 0.5).toLong
        feats.foreach(f => gsum(f) += gf)
        gsum(-1L) += gb
      }
      gsum.foreach { case (b, s) =>
        val step = (lrNum * s) / (lrDen * n)
        if (b < 0) bias -= step else weights(b.toInt) -= step
      }
    }
    (weights, bias)
  }

  /** Conformal threshold from a calibration frame of integer
    * nonconformity scores (`nonconf` ∈ [0, 1e6] micro): the
    * ⌈(n+1)(1−α)⌉-th smallest value, the split-conformal quantile of
    * Vovk et al. / Angelopoulos & Bates (2023 gentle-intro
    * convention). Exact integer rank selection via the q56 histogram
    * trick — value-grain group-by + running count over the BOUNDED
    * micro domain, so no corpus-wide sort: the windowed frame is at
    * most 1e6+1 rows regardless of calibration size. Rank-overflow
    * (k > n, tiny calibration sets) yields the max nonconformity 1e6
    * = accept-everything, the conservative direction the guarantee
    * requires. Returns one row: (n_cal, qhat_micro). */
  private[graft] def qhatFrame(calNonconf: DataFrame,
      alphaMicro: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("nonconf")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val hist = calNonconf.groupBy("nonconf").agg(count(lit(1)).as("c"))
      .select(col("nonconf"), sum("c").over(w).as("cum"))
    val n = calNonconf.agg(count(lit(1)).as("n_cal"))
    // k = ⌈(n+1)(1e6−α)/1e6⌉ in exact integers
    val k = expr(s"((n_cal + 1) * ${1000000L - alphaMicro} + 999999) div 1000000")
    hist.crossJoin(broadcast(n))
      .where(col("cum") >= k)
      .agg(coalesce(min("nonconf"), lit(1000000L)).as("qhat_micro"))
      .crossJoin(broadcast(n))
      .select(col("n_cal"), col("qhat_micro"))
  }

  /** q217: split-conformal quality gate (Vovk's inductive conformal
    * prediction, the Angelopoulos-Bates recipe applied to the q197
    * classifier): a gate threshold with a DISTRIBUTION-FREE guarantee
    * — P(a target-quality document is rejected) ≤ α — that holds for
    * ANY classifier, calibrated or not. q206 measures whether scores
    * are probabilities; this makes the gate safe even when they
    * aren't.
    *
    * Protocol: documents split 4 ways by the deterministic doc-id hash
    * (the q29 convention) — splits 0,1 train, split 2 calibrates,
    * split 3 is the held-out readout. Nonconformity of a target doc is
    * 1e6 − score_micro (exact integer); the threshold is the
    * ⌈(n_cal+1)(1−α)⌉-th smallest over calibration targets
    * ([[qhatFrame]]); a doc passes when score_micro ≥ 1e6 − q̂.
    * Output: one row per source over the EVAL split — n_eval,
    * n_accept, accept rate — with the global q̂, calibration size, and
    * the achieved eval-target coverage repeated as report columns
    * (expected ≥ 1−α up to the finite-sample ±1/(n_cal+1) wobble).
    *
    * Scale shape: train is q197's bounded-collect GD; calibration adds
    * one value-grain histogram over a bounded integer domain; the
    * readout is one per-source aggregate — nothing new grows with the
    * corpus. */
  def conformalGateReport(docs: DataFrame, targetSources: Seq[String],
      buckets: Int, iters: Int, alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"alphaMicro must be in (0, 1e6), got $alphaMicro")
    val feat = featurized(docs, targetSources, buckets)
      .withColumn("split",
        pmod(Dedup.hash60(concat(lit("conformal:"), col("doc_id"))), lit(4L)))
    feat.persist()
    try {
      val (wts, b) = train(feat.where(col("split") <= 1), buckets, iters)
      val p = lit(1.0) / (lit(1.0) + exp(-marginMicro(wts, b) / lit(1e6)))
      val scored = feat.select(col("source"), col("label"), col("split"),
        toMicro(p).as("score_micro"))
      scored.persist()
      try {
        val cal = scored
          .where(col("split") === 2 && col("label") === 1.0)
          .select((lit(1000000L) - col("score_micro")).as("nonconf"))
        val qhat = qhatFrame(cal, alphaMicro)

        val eval0 = scored.where(col("split") === 3)
          .crossJoin(broadcast(qhat))
          .withColumn("accept",
            (col("score_micro") >= lit(1000000L) - col("qhat_micro"))
              .cast("long"))
        val coverage = eval0.where(col("label") === 1.0).agg(
          expr("sum(accept) * 1000000 div count(1)")
            .as("target_coverage_micro"))
        eval0.groupBy("source")
          .agg(
            max(col("label").cast("long")).as("is_target"),
            count(lit(1)).as("n_eval"),
            sum("accept").as("n_accept"),
            expr("sum(accept) * 1000000 div count(1)")
              .as("accept_rate_micro"),
            max("qhat_micro").as("qhat_micro"),
            max("n_cal").as("n_cal"))
          .crossJoin(broadcast(coverage))
          .withColumn("alpha_micro", lit(alphaMicro))
          .orderBy("source")
      } finally { scored.unpersist(); () }
    } finally { feat.unpersist(); () }
  }
}
