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
  private def marginMicro(weights: Array[Long], bias: Long): Column =
    aggregate(col("feats"), lit(bias),
      (acc, f) => acc + get(typedlit(weights), f.cast("int")))

  /** Micro quantization with floor(x + 0.5) semantics — identical in
    * the local fold (Spark's `round` half-up differs from
    * `math.round` on negative halves; floor(+0.5) is one rule both
    * sides state). */
  private def toMicro(x: Column): Column =
    floor(x * 1e6 + lit(0.5)).cast("long")

  /** σ on a micro-unit margin, then the per-doc gradient (σ − label)
    * re-quantized to micro — the one float hop, deterministic IEEE. */
  private def gradMicro(weights: Array[Long], bias: Long): Column = {
    val p = lit(1.0) / (lit(1.0) + exp(-marginMicro(weights, bias) / lit(1e6)))
    toMicro(p - col("label"))
  }

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
      val g = gradMicro(weights, bias)
      // Per-bucket gradient sums + the bias row (bucket −1) in one
      // aggregate; bounded collect: `buckets`+1 rows of metadata.
      val grads = featurized
        .select(explode(concat(col("feats"), array(lit(-1L)))).as("bucket"), g.as("g"))
        .groupBy("bucket")
        .agg(sum("g").as("gsum"))
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
      val p = lit(1.0) / (lit(1.0) + exp(-marginMicro(w, b) / lit(1e6)))
      val scoreMicro = toMicro(p)
      feat
        .select(col("source"), col("label"), scoreMicro.as("score_micro"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          max(col("label").cast("long")).as("is_target"),
          expr("sum(score_micro) div count(1)").as("mean_score_micro"),
          sum(when(col("score_micro") >= 500000L, 1L).otherwise(0L)).as("n_pass"))
        .orderBy("source")
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
        val margin = bias + feats.map(f => weights(f.toInt)).sum
        val p = 1.0 / (1.0 + math.exp(-margin / 1e6))
        val g = math.floor((p - label) * 1e6 + 0.5).toLong
        (feats :+ -1L).foreach(f => gsum(f) += g)
      }
      gsum.foreach { case (b, s) =>
        val step = (lrNum * s) / (lrDen * n)
        if (b < 0) bias -= step else weights(b.toInt) -= step
      }
    }
    (weights, bias)
  }
}
