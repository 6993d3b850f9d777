package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation.
  *
  * [[CorpusPipeline.domainMix]] hits RATE targets (keep ~p% of each
  * source); this is the complementary exact-COUNT contract: exactly
  * `n` rows per stratum, reproducible across runs and engines —
  * "give me 10k docs per domain for the eval set" / "audit sample of
  * every source". Randomness comes from the md5-derived
  * [[Dedup.hash60]] of the row id, so the sample is a pure function
  * of the data (the same discipline as the hash split, q29), never of
  * partitioning or RNG state.
  */
object Sampling {

  /** Exactly `min(n, |stratum|)` docs per `source`, chosen by md5
    * order: rank = hash60(doc_id) with doc_id tie-break, keep the
    * first n per stratum.
    *
    * Scale shape: ranking runs through [[graft.plans.GroupedTopK]] —
    * per-partition bounded heaps of n BEFORE the exchange, so the
    * shuffle carries ≤ partitions × strata × n rows no matter how
    * large the corpus is, and there is no per-stratum sort and no
    * rank column materialized over the full table (the window
    * formulation would sort every stratum end to end). At 100 TB with
    * n = 10⁴ per source this is the difference between shuffling
    * sample candidates and shuffling the corpus. */
  def stratifiedSample(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val keyed = docs.select(col("doc_id"), col("source"),
      Dedup.hash60(col("doc_id").cast("string")).as("sample_key"))
    graft.plans.GroupedTopK.topK(keyed, Seq(col("source")),
        Seq(col("sample_key").asc, col("doc_id").asc), n)
      .select(col("doc_id"), col("source"), col("sample_key"))
      .orderBy("source", "sample_key", "doc_id")
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its tokens are under a TARGET (high-
    * quality) distribution than under the RAW pool, using hashed
    * bag-of-token features — the cheap proxy that selects
    * target-looking data from a web-scale crawl.
    *
    *   w(doc) = Σ_tokens [ ln p_t(b(tok)) − ln p_r(b(tok)) ],
    *   b = hash60(token) mod `buckets`,  p_* Laplace-smoothed
    *   (c+1)/(N+B) over the B buckets. (The paper hashes unigrams AND
    *   bigrams into 10⁴ buckets; the feature map is pluggable — same
    *   plan shape either way.)
    *
    * Cross-engine exactness (SURVEY.md §6, same discipline as
    * [[LanguageModel.lmScore]]): each token's log-ratio is quantized to
    * integer MICRO-units — floor(ln((c_t+1)(N_r+B) / ((c_r+1)(N_t+B)))
    * ·1e6) — so the per-doc accumulation is exact integer arithmetic,
    * immune to float summation order.
    *
    * Scale shape (restructured r14 after the 12×-DuckDB flag): ONE
    * tokenize+hash pass pre-aggregates to (doc, bucket, cnt) — every
    * downstream exchange carries one row per doc-bucket pair, never
    * per token. The ≤ B-row bucket model is a window over b on that
    * pre-agg (a separate aggregate branch would re-execute the
    * tokenize lineage — Spark recomputes DAG branches); the 2-number
    * global totals come from a split-count-only scan that skips md5
    * and explode entirely. Measured at sf0.1: 1.52 → 0.69 s, output
    * bit-identical. The remaining floor is the explode+md5 of the
    * full token stream itself (0.28 s measured alone). Selection
    * composes downstream: rank `avg_lw_micro` through GroupedTopK
    * (resampling-by-weight without RNG state), like
    * [[stratifiedSample]].
    *
    * Docs with no tokens yield no rows (no weight evidence either
    * way); docs with NULL source count as raw-only, never target. */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String],
                  buckets: Int): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val isTarget = col("source").isin(targetSources.map(x => x: Any): _*)
    val toksCol = graft.operators.TextAnalysis.tokens(col("text"))
    // Bucket assignment: pmod(hash60, B). For power-of-two B the mod
    // depends only on the trailing ⌈log₁₆B⌉ hex chars of the md5
    // window, so convert just those (conv of a 15-char string was the
    // single hottest expression in the r13 profile: 0.36 → 0.28 s/pass
    // at sf0.1). Pure number theory — B | 16^k makes the higher hex
    // digits ≡ 0 (mod B) — so the bucket ids are bit-identical to the
    // general path (spec-pinned) and the DuckDB oracle needs no change.
    val b = {
      val m = java.lang.Long.numberOfTrailingZeros(buckets.toLong)
      if ((buckets & (buckets - 1)) == 0 && m <= 60) {
        val k = (m + 3) / 4
        pmod(conv(substring(md5(col("t")), 16 - k, k), 16, 10).cast("long"),
          lit(buckets.toLong))
      } else pmod(Dedup.hash60(col("t")), lit(buckets.toLong))
    }
    // ONE tokenize+hash pass, pre-aggregated to (doc, bucket) counts —
    // the r13 shape tokenized twice (model branch + scoring branch) and
    // carried one row PER TOKEN through the model join and the per-doc
    // shuffle; this carries one row per (doc, bucket) with a count.
    val db = docs
      .select(col("doc_id"), isTarget.as("__tgt"), explode(toksCol).as("t"))
      .select(col("doc_id"), col("__tgt"), b.as("b"))
      .groupBy("doc_id", "__tgt", "b").agg(count(lit(1)).as("cnt"))
    // Global totals from a split-count-only scan (no md5, no explode) —
    // the cheap half of tokenization; this is what lets the scoring
    // side be a single hashed pass instead of two.
    val totals = docs
      .select(size(toksCol).as("n"), isTarget.as("__tgt"))
      .agg(sum("n").as("nr"),
        sum(when(col("__tgt"), col("n")).otherwise(0L)).as("nt"))
    // The ≤ B-row bucket model rides a WINDOW over b instead of a
    // separate aggregate branch: a branch would recompute the tokenize
    // pass (Spark DAG branches re-execute their lineage), a window is
    // one exchange on b with an unbounded frame.
    val wb = Window.partitionBy("b")
    val lw = floor(log(
      ((col("ct") + 1L).cast("double") * (col("nr") + buckets).cast("double")) /
        ((col("cr") + 1L).cast("double") * (col("nt") + buckets).cast("double")))
      * 1000000.0).cast("long")
    db
      .withColumn("cr", sum("cnt").over(wb))
      .withColumn("ct", sum(when(col("__tgt"), col("cnt")).otherwise(0L)).over(wb))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("cnt"), lw.as("lw"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_tokens"),
        // lw is constant per bucket, so Σ_tokens lw = Σ_buckets cnt·lw.
        sum(col("lw") * col("cnt")).as("sum_lw_micro"),
        // per-token mean ALSO in integer micro-units: floor(sum/n) of the
        // exact-integer doubles — a 6-dp rounded double mean hits .5
        // midpoint ties (sum divisible by n/2) that HALF_UP (Spark,
        // decimal-string) and binary-double rounding (DuckDB) resolve
        // differently; floor of the same IEEE quotient cannot diverge.
        floor(sum(col("lw") * col("cnt")).cast("double") / sum("cnt"))
          .cast("long").as("avg_lw_micro"))
      .orderBy("doc_id")
  }

  /** Systematic PPS sample (q71) — probability-proportional-to-size
    * selection by cumulative weight: lay the docs on a [0, Σw) line in
    * doc_id order, drop `n` equally-spaced pins, keep every doc a pin
    * lands in; `n_hits` = pins in the doc's interval (a doc heavier
    * than Σw/n can take several — the Hansen-Hurwitz estimator's
    * multiplicity). This is the sampling stage DSIR-style weights
    * ([[dsirWeights]]) feed: selection probability is proportional to
    * weight, sample size is EXACTLY n (Σ n_hits = n by telescoping),
    * and everything is INTEGER arithmetic — `(cum·n) div Σw` — so the
    * result is a pure function of the data, bit-identical in any
    * engine (the Efraimidis-Spirakis exponential-keys formulation
    * would hinge on cross-engine `ln`/`pow` libm bits; this does not).
    *
    * Scale shape: the global running sum follows [[Scan.globalIndex]]'s
    * two-pass bucket scheme — per-bucket window cumsum + a
    * numBuckets-row prefix-offset frame broadcast back — so there is
    * no single-partition global window. Weights cap at ~9·10¹⁸/n
    * before `cum·n` overflows long — at larger Σw pre-scale the weight
    * column (selection probabilities are scale-invariant). */
  def ppsSample(docs: DataFrame, n: Int, numBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = docs.agg(min("doc_id").as("mn"), max("doc_id").as("mx"),
      sum("n_chars").as("total")).collect()(0)
    if (stats.isNullAt(0)) return docs.select(col("doc_id"), col("n_chars"),
      lit(0L).as("n_hits")).limit(0)
    val (mn, mx, total) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    // the scaladoc's documented limit, ENFORCED: past it `cum * n`
    // overflows long and the sample is silently wrong
    require(n > 0 && total <= Long.MaxValue / n,
      s"sum(n_chars) = $total overflows the cum*n pin arithmetic at n = $n; " +
        "pre-scale the weight column (selection probabilities are scale-invariant)")
    val span = math.max((mx - mn) / numBuckets + 1, 1L)
    val parted = docs.select(col("doc_id"), col("n_chars"),
      ((col("doc_id") - mn) / span).cast("long").as("pid"))
    val localCum = parted.withColumn("local_cum",
      sum("n_chars").over(Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)))
    // per-bucket totals → exclusive prefix offsets (numBuckets rows;
    // the constant partitionBy(lit) suppresses the benign warning)
    val offsets = parted.groupBy("pid").agg(sum("n_chars").as("w"))
      .withColumn("offset", coalesce(
        sum("w").over(Window.partitionBy(lit(0)).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    localCum.join(broadcast(offsets), "pid")
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("n_hits",
        expr(s"(cum * $n) div ${total}L - ((cum - n_chars) * $n) div ${total}L"))
      .where(col("n_hits") > 0)
      .select(col("doc_id"), col("n_chars"), col("n_hits"))
      .orderBy("doc_id")
  }

  /** Temperature-balanced source sampling (q95) — the mT5/XLM-R
    * α-mixing rule at α = 1/2: per-source quotas ∝ √n_s, so
    * over-represented sources down-weight and the long tail keeps
    * presence (at α = 1 sampling is proportional and the head
    * dominates; at α = 0 it's uniform and tiny sources over-train —
    * √ is the published multilingual compromise). Quota arithmetic is
    * exact cross-engine WITHOUT pow(): the milli-precision weight
    * s = ⌊√n · 1000⌋ uses IEEE-correctly-rounded sqrt (identical in
    * both engines, SURVEY §6) with the ×1000/floor exact below 2⁵³,
    * and quotas divide integers: min(n, (B·s) div Σs). Selection
    * within a source is the deterministic [[stratifiedSample]] order
    * (hash60(doc_id), doc_id) — nested samples, reproducible.
    *
    * Scale shape: counts/weights/quotas are O(#sources) rows; the
    * selection window is ONE exchange on source. The window ranks each
    * source fully — with the data-dependent per-source quota, swap in
    * q50's bounded-heap GroupedTopK at k = max quota (collected from
    * the O(sources) quota frame) and post-filter when a 100 TB source
    * would otherwise sort end-to-end. */
  def temperatureSample(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val weighted = counts.withColumn("s",
      floor(sqrt(col("n").cast("double")) * 1000d).cast("long"))
    val total = weighted.agg(sum("s").as("st"))
    val quotas = weighted.crossJoin(broadcast(total))
      .withColumn("quota", least(col("n"), expr(s"(${budget}L * s) div st")))
      .select("source", "quota")
    val keyed = docs.select(col("doc_id"), col("source"),
      Dedup.hash60(col("doc_id").cast("string")).as("sample_key"))
    keyed.join(broadcast(quotas), "source")
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("sample_key", "doc_id")))
      .where(col("rn") <= col("quota"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Per-source weighted reservoir sample (q153) — the
    * Efraimidis-Spirakis exponential-keys scheme (A-ES, 2006): each
    * doc draws key = ln(u)/w with u ~ U(0,1] and w = n_chars, and the
    * k LARGEST keys per source are the sample. P(doc in sample) then
    * follows weighted sampling WITHOUT replacement — heavier docs
    * proportionally likelier — and, unlike [[ppsSample]], the rule
    * needs NO global weight total: selection reads each row once with
    * no normalization pass, which is what makes it the one-pass /
    * streaming-able member of the sampling family (a reservoir can
    * fold new rows forever; PPS must re-cumsum the world).
    *
    * Determinism discipline (SURVEY §6): u is not RNG state but a pure
    * function of the row — a 2³¹ LCG step on doc_id, exact integer
    * arithmetic in any engine — and the one float op ln(u)/w is
    * quantized to 6 dp on BOTH engines before ranking (the q67
    * precedent), with doc_id breaking rounded ties. The sample is a
    * pure function of (data, seed, k).
    *
    * Scale shape: ranking runs through [[graft.plans.GroupedTopK]] —
    * per-partition bounded heaps of k BEFORE the exchange, so the
    * shuffle carries ≤ partitions × sources × k rows and no full-table
    * sort or rank column ever materializes. One pass, one (bounded)
    * exchange, at any corpus size. */
  /** The A-ES ranking key shared by the batch operator and its
    * streaming twin ([[graft.streaming.ReservoirStream]]): round-6
    * quantized ln(u)/w with u a pure LCG function of doc_id —
    * u ∈ (0,1]: LCG step modulo 2^31 (+1 keeps ln finite at 0), all
    * long arithmetic exact below 2^63 for doc_id up to ~8.3e9. */
  private[graft] def aesKey(seed: Long): org.apache.spark.sql.Column = {
    val lcg = (col("doc_id") * lit(1103515245L) + lit(seed)) % lit(2147483648L)
    val u = (lcg + lit(1L)).cast("double") / lit(2147483649.0)
    round(log(u) / col("n_chars").cast("double"), 6)
  }

  def weightedReservoir(docs: DataFrame, k: Int, seed: Long = 2026L): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val keyed = docs.where(col("n_chars") > 0).select(
      col("doc_id"), col("source"), col("n_chars"), aesKey(seed).as("skey"))
    graft.plans.GroupedTopK.topK(keyed, Seq(col("source")),
        Seq(col("skey").desc, col("doc_id").asc), k)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("source", "doc_id")
  }

  /** Cluster-balanced embedding sample (q156): cap the corpus at `cap`
    * vectors PER IVF CELL, selected by a deterministic per-row hash rank.
    * The diversity-preserving subsampler a training pipeline runs before
    * an expensive downstream stage (SemDeDup, hard-negative mining,
    * human eval): a uniform sample keeps the corpus's cluster imbalance
    * — dense regions dominate, sparse clusters can vanish entirely —
    * while a per-cell cap keeps EVERY region represented at bounded
    * cost (the "cluster-balanced" half of DoReMi/D4-era data-diet
    * recipes).
    *
    * Scale shape: the assignment is [[Ivf.assign]]'s zero-shuffle
    * codegen argmin over broadcast centroids, and the per-cell cap runs
    * through [[graft.plans.GroupedTopK]] bounded heaps — the only
    * exchange carries ≤ partitions × cells × cap rows. No window sort,
    * no per-cell collect, at any corpus size. Determinism: the rank key
    * is the 60-bit md5 of the vec_id ([[Dedup.hash60]] — exactly
    * mirrorable in the oracle), tie-broken by vec_id; the sample is a
    * pure function of the data. */
  def clusterBalancedSample(vectors: DataFrame, step: Int, cap: Int): DataFrame = {
    require(cap > 0, s"per-cell cap must be positive, got $cap")
    val assigned = Ivf.assign(vectors, Ivf.centroids(vectors, step))
      .withColumn("rk", Dedup.hash60(col("vec_id").cast("string")))
    graft.plans.GroupedTopK.topK(assigned, Seq(col("centroid_id")),
        Seq(col("rk").asc, col("vec_id").asc), cap)
      .select(col("centroid_id"), col("vec_id"), col("dist"))
      .orderBy("centroid_id", "vec_id")
  }

  /** Farthest-first (Gonzalez 1985) k-center picks over an in-memory
    * point set: seed at the smallest vec_id, then repeatedly take the
    * point with the MAXIMUM distance to its nearest already-chosen
    * center (ties to the smallest vec_id). Squared L2 throughout —
    * monotone in true distance, so the pick sequence is identical and
    * no sqrt runs in the O(k·n) loop. Deterministic: no RNG anywhere;
    * the result is a pure function of the (id, vector) multiset. */
  private[operators] def farthestFirst(
      pts: Array[(Long, Array[Float])], k: Int): Array[(Long, Array[Float])] = {
    if (pts.isEmpty || k <= 0) return Array.empty
    val n = pts.length
    val picks = new Array[Int](math.min(k, n))
    // nearest-chosen-center distance per point, maintained incrementally
    val minD = Array.fill(n)(Double.MaxValue)
    var seed = 0
    var i = 1
    while (i < n) { if (pts(i)._1 < pts(seed)._1) seed = i; i += 1 }
    picks(0) = seed
    var p = 1
    while (p < picks.length) {
      val c = pts(picks(p - 1))._2
      var best = -1
      i = 0
      while (i < n) {
        val v = pts(i)._2
        var d = 0.0
        var j = 0
        val m = math.min(v.length, c.length)
        while (j < m) {
          val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1
        }
        if (d < minD(i)) minD(i) = d
        if (minD(i) > 0.0 &&
            (best < 0 || minD(i) > minD(best) ||
             (minD(i) == minD(best) && pts(i)._1 < pts(best)._1)))
          best = i
        i += 1
      }
      if (best < 0) return picks.take(p).map(pts) // all remaining coincide with a center
      picks(p) = best
      minD(best) = 0.0
      p += 1
    }
    picks.map(pts)
  }

  /** q229: k-center coreset selection — the farthest-first coverage
    * complement of the DENSITY-respecting samplers above: where
    * stratified/PPS/temperature sampling draw proportionally (and so
    * starve sparse regions), k-center greedy MAXIMIZES coverage — every
    * corpus point ends within the returned radius of some pick — which
    * is the active-learning / dataset-distillation selection rule
    * (coreset literature: Sener & Savarese 2018 select exactly this
    * way) and the 2-approximation of the optimal k-center cover
    * (Gonzalez 1985).
    *
    * The greedy is inherently sequential (pick i depends on picks
    * 1..i-1), so the distributed shape is the COMPOSABLE-CORESET
    * two-round pattern (Indyk et al. 2014): (1) every partition runs
    * farthest-first locally over its own rows — one `mapPartitions`,
    * zero shuffles, O(k·|part|) work, k·dim state — emitting k local
    * picks; (2) the ≤ partitions·k candidates (KB-scale at any corpus
    * size: 1000 executors × k=32 × 64 floats ≈ 8 MB) reduce by the
    * SAME rule on the driver; (3) one broadcast argmin pass
    * ([[graft.functions.NearestCentroid]], codegen'd, zero shuffles —
    * the IVF-assignment kernel) assigns every point to its pick and
    * folds per-pick occupancy + radius in map-side partials. Composing
    * greedy-over-greedy-picks keeps the coverage guarantee to a
    * constant factor of the one-machine greedy (the composable-coreset
    * bound); CoresetSpec pins single-partition ≡ driver-exact and the
    * multi-partition radius within that constant.
    *
    * Output: one row per pick in pick order — pick, vec_id, label,
    * n_assigned (argmin occupancy, ties to earlier pick via smaller
    * centroid id), sum_d2_micro / max_d2_micro (floor(1e6·round6(‖x−c‖²))
    * per point, exact-integer folds; max over ALL rows = the cover
    * radius²). Rows-only key: the k-step greedy is not expressible as
    * one SQL statement. */
  def kCenterCoreset(vectors: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    val pts = vectors.select(col("vec_id").cast("long"),
      col("embedding").cast("array<float>"))
    // round 1: per-partition farthest-first, zero shuffles
    val cand = pts.as[(Long, Array[Float])]
      .mapPartitions(it => farthestFirst(it.toArray, k).iterator)
      .collect()
    // round 2: the same rule over the candidate union; sort first so
    // the reduce is independent of partition arrival order (the rule
    // itself only reads (id, vector), but keep the input canonical)
    val centers = farthestFirst(cand.sortBy(_._1), k)
    val cs = graft.functions.CentroidSet(
      centers.indices.map(_.toLong).toArray,
      centers.map(_._2.map(_.toDouble)))
    val pickId = centers.map(_._1).zipWithIndex
      .map { case (id, p) => (p.toLong, id) }.toSeq
      .toDF("pick", "vec_id")
    // round 3: broadcast argmin assignment + exact-integer radius folds
    import org.apache.spark.sql.graftbridge.SqlBridge
    val nearest = SqlBridge.column(graft.functions.NearestCentroid(
      SqlBridge.expression(col("embedding").cast("array<float>")),
      spark.sparkContext.broadcast(cs)))
    val d2Micro = floor(col("a.dist") * 1000000.0).cast("long")
    val cells = vectors.select(col("vec_id"), nearest.as("a"))
      .where(col("a").isNotNull)
      .select(col("a.centroid_id").as("pick"), d2Micro.as("d2"))
      .groupBy("pick")
      .agg(count(lit(1)).as("n_assigned"),
        sum("d2").as("sum_d2_micro"),
        max("d2").as("max_d2_micro"))
      .join(broadcast(pickId), Seq("pick"))
    // label lookup: the k-row side broadcasts, the corpus side streams
    vectors.select(col("vec_id"), col("label"))
      .join(broadcast(cells), Seq("vec_id"))
      .select(col("pick"), col("vec_id"), col("label"),
        col("n_assigned"), col("sum_d2_micro"), col("max_d2_micro"))
      .orderBy("pick")
  }
}
