package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max —
  * the "describe my lake table" operator every engine grows once data
  * outnumbers its documentation (the schema half of this is
  * [[Metadata]]'s footer walk; this is the VALUE half).
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's statistics together (map-side partial aggs; the shuffle
  * carries one partial-state row per task), then the single result row
  * unpivots into one output row per column — a driver-sized explode of
  * a 1-row frame, not a data operation. Exact multi-column distinct
  * counts make Catalyst plan an Expand (input rows × #profiled
  * columns before partial aggregation); that is the price of EXACT
  * profiling and is how SQL engines execute multi-distinct anyway. At
  * 100 TB one would flip `n_distinct` to `approx_count_distinct` (HLL,
  * no Expand) — kept exact here so the DuckDB oracle can verify
  * bit-for-bit.
  *
  * min/max are rendered through CAST(... AS STRING) so every column
  * type shares one output schema; profiled columns here are
  * integer/string (engine-identical rendering — float rendering
  * differs per engine and would need a decimal cast first).
  */
object Profile {

  /** Profile `cols` of `df`: one row per column with n_rows, n_nulls,
    * n_distinct (exact, null-excluded), min/max as strings. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            countDistinct(col(c)).as(s"__dist_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        }
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(rows).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Per-group EXACT discrete percentiles of an integer column (q56):
    * for percent q, the value at 1-based rank ((n-1)·q) div 100 + 1 of
    * the group's sorted non-null values — all-integer rank arithmetic,
    * so Spark and any SQL oracle agree bit-for-bit.
    *
    * Scale shape: NOT a per-group sort of the data. Pass 1 collapses to
    * a (group, value) histogram — map-side partial agg, the exchange
    * carries distinct (group, value) pairs, not rows. Pass 2 windows
    * over the distinct VALUES per group (cardinality = distinct values,
    * data-independent for bounded domains like lengths/scores) to get
    * each value's cumulative rank range [hi−c+1, hi], then one
    * partial-agg groupBy picks the value whose range covers each target
    * rank. 100 TB of docs with ~10⁴ distinct lengths windows over 10⁴
    * rows per source. For unbounded/continuous domains, flip to
    * [[percentilesApprox]] (t-digest-style sketch, no window at all).
    */
  def percentiles(df: DataFrame, groupCol: String, valCol: String,
                  qs: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100), s"bad percents: $qs")
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__hi", sum("__c").over(
        Window.partitionBy(groupCol).orderBy("__v")))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    val rank = (q: Int) => expr(s"((__n - 1) * $q) DIV 100 + 1")
    val qcols = qs.map { q =>
      max(when(col("__hi") - col("__c") < rank(q) && rank(q) <= col("__hi"),
        col("__v"))).as(s"p$q")
    }
    cum.groupBy(groupCol)
      .agg(max("__n").cast("long").as("n_values"), qcols: _*)
      .orderBy(groupCol)
  }

  /** Production twin of [[percentiles]] for unbounded domains:
    * `approx_percentile` is a mergeable sketch (partial-agg shaped, one
    * exchange of per-task sketches, no window, no histogram), trading
    * exactness for scale-independence. Spec-checked against the exact
    * operator within the sketch's accuracy contract. */
  def percentilesApprox(df: DataFrame, groupCol: String, valCol: String,
                        qs: Seq[Int], accuracy: Int = 10000): DataFrame = {
    val fracs = array(qs.map(q => lit(q / 100.0)): _*)
    df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_values"),
        percentile_approx(col(valCol), fracs, lit(accuracy)).as("__ps"))
      .select(col(groupCol) +: col("n_values") +:
        qs.zipWithIndex.map { case (q, i) => col("__ps")(i).as(s"p$q") }: _*)
      .orderBy(groupCol)
  }

  /** Per-group REPRODUCIBLE approximate percentiles (q212) off the
    * [[graft.functions.QuantileSample]] bottom-k-by-hash sample — the
    * third point on the percentile trade surface:
    *
    *  - [[percentiles]] (q56): EXACT, but exchanges every distinct
    *    value — the audit path;
    *  - [[percentilesApprox]]: Spark's GK-summary sketch — one partial
    *    agg exchange, tight rank error, but merge-ORDER dependent
    *    (shuffle nondeterminism can change the answer between runs);
    *  - THIS: one partial-agg exchange of O(k) state, rank error
    *    O(√(q(1−q)/k)), and the output is a pure function of the input
    *    SET — bit-identical across partitionings and reruns, exact for
    *    groups with ≤ k rows. The path a diffable nightly profile
    *    wants: regressions are real changes, never shuffle noise.
    *
    * Output matches [[percentilesApprox]]'s shape plus n_sample. */
  def sketchQuantiles(df: DataFrame, groupCol: String, valCol: String,
                      idCol: String, k: Int, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100), s"bad percents: $qs")
    import graft.functions.QuantileSample.quantileSample
    df.where(col(valCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_values"),
        quantileSample(col(idCol).cast("long"), col(valCol).cast("double"), k).as("__s"))
      .select(col(groupCol) +: col("n_values") +:
        size(col("__s")).cast("long").as("n_sample") +:
        qs.map { q =>
          // nearest-rank on the sorted sample: 0-based floor(q(m-1)/100)
          element_at(col("__s"),
            (floor(lit(q) * (size(col("__s")) - 1) / lit(100.0)) + 1).cast("int"))
            .as(s"p$q")
        }: _*)
      .orderBy(groupCol)
  }

  /** Per-group POSITIONAL decile profile (q80): ntile(b) over the
    * group's rows ordered (value, id), then per-bucket count/min/max/
    * mean — the distribution fingerprint curation dashboards plot per
    * language. Positional ntile (equal ROW counts per bucket, ties may
    * straddle a boundary) complements [[percentiles]]' value-based
    * ranks; the (value, id) compound order makes the straddle
    * deterministic, so both engines cut identically.
    *
    * Scale shape: one exchange on the group key feeds the window; the
    * SQL-standard ntile needs each group's rows ordered in one
    * partition, which holds while a single group's rows fit one
    * executor (languages at 100 TB do not — flip to [[percentiles]]'
    * histogram ranks or bucket by a q08-style two-pass cumsum count
    * when a group outgrows a partition). The bucket aggregate is
    * map-side partial onto groups×b cells; the mean divides two exact
    * integers. */
  def valueDeciles(df: DataFrame, groupCol: String, valCol: String,
                   idCol: String, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    df.where(col(valCol).isNotNull)
      .withColumn("decile", ntile(nBuckets).over(w))
      .groupBy(col(groupCol), col("decile"))
      .agg(
        count(lit(1)).as("n_values"),
        min(col(valCol)).as("min_value"),
        max(col(valCol)).as("max_value"),
        round(sum(col(valCol)).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_value"))
      .orderBy(col(groupCol), col("decile"))
  }

  /** Winsorized robust statistics (q89): per-group mean of `valCol`
    * with values clamped to the group's exact [loPermille, hiPermille]
    * order statistics — the outlier-robust length/score audit a
    * curation dashboard shows next to the raw mean (one 10⁹-char
    * pathological doc moves a raw mean arbitrarily; it moves the
    * winsorized mean by one clamped addend). Thresholds are EXACT
    * discrete order statistics from [[percentiles]]' (group, value)
    * histogram scheme: rank k = ⌈n·p/1000⌉ in pure integer arithmetic
    * (`(n·p + 999) div 1000`), the value = the smallest v whose
    * cumulative count reaches k — no interpolation, no float until the
    * final rounded means.
    *
    * Scale shape: one (group, value)-histogram exchange (O(distinct
    * values), the [[percentiles]] shape), a cumulative window over
    * per-group DISTINCT values (bounded by the value domain, not row
    * count), then the clamp pass re-joins an O(groups)-row bounds
    * frame by broadcast — the raw stream is touched twice, shuffled
    * on value-histogram keys once. */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
                      loPermille: Int, hiPermille: Int): DataFrame = {
    require(0 <= loPermille && loPermille < hiPermille && hiPermille <= 1000,
      s"need 0 <= lo < hi <= 1000, got $loPermille/$hiPermille")
    import org.apache.spark.sql.expressions.Window
    val h = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = h
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val bounds = cum
      .withColumn("klo", expr(s"(n * ${loPermille}L + 999) div 1000"))
      .withColumn("khi", expr(s"(n * ${hiPermille}L + 999) div 1000"))
      .groupBy("g")
      .agg(min(when(col("cum") >= col("klo"), col("v"))).as("lo_value"),
        min(when(col("cum") >= col("khi"), col("v"))).as("hi_value"))
    df.where(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).as("v"))
      .join(broadcast(bounds), "g")
      .withColumn("wv", greatest(least(col("v"), col("hi_value")), col("lo_value")))
      .groupBy("g")
      .agg(count(lit(1)).as("n_values"),
        min("lo_value").as("lo_value"), min("hi_value").as("hi_value"),
        round(sum("v").cast("double") / count(lit(1)), 6).as("mean_value"),
        round(sum("wv").cast("double") / count(lit(1)), 6).as("winsorized_mean"))
      .select(col("g").as(groupCol), col("n_values"), col("lo_value"),
        col("hi_value"), col("mean_value"), col("winsorized_mean"))
      .orderBy(groupCol)
  }

  /** Percentile normalization (q93): every row's value mapped to its
    * percent rank within its group — the scale-free calibration step
    * before mixing scores from different scorers or corpora (a
    * "keep the top 30 %" threshold transfers across sources; a
    * raw-score threshold doesn't — the CCNet/DSIR mixing literature
    * normalizes exactly this way before thresholding). The rank
    * orders (value, id) so ties are deterministic cross-engine;
    * percent_rank = (rank−1)/(n−1) divides two exact integers and
    * rounds at emission. One exchange on the group key — the
    * sessionize/decile window shape. */
  def percentileNormalize(df: DataFrame, groupCol: String, valCol: String,
                          idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    df.where(col(valCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valCol))
      .withColumn("pct", round(percent_rank().over(w), 6))
      .orderBy(idCol)
  }

  /** Per-group simple linear regression (q100): least-squares slope /
    * intercept / r² of y on x from the five classical sums — the
    * trend-fitting audit ("does length predict token count, and did
    * that relationship drift per source?"). Both inputs here are
    * INTEGERS, so Σx, Σy, Σxy, Σx², Σy² are exact 64-bit sums
    * (order-free at any partitioning) and the closed forms
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * divide exact integers in double once at emission, identically
    * associated in the oracle. Headroom: n·Σxy < 2⁶³ holds to ~10⁶
    * rows PER GROUP at these magnitudes (xy ≈ 6·10⁵) — 20× the sf1
    * corpus; past that, center x and y first (the standard two-pass)
    * or switch the moment sums to DECIMAL.
    *
    * Scale shape: ONE map-side-partial aggregation to O(groups) rows;
    * nothing else. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col(groupCol), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"),
        round((col("sy").cast("double") -
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("r2"))
      .orderBy(groupCol)
  }

  /** Per-group LOWER MEDIAN via the (group, value)-histogram rank
    * scheme: rank ⌈n/2⌉ = `(n+1) div 2`, value = smallest v whose
    * cumulative count reaches it. The lower-median convention (no
    * midpoint averaging on even n) keeps every quantity INTEGER —
    * which is what makes [[madOutliers]] exact cross-engine. */
  private def lowerMedians(vals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = vals.groupBy("g", "v").agg(count(lit(1)).as("c"))
    h.withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
      .withColumn("kmed", expr("(n + 1) div 2"))
      .groupBy("g")
      .agg(min(when(col("cum") >= col("kmed"), col("v"))).as("med"))
  }

  /** MAD outlier report (q90): per-group median, median absolute
    * deviation, and the count of values beyond `kNum`×MAD — the
    * robust-dispersion companion to [[winsorizedStats]] (a z-score
    * gate's mean AND stddev both move with the outliers it hunts; the
    * median/MAD pair moves with neither). Lower-median convention
    * throughout, so median, MAD, deviations and the `|v − med| >
    * k·MAD` gate are all pure 64-bit integers — no float anywhere in
    * the operator.
    *
    * Scale shape: two rounds of the (group, value)-histogram exchange
    * (values, then deviations — O(distinct values) each, the
    * [[percentiles]] shape), each median broadcast back as an
    * O(groups)-row frame; the final pass is one partial-agg rollup per
    * group. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  kNum: Int): DataFrame = {
    require(kNum >= 1, s"kNum must be >= 1, got $kNum")
    val vals = df.where(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("v"))
    val med = lowerMedians(vals)
    val dev = vals.join(broadcast(med), "g")
      .withColumn("d", abs(col("v") - col("med")))
    val mad = lowerMedians(dev.select(col("g"), col("d").as("v")))
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n_values"),
        min("med").as("median"), min("mad").as("mad"),
        sum(when(col("d") > col("mad") * kNum, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g").as(groupCol), col("n_values"), col("median"),
        col("mad"), col("n_outliers"))
      .orderBy(groupCol)
  }

  /** Token-distribution drift report (q86): the terms whose frequency
    * differs most between two corpus slices, ranked by the two-sample
    * χ² cell statistic — the distribution-shift audit a training
    * pipeline runs between crawls / sources / snapshots before mixing
    * them (a new crawl whose top drift terms are boilerplate markers
    * is a scraper regression, not new content).
    *
    * Per shared-vocabulary term with counts (c₁, c₂) against slice
    * totals (N₁, N₂):  `d = c₁·N₂ − c₂·N₁` (exact 64-bit integer —
    * the cross-product form avoids any frequency ratio in float), and
    * the χ² cell is d²/(N₁·N₂·(c₁+c₂)), evaluated in double from
    * those exact integers with one fixed association and rounded at
    * emission. Terms absent from one slice count 0 there (absence IS
    * drift). The `minCount` gate drops the sub-noise tail, which also
    * caps the ranked set.
    *
    * Scale shape: one (slice, term) partial-agg exchange (O(distinct
    * terms), like [[graft.operators.Analytics.vocabStats]]); the
    * full-outer term alignment joins the two count frames on the SAME
    * term-hashed partitioning (no extra exchange under AQE reuse);
    * slice totals are a 2-row broadcast. Top-n is
    * TakeOrderedAndProject. */
  def tokenDrift(docs: DataFrame, sliceCol: String, sliceA: String,
                 sliceB: String, minCount: Int, topN: Int): DataFrame = {
    val tf = docs
      .where(col(sliceCol).isin(sliceA, sliceB))
      .select(col(sliceCol).as("slice"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("slice", "term").agg(count(lit(1)).as("c"))
    val a = tf.where(col("slice") === sliceA).select(col("term"), col("c").as("c1"))
    val b = tf.where(col("slice") === sliceB).select(col("term"), col("c").as("c2"))
    val totals = tf.groupBy("slice").agg(sum("c").as("n"))
    val n1 = totals.where(col("slice") === sliceA).select(col("n").as("n1"))
    val n2 = totals.where(col("slice") === sliceB).select(col("n").as("n2"))
    a.join(b, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .where(col("c1") + col("c2") >= minCount)
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("d", (col("c1") * col("n2") - col("c2") * col("n1"))
        .cast("double"))
      .select(col("term"), col("c1"), col("c2"),
        round((col("d") * col("d")) /
          ((col("n1").cast("double") * col("n2").cast("double")) *
            (col("c1") + col("c2")).cast("double")), 6).as("chi2"))
      .orderBy(desc("chi2"), asc("term"))
      .limit(topN)
  }

  /** Cumulative Poisson(1) CDF at k = 0..5 (e⁻¹·Σ_{j≤k} 1/j!) — the
    * inverse-CDF thresholds for the bootstrap's per-replicate weights.
    * Shared verbatim with the DuckDB oracle (Double.toString round-trips
    * to the identical IEEE value on both engines), so a uniform draw
    * can never land on different weights per engine. Tail above k=6 is
    * ~5.9e-4 — draws there take weight 6. */
  val PoissonCum: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** One-pass Poisson-bootstrap confidence intervals for per-source
    * mean document length (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams" — the Google recipe for
    * CIs when the data cannot be resampled). Classical bootstrap
    * redraws the corpus `reps` times — `reps` full shuffles at 100 TB.
    * The Poisson trick vectorizes ALL replicates into ONE aggregation
    * pass: each row carries `reps` independent Poisson(1) weights
    * (multinomial resampling converges to independent Poissons as
    * n → ∞), so replicate b's "resample" is just the weighted sums
    * Σw_b·x / Σw_b accumulated alongside every other replicate —
    * map-side partial aggregation, one exchange of O(sources × reps)
    * longs, zero extra rows.
    *
    * Determinism/exactness: weights derive from the 60-bit md5 hash of
    * (doc_id, replicate) through the shared [[PoissonCum]] inverse-CDF
    * thresholds — a pure function of the row, so retries, engines and
    * A/B runs agree bit-for-bit ([[CorpusPipeline.corpusShuffle]]'s
    * rand()-would-unshuffle argument). All sums are exact 64-bit;
    * per-replicate means land as `(Σw·x · 10⁶) div Σw` integer
    * micro-units (floor-consistent: both inputs non-negative, SURVEY
    * §6 q54 lesson), and the interval is the least/greatest over the
    * replicate means — integer min/max, no float percentile to
    * disagree about. Headroom: Σw·x ≤ 6·Σchars per source; ×10⁶ stays
    * under 2⁶³ below ~1.5 PB of text per source (beyond that, scale
    * the micro factor down).
    *
    * Sources where ANY replicate draws all-zero weights are dropped
    * (identically on both engines) — with n docs the probability is
    * ≤ reps·e⁻ⁿ, i.e. gone by n ≈ 40. */
  def bootstrapMeans(docs: DataFrame, reps: Int = 32): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps must be in [2, 64], got $reps")
    val two60 = 1152921504606846976d // 2^60, exactly representable
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
    // Step 1: materialize each replicate's uniform draw u_i = h/2^60
    // as its OWN column (one md5 per replicate per row; the CASE chain
    // then references a cheap column, not 7 copies of the hash).
    val withU = (0 until reps).foldLeft(base) { (d, i) =>
      d.withColumn(s"__u$i",
        Dedup.hash60(concat(col("doc_id").cast("string"), lit(s":$i")))
          .cast("double") / lit(two60))
    }
    // Step 2: inverse-CDF the draw into a Poisson(1) weight.
    val withW = (0 until reps).foldLeft(withU) { (d, i) =>
      val w = PoissonCum.zipWithIndex.foldRight(lit(PoissonCum.size): Column) {
        case ((c, k), acc) => when(col(s"__u$i") < c, lit(k)).otherwise(acc)
      }
      d.withColumn(s"__w$i", w.cast("long"))
    }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("__sx")) ++
        (0 until reps).flatMap(i => Seq(
          sum(col(s"__w$i") * col("n_chars")).as(s"__swx$i"),
          sum(col(s"__w$i")).as(s"__sw$i")))
    val repMeans = (0 until reps).map(i => expr(s"(__swx$i * 1000000) div __sw$i"))
    withW.groupBy("source").agg(aggs.head, aggs.tail: _*)
      .where((0 until reps).map(i => col(s"__sw$i") > 0).reduce(_ && _))
      .select(col("source"), col("n_docs"),
        expr("(__sx * 1000000) div n_docs").as("mean_chars_micro"),
        least(repMeans: _*).as("boot_lo_micro"),
        greatest(repMeans: _*).as("boot_hi_micro"))
      .orderBy("source")
  }

  /** Merkle-style order-free range checksums — the anti-entropy
    * primitive behind cross-replica / cross-region table validation
    * (Cassandra repair, DynamoDB global-table verification, lake
    * copy audits): hash every row canonically, bucket rows by key
    * range, and fold each bucket to (n_rows, XOR of row hashes). Two
    * replicas compare O(nBuckets) tiny rows to LOCALIZE drift to the
    * buckets that differ — re-shipping only those key ranges — instead
    * of moving 100 TB to diff it. XOR is order-free and
    * overflow-free (the portable fold: engines disagree on sum
    * widening, never on XOR); the count pairs with it so multiplicity
    * changes of an identical row can't cancel out. A forged collision
    * needs equal counts AND equal 60-bit XOR within one bucket —
    * vanishing for drift detection (this guards against replication
    * bugs, not adversaries).
    *
    * One scan, one nBuckets-group exchange of pre-folded partials;
    * output is O(nBuckets) regardless of table size. The row hash is
    * built from FIXED-WIDTH per-column digests, not a delimited
    * concat: each column hashes to its 32-hex-char md5 first, and the
    * row hash folds the concatenation of those digests. A delimited
    * concat has an aliasing channel — ("a|b","c") vs ("a","b|c")
    * collide, exactly the false-negative a drift detector exists to
    * rule out — while fixed-width fields cannot alias a boundary.
    * NULL takes a 32-char sentinel OUTSIDE the hex alphabet, so no
    * real value's digest (and no string value, e.g. a literal
    * "<NULL>") can collide with it. */
  def checksumRanges(df: DataFrame, key: String, cols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    require(cols.nonEmpty, "at least one checksummed column required")
    val rowStr = concat(
      cols.map(c => coalesce(md5(col(c).cast("string")), lit("*" * 32))): _*)
    df.select(
        pmod(col(key), lit(nBuckets.toLong)).as("bucket"),
        Dedup.hash60(rowStr).as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("__h")).as("checksum"))
      .orderBy("bucket")
  }

  /** Compare two replicas' range checksums: the buckets that differ
    * (present-in-one counts as drift). Each side folds locally to
    * O(nBuckets) rows BEFORE the join — the network never carries
    * data, only checksums. */
  def checksumDiff(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String], nBuckets: Int): DataFrame = {
    val ca = checksumRanges(a, key, cols, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_a", "checksum" -> "checksum_a"))
    val cb = checksumRanges(b, key, cols, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_b", "checksum" -> "checksum_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .where(
        !(col("n_rows_a") <=> col("n_rows_b")) ||
        !(col("checksum_a") <=> col("checksum_b")))
      .orderBy("bucket")
  }

  /** Functional-dependency audit (q201) — the column-relationship leg
    * of data profiling (Huhtala et al., TANE, Comput. J. 1999; every
    * production profiler — Deequ, great_expectations — ships the
    * check): for each candidate `det → dep` pair, does the determinant
    * fix the dependent? An FD holds iff
    * `count(DISTINCT det) == count(DISTINCT (det, dep))`; when it
    * fails, the violation rate is the fraction of determinant groups
    * seeing more than one dependent value — the actionable number (a
    * 0.01% violation rate is a data bug; 60% means the FD was never
    * real).
    *
    * Shape per pair: one partial-aggregated distinct-combo exchange
    * (`groupBy(det, dep)` — map-side combine collapses the mass), then
    * an O(distinct det) rollup. NULLs group as a value (NULL≡NULL),
    * matching SQL `GROUP BY`. Candidate pairs are metadata (a handful),
    * so the union of per-pair plans stays a bounded fan-out of scans —
    * at 100 TB each pair is one pass, embarrassingly parallel across
    * pairs. */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "at least one candidate pair required")
    val reports = pairs.map { case (det, dep) =>
      val combos = df.groupBy(col(det).as("__det"), col(dep).as("__dep"))
        .agg(count(lit(1)).as("__n"))
      combos
        .groupBy(col("__det"))
        .agg(count(lit(1)).as("__deps"))
        .agg(
          lit(det).as("det_col"),
          lit(dep).as("dep_col"),
          count(lit(1)).as("n_det"),
          // coalesce: a global agg over an EMPTY table still returns
          // one row, with NULL sums — an empty table trivially holds
          coalesce(sum("__deps"), lit(0L)).as("n_combos"),
          coalesce(sum(when(col("__deps") > 1, 1L).otherwise(0L)), lit(0L))
            .as("violating_dets"))
        .select(
          col("det_col"), col("dep_col"), col("n_det"), col("n_combos"),
          (col("violating_dets") === 0).cast("int").as("holds"),
          when(col("n_det") === 0, 0L)
            .otherwise(expr("violating_dets * 1000000L div n_det"))
            .as("violation_micro"))
    }
    reports.reduce(_ unionByName _).orderBy("det_col", "dep_col")
  }

  /** q231: stratification-independence audit — Pearson's χ² test of
    * independence over the full contingency grid of two categorical
    * metadata columns (lang × source for the gate corpus). The
    * corpus-curation question it answers: are my strata CONFOUNDED?
    * A language concentrated in one source means per-source mixing
    * weights (q37) silently reweight languages, per-source quality
    * cuts (q59) silently filter a language, and a leave-source-out
    * eval (q230) measures language shift, not source quality. High χ²
    * relative to df = (R−1)(C−1) says the labels are dependent and
    * every per-stratum knob has a hidden second axis.
    *
    * Shape: one (row, col) count pass (map-side partials, grid-sized
    * exchange), two grid-sized rollups for the margins, then the FULL
    * R×C cross grid (absent combinations count 0 — the test is defined
    * on the complete grid) via a crossJoin of two margin frames that
    * are each ≤ distinct-values rows — KB-scale at any corpus size; no
    * second corpus pass, no window.
    *
    * Exactness: o, r, c, N are exact BIGINTs; each cell's χ²
    * contribution uses the integer-cleared form (o·N − r·c)²/(N·r·c) —
    * the numerator difference is computed in EXACT integer arithmetic
    * BEFORE any float touches it (o·N ≤ corpus², within long at any
    * gate sf), then one double division, floor to micro BIGINT, and
    * the total is an order-immune integer sum. expected_micro =
    * floor(r·c·1e6/N) the same way. */
  def strataChiSq(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val obs = df.groupBy(col(rowCol).as("rv"), col(colCol).as("cv"))
      .agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("rv").agg(sum("o").as("r"))
    val colT = obs.groupBy("cv").agg(sum("o").as("c"))
    val n = obs.agg(sum("o").as("n"))
    val grid = rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("rv", "cv"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
    val num = (col("o") * col("n") - col("r") * col("c")).cast("double")
    val cells = grid.select(
      col("rv"), col("cv"), col("o"), col("r"), col("c"),
      floor(col("r").cast("double") * col("c") * 1000000.0 / col("n"))
        .cast("long").as("expected_micro"),
      floor(num * num * 1000000.0 /
        (col("n").cast("double") * col("r") * col("c")))
        .cast("long").as("contrib_micro"))
    val tot = cells.agg(
      sum("contrib_micro").as("chi2_micro"),
      ((countDistinct("rv") - 1) * (countDistinct("cv") - 1)).as("df"))
    cells.crossJoin(broadcast(tot))
      .select(col("rv").as(rowCol), col("cv").as(colCol), col("o").as("obs"),
        col("r").as("row_total"), col("c").as("col_total"),
        col("expected_micro"), col("contrib_micro"),
        col("chi2_micro"), col("df"))
      .orderBy(rowCol, colCol)
  }
}
