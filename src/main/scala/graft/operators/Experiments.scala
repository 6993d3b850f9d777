package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment readouts over the events stream — the A/B-test analysis
  * face of the engine.
  *
  * CUPED (Controlled-experiment Using Pre-Experiment Data; Deng,
  * Xu, Kohavi & Walker, WSDM 2013): reduce the variance of a treatment
  * metric by regressing out a pre-period covariate. With `y` the
  * post-period outcome and `x` the pre-period value of the SAME metric,
  * the adjusted outcome `y' = y − θ(x − x̄)` with `θ = cov(x,y)/var(x)`
  * has variance `var(y)(1 − ρ²)` — the industry-standard ~30-50%
  * sensitivity win — without biasing the arm delta (θ is POOLED across
  * arms; arm assignment is independent of pre-period behavior).
  *
  * Exactness: per-row cents quantization BEFORE any sum, so every
  * moment (Σx, Σy, Σxy, Σx², Σy²) is exact integer arithmetic
  * (DECIMAL(38) for the cross moments — a user's cents-sum squared
  * overflows a long at large SF); θ and the means are then deterministic
  * double arithmetic over exact scalars — the same numbers any engine
  * computes from the same sums, which is what makes the readout
  * hash-comparable against the DuckDB oracle.
  *
  * Scale shape: one hash exchange to the per-user frame (the natural
  * experiment grain), then a 1-row pooled-moments aggregate broadcast
  * back over the 2-row arm aggregate. No window, no self-join; the
  * per-user frame is the only thing that grows with data. */
object Experiments {

  /** q202: per-arm CUPED readout. Users are split by `user_id % 2`
    * (a deterministic hash stand-in both engines can state); the
    * pre/post pivot is the midpoint epoch-day of the corpus. Output:
    * one row per arm with raw and CUPED-adjusted means (dollars,
    * round 6), pooled θ, and the pooled ρ² variance-reduction dial. */
  def cupedReadout(events: DataFrame): DataFrame = {
    val spark = events.sparkSession

    val base = events.select(
      col("user_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      expr("unix_timestamp(ts) div 86400").as("day"))

    // Midpoint pivot from the corpus's own day range — a 1-row agg
    // broadcast into the scan (no driver round-trip in the plan).
    val pivot = base.agg(
      expr("(min(day) + max(day) + 1) div 2").as("cutday"))

    val perUser = base.crossJoin(broadcast(pivot))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("day") < col("cutday"), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("cutday"), col("cents")).otherwise(0L)).as("y"))
      .select(
        pmod(col("user_id"), lit(2L)).as("arm"),
        col("x"), col("y"))

    // Pooled exact moments (cross moments in DECIMAL(38): cents² per
    // user can pass 2⁶³ at large SF).
    val pooled = perUser.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"),
      sum("y").as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))

    perUser
      .groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n_users"),
        sum("x").as("sxa"),
        sum("y").as("sya"))
      .crossJoin(broadcast(pooled))
      .select(
        col("arm"), col("n_users"),
        round(col("sya") / (lit(100.0) * col("n_users")), 6).as("mean_y"),
        round(
          (col("sya") - cupedTheta *
            (col("sxa") - col("n_users") * (col("sx").cast("double") / col("n"))))
            / (lit(100.0) * col("n_users")), 6).as("mean_y_cuped"),
        round(cupedTheta, 6).as("theta"),
        round(pooledRho2, 6).as("var_reduction"))
      .orderBy("arm")
  }

  /** q209: two-proportion z-test on conversion between the same arms
    * as [[cupedReadout]] — the significance readout next to the
    * variance-reduced means: pooled p̂ = (c₀+c₁)/(n₀+n₁), z =
    * (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁)). Counts are exact integers (one
    * user-grain aggregate + a 2-row rollup); the z statistic is one
    * deterministic double expression over them, mirrored verbatim in
    * the oracle. One row: counts, rates, z, and the |z| > 1.96 flag. */
  def conversionZTest(events: DataFrame, convType: String): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === convType).cast("long")).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("conv"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val a0 = arms.where(col("arm") === 0)
      .select(col("n").as("n_0"), col("c").as("conv_0"))
    val a1 = arms.where(col("arm") === 1)
      .select(col("n").as("n_1"), col("c").as("conv_1"))
    val p0 = col("conv_0").cast("double") / col("n_0")
    val p1 = col("conv_1").cast("double") / col("n_1")
    val pPool = (col("conv_0") + col("conv_1")).cast("double") /
      (col("n_0") + col("n_1"))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_0") + lit(1.0) / col("n_1")))
    val z = when(se === 0.0, lit(0.0)).otherwise((p1 - p0) / se)
    a0.crossJoin(broadcast(a1))
      .select(
        col("n_0"), col("conv_0"), col("n_1"), col("conv_1"),
        round(p0, 6).as("rate_0"), round(p1, 6).as("rate_1"),
        round(z, 6).as("z"),
        (abs(z) > 1.959964).cast("int").as("significant"))
  }

  /** q214: mixture sequential probability ratio test (mSPRT) over the
    * same arms as [[conversionZTest]] — the ALWAYS-VALID significance
    * readout (Johari, Koomen, Pekelis & Walsh, KDD 2017): one row per
    * calendar-day "look" with a p-value that is valid UNDER CONTINUOUS
    * MONITORING. The fixed-horizon z-test's p is only honest if the
    * sample size was fixed in advance; a dashboard that refreshes daily
    * and stops at the first z > 1.96 inflates false positives several-
    * fold. The mSPRT's normal-mixture likelihood ratio
    * `Λ_t = √(V/(V+τ²)) · exp(θ̂²τ² / (2V(V+τ²)))` yields
    * `p_t = min_{s≤t} min(1, 1/Λ_s)` — a supermartingale bound, so
    * P(ever significant | no effect) ≤ α no matter how often you peek.
    *
    * Looks: users ENTER the experiment at their first event day and
    * count as converted from their first `convType` day. Cumulative
    * n/c per (arm, day) come from two tiny day-grain histograms under
    * running-sum windows — the per-user frame (one hash exchange) is
    * the only thing that grows with data; the look frame is bounded by
    * CALENDAR DAYS × 2 arms regardless of SF, so the single-partition
    * running-min window over looks is metadata-sized by construction
    * (the q211 offset-frame argument).
    *
    * Determinism: counts are exact integers; θ̂/V/Λ are one closed-form
    * double expression over them, mirrored verbatim in the oracle
    * (the q208 exp/ln precedent), rounded at 6dp after the running
    * min. V=0 or an empty arm contributes Λ=1 (no evidence). */
  def sequentialReadout(events: DataFrame, convType: String,
      tau: Double, alpha: Double): DataFrame = {
    val base = events.select(
      col("user_id"),
      expr("unix_timestamp(ts) div 86400").as("day"),
      col("event_type"))

    val perUser = base.groupBy("user_id").agg(
        min("day").as("first_day"),
        min(when(col("event_type") === convType, col("day"))).as("conv_day"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
        col("first_day"), col("conv_day"))

    // look frame: every corpus day × both arms (bounded by calendar)
    val looks = base.select("day").distinct()
      .select(col("day"), explode(array(lit(0L), lit(1L))).as("arm"))

    val enters = perUser.groupBy(col("arm"), col("first_day").as("day"))
      .agg(count(lit(1)).as("e"))
    val convs = perUser.where(col("conv_day").isNotNull)
      .groupBy(col("arm"), col("conv_day").as("day"))
      .agg(count(lit(1)).as("cv"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("arm").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = looks
      .join(enters, Seq("arm", "day"), "left")
      .join(convs, Seq("arm", "day"), "left")
      .select(col("arm"), col("day"),
        sum(coalesce(col("e"), lit(0L))).over(w).as("n"),
        sum(coalesce(col("cv"), lit(0L))).over(w).as("c"))

    val byDay = cum.groupBy("day").agg(
      max(when(col("arm") === 0, col("n"))).as("n_0"),
      max(when(col("arm") === 0, col("c"))).as("conv_0"),
      max(when(col("arm") === 1, col("n"))).as("n_1"),
      max(when(col("arm") === 1, col("c"))).as("conv_1"))

    val p0 = col("conv_0").cast("double") / col("n_0")
    val p1 = col("conv_1").cast("double") / col("n_1")
    val pp = (col("conv_0") + col("conv_1")).cast("double") /
      (col("n_0") + col("n_1"))
    val v = pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_0") + lit(1.0) / col("n_1"))
    val t2 = lit(tau * tau)
    // 1/Λ directly (underflows to 0 for huge evidence — never overflows)
    val invLam = sqrt((v + t2) / v) *
      exp(lit(-1.0) * (p1 - p0) * (p1 - p0) * t2 /
        (lit(2.0) * v * (v + t2)))
    val pLook = when(col("n_0") === 0 || col("n_1") === 0 || v === 0.0,
      lit(1.0)).otherwise(least(lit(1.0), invLam))

    // always-valid p: running min over looks (bounded frame, see above)
    val wRun = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byDay
      .select(col("day"), col("n_0"), col("conv_0"), col("n_1"), col("conv_1"),
        round(when(col("n_0") === 0, lit(0.0)).otherwise(p0), 6).as("rate_0"),
        round(when(col("n_1") === 0, lit(0.0)).otherwise(p1), 6).as("rate_1"),
        min(pLook).over(wRun).as("p_run"))
      .select(col("day"), col("n_0"), col("conv_0"), col("n_1"), col("conv_1"),
        col("rate_0"), col("rate_1"),
        round(col("p_run"), 6).as("p_always_valid"),
        (col("p_run") <= alpha).cast("int").as("significant"))
      .orderBy("day")
  }

  /** θ = cov(x,y)/var(x) from exact pooled moments (0 when var(x)=0). */
  private def cupedTheta =
    when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(0.0))
      .otherwise(
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))

  /** ρ² = cov²/(var(x)·var(y)) — the fraction of outcome variance the
    * covariate removes (0 when either variance is 0). */
  private def pooledRho2 = {
    val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vxN = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vyN = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    when(vxN === 0.0 || vyN === 0.0, lit(0.0))
      .otherwise(covN * covN / (vxN * vyN))
  }
}
