package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differentially private aggregate release (q200) — the
  * privacy-budgeted face of the events rollup, completing the
  * compliance story next to PII redaction (q33) and GDPR erasure
  * (q189): counts a data consumer can see WITHOUT any single user's
  * presence being inferable (ε-DP, Dwork et al., TCC 2006).
  *
  * The two pillars, both distributed:
  *  - CONTRIBUTION BOUNDING: a user's events per type are clamped to
  *    `clamp` BEFORE the aggregate (one hash exchange to (user, type)
  *    grain, then `least(n, clamp)`) — without it the sensitivity of a
  *    count is unbounded and no finite noise is private;
  *  - CALIBRATED NOISE: Laplace with scale b = clamp·T/ε (L1
  *    sensitivity of the T-component type-count vector is clamp·T —
  *    one user can appear in every type), sampled by inverse CDF from
  *    a SEEDED uniform (xxhash64 of seed × group → 53-bit mantissa), so
  *    a release is reproducible for audit yet depends on a secret seed
  *    exactly like a production DP deployment's PRNG key. All noise
  *    math is codegen'd expressions — no UDF, no driver data pull.
  *
  *  The release NEVER emits the true count; PrivacySpec pins the
  *  mechanics (determinism under one seed, clamp invariance when a
  *  user floods one type, noise centering across groups) from the
  *  outside. */
object Privacy {

  /** q200: ε-DP per-type event counts. Output: event_type,
    * released_count, epsilon_micro, sensitivity, scale_micro. */
  def dpTypeCounts(events: DataFrame, epsilon: Double, clamp: Int,
      seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(clamp >= 1, s"clamp must be >= 1, got $clamp")
    val perUser = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(least(count(lit(1)), lit(clamp.toLong)).as("n_clamped"))
    val clamped = perUser
      .groupBy(col("event_type"))
      .agg(sum("n_clamped").as("true_clamped"))
    // T (type count) is a 1-row aggregate broadcast into the release —
    // the budget splits across the release vector's components.
    val t = clamped.agg(count(lit(1)).as("n_types"))
    val b = lit(clamp.toDouble) * col("n_types") / lit(epsilon)
    // seeded uniform in (0,1): top 53 bits of the group hash
    val u0 = shiftrightunsigned(xxhash64(lit(seed), col("event_type")), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53
    val u = greatest(least(u0, lit(1.0 - 1e-12)), lit(1e-12)) - lit(0.5)
    val noise = -b * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    clamped.crossJoin(broadcast(t))
      .select(
        col("event_type"),
        floor(col("true_clamped") + noise + lit(0.5)).cast("long")
          .as("released_count"),
        lit(math.floor(epsilon * 1e6 + 0.5).toLong).as("epsilon_micro"),
        (lit(clamp.toLong) * col("n_types")).as("sensitivity"),
        floor(b * 1e6 + lit(0.5)).cast("long").as("scale_micro"))
      .orderBy("event_type")
  }
}
