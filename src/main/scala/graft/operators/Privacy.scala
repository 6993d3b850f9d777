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
  *  The released KEY SET is a FIXED PUBLIC VOCABULARY, not the
  *  observed types (r17): with data-dependent keys, a user who
  *  uniquely contributes an event type toggles whether that type's
  *  ROW exists at all — an unbounded privacy loss no amount of count
  *  noise repairs — and T = observed-type count shifts every row's
  *  noise scale without itself being privatized. Releasing over a
  *  public vocabulary (noised ZEROS for absent types, observed types
  *  outside the vocabulary never released) makes the output's row set
  *  and T data-independent, so the Laplace mechanism's ε accounting
  *  actually holds. This is the standard known-domain release; for an
  *  unknown domain, compose with DP key selection first.
  *
  *  The release NEVER emits the true count; PrivacySpec pins the
  *  mechanics (determinism under one seed, clamp invariance when a
  *  user floods one type, noise centering across groups, fixed key
  *  set under unique-contributor addition/removal) from the outside. */
object Privacy {

  /** q200: ε-DP per-type event counts over a fixed public
    * `vocabulary`. Output: event_type, released_count, epsilon_micro,
    * sensitivity, scale_micro — one row per vocabulary entry, always. */
  def dpTypeCounts(events: DataFrame, vocabulary: Seq[String],
      epsilon: Double, clamp: Int, seed: Long): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(clamp >= 1, s"clamp must be >= 1, got $clamp")
    require(vocabulary.nonEmpty, "vocabulary must be non-empty")
    require(vocabulary.distinct == vocabulary, "vocabulary must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    // T is the PUBLIC vocabulary size — a constant of the release, not
    // of the data — so the noise scale leaks nothing.
    val t = vocabulary.size
    val b = clamp.toDouble * t / epsilon
    val perUser = events
      .where(col("event_type").isin(vocabulary: _*))
      .groupBy(col("user_id"), col("event_type"))
      .agg(least(count(lit(1)), lit(clamp.toLong)).as("n_clamped"))
    val clamped = perUser
      .groupBy(col("event_type"))
      .agg(sum("n_clamped").as("true_clamped"))
    // fixed key set: every vocabulary entry gets a row; absent types
    // release a noised zero indistinguishable from a small true count
    val vocab = vocabulary.toDF("event_type")
    val full = broadcast(vocab).join(clamped, Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("true_clamped"), lit(0L)).as("true_clamped"))
    // seeded uniform in (0,1): top 53 bits of the group hash
    val u0 = shiftrightunsigned(xxhash64(lit(seed), col("event_type")), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53
    val u = greatest(least(u0, lit(1.0 - 1e-12)), lit(1e-12)) - lit(0.5)
    val noise = -lit(b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    full
      .select(
        col("event_type"),
        floor(col("true_clamped") + noise + lit(0.5)).cast("long")
          .as("released_count"),
        lit(math.floor(epsilon * 1e6 + 0.5).toLong).as("epsilon_micro"),
        lit(clamp.toLong * t).as("sensitivity"),
        lit(math.floor(b * 1e6 + 0.5).toLong).as("scale_micro"))
      .orderBy("event_type")
  }
}
