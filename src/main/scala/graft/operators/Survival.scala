package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival analysis over conversion latency (q208) —
  * the censoring-aware answer to "how long until users convert" that
  * q97's latency deciles cannot give: deciles silently DROP the users
  * who never converted, biasing every percentile optimistic. The KM
  * estimator (Kaplan & Meier, JASA 1958) keeps them: a user with no
  * conversion is RIGHT-CENSORED at their last observed event, stays in
  * the at-risk denominator until then, and never enters a numerator.
  *
  * Estimator: at each event time t with d(t) conversions among n(t)
  * still at risk, S(t) = Π_{u ≤ t} (1 − d(u)/n(u)).
  *
  * Shape: one user-grain aggregate collapses the event stream to
  * (duration, converted) observations; the curve then lives on the
  * DISTINCT-seconds grid — an observation-bounded frame (≤ #users
  * rows, presentation-sized by construction), where one ordered
  * cumulative window computes n(t) and the survival log-sum. Censored
  * times sit in the grid with d = 0: they shrink n(t) without touching
  * S (ln(1−0/n) = 0), which is exactly the KM treatment and keeps the
  * whole curve ONE windowed pass. The product is computed as
  * exp(Σ ln(·)) in double and micro-quantized — both engines sum the
  * same ordered grid, and the oracle states the identical expression.
  *
  * Output rows: event times only (d > 0) — t_sec, n_risk, d,
  * survival_micro. */
object Survival {

  /** q208: KM curve from first `fromType` to first `convType` per
    * user; users without a conversion censor at their last event. */
  def kaplanMeier(events: DataFrame, fromType: String,
      convType: String): DataFrame = {
    val t0 = events.where(col("event_type") === fromType)
      .groupBy("user_id").agg(min("ts").as("t0"))
    val tp = events.where(col("event_type") === convType)
      .groupBy("user_id").agg(min("ts").as("tp"))
    val tl = events.groupBy("user_id").agg(max("ts").as("tl"))
    val obs = t0
      .join(tl, Seq("user_id"))
      .join(tp, Seq("user_id"), "left")
      .select(
        when(col("tp").isNotNull && col("tp") >= col("t0"),
          expr("(unix_micros(tp) - unix_micros(t0)) div 1000000"))
          .otherwise(expr("(unix_micros(tl) - unix_micros(t0)) div 1000000"))
          .as("t_sec"),
        when(col("tp").isNotNull && col("tp") >= col("t0"), 1L)
          .otherwise(0L).as("ev"))
    // the curve grid: observation-bounded (≤ #users distinct seconds)
    val grid = obs.groupBy("t_sec")
      .agg(count(lit(1)).as("n_at"), sum("ev").as("d"))
    val total = grid.agg(sum("n_at").as("n_total"))
    val w = Window.orderBy("t_sec")
    val prior = Window.orderBy("t_sec")
      .rowsBetween(Window.unboundedPreceding, -1)
    // d == n(t) zeroes the curve: that happens only at the FINAL grid
    // row (nobody is at risk after), so the factor enters the log-sum
    // as 1 (Spark's log(0) is NULL, which a window sum would silently
    // DROP) and the row's output is pinned to 0 directly.
    val factor = when(col("d") === col("n_risk"), lit(1.0))
      .otherwise(lit(1.0) - col("d").cast("double") / col("n_risk"))
    grid.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("n_at").over(prior), lit(0L)))
      .withColumn("survival_micro",
        when(col("d") === col("n_risk"), lit(0L)).otherwise(
          floor(exp(sum(log(factor)).over(w)) * 1e6 + lit(0.5)).cast("long")))
      .where(col("d") > 0)
      .select(col("t_sec"), col("n_risk"), col("d"), col("survival_micro"))
      .orderBy("t_sec")
  }
}
