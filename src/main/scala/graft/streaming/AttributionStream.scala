package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream windowed click→purchase attribution — the
  * TIME-INTERVAL JOIN class of Structured Streaming, the one join
  * shape whose state is bounded BY THE JOIN CONDITION itself: with
  * watermarks on both sides and an event-time range in the predicate,
  * each side's state store keeps only rows still inside
  * watermark + interval, so state is O(arrival rate × window),
  * never O(stream length). This is the streaming twin of the batch
  * attribution surface (AsOf.clickAttribution, q91) re-shaped for a
  * feed: instead of "the one most-recent click" resolved after the
  * fact, the join emits every in-window (purchase, click) TOUCHPOINT
  * append-mode as soon as it matches — the durable log a marketing
  * pipeline lands in storage — and [[toReport]] folds the log into
  * per-purchase attribution with a stateless aggregation that is
  * batch/stream identical by construction (same function either way).
  *
  * [[touchpoints]] itself is also batch/stream identical:
  * `withWatermark` is a documented no-op on a static Dataset, so the
  * SAME code is the differential oracle when applied to the events
  * table read as a batch frame (StreamingSpec pins streamed == batch
  * on the staged feed).
  */
object AttributionStream {

  /** Every (purchase, click) pair of the same user with the click in
    * `[purchase.ts − windowSec, purchase.ts]`. Inner time-interval
    * join: matches emit eagerly (no watermark wait on the output
    * path); the watermark exists to EXPIRE state. `secs_before` is the
    * click's age at purchase time — the feature attribution models
    * weight by. */
  def touchpoints(events: DataFrame, windowSec: Long,
                  watermark: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("event_id"), col("p_user").as("user_id"), col("click_id"),
        (col("p_ts").cast("long") - col("c_ts").cast("long")).as("secs_before"))
  }

  /** Per-purchase attribution report over a touchpoint log: touchpoint
    * count plus the most-recent click, resolved deterministically by
    * the (smallest age, largest click_id) rule — a struct-min, so two
    * clicks at the same second cannot flip the report between runs or
    * engines. Stateless over the log: run it on the streaming sink's
    * table or on batch [[touchpoints]] output and the answers agree by
    * construction. */
  def toReport(log: DataFrame): DataFrame =
    log.groupBy("event_id")
      .agg(
        count(lit(1)).as("n_clicks"),
        min(struct(col("secs_before"), (-col("click_id")).as("neg_id")))
          .as("best"))
      .select(col("event_id"), col("n_clicks"),
        (-col("best.neg_id")).cast("long").as("click_id"),
        col("best.secs_before").as("secs_before"))
      .orderBy("event_id")
}
