package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the event stream table (`events`): time-bucketed
  * rollups and sessionization. The streaming twin of `rollup` lives in
  * graft.streaming.EventsStream and shares its aggregation logic.
  *
  * Scale shape: group keys are (event_type, hour) — low cardinality, so
  * partial aggregation collapses each task's rows to a handful of
  * partials before the exchange. Sessionization shuffles once on user_id
  * and uses a per-user window (bounded by per-user event counts, skew
  * handled by AQE).
  */
object Events {

  /** Hourly rollup per event_type: count, value sum/avg, distinct users. */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      // avg derived from the ROUNDED sum: engines disagree on raw-double
      // avg at exact 6-dp ties (sum/count = x.xxxxxx5) because their
      // accumulation orders differ; dividing the identical rounded sum
      // makes the quotient bit-identical everywhere (SURVEY.md §6).
      .withColumn("avg_value", round(col("sum_value") / col("n_events"), 6))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("sum_value"), col("avg_value"), col("n_users"))
      .orderBy("event_type", "hour")

  /** Semi-structured props parsing: the events `props` column is a JSON
    * payload; parse it with an explicit schema (`from_json` — schema'd
    * parse beats per-field `get_json_object` re-parsing when extracting
    * multiple fields) and aggregate the extracted field per event_type.
    * Integer-only outputs — no cross-engine float concerns. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Sessionize: split each user's event stream at gaps > `gapMinutes`,
    * emit per-session aggregates. Classic two-window pattern: lag to mark
    * session starts, running sum to assign session ids. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    // epoch-second truncation (cast ts→timestamp→long) matches
    // date_diff('second', …) boundary counting in the oracle; ts may read
    // as TIMESTAMP_NTZ from parquet, the session tz is pinned to UTC.
    def secs(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("long")
    val marked = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          secs(col("ts")) - secs(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(byUser))
    marked.groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }
}
