package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Events
import graft.streaming.EventsStream

/** The streaming twins must agree with their batch counterparts when fed
  * the same (finite) input. */
class StreamingSpec extends SparkSpec {

  private lazy val stageDir = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_events_stream_src"
    // Stage the events table as clean parquet (micros timestamps) so the
    // streaming source can read it with a static schema.
    Tables.events(spark, sf0001).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly rollup matches the batch rollup") {
    val streamed = EventsStream.rollup(EventsStream.readEvents(spark, stageDir))
    val q = streamed.writeStream
      .format("memory").queryName("rollup_sink").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("rollup_sink")
      .select("hour", "event_type", "n_events", "sum_value", "avg_value")
      .orderBy("event_type", "hour").collect()
    val want = Events.rollup(Tables.events(spark, sf0001))
      .select(col("hour"), col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))
      .orderBy("event_type", "hour").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming dedup drops duplicates within the watermark") {
    val dupDir = s"${System.getProperty("java.io.tmpdir")}/graft_events_dup_src"
    val events = Tables.events(spark, sf0001)
    events.union(events).coalesce(1).write.mode("overwrite").parquet(dupDir)
    val deduped = EventsStream.dedupEvents(
      spark.readStream.schema(spark.read.parquet(dupDir).schema).parquet(dupDir))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_sink").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_sink").count() === events.count())
  }

  test("stateful streaming sessionization matches the batch sessionize") {
    import spark.implicits._
    val events = spark.readStream
      .schema(spark.read.parquet(stageDir).schema).parquet(stageDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventsStream.Event]
    val sessions = EventsStream.sessionize(events, gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("session_sink").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("session_sink")
      .select(col("user_id"), col("session_seq"), col("n_events"),
        round(col("sum_value"), 6).as("sum_value"))
      .orderBy("user_id", "session_seq").collect()
    val want = Events.sessionize(Tables.events(spark, sf0001), 30)
      .orderBy("user_id", "session_seq").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }
}
