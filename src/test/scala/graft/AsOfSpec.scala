package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Unit-level semantics of the generic as-of join: DuckDB/kdb
  * `l.key = r.key AND l.ts >= r.ts` with the greatest matching r.ts. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches most recent at-or-before right row per key; null when none") {
    val left = Seq(
      (1L, ts(100), "l-a"), // after r@50 and r@100 → r@100 (>= is inclusive)
      (1L, ts(99), "l-b"),  // between r@50 and r@100 → r@50
      (1L, ts(10), "l-c"),  // before all right rows → NULL
      (2L, ts(500), "l-d"), // key 2: only r@400 → r@400
      (3L, ts(500), "l-e")  // key 3: no right rows at all → NULL
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), "r-50"),
      (1L, ts(100), "r-100"),
      (2L, ts(400), "r-400")
    ).toDF("k", "t", "payload")

    val got = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("payload"))
      .select(col("tag"), col("asof_payload"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

    assert(got("l-a") === Some("r-100"))
    assert(got("l-b") === Some("r-50"))
    assert(got("l-c") === None)
    assert(got("l-d") === Some("r-400"))
    assert(got("l-e") === None)
  }

  test("matched right payload is row-consistent (never a column-wise mix)") {
    val left = Seq((1L, ts(100), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), "x", 111L),
      (1L, ts(90), "y", 222L)
    ).toDF("k", "t", "s", "n")
    val row = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("s", "n"))
      .select("asof_s", "asof_n").collect().head
    // Both payload columns must come from the SAME right row (t=90).
    assert(row.getString(0) === "y" && row.getLong(1) === 222L)
  }

  test("range join: window boundaries half-open, cross-bin pairs found, " +
    "zero-match targets kept, no nested-loop join in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // window = 10s. error at t=100s: clicks at 90s (= t-W, IN), 95s
    // (IN, lives in the PREVIOUS 10s bin — the banding must cross),
    // 100s (= t, OUT), 89.999999s (OUT). error at t=200s: nothing near.
    val rows = Seq(
      (1L, "error", 100000000L), (2L, "error", 200000000L),
      (10L, "click", 90000000L), (11L, "click", 95000000L),
      (12L, "click", 100000000L), (13L, "click", 89999999L))
    val events = rows.toDF("event_id", "event_type", "us")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val out = AsOf.precededByCount(events, "error", "click", 10)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m == Map(1L -> 2L, 2L -> 0L), s"range counts wrong: $m")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded range join degenerated to a nested loop:\n$plan")
  }

  test("every left row survives exactly once (left-join multiplicity)") {
    val events = Tables.events(spark, sf0001)
    val left = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val right = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("value").as("v"))
    val joined = AsOf.asofJoin(left, right, Seq("user_id"), "ts", Seq("v"))
    assert(joined.count() === left.count())
    assert(joined.select("event_id").distinct().count() === left.count())
  }

  test("tolerance as-of: stale matches null atomically; boundary gap is fresh") {
    val left = Seq(
      (1L, ts(100), "fresh"),    // r@95, gap 5 <= 10 → match
      (1L, ts(200), "boundary"), // r@190, gap EXACTLY 10 → match (<=)
      (1L, ts(400), "stale"),    // most recent r@190, gap 210 > 10 → NULL
      (2L, ts(100), "none")      // no right rows → NULL
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(95), "r95"),
      (1L, ts(190), "r190")
    ).toDF("k", "t", "payload")
    val got = AsOf.asofJoinTolerance(left, right, Seq("k"), "t",
        Seq("payload"), toleranceSec = 10L)
      .collect().map { r =>
        r.getString(r.fieldIndex("tag")) ->
          ((Option(r.get(r.fieldIndex("asof_ts"))),
            Option(r.getString(r.fieldIndex("asof_payload")))))
      }.toMap
    assert(got("fresh")._2 === Some("r95"))
    assert(got("boundary")._2 === Some("r190"))
    // stale: BOTH the ts and the payload must null together
    assert(got("stale") === ((None, None)), s"half-expired row: ${got("stale")}")
    assert(got("none") === ((None, None)))
  }

  test("clickAttribution: attributed flag consistent with nulls, purchases conserved") {
    val events = Tables.events(spark, sf001)
    val out = AsOf.clickAttribution(events, 86400L).collect()
    val nPurchases = events.where(col("event_type") === "purchase").count()
    assert(out.length.toLong == nPurchases, "unattributed purchases must survive")
    out.foreach { r =>
      val attributed = r.getInt(r.fieldIndex("attributed")) == 1
      assert(attributed == !r.isNullAt(r.fieldIndex("click_id")))
      assert(attributed == !r.isNullAt(r.fieldIndex("secs_since_click")))
      if (attributed)
        assert(r.getLong(r.fieldIndex("secs_since_click")) <= 86400L)
    }
    val attributedCount = out.count(r => r.getInt(r.fieldIndex("attributed")) == 1)
    assert(attributedCount > 0 && attributedCount < out.length,
      "window should attribute some but not all purchases at sf0.01")
  }
}
