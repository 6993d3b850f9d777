package graft

import java.sql.Timestamp
import graft.operators.Attribution

/** Markov removal-effect attribution (q198): transition extraction and
  * the absorption solve against a hand-computed chain. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  // u1: view→click→purchase; u2: view (no conversion);
  // u3: click→purchase; u4: purchase immediately.
  private def events = Seq(
    (1L, ts(1), 1L, "view", 0.0, "{}"),
    (2L, ts(2), 1L, "click", 0.0, "{}"),
    (3L, ts(3), 1L, "purchase", 1.0, "{}"),
    (4L, ts(1), 2L, "view", 0.0, "{}"),
    (5L, ts(1), 3L, "click", 0.0, "{}"),
    (6L, ts(2), 3L, "purchase", 1.0, "{}"),
    (7L, ts(1), 4L, "purchase", 1.0, "{}"),
    // post-conversion noise: must be truncated away
    (8L, ts(9), 1L, "view", 0.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("journeyTransitions: truncation at first conversion, sentinel edges") {
    val t = Attribution.journeyTransitions(events, "purchase").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      ("__START__", "view") -> 2L,
      ("__START__", "click") -> 1L,
      ("__START__", "__CONV__") -> 1L,
      ("view", "click") -> 1L,
      ("view", "__NULL__") -> 1L,
      ("click", "__CONV__") -> 2L), s"got $t")
  }

  test("removalEffects == hand-solved absorption chain") {
    // base: v(click)=1, v(view)=1/2, v(START)=1/4+1/4·1+1/2·1/2 = 3/4.
    // remove click: v(START)=1/4  → effect 2/3; remove view: 1/2 → 1/3.
    val out = Attribution.removalEffects(events, "purchase").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("click") == ((2L, 666667L, 666667L)), s"got $out")
    assert(out("view") == ((2L, 333333L, 333333L)), s"got $out")
  }

  test("deterministic on the gate corpus; shares sum to ~1") {
    val ev = Tables.events(spark, sf0001)
    val a = Attribution.removalEffects(ev, "purchase").collect().map(_.toString).toSeq
    val b = Attribution.removalEffects(ev, "purchase").collect().map(_.toString).toSeq
    assert(a == b)
    val shares = Attribution.removalEffects(ev, "purchase").collect()
      .map(_.getLong(3)).sum
    assert(shares == 0L || math.abs(shares - 1000000L) <= 4L,
      s"share mass $shares")
  }
}
