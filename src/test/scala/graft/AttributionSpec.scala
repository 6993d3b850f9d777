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

  test("modelPanel (q204): hand-computed credits across all five models") {
    // u1: view,click,view → purchase (n=3); u2: click → purchase (n=1);
    // u3: view, never converts (credits nothing)
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "click", 0.0, "{}"),
      (3L, ts(3), 1L, "view", 0.0, "{}"),
      (4L, ts(4), 1L, "purchase", 1.0, "{}"),
      (5L, ts(1), 2L, "click", 0.0, "{}"),
      (6L, ts(2), 2L, "purchase", 1.0, "{}"),
      (7L, ts(1), 3L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Attribution.modelPanel(ev, "purchase").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // view: first(u1)=1, last(u1 rn3)=1, linear 2×333333,
    //   position 400000+400000, decay (1+3)/6 → 166666+500000
    assert(out("view") == ((1L, 1L, 666666L, 800000L, 666666L)), s"got $out")
    // click: u1 middle (200000 div 1) + u2 solo (all = 1000000)
    assert(out("click") == ((1L, 1L, 1333333L, 1200000L, 1333333L)), s"got $out")
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
