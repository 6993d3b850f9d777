package graft

import java.sql.Timestamp
import graft.operators.Survival

/** Kaplan-Meier (q208): hand-computed curve with censoring, and the
  * censoring-matters property q97's deciles can't express. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1760000000000L + sec * 1000L)

  test("kaplanMeier == hand-computed curve; censored users shape n(t) only") {
    // u1 converts at 10s, u2 at 20s, u3 censored at 15s, u4 censored at 0s
    val ev = Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"), (2L, ts(10), 1L, "purchase", 0.0, "{}"),
      (3L, ts(0), 2L, "view", 0.0, "{}"), (4L, ts(20), 2L, "purchase", 0.0, "{}"),
      (5L, ts(0), 3L, "view", 0.0, "{}"), (6L, ts(15), 3L, "click", 0.0, "{}"),
      (7L, ts(0), 4L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Survival.kaplanMeier(ev, "view", "purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // t=10: 3 at risk (u4 censored at 0), S = 2/3; t=20: last one converts
    assert(out.toSeq == Seq((10L, 3L, 1L, 666667L), (20L, 1L, 1L, 0L)),
      s"got ${out.toSeq}")
  }

  test("dropping a censored user changes n(t) and therefore S(t)") {
    def ev(withCensored: Boolean) = (Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"), (2L, ts(10), 1L, "purchase", 0.0, "{}"),
      (3L, ts(0), 2L, "view", 0.0, "{}"), (4L, ts(30), 2L, "purchase", 0.0, "{}")
    ) ++ (if (withCensored)
      Seq((5L, ts(0), 3L, "view", 0.0, "{}"), (6L, ts(25), 3L, "click", 0.0, "{}"))
    else Seq.empty))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def sAt10(df: org.apache.spark.sql.DataFrame) =
      Survival.kaplanMeier(df, "view", "purchase").collect()
        .find(_.getLong(0) == 10L).get.getLong(3)
    assert(sAt10(ev(withCensored = true)) == 666667L) // 1 - 1/3
    assert(sAt10(ev(withCensored = false)) == 500000L) // 1 - 1/2
  }

  test("gate corpus: monotone non-increasing, bounded, deterministic") {
    val km = Survival.kaplanMeier(Tables.events(spark, sf001), "view", "purchase")
    val a = km.collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(a.nonEmpty)
    assert(a.map(_._2).forall(s => s >= 0L && s <= 1000000L))
    a.sliding(2).foreach { case Array((_, s1), (_, s2)) =>
      assert(s2 <= s1, "survival must be non-increasing")
    case _ => }
    assert(a.toSeq == km.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq)
  }
}
