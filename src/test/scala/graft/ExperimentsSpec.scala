package graft

import java.sql.Timestamp
import graft.operators.Experiments

/** CUPED readout (q202) against hand-computed moments. */
class ExperimentsSpec extends SparkSpec {
  import spark.implicits._

  test("cupedReadout == hand-solved θ-adjustment on a crafted experiment") {
    def at(day: Int) = Timestamp.valueOf(f"2026-01-0${day + 1} 12:00:00")
    // pre = days 0-1, post = days 2-3 (midpoint pivot); x/y in cents:
    // u1(arm1): 1000/2000, u2(arm0): 2000/3000,
    // u3(arm1): 3000/5000, u4(arm0): 4000/6000
    val ev = Seq(
      (1L, at(0), 1L, "view", 10.0, "{}"),
      (2L, at(3), 1L, "view", 20.0, "{}"),
      (3L, at(1), 2L, "view", 20.0, "{}"),
      (4L, at(2), 2L, "view", 30.0, "{}"),
      (5L, at(0), 3L, "view", 30.0, "{}"),
      (6L, at(3), 3L, "view", 50.0, "{}"),
      (7L, at(1), 4L, "view", 40.0, "{}"),
      (8L, at(2), 4L, "view", 60.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // θ = cov/var = 28e6/20e6 = 1.4, ρ² = 784/800 = 0.98, x̄ = 2500
    val out = Experiments.cupedReadout(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 2L)
    assert(out(0L).getDouble(2) == 45.0, s"arm0 mean_y: ${out(0L)}")
    assert(out(0L).getDouble(3) == 38.0, s"arm0 mean_y_cuped: ${out(0L)}")
    assert(out(1L).getDouble(2) == 35.0, s"arm1 mean_y: ${out(1L)}")
    assert(out(1L).getDouble(3) == 42.0, s"arm1 mean_y_cuped: ${out(1L)}")
    assert(out(0L).getDouble(4) == 1.4, s"theta: ${out(0L)}")
    assert(out(0L).getDouble(5) == 0.98, s"var_reduction: ${out(0L)}")
  }

  test("conversionZTest (q209): balanced arms score z = 0; a planted " +
    "one-sided conversion lift is significant") {
    def at(i: Int) = Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00")
    def ev(rows: Seq[(Long, String)]) = rows.zipWithIndex.map {
      case ((u, t), i) => (i.toLong, at(i), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // u1..u4: one conversion per arm → identical rates, z = 0
    val balanced = ev(Seq((1L, "purchase"), (2L, "purchase"),
      (3L, "view"), (4L, "view")))
    val b = Experiments.conversionZTest(balanced, "purchase").head()
    assert(b.getDouble(6) == 0.0 && b.getInt(7) == 0, s"got $b")
    // 40 odd users all convert, 40 even users never → massive z
    val lifted = ev((1L to 80L).map(u =>
      u -> (if (u % 2 == 1) "purchase" else "view")))
    val l = Experiments.conversionZTest(lifted, "purchase").head()
    assert(l.getLong(0) == 40L && l.getLong(1) == 0L)
    assert(l.getLong(2) == 40L && l.getLong(3) == 40L)
    assert(l.getDouble(6) > 1.96 && l.getInt(7) == 1, s"got $l")
  }

  test("gate corpus: readout well-formed, adjustment preserves grand mean") {
    val out = Experiments.cupedReadout(Tables.events(spark, sf001)).collect()
    assert(out.length == 2)
    val vr = out.head.getDouble(5)
    assert(vr >= 0.0 && vr <= 1.0, s"rho² out of range: $vr")
    // CUPED shifts means within arms but the n-weighted grand mean of
    // the adjustment terms is 0 by construction (θ·Σ(x−x̄) = 0)
    val grandRaw = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    val grandAdj = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(grandRaw - grandAdj) < 0.01,
      s"adjustment created mass: $grandRaw vs $grandAdj")
  }

  test("sequentialReadout (q214): no-effect arms never go significant; " +
    "a planted lift is detected and the p-value never rises") {
    def at(day: Int, i: Int) =
      Timestamp.valueOf(f"2026-01-${day + 1}%02d 10:${i % 60}%02d:00")
    def ev(rows: Seq[(Int, Long, String)]) = rows.zipWithIndex.map {
      case ((d, u, t), i) => (i.toLong, at(d, i), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // Perfectly balanced: every day both arms gain 5 users, 1 converts
    val balanced = ev((0 until 6).flatMap(d =>
      (1L to 10L).map(u => (d, d * 100 + u,
        if (u <= 2) "purchase" else "view"))))
    val b = Experiments.sequentialReadout(balanced, "purchase", 0.1, 0.05)
      .collect()
    assert(b.length == 6)
    b.foreach { r =>
      assert(r.getInt(8) == 0, s"balanced arms flagged significant: $r")
      assert(r.getDouble(7) > 0.05, s"balanced p dipped: $r")
    }
    // always-valid p is a running min: never increases across looks
    val ps = b.map(_.getDouble(7))
    assert(ps.zip(ps.tail).forall { case (a, c) => c <= a },
      s"p-value rose between looks: ${ps.toSeq}")

    // Planted lift: odd users (arm 1) always convert, even never;
    // 30 users per arm per day for 4 days → overwhelming by day 4
    val lifted = ev((0 until 4).flatMap(d =>
      (1L to 60L).map(u => (d, d * 1000 + u,
        if (u % 2 == 1) "purchase" else "view"))))
    val l = Experiments.sequentialReadout(lifted, "purchase", 0.1, 0.05)
      .collect()
    assert(l.last.getInt(8) == 1,
      s"planted 100%-vs-0% lift not significant by the last look: ${l.last}")
    // cumulative counts are monotone and end at the full population
    assert(l.last.getLong(1) == 120L && l.last.getLong(3) == 120L)
    assert(l.last.getLong(2) == 0L && l.last.getLong(4) == 120L)
  }

  test("sequentialReadout: cumulative frame is partition-invariant and " +
    "matches the z-test's final-look counts on the gate corpus") {
    val ev = Tables.events(spark, sf001)
    val out = Experiments.sequentialReadout(ev, "purchase", 0.1, 0.05)
    val a = out.collect()
    val b = Experiments.sequentialReadout(ev.repartition(7), "purchase",
      0.1, 0.05).collect()
    assert(a.toSeq == b.toSeq, "readout depends on partitioning")
    // final look == the fixed-horizon q209 frame (same user-grain truth)
    val z = Experiments.conversionZTest(ev, "purchase").head()
    val last = a.last
    assert(last.getLong(1) == z.getLong(0) && last.getLong(2) == z.getLong(1)
      && last.getLong(3) == z.getLong(2) && last.getLong(4) == z.getLong(3),
      s"final-look counts diverge from q209: $last vs $z")
  }
}
