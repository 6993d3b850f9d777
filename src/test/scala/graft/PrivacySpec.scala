package graft

import java.sql.Timestamp
import graft.operators.Privacy

/** DP release (q200): reproducibility under one seed, contribution
  * bounding as the sensitivity proof, and noise centering. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:${m % 60}%02d:00")

  private def mkEvents(rows: Seq[(Long, String)]) =
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, ts(i), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("same seed → identical release; different seed → different noise") {
    val ev = Tables.events(spark, sf0001)
    val a = Privacy.dpTypeCounts(ev, Seq("click", "error", "purchase", "signup", "view"), 1.0, 8, 42L).collect().map(_.toString).toSeq
    val b = Privacy.dpTypeCounts(ev, Seq("click", "error", "purchase", "signup", "view"), 1.0, 8, 42L).collect().map(_.toString).toSeq
    val c = Privacy.dpTypeCounts(ev, Seq("click", "error", "purchase", "signup", "view"), 1.0, 8, 43L).collect().map(_.toString).toSeq
    assert(a == b, "a DP release must be reproducible under its seed")
    assert(a != c, "a fresh seed must draw fresh noise")
  }

  test("contribution bounding: a flooding user moves the release by <= clamp") {
    val base = mkEvents(Seq((1L, "view"), (2L, "view"), (1L, "click")))
    val flood = mkEvents(Seq((1L, "view"), (2L, "view"), (1L, "click")) ++
      Seq.fill(500)((99L, "view")))
    val clamp = 5
    def viewCount(df: org.apache.spark.sql.DataFrame): Long =
      Privacy.dpTypeCounts(df, Seq("click", "view"), 1.0, clamp, 7L).collect()
        .find(_.getString(0) == "view").get.getLong(1)
    // identical seed and type set → identical noise; the released delta
    // IS the clamped-count delta, and one user can contribute at most
    // `clamp` to it no matter how many rows they flood
    val delta = viewCount(flood) - viewCount(base)
    assert(delta == clamp.toLong, s"flooding user leaked $delta > clamp $clamp")
  }

  test("noise is centered: mean deviation over many seeds ~ 0") {
    // clamp above every per-user-type count → clamped == true count
    val ev = mkEvents(
      (1 to 40).map(i => (i.toLong, "view")) ++
        (1 to 25).map(i => (i.toLong, "click")))
    val eps = 50.0 // b = clamp·T/ε = 100·2/50 = 4
    val devs = (1 to 200).map { seed =>
      val rel = Privacy.dpTypeCounts(ev, Seq("click", "view"), eps, 100, seed.toLong).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      (rel("view") - 40L) + (rel("click") - 25L)
    }
    val mean = devs.sum.toDouble / devs.size
    assert(math.abs(mean) < 3.0, s"noise mean $mean drifted from 0")
    assert(devs.exists(_ != 0L), "noise must actually perturb")
  }

  test("fixed public key set: a unique contributor cannot toggle a row's " +
    "existence, absent vocabulary types release noised zeros, and " +
    "off-vocabulary observed types are never released") {
    val vocab = Seq("click", "purchase", "view")
    val base = mkEvents(Seq((1L, "view"), (2L, "click")))
    // user 99 UNIQUELY contributes "purchase" (in-vocab) and also an
    // off-vocabulary type; neither changes the released key set
    val withUnique = mkEvents(Seq((1L, "view"), (2L, "click"),
      (99L, "purchase"), (99L, "off_vocab_type")))
    def keys(df: org.apache.spark.sql.DataFrame) =
      Privacy.dpTypeCounts(df, vocab, 1.0, 8, 11L).collect()
        .map(_.getString(0)).toSeq
    assert(keys(base) == vocab, s"release rows must be exactly the vocabulary: ${keys(base)}")
    assert(keys(withUnique) == vocab,
      "a unique contributor toggled the released key set — unbounded privacy loss")
    // the absent type's row is a noised zero, not a true-zero marker
    val purchases = (1 to 100).map { seed =>
      Privacy.dpTypeCounts(base, vocab, 5.0, 8, seed.toLong).collect()
        .find(_.getString(0) == "purchase").get.getLong(1)
    }
    assert(purchases.exists(_ != 0L), "absent-type rows must carry noise too")
  }

  test("release metadata states the budget: sensitivity = clamp × types") {
    val out = Privacy.dpTypeCounts(Tables.events(spark, sf0001), Seq("click", "error", "purchase", "signup", "view"), 1.0, 8, 1L)
      .collect()
    val types = out.length.toLong
    out.foreach { r =>
      assert(r.getLong(2) == 1000000L) // epsilon_micro
      assert(r.getLong(3) == 8L * types, s"sensitivity: $r")
    }
  }
}
