package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** q229 k-center coreset: the composable farthest-first selection.
  * The load-bearing contracts: (1) a single partition IS the
  * one-machine Gonzalez greedy — pinned against an independent
  * reference implementation written here, not the operator's own
  * kernel; (2) the multi-partition composition keeps the coverage
  * radius within the composable-coreset constant of the one-machine
  * greedy; (3) the output is a true partition of the corpus
  * (occupancies sum to n, picks are distinct corpus members). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: farthest-first on squared L2, seed = min
    * id, ties to min id. */
  private def refGreedy(pts: Seq[(Long, Array[Float])], k: Int): Seq[Long] = {
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    var chosen = Seq(pts.minBy(_._1))
    while (chosen.size < math.min(k, pts.size)) {
      val rest = pts.filterNot(p => chosen.exists(_._1 == p._1))
        .map(p => (p, chosen.map(c => d2(p._2, c._2)).min))
        .filter(_._2 > 0.0)
      if (rest.isEmpty) return chosen.map(_._1)
      // max distance, ties to min id
      val best = rest.maxBy { case (p, d) => (d, -p._1) }._1
      chosen = chosen :+ best
    }
    chosen.map(_._1)
  }

  /** Coverage radius² of a pick set over the corpus. */
  private def radius(pts: Seq[(Long, Array[Float])], picks: Set[Long]): Double = {
    val centers = pts.filter(p => picks(p._1)).map(_._2)
    pts.map(p => centers.map(c =>
      p._2.zip(c).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum).min).max
  }

  /** Three tight clusters far apart + one outlier: k=4 must take one
    * representative of each structure. */
  private def clustered = {
    val rnd = new scala.util.Random(7)
    def blob(cx: Float, n: Int, base: Long) = (0 until n).map { i =>
      (base + i, Array.fill(8)(cx + rnd.nextFloat() * 0.1f), "b" + cx.toInt)
    }
    (blob(0f, 20, 0L) ++ blob(50f, 20, 100L) ++ blob(100f, 20, 200L) ++
      Seq((300L, Array.fill(8)(200f), "out")))
      .toDF("vec_id", "embedding", "label")
  }

  test("single partition reproduces the one-machine greedy exactly; " +
    "occupancies partition the corpus; picks are distinct members") {
    val df = clustered.repartition(1)
    val out = Sampling.kCenterCoreset(df, 4).collect()
    val pts = clustered.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val want = refGreedy(pts, 4)
    assert(out.map(_.getLong(1)).toSeq == want,
      s"picks ${out.map(_.getLong(1)).toSeq} vs reference $want")
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L), "pick order")
    assert(out.map(_.getLong(3)).sum == 61L, "occupancies must sum to n")
    // one pick lands in each blob and one on the outlier
    val groups = out.map(_.getLong(1) / 100L).toSet
    assert(groups == Set(0L, 1L, 2L, 3L), s"cluster coverage: $groups")
  }

  test("multi-partition composition stays within the composable-coreset " +
    "constant of the one-machine radius and still covers every point") {
    val df = clustered.repartition(5, col("vec_id"))
    val out = Sampling.kCenterCoreset(df, 4).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(3)).sum == 61L, "every point assigned")
    val pts = clustered.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val exact = radius(pts, refGreedy(pts, 4).toSet)
    val composed = radius(pts, out.map(_.getLong(1)).toSet)
    // squared-distance radii: the (2·OPT)-style constant on distances
    // squares to 4; composition must not degrade beyond it
    assert(composed <= 4.0 * exact + 1e-9,
      s"composed radius² $composed vs one-machine $exact")
    // the reported max_d2_micro really is the cover radius²
    val reported = out.map(_.getLong(5)).max / 1e6
    assert(math.abs(reported - composed) < 1e-3,
      s"reported $reported vs recomputed $composed")
  }

  test("k >= n returns every distinct point once; k=1 covers everything " +
    "from the min-id seed") {
    val tiny = Seq(
      (5L, Array(0f, 0f), "a"), (7L, Array(3f, 0f), "a"),
      (9L, Array(0f, 4f), "b")).toDF("vec_id", "embedding", "label")
    val all = Sampling.kCenterCoreset(tiny, 10).collect()
    assert(all.map(_.getLong(1)).toSet == Set(5L, 7L, 9L))
    assert(all.map(_.getLong(3)).toSeq.forall(_ == 1L))
    val one = Sampling.kCenterCoreset(tiny, 1).collect()
    assert(one.length == 1 && one(0).getLong(1) == 5L)
    assert(one(0).getLong(3) == 3L)
    // max d² from (0,0): the (0,4) point → 16 → 16e6 micro
    assert(one(0).getLong(5) == 16000000L, s"radius: ${one(0)}")
  }
}
