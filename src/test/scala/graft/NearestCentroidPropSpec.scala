package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CentroidSet, VecUtil}

/** Differential property test for the optimized nearest-centroid kernel:
  * the raw-argmin + rounding-window + partial-distance-early-exit path
  * must equal the naive round-EVERY-candidate reference (the round-2
  * `min(struct(round(l2sq), cid))` semantics) on every input, including
  * adversarial near-ties inside the rounding merge window. */
class NearestCentroidPropSpec extends AnyFunSuite {

  /** Reference implementation: round every candidate, lexicographic min
    * of (rounded dist, centroid_id). */
  private def naive(e: Array[Double], cs: CentroidSet): Option[(Long, Double)] = {
    val cands = cs.mat.indices.flatMap { c =>
      val ce = cs.mat(c)
      if (ce.length != e.length) None
      else {
        var acc = 0.0
        var i = 0
        while (i < e.length) { val d = e(i) - ce(i); acc += d * d; i += 1 }
        Some((VecUtil.round6(acc), cs.cids(c)))
      }
    }
    if (cands.isEmpty) None else Some {
      val (d, cid) = cands.minBy(identity)
      (cid, d)
    }
  }

  private def optimized(e: Array[Double], cs: CentroidSet): Option[(Long, Double)] = {
    val row = VecUtil.nearestCentroid(
      new GenericArrayData(e.map(java.lang.Double.valueOf): Array[Any]),
      embIsDouble = true, cs)
    Option(row).map(r => (r.getLong(0), r.getDouble(1)))
  }

  private def gen[A](g: Gen[A], seed: Seed): (A, Seed) =
    (g.apply(Gen.Parameters.default, seed).get, seed.next)

  test("property: optimized argmin == naive round-all reference (random + near-ties)") {
    val dimGen = Gen.chooseNum(1, 8)
    var seed = Seed(20260812L)
    (1 to 400).foreach { i =>
      val (dim, s1) = gen(dimGen, seed)
      val (kc, s2) = gen(Gen.chooseNum(1, 12), s1)
      val (embL, s3) = gen(Gen.listOfN(dim, Gen.chooseNum(-3.0, 3.0)), s2)
      val (matL, s4) = gen(Gen.listOfN(kc, Gen.listOfN(dim, Gen.chooseNum(-3.0, 3.0))), s3)
      seed = s4
      val e = embL.toArray
      var mat = matL.map(_.toArray).toVector
      // Adversarial cases every few iterations:
      //  - an exact duplicate centroid (rounded-tie ⇒ centroid_id break)
      //  - a copy perturbed by ~1e-7 in one coordinate (inside the
      //    rounding merge window ⇒ naive may pick either by rounding;
      //    both impls must agree)
      if (i % 3 == 0 && mat.nonEmpty) mat = mat :+ mat.head.clone()
      if (i % 5 == 0 && mat.nonEmpty) {
        val p = mat.head.clone(); p(0) += 1e-7; mat = mat :+ p
      }
      // centroid ids deliberately NOT in insertion order
      val cids = mat.indices.map(j => ((j * 7919) % 104729).toLong).toArray
      val byId = cids.zip(mat).sortBy(_._1)
      val cs = CentroidSet(byId.map(_._1), byId.map(_._2).toArray)
      assert(optimized(e, cs) === naive(e, cs), s"case $i: e=${e.toSeq} cids=${cids.toSeq}")
    }
  }

  test("degenerate: empty centroid set and all-off-dim sets return None") {
    val e = Array(1.0, 2.0)
    assert(optimized(e, CentroidSet(Array.empty, Array.empty)) === None)
    assert(optimized(e, CentroidSet(Array(1L), Array(Array(1.0, 2.0, 3.0)))) === None)
  }
}
