package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ThetaSketch
import graft.functions.ThetaSketch.Kmv

/** Property tests for the KMV/theta sketch kernels — pure JVM, no
  * Spark: on EVERY generated input (including adversarial duplicates,
  * split orderings, and saturation straddles) the sketch must (a) be a
  * canonical function of the SET (insertion order and merge split
  * invisible in the bytes), (b) be exact below k, and (c) run its set
  * algebra to the exact answer whenever both operands are exact. */
class ThetaSketchPropSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val hashes: Gen[List[Long]] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  private def build(k: Int, vs: Seq[Long]): Kmv = {
    val sk = new Kmv(k)
    vs.foreach(sk.add)
    sk
  }

  test("canonical bytes: order- and merge-split-invariant on every input") {
    (1 to 200).foreach { s =>
      val vs = sample(hashes, s.toLong)
      val k = 1 + math.abs(s * 37 % 128)
      val direct = build(k, vs).serialize
      val shuffled = build(k, new scala.util.Random(s).shuffle(vs)).serialize
      val cut = if (vs.isEmpty) 0 else math.abs(s * 13 % (vs.size + 1))
      val (l, r) = vs.splitAt(cut)
      val merged = build(k, l)
      merged.merge(build(k, r))
      assert(java.util.Arrays.equals(direct, shuffled), s"order leaked (seed $s)")
      assert(java.util.Arrays.equals(direct, merged.serialize),
        s"merge split leaked (seed $s)")
    }
  }

  test("exact below k on every input; never over-retains") {
    (1 to 200).foreach { s =>
      val vs = sample(hashes, 1000L + s)
      val distinct = vs.distinct.size
      val k = distinct + 1 + (s % 7)
      assert(ThetaSketch.estimateOf(build(k, vs).serialize) == distinct.toLong,
        s"unsaturated sketch not exact (seed $s)")
      val tight = build(math.max(1, distinct / 2 + 1), vs)
      assert(tight.values.size <= math.max(1, distinct / 2 + 1),
        s"retained past k (seed $s)")
    }
  }

  test("set algebra exact when both operands are exact, on every input pair") {
    (1 to 200).foreach { s =>
      val a = sample(hashes, 2000L + s).toSet
      val b = sample(hashes, 3000L + s).toSet
      val k = a.size + b.size + 1
      val (sa, sb) = (build(k, a.toSeq).serialize, build(k, b.toSeq).serialize)
      assert(ThetaSketch.unionEstimateOf(sa, sb) == (a | b).size.toLong,
        s"union (seed $s)")
      assert(ThetaSketch.intersectEstimateOf(sa, sb) == (a & b).size.toLong,
        s"intersect (seed $s)")
      assert(ThetaSketch.diffEstimateOf(sa, sb) == (a -- b).size.toLong,
        s"diff (seed $s)")
    }
  }

  test("saturated intersect is consistent: A∩A == estimate(A), and " +
    "n_intersect never exceeds either operand's estimate on near-identical sets") {
    (1 to 20).foreach { s =>
      val rnd = new scala.util.Random(1000 + s)
      val k = 256
      val base = Seq.fill(8000)(rnd.nextLong())
      val a = build(k, base)
      // b = a plus a few extras — the near-identical saturated regime
      // where the old inclusive count reported n_intersect > n_a
      val b = build(k, base ++ Seq.fill(40)(rnd.nextLong()))
      val ab = a.serialize
      val bb = b.serialize
      // the deterministic identity the old inclusive count broke:
      // intersect(A, A) read ~k/θ against estimate(A) = (k-1)/θ
      assert(ThetaSketch.intersectEstimateOf(ab, ab) == ThetaSketch.estimateOf(ab),
        s"seed $s: intersect(A,A) != estimate(A)")
      // same SET rebuilt in another insertion order: still the identity
      val shuffled = build(k, rnd.shuffle(base))
      assert(ThetaSketch.intersectEstimateOf(ab, shuffled.serialize) ==
        ThetaSketch.estimateOf(ab),
        s"seed $s: intersect with an order-shuffled twin diverged")
      // near-identical superset: two independent θs make the exceed-
      // the-operand comparison statistical, not deterministic — pin
      // accuracy against TRUTH instead (|A∩B| = |base| set) at the
      // estimator's own 5/sqrt(k) bar
      val inter = ThetaSketch.intersectEstimateOf(ab, bb).toDouble
      val truth = base.distinct.size.toDouble
      assert(math.abs(inter - truth) / truth < 5.0 / math.sqrt(k.toDouble),
        s"seed $s: intersect estimate $inter drifted from truth $truth")
    }
  }

  test("saturated estimates stay within 5/sqrt(k) of truth on uniform streams") {
    (1 to 20).foreach { s =>
      val n = 20000
      val rnd = new scala.util.Random(s)
      val k = 512
      val sk = new Kmv(k)
      (1 to n).foreach(_ => sk.add(rnd.nextLong()))
      val est = ThetaSketch.estimateOf(sk.serialize).toDouble
      val rel = math.abs(est - n) / n
      assert(rel < 5.0 / math.sqrt(k.toDouble), s"seed $s: rel err $rel")
    }
  }
}
