package graft

import org.apache.spark.sql.Row
import graft.operators.Classifier

/** fastText-style quality classifier (q197): the distributed GD fold
  * must be BIT-IDENTICAL to a sequential reference (integer micro
  * gradients are commutative), and training must actually separate the
  * target sources. */
class ClassifierSpec extends SparkSpec {

  private val Buckets = 256

  test("distributed training == sequential fold, bit for bit") {
    val docs = Tables.documents(spark, sf0001)
    val feat = Classifier.featurized(docs, Seq("src0", "src1"), Buckets)
    feat.persist()
    try {
      val (w1, b1) = Classifier.train(feat, Buckets, 3)
      val rows = feat.collect().map { r =>
        (r.getAs[scala.collection.Seq[Long]](r.fieldIndex("feats")).toSeq,
          r.getDouble(r.fieldIndex("label")))
      }.toSeq
      val (w2, b2) = Classifier.localTrain(rows, Buckets, 3)
      assert(b1 == b2, s"bias: $b1 != $b2")
      assert(w1.sameElements(w2),
        s"weights diverge at ${w1.zip(w2).indexWhere(p => p._1 != p._2)}")
    } finally { feat.unpersist(); () }
  }

  test("qualityReport separates target from non-target sources") {
    val docs = Tables.documents(spark, sf001)
    val rep = Classifier.qualityReport(docs, Seq("src0", "src1"), 1024, 4)
      .collect()
    assert(rep.nonEmpty)
    def mean(rows: Array[Row]): Double =
      rows.map(_.getLong(3).toDouble).sum / rows.length
    val (target, rest) = rep.partition(_.getLong(2) == 1L)
    assert(target.nonEmpty && rest.nonEmpty)
    assert(mean(target) > mean(rest),
      s"target sources must score higher: ${rep.mkString("; ")}")
    // untrained weights would score exactly 0.5 everywhere
    assert(rep.exists(_.getLong(3) != 500000L), "training moved no scores")
  }

  test("calibrationReport: bins partition the corpus, rates bounded, " +
    "ECE is the weighted mean gap") {
    val docs = Tables.documents(spark, sf001)
    val rep = Classifier.calibrationReport(docs, Seq("src0", "src1"), 1024, 4, 10)
      .collect()
    assert(rep.nonEmpty)
    val total = rep.map(_.getLong(1)).sum
    assert(total == docs.count(), "every document must land in exactly one bin")
    rep.foreach { r =>
      val (bin, n) = (r.getLong(0), r.getLong(1))
      assert(bin >= 0 && bin <= 9 && n > 0, s"bin row: $r")
      Seq(2, 3).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L, s"rate: $r"))
      assert(r.getLong(4) ==
        math.abs(r.getLong(2) - r.getLong(3)), s"gap: $r")
    }
    val ece = rep.head.getLong(5)
    val expect = rep.map(r => r.getLong(1) * r.getLong(4)).sum / total
    assert(ece == expect, s"ECE $ece != weighted mean $expect")
  }

  test("determinism: two full trainings produce the same report") {
    val docs = Tables.documents(spark, sf0001)
    def run() = Classifier.qualityReport(docs, Seq("src0"), Buckets, 2)
      .collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("qhatFrame (q217): exact ⌈(n+1)(1−α)⌉-th smallest, ties and " +
    "rank-overflow handled conservatively") {
    import spark.implicits._
    // n=9, α=0.1 → k = ⌈10·0.9⌉ = 9 → 9th smallest of 1..9 = 9
    val nine = (1L to 9L).toDF("nonconf")
    val r1 = Classifier.qhatFrame(nine, 100000L).head()
    assert(r1.getLong(0) == 9L && r1.getLong(1) == 9L, s"got $r1")
    // n=10, α=0.5 → k = ⌈11·0.5⌉ = 6 → 6th smallest of 10,20,...,100 = 60
    val tens = (1L to 10L).map(_ * 10).toDF("nonconf")
    val r2 = Classifier.qhatFrame(tens, 500000L).head()
    assert(r2.getLong(1) == 60L, s"got $r2")
    // duplicates: k-th smallest WITH multiplicity (values 5,5,5,9; k=⌈5·0.5⌉=3 → 5)
    val dup = Seq(5L, 5L, 5L, 9L).toDF("nonconf")
    assert(Classifier.qhatFrame(dup, 500000L).head().getLong(1) == 5L)
    // rank overflow (n=2, α=0.1 → k=⌈3·0.9⌉=3 > n): accept-everything 1e6
    val two = Seq(1L, 2L).toDF("nonconf")
    assert(Classifier.qhatFrame(two, 100000L).head().getLong(1) == 1000000L)
    // empty calibration: same conservative ceiling
    val empty = Seq.empty[Long].toDF("nonconf")
    assert(Classifier.qhatFrame(empty, 100000L).head().getLong(1) == 1000000L)
  }

  test("conformalGateReport (q217): coverage guarantee holds on the gate " +
    "corpus, threshold consistent with acceptances, deterministic") {
    val docs = Tables.documents(spark, sf001)
    val out = Classifier.conformalGateReport(docs, Seq("src0", "src1"),
      Buckets, 2, 100000L).collect()
    assert(out.nonEmpty)
    val qhat = out.head.getLong(5)
    val alphaM = out.head.getLong(8)
    val cov = out.head.getLong(7)
    assert(out.forall(r => r.getLong(5) == qhat && r.getLong(7) == cov),
      "report columns must be global")
    // marginal coverage ≥ 1−α up to the ±1/(n_cal+1) finite-sample wobble
    val nCal = out.head.getLong(6)
    val wobble = 1000000L / (nCal + 1) + 1
    assert(cov >= 1000000L - alphaM - wobble,
      s"coverage $cov below 1−α with n_cal=$nCal")
    // acceptance counts are bounded by eval counts; targets flagged
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"accept > eval: $r")
    }
    assert(out.filter(_.getLong(1) == 1L).map(_.getString(0)).toSet
      == Set("src0", "src1"))
    val again = Classifier.conformalGateReport(docs, Seq("src0", "src1"),
      Buckets, 2, 100000L).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
