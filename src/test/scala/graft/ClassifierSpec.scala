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
}
