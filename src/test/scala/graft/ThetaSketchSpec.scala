package graft

import org.apache.spark.sql.functions._
import graft.functions.ThetaSketch._
import graft.operators.Sketches

/** Theta/KMV sketches (q194): exact below k, canonical bytes, full set
  * algebra against exact distinct arithmetic, and bounded error in the
  * saturated regime. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("unsaturated sketches are EXACT: estimate == countDistinct per group") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", (i % 700).toLong)).toDF("g", "v")
    val got = df.select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(thetaEstimate(thetaSketch(col("h"), 1024)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("set algebra exact below k: union/intersect/diff == inclusion-exclusion") {
    // A = {0..599}, B = {400..999}: |A|=600 |B|=600 |A∩B|=200 |A∪B|=1000
    val a = (0 until 600).map(v => ("A", v.toLong))
    val b = (400 until 1000).map(v => ("B", v.toLong))
    val sk = (a ++ b).toDF("g", "v")
      .select(col("g"), xxhash64(col("v")).as("h"))
      .groupBy("g").agg(thetaSketch(col("h"), 4096).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(estimateOf(sk("A")) == 600L)
    assert(unionEstimateOf(sk("A"), sk("B")) == 1000L)
    assert(intersectEstimateOf(sk("A"), sk("B")) == 200L)
    assert(diffEstimateOf(sk("A"), sk("B")) == 400L)
    assert(diffEstimateOf(sk("B"), sk("A")) == 400L)
  }

  test("canonical serialization: bytes identical across partitionings") {
    def build(parts: Int): Array[Byte] =
      (1 to 3000).map(i => (i % 777).toLong).toDF("v").repartition(parts)
        .select(xxhash64(col("v")).as("h"))
        .agg(thetaSketch(col("h"), 256).as("sk"))
        .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(2), build(11)),
      "merge order must not leak into the serialized sketch")
  }

  test("saturated regime: ~1/sqrt(k) relative error, k bytes regardless of n") {
    val n = 50000
    val sk = (1 to n).map(_.toLong).toDF("v")
      .select(xxhash64(col("v")).as("h"))
      .agg(thetaSketch(col("h"), 1024).as("sk"))
      .head().getAs[Array[Byte]](0)
    val est = estimateOf(sk)
    assert(math.abs(est - n).toDouble / n < 0.15, s"estimate $est vs $n")
    assert(sk.length == 8 + 8 * 1024, "saturated sketch must be exactly k values")
  }

  test("q194 audienceAlgebra mirrors exact distinct algebra on the gate corpus") {
    val orders = Tables.orders(spark, sf0001)
    val got = Sketches.audienceAlgebra(orders, 4096).collect()
    assert(got.nonEmpty)
    val tu = orders.select(col("o_orderpriority").as("seg"), col("o_custkey").as("u"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1))
    val bySeg = tu.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).toSet }
    got.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == bySeg(sa).size.toLong, s"n_a $r")
      assert(r.getLong(4) == (bySeg(sa) | bySeg(sb)).size.toLong, s"n_union $r")
      assert(r.getLong(5) == (bySeg(sa) & bySeg(sb)).size.toLong, s"n_intersect $r")
      assert(r.getLong(6) == (bySeg(sa) -- bySeg(sb)).size.toLong, s"n_diff_a $r")
    }
  }
}
