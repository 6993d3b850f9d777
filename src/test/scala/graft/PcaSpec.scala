package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Pca}

/** PCA fit/project (q94): component orthonormality, variance ordering,
  * isometry at full rank, and composition with the ANN serving family. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("components are orthonormal; explained variance is non-increasing and <= 1") {
    val m = Pca.fit(emb, sampleStride = 2, nComponents = 8)
    for (i <- m.components.indices; j <- m.components.indices) {
      val d = dot(m.components(i), m.components(j))
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"component $i not unit norm")
      else assert(math.abs(d) < 1e-9, s"components $i,$j not orthogonal: $d")
    }
    assert(m.varianceExplained == m.varianceExplained.sortBy(-_),
      "singular values must arrive sorted")
    assert(m.varianceExplained.sum <= 1.0 + 1e-9)
    assert(m.varianceExplained.forall(_ >= 0.0))
  }

  test("full-rank projection is an isometry: pairwise distances preserved") {
    val m = Pca.fit(emb, sampleStride = 2, nComponents = 64)
    val proj = Pca.asEmbedding(Pca.project(emb, m))
      .where(col("vec_id") < 20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .filter(r => !r.isNullAt(1) && !r.getSeq[Any](1).contains(null) &&
        r.getSeq[Any](1).length == 64)
      .map(r => r.getLong(0) ->
        r.getSeq[Any](1).map { case f: Float => f.toDouble; case d: Double => d }.toArray)
      .toMap
    for (a <- raw.keys; b <- raw.keys if a < b) {
      def l2(x: Array[Double], y: Array[Double]) =
        math.sqrt(x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum)
      val dRaw = l2(raw(a), raw(b))
      val dProj = l2(proj(a), proj(b))
      // rotation preserves distances; 1e-3 absorbs the round-6 outputs
      assert(math.abs(dRaw - dProj) < 1e-3,
        s"distance $a-$b distorted: raw $dRaw proj $dProj")
    }
  }

  test("leading components capture more sample variance than trailing ones") {
    val m = Pca.fit(emb, sampleStride = 2, nComponents = 16)
    val lead = m.varianceExplained.take(8).sum
    val trail = m.varianceExplained.drop(8).sum
    assert(lead >= trail, s"leading 8 ($lead) must dominate next 8 ($trail)")
  }

  test("projected frame composes with exact KNN through asEmbedding") {
    // topKDot carries the embeddings table's label column through
    val reduced = Pca.asEmbedding(Pca.fitProject(emb, 2, 8))
      .withColumn("label", lit(0))
    val q = Knn.queryVector(reduced, 0L)
    val top = Knn.topKDot(reduced, q, 5).collect().map(_.getLong(0)).toSeq
    assert(top.length == 5)
    // differential: the serving path over reduced vectors == driver-side
    // brute force over the same reduced vectors (dot is NOT a metric, so
    // "self wins" doesn't hold — ranking agreement is the real contract)
    val all = reduced.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qv = all(0L)
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val brute = all.toSeq
      .map { case (id, v) => (id, round6(dot(v, qv))) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    assert(top == brute, s"serving path $top != brute force $brute")
  }

  test("dirty rows drop; projection is deterministic") {
    val dirty = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(32)(1.0f)), // off-dim
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(emb, 2, 4)
    val out = Pca.project(dirty, m).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val a = Pca.fitProject(emb, 2, 4).collect().map(_.toSeq)
    val b = Pca.fitProject(emb, 2, 4).collect().map(_.toSeq)
    assert(a.sameElements(b), "fit+project must be a pure function")
  }
}
