package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Sq}

/** Scalar quantization: code bounds, zero-shuffle encode plan,
  * degenerate dims, recall, dirty-row exclusion. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb001 = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val emb0001 = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("encode: every code in [0,255], one row per clean vector, no Exchange") {
    val (mn, mx) = Sq.ranges(emb0001, 64)
    assert(mn.indices.forall(i => mn(i) <= mx(i)))
    val enc = Sq.encode(emb0001, mn, mx)
    val rows = enc.collect()
    assert(rows.length == emb0001.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 64)
      assert(codes.forall(c => c >= 0 && c <= 255), s"code out of range: $codes")
    }
    // encode is a narrow projection over broadcast-literal ranges —
    // zero shuffles at any corpus size
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("degenerate zero-range dimension encodes to 0 without dividing by zero") {
    val vecs = Seq(
      (1L, Array(1.0f, 5.0f)),
      (2L, Array(1.0f, 7.0f))) // dim 0 constant → mx == mn
      .toDF("vec_id", "embedding")
    val (mn, mx) = Sq.ranges(vecs, 2)
    assert(mn(0) == mx(0))
    val rows = Sq.encode(vecs, mn, mx).orderBy("vec_id").collect()
    assert(rows.map(_.getSeq[Int](1)(0)).toSeq == Seq(0, 0))
    assert(rows.map(_.getSeq[Int](1)(1)).toSeq == Seq(0, 255))
  }

  test("SQ8 search recall@20 vs exact dot stays near-exact (4x compression)") {
    val q = Knn.queryVector(emb001, 0L)
    val sqIds = Sq.searchInline(emb001, 64, q, 20)
      .collect().map(_.getLong(0)).toSet
    val exactIds = Knn.topKDot(emb001, q, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = (sqIds & exactIds).size / 20.0
    // 8-bit uniform quantization loses far less than PQ's 32x path;
    // measured 0.95 on this corpus, deterministic
    assert(recall >= 0.85, s"recall@20 = $recall")
  }

  test("dirty rows (null / off-dim / null-element) are excluded from ranges and codes") {
    val base = emb0001.limit(1)
    val dirty = emb0001.select("vec_id", "embedding", "label")
      .union(base.select(lit(9001L).as("vec_id"),
        lit(null).cast("array<float>").as("embedding"), lit(0).as("label")))
      .union(base.select(lit(9003L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 3, CAST(NULL AS FLOAT), x))")
          .as("embedding"), lit(0).as("label")))
    val (mn, mx) = Sq.ranges(dirty, 64)
    val (mnc, mxc) = Sq.ranges(emb0001, 64)
    assert(mn.toSeq == mnc.toSeq && mx.toSeq == mxc.toSeq,
      "dirty rows leaked into the range fit")
    val ids = Sq.encode(dirty, mn, mx).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.exists(_ >= 9000L))
  }
}
