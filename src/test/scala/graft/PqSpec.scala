package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.{Knn, Pq}

/** Round-5 product quantization: codebook shape, encode/search
  * correctness, ADC≡exact degenerate case, recall floor. */
class PqSpec extends SparkSpec {

  private lazy val emb001 = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val emb0001 = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("codebooks: m subspaces of dim/m, contiguous code ids") {
    val cbs = Pq.codebooks(emb0001, step = 25, m = 8)
    assert(cbs.length == 8)
    assert(cbs.forall(_.mat.forall(_.length == 8)))
    val ids = cbs.head.cids.toSeq
    assert(ids == ids.sorted && ids.distinct == ids)
    assert(cbs.forall(_.cids.toSeq == ids))
  }

  test("encode: one in-range code per subspace, no shuffle in the plan") {
    val cbs = Pq.codebooks(emb0001, step = 25, m = 8)
    val enc = Pq.encode(emb0001, cbs)
    val maxCode = cbs.head.cids.max
    val rows = enc.collect()
    assert(rows.length == emb0001.count())
    (0 until 8).foreach { j =>
      assert(rows.forall { r =>
        val c = r.getLong(r.fieldIndex(s"c$j")); c >= 0 && c <= maxCode
      })
    }
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("a codebook-source query returns itself at approx_dist 0") {
    // vec 0 seeds code 0 of every subspace, so its own codes are exact
    // and every lookup-table entry it touches is 0
    val cbs = Pq.codebooks(emb001, step = 25, m = 8)
    val top = Pq.searchAdc(Pq.encode(emb001, cbs), cbs,
      Knn.queryVector(emb001, 0L), 1).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 0.0)
  }

  test("stride-1 codebooks degenerate ADC to exact L2 (rounding-bounded)") {
    // step=1: every vector is its own codebook entry per subspace, so
    // the quantization error is 0 and approx = Σ_j round6(subdist_j),
    // within m*5e-7 of the exact one-shot distance
    val cbs = Pq.codebooks(emb0001, step = 1, m = 8)
    val q = Knn.queryVector(emb0001, 0L)
    val adc = Pq.searchAdc(Pq.encode(emb0001, cbs), cbs, q, Int.MaxValue)
    val exact = emb0001.crossJoin(broadcast(q))
      .select(col("vec_id"), l2Sq(col("embedding"), col("qv")).as("d"))
    val diff = adc.join(exact, "vec_id")
      .select(max(abs(col("approx_dist") - col("d"))).as("m")).collect()
    assert(diff.head.getDouble(0) <= 1e-5)
  }

  test("ADC recall@20 vs exact L2 clears the coarse-codebook floor") {
    val cbs = Pq.codebooks(emb001, step = 25, m = 8)
    val q = Knn.queryVector(emb001, 0L)
    val adcIds = Pq.searchAdc(Pq.encode(emb001, cbs), cbs, q, 20)
      .collect().map(_.getLong(0)).toSet
    val exactIds = emb001.crossJoin(broadcast(q))
      .select(col("vec_id"), l2Sq(col("embedding"), col("qv")).as("d"))
      .orderBy(asc("d"), asc("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSet
    val recall = (adcIds & exactIds).size / 20.0
    assert(recall >= 0.4, s"recall@20 = $recall") // measured 0.45, deterministic
  }
}
