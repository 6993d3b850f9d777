package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bq, Knn}

/** Binary quantization: pack correctness vs an unpacked differential,
  * self-distance, shortlist≥corpus ≡ exact equivalence, recall floor,
  * dirty-row exclusion, zero-shuffle encode plan. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb001 = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val emb0001 = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("packed popcount equals the unpacked positive-component count; encode has no Exchange") {
    val enc = Bq.encode(emb0001, 64)
    val popcounts = enc
      .select(col("vec_id"), (bit_count(col("code_lo")) + bit_count(col("code_hi"))).as("pc"))
    val expected = emb0001
      .select(col("vec_id"),
        aggregate(col("embedding"), lit(0),
          (acc, x) => acc + when(x > lit(0.0f), 1).otherwise(0)).as("pc"))
    assert(popcounts.except(expected).isEmpty && expected.except(popcounts).isEmpty,
      "packed sign bits disagree with the HOF positive-count differential")
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("hamming(x, x) = 0: querying with a corpus vector ranks it first at distance 0") {
    val q = Knn.queryVector(emb0001, 3L)
    val top = Bq.search(Bq.encode(emb0001, 64), q, 64, 5).collect()
    assert(top.head.getLong(0) == 3L, s"self not first: ${top.head}")
    assert(top.head.getLong(1) == 0L, "self Hamming distance not 0")
  }

  test("rerank with shortlist >= corpus size is exactly the exact top-k") {
    val q = Knn.queryVector(emb0001, 0L)
    val n = emb0001.count().toInt
    val rr = Bq.searchRerank(emb0001, 64, q, n, 20)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Knn.topKDot(emb0001, q, 20)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr == exact, "full-shortlist rerank diverged from exact search")
  }

  test("two-stage recall@20 vs exact dot at the production shortlist") {
    val q = Knn.queryVector(emb001, 0L)
    val rrIds = Bq.searchRerank(emb001, 64, q, SparkEntry.Params.BqShortlist, 20)
      .collect().map(_.getLong(0)).toSet
    val exactIds = Knn.topKDot(emb001, q, 20).collect().map(_.getLong(0)).toSet
    val recall = (rrIds & exactIds).size / 20.0
    // 1-bit codes keep only direction octants; the 5x shortlist buys
    // back most of it — measured 0.60 on this corpus, deterministic
    assert(recall >= 0.5, s"recall@20 = $recall")
  }

  test("batched Hamming search == per-query single search") {
    val ids = Seq(0L, 7L, 13L)
    val enc = Bq.encode(emb0001, 64)
    val batched = Bq.searchBatch(enc, Knn.queryPanel(emb0001, ids), 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val looped = ids.flatMap { qid =>
      Bq.search(enc, Knn.queryVector(emb0001, qid), 64, 5)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(batched == looped, "batched BQ diverged from the per-query loop")
  }

  test("dirty rows (null / off-dim / null-element) never receive codes") {
    val base = emb0001.limit(1)
    val dirty = emb0001.select("vec_id", "embedding", "label")
      .union(base.select(lit(9001L).as("vec_id"),
        lit(null).cast("array<float>").as("embedding"), lit(0).as("label")))
      .union(base.select(lit(9002L).as("vec_id"),
        expr("slice(embedding, 1, 10)").as("embedding"), lit(0).as("label")))
      .union(base.select(lit(9003L).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = 3, CAST(NULL AS FLOAT), x))")
          .as("embedding"), lit(0).as("label")))
    val ids = Bq.encode(dirty, 64).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.exists(_ >= 9000L), "a dirty row received BQ codes")
    assert(ids == emb0001.select("vec_id").collect().map(_.getLong(0)).toSet)
  }
}
