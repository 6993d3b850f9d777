package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn
import graft.streaming.KnnServe

/** Streamed KNN answers must equal the batch KNN for the same query
  * vectors. */
class KnnServeSpec extends SparkSpec {

  test("topKDotBatch == per-query single exact search (one-scan batched plan differential)") {
    val corpus = Tables.embeddings(spark, sf0001)
    val ids = Seq(0L, 7L, 13L)
    val batched = Knn.topKDotBatch(corpus, Knn.queryPanel(corpus, ids), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val looped = ids.flatMap { qid =>
      Knn.topKDot(corpus, Knn.queryVector(corpus, qid), 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(2)))
    }.toSet
    assert(batched == looped, "batched exact KNN diverged from the per-query loop")
  }

  test("MMR: lambda=1 reduces to exact cosine top-k; lambda=0.5 diversifies a planted " +
    "duplicate out of the head; always returns k rows") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.embeddings(spark, sf0001)
    val q = Knn.queryVector(corpus, 0L)
    // lambda = 1: pure relevance — must equal exact cosine top-k order
    val pure = Knn.topKDotMmr(corpus, q, 50, 10, 1.0)
      .collect().map(_.getLong(0)).toSeq
    val exact = Knn.topKCosine(corpus, q, 10).collect().map(_.getLong(0)).toSeq
    assert(pure == exact, "lambda=1 MMR diverged from exact cosine top-k")
    // plant an exact duplicate of the best hit: after its twin is
    // selected the copy scores 2λ−1 = 0, so it must NOT take rank 2
    val best = corpus.where(col("vec_id") === exact.head)
      .select(lit(90001L).as("vec_id"), col("embedding"), col("label"))
    val planted = corpus.select("vec_id", "embedding", "label").union(best)
    val mmr = Knn.topKDotMmr(planted, q, 50, 10, 0.5)
      .collect().map(_.getLong(0)).toSeq
    assert(mmr.length == 10, "MMR returned fewer than k rows")
    val twinRanks = Seq(mmr.indexOf(exact.head), mmr.indexOf(90001L)).filter(_ >= 0)
    assert(twinRanks.nonEmpty && twinRanks.min == 0, "the best hit lost rank 1")
    assert(!(mmr.take(2).toSet == Set(exact.head, 90001L)),
      s"duplicate twin not diversified out of rank 2: $mmr")
  }

  test("foreachBatch KNN serving == batch exact KNN per query") {
    val corpus = Tables.embeddings(spark, sf0001)
    // Stage a 3-query stream: query vectors 0, 7, 13 from the corpus.
    val qdir = s"${System.getProperty("java.io.tmpdir")}/graft_knn_queries"
    corpus.where(col("vec_id").isin(0L, 7L, 13L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .coalesce(1).write.mode("overwrite").parquet(qdir)
    val queries = spark.readStream
      .schema(spark.read.parquet(qdir).schema).parquet(qdir)

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = KnnServe.serve(queries, corpus, k = 5) { topk =>
      results ++= topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    q.awaitTermination(120000)

    Seq(0L, 7L, 13L).foreach { qid =>
      val streamed = results.filter(_._1 == qid).map(t => (t._2, t._3)).toSet
      val batch = Knn.topKDot(corpus,
          Knn.queryVector(corpus, qid), 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      assert(streamed === batch, s"query $qid: streamed != batch")
    }
  }

  test("hardNegatives: different-label top-k, near-dup ceiling evicts a planted mislabeled " +
    "twin, and the mined set is exactly the top-k of the eligible pool") {
    val corpus = Tables.embeddings(spark, sf0001)
    val ids = Seq(0L, 7L)
    val mined = Knn.hardNegatives(corpus, Knn.labeledPanel(corpus, ids), 5, 0.995)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val qLabel = corpus.where(col("vec_id").isin(ids: _*))
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ids.foreach { qid =>
      val hits = mined.filter(_._1 == qid)
      assert(hits.length == 5, s"query $qid: expected 5 negatives")
      assert(hits.forall(_._3 != qLabel(qid)), s"query $qid: a negative shares the query label")
      assert(hits.forall(_._4 < 0.995), s"query $qid: a score breached the ceiling")
      // Exactly the top-k of the ELIGIBLE pool: every eligible
      // candidate outside the mined set scores <= the mined minimum.
      val exact = Knn.topKCosine(
          corpus.where(col("label") =!= qLabel(qid)),
          Knn.queryVector(corpus, qid), 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      if (exact.forall(_._2 < 0.995))
        assert(hits.map(h => (h._2, h._4)).toSeq == exact.toSeq,
          s"query $qid: mined set != filtered exact top-5")
    }
    // Plant an exact copy of query 0 under a DIFFERENT label: cosine
    // 1.0 >= ceiling, so it must NOT be mined — but with the ceiling
    // lifted it must take rank 1 (it is the highest-scoring
    // different-label row by construction).
    val twin = corpus.where(col("vec_id") === 0L)
      .select(lit(90001L).as("vec_id"), col("embedding"),
        (col("label") + 1).cast("int").as("label"))
    val planted = corpus.select("vec_id", "embedding", "label").union(twin)
    val panel0 = Knn.labeledPanel(corpus, Seq(0L))
    val capped = Knn.hardNegatives(planted, panel0, 5, 0.995)
      .collect().map(_.getLong(1))
    assert(!capped.contains(90001L), "ceiling failed to evict the mislabeled twin")
    val uncapped = Knn.hardNegatives(planted, panel0, 5, 2.0)
      .collect().map(_.getLong(1))
    assert(uncapped.head == 90001L, "with no ceiling the planted twin must rank first")
  }

  test("IVF-probed serving == offline batched ANN search on a persisted index") {
    import graft.operators.Ivf
    val corpus = Tables.embeddings(spark, sf0001)
    val idxPath = s"${System.getProperty("java.io.tmpdir")}/graft_knnserve_idx"
    Ivf.save(corpus, 25, idxPath)
    val (postings, cents) = Ivf.load(spark, idxPath)

    val qdir = s"${System.getProperty("java.io.tmpdir")}/graft_knn_queries_ivf"
    corpus.where(col("vec_id").isin(0L, 7L, 13L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .coalesce(1).write.mode("overwrite").parquet(qdir)
    val queries = spark.readStream
      .schema(spark.read.parquet(qdir).schema).parquet(qdir)

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = KnnServe.serveIvf(queries, postings, cents, nprobe = 4, k = 5) { topk =>
      results ++= topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    q.awaitTermination(120000)

    val offline = Ivf.searchBatch(postings, cents,
        spark.read.parquet(qdir), nprobe = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(results.toSet === offline)
    assert(results.map(_._1).distinct.size === 3)
  }
}
