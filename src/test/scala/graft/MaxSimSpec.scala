package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Late-interaction MaxSim retrieval (q122): Σ_q max_d ⟨q,d⟩ over
  * token-vector sets, hand-computed fixtures + the single-token
  * degeneracy to exact KNN + the broadcast plan contract. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed MaxSim on crafted token sets") {
    // tokensPerDoc=2 → doc0 = {e1, e2} (the query), doc1 = {e1, 0},
    // doc2 = {(.5,.5), e2}. MaxSim vs doc0's tokens:
    //   doc0: max(1,0) + max(0,1)       = 2.0
    //   doc1: max(1,0) + max(0,0)       = 1.0
    //   doc2: max(.5,0) + max(.5,1)     = 1.5
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(1f, 0f)), (3L, Array(0f, 0f)),
      (4L, Array(0.5f, 0.5f)), (5L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Knn.maxSim(vecs, tokensPerDoc = 2, queryDocId = 0L, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2000000L, 2L), (2L, 1500000L, 2L), (1L, 1000000L, 2L)))
  }

  test("tokensPerDoc=1 degenerates to exact dot KNN ordering") {
    val emb = Tables.embeddings(spark, sf0001)
    val ms = Knn.maxSim(emb, tokensPerDoc = 1, queryDocId = 0L, topN = 20)
      .collect().map(_.getLong(0)).toSeq
    val exact = Knn.topKDot(emb, Knn.queryVector(emb, 0L), 20)
      .collect().map(_.getLong(0)).toSeq
    assert(ms == exact)
  }

  test("query tokens broadcast; the corpus side never sort-merge joins") {
    val emb = Tables.embeddings(spark, sf0001)
    val plan = Knn.maxSim(emb, 16, 0L, 20).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join for the query token set:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus side got shuffled for the join:\n$plan")
  }

  test("maxSimBatch equals the per-query maxSim loop, bit for bit") {
    val emb = Tables.embeddings(spark, sf0001)
    val panel = Seq(0L, 1L, 2L)
    val batch = Knn.maxSimBatch(emb, 16, panel, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val loop = panel.flatMap { qd =>
      Knn.maxSim(emb, 16, qd, 20)
        .collect().map(r => (qd, r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(batch == loop)
  }

  test("a doc containing the query's own tokens ranks first (self-retrieval)") {
    val out = SparkEntry.queries("q122_maxsim")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.head.getLong(0) == 0L, "query doc must retrieve itself at rank 1")
  }

  test("maxSimIvf (q228): full probe equals the exact scan bit for bit; " +
    "default probe self-retrieves at rank 1 and scores candidates exactly") {
    val emb = Tables.embeddings(spark, sf0001)
    val step = SparkEntry.Params.IvfStep
    val nCells = graft.operators.Ivf.centroids(emb, step).count().toInt
    // probe every cell → every doc is a candidate → exact maxSim
    val full = Knn.maxSimIvf(emb, 16, 0L, 20, step, nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = Knn.maxSim(emb, 16, 0L, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(full == exact, "full-probe routed serve drifted from the exact scan")
    // default probe: the query doc is structurally its own candidate
    // (each query token's rank-1 probe is its own assigned cell), and
    // every returned doc carries its EXACT full-token-set score
    val routed = Knn.maxSimIvf(emb, 16, 0L, 20, step,
        SparkEntry.Params.MaxSimNProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(routed.nonEmpty && routed.head._1 == 0L,
      "query doc must retrieve itself at rank 1 under default probes")
    val exactByDoc = Knn.maxSim(emb, 16, 0L, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    routed.foreach { case (doc, micro, n) =>
      assert(exactByDoc(doc) == ((micro, n)),
        s"candidate doc $doc scored ($micro, $n) != exact ${exactByDoc(doc)}")
    }
  }
}
