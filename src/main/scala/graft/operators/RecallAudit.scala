package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.plans.GroupedTopK

/** In-engine recall audit for the ANN serving ladder (q62) — the
  * compression-ladder counterpart of [[Dedup.lshRecallReport]] (q60):
  * recall@k of the BATCHED serving paths ([[Ivf.searchBatch]],
  * [[Pq.searchAdcBatch]], [[Pq.searchAdcCellsBatch]]) against exact
  * top-k truth, per query of a sampled panel, as a queryable DataFrame
  * instead of spec prose. The reference eyeballs its index quality by
  * printing one search's neighbors (Program.cs:216-227); a 100 TB
  * pipeline needs the dial as data — run the audit per index build and
  * alert on regression.
  *
  * Scale contract: the panel is a SAMPLE (tens of queries — the audit
  * estimates a distribution, it is not production serving), so the
  * exact-truth legs are q-bounded crossJoins of broadcast queries —
  * n × q scored rows through [[GroupedTopK]]'s bounded heaps, no sort,
  * the same block-bounded-truth shape q60 uses. Each audited method
  * runs its real batched serving plan, so the report measures the
  * exact code path production queries take.
  *
  * Output: one row per (query_id, method) — `ivf` (probed exact-dot
  * rerank, truth = exact dot top-k), `pq_adc` (flat 32×-compressed
  * ADC, truth = exact L2 top-k), `ivfpq` (probed ADC, truth = exact L2
  * top-k) — with n_hits and recall = n_hits / k.
  */
object RecallAudit {

  def annRecallReport(vectors: DataFrame, step: Int, m: Int,
                      queryIds: Seq[Long], nprobe: Int, k: Int): DataFrame = {
    val queries = Knn.queryPanel(vectors, queryIds)
    val joined = vectors.crossJoin(broadcast(queries))
    val truthDot = GroupedTopK.topK(
      joined.select(col("query_id"), col("vec_id"),
        round(dot(col("embedding"), col("qv")), 6).as("s")),
      Seq(col("query_id")), Seq(col("s").desc, col("vec_id").asc), k)
      .select("query_id", "vec_id")
    val truthL2 = GroupedTopK.topK(
      joined.select(col("query_id"), col("vec_id"),
        round(l2Sq(col("embedding"), col("qv")), 6).as("d")),
      Seq(col("query_id")), Seq(col("d").asc, col("vec_id").asc), k)
      .select("query_id", "vec_id")

    val cents = Ivf.centroids(vectors, step)
    val cbs = Pq.codebooks(vectors, step, m)
    val ivfRes = Ivf.searchBatch(Ivf.inlinePostings(vectors, cents), cents,
      queries, nprobe, k).select("query_id", "vec_id")
    val adcRes = Pq.searchAdcBatch(Pq.encode(vectors, cbs), cbs, queries, k)
      .select("query_id", "vec_id")
    val ivfpqRes = Pq.searchAdcCellsBatch(Pq.encodeWithCell(vectors, cents, cbs),
      cents, cbs, queries, nprobe, k).select("query_id", "vec_id")

    // hits = |method ∩ truth| per query; the left join keeps a query
    // whose method leg missed EVERYTHING visible as recall 0, not absent
    def leg(method: String, res: DataFrame, truth: DataFrame): DataFrame = {
      val hits = res.join(truth, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      queries.select("query_id")
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), lit(method).as("method"),
          coalesce(col("n"), lit(0L)).as("n_hits"),
          round(coalesce(col("n"), lit(0L)).cast("double") / k, 6).as("recall"))
    }
    leg("ivf", ivfRes, truthDot)
      .unionByName(leg("pq_adc", adcRes, truthL2))
      .unionByName(leg("ivfpq", ivfpqRes, truthL2))
      .orderBy("query_id", "method")
  }
}
