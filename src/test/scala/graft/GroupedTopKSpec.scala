package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GroupedTopK

/** The custom grouped-top-k operator must return exactly the window
  * formulation's rows while pruning before the exchange. */
class GroupedTopKSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf001).repartition(8)

  test("custom operator == window row_number formulation (same row set)") {
    val custom = GroupedTopK.topK(
      docs.select("doc_id", "lang", "source", "n_chars"),
      Seq(col("lang"), col("source")),
      Seq(col("n_chars").desc_nulls_last, col("doc_id").asc), k = 3)
    val w = Window.partitionBy("lang", "source").orderBy(col("n_chars").desc)
    val viaWindow = docs.select("doc_id", "lang", "source", "n_chars")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3).drop("rnk")
    // n_chars ties make specific doc_ids ambiguous in both forms; compare
    // the deterministic projection (group, n_chars multiset).
    val a = custom.select("lang", "source", "n_chars")
      .orderBy("lang", "source", "n_chars").collect().toSeq
    val b = viaWindow.select("lang", "source", "n_chars")
      .orderBy("lang", "source", "n_chars").collect().toSeq
    assert(a === b)
    assert(custom.count() === viaWindow.count())
  }

  test("unique-ordered groups: exact row-for-row equality") {
    // doc_id is unique, so ordering by doc_id has no ties at all.
    val custom = GroupedTopK.topK(
      docs.select("doc_id", "lang"), Seq(col("lang")), Seq(col("doc_id").asc), k = 5)
      .orderBy("lang", "doc_id").collect().toSeq
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val viaWindow = docs.select("doc_id", "lang")
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5).drop("rnk")
      .orderBy("lang", "doc_id").collect().toSeq
    assert(custom === viaWindow)
  }

  test("plan: partial prune below the exchange, final above") {
    val df = GroupedTopK.topK(
      docs.select("doc_id", "lang"), Seq(col("lang")), Seq(col("doc_id").asc), k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"), s"no partial stage:\n$plan")
    assert(plan.contains("GroupedTopKFinal"), s"no final stage:\n$plan")
    // The partial stage must sit BELOW the key exchange (prune before
    // shuffle): Final … Exchange hashpartitioning … Partial, top-down.
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("GroupedTopKPartial")
    val finalIdx = plan.indexOf("GroupedTopKFinal")
    assert(exIdx >= 0 && finalIdx < exIdx && exIdx < partialIdx,
      s"expected Final above Exchange above Partial:\n$plan")
  }

  test("partial prune bounds shuffled rows to k per (key, partition)") {
    val k = 2
    val pruned = GroupedTopK.topK(
      docs.select("doc_id", "lang"), Seq(col("lang")), Seq(col("doc_id").asc), k)
    // 8 upstream partitions × n_langs keys × k is the hard ceiling the
    // exchange can carry; the result is k per key.
    val perKey = pruned.groupBy("lang").count().collect()
    assert(perKey.forall(_.getLong(1) <= k))
  }
}
