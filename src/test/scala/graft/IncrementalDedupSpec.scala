package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental near-dup detection (q123): a delta batch against a
  * persisted corpus band index must find exactly the pairs the full
  * batch join would find among pairs touching the delta — with the
  * corpus side read, broadcast-joined, and never shuffled. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_inc_$tag").toString

  private def normalized(df: org.apache.spark.sql.DataFrame) =
    df.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental == full-batch pairs touching the delta (real corpus)") {
    val docs = Tables.documents(spark, sf0001)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 3
    val path = tmp("diff")
    Dedup.saveBandIndex(docs.where(!isDelta), path)
    val inc = normalized(Dedup.incrementalPairs(path, docs.where(isDelta)))
    val full = normalized(Dedup.minhashLsh(docs)
      .where(col("a") % 10 === 3 || col("b") % 10 === 3))
    assert(inc == full)
    assert(inc.nonEmpty, "gate corpus must contain cross-delta near-dups")
  }

  test("crafted legs: cross and intra pairs found, corpus-corpus pairs excluded") {
    // ids chosen so 3 and 13 are delta (x % 10 == 3), others corpus.
    val twin = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, twin),                              // corpus
      (2L, twin),                              // corpus (corpus-corpus dup)
      (3L, twin),                              // delta — duplicates corpus
      (13L, twin),                             // delta — duplicates delta
      (4L, "one two three four five six seven")// corpus, unrelated
    ).toDF("doc_id", "text")
    val isDelta = pmod(col("doc_id"), lit(10L)) === 3
    val path = tmp("crafted")
    Dedup.saveBandIndex(docs.where(!isDelta), path)
    val pairs = normalized(Dedup.incrementalPairs(path, docs.where(isDelta)))
      .map(t => (t._1, t._2))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), "cross leg missing")
    assert(pairs.contains((3L, 13L)), "intra-delta leg missing")
    assert(!pairs.contains((1L, 2L)), "corpus-corpus pair must not re-run")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("the corpus index side joins by broadcast, never a shuffled join") {
    val docs = Tables.documents(spark, sf0001)
    val isDelta = pmod(col("doc_id"), lit(10L)) === 3
    val path = tmp("plan")
    Dedup.saveBandIndex(docs.where(!isDelta), path)
    val plan = Dedup.incrementalPairs(path, docs.where(isDelta))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the delta bands broadcast into the store scan:\n$plan")
  }
}
