package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Search}

/** BM25 + hybrid-RRF retrieval (operators/Search.scala). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // doc 1: "cat" twice in 4 tokens; doc 2: once in 4; doc 3: no hit;
    // doc 4: once but longer (8 tokens) → length-normalized below doc 2.
    (1L, "cat cat dog bird"),
    (2L, "cat dog dog bird"),
    (3L, "dog dog bird bird"),
    (4L, "cat dog dog bird dog bird dog bird")
  ).toDF("doc_id", "text")

  test("bm25 ranks higher tf first, length-normalizes, drops non-matches") {
    val out = Search.bm25(docs, Seq("cat"), k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L)) // doc 3 absent
    val scores = out.map(_.getDouble(2))
    assert(scores.sorted.reverse.toSeq == scores.toSeq && scores.forall(_ > 0))
  }

  test("bm25 multi-term sums per-term contributions and counts matches") {
    val out = Search.bm25(docs, Seq("cat", "bird"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2 && out(2L) == 2 && out(3L) == 1 && out(4L) == 2)
  }

  test("bm25 respects k") {
    assert(Search.bm25(docs, Seq("dog"), k = 2).count() == 2)
  }

  test("hybridRrf fuses both legs and scores absent legs as zero") {
    val emb = Tables.embeddings(spark, sf001)
    val corpus = Tables.documents(spark, sf001)
    val q = Knn.queryVector(emb, 0L)
    val terms = SparkEntry.Params.Bm25Terms
    val out = Search.hybridRrf(corpus, emb, q, terms, k = 20, depth = 50)
    val rows = out.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Int])
      val expected = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-6)
      assert(lex.forall(x => x >= 1 && x <= 50) && sem.forall(x => x >= 1 && x <= 50))
      assert(lex.nonEmpty || sem.nonEmpty)
    }
    // both-leg docs outrank single-leg docs of comparable rank depth
    assert(rows.map(_.getDouble(3)).toSeq == rows.map(_.getDouble(3)).sorted.reverse.toSeq)
  }

  test("bm25 plan: no cartesian product, broadcast df join") {
    val plan = Search.bm25(docs, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }
}
