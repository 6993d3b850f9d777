package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Events, TextAnalysis}

/** Degenerate-input behavior: empty/whitespace documents, malformed
  * JSON, empty tables — operators must degrade to well-defined results,
  * not throw or emit garbage rows. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val oddDocs = Seq(
    (1L, "", "en", "web", 0L),
    (2L, "   \t  \n ", "en", "web", 8L),
    (3L, "one", "en", "web", 3L),
    (4L, "one two three four", "en", "web", 18L),
    (5L, "one two three four", "de", "mail", 18L) // cross-block dup
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token counts: empty and whitespace-only docs count zero tokens") {
    val rows = TextAnalysis.tokenCount(oddDocs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(1L) === 0 && rows(2L) === 0 && rows(3L) === 1 && rows(4L) === 4)
  }

  test("shingling: docs shorter than k drop out instead of emitting partials") {
    val sh = Dedup.shingleRows(oddDocs, 3).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sh === Set(4L, 5L), s"unexpected shingle docs: $sh")
  }

  test("minhash LSH: identical docs across blocks are found, empty docs ignored") {
    val pairs = Dedup.minhashLsh(oddDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((4L, 5L, 1.0)))
  }

  test("quality score: zero-token docs divide by the greatest(1) guard, not by zero") {
    val rows = TextAnalysis.qualityScore(oddDocs).collect()
    assert(rows.length === 5)
    assert(rows.forall(r => !r.isNullAt(3) && !r.getDouble(3).isNaN))
  }

  test("props parsing: malformed JSON yields null k, aggregates skip it") {
    val events = Seq(
      (1L, "purchase", "{\"k\": 3}"),
      (2L, "purchase", "not json"),
      (3L, "purchase", "{}"),
      (4L, "view", "{\"k\": 7}")
    ).toDF("event_id", "event_type", "props")
    val rows = Events.propsStats(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // count(*) counts all rows; sum skips the null ks.
    assert(rows("purchase") === ((3L, 3L)))
    assert(rows("view") === ((1L, 7L)))
  }

  test("dedup exact on an empty table returns no rows without failing") {
    val empty = oddDocs.where(lit(false))
    assert(Dedup.exact(empty).count() === 0)
    assert(Dedup.minhashLsh(empty).count() === 0)
  }
}
