package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Constraint checking must COUNT violations exactly, not just flag. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkRows: exact per-constraint violation counts from one pass over crafted defects") {
    val df = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 100L, "en"),
      (2L, -5L, "en"),     // negative
      (3L, null, "xx"),    // null length + bad lang
      (null, 900L, "de")   // null id + over range
    ).toDF("doc_id", "n_chars", "lang")
    val out = Quality.checkRows(df, Seq(
        Quality.notNull("doc_id"),
        Quality.nonNegative("n_chars"),
        Quality.inRange("n_chars", 0L, 500L),
        Quality.inSet("lang", Seq("en", "de"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null(doc_id)") == ((4L, 1L, false)))
    assert(out("non_negative(n_chars)") == ((4L, 2L, false)))   // -5 and null
    assert(out("range(n_chars,0,500)") == ((4L, 3L, false)))    // -5, null, 900
    assert(out("in_set(lang)") == ((4L, 1L, false)))            // xx
  }

  test("checkUnique counts dup keys AND surplus rows; checkRef counts orphans incl. null FKs") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val u = Quality.checkUnique(df, "k").collect().head
    assert(u.getLong(1) == 2L && u.getLong(2) == 3L && !u.getBoolean(3),
      s"unique: $u") // keys 2 and 3 dup; surplus = 1 + 2
    val facts = Seq[(java.lang.Long, String)]((1L, "a"), (9L, "b"), (null, "c"))
      .toDF("fk", "payload")
    val dim = Seq(1L, 2L).toDF("pk")
    val r = Quality.checkRef(facts, "fk", dim, "pk").collect().head
    assert(r.getLong(1) == 2L && !r.getBoolean(2), s"ref: $r") // 9 and null
  }

  test("corpusReport on the real corpus: tight range check fails with a nonzero count, " +
    "contract checks pass, report is one row per constraint") {
    val rep = Quality.corpusReport(
        Tables.documents(spark, sf0001), Tables.events(spark, sf0001),
        Tables.customer(spark, sf0001))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep.size == 8)
    assert(rep("range(n_chars,1,400)")._1 > 0 && !rep("range(n_chars,1,400)")._2,
      "the deliberately-tight range check should detect real violations")
    Seq("not_null(doc_id)", "unique(doc_id)", "ref(user_id)", "in_set(lang)",
      "matches(source)").foreach { c =>
      assert(rep(c) == ((0L, true)), s"$c should pass on this corpus: ${rep(c)}")
    }
  }
}
