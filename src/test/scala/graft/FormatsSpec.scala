package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Formats

/** Interchange formats must round-trip rows and schema exactly. */
class FormatsSpec extends SparkSpec {

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt_$name"

  private def assertSameRows(a: DataFrame, b: DataFrame, sortCols: Seq[String]): Unit = {
    val x = a.orderBy(sortCols.head, sortCols.tail: _*).collect().toSeq
    val y = b.orderBy(sortCols.head, sortCols.tail: _*).collect().toSeq
    assert(x === y)
  }

  test("documents round-trip through json, orc, and csv") {
    val docs = Tables.documents(spark, sf0001)
    Formats.all.foreach { fmt =>
      val back = Formats.roundtrip(docs, fmt, tmp(s"docs_$fmt"))
      assert(back.schema === docs.schema, s"$fmt schema drift")
      assertSameRows(docs, back, Seq("doc_id"))
    }
  }

  test("embeddings (array column) round-trip through json and orc") {
    val emb = Tables.embeddings(spark, sf0001)
    Seq("json", "orc").foreach { fmt =>
      val back = Formats.roundtrip(emb, fmt, tmp(s"emb_$fmt"))
      assert(back.schema === emb.schema, s"$fmt schema drift")
      assertSameRows(emb.selectExpr("vec_id", "label", "embedding[0] as e0"),
        back.selectExpr("vec_id", "label", "embedding[0] as e0"), Seq("vec_id"))
    }
  }
}
