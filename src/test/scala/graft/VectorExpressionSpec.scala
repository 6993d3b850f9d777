package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.VectorFunctions._

/** The native codegen'd vector expressions must be bit-identical to
  * their interpreted HOF twins — same widening, same accumulation
  * order, same null semantics — or the DuckDB oracle hashes break. */
class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf0001)

  test("dot == dotHof and l2Sq == l2SqHof on the embeddings table (bit-exact)") {
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      dot(col("embedding"), col("qv")).as("native_dot"),
      dotHof(col("embedding"), col("qv")).as("hof_dot"),
      l2Sq(col("embedding"), col("qv")).as("native_l2"),
      l2SqHof(col("embedding"), col("qv")).as("hof_l2"))
    val mismatches = both
      .where(col("native_dot") =!= col("hof_dot") || col("native_l2") =!= col("hof_l2"))
      .count()
    assert(mismatches === 0)
  }

  test("property: native == HOF on random float vectors (seeded scalacheck)") {
    val vecGen = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray))
    val pairGen = Gen.zip(vecGen, vecGen)
    var seed = Seed(42L)
    val cases = (1 to 60).flatMap { _ =>
      val v = pairGen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
    // One Spark job for all generated cases — equal- and mixed-length.
    val rows = cases.toDF("a", "b").select(
      dot(col("a"), col("b")).as("nd"), dotHof(col("a"), col("b")).as("hd"),
      l2Sq(col("a"), col("b")).as("nl"), l2SqHof(col("a"), col("b")).as("hl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      def get(i: Int): Option[Double] = if (row.isNullAt(i)) None else Some(row.getDouble(i))
      // Mismatched lengths → both NULL; equal lengths → bit-equal doubles.
      assert(get(0) === get(1))
      assert(get(2) === get(3))
    }
  }

  test("null and length-mismatch semantics match the HOF formulation") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),   // equal lengths
      (Some(Array(1f, 2f)), Some(Array(3f))),       // length mismatch
      (None, Some(Array(3f, 4f))),                  // null array
      (Some(Array(1f, 2f)), None)
    ).toDF("a", "b")
    val rows = df.select(
      dot(col("a"), col("b")).as("nd"), dotHof(col("a"), col("b")).as("hd")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows(1).isNullAt(0), "length mismatch must yield NULL")
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("fused cosine == three-pass dot/(norm*norm) bit-exactly") {
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val mismatches = emb.crossJoin(broadcast(q)).select(
        cosine(col("embedding"), col("qv")).as("fused"),
        cosineUnfused(col("embedding"), col("qv")).as("unfused"))
      .where(col("fused") =!= col("unfused"))
      .count()
    assert(mismatches === 0)
  }

  test("double-element and mixed float/double arrays are accepted") {
    val df = Seq((Array(1f, 2f), Array(0.5, 0.25))).toDF("f", "d")
    val row = df.select(
      dot(col("d"), col("d")).as("dd"),
      dot(col("f"), col("d")).as("fd"),
      dotHof(col("d"), col("d")).as("dd_hof"),
      dotHof(col("f"), col("d")).as("fd_hof")).collect().head
    assert(row.getDouble(0) === row.getDouble(2))
    assert(row.getDouble(1) === row.getDouble(3))
  }

  test("vecSub == zip_with subtraction, null semantics, both eval paths") {
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      vecSub(col("embedding"), col("qv")).as("native"),
      zip_with(col("embedding"), col("qv"),
        (x, y) => x.cast("double") - y.cast("double")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() === 0)
    // length mismatch and null elements -> NULL result (whole-vector drop
    // contract, stricter than zip_with's padded per-element nulls)
    val dirty = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),
      (Array(1.0f, 2.0f), null.asInstanceOf[Array[Float]]))
      .toDF("a", "b")
      .select(vecSub(col("a"), col("b")).as("r")).collect()
    assert(dirty.forall(_.isNullAt(0)))
    // interpreted path (codegen off) agrees bit-for-bit
    val d = Seq((Array(1.5f, -2.25f), Array(0.5f, 0.75f))).toDF("a", "b")
      .select(vecSub(col("a"), col("b")).as("r")).collect().head
    assert(d.getSeq[Double](0) == Seq(1.0, -3.0))
  }

  test("native expressions run inside whole-stage codegen (no fallback)") {
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val df = emb.crossJoin(broadcast(q))
      .select(dot(col("embedding"), col("qv")).as("s"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage in the AQE
    // final-plan rendering; the Project evaluating vector_dot must carry it.
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[vector_dot.*"),
      s"vector_dot Project not inside a codegen stage:\n$plan")
  }
}
