package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The SQL registration surface for the native vector kernels. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    emb.createOrReplaceTempView("emb_ext_spec")
    val viaSql = spark.sql(
      """SELECT vec_id, vector_dot(embedding, embedding) AS d,
        |       vector_l2sq(embedding, embedding) AS z
        |FROM emb_ext_spec ORDER BY vec_id""".stripMargin).collect()
    val viaCol = emb.select(col("vec_id"),
        VectorFunctions.dot(col("embedding"), col("embedding")).as("d"),
        VectorFunctions.l2Sq(col("embedding"), col("embedding")).as("z"))
      .orderBy("vec_id").collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    assert(viaSql.forall(_.getDouble(2) === 0.0))
  }

  test("FuseCosine rewrites three-pass cosine into the fused expression") {
    GraftExtensions.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val unfused = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorFunctions.cosineUnfused(col("embedding"), col("qv")).as("c"))
    val optimized = unfused.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_cosine"),
      s"cosine not fused in optimized plan:\n$optimized")
    // Results identical to the directly-fused column.
    val direct = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.cosine(col("embedding"), col("qv")).as("c"))
    assert(unfused.orderBy("vec_id").collect().toSeq ===
      direct.orderBy("vec_id").collect().toSeq)
  }

  test("extension class injects every function triple") {
    // The injectFunction route needs a fresh session build; here we
    // assert the class wires the same triples register() uses.
    val ext = new GraftExtensions
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ===
      Seq("char_ngrams", "vector_dot", "vector_l2sq"))
    // apply() must not throw against a real extensions container.
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
