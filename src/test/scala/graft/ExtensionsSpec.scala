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
      Seq("char_ngrams", "cms_estimate", "cms_inner_product",
        "theta_diff_card", "theta_estimate", "theta_intersect_card",
        "theta_union_card", "vector_dot", "vector_l2sq"))
    // apply() must not throw against a real extensions container.
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("sketch algebra is SQL-servable: theta and CMS scalars answer " +
    "over persisted sketch columns via spark.sql") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val rollup = Seq(
      ("a", (0L until 600L).toSeq), ("b", (400L until 1000L).toSeq))
      .toDF("segment", "ids")
      .select(col("segment"), explode(col("ids")).as("id"))
      .select(col("segment"), xxhash64(col("id")).as("h"))
      .groupBy("segment")
      .agg(graft.functions.ThetaSketch.thetaSketch(col("h"), 4096).as("sk"))
    rollup.createOrReplaceTempView("seg_rollup")
    val r = spark.sql(
      """SELECT a.segment, theta_estimate(a.sk) AS n,
        |  theta_union_card(a.sk, b.sk) AS u,
        |  theta_intersect_card(a.sk, b.sk) AS i,
        |  theta_diff_card(a.sk, b.sk) AS d
        |FROM seg_rollup a JOIN seg_rollup b
        |ON a.segment = 'a' AND b.segment = 'b'""".stripMargin).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((600L, 1000L, 200L, 400L)))
    val cms = Seq.fill(7)("x").toDF("term")
      .agg(graft.functions.CountMin.cmsSketch(col("term"), 4, 1024).as("sk"))
    cms.createOrReplaceTempView("cms_rollup")
    assert(spark.sql("SELECT cms_estimate(sk, 'x') FROM cms_rollup")
      .head().getLong(0) == 7L)
    assert(spark.sql(
      "SELECT cms_inner_product(sk, sk) FROM cms_rollup")
      .head().getLong(0) == 49L)
  }
}
