package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharNgrams, DotProduct, L2Squared}
import graft.functions.{CmsEstimate, CmsInnerProduct, ThetaDiffCard,
  ThetaEstimate, ThetaIntersectCard, ThetaUnionCard}

/** SQL surface for the native kernels: registers `vector_dot` /
  * `vector_l2sq` / `char_ngrams` plus the sketch-algebra scalars
  * (`theta_estimate`, `theta_union_card`, `theta_intersect_card`,
  * `theta_diff_card`, `cms_estimate`, `cms_inner_product`) so a SQL
  * user can run set algebra and frequency point-queries over PERSISTED
  * sketch columns — `spark.sql("SELECT seg, theta_estimate(sk) FROM
  * rollup")` — without touching the Scala API. The sketch rollup
  * tables (q194/q213 build legs) become plain SQL-servable state.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions route for clusters/notebooks);
  *  - `GraftExtensions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.FuseCosine)
  }
}

object GraftExtensions {
  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  /** (name, info, builder) triples in injectFunction's shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"), info("vector_dot", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vector_l2sq"), info("vector_l2sq", classOf[L2Squared]),
      (args: Seq[Expression]) => L2Squared(args(0), args(1))),
    (FunctionIdentifier("char_ngrams"), info("char_ngrams", classOf[CharNgrams]),
      (args: Seq[Expression]) => CharNgrams(args(0),
        args(1).eval().asInstanceOf[Number].intValue)),
    (FunctionIdentifier("theta_estimate"),
      info("theta_estimate", classOf[ThetaEstimate]),
      (args: Seq[Expression]) => ThetaEstimate(args(0))),
    (FunctionIdentifier("theta_union_card"),
      info("theta_union_card", classOf[ThetaUnionCard]),
      (args: Seq[Expression]) => ThetaUnionCard(args(0), args(1))),
    (FunctionIdentifier("theta_intersect_card"),
      info("theta_intersect_card", classOf[ThetaIntersectCard]),
      (args: Seq[Expression]) => ThetaIntersectCard(args(0), args(1))),
    (FunctionIdentifier("theta_diff_card"),
      info("theta_diff_card", classOf[ThetaDiffCard]),
      (args: Seq[Expression]) => ThetaDiffCard(args(0), args(1))),
    (FunctionIdentifier("cms_estimate"),
      info("cms_estimate", classOf[CmsEstimate]),
      (args: Seq[Expression]) => CmsEstimate(args(0), args(1))),
    (FunctionIdentifier("cms_inner_product"),
      info("cms_inner_product", classOf[CmsInnerProduct]),
      (args: Seq[Expression]) => CmsInnerProduct(args(0), args(1))))

  /** Register into an existing session: SQL functions + the cosine
    * fusion optimizer rule. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.FuseCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FuseCosine
  }
}
