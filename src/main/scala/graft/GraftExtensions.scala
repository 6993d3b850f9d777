package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharNgrams, DotProduct, L2Squared}

/** SQL surface for the native vector kernels: registers `vector_dot`
  * and `vector_l2sq` so `spark.sql("SELECT vector_dot(emb, qv) ...")`
  * works anywhere the DataFrame API does.
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
        args(1).eval().asInstanceOf[Number].intValue)))

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
