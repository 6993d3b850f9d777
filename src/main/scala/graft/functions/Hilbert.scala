package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D integer point — the locality-better
  * sibling of [[graft.operators.Layout.zValue]]'s Morton interleave
  * (and what Delta OPTIMIZE grew after ZORDER for exactly that
  * reason): the Hilbert curve never takes the Morton curve's long
  * diagonal jumps, so consecutive curve positions are ALWAYS adjacent
  * cells and the per-row-group bounding boxes it induces are tighter
  * on both dimensions (LayoutSpec measures the box-area win on the
  * same data).
  *
  * The classic iterative quadrant-rotation walk (Wikipedia's `xy2d`,
  * from Butz 1971): `bits` steps of reflect-and-swap state updates.
  * That loop is the reason this is an EXPRESSION, not a Column fold: a
  * fold would rebind x and y through `bits` levels of `when`, doubling
  * the tree per level (the rotation references each input twice) —
  * exponential plan size by bits = 10. Here it is a ~10-instruction
  * Java loop inside whole-stage codegen; the DuckDB oracle mirrors it
  * as one generated CTE per step, where SQL's named columns provide
  * the same sharing.
  */
object Hilbert {
  /** Hilbert curve position of (x, y) on the 2^bits × 2^bits grid.
    * Inputs must be in [0, 2^bits); the caller gates the domain. */
  def hilbertIndex(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is canonical
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    toCol(HilbertIndex(toExpr(a), toExpr(b), bits))
  }
}

/** Codegen'd two-argument Hilbert index (bits is plan-time constant). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.hilbertIndex(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.Hilbert.hilbertIndex($a, $b, $bits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
