package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot kernels.
  *
  * The `zip_with`/`aggregate` higher-order-function formulation
  * (VectorFunctions.dotHof) is semantically identical but runs
  * interpreted — HOFs are CodegenFallback, so every pair comparison in a
  * similarity join walks an expression tree per element. These
  * expressions generate a tight Java loop inside whole-stage codegen
  * instead (the reference's scalar kernel, Program.cs:207-227
  * DotProductOptimized, re-expressed as a codegen'd Catalyst operator —
  * preference (b) of SURVEY.md §4: custom Expression over UDF).
  *
  * Semantics match the HOF formulation bit for bit: elements are widened
  * to double BEFORE multiply/accumulate (a no-op for double inputs),
  * accumulation is left-to-right, and the result is NULL when either
  * array is NULL, the lengths differ, or any element is NULL (zip_with
  * pads the shorter side with NULL and `acc + NULL` poisons the
  * aggregate — we reproduce that exactly so the DuckDB oracle keeps
  * hash-matching). Inputs may be array<float> or array<double>,
  * independently per side.
  */
abstract class FloatVectorFold extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> inputs, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Scalar combine for one element pair, interpreted path. */
  protected def combine(x: Double, y: Double): Double

  /** Java source for one element pair; must mirror [[combine]]. */
  protected def combineCode(acc: String, x: String, y: String): String

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lDouble = elemType(left) == DoubleType
    val rDouble = elemType(right) == DoubleType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lDouble) xs.getDouble(i) else xs.getFloat(i).toDouble
      val y = if (rDouble) ys.getDouble(i) else ys.getFloat(i).toDouble
      acc = acc + combine(x, y)
      i += 1
    }
    acc
  }

  private def getter(arr: String, e: Expression, i: String): String =
    elemType(e) match {
      case DoubleType => s"$arr.getDouble($i)"
      case _          => s"(double) $arr.getFloat($i)"
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${getter(a, left, i)};
         |    final double $y = ${getter(b, right, i)};
         |    $acc = ${combineCode(acc, x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Fused cosine similarity: one array traversal accumulates a·b, a·a
  * and b·b simultaneously, then dot/(√aa·√bb) — bit-identical to the
  * three-expression formulation (each accumulator sums in the same
  * left-to-right order; the final scalar math is the same IEEE ops)
  * but one pass over the vectors instead of three. NULL semantics match
  * [[FloatVectorFold]]. */
case class CosineSim(left: Expression, right: Expression) extends FloatVectorFold {
  override def prettyName: String = "vector_cosine"
  // combine/combineCode are unused: eval and codegen are overridden to
  // carry three accumulators.
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + $x * $y"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lDouble = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    val rDouble = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lDouble) xs.getDouble(i) else xs.getFloat(i).toDouble
      val y = if (rDouble) ys.getDouble(i) else ys.getFloat(i).toDouble
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("dotAcc"); val aa = ctx.freshName("aa"); val bb = ctx.freshName("bb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      def getter(arr: String, e: Expression): String =
        e.dataType.asInstanceOf[ArrayType].elementType match {
          case DoubleType => s"$arr.getDouble($i)"
          case _          => s"(double) $arr.getFloat($i)"
        }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${getter(a, left)};
         |    final double $y = ${getter(b, right)};
         |    $d += $x * $y; $aa += $x * $x; $bb += $y * $y;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $d / (Math.sqrt($aa) * Math.sqrt($bb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ with double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorFold {
  override def prettyName: String = "vector_dot"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + $x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² with double accumulation. */
case class L2Squared(left: Expression, right: Expression) extends FloatVectorFold {
  override def prettyName: String = "vector_l2sq"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + ($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Element-wise vector difference aᵢ−bᵢ → array<double> — the residual
  * kernel for residual-quantized IVF-PQ ([[graft.operators.Pq]]). The
  * `zip_with(a, b, _-_)` HOF twin is CodegenFallback; this generates a
  * primitive double[] loop and wraps it UnsafeArrayData, so a residual
  * feeding m downstream [[NearestCentroid]] argmins stays entirely
  * inside whole-stage codegen. NULL semantics match [[FloatVectorFold]]:
  * NULL result when either side is NULL, lengths differ, or any element
  * is NULL (so dirty rows drop on the same contract as every other
  * vector kernel). */
case class VectorSub(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vector_sub"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> inputs, got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lDouble = elemIsDouble(left)
    val rDouble = elemIsDouble(right)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lDouble) xs.getDouble(i) else xs.getFloat(i).toDouble
      val y = if (rDouble) ys.getDouble(i) else ys.getFloat(i).toDouble
      out(i) = x - y
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      def getter(arr: String, e: Expression): String =
        if (elemIsDouble(e)) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = ${getter(a, left)} - ${getter(b, right)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
