package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes — the kernel
  * behind the compressibility quality signal (Gopher-class curation
  * drops documents that compress too well: boilerplate, generated
  * spam, and scraped templates all have abnormally low
  * compressed/raw ratios, while natural prose sits in a stable band).
  *
  * Same Expression-over-JDK ladder rung as [[BpeCount]]: no UDF, the
  * per-row deflate runs inside whole-stage codegen via a static
  * helper. Level 6 (zlib default) — the standard reference point for
  * the signal in curation pipelines.
  *
  * NOT oracle-pinnable: DEFLATE output bytes are encoder-version-
  * dependent (the JDK bundles its own zlib), so exact compressed
  * lengths can differ across runtimes even though the SIGNAL — the
  * ordering and rough band of ratios — is stable. The consuming query
  * key is therefore rows-only, with the invariants (monotonicity under
  * repetition, ratio bounds, exact recompute against this helper)
  * spec-pinned instead.
  */
object Deflate {
  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    if (in.isEmpty) return 0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Per-row DEFLATE length as a codegen'd unary expression. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input, got $t")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(s: Any): Any =
    Deflate.deflateLen(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Deflate.deflateLen($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
