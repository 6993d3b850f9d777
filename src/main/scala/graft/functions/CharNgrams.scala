package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string as array<string> — the bigram
  * generator for [[graft.operators.LanguageModel]].
  *
  * The `transform(sequence(1, length(text)-1), i -> substring(text, i,
  * 2))` HOF formulation is semantically identical but runs interpreted
  * (HOFs are CodegenFallback) and re-walks the substring expression
  * tree per element — measured ~4 s for q38 at sf0.1 vs ~1 s with this
  * expression. Here the row stays inside whole-stage codegen and the
  * generated code calls one static sliding-window pass: char start
  * offsets are computed ONCE per string (UTF-8-aware), each n-gram is a
  * byte-range slice — O(bytes + n-grams), no per-gram re-scan, no
  * per-element expression walk.
  *
  * Returns [] when the string has fewer than n chars; null for null
  * input (null-intolerant unary, matching `range`-based engines where a
  * null length generates no rows).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def prettyName: String = "char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.slide(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams$$.MODULE$$.slide($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  /** Single-pass UTF-8 sliding window; called from both interpreted
    * eval and generated code. */
  def slide(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    // starts(i) = byte offset of char i; starts(nChars) = end.
    val starts = new Array[Int](nChars + 1)
    var i = 0
    var off = 0
    while (off < nBytes) {
      starts(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    starts(nChars) = nBytes
    val out = new Array[Any](nChars - k + 1)
    var j = 0
    while (j <= nChars - k) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + k) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
