package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * mergeable FREQUENCY state, the point-query face beside
  * [[ThetaSketch]]'s distinct-count face: "how often did this term
  * occur" answered from d·w counters instead of a term-grain shuffle.
  *
  * State: a d×w grid of longs; each update increments one counter per
  * row (bucket = a per-row hash of the term). Point query = min over
  * the d counters — NEVER an underestimate, overestimate bounded by
  * ε·N with ε = e/w at failure probability e^−d. Merge is elementwise
  * addition, so the sketch is order-invariant and map-side
  * combinable: at 100 TB each task ships one fixed-size grid to a
  * single-row final aggregate — the corpus-frequency question answered
  * with ZERO token-grain exchange (the exact path shuffles every
  * distinct term; the sketch path shuffles d·w longs per task).
  *
  * Determinism contract (what makes the DuckDB oracle possible): the
  * d row hashes are carved from ONE md5 of the term — row i's bucket
  * is hex chars [1+7i, 7+7i) of md5(term) as an integer, mod w (28
  * bits per row, d ≤ 4) — so both engines compute bit-identical grids
  * from the same corpus with no RNG anywhere. Buckets reuse the
  * [[graft.operators.Dedup.hash60]] md5-prefix convention, shifted to
  * disjoint hex windows so the d rows are independent functions.
  *
  * The aggregate is a [[TypedImperativeAggregate]] (long-array buffer,
  * serialized only at the exchange); the point query is a codegen'd
  * binary expression over the serialized bytes. */
object CountMin {

  /** Hex window width per row: 7 hex chars = 28 bits, < 2³¹. */
  private val HexPerRow = 7

  /** Max rows an md5 (32 hex chars) can feed at 7 chars per row. */
  val MaxDepth: Int = 4

  private def md5Hex(term: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Row-i bucket of a term: md5 hex chars [7i, 7i+7) as an int, mod w
    * (mirrored in SQL as `('0x' || substr(md5(term), 1 + 7*i, 7))::BIGINT
    * % w` — substr is 1-based there, 0-based here). */
  private[graft] def bucketOf(hex: String, row: Int, w: Int): Int =
    (java.lang.Long.parseLong(hex.substring(HexPerRow * row,
      HexPerRow * (row + 1)), 16) % w).toInt

  /** Mutable d×w counter grid. */
  final class Cms(val d: Int, val w: Int) {
    require(d >= 1 && d <= MaxDepth, s"depth must be in [1, $MaxDepth], got $d")
    require(w >= 2, s"width must be >= 2, got $w")
    val tab: Array[Long] = new Array[Long](d * w)

    def add(term: String, count: Long): Unit = {
      val hex = md5Hex(term)
      var i = 0
      while (i < d) { tab(i * w + bucketOf(hex, i, w)) += count; i += 1 }
    }

    def merge(other: Cms): Unit = {
      require(other.d == d && other.w == w,
        s"cannot merge CMS($d,$w) with CMS(${other.d},${other.w})")
      var i = 0
      while (i < tab.length) { tab(i) += other.tab(i); i += 1 }
    }

    def serialize: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * tab.length)
      bb.putInt(d)
      bb.putInt(w)
      var i = 0
      while (i < tab.length) { bb.putLong(tab(i)); i += 1 }
      bb.array()
    }
  }

  object Cms {
    def deserialize(bytes: Array[Byte]): Cms = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val sk = new Cms(bb.getInt, bb.getInt)
      var i = 0
      while (i < sk.tab.length) { sk.tab(i) = bb.getLong; i += 1 }
      sk
    }
  }

  /** Inner-product estimate over two serialized grids of IDENTICAL
    * (d, w): min over rows i of Σ_j A[i][j]·B[i][j] — the
    * Cormode-Muthukrishnan §4.2 join-size estimator. For streams A, B
    * over a shared key domain this upper-bounds Σ_k fA(k)·fB(k) = the
    * equi-join output cardinality, with overestimate ≤ ε·N_A·N_B at
    * the usual e^−d confidence (collisions only ADD mass — one-sided,
    * like the point query). Codegen target.
    *
    * Overflow contract: per-row dot mass is ~N_A·N_B/w, which can
    * exceed 2^63 when both stream cardinalities pass ~2·10^14 at the
    * default grid — so the accumulation is EXACT arithmetic that
    * throws ArithmeticException on overflow (the same loud failure
    * DuckDB's BIGINT multiply raises in the mirror) instead of
    * silently wrapping negative in the regime the estimator serves. */
  def innerProductOf(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    val d = ba.getInt
    val w = ba.getInt
    require(bb.getInt == d && bb.getInt == w,
      s"cannot inner-product CMS grids of different shapes")
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      var s = 0L
      var j = 0
      while (j < w) {
        val idx = 8 + 8 * (i * w + j)
        s = Math.addExact(s, Math.multiplyExact(ba.getLong(idx), bb.getLong(idx)))
        j += 1
      }
      if (s < best) best = s
      i += 1
    }
    best
  }

  /** Point query over serialized bytes: min over the d row counters —
    * an upper bound on the true count (codegen target). */
  def estimateOf(bytes: Array[Byte], term: UTF8String): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    val hex = md5Hex(term.toString)
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = bb.getLong(8 + 8 * (i * w + bucketOf(hex, i, w)))
      if (c < best) best = c
      i += 1
    }
    best
  }

  // ---- aggregate ----

  private case class CountMinAgg(
      child: Expression,
      d: Int,
      w: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[Cms] {
    // analysis-time rejection of non-string children — without this a
    // misuse fails at EXECUTION with a ClassCastException on the
    // UTF8String cast in update() (ExpectsInputTypes is private[sql],
    // so the check is spelled directly)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a STRING column, got ${child.dataType.catalogString}")
    override def createAggregationBuffer(): Cms = new Cms(d, w)
    override def update(buffer: Cms, row: InternalRow): Cms = {
      val v = child.eval(row)
      if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
      buffer
    }
    override def merge(buffer: Cms, input: Cms): Cms = { buffer.merge(input); buffer }
    override def eval(buffer: Cms): Any = buffer.serialize
    override def serialize(buffer: Cms): Array[Byte] = buffer.serialize
    override def deserialize(bytes: Array[Byte]): Cms = Cms.deserialize(bytes)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): CountMinAgg = copy(child = c.head)
    override def prettyName: String = "count_min_sketch"
  }

  /** Column API: CMS of a STRING term column. */
  def cmsSketch(c: Column, d: Int, w: Int): Column =
    SqlBridge.column(
      CountMinAgg(SqlBridge.eagerExpression(c), d, w).toAggregateExpression())

  def cmsEstimate(sketch: Column, term: Column): Column =
    SqlBridge.column(CmsEstimate(
      SqlBridge.eagerExpression(sketch), SqlBridge.eagerExpression(term)))

  def cmsInnerProduct(a: Column, b: Column): Column =
    SqlBridge.column(CmsInnerProduct(
      SqlBridge.eagerExpression(a), SqlBridge.eagerExpression(b)))
}

/** Point-query estimate of a serialized CMS for a term — codegen'd. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, string) input, got ($l, $r)")
    }
  override protected def nullSafeEval(sk: Any, term: Any): Any =
    CountMin.estimateOf(sk.asInstanceOf[Array[Byte]], term.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CountMin.estimateOf($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

/** Join-size estimate of two same-shape serialized CMS grids — codegen'd. */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, binary) input, got ($l, $r)")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CountMin.innerProductOf(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CountMin.innerProductOf($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsInnerProduct = copy(left = l, right = r)
  override def prettyName: String = "cms_inner_product"
}
