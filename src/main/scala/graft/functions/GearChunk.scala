package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a gear rolling hash (Xia et al., the
  * FastCDC/Ddelta gear construction; USENIX ATC 2016) — the
  * SHIFT-ROBUST unit of dedup. Fixed-size blocks and fixed-offset
  * n-grams both misalign after a single inserted byte: every boundary
  * downstream moves, nothing matches. Gear chunking cuts where the
  * CONTENT says to (rolling hash of the last 8 bytes hits a zero mask),
  * so one insertion perturbs at most the chunk it lands in — the
  * property that makes storage dedup, rsync, and crawl-snapshot diffing
  * work, and that the engine's shingle/suffix-array rungs don't give
  * at byte granularity.
  *
  * Determinism: the 256-entry gear table is a fixed splitmix64 fill of
  * seed 0x9E3779B97F4A7C15 — a public constant construction, identical
  * on every JVM; chunk boundaries and hashes are a pure function of the
  * byte stream. Cut rule: boundary when `(h & mask) == 0` at length ≥
  * `minLen`; forced at `maxLen` (the classic min/avg/max discipline —
  * mask of `avgBits` ones gives expected chunk ≈ 2^avgBits bytes past
  * the minimum).
  *
  * The expression returns `array<struct<off:int, len:int, h:bigint>>`
  * per document (chunk hash = running 64-bit FNV-1a of the chunk's
  * bytes — content identity, NOT the boundary gear state, which only
  * decides where to cut). Codegen'd via a static kernel. */
object GearChunk {

  /** splitmix64-filled gear table (seed = the golden-ratio constant). */
  private[graft] val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Static chunker over raw bytes: (offset, length, fnv1a64) per
    * chunk. Pure function; the differential target for GearChunkSpec
    * and the codegen kernel. */
  def chunksOf(bytes: Array[Byte], avgBits: Int, minLen: Int,
      maxLen: Int): Array[(Int, Int, Long)] = {
    require(avgBits >= 1 && avgBits <= 48, s"avgBits out of range: $avgBits")
    require(minLen >= 1 && maxLen >= minLen,
      s"need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")
    val mask = (1L << avgBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var start = 0
    var h = 0L
    var fnv = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      h = (h << 1) + gear(b)
      fnv = (fnv ^ b) * 0x100000001B3L
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen ||
        i == bytes.length - 1) {
        out += ((start, len, fnv))
        start = i + 1
        h = 0L
        fnv = 0xCBF29CE484222325L
      }
      i += 1
    }
    out.toArray
  }

  /** Codegen kernel: ArrayData of InternalRow(off, len, h). */
  def chunkRows(text: UTF8String, avgBits: Int, minLen: Int,
      maxLen: Int): ArrayData = {
    val chunks = chunksOf(text.getBytes, avgBits, minLen, maxLen)
    new GenericArrayData(chunks.map { case (off, len, h) =>
      InternalRow(off, len, h)
    }.asInstanceOf[Array[Any]])
  }

  val chunkType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  def gearChunks(text: Column, avgBits: Int, minLen: Int,
      maxLen: Int): Column =
    SqlBridge.column(GearChunksExpr(SqlBridge.eagerExpression(text),
      avgBits, minLen, maxLen))
}

/** Content-defined chunk list of a string column — codegen'd. */
case class GearChunksExpr(child: Expression, avgBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {
  override def dataType: DataType = GearChunk.chunkType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got $t")
  }
  override protected def nullSafeEval(input: Any): Any =
    GearChunk.chunkRows(input.asInstanceOf[UTF8String], avgBits, minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.GearChunk.chunkRows($t, $avgBits, $minLen, $maxLen)")
  override protected def withNewChildInternal(c: Expression): GearChunksExpr =
    copy(child = c)
  override def prettyName: String = "gear_chunks"
}
