package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Second-moment matrix of a vector column as ONE native aggregate —
  * the covariance-feeding primitive behind q170's effective-dimension
  * dial. The naive formulations both materialize the n·dim² product
  * stream as ROWS (a vec_id self-join shuffles n·dim rows; a nested
  * `transform` explode allocates 4 096 boxed values per vector and
  * pays two BigDecimal roundings per PRODUCT — 82 M of each at
  * sf0.1, measured 5-7 s where DuckDB's vectorized mirror runs 0.5 s).
  * Here the products never exist as rows: the
  * [[TypedImperativeAggregate]] buffer holds the running (Σx_d,
  * Σx_d·x_e, n) integer sums, updates run a tight primitive-long
  * double loop per vector, and ObjectHashAggregate ships ONE
  * (dim²+dim+1)-long buffer per task at the partial/final exchange —
  * the map-side-combine shape a 100 TB moment pass needs.
  *
  * Determinism contract (shared with the SQL oracle): each COMPONENT
  * quantizes to 5-dp integer units (two-step HALF_UP, the engine-
  * portable double-round guard), and all sums are exact integer
  * arithmetic on those units — component quantization costs dim
  * BigDecimal roundings per row instead of dim², and makes every
  * product an exact long. Bounds: |x| ≤ ~10 gives |X5| ≤ 10⁶,
  * products ≤ 10¹², so sums stay inside 2⁶³ up to ~10⁶ vectors per
  * aggregate at that magnitude (unit-norm embeddings: ~10⁸) — beyond
  * that, shard the collection and merge moment buffers, which is what
  * the aggregate's merge already does.
  *
  * Null/dirty rows (null array, wrong dim, null element) are skipped
  * whole — the PQ-family guard, applied inside the aggregate so the
  * moment matrix can never mix a partial row in.
  *
  * Layout of the emitted array&lt;long&gt;: [n, sx(0..dim-1),
  * sxy(0..dim²-1) row-major].
  */
object MomentMatrix {

  /** Two-step HALF_UP quantization to 5-dp integer units — the exact
    * JVM mirror of `round(round(x, 5) * 1e5, 0)` in Spark SQL and
    * DuckDB. */
  def quant5(x: Double): Long = {
    val r5 = JBigDecimal.valueOf(x).setScale(5, RoundingMode.HALF_UP).doubleValue()
    JBigDecimal.valueOf(r5 * 1e5).setScale(0, RoundingMode.HALF_UP).longValue()
  }

  final class MomentBuffer(val dim: Int) {
    var n: Long = 0L
    val sx: Array[Long] = new Array[Long](dim)
    val sxy: Array[Long] = new Array[Long](dim * dim)

    def update(q: Array[Long]): Unit = {
      n += 1L
      var d = 0
      while (d < dim) {
        sx(d) += q(d)
        val row = d * dim
        val qd = q(d)
        var e = 0
        while (e < dim) { sxy(row + e) += qd * q(e); e += 1 }
        d += 1
      }
    }

    def merge(o: MomentBuffer): Unit = {
      n += o.n
      var i = 0
      while (i < dim) { sx(i) += o.sx(i); i += 1 }
      i = 0
      while (i < dim * dim) { sxy(i) += o.sxy(i); i += 1 }
    }

    def toArray: Array[Long] = (n +: sx) ++ sxy

    def serialize: Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 8 * (1 + dim + dim * dim))
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(dim)
      buf.putLong(n)
      sx.foreach(buf.putLong)
      sxy.foreach(buf.putLong)
      buf.array()
    }
  }

  object MomentBuffer {
    def deserialize(bytes: Array[Byte]): MomentBuffer = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val b = new MomentBuffer(buf.getInt)
      b.n = buf.getLong
      var i = 0
      while (i < b.dim) { b.sx(i) = buf.getLong; i += 1 }
      i = 0
      while (i < b.dim * b.dim) { b.sxy(i) = buf.getLong; i += 1 }
      b
    }
  }

  private case class MomentMatrixAgg(
      child: Expression,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentBuffer] {

    override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(dim)

    override def update(buffer: MomentBuffer, row: InternalRow): MomentBuffer = {
      val v = child.eval(row)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        if (arr.numElements() == dim) {
          val q = new Array[Long](dim)
          var d = 0
          var clean = true
          while (clean && d < dim) {
            if (arr.isNullAt(d)) clean = false
            else { q(d) = quant5(arr.getDouble(d)); d += 1 }
          }
          if (clean) buffer.update(q)
        }
      }
      buffer
    }

    override def merge(buffer: MomentBuffer, input: MomentBuffer): MomentBuffer = {
      buffer.merge(input); buffer
    }
    override def eval(buffer: MomentBuffer): Any =
      new GenericArrayData(buffer.toArray)
    override def serialize(buffer: MomentBuffer): Array[Byte] = buffer.serialize
    override def deserialize(bytes: Array[Byte]): MomentBuffer =
      MomentBuffer.deserialize(bytes)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def children: Seq[Expression] = Seq(child)
    override def withNewMutableAggBufferOffset(o: Int): MomentMatrixAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MomentMatrixAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): MomentMatrixAgg = copy(child = c.head)
    override def prettyName: String = "moment_matrix"
  }

  /** Column API: moment sums of an array&lt;double&gt; column —
    * [n, Σx_d …, Σx_d·x_e …] in 5-dp integer units. */
  def momentMatrix(c: Column, dim: Int): Column =
    SqlBridge.column(
      MomentMatrixAgg(SqlBridge.eagerExpression(c), dim).toAggregateExpression())
}
