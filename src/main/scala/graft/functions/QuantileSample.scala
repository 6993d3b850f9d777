package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Merge-order-INVARIANT quantile sample — the mergeable quantile
  * state for per-group percentiles when the exact histogram-rank
  * scheme (Profile.percentiles, q56) would exchange every distinct
  * value at 100 TB.
  *
  * Construction: keep the k (hash(id), value) pairs with the smallest
  * 64-bit mix of the row's UNIQUE id — a simple random sample without
  * replacement selected by a deterministic hash, i.e. the theta-sketch
  * selection rule applied to SAMPLING with a value payload. Quantile
  * estimates are nearest-rank statistics of the retained sample; rank
  * error is the binomial O(√(q(1−q)/k)) whp, independent of stream
  * size (k=256 → ~3 rank points at the median).
  *
  * Why this over t-digest/KLL here: both of those are merge-ORDER
  * dependent (their compactions fire at buffer boundaries, so shuffle
  * nondeterminism changes the output between runs). Bottom-k-by-hash
  * retention is a pure function of the input SET — any partitioning,
  * any merge tree, same bytes — which keeps this engine's
  * reproducibility contract (every run diffable, every spec exact).
  * The trade is error O(1/√k) instead of KLL's O(log/k); at corpus
  * scale the dial is k.
  *
  * EXACT below k: a group with ≤ k rows retains everything, and the
  * nearest-rank estimate IS the exact percentile — the same
  * unsaturated-regime contract as [[ThetaSketch]]. Ties at the
  * retention boundary order by (hash, value), so duplicate ids cannot
  * make retention ambiguous across merge orders. */
object QuantileSample {

  /** Mutable buffer: the k lexicographically-smallest (hash, value)
    * pairs. */
  final class Samp(val k: Int) {
    val set = new java.util.TreeSet[Array[Long]](
      new java.util.Comparator[Array[Long]] {
        def compare(a: Array[Long], b: Array[Long]): Int = {
          val c = java.lang.Long.compare(a(0), b(0))
          if (c != 0) c else java.lang.Long.compare(a(1), b(1))
        }
      })

    /** splitmix64 finalizer — deterministic id → hash. */
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def add(id: Long, value: Double): Unit = {
      val e = Array(mix(id), java.lang.Double.doubleToLongBits(value))
      if (set.size < k) { set.add(e); () }
      else if (set.comparator.compare(e, set.last) < 0) {
        if (set.add(e)) { set.pollLast(); () }
      }
    }

    def mergeIn(other: Samp): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (set.size < k) { set.add(e); () }
        else if (set.comparator.compare(e, set.last) < 0) {
          if (set.add(e)) { set.pollLast(); () }
        }
      }
    }

    /** Retained sample VALUES, sorted ascending — the eval payload. */
    def sortedValues: Array[Double] = {
      val out = new Array[Double](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) {
        out(i) = java.lang.Double.longBitsToDouble(it.next()(1)); i += 1
      }
      java.util.Arrays.sort(out)
      out
    }

    def serialize: Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + 16 * set.size)
      buf.putInt(k).putInt(set.size)
      val it = set.iterator()
      while (it.hasNext) { val e = it.next(); buf.putLong(e(0)).putLong(e(1)) }
      buf.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Samp = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val s = new Samp(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { s.set.add(Array(buf.getLong(), buf.getLong())); i += 1 }
    s
  }

  private case class QuantileSampleAgg(
      id: Expression,
      value: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[Samp] {
    override def createAggregationBuffer(): Samp = new Samp(k)
    override def update(buffer: Samp, row: InternalRow): Samp = {
      val i = id.eval(row)
      val v = value.eval(row)
      if (i != null && v != null)
        buffer.add(i.asInstanceOf[Long], v.asInstanceOf[Double])
      buffer
    }
    override def merge(buffer: Samp, input: Samp): Samp = {
      buffer.mergeIn(input); buffer
    }
    override def eval(buffer: Samp): Any =
      new GenericArrayData(buffer.sortedValues)
    override def serialize(buffer: Samp): Array[Byte] = buffer.serialize
    override def deserialize(bytes: Array[Byte]): Samp =
      QuantileSample.deserialize(bytes)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def children: Seq[Expression] = Seq(id, value)
    override def withNewMutableAggBufferOffset(o: Int): QuantileSampleAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): QuantileSampleAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): QuantileSampleAgg =
      copy(id = c(0), value = c(1))
    override def prettyName: String = "quantile_sample"
  }

  /** Column API: bottom-k-by-hash(id) value sample, evaluated to the
    * retained values sorted ascending (array<double>). `id` must be a
    * LONG row identity; `value` a DOUBLE. */
  def quantileSample(id: Column, value: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    SqlBridge.column(QuantileSampleAgg(
      SqlBridge.eagerExpression(id), SqlBridge.eagerExpression(value), k)
      .toAggregateExpression())
  }
}
