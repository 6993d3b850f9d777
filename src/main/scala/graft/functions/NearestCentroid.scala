package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A broadcast-resident centroid set: ids + row-major matrix (double —
  * float centroids are widened once at collect time, exactly as the
  * per-element `cast to double` the join formulation performed). */
final case class CentroidSet(cids: Array[Long], mat: Array[Array[Double]])
    extends Serializable

/** Shared interpreted/codegen kernel for [[NearestCentroid]]. An `object`
  * with no companion class compiles to static forwarders, so generated
  * Java can call `graft.functions.VecUtil.nearestCentroid(...)` directly. */
object VecUtil {

  /** Spark's `round(x, 6)` for doubles, bit for bit
    * (BigDecimal.valueOf → HALF_UP → doubleValue). */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Argmin over centroids of round6(‖emb − c‖²), ties to the smallest
    * centroid_id — the exact semantics of the former
    * `min(struct(round(l2Sq(emb, c_emb), 6), centroid_id))` aggregate,
    * with identical left-to-right double accumulation and identical
    * rounding, so oracle hashes are unchanged.
    *
    * Returns null (no assignment) when the embedding is null-element,
    * or when no centroid matches the embedding's length — mirroring the
    * join formulation where a NULL distance poisons every candidate. */
  def nearestCentroid(emb: ArrayData, embIsDouble: Boolean, cs: CentroidSet): InternalRow = {
    val n = emb.numElements()
    var bestCid = -1L
    var bestDist = 0.0
    var found = false
    var c = 0
    while (c < cs.mat.length) {
      val ce = cs.mat(c)
      if (ce.length == n) {
        var acc = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (emb.isNullAt(i)) ok = false
          else {
            val x = if (embIsDouble) emb.getDouble(i) else emb.getFloat(i).toDouble
            val d = x - ce(i)
            acc += d * d
            i += 1
          }
        }
        if (ok) {
          val dist = round6(acc)
          if (!found || dist < bestDist || (dist == bestDist && cs.cids(c) < bestCid)) {
            found = true
            bestDist = dist
            bestCid = cs.cids(c)
          }
        }
      }
      c += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestCid, bestDist))
  }
}

/** Nearest-centroid assignment as a single narrow codegen'd expression —
  * the map-only re-expression of IVF assignment (SURVEY.md §4; reference
  * HNSW insert loop, Program.cs:141-204, whose distance scan this
  * replaces).
  *
  * The former formulation (crossJoin(broadcast(cents)) → min(struct))
  * was already broadcast-based but still paid a full groupBy(vec_id)
  * exchange to collapse the k candidates per vector. Centroids are
  * kB–MB scale by construction (k ≪ n), so the whole argmin fits in one
  * expression over a Broadcast handle: scan → project, zero shuffles,
  * and the task binary carries only the broadcast id, not the matrix.
  *
  * Output: struct(centroid_id long, dist double) where
  * dist = round(‖emb − c‖², 6) of the winning centroid.
  */
case class NearestCentroid(child: Expression, bc: Broadcast[CentroidSet])
    extends UnaryExpression {

  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> input, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  private def embIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any): Any =
    VecUtil.nearestCentroid(a.asInstanceOf[ArrayData], embIsDouble, bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", bc,
      classOf[Broadcast[CentroidSet]].getName)
    val r = ctx.freshName("ncRow")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.VecUtil.nearestCentroid(
         |    $c, $embIsDouble, (graft.functions.CentroidSet) $bcRef.value());
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
