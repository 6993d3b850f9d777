package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CentroidSet
import graft.functions.NearestCentroid
import org.apache.spark.sql.graftbridge.SqlBridge

/** Product quantization — the memory-compressed ANN path that
  * complements IVF ([[Ivf]]): each vector is encoded as `m` small
  * integer codes (one per subspace), and search runs against the codes
  * via an asymmetric distance computation (ADC) lookup table instead of
  * the raw floats. (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the public-paper basis.)
  *
  * Scale story (the reason PQ exists at 100 TB): a 64-float embedding is
  * 256 bytes; its 8 codes are 8 bytes — a 32× smaller candidate table,
  * so the ADC scan reads ~3 TB where the exact scan reads 100 TB, and
  * the codes table of a billion-vector corpus fits in cluster page
  * cache. Codebooks are kB-scale (m × k × sub-dim doubles) and ride a
  * broadcast; encoding is a narrow, zero-shuffle, whole-stage-codegen'd
  * argmin per subspace (the same [[NearestCentroid]] kernel as IVF
  * assignment, fed with array slices); search is a narrow
  * lookup-table sum followed by `TakeOrderedAndProject`. Nothing here
  * shuffles except the final k-row-per-partition top-k merge.
  *
  * Codebook selection is deterministic (every `step`-th vector, code id
  * = vec_id / step — the same stride policy as [[Ivf.centroids]]) so
  * every stage is oracle-checkable; swapping in Lloyd-refined codebooks
  * ([[Ivf.refineCentroids]] per subspace) changes recall, not shape.
  */
object Pq {

  private def widen(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case n: Number => n.doubleValue()
    case null => Double.NaN
  }

  /** Per-subspace codebooks collected once, driver-side (k ≪ n rows —
    * the same bounded collect as [[Ivf.collectCentroids]]): subspace j
    * holds the j-th `dim/m` slice of every stride vector, code id =
    * vec_id / step. Source vectors whose length differs from the modal
    * dimension are excluded (they cannot slice consistently). */
  def codebooks(vectors: DataFrame, step: Int, m: Int): Seq[CentroidSet] = {
    val rows = vectors.filter(pmod(col("vec_id"), lit(step.toLong)) === 0)
      .select((col("vec_id") / step).cast("long").as("code"), col("embedding"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .sortBy(_.getLong(0))
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map(widen).toArray)
    val dim = rows.headOption.map(_._2.length).getOrElse(m)
    require(dim % m == 0, s"embedding dim $dim not divisible by $m subspaces")
    val sub = dim / m
    val uniform = rows.filter(_._2.length == dim)
    (0 until m).map { j =>
      CentroidSet(
        uniform.map(_._1),
        uniform.map { case (_, v) => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub) })
    }
  }

  private def subDim(cbs: Seq[CentroidSet]): Int =
    cbs.head.mat.headOption.map(_.length).getOrElse(0)

  /** PQ encode: vec_id + one code column per subspace (`c0`…`c{m-1}`),
    * each a [[NearestCentroid]] argmin over that subspace's broadcast
    * codebook — m narrow codegen'd expressions, zero shuffles. Rows
    * whose embedding cannot be encoded (null / off-dimension) are
    * dropped: they have no code representation. */
  def encode(vectors: DataFrame, cbs: Seq[CentroidSet]): DataFrame = {
    val sub = subDim(cbs)
    val sc = vectors.sparkSession.sparkContext
    val codeCols = cbs.zipWithIndex.map { case (cs, j) =>
      SqlBridge.column(NearestCentroid(
        SqlBridge.expression(slice(col("embedding"), j * sub + 1, sub)),
        sc.broadcast(cs))).getField("centroid_id").as(s"c$j")
    }
    vectors.select(col("vec_id") +: codeCols: _*)
      .where(cbs.indices.map(j => col(s"c$j").isNotNull).reduce(_ && _))
  }

  /** ADC distance lookup tables for one query: dtab(j)(code) =
    * round(‖q_sub_j − codebook_j(code)‖², 6), indexed densely by code
    * id. Tiny (m × k doubles) — computed driver-side exactly like any
    * ANN engine does per query, then shipped as array literals so the
    * scan-side sum stays inside whole-stage codegen. */
  def distTables(cbs: Seq[CentroidSet], q: Array[Double]): Seq[Array[Double]] = {
    val sub = subDim(cbs)
    require(q.length == sub * cbs.length,
      s"query dim ${q.length} != ${sub * cbs.length}")
    cbs.zipWithIndex.map { case (cs, j) =>
      val size = if (cs.cids.isEmpty) 0 else cs.cids.max.toInt + 1
      val dt = Array.fill(size)(Double.NaN)
      var i = 0
      while (i < cs.cids.length) {
        val ce = cs.mat(i)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = q(j * sub + d) - ce(d)
          acc += diff * diff
          d += 1
        }
        dt(cs.cids(i).toInt) = graft.functions.VecUtil.round6(acc)
        i += 1
      }
      dt
    }
  }

  /** ADC top-k search: approx dist = Σ_j dtab_j(code_j), evaluated as a
    * literal-array lookup per subspace over the ENCODED table — the scan
    * never touches the float embeddings. Ascending L2 top-k with vec_id
    * tie-break via `TakeOrderedAndProject`. `query` is a 1-row frame
    * with column `qv` (see [[Knn.queryVector]]). */
  def searchAdc(encoded: DataFrame, cbs: Seq[CentroidSet], query: DataFrame,
                k: Int): DataFrame = {
    val q = query.collect() match {
      case Array(row) => row.getSeq[Any](0).map(widen).toArray
      case other => throw new IllegalArgumentException(
        s"query must be exactly 1 row, got ${other.length}")
    }
    val dtabs = distTables(cbs, q)
    val approx = dtabs.zipWithIndex.map { case (dt, j) =>
      element_at(array(dt.toSeq.map(lit): _*), col(s"c$j").cast("int") + 1)
    }.reduce(_ + _)
    encoded
      .select(col("vec_id"), round(approx, 6).as("approx_dist"))
      .orderBy(asc("approx_dist"), asc("vec_id"))
      .limit(k)
  }
}
