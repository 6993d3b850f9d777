package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding tables — the linear
  * companion to the Matryoshka prefix trick (Knn.topKPrefixRerank,
  * q66): where MRL assumes the embedding was TRAINED front-loaded,
  * PCA makes any embedding front-loaded after the fact, so the same
  * narrow-scan-then-rerank serving plans apply to models that never
  * heard of MRL. Also the standard pre-compression step ahead of the
  * PQ ladder (FAISS's PCAMatrix + IVFPQ composition).
  *
  * Train/serve split follows the OPQ pattern ([[Pq.learnRotation]]):
  * FIT is driver-side over a bounded deterministic stride sample
  * (breeze SVD of the centered sample — a fixed-size job at any
  * corpus scale, like every tokenizer/codebook/rotation train step);
  * PROJECT is distributed — `nComponents` codegen'd broadcast-literal
  * dot kernels per row ([[Pq.rotateWith]]'s plan shape), zero
  * shuffles, and the mean-centering folds into a per-component SCALAR
  * subtraction (dot(v − μ, w) = dot(v, w) − dot(μ, w)) so the hot
  * loop never materializes a centered vector. */
object Pca {

  /** Fitted model: sample mean, top-c principal directions (rows,
    * orthonormal), and the fraction of sample variance each explains
    * (non-increasing). */
  final case class PcaModel(mean: Array[Double],
                            components: Seq[Array[Double]],
                            varianceExplained: Seq[Double])
      extends Serializable

  private def widen(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case other => other.toString.toDouble
  }

  def fit(vectors: DataFrame, sampleStride: Int, nComponents: Int,
          dim: Int = 64): PcaModel = {
    import breeze.linalg.{svd, DenseMatrix}
    require(nComponents >= 1 && nComponents <= dim,
      s"nComponents must be in [1, $dim], got $nComponents")
    // svd.reduced below, NOT svd(): the full decomposition materializes
    // an n×n U for an n×dim sample — 800 MB and 38 s at a 10 k-row
    // sample (measured, sf1 sweep) for a U this fit never reads; the
    // thin SVD is O(n·dim²) and returns only the dim-sized factors.
    val x = vectors
      .where(Pq.cleanVec(col("embedding"), dim))
      .filter(pmod(col("vec_id"), lit(sampleStride.toLong)) === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Any](1).map(widen).toArray)
    require(x.length > 1, s"need > 1 sample rows, got ${x.length}")
    val n = x.length
    val mean = Array.tabulate(dim) { j =>
      var acc = 0.0; var i = 0
      while (i < n) { acc += x(i)(j); i += 1 }
      acc / n
    }
    val centered = DenseMatrix.tabulate(n, dim)((i, j) => x(i)(j) - mean(j))
    val s = svd.reduced(centered)
    val comps = (0 until nComponents)
      .map(i => Array.tabulate(dim)(j => s.Vt(i, j)))
    val k = math.min(n, dim)
    val total = (0 until k).map(i => s.S(i) * s.S(i)).sum
    val ve = (0 until nComponents).map(i =>
      if (total == 0.0) 0.0 else s.S(i) * s.S(i) / total)
    PcaModel(mean, comps, ve)
  }

  /** Project every row onto the model's components: (vec_id, pc0..pc_{c-1}),
    * round-6. Dirty rows (null / off-dim / null-element) drop as
    * everywhere else in the vector family. */
  def project(vectors: DataFrame, model: PcaModel): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val dim = model.mean.length
    val cols = model.components.zipWithIndex.map { case (comp, i) =>
      // dot(v − μ, w) = dot(v, w) − dot(μ, w): the right term is a
      // driver-side scalar, so centering costs zero per-row work
      val offset = {
        var acc = 0.0; var j = 0
        while (j < dim) { acc += comp(j) * model.mean(j); j += 1 }
        acc
      }
      round(dot(col("embedding"), typedlit(comp.toSeq)) - offset, 6).as(s"pc$i")
    }
    vectors.where(Pq.cleanVec(col("embedding"), dim))
      .select(col("vec_id") +: cols: _*)
      .orderBy("vec_id")
  }

  /** Fit + project in one call (q94): the assembled reduce-then-serve
    * input every IVF/PQ build in this repo can consume directly (the
    * projected frame renames to `embedding` via [[asEmbedding]]). */
  def fitProject(vectors: DataFrame, sampleStride: Int, nComponents: Int,
                 dim: Int = 64): DataFrame =
    project(vectors, fit(vectors, sampleStride, nComponents, dim))

  /** Repack a [[project]]ed frame as (vec_id, embedding) so the ANN
    * ladder composes on reduced vectors unchanged. */
  def asEmbedding(projected: DataFrame): DataFrame = {
    val pcs = projected.columns.filter(_.startsWith("pc"))
      .sortBy(_.drop(2).toInt) // numeric order: pc10 after pc9, not after pc1
    projected.select(col("vec_id"),
      array(pcs.map(c => col(c).cast("double")): _*).as("embedding"))
  }
}
