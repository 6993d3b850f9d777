package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * The hot kernels (`dot`, `l2Sq`) are native codegen'd Catalyst
  * expressions ([[DotProduct]]/[[L2Squared]]) — a tight Java loop inside
  * whole-stage codegen. The equivalent higher-order-function
  * formulations are kept as `*Hof` for differential tests: HOFs are
  * CodegenFallback (interpreted), which costs ~3× on similarity joins
  * that evaluate millions of pairs.
  *
  * Replaces the reference's scalar loops (reference Program.cs:87 cast,
  * HNSW.Net DotProductDistance at Program.cs:207-227): at 100 TB the
  * distance kernel must run inside codegen on the executors, never as a
  * deserialized lambda.
  *
  * All arithmetic is widened to double BEFORE multiply/accumulate so the
  * DuckDB oracle (which casts to DOUBLE[]) accumulates identically.
  */
object VectorFunctions {

  /** array<float> → array<double> (the reference's embedding cast,
    * Program.cs:87, direction reversed). */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  import org.apache.spark.sql.graftbridge.SqlBridge.{column => toCol, expression => expr}

  /** Dot product, double accumulation, left-to-right (codegen'd). */
  def dot(a: Column, b: Column): Column = toCol(DotProduct(expr(a), expr(b)))

  /** Squared L2 distance (codegen'd). */
  def l2Sq(a: Column, b: Column): Column = toCol(L2Squared(expr(a), expr(b)))

  /** Element-wise difference a−b → array<double> (codegen'd) — the
    * residual kernel for residual IVF-PQ. */
  def vecSub(a: Column, b: Column): Column = toCol(VectorSub(expr(a), expr(b)))

  /** Interpreted HOF twin of [[dot]] — differential-test baseline. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Interpreted HOF twin of [[l2Sq]] — differential-test baseline. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (codegen'd; bit-identical to
    * dot/(norm·norm) — see [[CosineSim]]). */
  def cosine(a: Column, b: Column): Column = toCol(CosineSim(expr(a), expr(b)))

  /** Three-pass formulation — differential-test baseline for [[cosine]]. */
  def cosineUnfused(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
