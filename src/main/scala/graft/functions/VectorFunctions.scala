package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (`zip_with`/`aggregate`/`transform`) — whole-stage
  * codegen'd, no UDFs, no row-by-row driver work.
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

  /** Dot product, double accumulation, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
