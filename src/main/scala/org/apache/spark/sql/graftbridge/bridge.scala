package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression and DataFrame ↔ LogicalPlan bridges for the
  * Spark 4 API.
  *
  * Spark 4 Columns are ColumnNode-backed and the classic converters are
  * `private[sql]`; exposing them from inside `org.apache.spark.sql` is
  * the conventional pattern for Catalyst-extension libraries (the same
  * trick every open-source Spark expression library uses — there is no
  * public API for wrapping a custom Expression in a Column or a custom
  * LogicalPlan in a DataFrame yet).
  */
object SqlBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager Column → catalyst Expression conversion. `expression` wraps
    * the ColumnNode lazily (ColumnNodeExpression), which is fine inside
    * Spark's own operators but not serializable for closures of custom
    * physical operators; this converts through to real catalyst nodes
    * (e.g. a `.desc` Column becomes a catalyst SortOrder). */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzedPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a (possibly custom) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `Dataset.localCheckpoint` that does NOT attach the input plan's
    * estimated statistics to the resulting leaf.
    *
    * Why this exists: `SizeInBytesOnlyStatsPlanVisitor.visitJoin`
    * MULTIPLIES child sizes, and `Dataset.checkpoint` bakes the
    * resulting BigInt into the new `LogicalRDD`'s `originStats`. In an
    * iterative algorithm (prefix doubling, pointer-jumped connected
    * components) each round's leaf therefore carries the PRODUCT of the
    * previous round's numbers — the digit count of the estimate grows
    * geometrically with rounds, and the driver ends up spending minutes
    * inside `BigInteger.multiply` at PLANNING time (observed: a 27+ min
    * planning stall on a dup-heavy corpus, main thread pinned in
    * ToomCook3 multiplication). Building the `LogicalRDD` with
    * `originStats = None` makes every checkpoint leaf fall back to
    * `defaultSizeInBytes` — estimates stay word-sized forever, and AQE
    * still plans real sizes from runtime shuffle statistics.
    *
    * Mechanics mirror `Dataset.checkpoint(reliableCheckpoint = false)`:
    * copy the unsafe rows (the scan reuses mutable buffers), mark the
    * RDD for local checkpoint, optionally materialize eagerly. */
  def leanCheckpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = cds.sparkSession
    val internalRdd = cds.queryExecution.toRdd.map(_.copy())
    internalRdd.localCheckpoint()
    if (eager) internalRdd.count()
    // attach the input's estimate CAPPED at Long.MaxValue: truthful (so
    // small frames keep qualifying for broadcast joins) but bounded, so
    // the digit count can never snowball — between two capped leaves a
    // plan multiplies at most ~cap^(leaf count), a few hundred digits,
    // re-capped at the next checkpoint
    val capped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = cds.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)))
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      cds.queryExecution.analyzed.output, internalRdd)(
      spark, originStats = Some(capped))
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }
}
