package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Scan / projection / ordering / sampling operators.
  *
  * The reference reads parquet row-group by row-group into typed records
  * (reference Program.cs:43-99), exports a head sample to JSON
  * (Program.cs:102-103) and sorts everything in driver memory
  * (Program.cs:106-107). Here every step stays distributed: the scan is
  * column-pruned by Catalyst, the sample is `ORDER BY key LIMIT n`
  * (TakeOrderedAndProject), and the global index is computed with a
  * range-partitioned two-phase ranking instead of a single-partition sort.
  */
object Scan {

  /** Typed row for the projection path (reference DbPedia.cs:3-11). */
  final case class EmbeddingRow(vec_id: Long, label: Int, dim: Int)

  /** Grouped profile of the documents corpus — the Spark shape of the
    * reference's per-file scan loop + running counters (Program.cs:43-99):
    * partial aggregation map-side, shuffle carries only (lang, source)
    * partials. */
  def scanProject(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        round(avg("n_chars"), 6).as("avg_chars"))
      .orderBy("lang", "source")

  /** Column projection into a typed Dataset (reference Program.cs:72-90).
    * Only (vec_id, label, embedding-length) reach the scan — ReadSchema is
    * pruned to 3 columns. */
  def typedProject(spark: SparkSession, vectors: DataFrame): DataFrame = {
    import spark.implicits._
    vectors
      .select(col("vec_id"), col("label"), size(col("embedding")).as("dim"))
      .as[EmbeddingRow]
      .toDF()
      .orderBy("vec_id")
  }

  /** Embedding widening cast float[]→double[] (reference Program.cs:87
    * casts the other way) plus a checksum of the cast result. */
  def embeddingCast(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("emb_d", toDoubleArray(col("embedding")))
      .select(
        col("vec_id"),
        round(element_at(col("emb_d"), 1), 6).as("e0"),
        round(norm(col("emb_d")), 6).as("l2_norm"))
      .orderBy("vec_id")

  /** First-n sample by key (reference Program.cs:102-103 JSON head dump).
    * TakeOrderedAndProject — bounded memory at any scale. */
  def sampleExport(docs: DataFrame, n: Int): DataFrame =
    docs.select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
      .limit(n)

  /** Materialized JSON head-sample export (the reference's
    * `dbPediaRecords.Take(100)` → JSON file, Program.cs:102-103):
    * TakeOrderedAndProject bounds memory, a single output file is
    * intentional — the sample is n rows by contract, never big. */
  def exportJson(docs: DataFrame, n: Int, path: String): Unit =
    sampleExport(docs, n).coalesce(1).write.mode("overwrite").json(path)

  /** Deterministic contiguous global index by key — the reference's
    * "enforce order as index input" (Program.cs:106-107), distributed.
    *
    * Single-partition `row_number() OVER (ORDER BY key)` would serialize
    * 100 TB through one task. Instead: two-phase ranking over key-range
    * buckets — rank within each bucket (parallel window), then add
    * broadcast per-bucket offsets from a tiny count aggregate.
    *
    * The bucket is a PURE FUNCTION of the key (uniform spans between the
    * collected min/max — one tiny agg job at build time), NOT
    * `repartitionByRange` + `spark_partition_id`: that formulation
    * samples range boundaries nondeterministically, and referencing the
    * sampled subtree from both the rank and the offset branch made
    * correctness depend on exchange reuse deduplicating the two (with
    * `spark.sql.exchange.reuse=false`, each branch could sample
    * DIFFERENT boundaries and produce a wrong index). A deterministic
    * bucket keys both branches identically no matter how the plan is
    * (re)executed. Near-contiguous keys (ours) bucket uniformly; heavily
    * clustered keys would skew buckets but never break correctness.
    */
  def globalIndex(vectors: DataFrame, numBuckets: Int = 32): DataFrame = {
    val stats = vectors.agg(
      min(col("vec_id")).as("mn"), max(col("vec_id")).as("mx")).collect()(0)
    if (stats.isNullAt(0)) return vectors.select(col("vec_id"), col("label"),
      lit(0L).as("idx")).limit(0)
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val span = math.max((mx - mn) / numBuckets + 1, 1L)
    val bucket = ((col("vec_id") - mn) / span).cast("long")
    val parted = vectors.select(col("vec_id"), col("label"), bucket.as("pid"))
    val localRank = parted.withColumn(
      "local_idx",
      row_number().over(Window.partitionBy("pid").orderBy("vec_id")).cast("long") - 1L)
    // Per-bucket row counts: tiny (one row per bucket) → prefix sums
    // via a window → broadcast join back. The window frame is numBuckets
    // rows (32), not data: the constant partitionBy(lit) only exists to
    // suppress the "No Partition Defined for Window" log warning that
    // otherwise reads as an unpartitioned-data red flag in bench logs.
    val offsets = parted.groupBy("pid").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(lit(0)).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOffset = offsets.withColumn("offset", coalesce(sum("cnt").over(w), lit(0L)))
      .select("pid", "offset")
    localRank.join(broadcast(withOffset), "pid")
      .select(col("vec_id"), col("label"), (col("local_idx") + col("offset")).as("idx"))
      .orderBy("vec_id")
  }
}
