package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-provided parquet dirs (TESTDATA.md).
  *
  * Mirrors the reference's directory-of-parquet-files input
  * (reference Program.cs:13,31: directory glob + parallel read) —
  * Spark's parquet source parallelizes over files/row-groups natively
  * and prunes columns/predicates at the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.ts` arrives in whatever physical form the corpus writer
    * chose, so normalize by the type that actually lands:
    *  - INT64 epoch-nanos (TIMESTAMP(NANOS) under the nanosAsLong conf,
    *    or a raw BIGINT like the sf1 blow-up script's) → floor-convert
    *    to a micros timestamp via pmod (no double round-trip — ns epoch
    *    values exceed 2^53; plain `div` truncates toward zero, which
    *    would round pre-1970 timestamps the wrong way vs engines that
    *    floor-convert natively);
    *  - TIMESTAMP micros without UTC adjustment (reads as
    *    TIMESTAMP_NTZ) → cast to the session type (identity on the
    *    instant under the UTC session timezone every entrypoint sets);
    *  - TIMESTAMP → as-is.
    * One loader, one output type: every downstream operator sees a
    * session-TZ micros timestamp regardless of corpus vintage. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // The TIMESTAMP_NTZ→TimestampType fallback below is
    // instant-preserving ONLY under a UTC session timezone. Every graft
    // entrypoint sets it, but this loader is also the first call an
    // ad-hoc spark-shell makes — enforce the invariant here rather than
    // trusting every caller (a non-UTC session would silently shift
    // every event timestamp).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
