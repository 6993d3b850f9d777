package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: pre-shuffle fact tables into N buckets
  * on their join key at WRITE time so every subsequent join on that key
  * reads co-located buckets and skips the exchange entirely.
  *
  * This is the 100 TB answer to "the same fact-fact join runs every
  * hour": pay the shuffle once when the table lands, not per query.
  * Both sides must use the same bucket count; Spark then plans a
  * sort-merge join whose children are bucket-aligned scans — no
  * `Exchange hashpartitioning` on either side (asserted in
  * BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted parquet table in the session
    * catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their (same-count) bucket keys. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
