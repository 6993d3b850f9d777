package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: identical results to a plain join, with the hot key
  * scattered over `salts` sub-keys. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows where 90% share one hot key, plus a 5-row dimension.
  private lazy val big = (0 until 10000)
    .map(i => (if (i % 10 != 0) 1L else (i % 5).toLong, i))
    .toDF("k", "payload")
  private lazy val small = (0L until 5L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("salted join == plain join (same multiset of rows)") {
    val plain = big.join(small, "k").select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt values actually scatter the hot key") {
    val salts = big.withColumn("__salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8L)))
      .where(col("k") === 1L).select("__salt").distinct().count()
    assert(salts > 4, s"hot key only spread over $salts salt values")
  }
}
