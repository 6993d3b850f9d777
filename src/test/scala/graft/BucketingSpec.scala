package graft

import graft.operators.Bucketing

/** Bucketed tables must join without a shuffle on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no exchange") {
    // In-memory catalog forgets tables at JVM exit but their files
    // survive in the warehouse dir — clear both before writing.
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (dir.exists()) rm(dir)
    }
    Bucketing.writeBucketed(Tables.lineitem(spark, sf0001), "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(Tables.orders(spark, sf0001), "ord_bucketed", "o_orderkey", 4)
    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
      "l_orderkey", "o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // Same row count as the unbucketed join.
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    assert(joined.count() === plain.count())
  }
}
