package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** Pareto frontier (q195): differential against brute-force dominance
  * — including x-ties, exact duplicate points, and a multi-partition
  * run whose carry-in chain must change nothing. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { p =>
      !pts.exists(d =>
        d._2 >= p._2 && d._3 >= p._3 && (d._2 > p._2 || d._3 > p._3))
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)], parts: Int): Set[(Long, Long, Long)] =
    Skyline.paretoMax(pts.toDF("id", "x", "y").repartition(parts), "x", "y")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getLong(r.fieldIndex("x")),
        r.getLong(r.fieldIndex("y")))).toSet

  test("paretoMax == brute force on crafted ties, duplicates, dominated rows") {
    val pts = Seq(
      (1L, 10L, 1L),              // frontier (max x)
      (2L, 9L, 2L),               // frontier
      (3L, 9L, 1L),               // x-tie, smaller y: dominated by (9,2)
      (4L, 5L, 5L), (5L, 5L, 5L), // duplicate frontier point: BOTH kept
      (6L, 1L, 9L),               // frontier
      (7L, 0L, 10L),              // frontier (max y)
      (8L, 1L, 8L),               // dominated by (1,9)
      (9L, 3L, 3L),               // dominated by (5,5)
      (10L, 5L, 2L))              // x-tie with frontier x, dominated
    val expect = brute(pts)
    assert(run(pts, 1) == expect)
    assert(run(pts, 7) == expect, "partition count must not change the frontier")
  }

  test("paretoMax == brute force on a seeded 500-point corpus, any partitioning") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val expect = brute(pts)
    assert(expect.nonEmpty && expect.size < pts.size)
    assert(run(pts, 3) == expect)
    assert(run(pts, 13) == expect)
  }

  test("bestCustomers: nobody in the output is dominated; every exclusion is") {
    val orders = Tables.orders(spark, sf0001)
    val pts = orders.groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = brute(pts).map(_._1)
    val got = Skyline.bestCustomers(orders).collect()
      .map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
