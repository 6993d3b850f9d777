package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** q212 — merge-order-invariant quantile sample: exact below k,
  * bit-reproducible across partitionings, binomial rank error above k. */
class QuantileSampleSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k: per-group estimates equal exact nearest-rank percentiles") {
    val df = (0 until 200).map(i => (i.toLong, s"s${i % 4}", (i * 37 % 100).toDouble))
      .toDF("doc_id", "source", "v")
    val out = Profile.sketchQuantiles(df, "source", "v", "doc_id", 256, Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    (0 until 4).foreach { s =>
      val vals = (0 until 200).filter(_ % 4 == s).map(i => (i * 37 % 100).toDouble).sorted
      val (n, m, p50, p90, p99) = out(s"s$s")
      assert(n == 50L && m == 50L)
      def nr(q: Int) = vals(math.floor(q * (vals.size - 1) / 100.0).toInt)
      assert(p50 == nr(50) && p90 == nr(90) && p99 == nr(99),
        s"s$s: got ($p50,$p90,$p99) want (${nr(50)},${nr(90)},${nr(99)})")
    }
  }

  test("merge-order invariance: identical output under any partitioning, " +
    "including duplicate ids at the retention boundary") {
    val base = (0 until 5000).map(i => (i.toLong % 977, s"g${i % 3}", (i % 613).toDouble))
      .toDF("doc_id", "source", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Profile.sketchQuantiles(df, "source", "v", "doc_id", 64, Seq(50, 90, 99))
        .collect().map(_.toString).toSeq
    val a = run(base.repartition(1))
    val b = run(base.repartition(17))
    val c = run(base.repartition(5, col("v")))
    assert(a == b && b == c, "sample output depends on partitioning/merge order")
  }

  test("saturated regime: rank error within 4 binomial sigmas at k=256 " +
    "on a 50k-value stream; nulls skipped") {
    val n = 50000
    val k = 256
    val df = (0 until n).map(i => (i.toLong, "g", i.toDouble))
      .toDF("doc_id", "source", "v")
      .unionByName(Seq((-1L, "g", null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "source", "v"))
    val r = Profile.sketchQuantiles(df, "source", "v", "doc_id", k, Seq(50, 90, 99))
      .collect().head
    assert(r.getLong(1) == n.toLong, "null value must not count")
    assert(r.getLong(2) == k.toLong)
    Seq((50, r.getDouble(3)), (90, r.getDouble(4)), (99, r.getDouble(5)))
      .foreach { case (q, est) =>
        val want = q / 100.0 * (n - 1)
        val sigma = n * math.sqrt(q / 100.0 * (1 - q / 100.0) / k)
        assert(math.abs(est - want) <= 4 * sigma,
          s"p$q: est $est vs $want exceeds 4 sigma ($sigma)")
      }
  }
}
