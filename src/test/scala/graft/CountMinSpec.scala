package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin
import graft.functions.CountMin._
import graft.operators.Sketches

/** Count-Min sketch (q213): one-sided error, merge-order invariance,
  * md5-carved bucket determinism, and the panel audit's contract. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("point estimates are NEVER below the true count (one-sided error)") {
    val terms = (1 to 4000).map(i => s"t${i % 97}")
    val df = terms.toDF("term")
    val sk = df.agg(cmsSketch(col("term"), 4, 64).as("sk"))
      .head().getAs[Array[Byte]](0)
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, c) =>
      val est = CountMin.estimateOf(sk,
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(est >= c, s"CMS underestimated '$t': est=$est exact=$c")
    }
  }

  test("wide sketch with few terms is exact (no collisions at w >> vocab)") {
    val terms = (1 to 3000).map(i => s"term${i % 10}")
    val sk = terms.toDF("term").agg(cmsSketch(col("term"), 4, 8192).as("sk"))
      .head().getAs[Array[Byte]](0)
    terms.distinct.foreach { t =>
      val est = CountMin.estimateOf(sk,
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(est == 300L, s"'$t': est=$est, want exact 300")
    }
  }

  test("serialized grid is identical across partitionings (merge = +)") {
    def build(parts: Int): Array[Byte] =
      (1 to 5000).map(i => s"w${i % 211}").toDF("term").repartition(parts)
        .agg(cmsSketch(col("term"), 3, 128).as("sk"))
        .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(2), build(13)),
      "elementwise-add merge must be order-invariant")
  }

  test("unseen terms report only collision mass (zero when grid is empty there)") {
    val sk = Seq("alpha").toDF("term").agg(cmsSketch(col("term"), 4, 4096).as("sk"))
      .head().getAs[Array[Byte]](0)
    val est = CountMin.estimateOf(sk,
      org.apache.spark.unsafe.types.UTF8String.fromString("omega"))
    assert(est <= 1L, s"unseen term in a near-empty grid: est=$est")
  }

  test("panel audit: overest >= 0 everywhere, exact counts match groupBy truth") {
    val docs = (1 to 300).map(i =>
      (i.toLong, s"a b c w$i ${"hot " * (i % 4)}".trim)).toDF("doc_id", "text")
    val out = Sketches.cmsTermPanel(docs, 4, 32, 5).collect()
    assert(out.length == 5)
    val byTerm = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // top terms by exact count: a/b/c appear 300x each
    assert(byTerm.contains("a") && byTerm.contains("b") && byTerm.contains("c"))
    byTerm.foreach { case (t, (exact, cms, over)) =>
      assert(cms >= exact && over == cms - exact && over >= 0,
        s"$t: exact=$exact cms=$cms over=$over")
    }
    assert(byTerm("a")._1 == 300L)
  }

  test("bucket carving matches the SQL mirror's 1-based substr windows") {
    // row i reads md5 hex [7i, 7i+7) 0-based == substr(md5, 1+7i, 7) 1-based
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hash".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (0 until 4).foreach { i =>
      val want = java.lang.Long.parseLong(hex.substring(7 * i, 7 * i + 7), 16) % 1024
      assert(CountMin.bucketOf(hex, i, 1024) == want.toInt)
    }
  }

  test("depth beyond the md5 budget is rejected") {
    intercept[IllegalArgumentException] { new CountMin.Cms(5, 64) }
    intercept[IllegalArgumentException] { new CountMin.Cms(1, 1) }
    // inner product refuses shape-mismatched grids
    val a = new CountMin.Cms(2, 64).serialize
    val b = new CountMin.Cms(2, 128).serialize
    intercept[IllegalArgumentException] { CountMin.innerProductOf(a, b) }
  }

  test("innerProductOf overflows LOUDLY (ArithmeticException), never a " +
    "silent negative wrap — the DuckDB-mirror contract at extreme mass") {
    // two counters of 2^32 in the same cell: product = 2^64 > Long.Max
    val c = new CountMin.Cms(2, 4)
    val huge = c.serialize.clone()
    val bb = java.nio.ByteBuffer.wrap(huge)
    (0 until 8).foreach(i => bb.putLong(8 + 8 * i, 1L << 32))
    intercept[ArithmeticException] { CountMin.innerProductOf(huge, huge) }
  }

  test("cmsSketch rejects a non-string column at ANALYSIS time, not with " +
    "a runtime ClassCastException") {
    import org.apache.spark.sql.functions.col
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(5).select(CountMin.cmsSketch(col("id"), 2, 64)).collect()
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
  }

  test("innerProductOf: exact Σ fA·fB at wide w; never an underestimate") {
    def grid(terms: Seq[String], w: Int): Array[Byte] = {
      val c = new CountMin.Cms(4, w)
      terms.foreach(c.add(_, 1L))
      c.serialize
    }
    // fA = {x:3, y:2, z:1}, fB = {y:4, z:5, q:7} → Σ fA·fB = 8+5 = 13
    val a = Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")
    val b = Seq.fill(4)("y") ++ Seq.fill(5)("z") ++ Seq.fill(7)("q")
    assert(CountMin.innerProductOf(grid(a, 8192), grid(b, 8192)) == 13L)
    // narrow grid: collisions only ADD (one-sided, join-size safe side)
    assert(CountMin.innerProductOf(grid(a, 4), grid(b, 4)) >= 13L)
  }

  test("cmsJoinEstimate (q220): est >= exact == executed join; " +
    "disjoint key streams estimate near zero") {
    val li = (1L to 300L).map(k => Tuple1(k % 50)).toDF("l_orderkey")
      .withColumn("l_returnflag", lit("R"))
    val os = (0L to 24L).map(Tuple1(_)).toDF("o_orderkey")
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val r = Sketches.cmsJoinEstimate(li, os, 4, 8192).head()
    // keys 0..24 each appear 6 times in li → exact join = 150
    assert(r.getLong(0) == 300L && r.getLong(1) == 25L)
    assert(r.getLong(3) == 150L, s"exact join: $r")
    assert(r.getLong(2) >= 150L && r.getLong(4) == r.getLong(2) - 150L)
    // disjoint domains: exact 0, estimate only collision mass
    val os2 = (1000L to 1024L).map(Tuple1(_)).toDF("o_orderkey")
    val r2 = Sketches.cmsJoinEstimate(li, os2, 4, 8192).head()
    assert(r2.getLong(3) == 0L)
    assert(r2.getLong(2) <= 5L,
      s"disjoint-stream estimate must be ~0 at wide w: $r2")
  }
}
