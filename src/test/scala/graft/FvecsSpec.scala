package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Fvecs

/** fvecs DataSourceV2: lossless roundtrip, record-aligned splits,
  * plan-time global ids, column pruning. */
class FvecsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_fvecs_$tag").toString

  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 100L).map(i => i -> (0 until 8).map(j => (i * 8 + j) * 0.25f))

  test("write → read roundtrip is bit-exact and idx = global id rank") {
    val dir = tmpDir("rt")
    val df = vecs.toDF("id", "v")
    Fvecs.write(df, "id", "v", dir, numFiles = 4)
    val back = Fvecs.read(spark, dir)
      .select(col("idx"), col("vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(back.size == 100)
    vecs.foreach { case (id, v) =>
      assert(back(id) == v, s"vector at idx $id differs")
    }
  }

  test("splits are record-aligned: tiny maxPartitionBytes yields many partitions, same rows") {
    val dir = tmpDir("split")
    Fvecs.write(vecs.toDF("id", "v"), "id", "v", dir, numFiles = 2)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "128b")
      val back = Fvecs.read(spark, dir)
      assert(back.rdd.getNumPartitions > 10, "expected many record-aligned splits")
      val rows = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(rows.size == 100)
      vecs.foreach { case (id, v) => assert(rows(id) == v) }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("column pruning: idx-only projection and count(*) never materialize payloads") {
    val dir = tmpDir("prune")
    Fvecs.write(vecs.toDF("id", "v"), "id", "v", dir, numFiles = 1)
    val scan = Fvecs.read(spark, dir)
    assert(scan.count() == 100)
    val idxOnly = scan.select("idx")
    // The pruned read schema must reach the DSv2 scan (not a post-scan project).
    val planned = idxOnly.queryExecution.executedPlan.toString
    assert(planned.contains("fvecs"), s"expected fvecs scan in plan:\n$planned")
    assert(idxOnly.as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("multi-file corpora concatenate in name order; empty parts are harmless") {
    val dir = tmpDir("multi")
    // Skewed ids: range partitioning may leave some of 8 files near-empty.
    Fvecs.write(vecs.toDF("id", "v"), "id", "v", dir, numFiles = 8)
    val back = Fvecs.read(spark, dir).select("idx").as[Long].collect().sorted
    assert(back.toSeq == (0L until 100L))
  }

  test("roundtripReport matches a parquet-side recomputation (differential)") {
    val dir = tmpDir("report")
    val emb = Tables.embeddings(spark, sf0001)
    val report = Fvecs.roundtripReport(emb, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Recompute from parquet with a window rank — the oracle's shape.
    val expected = emb
      .where(size(col("embedding")) === 64 &&
        size(filter(col("embedding"), x => x.isNull)) === 0)
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
      .select(pmod(col("idx").cast("long"), lit(16L)).as("bucket"),
        round(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")) * 1000000d)
          .cast("long").as("norm_u"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("norm_u").as("s"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(report.toSeq == expected.toSeq)
  }

  test("ivecs twin: int32 ground-truth lists roundtrip exactly (incl. negatives)") {
    val dir = tmpDir("ivecs")
    val lists: Seq[(Long, Seq[Int])] =
      (0L until 50L).map(i => i -> Seq(i.toInt * 3, -(i.toInt) - 1, Int.MaxValue - i.toInt))
    Fvecs.writeIvecs(lists.toDF("id", "v"), "id", "v", dir, numFiles = 3)
    val back = Fvecs.readIvecs(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(back.size == 50)
    lists.foreach { case (id, v) => assert(back(id) == v) }
  }

  test("bvecs twin: unsigned-byte payloads roundtrip widened, splits stay record-aligned") {
    val dir = tmpDir("bvecs")
    // Full unsigned range incl. 0 and 255 (the & 0xff widening's edges).
    val lists: Seq[(Long, Seq[Int])] =
      (0L until 60L).map(i => i -> Seq(0, 255, (i % 256).toInt, ((i * 7) % 256).toInt))
    Fvecs.writeBvecs(lists.toDF("id", "v"), "id", "v", dir, numFiles = 3)
    val back = Fvecs.readBvecs(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(back.size == 60)
    lists.foreach { case (id, v) => assert(back(id) == v) }
    // 1-byte components change the record width: a split bound sized
    // for ~3 records must still land on record boundaries (8-byte
    // records here: 4-byte dim header + 4 payload bytes).
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "24")
      val df = Fvecs.readBvecs(spark, dir)
      assert(df.rdd.getNumPartitions > 10)
      assert(df.count() == 60)
      assert(df.select(sum("idx")).head.getLong(0) == (0L until 60L).sum)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("bvecs write rejects out-of-range components instead of truncating") {
    val dir = tmpDir("bvecs_bad")
    val bad = Seq((0L, Seq(1, 2, 300))).toDF("id", "v")
    val ex = intercept[Exception] {
      Fvecs.writeBvecs(bad, "id", "v", dir, numFiles = 1)
    }
    assert(ex.getMessage.contains("out of unsigned-byte range"))
  }

  test("malformed file (truncated record) is rejected at plan time") {
    val dir = tmpDir("bad")
    // One valid 2-float record followed by 3 stray bytes, written raw
    // (no Hadoop .crc sidecar, so the length check is what fires).
    val buf = java.nio.ByteBuffer.allocate(4 + 8 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2).putFloat(1.5f).putFloat(2.5f).put(Array[Byte](1, 2, 3))
    Files.write(java.nio.file.Paths.get(dir, "part-00000.fvecs"), buf.array())
    val ex = intercept[Exception] {
      Fvecs.read(spark, dir).count()
    }
    assert(ex.getMessage.contains("not a multiple of record size"))
  }
}
