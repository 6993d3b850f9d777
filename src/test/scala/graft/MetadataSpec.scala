package graft

import org.apache.spark.sql.functions._
import graft.operators.Metadata

/** Distributed footer introspection: many-file directories are read on
  * the executors (the million-file-lake shape), never in a driver loop. */
class MetadataSpec extends SparkSpec {

  test("describeFiles reads a many-file directory on the executors") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_meta_manyfiles"
    val docs = Tables.documents(spark, sf001)
    docs.repartition(16).write.mode("overwrite").parquet(dir)

    val files = spark.read.parquet(dir).inputFiles.toSeq.sorted.map(("documents", _))
    assert(files.size >= 8, s"expected a many-file dir, got ${files.size}")

    val meta = Metadata.describeFiles(spark, files)
    // The footer walk is inside the plan (MapPartitions), not a driver
    // loop — plus describeFiles itself asserts TaskContext at runtime.
    val p = meta.queryExecution.executedPlan.toString
    assert(p.contains("MapPartitions"), s"footer walk not in the plan:\n$p")

    val agg = meta.toDF().agg(
      count(lit(1)).as("n_files"),
      sum("num_rows").as("rows")).collect()(0)
    assert(agg.getLong(0) === files.size.toLong)
    assert(agg.getLong(1) === docs.count())
    assert(meta.collect().forall(_.num_columns == docs.columns.length))
  }

  test("describe keeps the one-row-per-table q02 contract") {
    val rows = Metadata.describe(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq === Tables.all.sorted)
    val docs = rows.find(_.getString(0) == "documents").get
    assert(docs.getLong(2) === Tables.documents(spark, sf0001).count())
  }
}
