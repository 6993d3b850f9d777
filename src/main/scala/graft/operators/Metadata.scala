package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import scala.jdk.CollectionConverters._

/** Parquet footer introspection — column count, row count, row-group
  * count, key-value metadata, per-column logical types — the Spark
  * counterpart of the reference's FileMetaData walk (reference
  * Program.cs:51-63).
  *
  * This reads FOOTERS ONLY (a few kB per file), never data pages — and
  * it reads them ON THE EXECUTORS: the file list is a Dataset and the
  * footer walk runs inside `mapPartitions`, so a million-file lake
  * introspects at cluster parallelism instead of serializing footer
  * I/O through the driver. For a directory table the path list comes
  * from `spark.read.parquet(dir).inputFiles` (driver lists, executors
  * read).
  */
object Metadata {

  final case class TableMeta(
      table: String,
      num_columns: Int,
      num_rows: Long,
      num_row_groups: Int,
      columns: String,
      created_by: String)

  /** Footer walk for one file. Pure function of (path, conf) — safe on
    * driver or executor; the engine paths below always run it inside a
    * task. */
  private def readFooter(table: String, file: String, conf: Configuration): TableMeta = {
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

  /** Distributed footer introspection: one output row per (label, file).
    * The Configuration is built once per PARTITION (it is not
    * serializable and costs ~ms to construct); footers stream through
    * it. The TaskContext guard is a live assertion that this loop can
    * never silently regress to driver-side execution. */
  def describeFiles(spark: SparkSession, files: Seq[(String, String)]): Dataset[TableMeta] = {
    import spark.implicits._
    // Ship the SESSION's Hadoop configuration to the executors — a bare
    // new Configuration() there would drop every spark.hadoop.* setting
    // (filesystem credentials, endpoints), which is fatal for exactly
    // the remote object-store lake this operator exists for.
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // A local Seq lands in ONE partition; spread the path list across
    // the cluster before the footer walk (footer I/O is the work here —
    // a million-file lake wants every core on it).
    val slices = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism))
    files.toDS().repartition(slices).mapPartitions { it =>
      require(TaskContext.get() != null, "footer reads must run inside a task")
      val conf = confSer.value
      it.map { case (table, file) => readFooter(table, file, conf) }
    }
  }

  /** One row per testdata table: footer-level stats, read on executors. */
  def describe(spark: SparkSession, dir: String): DataFrame =
    describeFiles(spark, graft.Tables.all.map(t => (t, s"$dir/$t.parquet")))
      .toDF()
      .orderBy("table")
}
