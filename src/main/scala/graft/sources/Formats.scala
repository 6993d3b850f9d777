package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format breadth beyond parquet: json / orc / csv read+write
  * with schema fidelity.
  *
  * The engine's canonical storage is parquet (columnar, pushdown,
  * partition layout), but ingestion pipelines meet all three of these
  * at their edges: JSON for API exports, CSV for tabular drops, ORC
  * for foreign lakehouse tables. Reads always take an explicit schema
  * — schema inference re-scans the data and guesses types (a silent
  * long→int or string→date flip breaks downstream operators), which is
  * never acceptable in a pipeline.
  */
object Formats {

  /** Supported interchange formats. Arrays/structs survive json and
    * orc; csv is flat-schema only (Spark's csv source has no
    * array/struct encoding). */
  val all: Seq[String] = Seq("json", "orc", "csv")

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, format: String, schema: StructType, path: String): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }

  /** Write + read back under the given format. */
  def roundtrip(df: DataFrame, format: String, path: String): DataFrame = {
    write(df, format, path)
    read(df.sparkSession, format, df.schema, path)
  }
}
