package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump helper for EXPLAIN.md: prints the physical plan of each
  * named query key (all SQL-oracle keys if none given) at the given sf
  * dir. Usage: runMain graft.Explain <sfDir> [key ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
