package graft

/** Results must be bit-identical regardless of input split size and
  * shuffle partition count — the driver runs Verify with ITS choice of
  * parallelism, so any partitioning-dependent result (float
  * accumulation order, unstable sorts) would pass locally and fail the
  * gate. Every SQL-expressible query key is exercised under a deformed
  * configuration (tiny input splits, prime shuffle partitions) and
  * compared row-for-row against the default run. */
class DeterminismSpec extends SparkSpec {

  private def collectAll(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq

  SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
    test(s"$name is invariant under partitioning changes") {
      val defaults = (
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.files.maxPartitionBytes"))
      val base = collectAll(name)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        val deformed = collectAll(name)
        assert(deformed === base, s"$name changed under repartitioning")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", defaults._1)
        spark.conf.set("spark.sql.files.maxPartitionBytes", defaults._2)
      }
    }
  }
}
