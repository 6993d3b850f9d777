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
      // q218's returned plan reads the CHECKPOINTED mutual edges, so the
      // kNN stage — where the r18 scale rework lives — is invisible in
      // it; dump that stage's lazy plan beside the key.
      if (name == "q218_communities") {
        import graft.operators.{Clusters, Dedup}
        val vecs = Tables.embeddings(spark, sfDir)
        val knn = Clusters.directedKnn(Clusters.candidateScores(vecs,
          Dedup.lshCandidatesMultiProbe(vecs,
            Dedup.autoPlanes(vecs, SparkEntry.Params.KnnGraphTarget),
            SparkEntry.Params.KnnGraphTables)), SparkEntry.Params.KnnGraphK)
        println(s"\n===== q218_communities / kNN stage (pre-checkpoint) =====")
        println(knn.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
