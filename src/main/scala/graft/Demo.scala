package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Executable walkthrough of the reference's console flow
  * (reference Program.cs:13-263), stage by stage on the graft
  * operators — the "switch from the reference" story, runnable:
  *
  *   sbt "runMain graft.Demo [sfDir]"
  *
  * Each numbered stage corresponds to the reference step cited in the
  * comment; output is a few summary rows per stage, never a collect of
  * the data itself.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import SparkEntry.Params._

    def stage(n: Int, what: String, ref: String): Unit =
      println(s"\n[$n] $what  (reference $ref)")

    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)

    stage(1, "parallel parquet directory scan", "Program.cs:31-99")
    Scan.scanProject(docs).show(5, truncate = false)

    stage(2, "footer metadata introspection (on executors)", "Program.cs:51-63")
    Metadata.describe(spark, sfDir).show(truncate = false)

    stage(3, "typed column projection", "Program.cs:72-90")
    Scan.typedProject(spark, emb).show(3)

    stage(4, "embedding widening cast + checksum", "Program.cs:87")
    Scan.embeddingCast(emb).show(3)

    stage(5, "tokenization: whitespace + real byte-level BPE", "Program.cs:40,80,88")
    TextAnalysis.bpeCorpusTokens(docs).show(5)

    stage(6, "token totals + embedding-API cost", "Program.cs:111-116")
    TextAnalysis.tokenCost(docs).show(truncate = false)

    stage(7, "head-sample export", "Program.cs:102-103")
    Scan.sampleExport(docs, SampleN).show(5)

    stage(8, "deterministic global index", "Program.cs:106-107")
    Scan.globalIndex(emb).show(5)

    stage(9, "ANN index build: map-only IVF assignment", "Program.cs:125-204")
    Ivf.build(emb, IvfStep).groupBy("centroid_id")
      .count().orderBy("centroid_id").show(5)

    val idxPath = s"${System.getProperty("java.io.tmpdir")}/graft_demo_index"
    stage(10, "index persist (parquet partitioned by centroid)", "Program.cs:231-244")
    Ivf.save(emb, IvfStep, idxPath)
    println(s"  saved -> $idxPath")

    stage(11, "index load", "Program.cs:246-263")
    val (postings, cents) = Ivf.load(spark, idxPath)
    println(s"  postings=${postings.count()} rows, centroids=${cents.count()}")

    stage(12, "KNN search: exact + IVF-probed, dot distance, k=" + K,
      "Program.cs:207-227")
    val q = Knn.queryVector(emb, QueryVecId)
    println("  exact:")
    Knn.topKDot(emb, q, K).show(5)
    println("  IVF-probed (partition-pruned postings):")
    Ivf.search(postings, cents, q, NProbe, K).show(5)
    println("  distance sum (reference's summary metric): " +
      Knn.topKDot(emb, q, K).agg(round(sum("score"), 6)).collect()(0).get(0))

    println("\n[13+] beyond the reference: dedup / quality / corpus prep")
    println(s"  exact-dup groups: ${Dedup.exact(docs).where(col("n_copies") > 1).count()}")
    println(s"  near-dup pairs (MinHash-LSH): ${Dedup.minhashLsh(docs).count()}")
    println(s"  corpus prep survivors: ${CorpusPipeline.prepare(docs).count()} of ${docs.count()}")

    spark.stop()
  }
}
