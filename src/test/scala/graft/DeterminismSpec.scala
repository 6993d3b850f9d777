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

  test("globalIndex is a contiguous 0..n-1 permutation, even without exchange reuse") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count()
    def check(): Unit = {
      val idx = operators.Scan.globalIndex(emb).collect()
      assert(idx.length === n)
      // contiguous permutation in vec_id order
      assert(idx.map(_.getLong(2)).toSeq === (0L until n).toSeq)
      assert(idx.map(_.getLong(0)).toSeq === idx.map(_.getLong(0)).toSeq.sorted)
    }
    check()
    // The round-2 formulation silently depended on exchange reuse
    // deduplicating a nondeterministically-sampled subtree (ADVICE r02);
    // the bucket formulation must hold with reuse off.
    val prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      check()
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("GroupedTopK rejects an empty group list at the API boundary") {
    val e = intercept[IllegalArgumentException] {
      plans.GroupedTopK.topK(Tables.documents(spark, sf0001), Seq.empty,
        Seq(org.apache.spark.sql.functions.col("n_chars").desc), 3)
    }
    assert(e.getMessage.contains("at least one group expression"))
  }

  // Rows-only keys (no SQL oracle) get the same partitioning-invariance
  // check; q10 is excluded only because it is an index-write I/O op
  // whose roundtrip is covered by IvfSpec.
  private val rowsOnlyDeterministic = Seq("q02_metadata", "q05b_bpe", "q18_multimodal")

  (SparkEntry.oracleSql.keys.toSeq ++ rowsOnlyDeterministic).sorted.foreach { name =>
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
