package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation.
  *
  * [[CorpusPipeline.domainMix]] hits RATE targets (keep ~p% of each
  * source); this is the complementary exact-COUNT contract: exactly
  * `n` rows per stratum, reproducible across runs and engines —
  * "give me 10k docs per domain for the eval set" / "audit sample of
  * every source". Randomness comes from the md5-derived
  * [[Dedup.hash60]] of the row id, so the sample is a pure function
  * of the data (the same discipline as the hash split, q29), never of
  * partitioning or RNG state.
  */
object Sampling {

  /** Exactly `min(n, |stratum|)` docs per `source`, chosen by md5
    * order: rank = hash60(doc_id) with doc_id tie-break, keep the
    * first n per stratum.
    *
    * Scale shape: ranking runs through [[graft.plans.GroupedTopK]] —
    * per-partition bounded heaps of n BEFORE the exchange, so the
    * shuffle carries ≤ partitions × strata × n rows no matter how
    * large the corpus is, and there is no per-stratum sort and no
    * rank column materialized over the full table (the window
    * formulation would sort every stratum end to end). At 100 TB with
    * n = 10⁴ per source this is the difference between shuffling
    * sample candidates and shuffling the corpus. */
  def stratifiedSample(docs: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val keyed = docs.select(col("doc_id"), col("source"),
      Dedup.hash60(col("doc_id").cast("string")).as("sample_key"))
    graft.plans.GroupedTopK.topK(keyed, Seq(col("source")),
        Seq(col("sample_key").asc, col("doc_id").asc), n)
      .select(col("doc_id"), col("source"), col("sample_key"))
      .orderBy("source", "sample_key", "doc_id")
  }
}
