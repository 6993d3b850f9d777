package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis.tokens

/** End-to-end LLM corpus preparation — the composition a training-data
  * pipeline actually runs, built from the library's own operators:
  *
  *   1. exact dedup: keep the lowest doc_id per content hash
  *   2. near-dup removal: MinHash-LSH pairs over the survivors, drop
  *      the higher doc_id of each pair
  *   3. quality gate: minimum token count, bounded mean token length
  *
  * Everything stays one declarative plan: the stages are joins/filters
  * Catalyst pipelines together (anti-join for removal — never a
  * collected id list on the driver), so the whole prep runs as a
  * handful of hash-shuffle stages regardless of corpus size.
  */
object CorpusPipeline {

  /** The deterministic train/eval split rule — a pure function of
    * doc_id (md5-derived bucket in [0,100)). ONE definition, shared by
    * [[hashSplit]] and [[contamination]] (and their specs) so the
    * report can never silently measure a different split than the one
    * actually assigned. Never `rand()`, which would leak eval docs
    * into training on every re-run. */
  def splitCol(trainPct: Int): org.apache.spark.sql.Column =
    when(pmod(Dedup.hash60(col("doc_id").cast("string")), lit(100L)) < trainPct, "train")
      .otherwise("eval")

  /** Deterministic train/eval split assignment with per-(split, lang)
    * counts for audit. */
  def hashSplit(docs: DataFrame, trainPct: Int = 90): DataFrame =
    docs
      .select(col("lang"), col("n_chars"), splitCol(trainPct).as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split", "lang")

  /** Stateless quality gate (stage 3 of [[prepare]]): min token count +
    * bounded mean token length, as pure narrow column expressions — so
    * the SAME function gates a batch frame or a `readStream` frame
    * (no aggregation, no state; StreamingSpec proves batch == stream). */
  def qualityGate(docs: DataFrame, minTokens: Int = 5,
                  maxMeanTokenLen: Double = 15.0): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(tokens(col("text"))).as("n_tokens"))
      .where(col("n_tokens") >= minTokens &&
        col("n_chars").cast("double") / col("n_tokens") <= maxMeanTokenLen)

  /** Train/eval contamination report: how many eval documents share
    * exact content with any train document under the [[hashSplit]]
    * assignment — the decontamination check every benchmark-hygiene
    * pipeline runs before training. One content-hash groupBy (map-side
    * partial agg) then a 1-row global rollup: the shuffle carries one
    * row per distinct content, never pairs. Near-dup contamination is
    * the same report with Dedup.minhashLsh pairs filtered to
    * cross-split (a, b). */
  def contamination(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    val tagged = docs.select(
      sha2(col("text"), 256).as("h"), splitCol(trainPct).as("split"))
    tagged
      .groupBy("h")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "eval", 1L).otherwise(0L)).as("n_eval"))
      .agg(
        sum("n_eval").as("n_eval_docs"),
        sum(when(col("n_train") > 0, col("n_eval")).otherwise(0L)).as("n_contaminated"),
        round(sum(when(col("n_train") > 0, col("n_eval")).otherwise(0L)).cast("double") /
          greatest(sum("n_eval"), lit(1L)).cast("double"), 6).as("contamination_rate"))
  }

  def prepare(docs: DataFrame, k: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 2,
              minEstJaccard: Double = 0.5, minTokens: Int = 5,
              maxMeanTokenLen: Double = 15.0): DataFrame = {
    val keepers = docs
      .groupBy(sha2(col("text"), 256).as("h")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = docs.join(keepers, "doc_id")
    val nearDropped = Dedup
      .minhashLsh(kept, k, numHashes, rowsPerBand, minEstJaccard)
      .select(col("b").as("doc_id")).distinct()
    qualityGate(kept.join(nearDropped, Seq("doc_id"), "left_anti"),
      minTokens, maxMeanTokenLen)
      .orderBy("doc_id")
  }
}
