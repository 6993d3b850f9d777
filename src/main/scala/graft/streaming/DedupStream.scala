package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming MinHash near-dup twin of `Dedup.minhashLsh` (SURVEY.md §2
  * row 14, extended to the stream side like EventsStream twins row 17).
  *
  * Shape: signature + band keys are PER-ROW narrow expressions (the
  * aggregate-free twin of Dedup.minhashSignatures — same hash constants,
  * same values), bands explode statelessly, and the ONE stateful
  * operator is `flatMapGroupsWithState` keyed by (band_id, band_key):
  * state is the first doc_id that claimed the bucket, and every later
  * arrival in the same bucket emits a candidate pair (keeper, doc).
  * With event-time timeout + a watermarked source, bucket state evicts
  * once the watermark passes it — the only near-dup contract that
  * survives an unbounded stream (same trade as dedupEvents).
  */
object DedupStream {

  private val P = 1000000007L

  /** Per-row MinHash signature over a PRE-MATERIALIZED shingle-hash
    * array column (hash60 % p per distinct shingle): for permutation j,
    * sig_j = min((a_j·h + b_j) mod p). Value-identical to
    * Dedup.minhashSignatures (same constants), but computed without a
    * groupBy so it composes with downstream stateful streaming ops. */
  def signatureOf(hs: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      val a = 1L + 2L * j
      val b = 7919L * (j + 1) % P
      array_min(transform(hs, h => pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)

  /** (doc_id, ts, band_id, band_key) rows for a documents frame (batch
    * or streaming) — narrow select + one explode, no shuffle. Tokens
    * materialize into a column BEFORE the shingle slices read them
    * (interpreted-HOF re-evaluation trap — see Dedup.shinglesOf). */
  def bandedDocs(docs: DataFrame, k: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    docs
      // null event time cannot participate in watermark semantics and
      // would NPE the stateful operator's timeout bookkeeping
      .where(col("ts").isNotNull)
      .select(col("doc_id"), col("ts"),
        graft.operators.TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("ts"),
        Dedup.shinglesOf(col("__toks"), k).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col("doc_id"), col("ts"),
        transform(col("__sh"), s => pmod(Dedup.hash60(s), lit(P))).as("__hs"))
      .select(col("doc_id"), col("ts"), signatureOf(col("__hs"), numHashes).as("__sig"))
      .select(col("doc_id"), col("ts"),
        explode(Dedup.bandStructs(col("__sig"), numBands, rowsPerBand)).as("band"))
      .select(col("doc_id"), col("ts"), col("band.band_id"), col("band.band_key"))
  }

  final case class BandPair(a: Long, b: Long, band_id: Int)
  // public: the state encoder's generated code constructs it reflectively
  final case class BucketState(keeperId: Long)

  /** Streaming candidate pairs: every doc colliding with its bucket's
    * FIRST claimant (doc_id-ordered within a batch; the claimant is
    * stable across batches). Pairs may repeat across bands — downstream
    * consumers `distinct` per their own window, exactly like the batch
    * LSH's union/distinct step.
    *
    * Contract: the emitted pairs form a STAR per bucket (member ↔
    * claimant), which preserves the connected components a dedup
    * clustering needs with O(1) state per bucket — NOT the full
    * pairwise candidate set (storing all members for that would make
    * bucket state unbounded). Within a single micro-batch the star
    * around the minimum equals [[nearDupPairsBatch]]; across batches,
    * members of the same bucket remain connected through the claimant
    * even though later member-member pairs are not re-emitted.
    *
    * State eviction: the input MUST carry a watermark on `ts`
    * (EventTimeTimeout requires one); each bucket's state times out —
    * and is removed — once the watermark passes its last-seen event
    * time plus `stateHorizonMs`, so state size is bounded by the
    * buckets active inside one horizon, the only near-dup contract an
    * unbounded stream supports. */
  def nearDupPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 12,
                   rowsPerBand: Int = 2,
                   stateHorizonMs: Long = 2L * 3600 * 1000): Dataset[BandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandedDocs(docs, k, numHashes, rowsPerBand)
      .select(col("band_id"), col("band_key"), col("doc_id"), col("ts"))
      .as[(Int, String, Long, java.sql.Timestamp)]
      .groupByKey { case (bandId, bandKey, _, _) => (bandId, bandKey) }
      .flatMapGroupsWithState[BucketState, BandPair](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case ((bandId, _), it, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toArray
            val ids = rows.map(_._3).sorted
            // STABLE claimant: first-ever id keeps the bucket; later
            // arrivals (even smaller ids) pair against it, keeping the
            // star connected across batches with O(1) state.
            var keeper = state.getOption.map(_.keeperId).getOrElse(Long.MinValue)
            val out = Iterator.newBuilder[BandPair]
            ids.foreach { id =>
              if (keeper == Long.MinValue) keeper = id
              else if (id != keeper)
                out += BandPair(math.min(id, keeper), math.max(id, keeper), bandId)
            }
            state.update(BucketState(keeper))
            // Evict when the watermark passes last-seen + horizon. The
            // max() guard keeps the timeout legal (it must sit beyond
            // the current watermark) even for a bucket fed only by
            // nearly-late data.
            val lastSeen = rows.iterator.map(_._4.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastSeen + stateHorizonMs, state.getCurrentWatermarkMs() + 1))
            out.result()
          }
      }
  }

  /** Streaming corpus prep — the stream-side composition of
    * CorpusPipeline.prepare's stages that have a streaming contract:
    * exact dedup (drop any doc whose content hash was seen within the
    * watermark horizon — the only exact-dedup contract an unbounded
    * stream supports) followed by the stateless quality gate (the SAME
    * function as batch). Near-dup candidates stream separately through
    * [[nearDupPairs]]; retroactive near-dup REMOVAL is inherently a
    * batch decision (the keeper is only known once its bucket has been
    * seen), so the streaming pipeline flags rather than deletes. */
  def corpusPrep(docs: DataFrame, watermark: String = "2 hours",
                 minTokens: Int = 5, maxMeanTokenLen: Double = 15.0): DataFrame =
    graft.operators.CorpusPipeline.qualityGate(
      docs
        .withColumn("__content_hash", sha2(col("text"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("__content_hash")
        .drop("__content_hash"),
      minTokens, maxMeanTokenLen)

  /** Batch twin of [[nearDupPairs]] for differential testing: per
    * bucket, the min doc_id is the keeper and every other member pairs
    * with it. */
  def nearDupPairsBatch(docs: DataFrame, k: Int = 3, numHashes: Int = 12,
                        rowsPerBand: Int = 2): DataFrame =
    bandedDocs(docs, k, numHashes, rowsPerBand)
      .groupBy("band_id", "band_key")
      .agg(min("doc_id").as("a"), collect_set("doc_id").as("members"))
      .select(col("a"), explode(col("members")).as("b"), col("band_id"))
      .where(col("b") =!= col("a"))
      .select("a", "b", "band_id")
}
