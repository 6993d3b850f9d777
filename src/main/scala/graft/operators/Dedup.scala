package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.TextAnalysis.tokens

/** Deduplication family for LLM training corpora — exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, and blocked embedding-cosine near-dup.
  *
  * Design rule (SURVEY.md §4/§5): no operator here ever materializes an
  * all-pairs comparison. Every candidate-pair generator is an equi-join on
  * a derived key (content hash, LSH band bucket, simhash band, blocking
  * key), so the physical plan is a shuffle/broadcast hash join — never
  * CartesianProduct (asserted in PlanSpec).
  */
object Dedup {

  /** Portable 60-bit token hash: first 15 hex chars of md5, as a signed
    * long — computable identically in Spark (`conv`) and ANSI-ish SQL
    * engines (hex cast). Base primitive for minhash/simhash/fingerprint. */
  def hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Exact dedup: group by full-content hash, keep the lowest doc_id
    * (hash shuffle with map-side partial agg; scale-safe by
    * construction). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_id"))
      .orderBy("content_hash")

  /** C4/CCNet-style text normalization for dedup keying: lowercase,
    * non-alphanumerics → space, whitespace runs collapsed, trimmed.
    * Deliberately built from the explicit class `[^a-z0-9 ]` (after
    * lowering) rather than `\\s`/`\\p{Punct}` so Java-regex (Spark) and
    * RE2-family (DuckDB, Go) engines agree byte-for-byte — the shorthand
    * classes differ across engines (Java `\\s` includes \\x0B; RE2's
    * does not). Narrow, codegen'd, zero shuffle. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Normalized exact dedup (q53): exact dedup after [[normalize]] —
    * catches near-copies differing only in case/punctuation/whitespace,
    * the first rung of the C4 dedup ladder (exact < normalized < span <
    * MinHash < semantic). Same scale shape as [[exact]]: the normalize
    * is per-row narrow work and the only exchange is the partial-agg
    * groupBy on the 256-bit content hash — map-side combine collapses
    * every within-task duplicate before the shuffle. */
  def normalizedExact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(normalize(col("text")), 256).as("norm_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_id"))
      .orderBy("norm_hash")

  /** Canonical-representative dedup (q148): per [[normalize]]d-content
    * group, keep the HIGHEST-QUALITY copy instead of the lowest id —
    * the policy a real curation pipeline actually wants ("of these 5
    * crawls of the same page, keep the cleanest one"), composing the
    * dedup ladder with the q16 quality signals. The quality key is
    * ALL-INTEGER — (stopword hits desc, token count desc, doc_id asc)
    * — so the argmax is deterministic and exactly mirrorable in SQL
    * (a float score would invite tie-break drift; the ladder's other
    * rungs keep the same discipline).
    *
    * Scale shape: ONE narrow pass computes the hash + integer signals
    * and ONE partial-aggregated exchange takes count and argmax
    * together (`max_by` over the struct ordering key, with −doc_id so
    * the within-max tiebreak is ascending id) — no second tokenize
    * branch, no GroupedTopK join-back; the same single content-hash
    * shuffle as [[exact]]. */
  def canonicalPick(docs: DataFrame): DataFrame = {
    val ts = TextAnalysis.tokens(col("text"))
    docs.select(
        sha2(normalize(col("text")), 256).as("norm_hash"),
        col("doc_id"),
        size(filter(ts,
          t => t.isin("the", "a", "and", "of", "to", "in", "is", "it")))
          .cast("long").as("stop_hits"),
        size(ts).cast("long").as("n_tokens"))
      .groupBy("norm_hash")
      .agg(
        count(lit(1)).as("n_copies"),
        max_by(
          struct(col("doc_id"), col("stop_hits"), col("n_tokens")),
          struct(col("stop_hits"), col("n_tokens"), (-col("doc_id")).as("nid")))
          .as("k"))
      .select(col("norm_hash"), col("n_copies"),
        col("k.doc_id").as("keeper_id"),
        col("k.stop_hits").as("keeper_stop_hits"),
        col("k.n_tokens").as("keeper_n_tokens"))
      .orderBy("norm_hash")
  }

  /** Word k-shingles over a PRE-MATERIALIZED tokens array column.
    *
    * `ts` must be a plain column attribute, not an inline `split(...)`
    * expression: higher-order functions (transform/filter) are not
    * whole-stage-codegen'd, and in interpreted eval the lambda body's
    * references to `ts` are re-evaluated once per array element — an
    * inline regex split there turns shingling O(n²) per document
    * (measured 10× slower at sf0.1). */
  def shinglesOf(ts: Column, k: Int): Column =
    array_distinct(TextAnalysis.ngramsOf(ts, k))

  /** Word k-shingles of a document (distinct, as the set for Jaccard /
    * MinHash). Convenience single-column form; hot paths should use
    * [[shingleRows]] instead (see [[shinglesOf]] for why). */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)

  /** (doc_id, extra…, shingle) rows: tokens materialized into a column
    * once per doc, then the distinct shingle set exploded. The shared
    * scale-shape entry point for every shingle-based dedup operator —
    * narrow, no shuffle. */
  def shingleRows(docs: DataFrame, k: Int, extra: String*): DataFrame = {
    val keep = col("doc_id") +: extra.map(col)
    docs.select(keep :+ tokens(col("text")).as("__ts"): _*)
      .select(keep :+ explode(shinglesOf(col("__ts"), k)).as("s"): _*)
  }

  /** MinHash signatures as a DataFrame: explode the shingle set once,
    * hash each shingle ONCE (md5 → 60-bit → mod p), then one
    * groupBy(doc_id) with `numHashes` min-aggregates — for permutation
    * j, sig_j = min over shingles of (a_j * h(s) + b_j) mod p, all
    * integer arithmetic mod 1e9+7 to stay overflow-free in any 64-bit
    * engine.
    *
    * This is the scale shape for distributed MinHash: per-shingle work
    * is a narrow map, the only shuffle is the partial-agg exchange on
    * doc_id, and the md5 is computed once per shingle instead of once
    * per (shingle × permutation × consumer). (A previous column-
    * expression formulation duplicated the tokenize+md5 subtree 12×
    * per join side and was ~50× slower.) Docs with no shingles drop
    * out naturally (no exploded rows). */
  def minhashSignatures(docs: DataFrame, k: Int, numHashes: Int): DataFrame = {
    val p = 1000000007L
    val exploded = shingleRows(docs, k)
      .select(col("doc_id"), pmod(hash60(col("s")), lit(p)).as("h"))
    val aggs = (0 until numHashes).map { j =>
      val a = 1L + 2L * j // odd multipliers, deterministic "seed"
      val b = 7919L * (j + 1) % p
      min(pmod(col("h") * lit(a) + lit(b), lit(p))).as(s"mh$j")
    }
    exploded.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(j => col(s"mh$j")): _*).as("sig"))
  }

  /** (band_id, band_key) struct array over a minhash signature column —
    * the ONE definition of the band-key encoding, shared by the batch
    * LSH join, the streaming twin (DedupStream), and their differential
    * tests, so the encoding can never silently drift between them. */
  def bandStructs(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("_", transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))).as("band_key"))
    }: _*)

  /** MinHash-LSH near-dup candidates: signature → bands of `rowsPerBand`
    * → explode to (band_id, band_key) → self-equi-join on the bucket.
    * The join key is (band_id, band_hash): a hash-distributed shuffle
    * join; candidate pairs are verified with the full signature estimate.
    * Returns candidate pairs with their estimated Jaccard.
    */
  def minhashLsh(docs: DataFrame, k: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 2,
                 minEstJaccard: Double = 0.5): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = minhashSignatures(docs, k, numHashes)
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(bandStructs(col("sig"), numBands, rowsPerBand)).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_id"), col("band.band_key"))
    // Candidates carry only (a, b) ids through the union/distinct
    // exchange — a pair colliding in several bands would otherwise drag
    // both 12-long signature arrays through the shuffle once per band.
    // Signatures rejoin by id for the verification step.
    val l = banded.select(col("band_id"), col("band_key"), col("doc_id").as("a"))
    val r = banded.select(col("band_id"), col("band_key"), col("doc_id").as("b"))
    val cand = l.join(r, Seq("band_id", "band_key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
      .join(sig.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble), 6))
      .where(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
      .orderBy("a", "b")
  }

  /** SimHash (64→60-bit): per token-hash bit position, sum +1/-1 votes
    * weighted by token frequency; bit set where the vote is positive.
    * Computed by exploding tokens and aggregating bit votes — a single
    * map + partial-agg shuffle on doc_id, no per-row 60-iteration UDF. */
  def simhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), hash60(col("t")).as("h"))
    val bitVotes = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val voted = tok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sh = (0 until bits).map { i =>
      when(col(s"v$i") > 0, lit(1L) * lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    voted.select(col("doc_id"), sh.as("simhash")).orderBy("doc_id")
  }

  /** N-gram Jaccard similarity for candidate pairs sharing a blocking key
    * (equi-join on (lang, source) — deterministic, never all-pairs).
    * Exact set Jaccard over k-shingles, computed as an inverted-index
    * join: explode distinct shingles, self-equi-join on
    * (lang, source, shingle), and count matches per (a, b) pair — the
    * count IS |A ∩ B| because shingle sets are distinct. |A ∪ B| =
    * |A| + |B| − |A ∩ B| from per-doc shingle counts. No array
    * intersect/union is ever evaluated per pair (the array formulation
    * rebuilds a hash set per candidate pair and was ~20× slower), and
    * only pairs sharing ≥1 shingle are produced — exactly the
    * jaccard > 0 output set. */
  def ngramJaccard(docs: DataFrame, k: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    // Shingle STRINGS collapse to their 60-bit md5 hash before the
    // inverted-index join: the join exchange shuffles 8-byte longs
    // instead of k-word strings (~4× less volume), and intersection
    // COUNTS are unchanged (distinct shingles ↔ distinct hashes;
    // 2⁻⁶⁰ collisions would be deterministic and caught by the gate).
    // Materialized once (r19, the containmentPairs fix): the size
    // census aggregates on a different key than the pair join, so the
    // shingle pass ran twice unmaterialized.
    val ex = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      shingleRows(docs, k, "lang", "source")
        .select(col("lang"), col("source"), col("doc_id"), hash60(col("s")).as("h")))
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val l = ex.select(col("lang"), col("source"), col("doc_id").as("a"), col("h"))
    val r = ex.select(col("lang"), col("source"), col("doc_id").as("b"), col("h"))
    val inter = l.join(r, Seq("lang", "source", "h"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), "b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni").cast("double"), 6))
      .where(col("jaccard") > minJaccard)
      .select("a", "b", "jaccard")
      .orderBy("a", "b")
  }

  /** Shingle-CONTAINMENT near-dup pairs — the asymmetric complement of
    * [[ngramJaccard]]. Jaccard |A∩B|/|A∪B| goes to zero when a short
    * document is quoted verbatim inside a much longer one (the union is
    * dominated by the long side), which is exactly the partial-copy /
    * quote-inclusion case a training-corpus dedup must catch (the
    * "containment" of Broder 1997's resemblance/containment pair).
    * Containment(a in b) = |A∩B|/|A| is 1.0 there regardless of the
    * length ratio.
    *
    * Same scale shape as [[ngramJaccard]]: distinct k-shingles hashed to
    * 60-bit longs, inverted-index self-equi-join on
    * (lang, source, shingle-hash) — deterministic blocking, never
    * all-pairs — one partial-agg exchange for the per-pair intersection
    * counts, per-doc set sizes joined back by id. Emits BOTH directions
    * per unordered pair (containment_a = |A∩B|/|A|, containment_b =
    * |A∩B|/|B|), filtered where either side's containment clears the
    * threshold: the consumer reads which side is the contained (shorter)
    * document directly off the row. */
  def containmentPairs(docs: DataFrame, k: Int = 3, minContainment: Double = 0.5): DataFrame = {
    // materialized once (r19): the per-doc size census aggregates on a
    // different key than the pair join's exchange, so the shingle
    // explode + hash pass ran twice unmaterialized
    val ex = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      shingleRows(docs, k, "lang", "source")
        .select(col("lang"), col("source"), col("doc_id"), hash60(col("s")).as("h")))
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val l = ex.select(col("lang"), col("source"), col("doc_id").as("a"), col("h"))
    val r = ex.select(col("lang"), col("source"), col("doc_id").as("b"), col("h"))
    val inter = l.join(r, Seq("lang", "source", "h"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), "b")
      .withColumn("containment_a",
        round(col("inter").cast("double") / col("n_a").cast("double"), 6))
      .withColumn("containment_b",
        round(col("inter").cast("double") / col("n_b").cast("double"), 6))
      .where(greatest(col("containment_a"), col("containment_b")) >= minContainment)
      .select("a", "b", "containment_a", "containment_b")
      .orderBy("a", "b")
  }

  /** Deterministic pseudo-random hyperplane for sign-LSH: component t of
    * the flattened (plane, dim) index via an LCG, quantized to dyadic
    * rationals k/1024 ∈ [-1, 1) so the decimal literal round-trips to the
    * exact same double in every engine (the oracle SQL embeds these as
    * literals). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { j =>
      (0 until dim).map { i =>
        val t = j.toLong * dim + i
        val v = (1664525L * t + 1013904223L) % 4294967296L
        ((v % 2048L) - 1024L).toDouble / 1024.0
      }
    }

  /** Sign-LSH bucket id: bit j set when dot(v, hyperplane_j) >= 0.
    * Random-hyperplane LSH preserves cosine similarity (collision
    * probability 1 − θ/π per bit). */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (h, j) =>
      when(dot(emb, array(h.map(lit): _*)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-dup via multi-table sign-LSH — the 100 TB
    * path for q15's capability WITHOUT any label blocking key.
    *
    * Amplification: `nTables` independent hash tables of `nPlanes` sign
    * bits each. A pair is a candidate when it collides in ANY table
    * (P[candidate] = 1 − (1 − p^k)^L with p = 1 − θ/π), which rescues
    * the recall a single k-bit table throws away. Pipeline: bucket ids
    * are a narrow map; per-table bucket equi-joins produce (a, b)
    * candidates; union + distinct dedups across tables; exact cosine
    * verification runs once per surviving pair after joining the
    * embeddings back by id — candidate pairs never drag the arrays
    * through the union/distinct shuffle. */
  def cosineLsh(vectors: DataFrame, nPlanes: Int, nTables: Int, threshold: Double,
                dim: Int = 64): DataFrame = {
    val all = hyperplanes(nPlanes * nTables, dim)
    val bucketCols = (0 until nTables).map { t =>
      lshBucket(col("embedding"), all.slice(t * nPlanes, (t + 1) * nPlanes)).as(s"b$t")
    }
    // Vectors whose length differs from `dim` are EXCLUDED up front: a
    // mismatched dot() is NULL, which would silently collapse every such
    // row into bucket 0 of every table and degrade the join to all-pairs
    // — the one failure mode this operator exists to prevent.
    val sized = vectors.where(size(col("embedding")) === dim)
    val withB = sized.select(col("vec_id") +: bucketCols: _*)
    val cand = (0 until nTables).map { t =>
      val l = withB.select(col(s"b$t").as("bk"), col("vec_id").as("a"))
      val r = withB.select(col(s"b$t").as("bk"), col("vec_id").as("b"))
      l.join(r, "bk").where(col("a") < col("b")).select("a", "b")
    }.reduce(_ union _).distinct()
    verifyCosineCandidates(vectors, cand, threshold)
  }

  /** Exact-cosine verification of an (a, b) candidate-pair frame:
    * embeddings join back BY ID (pairs never drag arrays through the
    * candidate shuffles), two-stage threshold as in cosinePairs. Shared
    * by the single-probe and multi-probe LSH paths so the verification
    * contract cannot drift between them. */
  private def verifyCosineCandidates(vectors: DataFrame, cand: DataFrame,
                                     threshold: Double): DataFrame = {
    val withNorm = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    cand
      .join(withNorm.select(col("vec_id").as("a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), "a")
      .join(withNorm.select(col("vec_id").as("b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), "b")
      .withColumn("cos_raw", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      // two-stage threshold — see cosinePairs
      .where(col("cos_raw") >= threshold - 1e-6)
      .withColumn("cos", round(col("cos_raw"), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
      .orderBy("a", "b")
  }

  /** In-engine LSH recall audit (q60): how much of the exact
    * within-block near-dup truth ([[cosinePairs]]) does the sign-LSH
    * candidate path ([[cosineLsh]]) actually find? ANN parameters
    * (planes/tables/probes) are recall dials, and a 100 TB pipeline
    * needs the dial READ in-engine: full-corpus exact truth is the
    * quadratic this family avoids, so the audit measures recall against
    * block-bounded truth — exactly the sampled-ground-truth audit a
    * production corpus runs. Output is one row: n_truth, n_lsh,
    * n_common, recall (6 dp). Three bounded aggregates cross-joined —
    * the pair frames never leave the executors unaggregated.
    *
    * What the dial reads like: sign-LSH collision probability per
    * table is (1 − θ/π)^nPlanes, so recall is HIGH at near-dup
    * thresholds (cos ≥ 0.9 → ~0.99 at 8×4, the SemDeDup/dedup regime
    * this family serves) and collapses at low-similarity thresholds
    * (cos 0.15 → ~0.03 analytic; the oracle corpus measures 0.08).
    * Low-threshold sweeps need more tables/probes ([[
    * cosineLshMultiProbe]]) or the blocked exact path — and now the
    * pipeline can SEE that before shipping a filter. */
  def lshRecallReport(vectors: DataFrame, nPlanes: Int, nTables: Int,
                      threshold: Double): DataFrame = {
    val truth = cosinePairs(vectors, threshold).select("a", "b")
    val lsh = cosineLsh(vectors, nPlanes, nTables, threshold).select("a", "b")
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nLsh = lsh.agg(count(lit(1)).as("n_lsh"))
    val nCommon = truth.join(lsh, Seq("a", "b")).agg(count(lit(1)).as("n_common"))
    nTruth.crossJoin(nLsh).crossJoin(nCommon)
      .select(col("n_truth"), col("n_lsh"), col("n_common"),
        round(col("n_common").cast("double") /
          greatest(col("n_truth"), lit(1L)).cast("double"), 6).as("recall"))
  }

  /** Multi-probe sign-LSH near-dup (Lv et al. 2007's multi-probe idea
    * applied to the sign-LSH family): each vector probes its OWN bucket
    * plus the `nPlanes` buckets at Hamming distance 1, so a pair is a
    * candidate when their bucket ids differ in at most one bit in any
    * table — the recall that single-probe only reaches with ~2× the
    * tables.
    *
    * The 100 TB trade this operator exists for: recall per table comes
    * from probing, not from MORE tables of hyperplane dot products. The
    * probe side explodes to (nPlanes+1) narrow (bucket, id) rows —
    * two longs each — while each extra TABLE costs nPlanes full-width
    * dot products per vector plus another self-join. Probe rows are
    * cheap; hyperplane kernels are not. Candidate verification is the
    * same exact-cosine join as [[cosineLsh]]. */
  def cosineLshMultiProbe(vectors: DataFrame, nPlanes: Int, nTables: Int,
                          threshold: Double, dim: Int = 64): DataFrame =
    verifyCosineCandidates(vectors,
      lshCandidatesMultiProbe(vectors, nPlanes, nTables, dim), threshold)

  /** The multi-probe candidate-pair stream alone — the bounded
    * `(a, b)` (a < b, distinct across tables) frame
    * [[cosineLshMultiProbe]] verifies, exposed so OTHER consumers of a
    * near-neighbor candidate graph (the q218 community kNN stage,
    * Clusters.embeddingCommunitiesLsh) reuse this generator instead of
    * re-deriving an all-pairs scorer. Cost is O(n · (nPlanes+1) ·
    * occupancy · nTables) candidate rows — quasi-linear under
    * [[autoPlanes]] sizing, vs the O(n²) cross join it replaces. */
  def lshCandidatesMultiProbe(vectors: DataFrame, nPlanes: Int, nTables: Int,
                              dim: Int = 64): DataFrame = {
    val all = hyperplanes(nPlanes * nTables, dim)
    val bucketCols = (0 until nTables).map { t =>
      lshBucket(col("embedding"), all.slice(t * nPlanes, (t + 1) * nPlanes)).as(s"b$t")
    }
    // same off-dim exclusion as cosineLsh (see the comment there)
    val sized = vectors.where(size(col("embedding")) === dim)
    val withB = sized.select(col("vec_id") +: bucketCols: _*)
    (0 until nTables).map { t =>
      // probe set = exact bucket + every 1-bit flip; probing from ONE
      // side finds every Hamming<=1 pair (if buckets differ in bit j,
      // a's flip-j probe lands exactly on b's bucket), and the a<b
      // filter plus the cross-table distinct dedup mirror images
      val probeSet = array(col(s"b$t") +: (0 until nPlanes).map(j =>
        col(s"b$t").bitwiseXOR(lit(1L << j))): _*)
      val l = withB.select(explode(probeSet).as("bk"), col("vec_id").as("a"))
      val r = withB.select(col(s"b$t").as("bk"), col("vec_id").as("b"))
      l.join(r, "bk").where(col("a") < col("b")).select("a", "b")
    }.reduce(_ union _).distinct()
  }

  /** Scale-matched LSH plane count: fixed planes are the sign-LSH scale
    * trap — 2^planes buckets at growing n means occupancy grows n/2^p
    * and within-bucket candidate PAIRS grow (n/2^p)², quadratic (the
    * r15 sf1 probe measured exactly that: 8 planes read ~15× wall for
    * 10× data; 12 planes read ~4.9×). planes = ceil(log2(n / target))
    * keeps expected occupancy at `target` and pair work ~linear in n.
    * One count job; clamped to [4, 30] (past 30 the 1-bit probe set and
    * long bucket ids still hold, but 2^30 buckets ≫ any real corpus's
    * useful resolution). The verify-by-true-cosine contract is
    * unchanged — planes tune candidate RECALL vs cost only.
    *
    * Integer-exact on purpose: the smallest p with 2^p·target ≥ n is
    * the same number as ceil(log2(n/target)) clamped to [4, 30], but
    * the log form computed as log(n)/log(2) can land one ulp above an
    * exact power of two and ceil up a spurious plane — and the DuckDB
    * oracle mirrors this formula, so both sides use the same pure
    * 64-bit comparison and cannot disagree at any n. */
  def autoPlanes(vectors: DataFrame, targetPerBucket: Int = 8): Int = {
    require(targetPerBucket > 0)
    val n = vectors.count()
    (4 to 30).find(p => (1L << p) * targetPerBucket >= n).getOrElse(30)
  }

  /** [[cosineLshMultiProbe]] at the [[autoPlanes]] plane count — the
    * production entry point at unknown scale, and since r17 the q58
    * key itself: the DuckDB oracle recomputes p with the same integer
    * comparison and rebuilds the LCG hyperplanes per (table, bit) in
    * SQL, so the oracle follows the auto-sizing instead of pinning the
    * operator to the fixed-planes scale trap. */
  def cosineLshMultiProbeAuto(vectors: DataFrame, nTables: Int, threshold: Double,
                              dim: Int = 64, targetPerBucket: Int = 8): DataFrame =
    cosineLshMultiProbe(vectors, autoPlanes(vectors, targetPerBucket),
      nTables, threshold, dim)

  /** Embedding-cosine near-dup pairs within a blocking key (label):
    * equi-join on the block, cosine in codegen, threshold filter. The
    * blocking key bounds each bucket; AQE skew-join splits outliers.
    *
    * Scale note: this operator's CONTRACT is quadratic — it emits every
    * within-block pair score, so cost is O(Σ|block|²) in any engine
    * (measured: a salted-join variant that fans the pair loop over
    * blocks × salts tasks was 2× SLOWER here — the constant is the
    * per-pair row copy, not task parallelism — see git history). The
    * 100 TB path for the same capability is [[cosineLsh]], which is
    * linear in n at fixed collision rate. */
  def cosinePairs(vectors: DataFrame, threshold: Double): DataFrame = {
    // Norms are computed ONCE per row before the join (n rows), not per
    // candidate pair (n² rows within a block): cos(a,b) then costs one
    // dot product instead of three. Same expression graph per pair —
    // dot/(na*nb) — so values are bit-identical to cosine(emb_a, emb_b).
    val withNorm = vectors.select(col("label"), col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val l = withNorm.select(col("label"), col("vec_id").as("a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val r = withNorm.select(col("label"), col("vec_id").as("b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    // Spread the STREAMED side over the cluster before the probe: when
    // the build side broadcasts (the common case — one block's worth of
    // norms is small), join parallelism = streamed-side partitions, and
    // a small single-file input scans as 1-2 splits — leaving the
    // O(|block|²) probe loop on one core (measured: the whole sf1 cost,
    // 34.5 s → 3.1 s). A round-robin repartition of n narrow rows is
    // trivially cheap next to the pair loop it parallelizes. When the
    // table outgrows the auto-broadcast threshold Spark plans a
    // sort-merge join instead; the spread then costs one extra narrow
    // exchange of the streamed side — small next to the SMJ's own
    // shuffles, and the quadratic-output regime belongs to cosineLsh
    // anyway (see scale note above).
    val lSpread = l.repartition(l.sparkSession.sparkContext.defaultParallelism)
    lSpread.join(r, Seq("label"))
      .where(col("a") < col("b"))
      .withColumn("cos_raw", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      // Two-stage threshold: the raw double compare rejects the vast
      // majority of pairs before the (BigDecimal-backed) round ever
      // runs; the margin is a strict superset of everything that could
      // round up to the threshold, and the exact rounded filter then
      // applies the unchanged contract. Same output, ~pair-count fewer
      // BigDecimal allocations.
      .where(col("cos_raw") >= threshold - 1e-6)
      .withColumn("cos", round(col("cos_raw"), 6))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), col("label"), col("cos"))
      .orderBy("a", "b")
  }

  /** Fuzzy blocked join (q96) — record linkage by edit distance: doc
    * pairs whose text PREFIXES are within `maxDist` Levenshtein edits,
    * candidates blocked on (lang, first word). Classic
    * blocking-then-compare linkage: the blocking key turns the
    * quadratic all-pairs comparison into an equi-join whose
    * within-block pair count is what you actually pay, at the classic
    * blocking trade — a pair differing in its FIRST word is never
    * compared (recall < 1 by design; widen recall with more blocking
    * passes on other keys, the standard multi-pass linkage scheme,
    * exactly like [[multiProbeLshPairs]] widens q15b). Levenshtein is
    * an integer DP — no float surface at all — and both engines
    * implement the same classic distance.
    *
    * Scale shape: one equi-join exchange on the blocking key; the
    * per-pair DP is pipelined inside the join and bounded by the
    * PREFIX, not the document — and since r14 by the THRESHOLD too
    * (the r13 sweep's 55.6 s sf1 tail was this DP running unbanded on
    * every blocked candidate): `levenshtein(pa, pb, maxDist)` is
    * Spark's thresholded variant — O(len·maxDist) band instead of
    * len², early-abandoning the moment every cell in a DP band
    * exceeds the cap (which also subsumes the classic
    * |Δlen| > maxDist length prefilter) — returning the exact
    * distance when ≤ maxDist and −1 otherwise. Measured 12.5 → 11.1 s
    * at sf1 clean and 5× on the r13 driver number; an explicit
    * length-band `where` was ALSO tried and measured SLOWER (2.4 vs
    * 1.4 s at sf0.1 — it splits the fused join-filter stage to prune
    * ~nothing, fixed-width prefixes all share one length), so it is
    * deliberately absent. Skewed blocks (every doc starting "the")
    * split like any hot join key under AQE.
    *
    * Occupancy guard (r17): AQE splits a hot block's TASKS but not its
    * O(block²) pair count — a head block that grows linearly with the
    * corpus (every English doc starting "the") is the one quadratic
    * term left in this operator. `maxBlock` caps it: blocks at or under
    * the cap compare exactly as before (sub-block 0), larger blocks are
    * deterministically sub-blocked on the SECOND word (hash60(w2) mod
    * ceil(cnt/maxBlock)), so per-block pair work is bounded by
    * ~cnt·maxBlock instead of cnt². The trade is the standard
    * multi-pass-blocking recall trade, but only ON MEGA-BLOCKS: a pair
    * inside an oversize block is found iff it also agrees on w2 —
    * near-dups overwhelmingly do (they share a prefix of `prefixLen`
    * chars) — while every block under the cap keeps recall exactly.
    * The block count rides a window over the same (lang, w1) hash
    * partitioning the self-join needs, so the guard costs no extra
    * exchange shape at scale. */
  def fuzzyPairs(docs: DataFrame, prefixLen: Int, maxDist: Int,
                 maxBlock: Int = Int.MaxValue): DataFrame = {
    require(maxBlock > 0, "maxBlock must be positive")
    val w = Window.partitionBy("lang", "w1")
    val d = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        element_at(split(col("text"), " "), 1).as("w1"),
        coalesce(element_at(split(col("text"), " "), 2), lit("")).as("w2"),
        substring(col("text"), 1, prefixLen).as("p"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sub", when(col("cnt") <= maxBlock, lit(0L)).otherwise(
        pmod(hash60(col("w2")),
          floor((col("cnt") + lit(maxBlock.toLong - 1)) / lit(maxBlock.toLong)).cast("long"))))
    val a = d.select(col("lang"), col("w1"), col("sub"), col("doc_id").as("a"), col("p").as("pa"))
    val b = d.select(col("lang"), col("w1"), col("sub"), col("doc_id").as("b"), col("p").as("pb"))
    a.join(b, Seq("lang", "w1", "sub"))
      .where(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb"), maxDist))
      .where(col("dist") >= 0)
      .select(col("lang"), col("a"), col("b"), col("dist"))
      .orderBy("a", "b")
  }

  /** Persist a corpus's MinHash band index — (band_id, band_key,
    * doc_id, sig), partitioned by band_id — so later DELTA batches
    * dedup against the corpus without recomputing or reshuffling it
    * ([[incrementalPairs]]). Built once per corpus snapshot; the same
    * [[bandStructs]] encoding as the batch join, so the two can never
    * drift. */
  def saveBandIndex(docs: DataFrame, path: String, k: Int = 3,
                    numHashes: Int = 12, rowsPerBand: Int = 2): Unit = {
    val numBands = numHashes / rowsPerBand
    minhashSignatures(docs, k, numHashes)
      .select(col("doc_id"), col("sig"),
        explode(bandStructs(col("sig"), numBands, rowsPerBand)).as("band"))
      .select(col("band.band_key").as("band_key"), col("doc_id"), col("sig"),
        col("band.band_id").as("band_id"))
      .write.mode("overwrite").partitionBy("band_id").parquet(path)
  }

  /** Incremental near-dup detection: a NEW batch against a PERSISTED
    * corpus band index — the daily-crawl-increment pattern, where
    * re-running [[minhashLsh]] over corpus+delta would re-shuffle 100 TB
    * to dedup a 100 GB day. Two legs, both delta-sized:
    *
    *  - **cross** (delta × corpus): the delta's banded signatures
    *    BROADCAST into a single scan of the saved index — the corpus
    *    side is never shuffled, and the signatures needed for
    *    verification ride the matched rows (no corpus-wide distinct to
    *    rebuild them). Output pairs are (a = corpus doc, b = delta doc).
    *  - **intra** (delta × delta): a new batch can self-duplicate, so
    *    the plain batch join runs over the delta alone.
    *
    * Same band encoding, same signature-agreement estimate, same
    * threshold as the batch operator — DedupSpec pins the union equal
    * to full-batch [[minhashLsh]] pairs restricted to pairs touching
    * the delta. */
  def incrementalPairs(corpusIndexPath: String, delta: DataFrame, k: Int = 3,
                       numHashes: Int = 12, rowsPerBand: Int = 2,
                       minEstJaccard: Double = 0.5): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val store = delta.sparkSession.read.parquet(corpusIndexPath)
    val dsig = minhashSignatures(delta, k, numHashes)
    val dband = dsig
      .select(col("doc_id"), col("sig"),
        explode(bandStructs(col("sig"), numBands, rowsPerBand)).as("band"))
      .select(col("band.band_id").as("band_id"), col("band.band_key").as("band_key"),
        col("doc_id").as("b"), col("sig").as("sig_b"))
    val cross = store
      .join(broadcast(dband), Seq("band_id", "band_key"))
      .select(col("doc_id").as("a"), col("sig").as("sig_a"), col("b"), col("sig_b"))
      .distinct() // a pair colliding in several bands scores once
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / lit(numHashes.toDouble), 6))
      .where(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
    cross.union(minhashLsh(delta, k, numHashes, rowsPerBand, minEstJaccard))
      .orderBy("a", "b")
  }

  /** q219: content-defined-chunk dedup report — the BYTE-level,
    * shift-robust rung of the dedup ladder ([[graft.functions.GearChunk]]
    * for why fixed blocks and fixed-offset shingles can't do this):
    * every document is gear-chunked, a chunk is a duplicate when the
    * same chunk hash already occurs at a CANONICAL earlier position
    * (the minimum (doc_id, offset) holding that hash — cross-document
    * or an earlier repeat within the same document), and the report
    * states per source how many bytes a chunk-store would actually
    * have to keep. This is the crawl-snapshot question ("the same page
    * re-crawled with one edited paragraph") where MinHash says
    * "near-dup, score 0.93" but cannot say WHICH bytes are new; the
    * chunk frame says exactly, in O(bytes), without q163's
    * suffix-array build.
    *
    * Scale shape: chunking is a map-only codegen'd expression; the
    * only exchange is the chunk-hash groupBy (min-struct canonical
    * pick, map-side combinable) + the join marking duplicates — the
    * q13 exact-dedup shape at chunk grain. State per hash: one
    * (doc_id, off) pair. */
  def cdcDedupReport(docs: DataFrame, avgBits: Int, minLen: Int,
      maxLen: Int): DataFrame = {
    import graft.functions.GearChunk.gearChunks
    val chunks = docs
      .select(col("doc_id"), col("source"),
        explode(gearChunks(col("text"), avgBits, minLen, maxLen)).as("c"))
      .select(col("doc_id"), col("source"), col("c.off").as("off"),
        col("c.len").as("len"), col("c.h").as("h"))
    val canon = chunks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("off"))).as("first"))
    chunks.join(canon, "h")
      .withColumn("dup",
        (col("doc_id") =!= col("first.doc_id") ||
          col("off") =!= col("first.off")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("len").as("total_bytes"),
        sum(when(col("dup") === 1, col("len")).otherwise(0L)).as("dup_bytes"),
        expr("sum(CASE WHEN dup = 1 THEN len ELSE 0 END) * 1000000" +
          " div sum(len)").as("dup_ratio_micro"))
      .orderBy("source")
  }
}
