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

  /** Leakage-safe train/eval split (q203) — the fix for the classic
    * contamination bug the [[contamination]] report only MEASURES:
    * under a doc-keyed split rule, near-duplicate documents land on
    * BOTH sides and the eval set silently scores memorization (Lee et
    * al. 2022 §6.2 measure the effect; every serious pipeline since
    * splits by cluster). Here every document follows its dup-cluster
    * REPRESENTATIVE (the CC min-id from the q43 machinery; singletons
    * represent themselves), so a cluster can never straddle the split
    * BY CONSTRUCTION — and the report carries the proof dial next to
    * the counterfactual: how many clusters the naive doc-keyed rule
    * would have torn across the boundary.
    *
    * Scale shape: the MinHash-LSH pair generation and pointer-jumped
    * CC are exactly q14/q43's (hash-bucketed equi-joins, never
    * all-pairs); the split is then ONE broadcast-sized join of the
    * membership table (dup docs only — singletons never shuffle) back
    * onto the corpus plus per-split aggregates. Output: one row per
    * split with doc/cluster counts and the two global leak dials. */
  def leakageSafeSplit(docs: DataFrame, k: Int, numHashes: Int,
      rowsPerBand: Int, minEstJaccard: Double, trainPct: Int): DataFrame = {
    val labeled = Clusters.connectedComponents(
      Dedup.minhashLsh(docs, k, numHashes, rowsPerBand, minEstJaccard)
        .select("a", "b"))
      .select(col("doc_id"), col("cluster_id"))
    def splitOf(idCol: org.apache.spark.sql.Column) =
      when(pmod(Dedup.hash60(idCol.cast("string")), lit(100L)) < trainPct,
        "train").otherwise("eval")
    // materialized once: the two leak dials and the final census each
    // re-ran the docs-side join unmaterialized (3 passes, r19); the
    // frame is 4 narrow columns per doc
    val tagged = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      docs.select(col("doc_id"))
        .join(labeled, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("cluster_id"),
          splitOf(coalesce(col("cluster_id"), col("doc_id"))).as("split"),
          splitOf(col("doc_id")).as("naive_split")))
    // global leak dials: clusters whose members straddle the boundary
    // under each rule (safe is 0 by construction — reported as proof)
    def leaky(splitCol: String) = tagged.where(col("cluster_id").isNotNull)
      .groupBy("cluster_id")
      .agg(countDistinct(col(splitCol)).as("ns"))
      // coalesce: a dup-free corpus leaves the cluster frame EMPTY and
      // a global agg over it returns one NULL-sum row
      .agg(coalesce(sum(when(col("ns") > 1, 1L).otherwise(0L)), lit(0L)).as("n"))
    val dials = leaky("split").select(col("n").as("leaky_clusters_safe"))
      .crossJoin(leaky("naive_split").select(col("n").as("leaky_clusters_naive")))
    tagged
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(broadcast(dials))
      .orderBy("split")
  }

  /** N-gram contamination report — the decontamination pass actually
    * used for benchmark hygiene (exact-match [[contamination]] misses
    * paraphrased leaks; GPT-3-style pipelines flag eval docs sharing
    * long n-grams with training data). For every eval document with at
    * least one word `k`-shingle: how many of its distinct shingles also
    * occur anywhere in the train split, and a flag when the overlap
    * fraction reaches `flagFrac`.
    *
    * Scale shape: both sides explode to (id, shingle) rows and
    * immediately collapse the shingle STRING to its 60-bit md5 hash —
    * the distinct/join exchanges then shuffle 8-byte longs instead of
    * k-word strings (~4× less shuffle volume at k=5; md5 is computed
    * once per shingle, pre-shuffle, and 2⁻⁶⁰ collisions are
    * deterministic AND identical in the oracle, which hashes the same
    * way). The train side collapses to a distinct hash set (hash
    * exchange with map-side partial agg — O(distinct shingles), the
    * unavoidable cost of decontamination); the probe is an equi-join
    * on the hash followed by a per-doc partial-agg rollup. No pairs,
    * no cartesian. `k` should be large enough that chance overlap is
    * rare (real pipelines use 8-13; tests pin a smaller k to the
    * testdata's tiny vocabulary). */
  def ngramContamination(docs: DataFrame, k: Int, trainPct: Int = 90,
                         flagFrac: Double = 0.25): DataFrame = {
    val tagged = docs.withColumn("split", splitCol(trainPct))
    val evalSh = Dedup.shingleRows(tagged.where(col("split") === "eval"), k)
      .select(col("doc_id"), Dedup.hash60(col("s")).as("h"))
    val trainSh = Dedup.shingleRows(tagged.where(col("split") === "train"), k)
      .select(Dedup.hash60(col("s")).as("h")).distinct().withColumn("hit", lit(1L))
    val frac = round(
      sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)), 6)
    evalSh
      .join(trainSh, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        frac.as("overlap_frac"),
        (frac >= flagFrac).cast("int").as("flagged"))
      .orderBy("doc_id")
  }

  /** Bloom-pruned n-gram decontamination — EXACTLY
    * [[ngramContamination]]'s answer, with the train-side heavy lifting
    * gated behind a Bloom filter of the eval shingle set. This is the
    * 100 TB formulation: eval suites are tiny and fixed while the train
    * corpus is the whole crawl, so shuffling every distinct train
    * shingle (ngramContamination's unavoidable exchange) means an
    * exchange proportional to the CORPUS. Here the filter built from
    * the eval side rides to the train scan as a plan literal, and only
    * train shingles that MIGHT hit eval survive into the
    * distinct+join — the exchange shrinks from O(distinct train
    * shingles) to O(true hits + false positives), i.e. from
    * corpus-sized to benchmark-sized.
    *
    * Exactness: a Bloom filter has no false negatives, so every train
    * shingle hash equal to some eval hash passes the gate; false
    * positives are hashes NOT equal to any eval hash, and the
    * subsequent equi-join discards them. The result is therefore
    * bit-identical to [[ngramContamination]] (CorpusOpsSpec runs the
    * differential), and the SQL oracle is the same exact statement.
    *
    * Sizing: `mBits = 0` (the default) self-sizes — one
    * approx_count_distinct pass over the eval hashes picks the next
    * power of two ≥ 16× the estimate (~11 bits/element → fpp well
    * under 1% at k=5), clamped to [2^20, 2^26] (128 KiB – 8 MiB of
    * word array — it rides the ONE per-stage task-binary broadcast,
    * not per-task traffic). A fixed m would silently rot: the sf1 sweep
    * measured exactly that — 2^20 bits over sf1's ~10⁶ distinct eval
    * shingles is ~1 bit/element, fpp ≈ 50%, and the gate stopped
    * pruning. An explicit `mBits` still wins when the caller knows the
    * suite size (and is what the specs pin). */
  def bloomNgramContamination(docs: DataFrame, k: Int, trainPct: Int = 90,
                              flagFrac: Double = 0.25, mBits: Int = 0,
                              nProbes: Int = 5): DataFrame = {
    val tagged = docs.withColumn("split", splitCol(trainPct))
    // ONE shingle pass over the eval slice, materialized: the sizing
    // estimate, the Bloom build, and the final per-doc join all read
    // these narrow (doc_id, h) rows — unmaterialized, each consumer
    // re-ran the shingle explode+hash scan (3 passes total, r19)
    val evalSh = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      Dedup.shingleRows(tagged.where(col("split") === "eval"), k)
        .select(col("doc_id"), Dedup.hash60(col("s")).as("h")))

    val m =
      if (mBits > 0) mBits
      else {
        val est = evalSh.select(approx_count_distinct("h").as("n"))
          .head().getLong(0)
        val want = 16L * math.max(est, 1L)
        var p = 1L << 20
        while (p < want && p < (1L << 26)) p <<= 1
        p.toInt
      }
    val mightContain = bloomGate(evalSh.select(col("h")), m, nProbes)
    val trainSh = Dedup.shingleRows(tagged.where(col("split") === "train"), k)
      .select(Dedup.hash60(col("s")).as("h"))
      .where(mightContain)
      .distinct().withColumn("hit", lit(1L))

    val frac = round(
      sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)), 6)
    evalSh
      .join(trainSh, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        frac.as("overlap_frac"),
        (frac >= flagFrac).cast("int").as("flagged"))
      .orderBy("doc_id")
  }

  /** Build a Bloom membership predicate over the `h` column of
    * `hashes` (non-negative 60-bit longs) and return it as a pure
    * Column testable against any frame's `h` column. Eagerly runs the
    * build job (one bit_or groupBy, ≤ mBits/64-row bounded collect);
    * the returned predicate is `nProbes` codegen'd element_at + mask
    * conjunctions over a typedlit word array — no UDF, no broadcast
    * variable, survives into whole-stage codegen of whatever scan it
    * gates. Double hashing: p_j = ((h & M) + j·((h>>29)|1 & M)) & M,
    * the step forced odd so probes cycle the whole table. */
  private[graft] def bloomGate(hashes: DataFrame, mBits: Int,
                               nProbes: Int): org.apache.spark.sql.Column = {
    require((mBits & (mBits - 1)) == 0, "mBits must be a power of two")
    val mask = (mBits - 1).toLong
    val nWords = mBits / 64
    // ONE SQL-expression builder over a column named `h`, shared
    // verbatim by build and probe — the filter can never test
    // different bits than the build set.
    def posSql(j: Int): String =
      s"(((h & $mask) + $j * ((shiftright(h, 29) | 1) & $mask)) & $mask)"
    val words = hashes.select(col("h")).distinct()
      .select((0 until nProbes).map(j => expr(posSql(j)).as(s"p$j")): _*)
      .select(explode(array((0 until nProbes).map(j => col(s"p$j")): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .collect()
    val dense = new Array[Long](nWords)
    words.foreach(r => dense(r.getInt(0)) = r.getLong(1))
    val bitsLit = typedlit(dense.toSeq)
    (0 until nProbes).map { j =>
      val p = posSql(j)
      element_at(bitsLit, expr(s"CAST(shiftright($p, 6) AS INT)") + 1)
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p % 64 AS INT))"))
        .notEqual(lit(0L))
    }.reduce(_ && _)
  }

  /** Domain mixing: downsample each source so the kept corpus hits
    * target per-source proportions (ppm shares) — the mixture step
    * every pretraining recipe runs after cleaning (e.g. re-weighting
    * web vs books vs code). Water-filling semantics: the budget is the
    * largest total the targets allow given each source's actual count
    * (the scarcest source relative to its share binds), every rate
    * then derives from the budget in INTEGER arithmetic (floor
    * divisions only — float rates would round differently per engine),
    * and membership is the same md5-bucket rule as [[splitCol]]:
    * deterministic, re-run-stable, never `rand()`.
    *
    * Scale shape: per-source counts and rates are O(#sources) rows
    * computed by one partial-agg exchange and broadcast back; the keep
    * decision is a narrow filter (hash + compare) on the main scan. Two
    * passes over the corpus (count, then filter+audit), both narrow.
    * Returns the per-source audit (counts, rates, achieved ppm). */
  def domainMix(docs: DataFrame, targetPpm: org.apache.spark.sql.Column): DataFrame = {
    val M = 1000000L
    val tagged = docs.select(
      col("doc_id"), col("source"), targetPpm.cast("long").as("target_ppm"),
      pmod(Dedup.hash60(col("doc_id").cast("string")), lit(M)).as("u"))
    val counts = tagged.groupBy("source", "target_ppm")
      .agg(count(lit(1)).as("n_docs"))
    val budget = counts.agg(min(expr(s"(n_docs * $M) DIV target_ppm")).as("b"))
    val rates = counts.crossJoin(broadcast(budget))
      .withColumn("target_cnt", expr(s"(b * target_ppm) DIV $M"))
      .withColumn("keep_ppm", expr(s"(target_cnt * $M) DIV n_docs"))
    val kept = tagged
      .join(broadcast(rates.select("source", "keep_ppm")), "source")
      .where(col("u") < col("keep_ppm"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    val tot = kept.agg(sum("n_kept").as("total_kept"))
    rates
      .join(kept, Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .select(
        col("source"), col("n_docs"), col("target_ppm"), col("keep_ppm"), col("n_kept"),
        expr(s"(n_kept * $M) DIV greatest(total_kept, 1)").as("achieved_ppm"))
      .orderBy("source")
  }

  /** The default target-share rule for the testdata's `srcN` sources:
    * 20 000 + (N mod 5)·15 000 ppm — sums to exactly 1 000 000 over
    * src0..src19. A real deployment passes its own ppm column/map. */
  def srcTargetPpm: org.apache.spark.sql.Column =
    lit(20000L) +
      pmod(coalesce(regexp_extract(col("source"), "[0-9]+", 0).cast("long"), lit(0L)),
        lit(5L)) * 15000L

  /** Embedding-space contamination report — semantic decontamination:
    * eval vectors whose cosine similarity to ANY train vector reaches
    * the near-dup threshold (exact-match and n-gram checks miss
    * paraphrases; embedding similarity is the standard third layer).
    * Composes [[Dedup.cosineLsh]] (linear multi-table sign-LSH, the
    * 100 TB candidate path — never all-pairs) with the split rule: LSH
    * pairs → keep cross-split pairs → per-eval-vector rollup (match
    * count, max cosine). The split hashes vec_id with the same
    * md5-bucket rule as [[splitCol]]. */
  def embeddingContamination(vectors: DataFrame, nPlanes: Int, nTables: Int,
                             threshold: Double, trainPct: Int = 90): DataFrame = {
    def split(c: org.apache.spark.sql.Column) =
      when(pmod(Dedup.hash60(c.cast("string")), lit(100L)) < trainPct, "train")
        .otherwise("eval")
    Dedup.cosineLsh(vectors, nPlanes, nTables, threshold)
      .withColumn("sa", split(col("a")))
      .withColumn("sb", split(col("b")))
      .where(col("sa") =!= col("sb"))
      .select(
        when(col("sa") === "eval", col("a")).otherwise(col("b")).as("eval_id"),
        col("cos"))
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_train_matches"), max("cos").as("max_cos"))
      .orderBy("eval_id")
  }

  /** Corpus-wide span-level dedup (C4/RefinedWeb-style "remove
    * repeated spans"): document texts split into consecutive
    * NON-overlapping `spanTokens`-word spans; every later occurrence of
    * a span already seen anywhere in the corpus is dropped and the
    * document reassembled from its surviving spans. "First occurrence"
    * is the lexicographic minimum of (doc_id, span_idx) — a total,
    * engine-portable order, never arrival order. This is the
    * finer-grained sibling of doc-level dedup (q13/q14): boilerplate
    * repeated INSIDE otherwise-distinct documents (headers, footers,
    * license blocks) survives doc-level passes and is exactly what
    * span dedup removes.
    *
    * Scale shape: spans are a narrow generator (tokens materialized
    * once — HOF re-evaluation trap, see Dedup.shinglesOf); each span
    * collapses to its 60-bit md5 hash BEFORE any exchange, so the
    * first-occurrence groupBy and the verdict join shuffle 8-byte
    * longs, not span strings. One partial-agg exchange on span hash
    * (O(distinct spans)), one equi-join back, one per-doc rollup.
    * Never pairs, never a global sort. The (doc_id, span_idx) pair
    * packs into one long for the min-aggregate (span_idx < 2^20 —
    * a million spans per document; packing keeps the aggregate a
    * primitive long min instead of a struct min, and the SAME packing
    * runs in the oracle). */
  def spanDedup(docs: DataFrame, spanTokens: Int = 8): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    val n = size(col("__ts"))
    val nSpans = ceil(n.cast("double") / lit(spanTokens.toDouble)).cast("int")
    val spans = docs
      .select(col("doc_id"), tokens(col("text")).as("__ts"))
      .where(n > 0)
      .select(col("doc_id"), col("__ts"), explode(sequence(lit(0), nSpans - 1)).as("span_idx"))
      .select(
        col("doc_id"), col("span_idx"),
        concat_ws(" ", slice(col("__ts"), col("span_idx") * spanTokens + 1, lit(spanTokens))).as("span"))
      .withColumn("h", Dedup.hash60(col("span")))
      .withColumn("okey", col("doc_id") * lit(1048576L) + col("span_idx"))
    val firsts = spans.groupBy("h").agg(min("okey").as("first_okey"))
    spans
      .join(firsts, "h")
      .withColumn("kept", col("okey") === col("first_okey"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            filter(sort_array(collect_list(struct(col("span_idx"), col("kept"), col("span")))),
              x => x.getField("kept")),
            x => x.getField("span")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Corpus-frequency boilerplate removal (the RefinedWeb/CCNet
    * line-dedup semantic on token spans): a span occurring in
    * >= `minDocs` DISTINCT documents is boilerplate — remove EVERY
    * occurrence (including the first) and reassemble each document
    * from its surviving spans. The frequency-threshold complement of
    * [[spanDedup]]: there the first occurrence SURVIVES (dedup — keep
    * one copy of repeated content); here no copy survives (headers,
    * footers, cookie banners, license blocks are noise in every copy,
    * and keeping "the first" would keep noise in one arbitrary
    * document). The gate counts DISTINCT documents, not occurrences,
    * so a phrase repeated inside one document is untouched — that is
    * in-document repetition ([[TextAnalysis.repetitionSignals]]'
    * territory), not cross-document boilerplate.
    *
    * Scale shape (the [[spanDedup]] shape): spans collapse to 60-bit
    * hashes BEFORE any exchange; the document-frequency count is a
    * two-level aggregate — distinct (h, doc_id) pairs first (map-side
    * partial collapses in-document repeats), then counts per h — so
    * exchanges carry 16-byte pairs bounded by the corpus span count,
    * never span text; the verdict LEFT-joins back on the 8-byte hash
    * (no broadcast hint: the common-span set grows with the corpus —
    * AQE decides from measured sizes). One per-doc rollup reassembles.
    * Never pairs, never a global sort. */
  def boilerplateRemoval(docs: DataFrame, spanTokens: Int = 8,
                         minDocs: Int = 2): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    require(minDocs > 1, s"minDocs must exceed 1 (1 would remove everything), got $minDocs")
    val n = size(col("__ts"))
    val nSpans = ceil(n.cast("double") / lit(spanTokens.toDouble)).cast("int")
    val spans = docs
      .select(col("doc_id"), tokens(col("text")).as("__ts"))
      .where(n > 0)
      .select(col("doc_id"), col("__ts"), explode(sequence(lit(0), nSpans - 1)).as("span_idx"))
      .select(
        col("doc_id"), col("span_idx"),
        concat_ws(" ", slice(col("__ts"), col("span_idx") * spanTokens + 1, lit(spanTokens))).as("span"))
      .withColumn("h", Dedup.hash60(col("span")))
    val common = spans.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("h"), lit(true).as("boiler"))
    spans.join(common, Seq("h"), "left")
      .withColumn("kept", col("boiler").isNull)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            filter(sort_array(collect_list(struct(col("span_idx"), col("kept"), col("span")))),
              x => x.getField("kept")),
            x => x.getField("span")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Cross-offset exact-substring repeat report (the DETECTION half of
    * Lee et al. 2022's ExactSubstr dedup, at token granularity): a
    * length-L token window at EVERY offset — not [[spanDedup]]'s
    * aligned, non-overlapping spans, which miss a verbatim repeat the
    * moment it starts mid-span — is hashed, a window is DUPLICATED when
    * its hash occurs at ≥2 sites anywhere in the corpus (other doc or
    * other offset — self-repeats are memorization risk too), and each
    * document reports how much of it is covered by duplicated windows:
    * overlapping hit windows merge into maximal islands (the "maximal
    * repeated substring" readout) and the covered-token fraction is the
    * per-doc removal/penalty signal.
    *
    * Scale shape: windows are a narrow posexplode (corpus token count ×
    * 1 rows, same cost class as shingling), duplicate detection is one
    * hash-groupBy, and the island merge is a per-doc running max — a
    * window function over (doc_id, pos), i.e. one hash exchange on
    * doc_id and a WITHIN-PARTITION sort of each doc's hit list (hits,
    * not tokens), never a global sort. */
  def repeatedSubstrings(docs: DataFrame, windowTokens: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowTokens > 1, s"windowTokens must exceed 1, got $windowTokens")
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("n_tokens"), col("__ts"))
      .where(col("n_tokens") > 0)
    // materialized once (r19): the duplicate-hash census and the hit
    // join consume these narrow (doc_id, pos, h) rows under different
    // projections, which defeats exchange reuse — unmaterialized, the
    // tokenize + window-explode + hash pass ran twice
    val wins = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(base
      .select(col("doc_id"),
        posexplode(TextAnalysis.ngramsOf(col("__ts"), windowTokens)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), Dedup.hash60(col("g")).as("h")))
    val dupH = wins.groupBy("h").agg(count(lit(1)).as("n_sites"))
      .where(col("n_sites") >= 2).select("h")
    val hits = wins.join(dupH, "h").select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val isl = hits
      .withColumn("prev_end", max(col("pos") + lit(windowTokens - 1))
        .over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byPos))
    val perIsland = isl.groupBy("doc_id", "island")
      .agg(min("pos").as("s"), (max("pos") + lit(windowTokens - 1)).as("e"),
        count(lit(1)).as("nw"))
    val perDoc = perIsland.groupBy("doc_id")
      .agg(sum(col("e") - col("s") + 1).as("covered"),
        sum("nw").as("n_dup_windows"), count(lit(1)).as("n_islands"))
    base.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        round(coalesce(col("covered"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
      .orderBy("doc_id")
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

  /** Deterministic epoch shuffle: the reproducible global reordering a
    * training run needs per epoch (data order changes loss curves;
    * `rand()` would give every retry of a failed job a DIFFERENT order,
    * so resumption and A/B comparisons demand a seeded permutation).
    * The shuffle key is [[Dedup.hash60]] over `doc_id:epoch` — the same
    * cross-engine md5 bucket rule [[splitCol]] uses — so the order is a
    * pure function of (doc_id, epoch): epoch n+1 reshuffles, re-running
    * epoch n reproduces it exactly.
    *
    * Scale shape: one hash exchange on `shard` (each shard's rows
    * co-locate), then a PER-SHARD sort for `pos` — the window never
    * sees more than |corpus|/nShards rows, and writing shard files is
    * `partitionBy(shard)` + `sortWithinPartitions(skey)` with no global
    * sort anywhere. Tie-break (skey, doc_id) makes `pos` total even if
    * two ids collide in the 60-bit key space. */
  def corpusShuffle(docs: DataFrame, epoch: Int, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"),
        Dedup.hash60(concat(col("doc_id").cast("string"), lit(":" + epoch)))
          .as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos",
        (row_number().over(Window.partitionBy("shard").orderBy("skey", "doc_id"))
          - 1).cast("bigint"))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** Dedup AS A TABLE COMMIT (q150, r14): run the canonical-pick
    * quality dedup over a snapshot table and materialize the result as
    * ONE merge-on-read delete commit — the non-keeper ids become a
    * tombstone file, zero data rewrite, fully time travelable ("the
    * corpus before dedup" stays a readable snapshot, and the delete is
    * one [[Snapshots.rollback]] away from undone). This is the shape a
    * recurring 100 TB curation job actually wants: the expensive
    * rewrite is deferred to the next scheduled [[Snapshots.compact]],
    * while readers see the deduped corpus immediately.
    *
    * Scale shape: [[Dedup.canonicalPick]]'s single content-hash
    * exchange produces keepers; non-keepers come from one left-anti
    * join of the id column against the (group-count-sized) keeper set;
    * the tombstone write is loser-sized. Nothing collects. */
  def dedupCommit(spark: org.apache.spark.sql.SparkSession,
                  path: String): Long = {
    val cur = Snapshots.read(spark, path)
    val keepers = Dedup.canonicalPick(cur).select(col("keeper_id").as("doc_id"))
    val losers = cur.select("doc_id").join(keepers, Seq("doc_id"), "left_anti")
    Snapshots.deleteKeys(spark, path, losers, "doc_id")
  }

  /** Pretraining sample index (q162; the published Megatron-LM GPTDataset
    * doc_idx/sample_idx build, distributed): concatenate the epoch-
    * shuffled corpus into one virtual token stream — each document
    * contributes its tokens plus ONE separator (EOS) — and slice it into
    * fixed `seqLen`-token training examples. The output is the INDEX a
    * data loader consumes (example → which docs, at which offsets), not
    * the token arrays: per example, how many docs it spans, how many
    * real tokens it holds (only the final example may be short), the doc
    * the example starts in and the token offset within that doc's
    * stream. Same deterministic epoch order as [[corpusShuffle]] (a pure
    * function of doc_id and epoch — never rand()).
    *
    * Scale shape: the global placement uses the q08 two-pass bucket
    * discipline — skey is md5-uniform, so DETERMINISTIC uniform spans
    * between the collected min/max (one 2-value agg; a pure function of
    * the key, immune to exchange-reuse replanning) bucket the stream;
    * within-bucket running sums + a window over the ≤numBuckets-row
    * offset table place every doc without a global sort. The example
    * explode is `sequence(first_ex, last_ex)` — output rows =
    * n_examples + n_docs, linear — and the final rollup is one
    * example_id exchange. Nothing driver-side scales with the corpus. */
  /** Shared placement for the pretraining stream (q162/q167): each doc's
    * [start, start+len) slot in the epoch-shuffled virtual token stream
    * (len = n_tokens + 1 EOS), via the q08 two-pass deterministic
    * bucket discipline. None ⟺ empty corpus. */
  private def placedDocs(docs: DataFrame, epoch: Int,
                         numBuckets: Int, eos: Boolean = true): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"),
      Dedup.hash60(concat(col("doc_id").cast("string"), lit(":" + epoch))).as("skey"),
      (size(tokens(col("text"))) + lit(if (eos) 1 else 0)).cast("long").as("len"))
    val stats = base.agg(min(col("skey")).as("mn"), max(col("skey")).as("mx")).collect()(0)
    if (stats.isNullAt(0)) return None
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val span = math.max((mx - mn) / numBuckets + 1, 1L)
    val parted = base.withColumn("pid", ((col("skey") - mn) / span).cast("long"))
    val local = parted.withColumn("cum",
      sum(col("len")).over(Window.partitionBy("pid").orderBy("skey", "doc_id")))
    val offsets = parted.groupBy("pid").agg(sum(col("len")).as("cnt"))
    val w = Window.partitionBy(lit(0)).orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOffset = offsets
      .withColumn("off", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .select("pid", "off")
    Some(local.join(broadcast(withOffset), "pid")
      .select(col("doc_id"), (col("off") + col("cum") - col("len")).as("start"), col("len")))
  }

  def sampleIndex(docs: DataFrame, seqLen: Int, epoch: Int,
                  numBuckets: Int = 32): DataFrame = {
    val placed = placedDocs(docs, epoch, numBuckets).getOrElse(
      return docs.select(lit(0L).as("example_id"), lit(0L).as("n_docs"),
        lit(0L).as("n_tokens"), lit(0L).as("start_doc"),
        lit(0L).as("start_offset")).limit(0))
    val L = lit(seqLen.toLong)
    placed
      .select(col("doc_id"), col("start"), col("len"),
        explode(sequence(floor(col("start") / L).cast("long"),
          floor((col("start") + col("len") - 1) / L).cast("long"))).as("example_id"))
      .select(col("example_id"), col("doc_id"), col("start"),
        (least(col("start") + col("len"), (col("example_id") + 1) * L) -
          greatest(col("start"), col("example_id") * L)).as("contrib"))
      .groupBy("example_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contrib")).as("n_tokens"),
        min_by(col("doc_id"), col("start")).as("start_doc"),
        min(col("start")).as("__mnstart"))
      .select(col("example_id"), col("n_docs"), col("n_tokens"), col("start_doc"),
        greatest(lit(0L), col("example_id") * L - col("__mnstart")).as("start_offset"))
      .orderBy("example_id")
  }

  /** Heaps-law vocabulary growth curve (q169; Heaps 1978): distinct
    * vocabulary seen after each tenth of the epoch-shuffled token
    * stream — the empirical V(n) curve whose log-log slope is the Heaps
    * β a corpus-health audit tracks next to the Zipf slope (q166).
    * Template-heavy or deduplicated-to-death corpora flatten early;
    * scraped boilerplate inflates the head. The stream order is the
    * SAME epoch shuffle as q120/q162 (a pure function of doc_id and
    * epoch), so the curve is reproducible and decile boundaries are
    * exact integer arithmetic (f·cuts div total — no float wobble at
    * bucket edges).
    *
    * Scale shape: token-only [[placedDocs]] placement (no global
    * sort), one term exchange for first-occurrence minima (map-side
    * partial min), then a ≤cuts-row decile rollup + window. Nothing
    * driver-side but the 1-value total. */
  def vocabGrowth(docs: DataFrame, cuts: Int = 10, epoch: Int = 1,
                  numBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val placed = placedDocs(docs, epoch, numBuckets, eos = false).getOrElse(
      return docs.select(lit(0).as("decile"), lit(0L).as("n_prefix_tokens"),
        lit(0L).as("vocab_seen"), lit(0.0).as("type_token_ratio")).limit(0))
    val total = placed.agg(sum(col("len"))).collect()(0).getLong(0)
    if (total == 0L)
      return docs.select(lit(0).as("decile"), lit(0L).as("n_prefix_tokens"),
        lit(0L).as("vocab_seen"), lit(0.0).as("type_token_ratio")).limit(0)
    val firstOcc = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .join(placed, "doc_id")
      .select(col("term"), (col("start") + col("pos")).as("gpos"))
      .groupBy("term").agg(min(col("gpos")).as("f"))
    val byDecile = firstOcc
      .select(expr(s"(f * $cuts) div $total").as("d"))
      .groupBy("d").agg(count(lit(1)).as("nv"))
    val deciles = (0 until cuts).map(_.toLong).toDF("d")
    val w = Window.partitionBy(lit(0)).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    deciles.join(byDecile, Seq("d"), "left")
      .na.fill(0L, Seq("nv"))
      .withColumn("vocab_seen", sum(col("nv")).over(w))
      .select((col("d") + 1).cast("int").as("decile"),
        expr(s"(d + 1) * $total div $cuts").as("n_prefix_tokens"),
        col("vocab_seen"))
      .select(col("decile"), col("n_prefix_tokens"), col("vocab_seen"),
        round(col("vocab_seen").cast("double") /
          greatest(col("n_prefix_tokens"), lit(1L)).cast("double"), 6)
          .as("type_token_ratio"))
      .orderBy("decile")
  }

  /** Packed training examples (q167): the MATERIALIZED form of
    * [[sampleIndex]] — the same epoch-shuffled virtual stream (one EOS
    * per doc) actually tokenized to ids and sliced into full
    * `seqLen`-long `input_ids` rows, ready for
    * [[graft.sources.Safetensors.writeTokens]]. The id scheme is the
    * corpus-trained convention every from-scratch run uses: 0 = EOS,
    * 1 = OOV, 2.. = the top `vocabTop` terms by (freq desc, term asc) —
    * deterministic, and the vocabulary is BOUNDED so the token→id map
    * is a broadcast join, never unbounded driver state. The trailing
    * short example is dropped (the Megatron convention — trainers want
    * a rectangular tensor).
    *
    * Scale shape: vocabulary ranking is the q166 TakeOrdered discipline
    * (bounded heaps + a vocabTop-bounded rank window); the stream is a
    * linear posexplode placed by [[placedDocs]] (no global sort); ids
    * attach via one broadcast hash join; examples assemble with ONE
    * example_id exchange (collect_list + array_sort — each group is
    * exactly seqLen rows). */
  def packedTokens(docs: DataFrame, seqLen: Int, epoch: Int, vocabTop: Int,
                   numBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val placed = placedDocs(docs, epoch, numBuckets).getOrElse(
      return docs.select(lit(0L).as("example_id"),
        array().cast("array<long>").as("input_ids")).limit(0))
    val tf = docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val vocab = tf.orderBy(col("c").desc, col("term")).limit(vocabTop)
      .withColumn("token_id", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("c").desc, col("term")))
        .cast("long") + 1L)
      .select("term", "token_id")
    val toks = docs
      .select(col("doc_id"),
        posexplode(concat(tokens(col("text")), array(lit(null).cast("string"))))
          .as(Seq("pos", "term")))
    val idStream = toks.join(placed, "doc_id")
      .join(broadcast(vocab), Seq("term"), "left")
      .select((col("start") + col("pos")).as("gpos"),
        when(col("term").isNull, 0L)                    // EOS sentinel
          .otherwise(coalesce(col("token_id"), lit(1L))) // OOV -> 1
          .as("tid"))
    val L = lit(seqLen.toLong)
    idStream
      .select((col("gpos") / L).cast("long").as("example_id"),
        struct(col("gpos"), col("tid")).as("cell"))
      .groupBy("example_id")
      .agg(count(lit(1)).as("n"), array_sort(collect_list(col("cell"))).as("cells"))
      .where(col("n") === L)  // drop the trailing short example
      .select(col("example_id"),
        transform(col("cells"), c => c.getField("tid")).as("input_ids"))
      .orderBy("example_id")
  }

  /** Per-rule attrition funnel (q160): the curation-ablation report a
    * FineWeb/Dolma-class pipeline publishes with every release — for
    * each quality rule IN ORDER, how many documents enter the stage,
    * how many that stage removes, and what share of its input that is.
    * Rules are q59's exact four (token floor, stopword ratio, mean
    * token length, lang-ID mismatch) so the funnel is the sequential
    * decomposition of the same gate: Σ n_removed + final n_out equals
    * the corpus size, and a doc is charged to the FIRST rule it fails
    * (sequential semantics — rule i only sees survivors of rules
    * 1..i-1), which is what makes per-rule costs additive and
    * comparable across releases.
    *
    * Scale shape: one narrow pass computes each doc's first-failing
    * rule index (the q59 signal expressions, staged once), then ONE
    * map-side-combined groupBy on that 5-value key — the shuffle
    * carries ≤ 5 rows per task. The funnel arithmetic (cumulative
    * removed → running n_in) is a window over the ≤4-row aggregate,
    * bounded by the RULE count, not the data. Nothing collects. */
  def attritionFunnel(docs: DataFrame, minTokens: Int, minStopword: Double,
                      maxMeanTokenLen: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    // Stage the q59 signals exactly (same bound-column discipline: one
    // select per altitude so no interpreted HOF evaluates twice).
    def hits(words: Seq[String]) =
      size(filter(col("__lt"), t => t.isin(words: _*)))
    val sig = docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        tokens(col("text")).as("__t"), tokens(lower(col("text"))).as("__lt"))
      .select(col("doc_id"), col("lang"),
        size(col("__t")).as("__n"),
        size(filter(col("__t"),
          t => t.isin("the", "a", "and", "of", "to", "in", "is", "it"))).as("__stop"),
        col("n_chars"),
        hits(Seq("the", "and", "of", "to", "is")).as("__en"),
        hits(Seq("el", "la", "de", "que", "y")).as("__es"),
        hits(Seq("le", "la", "de", "et", "les")).as("__fr"),
        hits(Seq("der", "die", "und", "das", "ist")).as("__de"))
    val best = greatest(col("__en"), col("__es"), col("__fr"), col("__de"))
    val langPred = when(best === 0, "und")
      .when(col("__de") === best, "de")
      .when(col("__en") === best, "en")
      .when(col("__es") === best, "es")
      .otherwise("fr")
    val stopRatio = round(col("__stop").cast("double") /
      greatest(col("__n"), lit(1)).cast("double"), 6)
    val meanLen = round(col("n_chars").cast("double") /
      greatest(col("__n"), lit(1)).cast("double"), 6)
    // First failing rule, 1-based; 0 = survives the whole gate.
    val firstFail = when(col("__n") < minTokens, 1)
      .when(stopRatio < minStopword, 2)
      .when(meanLen > maxMeanTokenLen, 3)
      .when(langPred =!= lit("und") && langPred =!= col("lang"), 4)
      .otherwise(0)
    val byRule = sig.select(firstFail.as("step"))
      .groupBy("step").agg(count(lit(1)).as("n"))
    // ≤5 aggregate rows from here down — window over the RULE axis.
    val rules = Seq((1, "too_few_tokens"), (2, "low_stopword"),
      (3, "long_tokens"), (4, "lang_mismatch")).toDF("step", "rule")
    // coalesce: an EMPTY corpus sums to NULL, and the funnel must read
    // all-zero rows, not nulls
    val total = byRule.agg(coalesce(sum(col("n")), lit(0L)).as("__total"))
    val counts = rules.join(byRule, Seq("step"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
    // constant partitionBy: the frame is the ≤4-row RULE axis; the lit
    // only suppresses the unpartitioned-window log warning
    val w = Window.partitionBy(lit(0)).orderBy("step")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col("step"), col("rule"),
        (col("__total") - coalesce(sum(col("n")).over(w), lit(0L))).as("n_in"),
        col("n").as("n_removed"))
      .select(col("step"), col("rule"), col("n_in"), col("n_removed"),
        (col("n_in") - col("n_removed")).as("n_out"),
        round(col("n_removed").cast("double") /
          greatest(col("n_in"), lit(1)).cast("double"), 6).as("removed_share"))
      .orderBy("step")
  }

  /** q173: one-call corpus health card — the structural dials that
    * decide "ingest or investigate" as (metric, value) rows, so one
    * report answers what otherwise takes five queries: volume (docs,
    * tokens, mean length), redundancy (exact-dup fraction), source
    * balance (top-language share), and vocabulary shape (size, hapax
    * fraction, top-token share — the quick Zipf-head proxies beside
    * q166's full fit). Everything is exact and integer-derived until
    * the final 6-dp ratios, so the card is oracle-hashable.
    *
    * Scale shape: three aggregation passes, each one exchange — a
    * doc-level agg (count / token sum / DISTINCT texts — the exact-dup
    * exchange is the q13 shape), a lang rollup (≤ languages rows), and
    * the two-level term collapse q41 uses (map-side partial counts,
    * vocabulary-bounded exchange). The assembled card is 8 rows. */
  def corpusCard(docs: DataFrame): DataFrame = {
    val base = docs.select(col("lang"), col("text"), tokens(col("text")).as("ts"))
    val docAgg = base.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(col("ts"))), lit(0L)).as("total_tokens"),
      countDistinct(col("text")).as("n_distinct"))
    val langAgg = base.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top_lang"))
    val termAgg = base.select(explode(col("ts")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).as("vocab"),
        coalesce(sum(when(col("f") === 1, 1L).otherwise(0L)), lit(0L)).as("hapax"),
        max(col("f")).as("top_f"))
    docAgg.crossJoin(langAgg).crossJoin(termAgg)
      .select(explode(map(
        lit("n_docs"), col("n_docs").cast("double"),
        lit("total_tokens"), col("total_tokens").cast("double"),
        lit("mean_doc_tokens"), round(col("total_tokens").cast("double") /
          greatest(col("n_docs"), lit(1L)).cast("double"), 6),
        lit("exact_dup_frac"), round((col("n_docs") - col("n_distinct")).cast("double") /
          greatest(col("n_docs"), lit(1L)).cast("double"), 6),
        lit("top_lang_share"), round(coalesce(col("top_lang"), lit(0L)).cast("double") /
          greatest(col("n_docs"), lit(1L)).cast("double"), 6),
        lit("vocab"), col("vocab").cast("double"),
        lit("hapax_frac"), round(col("hapax").cast("double") /
          greatest(col("vocab"), lit(1L)).cast("double"), 6),
        lit("top_token_share"), round(coalesce(col("top_f"), lit(0L)).cast("double") /
          greatest(col("total_tokens"), lit(1L)).cast("double"), 6)))
        .as(Seq("metric", "value")))
      .orderBy("metric")
  }
}
