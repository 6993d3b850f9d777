package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents corpus: tokenization,
  * token-cost accounting, quality scoring, language ID, fingerprinting.
  *
  * The reference tokenizes with cl100k_base per row during load and sums
  * token counts + API cost on the driver (reference Program.cs:40,80,
  * 111-116). Here tokenization is a codegen'd column expression (no UDF,
  * no external tokenizer dependency — a whitespace/BPE-ish regex proxy)
  * and the rollup is a partial-aggregated 1-row result: at 100 TB the
  * shuffle carries one partial sum per task, nothing else.
  */
object TextAnalysis {

  /** Whitespace tokens with empties filtered — Spark `split` drops
    * trailing empty strings while other engines keep them, so the filter
    * makes the count engine-portable (SURVEY.md §6). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or a single
    * non-space symbol — deterministic and regex-expressible in any engine,
    * standing in for cl100k_base (Program.cs:40; real BPE needs the vocab
    * file, out of scope offline). */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)), t => t =!= ""))

  /** Per-document REAL byte-level BPE token count (reference
    * Program.cs:40,80's cl100k_base SharpToken call, re-expressed):
    * merge table trained once on a BOUNDED deterministic sample
    * (driver-side, fixed cost at any corpus scale — exactly like any
    * tokenizer training step), broadcast to executors, then one
    * codegen'd [[graft.functions.BpeCount]] expression per row — no
    * UDF, no shuffle. See [[graft.functions.Bpe]] for why the vocab is
    * corpus-trained rather than OpenAI's shipped cl100k table (no
    * egress; mechanics are identical and the real vocab is a drop-in
    * constructor argument). */
  def bpeCorpusTokens(docs: DataFrame, numMerges: Int = 256, sampleN: Int = 512): DataFrame = {
    import graft.functions.{Bpe, BpeCount}
    import org.apache.spark.sql.graftbridge.SqlBridge
    // null texts are legal rows (the expression path returns null for
    // them) but must not reach the learner's pre-tokenizer
    val sample = docs.where(col("text").isNotNull).orderBy("doc_id").limit(sampleN)
      .select("text").collect().map(_.getString(0)).toSeq
    val bc = docs.sparkSession.sparkContext.broadcast(Bpe.learn(sample, numMerges))
    docs.select(
      col("doc_id"),
      SqlBridge.column(BpeCount(SqlBridge.expression(col("text")), bc)).as("n_bpe_real"),
      size(tokens(col("text"))).as("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** [[bpeCorpusTokens]] with a SHIPPED vocabulary instead of corpus
    * training: loads a tiktoken-format merge table from `vocabPath`
    * (the `<base64-token> <rank>`-per-line format cl100k_base.tiktoken
    * uses) and counts with the identical broadcast + codegen'd
    * [[graft.functions.BpeCount]] plan. For a user with the real
    * cl100k file on disk this makes q05b-class counts EXACTLY the
    * reference tokenizer's (Program.cs:40,80) — the one documented
    * deviation the corpus-trained default carries, closed by a file
    * path. Same scale shape: the vocab loads once on the driver
    * (~1.7 MB for cl100k), ships once per executor, per-row encode
    * stays inside whole-stage codegen. */
  def bpeFileTokens(docs: DataFrame, vocabPath: String): DataFrame = {
    import graft.functions.{Bpe, BpeCount}
    import org.apache.spark.sql.graftbridge.SqlBridge
    val bc = docs.sparkSession.sparkContext.broadcast(Bpe.loadTiktoken(vocabPath))
    docs.select(
      col("doc_id"),
      SqlBridge.column(BpeCount(SqlBridge.expression(col("text")), bc)).as("n_bpe_real"),
      size(tokens(col("text"))).as("n_ws_tokens"))
      .orderBy("doc_id")
  }

  /** Non-distinct word k-grams over a PRE-MATERIALIZED tokens array
    * column (`ts` must be a plain attribute — see Dedup.shinglesOf for
    * the HOF re-evaluation trap). Distinct-set shingling for MinHash/
    * Jaccard is Dedup.shinglesOf; this keeps multiplicity for
    * repetition statistics. */
  def ngramsOf(ts: Column, k: Int): Column = {
    val n = size(ts)
    filter(
      transform(ts, (_, i) => when(i <= n - k, concat_ws(" ", slice(ts, i + 1, lit(k))))),
      s => s.isNotNull)
  }

  /** Gopher-style repetition signals per document: over the
    * NON-DISTINCT word 2-gram stream, the fraction of grams covered by
    * the single most frequent gram (`top_gram_frac`) and the fraction
    * that are repeats of an earlier gram (`dup_gram_frac`) — the two
    * filters that catch boilerplate and degenerate repetition that
    * per-token quality scores miss (Rae et al. 2021, Gopher §A1.1).
    *
    * Scale shape: one exchange on (doc_id, gram) with map-side partial
    * counts, then a partial-agg rollup to one row per doc — shuffle
    * volume is O(distinct grams per doc), never pairs. Documents with
    * fewer than 2 tokens have no gram stream and are absent by
    * contract. */
  def repetition(docs: DataFrame, k: Int = 2): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("__ts"))
      .select(col("doc_id"), explode(ngramsOf(col("__ts"), k)).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_grams"),
        count(lit(1)).as("n_distinct"),
        round(max("c").cast("double") / sum("c"), 6).as("top_gram_frac"),
        round((sum("c") - count(lit(1))).cast("double") / sum("c"), 6).as("dup_gram_frac"))
      .orderBy("doc_id")

  /** Compressibility quality signal (q125): per-document DEFLATE
    * compressed/raw byte ratio in integer micro-units, plus the
    * curation gate — boilerplate, generated spam and scraped templates
    * compress abnormally well (low ratio), natural prose sits in a
    * stable band. One narrow codegen'd pass over the text scan
    * ([[graft.functions.DeflateLen]] — no UDF, no shuffle before the
    * output sort); docs below `minRatioMicro` flag `too_compressible`.
    * Rows-only by contract: DEFLATE bytes are encoder-version-
    * dependent (see the kernel's scaladoc), the signal's invariants
    * are spec-pinned instead. */
  def compressionSignal(docs: DataFrame, minRatioMicro: Long = 300000L): DataFrame = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    import graft.functions.DeflateLen
    docs
      .where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        SqlBridge.column(DeflateLen(SqlBridge.expression(col("text"))))
          .cast("long").as("n_deflate"))
      .withColumn("ratio_micro",
        expr("n_deflate * 1000000L DIV n_bytes"))
      .withColumn("too_compressible",
        (col("ratio_micro") < minRatioMicro).cast("int"))
      .orderBy("doc_id")
  }

  /** Per-document token counts (reference Program.cs:80,88). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Corpus rollup + embedding-API cost at the reference's two price
    * points (Program.cs:111-116: $0.10 and $0.02 per 1M tokens). */
  def tokenCost(docs: DataFrame): DataFrame =
    docs.select(size(tokens(col("text"))).as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(sum("n_tokens") * lit(0.10) / lit(1000000.0), 6).as("cost_ada_v2_usd"),
        round(sum("n_tokens") * lit(0.02) / lit(1000000.0), 6).as("cost_v3_small_usd"))

  /** Fixed-size document chunking with overlap — the training-data prep
    * step between dedup and tokenization: chunk i of a document covers
    * characters [i·step, i·step + size) with step = size − overlap, so
    * consecutive chunks share `overlap` characters of context. A narrow
    * generator (sequence + explode + substr): output row count is
    * content-proportional, no shuffle, 100 TB-safe by construction.
    * Empty documents emit no chunks; any non-empty document emits at
    * least one. */
  def chunk(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val n = length(col("text"))
    val nChunks = ceil(greatest(n - lit(overlap), lit(1)).cast("double") / lit(step.toDouble))
      .cast("int")
    docs
      .where(n > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("text").substr(col("chunk_idx") * step + 1, lit(size)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        length(col("chunk")).as("chunk_chars"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Token-budget chunking — the variant an LLM training pipeline
    * actually feeds to packing: windows of `maxTokens` whitespace
    * tokens stepping by maxTokens − overlap, chunk text rejoined with
    * single spaces (token-level chunking normalizes intra-document
    * whitespace by construction; char-exact reconstruction is
    * [[chunk]]'s contract, not this one's). Tokens materialize into a
    * column once per row before the window slices read them (HOF
    * re-evaluation trap — see Dedup.shinglesOf). Narrow generator, no
    * shuffle. */
  def chunkByTokens(docs: DataFrame, maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val step = maxTokens - overlap
    val n = size(col("__ts"))
    val nChunks = ceil(greatest(n - lit(overlap), lit(1)).cast("double") / lit(step.toDouble))
      .cast("int")
    docs
      .select(col("doc_id"), tokens(col("text")).as("__ts"))
      .where(n > 0)
      .select(col("doc_id"), col("__ts"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        concat_ws(" ", slice(col("__ts"), col("chunk_idx") * step + 1, lit(maxTokens))).as("chunk"),
        least(lit(maxTokens), size(col("__ts")) - col("chunk_idx") * step).as("chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Sequence packing: assign token chunks to fixed-budget training
    * packs by cumulative token position — the streaming-concatenation
    * packing every pretraining pipeline runs after chunking (documents
    * concatenated in deterministic order, cut every `budget` tokens; a
    * chunk lands in the pack where its first token falls).
    *
    * Scale shape: packing is inherently sequential, so it runs per
    * BUCKET — a deterministic hash of doc_id scatters documents over
    * `buckets` independent streams, each packed by one window pass
    * (partitioned window, never a global sort). At 100 TB, buckets ≈
    * cluster cores; each pack is local to a bucket, which is exactly
    * how multi-worker data loaders shard anyway. Returns per-pack
    * rollups (chunk count, token sum) — deterministic, oracle-checkable. */
  def packChunks(chunks: DataFrame, budget: Int, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0)
    import org.apache.spark.sql.expressions.Window
    val bucket = pmod(col("doc_id"), lit(buckets.toLong)).as("bucket")
    val w = Window.partitionBy("bucket").orderBy("doc_id", "chunk_idx")
    chunks
      .select(bucket, col("doc_id"), col("chunk_idx"), col("chunk_tokens"))
      .withColumn("start_tok",
        coalesce(sum("chunk_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", (col("start_tok") / budget).cast("long"))
      .groupBy("bucket", "pack_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("chunk_tokens").as("pack_tokens"))
      .orderBy("bucket", "pack_id")
  }

  /** PII redaction patterns — deliberately simple/portable forms that
    * behave identically under java.util.regex (Spark) and RE2 (DuckDB):
    * no backtracking-sensitive constructs. Applied in a fixed order
    * (email → ipv4 → phone) on both engines. */
  object Pii {
    val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val Phone = "\\+\\d{7,15}" // international form: + then 7-15 digits
  }

  /** PII redaction — the corpus-hygiene scrub every pretraining
    * pipeline runs: emails, IPv4 addresses and international phone
    * numbers replaced by typed placeholders, with per-document match
    * counts for auditing. Pure narrow codegen'd expressions, zero
    * shuffle.
    *
    * Each audit count is taken on the text THAT PATTERN actually sees
    * (after the previous replacements), so counts always equal the
    * replacements performed — counting everything on the original text
    * would claim a "phone" redaction for digits an email match already
    * consumed. */
  def redactPii(docs: DataFrame): DataFrame = {
    def countOf(c: Column, pat: String): Column =
      size(regexp_extract_all(c, lit(pat), lit(0)))
    docs.select(col("doc_id"), col("text"))
      .withColumn("n_emails", countOf(col("text"), Pii.Email))
      .withColumn("__t1", regexp_replace(col("text"), Pii.Email, "<EMAIL>"))
      .withColumn("n_ips", countOf(col("__t1"), Pii.Ipv4))
      .withColumn("__t2", regexp_replace(col("__t1"), Pii.Ipv4, "<IP>"))
      .withColumn("n_phones", countOf(col("__t2"), Pii.Phone))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        regexp_replace(col("__t2"), Pii.Phone, "<PHONE>").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Heuristic quality score: length, punctuation density, stopword hit
    * ratio, mean token length — the standard LLM-corpus filters, all as
    * codegen'd expressions. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTokens = size(tokens(col("text")))
    val nPunct = size(filter(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)), t => t =!= ""))
    val stopHits = size(filter(tokens(col("text")),
      t => t.isin("the", "a", "and", "of", "to", "in", "is", "it")))
    docs.select(
      col("doc_id"),
      col("n_chars"),
      nTokens.as("n_tokens"),
      round(nPunct.cast("double") / greatest(nTokens, lit(1)).cast("double"), 6).as("punct_ratio"),
      round(stopHits.cast("double") / greatest(nTokens, lit(1)).cast("double"), 6).as("stopword_ratio"),
      round(col("n_chars").cast("double") / greatest(nTokens, lit(1)).cast("double"), 6).as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** N-gram-heuristic language ID: score each candidate language by
    * stopword hits and pick the argmax (deterministic tiebreak on
    * language code). Expressible as a CASE cascade, so oracle-checkable. */
  /** Composite quality-gate REPORT (q59): every rule evaluated per doc
    * with machine-readable reasons — the auditable form of a corpus
    * filter (C4/Gopher pipelines publish per-rule removal rates; a bare
    * boolean gate like [[CorpusPipeline.qualityGate]] can't). Rules
    * evaluate on the same 6-dp-rounded signals the q16/q16b keys emit,
    * so the gate is engine-exact by construction. One narrow pass:
    * tokens materialize into columns once (see [[Dedup.shinglesOf]] on
    * the interpreted-HOF re-evaluation trap), reasons are a
    * null-skipping concat_ws in fixed rule order, zero shuffles before
    * the contractual output sort. Null lang never flags lang_mismatch
    * (null comparison → null → rule skipped), matching SQL CASE
    * semantics. */
  def qualityReport(docs: DataFrame, minTokens: Int, minStopword: Double,
                    maxMeanTokenLen: Double): DataFrame = {
    // Every non-cheap signal is STAGED through a bound column, one
    // select per altitude, so nothing interpreted evaluates twice.
    // CollapseProject leaves these Projects alone (it only merges when
    // a referenced alias is cheap or used once) — an inline
    // formulation let the langPred CASE re-evaluate its four
    // size(filter(...)) HOFs per branch, and `keep` re-evaluate the
    // whole reasons tree: ~80 interpreted array walks per row,
    // measured 10.7 s where this runs in ~1 s at sf0.1.
    def hits(words: Seq[String]): Column =
      size(filter(col("__lt"), t => t.isin(words: _*)))
    val withHits = docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        tokens(col("text")).as("__t"), tokens(lower(col("text"))).as("__lt"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("__t")).as("n_tokens"),
        size(filter(col("__t"),
          t => t.isin("the", "a", "and", "of", "to", "in", "is", "it"))).as("__stop"),
        hits(Seq("the", "and", "of", "to", "is")).as("__en"),
        hits(Seq("el", "la", "de", "que", "y")).as("__es"),
        hits(Seq("le", "la", "de", "et", "les")).as("__fr"),
        hits(Seq("der", "die", "und", "das", "ist")).as("__de"))
    val best = greatest(col("__en"), col("__es"), col("__fr"), col("__de"))
    val signals = withHits.select(col("doc_id"), col("lang"), col("n_tokens"),
      round(col("__stop").cast("double") /
        greatest(col("n_tokens"), lit(1)).cast("double"), 6).as("__stop_ratio"),
      round(col("n_chars").cast("double") /
        greatest(col("n_tokens"), lit(1)).cast("double"), 6).as("__mean_len"),
      when(best === 0, "und")
        .when(col("__de") === best, "de")
        .when(col("__en") === best, "en")
        .when(col("__es") === best, "es")
        .otherwise("fr").as("__lang_pred"))
    signals
      .select(col("doc_id"), col("n_tokens"),
        concat_ws(",",
          when(col("n_tokens") < minTokens, "too_few_tokens"),
          when(col("__stop_ratio") < minStopword, "low_stopword"),
          when(col("__mean_len") > maxMeanTokenLen, "long_tokens"),
          when(col("__lang_pred") =!= lit("und") && col("__lang_pred") =!= col("lang"),
            "lang_mismatch")).as("reasons"))
      .select(col("doc_id"), col("n_tokens"), col("reasons"),
        (col("reasons") === "").cast("int").as("keep"))
      .orderBy("doc_id")
  }

  def langId(docs: DataFrame): DataFrame = {
    // Tokenize ONCE into a column; the four per-language counts then
    // filter a cheap attribute instead of re-running lower+regex-split
    // per language (4× the scan's heaviest expression otherwise).
    def hits(words: Seq[String]): Column =
      size(filter(col("__toks"), t => t.isin(words: _*)))
    val en = hits(Seq("the", "and", "of", "to", "is"))
    val es = hits(Seq("el", "la", "de", "que", "y"))
    val fr = hits(Seq("le", "la", "de", "et", "les"))
    val de = hits(Seq("der", "die", "und", "das", "ist"))
    val best = greatest(en, es, fr, de)
    docs.select(col("doc_id"), col("lang"), tokens(lower(col("text"))).as("__toks"))
      .select(
        col("doc_id"),
        col("lang"),
        when(best === 0, "und")
          .when(de === best, "de")
          .when(en === best, "en")
          .when(es === best, "es")
          .otherwise("fr").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Polynomial rolling-hash fingerprint of the token stream:
    * fp = sum_i h(token_i) * 31^(n-1-i) mod 1e9+7, with h = first 15 hex
    * chars of md5 — pure integer arithmetic, portable across engines.
    * Modulus 1e9+7 keeps every intermediate < 2^35, so no engine hits
    * 64-bit overflow (DuckDB raises on overflow rather than wrapping). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = lit(1000000007L)
    val fp = aggregate(
      tokens(col("text")),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), p), p))
    docs.select(col("doc_id"), fp.as("fingerprint")).orderBy("doc_id")
  }

  /** Tokenizer fertility report (q161): per (lang, source) stratum —
    * subword tokens per word ("fertility", the standard tokenizer-equity
    * metric: how many BPE pieces the tokenizer spends per whitespace
    * word) and chars per subword token (compression). A multilingual
    * corpus audit runs this before fixing a token budget: a tokenizer
    * trained English-heavy can burn 2-3× the tokens per word on other
    * scripts, silently re-weighting the training mix; the per-stratum
    * fertility table is where that shows up. Uses the same engine-
    * portable token definitions as q05/q05b ([[tokens]] whitespace
    * words, [[bpeTokenCount]] subword proxy).
    *
    * Scale shape: per-row narrow counting (both token definitions are
    * codegen'd regex expressions), then ONE map-side-combined groupBy
    * on the low-cardinality (lang, source) key — the shuffle carries
    * ≤ strata × tasks partial rows. The division happens on the
    * aggregate, never per row. */
  def fertility(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"), col("n_chars"),
        size(tokens(col("text"))).as("__w"),
        bpeTokenCount(col("text")).as("__b"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("__w").cast("long")).as("n_words"),
        sum(col("__b").cast("long")).as("n_subwords"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_chars"),
        col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 6).as("fertility"),
        round(col("n_chars").cast("double") /
          greatest(col("n_subwords"), lit(1L)).cast("double"), 6).as("chars_per_subword"))
      .orderBy("lang", "source")

  /** q222: unigram token-entropy quality signal — per-document Shannon
    * entropy of the token distribution, H = −Σ_t (tf/len)·ln(tf/len),
    * reported per source. The information-theoretic rung of the
    * quality ladder: q35's Gopher repetition counts SPECIFIC patterns
    * (dup lines, top-n-gram share); entropy reads the whole
    * distribution at once — boilerplate/keyword-stuffed text scores
    * low, diverse prose scores near ln(len), and a feed whose mean
    * entropy drifts down is degenerating even when no single pattern
    * trips q35.
    *
    * Exactness (the q38 discipline): each term's −(tf/len)·ln(tf/len)
    * is floor-quantized to integer MICRO-nats BEFORE the per-doc sum,
    * so the cross-engine sum is exact integer arithmetic (double
    * addition order can never flip the hash); per-source mean is an
    * integer division. Shape: one (doc, term)-grain exchange (the q41
    * vocab-stats grain) + a doc rollup + a source rollup. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val perDoc = tf
      .groupBy(col("doc_id"), col("source"))
      .agg(
        sum("tf").as("len"),
        count(lit(1)).as("n_distinct"),
        // len is constant within doc only after the rollup — fold the
        // per-term floor with len carried via a window-free identity:
        // Σ tf = len, so quantize against the doc's own len below
        collect_list(col("tf")).as("tfs"))
      .select(col("doc_id"), col("source"), col("len"), col("n_distinct"),
        aggregate(col("tfs"), lit(0L), (acc, t) =>
          acc + floor((-(t.cast("double") / col("len").cast("double")) *
            log(t.cast("double") / col("len").cast("double"))) * lit(1e6))
            .cast("long")).as("ent_micro"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("sum(ent_micro) div count(1)").as("mean_entropy_micro"),
        min("ent_micro").as("min_entropy_micro"),
        max("ent_micro").as("max_entropy_micro"))
      .orderBy("source")
  }

  /** q224: distinct-n-gram diversity per source — the repetition dial
    * read at the CORPUS grain instead of q35's per-document counters:
    * the distinct-to-total ratio of 1/2/3-grams (the "distinct-n"
    * metric of the Self-BLEU/diversity literature). A source whose
    * trigram diversity collapses is template boilerplate even when
    * every individual document passes the q59 gates — exactly the
    * signal that decides "dedup harder vs drop the source" before
    * training.
    *
    * Exactness: counts are exact integers (one (source, n, gram-hash)
    * grain), the ratio divides exact operands, 6 dp. The distinct runs
    * over the 60-bit md5 gram hash, the q14c/q36 shingle convention
    * BOTH engines share — the exchange carries (source, n, long)
    * triples instead of multi-word strings, which at sf1 was the whole
    * cost of the first cut. Scale shape: one explode of ~3× the token
    * stream into narrow rows + one partial-agg exchange for the
    * distinct, then a (source, n) rollup — the q41/q223 grain family;
    * no joins. */
  def ngramDiversity(docs: DataFrame, maxN: Int = 3): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    // Tokenize ONCE and materialize the (source, token-array) frame:
    // the per-n branches below each re-ran the full text scan +
    // regex tokenize unmaterialized (maxN passes over the corpus,
    // r19). The branch shape itself stays the flat explode-per-n —
    // no struct/flatten megaframe; the single-explode first cut ran
    // the nested HOF interpreted over 3× the token stream and cost
    // ~4× this shape.
    val tok = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      docs.select(col("source"), tokens(lower(col("text"))).as("t")))
    val t = col("t")
    def branch(n: Int): DataFrame = {
      val grams =
        if (n == 1) t
        else when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", slice(t, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      tok.select(col("source"), explode(grams).as("g"))
        .select(col("source"), graft.operators.Dedup.hash60(col("g")).as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("h")).as("distinct_ngrams"))
        .select(col("source"), lit(n).as("n"), col("total_ngrams"),
          col("distinct_ngrams"))
    }
    (1 to maxN).map(branch).reduce(_ union _)
      .select(col("source"), col("n"), col("total_ngrams"),
        col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double"), 6).as("diversity"))
      .orderBy("source", "n")
  }

  /** [[ngramDiversity]]'s HLL++ twin — the 100 TB path (the
    * q41-approx/q140b convention): the exact key's cost IS the
    * corpus-wide distinct exchange over every 1/2/3-gram (the sf1
    * sweep's 3rd-heaviest non-image key); a diversity DIAL does not
    * need exact cardinalities, and the sketch collapses the exchange
    * to fixed-size HLL buffers per (source, n). rsd defaults to the
    * Spark default 5%. */
  def ngramDiversityApprox(docs: DataFrame, maxN: Int = 3,
      rsd: Double = 0.05): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val t = tokens(lower(col("text")))
    def branch(n: Int): DataFrame = {
      val grams =
        if (n == 1) t
        else when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", slice(t, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      docs.select(col("source"), explode(grams).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("total_ngrams"),
          approx_count_distinct(col("g"), rsd).as("distinct_ngrams"))
        .select(col("source"), lit(n).as("n"), col("total_ngrams"),
          col("distinct_ngrams"))
    }
    (1 to maxN).map(branch).reduce(_ union _)
      .select(col("source"), col("n"), col("total_ngrams"),
        col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double"), 6).as("diversity"))
      .orderBy("source", "n")
  }
}
