package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query key proves. Oracle SQL strings live in
  * [[OracleSql]] and are generated from the same constants as the Spark
  * plans so the two sides cannot drift.
  */
object SparkEntry {

  // Shared parameters between Spark queries and oracle SQL.
  object Params {
    val K = 20            // top-k (reference Program.cs:221: KNNSearch(v, 20))
    val QueryVecId = 0L   // reference searches with sampleVectors[0] (Program.cs:210)
    val IvfStep = 25      // deterministic centroid stride (SURVEY.md §4)
    val NProbe = 4
    val SampleN = 100     // reference JSON head dump size (Program.cs:102)
    val ShingleK = 3
    val NumHashes = 12
    val RowsPerBand = 2
    val MinEstJaccard = 0.5
    val CosineThreshold = 0.15
    val SessionGapMin = 30
    val NPlanes = 8
    val NTables = 4
    val TopKPerGroup = 3
    val HistWidth = 50
    val MinTokens = 5
    val MaxMeanTokenLen = 15.0
    val TrainPct = 90
    val ChunkSize = 120
    val ChunkOverlap = 20
    val ChunkTokens = 30
    val ChunkTokenOverlap = 5
    val PackBudget = 256
    val PackBuckets = 8
    val Bm25Terms = Seq("vector", "hash", "spark")
    val Bm25K1 = 1.2
    val Bm25B = 0.75
    val PhraseQuery = "query big part" // q171: a real repeated trigram present
                                       // at every SF (5/5/9 hits at sf0.001/0.01/0.1)
    val KppK = 40         // q172: seeding comparison cell count (~sqrt n at sf0.01)
    val PprSeedPart = 1L  // q184: walk restart seed (part 1 exists at every SF)
    val PprIters = 3      // q184: fixed rounds — the q88 hash-exact convention
    val PprTopN = 20
    val PrefixQuery = "s" // q185: richest prefix in the tiny test vocabulary (6 completions)
    val MltDocId = 1L     // q190: query document (present at every SF)
    val FuzzyQuery = "hashe" // q192: one insert away from "hash" (every SF)
    val TrgQuery = "hashing" // q210: beyond edit distance 1 of "hash" —
                             // the regime trigram similarity serves and
                             // SymSpell (q192) cannot
    val TrgMinSim = 0.25     // q210 pg_trgm similarity floor
    val CmsDepth = 4         // q213 CMS rows (md5 carves 4×28-bit hashes)
    val CmsWidth = 1024      // q213 CMS columns: overestimate ≈ N/1024
                             // per colliding row — small but visibly
                             // nonzero at the gate SFs, which is the
                             // audit's point
    val CmsPanelK = 20       // q213 graded panel: top terms by exact count
    val MsprtTau = 0.1       // q214 mixture scale: prior sd of the true
                             // rate delta — the Optimizely-published
                             // default regime for conversion metrics
    val MsprtAlpha = 0.05    // q214 always-valid significance level
    val LinkTopN = 50        // q215 pairs reported
    val LinkMLang = 0.95     // q215 clerical m priors: P(agree | same
    val LinkMSource = 0.9    //   entity) per field — language nearly
    val LinkMLen = 0.8       //   always survives a re-crawl, length
    val LinkMW2 = 0.85       //   band drifts the most
    val RuleMinSupPct = 1    // q216 support floor: 1% of orders (SF-relative)
    val RuleTopN = 50        // q216 rules reported by lift
    val ConformalAlphaMicro = 100000L // q217: α = 0.1 target-miss budget
    val LpaRounds = 5        // q218 sync label-propagation rounds (the
                             // q88 fixed-iteration hash-exact convention)
    val LpaTopN = 20         // q218 communities reported
    val KnnGraphK = 6        // q218 mutual-kNN degree: below the
                             // 50-vector cluster size at every SF, so
                             // reciprocation stays within-cluster
    val KnnGraphTables = 2   // q218 candidate stream: multi-probe
                             // (Hamming<=1) sign-LSH tables — the q58
                             // table count; probes buy the recall
    val KnnGraphTarget = 32  // q218 autoPlanes expected occupancy:
                             // candidate degree stays ~(p+1)*32*2 per
                             // vector at ANY corpus size, vs n-1 for
                             // the exact twin
    val KnnSeamSources = 128L // q226 audit panel: target sampled-source
                             // count — truth cost stays n×128 at any sf
    val WaitTopN = 25        // q227 wait-fault suppliers reported
                             // (Q21 reports 100; 25 keeps the report
                             // within this corpus's supplier count)
    val DiversityMaxN = 3    // q224 distinct-n dial: 1/2/3-grams, the
                             // diversity-literature convention
    val HitsIters = 2        // q225 HITS rounds: mutual reinforcement
                             // converges fast on the dense purchase
                             // graph; fixed count = hash-exact
    val HitsTopN = 20        // q225 authorities reported
    val CdcAvgBits = 5       // q219 gear mask bits: ~32B expected past
                             // the minimum — short-doc-corpus dial; a
                             // storage system uses 12-13 (4-8 KiB)
    val CdcMinLen = 16       // q219 chunk bounds
    val CdcMaxLen = 128
    val CoresetK = 16        // q229 k-center picks: above the 10-label
                             // cluster count at every SF, so coverage
                             // reaches every cluster with room to
                             // split the wide ones
    val CmsJoinW = 65536     // q220 grid width: collision mass
                             // n_a·n_b/w stays a fraction of the
                             // selective join it estimates
    val JoinEstFlag = "R"            // q220 lineitem filter
    val JoinEstPrio = "1-URGENT"     // q220 orders filter
    val SnippetTerm = "hash" // q179: present at every SF (shares q174's term)
    val SnippetContext = 3   // q179: tokens either side of the first match
    val CovisitCap = 15   // q178: per-user item clamp (heavy-user pair-mass bound)
    val CovisitTopK = 5   // q178: neighbors served per item
    val HoltAlphaNum = 2  // q177: level smoothing 2/10 — the rational keeps the
    val HoltBetaNum = 1   //   fold in exact integer micro-units (beta 1/10)
    val HoltDen = 10
    val HoltHorizon = 3   // q177: hours forecast ahead
    val TriMinCooc = 6    // q176: repeated-co-occurrence edge gate (raw co-occurrence
                          // saturates the supplier graph at every SF; >=6 keeps structure)
    val TriTopN = 20      // q176: suppliers reported
    val ImgDupK = 8       // q175: renditions injected (exact copies + resizes)
    val ImgCopyOffset = 1000000L // q175: rendition doc_id shift (past any SF's ids)
    val ImgHamming = 3    // q175: dHash radius — 4 16-bit bands, lossless by pigeonhole
    val ProxTerms = ("hash", "batch") // q174: corpus terms with near hits
    val ProxWindow = 3
    val RrfDepth = 100
    val RrfK = 60
    val ContamK = 5       // contamination shingle length (tiny-vocab testdata;
                          // real pipelines use 8-13)
    val ContamFlagFrac = 0.25
    val TfidfK = 3
    val PqM = 8             // PQ subspaces over the 64-dim embeddings (q45)
    val SemDedupCos = 0.4   // within-cluster near-twin threshold (q44):
                            // p99 of within-cluster cosine on this corpus
                            // is ~0.36, so 0.4 prunes genuine outlier
                            // twins (~4%), not the cluster body
    val SpanTokens = 8      // span-dedup window (q46); C4 uses 3-sentence
                            // spans, RefinedWeb token windows of this order
    val ProfileCols = Seq("doc_id", "lang", "n_chars", "source") // q47
    val SqDim = 64          // scalar-quantization dimension (q49)
    val StratumN = 5        // per-source exact sample size (q50)
    val OutlierNum = 5      // q51 gate: dist > (Num/Den) × cluster mean;
    val OutlierDen = 4      // 1.25× — see Clusters.outliers on concentration
    val FunnelSteps = Seq("view", "click", "purchase") // q52
    val PercentileQs = Seq(50, 90, 99)  // q56 audit percentiles
    val QsSampleK = 256                 // q212 sample budget: ~3 rank
                                        // points at the median, O(k)
                                        // state per group at any n
    val DsirTargetSources = Seq("src0", "src1") // q54 target ("high-quality") pool
    val DsirBuckets = 256               // q54 hashed-feature buckets
    val MergeMod = 10                   // q55 delta split: vec_id % MergeMod
    val MergeRem = 7                    //   == MergeRem is the "new" batch
    val PqResOffset = 12                // q57 residual-codebook stride phase
                                        // (≠ 0 mod IvfStep: centroid rows have
                                        // residual 0 and would collapse codebooks)
    val MpTables = 2                    // q58 multi-probe: half of NTables —
                                        // Hamming<=1 probing buys the recall
                                        // the other two tables would
    val MpTarget = 8                    // q58 autoPlanes occupancy target:
                                        // planes = min p with 2^p*MpTarget >= n
    val QrMinTokens = 20                // q59 gate thresholds, set against the
    val QrMinStopword = 0.02            // corpus's q16 signal distribution so
    val QrMaxMeanTokenLen = 6.0         // each rule fires on a real minority
    val OpqSampleStride = 2             // q61b learned-OPQ training sample:
                                        // every 2nd vector — ~12 rows per
                                        // code per subspace at sf0.01; the
                                        // thinner stride-5 sample trained
                                        // codebooks that lost to the
                                        // untrained stride baseline
    val OpqIters = 4                    // q61b alternations (error plateaus
                                        // by 4 on this corpus — PqSpec)
    val OpqK = 20                       // q61b codes per subspace — equal to
                                        // the stride baseline's n/IvfStep at
                                        // sf0.01 so the q61-vs-q61b recall
                                        // comparison is same-budget
    val RecallQueryIds = Seq(0L, 7L, 42L) // q62 audit panel: a sampled query
                                          // set, ids present at every SF
    val BqShortlist = 100 // q64b Hamming shortlist — the full-precision
                          // re-rank budget (SF-independent; recall@K is
                          // governed by shortlist/K = 5×, not corpus size)
    val FilterLabel = 3   // q65 predicate: ~10% selectivity at every SF
                          // (labels are uniform 0-9)
    val FilterNProbe = 12 // q65b probe budget: the documented
                          // selectivity↔nprobe trade applied — at ~10%
                          // selectivity each probed cell contributes
                          // ~step/10 matches, so matching K results
                          // needs ~3x the unfiltered NProbe; 12 keeps
                          // the probed fraction scale-independent
    val MrlDim = 16       // q66 prefix dimension: 4x less float data in
                          // stage 1; on MRL-trained vectors 16/64 is the
                          // standard truncation rung
    val MrlShortlist = 100 // q66 full-dim re-rank budget (same 5x-over-K
                           // contract as BqShortlist)
    val DeleteMod = 7     // q68 tombstone set: vec_id % DeleteMod ==
    val DeleteRem = 2     //   DeleteRem (~14% deleted, query id 0 survives)
    val RebalanceMax = 30 // q69 split threshold: 1.2x the stride-25
                          // average occupancy — the q63 skew report at
                          // sf0.1 shows max cells ~1.8x avg, so real
                          // cells cross this at every SF
    val PpsN = 25         // q71 pin count: exactly 25 weighted picks
                          // (Σ n_hits telescopes to exactly this)
    val ReservoirK = 5    // q153 per-source reservoir size
    val CellCap = 8       // q156 per-IVF-cell sample cap
    val MinContainment = 0.5 // q157 directed-containment threshold
    val RepeatWindow = 8  // q159 exact-substring repeat window (tokens);
                          // also q164's SA coverage threshold (equality
                          // at the shared value is what lets q164 carry
                          // q159's oracle)
    val LrsTopK = 20      // q163 longest-repeat shortlist size
    val ZipfTopN = 100    // q166 head size for the log-log OLS fit
    val PackVocab = 4096  // q167 vocabulary cap (ids 2..PackVocab+1;
                          // 0 = EOS, 1 = OOV)
    val HeapsCuts = 10    // q169 vocabulary-growth curve resolution
    val ReservoirSeed = 2026L // q153 LCG seed (the sample is a pure
                              // function of data + this)
    val CollocMin = 5     // q72 pair min-support: prunes the hapax pair
                          // tail before the df joins
    val AnomZ = 2         // q73 z-score gate (2 sigma flags ~3-7% of
                          // hourly cells on this corpus)
    val RangeWindowSec = 300 // q74 band width: clicks within 5 minutes
                             // before each error
    val MmrLambda = 0.5   // q75 relevance/diversity mix: at 0.5 an
                          // EXACT duplicate of a selected result scores
                          // 2λ−1 = 0, so any candidate adding relevance
                          // beyond its redundancy outranks it
    val Q3Segment = "BUILDING"  // q76 market segment (~20% of customers
                                // at every SF — uniform 5-value column)
    val Q3Cutoff = "1998-06-01" // q76 cutoff: mid-range of the 1995-2001
                                // order/ship dates, so both date filters
                                // keep ~half their table
    val Q13ExcludedPriority = "1-" // q77: fold "not urgent" into the
                                   // outer-join condition (Q13's
                                   // special-requests exclusion)
    val Q4From = "1997-01-01"   // q78 quarter window: ~550 orders at
    val Q4Until = "1997-04-01"  // sf0.01, scales linearly with SF
    val DecileBuckets = 10      // q80 positional buckets — the decile
                                // fingerprint curation dashboards plot
    val PathSteps = 3           // q83 path horizon: 5³ possible paths —
                                // one step past q79's pair transitions
    val ZBits = 30              // q84 Morton bits per key (sf1's shifted
                                // 9e8-scale keys still fit; 60-bit z)
    val ZLbBuckets = 4          // q84: 16 z-ranges — row-group-sized
                                // cuts at test scale
    val HeavyPhiInv = 40        // q85 heavy-hitter gate: share > 1/40 —
                                // top synthetic tokens sit at ~3.5%, so
                                // the exact set is non-empty and ≤ 40
                                // rows by pigeonhole at every SF
    val DriftSliceA = "src0"    // q86 drift slices: two same-generator
    val DriftSliceB = "src1"    // sources (so true drift is small and
                                // the χ² ranking is exercised on ties)
    val DriftMinCount = 5       // q86 sub-noise tail gate
    val DriftTopN = 50          // q86 ranked report depth
    val Q6From = "1997-01-01"   // q87 one-year window mid-range of the
    val Q6Until = "1998-01-01"  // 1995-2001 ship dates
    val Q6DiscLo = "0.05"       // q87 discount band — compared in
    val Q6DiscHi = "0.07"       // DECIMAL(12,2), never raw double
    val Q6MaxQty = 24           // q87 quantity cap (TPC-H Q6's value)
    val PrIters = 3             // q88 fixed PageRank rounds — hash-exact
                                // cross-engine because every update is
                                // integer floor arithmetic; 3 rounds
                                // separate hubs from leaves on the
                                // supply graph at every SF
    val PrTopN = 50             // q88 centrality report depth
    val WinsorLoPm = 100        // q89 clamp percentiles: p10/p90 in
    val WinsorHiPm = 900        // permille (integer rank arithmetic)
    val MadK = 3                // q90 outlier gate: |v − med| > 3·MAD —
                                // the textbook robust-z cutoff
    val AttribWindowSec = 86400L // q91 attribution window: 1 day keeps
                                 // both branches populated (~35% of
                                 // purchases attribute at sf0.01; 1h
                                 // would attribute only ~2%)
    val UpsertChangeMod = 7L    // q92 update batch: every 7th doc gets
    val UpsertInsertMod = 13L   // a correction, every 13th spawns a new
    val UpsertIdShift = 1000000000L // new rows at shifted ids — 1e9 is
                                    // above every corpus's id range
                                    // (sf1 tops out ~9e8), so inserts
                                    // stay true inserts at every SF
    val ScdChangeMod = 7L    // q141 v2 feed: every 7th doc's n_chars
                             // changes; every 7th+1 is RESTATED
                             // unchanged (must not open history)
    val ScdDeepMod = 21L     // q141 v3 feed: every 21st doc changes
                             // again (three-row history; non-empty
                             // from 22 docs up — every gate scale)
    val ChecksumBuckets = 32 // q142 range granularity: drift localizes
                             // to key ranges of corpus/32
    val ChecksumDriftMod = 97L // q142 simulated replica drift: every
    val ChecksumDriftRem = 5L  // 97th doc (rem 5) differs — SPARSE, so
                               // the diff isolates a few buckets, and
                               // doc_id 5 exists at every gate scale
    val PcaComponents = 8       // q94: 8 of 64 dims — the 8x reduction
                                // the MRL/prefix serving plans assume
    val PcaSampleStride = 2     // q94 fit sample (the OPQ stride)
    val TempBudget = 200L       // q95 sampling budget: ~40% of sf0.01 —
                                // quotas bind below source sizes
    val FuzzyPrefixLen = 24     // q96 compared prefix (DP cost bound)
    val FuzzyMaxBlock = 128     // q96 occupancy cap: blocks above this
                                // sub-block on hash60(w2) — above the
                                // gate corpora's max block (93), so the
                                // cap is armed but the pair sets are
                                // byte-identical to the uncapped join
    val FuzzyMaxDist = 8        // q96 edit threshold: 11 pairs at
                                // sf0.01, 923 at sf0.1 — populated,
                                // not everything-matches
    val ConvFrom = "signup"     // q97 conversion pair: the funnel's
    val ConvTo = "purchase"     // first two stages, latency profiled
    val Q14From = "1997-09-01"  // q98 promo window: one month (Q14's
    val Q14Until = "1997-10-01" // grain)
    val Q10From = "1997-01-01"  // q99 returns quarter
    val Q10Until = "1997-04-01"
    val Q10TopN = 20            // q99 ranking depth (Q10's value)
    val Q19Bands = Seq(         // q102 OR-of-conjunction clauses —
      ("Brand#12", 1, 5, 1, 11),   // Q19's (brand, size-band, qty-band)
      ("Brand#23", 1, 10, 10, 20), // shape over this corpus's
      ("Brand#3", 1, 15, 20, 30))  // Brand#1..25 / size 1..50 domain
    val Q22From = "1999-01-01"  // q103 dormancy window: the trailing
    val Q22Until = "2002-01-01" // ~2.5y of the 1995-2001 order dates,
                                // so dormant-but-rich customers exist
                                // (6 at sf0.01) without being ~everyone
    val Q17Brand = "Brand#12"   // q104 brand gate (1/25 of parts)
    val Q17FracInv = 5          // q104: qty < avg/5 (Q17's 0.2 factor,
                                // kept as an integer reciprocal)
    val Q18MinQty = 300L        // q105 volume threshold (Q18's value;
                                // p99 order volume ≈ 262 here, so the
                                // survivor set is a thin tail: 46 at
                                // sf0.01, 473 at sf0.1)
    val Q18TopN = 100           // q105 report depth (Q18's value)
    val Q15From = "1997-01-01"  // q106 revenue quarter (Q15's 3-month
    val Q15Until = "1997-04-01" // grain, mid-range of the ship dates)
    val Q11Num = 3              // q107 concentration gate: share >
    val Q11Den = 2              // 3/2 × average per-part share — the
                                // scale-free form of Q11's fraction
                                // (2/29/252 parts at sf0.001/0.01/0.1)
    val Q21TopN = 50            // q108 sole-supplier census depth
    val Q2Type = "ECONOMY"      // q109 part class (p_type is single-
                                // word in this corpus, so Q2's LIKE
                                // suffix collapses to equality)
    val Q2Sizes = Seq(1, 10, 25) // q109 size classes — a SET, not Q2's
                                // point equality: one (type,size) cell
                                // can be empty on a small corpus (the
                                // r12 sf0.001 gate failure at size 15);
                                // AnalyticsOpsSpec pins this set
                                // non-empty through the full
                                // part⋈lineitem⋈EUROPE-supplier join
                                // at the smallest gate scale
    val Q2Region = "EUROPE"     // q109 supplier region
    val Q2TopN = 100            // q109 report depth (Q2's value)
    val Q12From = "1997-01-01"  // q110 ship-year window (Q12's 1-year
    val Q12Until = "1998-01-01" // grain)
    val Q12Critical =           // q110 critical priorities (Q12's
      Seq("1-URGENT", "2-HIGH") // high-line split)
    val Q16ExclBrand = "Brand#45" // q111 excluded brand (Q16's value)
    val Q16Sizes =              // q111 size classes (Q16's 8 sizes)
      Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val Q20From = "1997-01-01"  // q112 shipment window (Q20's 1-year
    val Q20Until = "1998-01-01" // grain)
    val Q7NationA = "NATION_12" // q113 nation pair — picked for
    val Q7NationB = "NATION_11" // bidirectional traffic at sf0.001
                                // (AnalyticsOpsSpec pins non-emptiness
                                // at the smallest gate scale)
    val Q7From = "1996-01-01"   // q113 ship window (Q7's 2-year grain)
    val Q7Until = "1998-01-01"
    val Q9NameLike = "red"      // q154 product family: a color token
                                // every SF's p_name pool carries
                                // (~13% of part at each gate scale)
    val Q8Region = "ASIA"       // q114 market region
    val Q8Type = "STANDARD"     // q114 product class
    val Q8Nation = "NATION_18"  // q114 share nation; output is one row
                                // per in-window order-year regardless
                                // of the numerator, so non-emptiness
                                // needs only in-window region orders
    val Q8From = "1996-01-01"   // q114 order window (Q8's 2-year grain)
    val Q8Until = "1998-01-01"
    val Q20Num = 1              // q112 dominance gate: supplier ships
    val Q20Den = 2              // > 1/2 of a part's in-window volume
                                // (Q20's 0.5 availability factor)
    val ShuffleEpoch = 1        // q120 epoch seed — epoch 0 is "no
                                // shuffle yet" by convention; 1 is the
                                // first trained epoch
    val ShuffleShards = 8       // q120 shard count (a training run's
                                // data-parallel reader count)
    val SampleSeqLen = 128      // q162 training-example length (tokens);
                                // ~2.4× the mean doc length so examples
                                // genuinely pack docs AND docs genuinely
                                // straddle example boundaries
    val BpeTrainMerges = 24     // q121 merge budget: enough rounds to
                                // exercise merge-of-merged-token pairs
                                // (rank>10 merges here have composite
                                // sides) while keeping the per-round
                                // collect loop a small fixed cost
    val MaxSimTokensPerDoc = 16 // q122 multi-vector doc granularity
                                // (contiguous-id groups, the q119
                                // convention): ≥3 docs at the sf0.001
                                // gate, 125 at sf0.01
    val MaxSimQueryDoc = 0L     // q122 query = doc 0's own token set
                                // (contains QueryVecId, the reference's
                                // sample query vector)
    val MaxSimTopN = 20         // q122 report depth (the reference's K)
    val MaxSimNProbe = 4        // q228 routed serve: cells probed per
                                // query token (the q12c probe budget)
    val MaxSimPanel = Seq(0L, 1L, 2L) // q122b query-doc panel (the
                                // RecallQueryIds convention: a bounded
                                // set present at every SF)
    val IncDeltaMod = 10        // q123 pseudo-delta: doc_id % 10 == 3
    val IncDeltaRem = 3         // is "today's batch" (~10% of corpus),
                                // the rest is the persisted-index corpus
    val CompressMinRatioMicro = 300000L // q125 gate: deflate/raw below
                                // 0.30 flags machine-repetitive text
    val MorDelMod = 7L          // q147 tombstone gate: doc_id % 7 == 3
    val MorDelRem = 3L          // (~14% of corpus) is the deleted slice;
                                // the even half of it re-appends in v3
                                // to exercise the delete's dir scoping
                                // (natural prose on this corpus sits
                                // ~0.45-0.75; the synthetic repeats
                                // dip below 0.30)
    val MovingDays = 7          // q132 trailing RANGE-frame window:
                                // "last 7 calendar days", gap-aware
    val BootstrapReps = 32      // q129 Poisson-bootstrap replicates:
                                // 32 replicate means per source in ONE
                                // aggregation pass; the interval is
                                // their integer min/max
    val BoilerMinDocs = 2       // q127 boilerplate gate: a span in >=2
                                // DISTINCT documents is cross-document
                                // boilerplate (RefinedWeb removes at
                                // small absolute thresholds too; the
                                // corpus-fraction variant is a Column
                                // swap)
    val NegCeiling = 0.995      // q126 near-duplicate ceiling: cosine
                                // at/above this under a DIFFERENT
                                // label is a labeling error or unmarked
                                // dup, not a trainable negative. The
                                // literal is 6-dp-exact so the rounded
                                // score comparison cannot straddle it
    val ThetaK = 4096           // q194 sketch size: exact below 4096
                                // distinct per segment (the sf0.01
                                // oracle regime); ~1.6% relative error
                                // saturated
    val BfsDepth = 4            // q196 BFS truncation — covers the
                                // thresholded supplier graph's
                                // diameter at every SF
    val BfsTopN = 20            // q196b harmonic-centrality report depth
    val ClsBuckets = 1024       // q197 hashed feature space (unigrams +
                                // bigrams share it, fastText-style)
    val ClsIters = 4            // q197 full-batch GD rounds (separation
                                // plateaus by 4 on this corpus —
                                // ClassifierSpec)
    val DpEpsilon = 1.0         // q200 privacy budget for the release
    val DpClamp = 8             // q200 per-user per-type contribution
                                // bound (above the corpus's p99
                                // user-type count, so utility loss is
                                // tail-only)
    val DpSeed = 2026L          // q200 release PRNG key
    val DpVocabulary =          // q200 FIXED PUBLIC release domain: the
      Seq("click", "error",     // product's event taxonomy (a public
        "purchase", "signup",   // constant, not observed data) — makes
        "view")                 // the released key set and T data-
                                // independent, as ε-DP requires
    val FdPairs = Seq(          // q201 candidate dependencies: a true
      ("doc_id", "lang"),       // key-FD, a real violation, and its
      ("lang", "source"),       // reverse
      ("source", "lang"))
    val CalBins = 10            // q206 reliability-diagram resolution
                                // (the standard 10-bin ECE)
  }
  import Params._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    Knn.topKDot(emb, Knn.queryVector(emb, QueryVecId), K)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> ((s, d) => Scan.scanProject(Tables.documents(s, d))),
    "q02_metadata" -> ((s, d) => Metadata.describe(s, d)),
    "q03_typed_project" -> ((s, d) => Scan.typedProject(s, Tables.embeddings(s, d))),
    "q04_embedding_cast" -> ((s, d) => Scan.embeddingCast(Tables.embeddings(s, d))),
    "q05_token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "q05b_bpe" -> ((s, d) => TextAnalysis.bpeCorpusTokens(Tables.documents(s, d))),
    "q06_token_cost" -> ((s, d) => TextAnalysis.tokenCost(Tables.documents(s, d))),
    "q07_sample_export" -> ((s, d) => Scan.sampleExport(Tables.documents(s, d), SampleN)),
    "q08_order_by" -> ((s, d) => Scan.globalIndex(Tables.embeddings(s, d))),
    "q09_ivf_build" -> ((s, d) => Ivf.build(Tables.embeddings(s, d), IvfStep)),
    "q10_index_roundtrip" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // FIXED path per sf dir: save()'s overwrite mode clobbers the
      // previous run's index, so repeated Verify/Bench runs reuse one
      // directory instead of leaking a new tmp dir per process. (The
      // driver runs Verify and Bench sequentially; the former per-pid
      // suffix traded unbounded tmp growth for a concurrency case that
      // doesn't occur.)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_" +
        Integer.toHexString(d.hashCode)
      // The roundtrip key is rows-only (no oracle pins the stride), so
      // it exercises the production √n centroid policy — at growing SF
      // the fixed oracle stride would write n/25 partition dirs and the
      // roundtrip becomes a file-commit benchmark, not an index one.
      Ivf.save(emb, Ivf.autoStep(emb), path)
      val (postings, _) = Ivf.load(s, path)
      postings.groupBy("centroid_id").agg(count(lit(1)).as("n_vectors")).orderBy("centroid_id")
    }),
    "q12_knn_exact_dot" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.topKDot(emb, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q12b_knn_exact_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.topKCosine(emb, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q12c_ivf_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ivf.searchInline(emb, IvfStep, Knn.queryVector(emb, QueryVecId), NProbe, K)
    }),
    "q13_dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "q219_cdc_dedup" -> ((s, d) =>
      Dedup.cdcDedupReport(Tables.documents(s, d), CdcAvgBits, CdcMinLen,
        CdcMaxLen)),
    "q14_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(Tables.documents(s, d), ShingleK, NumHashes, RowsPerBand, MinEstJaccard)),
    "q14b_simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    "q14c_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d), ShingleK)),
    "q157_containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), ShingleK, MinContainment)),
    "q156_cluster_sample" -> ((s, d) =>
      Sampling.clusterBalancedSample(Tables.embeddings(s, d), IvfStep, CellCap)),
    "q15_cosine_pairs" -> ((s, d) => Dedup.cosinePairs(Tables.embeddings(s, d), CosineThreshold)),
    "q15b_cosine_lsh" -> ((s, d) =>
      Dedup.cosineLsh(Tables.embeddings(s, d), NPlanes, NTables, CosineThreshold)),
    "q16_quality_score" -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "q16b_lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "q16c_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    "q17_events_rollup" -> ((s, d) => Events.rollup(Tables.events(s, d))),
    "q17b_sessionize" -> ((s, d) => Events.sessionize(Tables.events(s, d), SessionGapMin)),
    "q18_multimodal" -> ((s, d) => graft.multimodal.Multimodal.featurePipeline(s, Tables.documents(s, d))),
    "q144_audio_stats" -> ((s, d) =>
      // Rows-only (binary WAV plumbing, like q18): synthesize the media
      // table, then the REAL javax.sound.sampled decode reports
      // duration/rate/RMS/clipping per clip — all integer-unit columns.
      // audio-only synthesis: the report drops every non-WAV row, so
      // the modality filter pushes below the payload encode (r19)
      graft.multimodal.Multimodal.audioStats(s,
        graft.multimodal.Multimodal.toMediaTable(Tables.documents(s, d), "audio"))),
    "q175_image_phash" -> ((s, d) => {
      // Rows-only (raster decode, the q18 class). The synthetic corpus's
      // rasters are all distinct, so the key unions RENDITIONS of the
      // first ImgDupK images under shifted ids — exact byte copies
      // (hamming 0 by construction) and Graphics2D-resized re-encodes —
      // and the perceptual report must pull each rendition back to its
      // original. ImageHashSpec pins the exact pair sets. Image-only
      // synthesis: the hash pass drops every non-PNG row, so the
      // modality filter pushes below the payload encode (r19).
      val media = graft.multimodal.Multimodal.toMediaTable(Tables.documents(s, d), "image")
      val imgs = media.where(col("format") === "png")
        .orderBy("doc_id").limit(ImgDupK)
      val copies = imgs.withColumn("doc_id", col("doc_id") + lit(ImgCopyOffset))
      val resized = graft.multimodal.Multimodal.resize(s, imgs, 32, 24)
        .withColumn("doc_id", col("doc_id") + lit(2L * ImgCopyOffset))
      graft.multimodal.ImageHash.imageDedupReport(
        media.unionByName(copies).unionByName(resized), ImgHamming)
    }),
    "q176_supplier_triangles" -> ((s, d) =>
      Graph.supplierTriangles(Tables.lineitem(s, d), TriMinCooc, TriTopN)),
    "q181_image_dedup" -> ((s, d) => {
      // Rows-only (raster decode, the q175 class): q175's rendition
      // corpus — exact copies AND resizes of the same originals, so
      // clusters are transitive chains — resolved to keeper decisions.
      // Image-only synthesis (the q175 pushdown, r19).
      val media = graft.multimodal.Multimodal.toMediaTable(Tables.documents(s, d), "image")
      val imgs = media.where(col("format") === "png")
        .orderBy("doc_id").limit(ImgDupK)
      val copies = imgs.withColumn("doc_id", col("doc_id") + lit(ImgCopyOffset))
      val resized = graft.multimodal.Multimodal.resize(s, imgs, 32, 24)
        .withColumn("doc_id", col("doc_id") + lit(2L * ImgCopyOffset))
      graft.multimodal.ImageHash.imageDupClusters(
        media.unionByName(copies).unionByName(resized), ImgHamming)
    }),
    "q177_holt_forecast" -> ((s, d) => Events.holtForecast(
      Tables.events(s, d), HoltAlphaNum, HoltBetaNum, HoltDen, HoltHorizon)),
    "q178_covisitation" -> ((s, d) =>
      Events.covisitation(Tables.events(s, d), CovisitCap, CovisitTopK)),
    "q216_assoc_rules" -> ((s, d) =>
      Analytics.associationRules(Tables.lineitem(s, d), Tables.part(s, d),
        RuleMinSupPct, RuleTopN)),
    "q221_rfm_segments" -> ((s, d) =>
      Analytics.rfmSegments(Tables.orders(s, d))),
    "q222_token_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, d))),
    "q223_good_turing" -> ((s, d) =>
      LanguageModel.goodTuringReport(Tables.documents(s, d))),
    "q224_ngram_diversity" -> ((s, d) =>
      TextAnalysis.ngramDiversity(Tables.documents(s, d), DiversityMaxN)),
    "q225_hits_rank" -> ((s, d) =>
      Graph.supplierAuthorities(Tables.lineitem(s, d), Tables.orders(s, d),
        HitsIters, HitsTopN)),
    "q228_maxsim_ivf" -> ((s, d) =>
      Knn.maxSimIvf(Tables.embeddings(s, d), MaxSimTokensPerDoc,
        MaxSimQueryDoc, MaxSimTopN, IvfStep, MaxSimNProbe)),
    "q229_kcenter_coreset" -> ((s, d) =>
      Sampling.kCenterCoreset(Tables.embeddings(s, d), CoresetK)),
    "q230_source_influence" -> ((s, d) =>
      LanguageModel.sourceInfluence(Tables.documents(s, d), TrainPct)),
    "q231_strata_chisq" -> ((s, d) =>
      Profile.strataChiSq(Tables.documents(s, d), "lang", "source")),
    "q227_wait_blockers" -> ((s, d) =>
      Analytics.waitBlockers(Tables.lineitem(s, d), Tables.supplier(s, d),
        WaitTopN)),
    "q226_knn_seam_recall" -> ((s, d) => {
      // Rows-only (exact-truth audit over a sampled panel): the q218
      // candidate seam's measured recall dial — one row per generator
      // (multi-probe LSH stream vs IVF cell co-residents), exact
      // integer micro. The sample modulus scales with the corpus so
      // truth cost stays ~n × KnnSeamSources at any sf.
      val emb = Tables.embeddings(s, d)
      val mod = math.max(1L, emb.count() / KnnSeamSources)
      RecallAudit.knnGraphRecall(emb,
          Dedup.lshCandidatesMultiProbe(emb,
            Dedup.autoPlanes(emb, KnnGraphTarget), KnnGraphTables),
          mod, KnnGraphK, "lsh_multiprobe")
        .unionByName(RecallAudit.knnGraphRecall(emb,
          Ivf.cellCandidatePairs(emb, IvfStep), mod, KnnGraphK, "ivf_cells"))
        .orderBy("method")
    }),
    "q179_snippets" -> ((s, d) =>
      Search.snippets(Tables.documents(s, d), SnippetTerm, SnippetContext, K)),
    "q19_asof_join" -> ((s, d) => AsOf.purchaseAttribution(Tables.events(s, d))),
    "q20_pricing_summary" -> ((s, d) => Analytics.pricingSummary(Tables.lineitem(s, d))),
    "q21_revenue_by_nation" -> ((s, d) => Analytics.revenueByNation(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "q22_top_docs_per_group" -> ((s, d) => Analytics.topDocsPerGroup(Tables.documents(s, d), TopKPerGroup)),
    "q23_length_histogram" -> ((s, d) => Analytics.lengthHistogram(Tables.documents(s, d), HistWidth)),
    "q24_running_value" -> ((s, d) => Analytics.runningValue(Tables.events(s, d))),
    "q25_doc_rollup" -> ((s, d) => Analytics.docRollup(Tables.documents(s, d))),
    "q26_props_stats" -> ((s, d) => Events.propsStats(Tables.events(s, d))),
    "q27_supplier_region_revenue" -> ((s, d) => Analytics.supplierRegionRevenue(
      Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
    "q28_corpus_prep" -> ((s, d) => CorpusPipeline.prepare(
      Tables.documents(s, d), ShingleK, NumHashes, RowsPerBand, MinEstJaccard,
      MinTokens, MaxMeanTokenLen)),
    "q29_corpus_split" -> ((s, d) => CorpusPipeline.hashSplit(Tables.documents(s, d), TrainPct)),
    "q30_chunk" -> ((s, d) =>
      TextAnalysis.chunk(Tables.documents(s, d), ChunkSize, ChunkOverlap)),
    "q30b_chunk_tokens" -> ((s, d) =>
      TextAnalysis.chunkByTokens(Tables.documents(s, d), ChunkTokens, ChunkTokenOverlap)),
    "q31_contamination" -> ((s, d) =>
      CorpusPipeline.contamination(Tables.documents(s, d), TrainPct)),
    "q32_pack" -> ((s, d) => TextAnalysis.packChunks(
      TextAnalysis.chunkByTokens(Tables.documents(s, d), ChunkTokens, ChunkTokenOverlap),
      PackBudget, PackBuckets)),
    "q33_redact" -> ((s, d) => TextAnalysis.redactPii(Tables.documents(s, d))),
    "q34_bm25" -> ((s, d) => Search.bm25(Tables.documents(s, d), Bm25Terms, K, Bm25K1, Bm25B)),
    "q34b_hybrid_rrf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Search.hybridRrf(Tables.documents(s, d), emb,
        Knn.queryVector(emb, QueryVecId), Bm25Terms, K, RrfDepth, RrfK)
    }),
    "q35_repetition" -> ((s, d) => TextAnalysis.repetition(Tables.documents(s, d))),
    "q36_ngram_contam" -> ((s, d) =>
      CorpusPipeline.ngramContamination(Tables.documents(s, d), ContamK, TrainPct, ContamFlagFrac)),
    "q37_domain_mix" -> ((s, d) =>
      CorpusPipeline.domainMix(Tables.documents(s, d), CorpusPipeline.srcTargetPpm)),
    "q38_lm_score" -> ((s, d) => LanguageModel.lmScore(Tables.documents(s, d), TrainPct)),
    "q155_backoff_lm" -> ((s, d) =>
      LanguageModel.backoffScore(Tables.documents(s, d), TrainPct)),
    "q39_embedding_contam" -> ((s, d) => CorpusPipeline.embeddingContamination(
      Tables.embeddings(s, d), NPlanes, NTables, CosineThreshold, TrainPct)),
    "q40_tfidf_terms" -> ((s, d) => Search.tfidfTopTerms(Tables.documents(s, d), TfidfK)),
    "q41_vocab_stats" -> ((s, d) => Analytics.vocabStats(Tables.documents(s, d))),
    "q42_centroid_stats" -> ((s, d) => Analytics.centroidStats(Tables.embeddings(s, d))),
    "q43_dup_clusters" -> ((s, d) =>
      Clusters.dupClusters(Tables.documents(s, d), ShingleK, NumHashes, RowsPerBand, MinEstJaccard)),
    "q44_semdedup" -> ((s, d) => Clusters.semDedup(Tables.embeddings(s, d), IvfStep, SemDedupCos)),
    "q45_pq_encode" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Pq.encode(emb, Pq.codebooks(emb, IvfStep, PqM)).orderBy("vec_id")
    }),
    "q45b_pq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cbs = Pq.codebooks(emb, IvfStep, PqM)
      Pq.searchAdc(Pq.encode(emb, cbs), cbs, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q46_span_dedup" -> ((s, d) =>
      CorpusPipeline.spanDedup(Tables.documents(s, d), SpanTokens)),
    "q159_repeated_substrings" -> ((s, d) =>
      CorpusPipeline.repeatedSubstrings(Tables.documents(s, d), RepeatWindow)),
    "q163_lrs_report" -> ((s, d) =>
      // shortlist repeats >= RepeatWindow: the threshold engages the
      // walk's pair-dropping fast path (lcpAdjacent minFloor)
      graft.operators.SuffixArray.repeatReport(Tables.documents(s, d), LrsTopK, RepeatWindow)),
    "q164_exactsubstr_coverage" -> ((s, d) =>
      graft.operators.SuffixArray.exactSubstrCoverage(Tables.documents(s, d), RepeatWindow)),
    "q47_profile" -> ((s, d) => Profile.profile(Tables.documents(s, d), ProfileCols)),
    "q48_ivfpq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Pq.searchIvfAdc(emb, IvfStep, Pq.codebooks(emb, IvfStep, PqM),
        Knn.queryVector(emb, QueryVecId), NProbe, K)
    }),
    "q49_sq_encode" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (mn, mx) = Sq.ranges(emb, SqDim)
      // The codes array itself stays the API for Sq.search; the oracle
      // key projects it to a sortable scalar because the driver's pandas
      // compare lexsorts every output column and cannot sort/hash raw
      // array cells (r7 lesson — this was the round's only red cell).
      Sq.encode(emb, mn, mx)
        .select(col("vec_id"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes_str"))
        .orderBy("vec_id")
    }),
    "q49b_sq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Sq.searchInline(emb, SqDim, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q50_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), StratumN)),
    "q51_outliers" -> ((s, d) =>
      Clusters.outliers(Tables.embeddings(s, d), IvfStep, OutlierNum, OutlierDen)),
    "q52_funnel" -> ((s, d) => Events.funnel(Tables.events(s, d), FunnelSteps)),
    "q53_normalized_dedup" -> ((s, d) => Dedup.normalizedExact(Tables.documents(s, d))),
    "q54_dsir_weights" -> ((s, d) =>
      Sampling.dsirWeights(Tables.documents(s, d), DsirTargetSources, DsirBuckets)),
    "q55_index_merge" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val isDelta = pmod(col("vec_id"), lit(MergeMod.toLong)) === MergeRem
      Ivf.mergeAssign(emb.where(!isDelta), emb.where(isDelta), IvfStep)
    }),
    "q56_percentiles" -> ((s, d) =>
      Profile.percentiles(Tables.documents(s, d), "source", "n_chars", PercentileQs)),
    "q212_sketch_quantiles" -> ((s, d) => Profile.sketchQuantiles(
      Tables.documents(s, d), "source", "n_chars", "doc_id", QsSampleK, PercentileQs)),
    "q57_ivfpq_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Ivf.centroids(emb, IvfStep)
      val cbs = Pq.residualCodebooks(emb, cents, IvfStep, PqResOffset, PqM)
      Pq.searchResidualIvfAdc(emb, IvfStep, cbs, Knn.queryVector(emb, QueryVecId), NProbe, K)
    }),
    "q58_multiprobe_lsh" -> ((s, d) =>
      Dedup.cosineLshMultiProbeAuto(Tables.embeddings(s, d), MpTables, CosineThreshold,
        targetPerBucket = MpTarget)),
    "q59_quality_report" -> ((s, d) => TextAnalysis.qualityReport(
      Tables.documents(s, d), QrMinTokens, QrMinStopword, QrMaxMeanTokenLen)),
    "q160_attrition_funnel" -> ((s, d) => CorpusPipeline.attritionFunnel(
      Tables.documents(s, d), QrMinTokens, QrMinStopword, QrMaxMeanTokenLen)),
    "q162_sample_index" -> ((s, d) => CorpusPipeline.sampleIndex(
      Tables.documents(s, d), SampleSeqLen, ShuffleEpoch)),
    "q165_changepoint" -> ((s, d) => Events.changepoint(Tables.events(s, d))),
    "q166_zipf_report" -> ((s, d) => Analytics.zipfReport(Tables.documents(s, d), ZipfTopN)),
    "q168_exactsubstr_remove" -> ((s, d) =>
      graft.operators.SuffixArray.exactSubstrRemove(Tables.documents(s, d), RepeatWindow)),
    "q169_vocab_growth" -> ((s, d) =>
      CorpusPipeline.vocabGrowth(Tables.documents(s, d), HeapsCuts, ShuffleEpoch)),
    "q170_effective_dim" -> ((s, d) => Clusters.effectiveDim(Tables.embeddings(s, d))),
    "q173_corpus_card" -> ((s, d) => CorpusPipeline.corpusCard(Tables.documents(s, d))),
    "q174_proximity_search" -> ((s, d) => Search.proximitySearch(
      Tables.documents(s, d), ProxTerms._1, ProxTerms._2, ProxWindow, K)),
    "q172_seeding_quality" -> ((s, d) =>
      // rows-only: iterative sampling rounds are not SQL-expressible;
      // IvfSpec pins exact seeding behavior on the adversarial corpus
      Ivf.seedingQuality(Tables.embeddings(s, d), KppK)),
    "q171_phrase_search" -> ((s, d) => {
      // Positional-index lifecycle (the q131 convention): the headline
      // key persists the bucket-partitioned positional postings and
      // serves the phrase off them — bit-equal to the inline
      // Search.phraseSearch, so the oracle is the inline statement.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pos_index_" +
        Integer.toHexString(d.hashCode)
      Search.savePositionalIndex(Tables.documents(s, d), path)
      Search.phraseSearchIndex(s, path, PhraseQuery, K)
    }),
    "q161_fertility" -> ((s, d) => TextAnalysis.fertility(Tables.documents(s, d))),
    "q60_lsh_recall" -> ((s, d) =>
      Dedup.lshRecallReport(Tables.embeddings(s, d), NPlanes, NTables, CosineThreshold)),
    "q61_rpq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Pq.searchRotated(emb, IvfStep, PqM, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q61b_opq_search" -> ((s, d) => {
      // the assembled learned-OPQ path: SVD-trained rotation (driver-side
      // bounded sample) + rotated PQ flat ADC — rows-only (an SVD is not
      // SQL-expressible; recall and roundtrip are PqSpec-anchored, and
      // q62 audits the rotated family's recall in-engine)
      val emb = Tables.embeddings(s, d)
      val model = Pq.learnRotation(emb, OpqSampleStride, PqM, OpqIters, k = OpqK)
      Pq.searchRotatedWith(emb, model, Knn.queryVector(emb, QueryVecId), K)
    }),
    "q62_ann_recall" -> ((s, d) => RecallAudit.annRecallReport(
      Tables.embeddings(s, d), IvfStep, PqM, RecallQueryIds, NProbe, K)),
    "q63_cell_balance" -> ((s, d) => Ivf.cellBalance(Tables.embeddings(s, d), IvfStep)),
    "q64_bq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Bq.search(Bq.encode(emb, SqDim), Knn.queryVector(emb, QueryVecId), SqDim, K)
    }),
    "q64b_bq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Bq.searchRerank(emb, SqDim, Knn.queryVector(emb, QueryVecId), BqShortlist, K)
    }),
    "q65_filtered_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.topKDotFiltered(emb, col("label") === FilterLabel,
        Knn.queryVector(emb, QueryVecId), K)
    }),
    "q65b_filtered_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ivf.searchInlineFiltered(emb, IvfStep, col("label") === FilterLabel,
        Knn.queryVector(emb, QueryVecId), FilterNProbe, K)
    }),
    "q66_mrl_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.topKPrefixRerank(emb, Knn.queryVector(emb, QueryVecId),
        MrlDim, MrlShortlist, K)
    }),
    "q67_knn_batch" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.topKDotBatch(emb, Knn.queryPanel(emb, RecallQueryIds), K)
    }),
    "q68_delete_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dead = emb.where(pmod(col("vec_id"), lit(DeleteMod.toLong)) === DeleteRem)
        .select("vec_id")
      Ivf.searchInlineWithDeletes(emb, IvfStep, dead,
        Knn.queryVector(emb, QueryVecId), NProbe, K)
    }),
    "q69_rebalance" -> ((s, d) =>
      Ivf.splitOversized(Tables.embeddings(s, d), IvfStep, RebalanceMax)),
    "q70_retention" -> ((s, d) => Events.retention(Tables.events(s, d))),
    "q71_pps_sample" -> ((s, d) => Sampling.ppsSample(Tables.documents(s, d), PpsN)),
    "q153_weighted_reservoir" -> ((s, d) =>
      Sampling.weightedReservoir(Tables.documents(s, d), ReservoirK, ReservoirSeed)),
    "q72_collocations" -> ((s, d) =>
      Search.collocations(Tables.documents(s, d), CollocMin, K)),
    "q64c_bq_batch" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Bq.searchBatch(Bq.encode(emb, SqDim), Knn.queryPanel(emb, RecallQueryIds), SqDim, K)
    }),
    "q73_anomalies" -> ((s, d) => Events.anomalies(Tables.events(s, d), AnomZ)),
    "q182_seasonal_anomalies" -> ((s, d) =>
      Events.seasonalAnomalies(Tables.events(s, d), AnomZ)),
    "q183_active_users" -> ((s, d) => Events.activeUsers(Tables.events(s, d))),
    "q211_peak_concurrency" -> ((s, d) => Events.peakConcurrency(Tables.events(s, d))),
    "q186_audience_overlap" -> ((s, d) =>
      Events.audienceOverlap(Tables.events(s, d))),
    "q188_revenue_cube" -> ((s, d) => Analytics.revenueCube(Tables.lineitem(s, d))),
    "q190_more_like_this" -> ((s, d) =>
      Search.moreLikeThis(Tables.documents(s, d), MltDocId, K)),
    "q191_source_confusion" -> ((s, d) =>
      Search.sourceConfusion(Tables.documents(s, d))),
    "q192_fuzzy_lookup" -> ((s, d) =>
      Search.fuzzyTerms(Tables.documents(s, d), FuzzyQuery, K)),
    "q210_trigram_lookup" -> ((s, d) =>
      Search.trigramLookup(Tables.documents(s, d), TrgQuery, TrgMinSim, K)),
    "q189_gdpr_erase" -> ((s, d) => {
      // Rows-only lifecycle (q151 class): overwrite + append history,
      // then erase every 10th doc — the report is the compliance
      // record; SnapshotSpec proves the bytes (not just the view) are
      // gone and that pinned tags refuse erasure.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_erase_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val cut = docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
      Snapshots.overwrite(docs.where(col("doc_id") <= cut), path)
      Snapshots.append(docs.where(col("doc_id") > cut), path)
      Snapshots.erase(s, path,
        docs.where(pmod(col("doc_id"), lit(10L)) === 0).select("doc_id"), "doc_id")
    }),
    "q187_optimize_commit" -> ((s, d) => {
      // Rows-only lifecycle (the q151 class): an unclustered table's
      // range probe keeps every file; one OPTIMIZE commit re-clusters
      // on doc_id and the same probe plans O(matching) files, content
      // identical. Report = one row per step with the probe's planning
      // numbers.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_optimize_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      // an 8-file arrival-order layout: every file spans the id range
      Snapshots.overwrite(docs.repartition(8), path,
        statsCols = Seq("doc_id"))                                    // v1
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val (lo, hi) = (mx / 4, mx / 4 + mx / 10)
      def probe(step: String) = {
        val (kept, skipped) = Snapshots.pruneRange(s, path, "doc_id", lo, hi)
        val rows = Snapshots.readRange(s, path, "doc_id", lo, hi).count()
        (step, Snapshots.latest(s, path),
          Snapshots.opOf(s, path, Snapshots.latest(s, path)),
          kept.size.toLong, skipped.size.toLong, rows)
      }
      val before = probe("before")
      Snapshots.optimize(s, path, "doc_id", 8)                        // v2
      val after = probe("after")
      Seq(before, after)
        .toDF("step", "snapshot", "op", "files_kept", "files_skipped", "n_rows")
        .orderBy("snapshot")
    }),
    "q184_related_parts" -> ((s, d) =>
      Graph.relatedParts(Tables.lineitem(s, d), PprSeedPart, PprIters, PprTopN)),
    "q185_prefix_search" -> ((s, d) => {
      // Autocomplete lifecycle (the q171 convention): persist the
      // first-char-partitioned dictionary, serve the prefix off it —
      // bit-equal to the inline prefixTerms, so the oracle states the
      // inline statement.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_term_dict_" +
        Integer.toHexString(d.hashCode)
      Search.saveTermDict(Tables.documents(s, d), path)
      Search.prefixSearchIndex(s, path, PrefixQuery, K)
    }),
    "q74_range_join" -> ((s, d) =>
      AsOf.precededByCount(Tables.events(s, d), "error", "click", RangeWindowSec)),
    "q75_mmr" -> ((s, d) => {
      // rows-only: greedy MMR selection is sequential, not
      // SQL-expressible; KnnServeSpec anchors diversification behavior
      val emb = Tables.embeddings(s, d)
      Knn.topKDotMmr(emb, Knn.queryVector(emb, QueryVecId), BqShortlist, K, MmrLambda)
    }),
    "q76_shipping_priority" -> ((s, d) =>
      Analytics.shippingPriority(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Q3Segment, Q3Cutoff)),
    "q77_order_dist" -> ((s, d) =>
      Analytics.orderCountDistribution(Tables.customer(s, d), Tables.orders(s, d),
        Q13ExcludedPriority)),
    "q78_priority_count" -> ((s, d) =>
      Analytics.priorityOrderCount(Tables.orders(s, d), Tables.lineitem(s, d),
        Q4From, Q4Until)),
    "q79_transitions" -> ((s, d) => Events.transitions(Tables.events(s, d))),
    "q80_length_deciles" -> ((s, d) =>
      Profile.valueDeciles(Tables.documents(s, d), "lang", "n_chars", "doc_id",
        DecileBuckets)),
    "q81_serve_composed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dead = emb.where(pmod(col("vec_id"), lit(DeleteMod.toLong)) === DeleteRem)
        .select("vec_id")
      Pq.searchAdcFilteredRerank(emb, IvfStep, PqM, col("label") === FilterLabel,
        dead, Knn.queryVector(emb, QueryVecId), FilterNProbe, BqShortlist, K)
    }),
    "q82_pq_error" -> ((s, d) =>
      Pq.quantizationError(Tables.embeddings(s, d), IvfStep, PqM)),
    "q83_session_paths" -> ((s, d) =>
      Events.sessionPaths(Tables.events(s, d), SessionGapMin, PathSteps, K)),
    "q84_zorder_report" -> ((s, d) =>
      Layout.zorderReport(Tables.lineitem(s, d), "l_partkey", "l_suppkey",
        ZBits, ZLbBuckets)),
    "q85_heavy_hitters" -> ((s, d) =>
      Analytics.heavyHitters(Tables.documents(s, d), HeavyPhiInv)),
    "q86_token_drift" -> ((s, d) =>
      Profile.tokenDrift(Tables.documents(s, d), "source",
        DriftSliceA, DriftSliceB, DriftMinCount, DriftTopN)),
    "q87_forecast_revenue" -> ((s, d) =>
      Analytics.forecastRevenue(Tables.lineitem(s, d), Q6From, Q6Until,
        Q6DiscLo, Q6DiscHi, Q6MaxQty)),
    "q88_supply_rank" -> ((s, d) =>
      Graph.supplyRank(Tables.lineitem(s, d), PrIters, PrTopN)),
    "q89_winsorized" -> ((s, d) =>
      Profile.winsorizedStats(Tables.documents(s, d), "source", "n_chars",
        WinsorLoPm, WinsorHiPm)),
    "q90_mad_outliers" -> ((s, d) =>
      Profile.madOutliers(Tables.documents(s, d), "source", "n_chars", MadK)),
    "q91_click_attribution" -> ((s, d) =>
      AsOf.clickAttribution(Tables.events(s, d), AttribWindowSec)),
    "q92_upsert" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      val changed = base.where(pmod(col("doc_id"), lit(UpsertChangeMod)) === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
      val fresh = base.where(pmod(col("doc_id"), lit(UpsertInsertMod)) === 0)
        .withColumn("doc_id", col("doc_id") + UpsertIdShift)
      Merge.upsert(base, changed.unionByName(fresh), "doc_id")
        .orderBy("doc_id")
    }),
    "q93_pct_normalize" -> ((s, d) =>
      Profile.percentileNormalize(Tables.documents(s, d), "lang", "n_chars",
        "doc_id")),
    "q94_pca" -> ((s, d) =>
      Pca.fitProject(Tables.embeddings(s, d), PcaSampleStride, PcaComponents)),
    "q95_temperature_sample" -> ((s, d) =>
      Sampling.temperatureSample(Tables.documents(s, d), TempBudget)),
    "q96_fuzzy_pairs" -> ((s, d) =>
      Dedup.fuzzyPairs(Tables.documents(s, d), FuzzyPrefixLen, FuzzyMaxDist, FuzzyMaxBlock)),
    "q215_linkage_scores" -> ((s, d) =>
      Linkage.linkageScores(Tables.documents(s, d), FuzzyMaxBlock, LinkTopN,
        LinkMLang, LinkMSource, LinkMLen, LinkMW2)),
    "q97_conversion_latency" -> ((s, d) =>
      Events.conversionLatencyDeciles(Tables.events(s, d), ConvFrom, ConvTo,
        DecileBuckets)),
    "q98_promo_share" -> ((s, d) =>
      Analytics.promoRevenueShare(Tables.lineitem(s, d), Tables.part(s, d),
        Q14From, Q14Until)),
    "q99_returned_ranking" -> ((s, d) =>
      Analytics.returnedItemRanking(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d), Q10From, Q10Until, Q10TopN)),
    "q100_linear_fit" -> ((s, d) =>
      Profile.linearFit(
        Tables.documents(s, d).withColumn("n_tokens",
          size(TextAnalysis.tokens(col("text")))),
        "source", "n_chars", "n_tokens")),
    "q101_price_corr" -> ((s, d) =>
      Analytics.priceQuantityCorrelation(Tables.lineitem(s, d))),
    "q102_band_revenue" -> ((s, d) =>
      Analytics.bandRevenue(Tables.lineitem(s, d), Tables.part(s, d),
        Q19Bands)),
    "q103_dormant_rich" -> ((s, d) =>
      Analytics.dormantHighBalance(Tables.customer(s, d), Tables.orders(s, d),
        Q22From, Q22Until)),
    "q104_small_qty_revenue" -> ((s, d) =>
      Analytics.smallQuantityRevenue(Tables.lineitem(s, d), Tables.part(s, d),
        Q17Brand, Q17FracInv)),
    "q105_large_orders" -> ((s, d) =>
      Analytics.largeOrders(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Q18MinQty, Q18TopN)),
    "q106_top_supplier" -> ((s, d) =>
      Analytics.topSupplierRevenue(Tables.lineitem(s, d),
        Tables.supplier(s, d), Q15From, Q15Until)),
    "q107_revenue_concentration" -> ((s, d) =>
      Analytics.revenueConcentration(Tables.lineitem(s, d), Q11Num, Q11Den)),
    "q108_sole_supplier" -> ((s, d) =>
      Analytics.soleSupplierOrders(Tables.lineitem(s, d),
        Tables.supplier(s, d), Q21TopN)),
    "q109_cheapest_supplier" -> ((s, d) =>
      Analytics.cheapestSupplierPerPart(Tables.lineitem(s, d),
        Tables.part(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d), Q2Type, Q2Sizes, Q2Region, Q2TopN)),
    "q110_priority_shipping" -> ((s, d) =>
      Analytics.priorityShipping(Tables.lineitem(s, d), Tables.orders(s, d),
        Q12From, Q12Until, Q12Critical)),
    "q111_supplier_diversity" -> ((s, d) =>
      Analytics.supplierDiversity(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Q16ExclBrand, Q16Sizes)),
    "q112_dominant_suppliers" -> ((s, d) =>
      Analytics.dominantSuppliers(Tables.lineitem(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Q20From, Q20Until,
        Q20Num, Q20Den)),
    "q113_binational_volume" -> ((s, d) =>
      Analytics.biNationVolume(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Q7NationA, Q7NationB, Q7From, Q7Until)),
    "q154_q9_profit" -> ((s, d) =>
      Analytics.q9Profit(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.part(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Q9NameLike)),
    "q114_market_share" -> ((s, d) =>
      Analytics.marketShare(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.part(s, d),
        Tables.nation(s, d), Tables.region(s, d), Q8Type, Q8Region,
        Q8Nation, Q8From, Q8Until)),
    "q115_bloom_decontam" -> ((s, d) =>
      CorpusPipeline.bloomNgramContamination(Tables.documents(s, d), ContamK,
        TrainPct, ContamFlagFrac)),
    "q116_fvecs_roundtrip" -> ((s, d) => {
      // Fixed path per sf dir, same rationale as q10's index dir.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_fvecs_" +
        Integer.toHexString(d.hashCode)
      graft.sources.Fvecs.roundtripReport(Tables.embeddings(s, d), path)
    }),
    "q117_nsw_search" -> ((s, d) => {
      // Rows-only (approximate graph walk isn't SQL-expressible);
      // NswSpec pins determinism, the exact-mode differential, and
      // recall ≥ 0.8 at these defaults.
      val emb = Tables.embeddings(s, d)
      val graph = Nsw.build(emb, IvfStep, m = 8, efC = 32)
      Nsw.search(graph, Ivf.centroids(emb, IvfStep),
        Knn.queryVector(emb, QueryVecId), nprobe = 4, k = K, ef = 64)
    }),
    "q118_nsw_append" -> ((s, d) => {
      // Rows-only: incremental graph maintenance (q55's contract for
      // the NSW family) — build on the first 80% of ids, append the
      // rest against frozen centroids, serve. NswSpec pins
      // append == rebuild bit-for-bit for this higher-ids delta shape.
      val emb = Tables.embeddings(s, d)
      val cut = emb.agg(max("vec_id")).head().getLong(0) * 4 / 5
      val base = emb.where(col("vec_id") <= cut)
      val cents = Ivf.centroids(base, IvfStep)
      val g = Nsw.append(Nsw.build(base, IvfStep),
        cents, emb.where(col("vec_id") > cut))
      Nsw.search(g, cents, Knn.queryVector(emb, QueryVecId),
        nprobe = 4, k = K, ef = 64)
    }),
    "q145_nsw_recall" -> ((s, d) => {
      // Rows-only (beam walk): the graph family's recall audit — q62's
      // fourth serving path under its own key (q62's report is
      // oracle-hashed; an approximate walk can't join it). Same
      // (query, method, n_hits, recall) schema for union-able
      // dashboards. r15: a second leg audits the BOUNDARY-SPILLED
      // build (ε = the 25%-margin quantile) beside the plain one, so
      // the replication's recall payoff is a reported dial, not a
      // claim.
      val emb = Tables.embeddings(s, d)
      val cents = Ivf.centroids(emb, IvfStep)
      RecallAudit.nswRecallFor(emb, Nsw.build(emb, IvfStep), cents,
          RecallQueryIds, nprobe = 4, k = K)
        .unionByName(RecallAudit.nswRecallFor(emb,
          Nsw.buildSpilled(emb, cents, Nsw.spillEps(emb, cents)), cents,
          RecallQueryIds, nprobe = 4, k = K, method = "nsw_spill"))
        .orderBy("query_id", "method")
    }),
    "q152_serving_audit" -> ((s, d) =>
      // Rows-only (contains the beam-walk legs): ONE dashboard frame
      // joining every family's recall rows (q62 + q145, incl. the
      // spilled graph) with the rank metrics (q136 exact + q146 nsw)
      // on (query_id, method) — the union the per-family audits were
      // schema-aligned for; RecallAuditSpec pins each family's rows
      // equal to its standalone audit.
      RecallAudit.servingAudit(Tables.embeddings(s, d), IvfStep, PqM,
        RecallQueryIds, NProbe, K)),
    "q146_nsw_rank_metrics" -> ((s, d) => {
      // Rows-only: MRR/nDCG of the NSW serving plan through the same
      // micro-unit scorer as q136 — ordering quality of the
      // approximate path, directly comparable with the exact numbers.
      val emb = Tables.embeddings(s, d)
      val queries = Knn.labeledPanel(emb, RecallQueryIds)
      val res = Nsw.searchBatch(Nsw.build(emb, IvfStep, m = 8, efC = 32),
        Ivf.centroids(emb, IvfStep),
        Knn.queryPanel(emb, RecallQueryIds), nprobe = 4, k = K, ef = 64)
      RecallAudit.rankMetricsOf(emb, queries, res, K)
    }),
    "q119_embedding_drift" -> ((s, d) =>
      Clusters.embeddingDrift(Tables.embeddings(s, d), IvfStep)),
    "q120_corpus_shuffle" -> ((s, d) =>
      CorpusPipeline.corpusShuffle(Tables.documents(s, d), ShuffleEpoch, ShuffleShards)),
    "q121_bpe_train" -> ((s, d) =>
      BpeTrain.train(Tables.documents(s, d), BpeTrainMerges)),
    "q122_maxsim" -> ((s, d) =>
      Knn.maxSim(Tables.embeddings(s, d), MaxSimTokensPerDoc, MaxSimQueryDoc, MaxSimTopN)),
    "q122b_maxsim_batch" -> ((s, d) =>
      Knn.maxSimBatch(Tables.embeddings(s, d), MaxSimTokensPerDoc, MaxSimPanel, MaxSimTopN)),
    "q125_compress_signal" -> ((s, d) =>
      // Rows-only: DEFLATE bytes are encoder-version-dependent (see
      // functions/Deflate.scala); invariants are spec-pinned.
      TextAnalysis.compressionSignal(Tables.documents(s, d), CompressMinRatioMicro)),
    "q124_nsw_filtered" -> ((s, d) => {
      // Rows-only (approximate filtered walk); NswSpec pins the
      // exact-mode bit-equality to brute-force filtered KNN and the
      // selective-predicate traversal property.
      val emb = Tables.embeddings(s, d)
      val graph = Nsw.build(emb, IvfStep, m = 8, efC = 32)
      Nsw.searchFiltered(graph, Ivf.centroids(emb, IvfStep),
        Knn.queryVector(emb, QueryVecId),
        emb.where(col("label") === FilterLabel).select("vec_id"),
        nprobe = 4, k = K, ef = 64)
    }),
    "q139_hilbert_report" -> ((s, d) =>
      Layout.hilbertReport(Tables.lineitem(s, d), "l_partkey", "l_suppkey",
        ZBits, ZLbBuckets)),
    "q143_cdc_apply" -> ((s, d) => {
      // Follow a table by CONSUMING its change feed: build the q134
      // snapshot history, then reconstruct v3 as v2 + diff(v2, v3) —
      // the oracle states v3 directly (the q92 change rule), which the
      // feed application must reproduce bit-for-bit.
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_cdcapply_snap_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val isDelta = pmod(col("doc_id"), lit(IncDeltaMod.toLong)) === IncDeltaRem
      Snapshots.overwrite(docs.where(!isDelta), path)
      Snapshots.append(docs.where(isDelta), path)
      Snapshots.mergeCommit(path,
        docs.where(pmod(col("doc_id"), lit(UpsertChangeMod)) === 0)
          .withColumn("n_chars", col("n_chars") + 1000), "doc_id")
      val v2 = Snapshots.read(s, path, 2L)
      Snapshots.applyCdc(v2, Snapshots.diff(s, path, 2L, 3L))
        .orderBy("doc_id")
    }),
    "q142_checksum_drift" -> ((s, d) => {
      // Two "replicas" of documents: B silently drifted on a sparse
      // mod-rule. The diff must localize drift to the few buckets
      // holding a drifted key — each side folds to 32 checksum rows
      // before anything joins.
      val a = Tables.documents(s, d)
      val b = a.withColumn("n_chars",
        when(pmod(col("doc_id"), lit(ChecksumDriftMod)) === ChecksumDriftRem,
          col("n_chars") + 1000).otherwise(col("n_chars")))
      Profile.checksumDiff(a, b, "doc_id",
        Seq("doc_id", "text", "lang", "source", "n_chars"), ChecksumBuckets)
    }),
    "q141_scd2_history" -> ((s, d) => {
      // Deterministic 3-version change feed over documents: v1 = full
      // extract, v2 = every ScdChangeMod-th doc changed PLUS every
      // (ScdChangeMod+1)-th RESTATED unchanged (the collapse case a
      // real nightly extract exercises), v3 = every ScdDeepMod-th
      // changed again.
      val base = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val feed = base.withColumn("version", lit(1L))
        .unionByName(base.where(pmod(col("doc_id"), lit(ScdChangeMod)) === 0)
          .withColumn("n_chars", col("n_chars") + 1000)
          .withColumn("version", lit(2L)))
        .unionByName(base.where(pmod(col("doc_id"), lit(ScdChangeMod)) === 1)
          .withColumn("version", lit(2L)))
        .unionByName(base.where(pmod(col("doc_id"), lit(ScdDeepMod)) === 0)
          .withColumn("n_chars", col("n_chars") + 2000)
          .withColumn("version", lit(3L)))
      Merge.scd2(feed, "doc_id", "version", Seq("source", "n_chars"))
        .orderBy("doc_id", "valid_from")
    }),
    "q140_bitmap_distinct" -> ((s, d) =>
      // The answer must come FROM the hourly bitmap rollup (build →
      // OR-merge → popcount), never a direct distinct over raw rows —
      // the oracle states the raw-scan truth the rollup must equal.
      Events.distinctDaily(Events.userBitmapRollup(Tables.events(s, d)))),
    "q140b_hll_distinct" -> ((s, d) =>
      // Rows-only: Datasketches HLL estimates have no engine-portable
      // oracle; BitmapSpec pins exact mergeability + the error band.
      Events.approxDistinctDaily(Events.userSketchRollup(Tables.events(s, d)))),
    "q138_session_window" -> ((s, d) =>
      Events.sessionizeNative(Tables.events(s, d), SessionGapMin)),
    "q137_quality_constraints" -> ((s, d) =>
      Quality.corpusReport(Tables.documents(s, d), Tables.events(s, d),
        Tables.customer(s, d))),
    "q136_rank_metrics" -> ((s, d) =>
      RecallAudit.rankMetricsReport(Tables.embeddings(s, d), RecallQueryIds, K)),
    "q134_snapshot_diff" -> ((s, d) => {
      // CDC between v2 (full table) and v3 (CoW merge of the q92
      // change rule): every doc_id % UpsertChangeMod == 0 row must
      // surface as a delete(old)+insert(new) pair and nothing else.
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_cdc_snap_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val isDelta = pmod(col("doc_id"), lit(IncDeltaMod.toLong)) === IncDeltaRem
      Snapshots.overwrite(docs.where(!isDelta), path)
      Snapshots.append(docs.where(isDelta), path)
      Snapshots.mergeCommit(path,
        docs.where(pmod(col("doc_id"), lit(UpsertChangeMod)) === 0)
          .withColumn("n_chars", col("n_chars") + 1000), "doc_id")
      Snapshots.diff(s, path, 2L, 3L)
        .select("doc_id", "change", "source", "n_chars")
        .orderBy("doc_id", "change")
    }),
    "q133_mv_refresh" -> ((s, d) => {
      // Incremental MV over the snapshot layer: summarize v1 (base
      // load), refresh with v2's APPENDED delta only — the oracle
      // states the full-table summary, which the algebraic merge must
      // reproduce bit-for-bit without rescanning v1's data.
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_mv_snap_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val isDelta = pmod(col("doc_id"), lit(IncDeltaMod.toLong)) === IncDeltaRem
      Snapshots.overwrite(docs.where(!isDelta), path)
      Snapshots.append(docs.where(isDelta), path)
      Mv.report(Mv.refresh(
        Mv.summarize(Snapshots.read(s, path, 1L)),
        Snapshots.deltaOf(s, path, 2L)))
    }),
    "q132_moving_revenue" -> ((s, d) =>
      Events.movingDailyRevenue(Tables.events(s, d), MovingDays)),
    "q131_text_index_serve" -> ((s, d) => {
      // Persisted-inverted-index BM25: bit-equal to inline q34 by
      // construction, so the oracle is the SAME statement — the Spark
      // side must reproduce it from the saved bucket-partitioned
      // postings alone (the Ivf.save → search lifecycle, sparse twin).
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_index_" +
        Integer.toHexString(d.hashCode)
      Search.saveTextIndex(Tables.documents(s, d), path)
      Search.searchTextIndex(s, path, Bm25Terms, K, k1 = Bm25K1, b = Bm25B)
    }),
    "q130_time_travel" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      // Fresh snapshot chain per run (the q10 overwrite convention).
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_snap_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val isDelta = pmod(col("doc_id"), lit(IncDeltaMod.toLong)) === IncDeltaRem
      Snapshots.overwrite(docs.where(!isDelta), path)        // v1: initial load
      Snapshots.append(docs.where(isDelta), path)            // v2: daily increment
      Snapshots.mergeCommit(path,                            // v3: CoW corrections
        docs.where(pmod(col("doc_id"), lit(UpsertChangeMod)) === 0)
          .withColumn("n_chars", col("n_chars") + 1000), "doc_id")
      (1L to 3L).map { id =>
        Snapshots.read(s, path, id)
          .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_chars"))
          .select(lit(id).as("snapshot"), col("n_rows"), col("sum_chars"))
      }.reduce(_ unionByName _)
        .join(Snapshots.log(s, path), "snapshot")
        .select("snapshot", "op", "n_rows", "sum_chars")
        .orderBy("snapshot")
    }),
    "q129_bootstrap_ci" -> ((s, d) =>
      Profile.bootstrapMeans(Tables.documents(s, d), BootstrapReps)),
    "q148_canonical_pick" -> ((s, d) => Dedup.canonicalPick(Tables.documents(s, d))),
    "q151_index_sync" -> ((s, d) => {
      // Rows-only (index file I/O lifecycle, the q10 class): a
      // snapshot table of embeddings drives IVF maintenance through
      // its own commit history — initial rebuild, delta-sized append
      // advance, and a compact forcing the rebuild path. The report
      // rolls up each sync step's (mode, postings, centroids).
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_idxsync_" +
        Integer.toHexString(d.hashCode)
      val tPath = s"$base/table"; val iPath = s"$base/index"
      val p = new org.apache.hadoop.fs.Path(base)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val cut = emb.agg(max("vec_id")).head().getLong(0) * 4 / 5
      Snapshots.overwrite(emb.where(col("vec_id") <= cut), tPath)   // v1
      val r1 = IndexSync.syncReport(s, tPath, iPath, IvfStep)       // rebuild
      Snapshots.append(emb.where(col("vec_id") > cut), tPath)       // v2
      val r2 = IndexSync.syncReport(s, tPath, iPath, IvfStep)       // append
      val r2b = IndexSync.syncReport(s, tPath, iPath, IvfStep)      // noop
      Snapshots.compact(s, tPath)                                   // v3
      val r3 = IndexSync.syncReport(s, tPath, iPath, IvfStep)       // rebuild
      Seq(r1, r2, r2b, r3).reduce(_ unionByName _)
        .orderBy("synced_snapshot", "mode")
    }),
    "q180_text_index_sync" -> ((s, d) => {
      // Rows-only (index file I/O lifecycle, the q151 class, sparse-
      // retrieval family): a snapshot table of documents drives the
      // BM25/positional bucket index through its commit history —
      // initial rebuild, delta-sized postings append, idempotent noop,
      // and a delete commit forcing the rebuild path (tombstoned docs
      // must leave the postings). IndexSyncSpec pins served-BM25
      // equality against a fresh build at every step.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_txtsync_" +
        Integer.toHexString(d.hashCode)
      val tPath = s"$base/table"; val iPath = s"$base/index"
      val p = new org.apache.hadoop.fs.Path(base)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val cut = docs.agg(max("doc_id")).head().getLong(0) * 4 / 5
      Snapshots.overwrite(docs.where(col("doc_id") <= cut), tPath)     // v1
      val r1 = IndexSync.textSyncReport(s, tPath, iPath)               // rebuild
      Snapshots.append(docs.where(col("doc_id") > cut), tPath)         // v2
      val r2 = IndexSync.textSyncReport(s, tPath, iPath)               // append
      val r2b = IndexSync.textSyncReport(s, tPath, iPath)              // noop
      Snapshots.deleteWhere(s, tPath, pmod(col("doc_id"), lit(7L)) === 0,
        "doc_id")                                                      // v3
      val r3 = IndexSync.textSyncReport(s, tPath, iPath)               // rebuild
      Seq(r1, r2, r2b, r3).reduce(_ unionByName _)
        .orderBy("synced_snapshot", "mode")
    }),
    "q193_image_hash_sync" -> ((s, d) => {
      // Rows-only (index file I/O lifecycle, the q151/q180 class,
      // image-dedup family): a snapshot table of MEDIA rows drives the
      // persisted (doc_id, dhash) sidecar through its commit history —
      // initial rebuild (decodes all), delta-sized append (decodes the
      // DELTA only; IndexSyncSpec proves it by deleting the base dir's
      // bytes first), idempotent noop — then clusters served hash-only.
      // Image-only synthesis: every report column derives from the
      // png-only hash sidecar, so the non-image rows never influenced
      // the output — prune them below the encode (r19).
      val media = graft.multimodal.Multimodal.toMediaTable(Tables.documents(s, d), "image")
      val imgs = media.where(col("format") === "png")
        .orderBy("doc_id").limit(ImgDupK)
      val copies = imgs.withColumn("doc_id", col("doc_id") + lit(ImgCopyOffset))
      val all = media.unionByName(copies)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_imgsync_" +
        Integer.toHexString(d.hashCode)
      val tPath = s"$base/table"; val iPath = s"$base/index"
      val p = new org.apache.hadoop.fs.Path(base)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      Snapshots.overwrite(all.where(col("doc_id") < ImgCopyOffset), tPath)  // v1
      val r1 = IndexSync.imageHashSyncReport(s, tPath, iPath, ImgHamming)   // rebuild
      Snapshots.append(all.where(col("doc_id") >= ImgCopyOffset), tPath)    // v2
      val r2 = IndexSync.imageHashSyncReport(s, tPath, iPath, ImgHamming)   // append
      val r2b = IndexSync.imageHashSyncReport(s, tPath, iPath, ImgHamming)  // noop
      Seq(r1, r2, r2b).reduce(_ unionByName _)
        .orderBy("synced_snapshot", "mode")
    }),
    "q150_dedup_commit" -> ((s, d) => {
      // Dedup as a table commit: inject exact copies of every 5th doc
      // (id + 10M — ties break to the LOWER id, so originals always
      // keep), then one canonical-pick delete commit tombstones the
      // copies. The oracle states each snapshot's row count and the
      // final content sum from the base table alone.
      val docs = Tables.documents(s, d).select("doc_id", "text", "lang", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_dedup_commit_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      Snapshots.overwrite(docs, path)                                    // v1
      Snapshots.append(docs.where(pmod(col("doc_id"), lit(5L)) === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L), path)          // v2
      CorpusPipeline.dedupCommit(s, path)                                // v3
      (1L to 3L).map { id =>
        Snapshots.read(s, path, id)
          .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_chars"))
          .select(lit(id).as("snapshot"), col("n_rows"), col("sum_chars"))
      }.reduce(_ unionByName _)
        .join(Snapshots.log(s, path), "snapshot")
        .select("snapshot", "op", "n_rows", "sum_chars")
        .orderBy("snapshot")
    }),
    "q149_tar_shards" -> ((s, d) => {
      // Rows-only (binary sink plumbing, the q10 lifecycle class):
      // repack the corpus as webdataset-style USTAR shards, read back
      // through the binaryFile-explode source, report per-shard entry
      // counts and a content checksum — deterministic because shard
      // bytes are a pure function of the rows (mtime=0 headers) and
      // the repartitionByRange makes shard membership data-defined.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_tar_" +
        Integer.toHexString(d.hashCode)
      val dir = new java.io.File(path)
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
      val payload = Tables.documents(s, d)
        .select(concat(lit("doc-"), col("doc_id"), lit(".txt")).as("key"),
          col("text").cast("binary").as("payload"), col("doc_id"))
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .drop("doc_id")
      graft.sources.TarShards.write(payload, path, shardMaxBytes = 256 * 1024)
      graft.sources.TarShards.read(s, path)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_entries"),
          sum(length(col("payload"))).as("n_bytes"),
          graft.operators.Dedup.hash60(concat_ws(",",
            sort_array(collect_list(md5(col("payload")))))).as("content_sig"))
        .orderBy("shard")
    }),
    "q167_packed_export" -> ((s, d) => {
      // Rows-only (binary sink plumbing, the q158 class): the END of the
      // pipeline — epoch-shuffled corpus tokenized, packed to full
      // SampleSeqLen examples, written as safetensors input_ids shards,
      // read back through the binaryFile-explode source; per-shard
      // example counts + a content signature over (example_id, id-sum).
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pt_" +
        Integer.toHexString(d.hashCode)
      val dir = new java.io.File(path)
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
      val packed = CorpusPipeline.packedTokens(
        Tables.documents(s, d), SampleSeqLen, ShuffleEpoch, PackVocab)
        .repartitionByRange(4, col("example_id"))
        .sortWithinPartitions("example_id")
      graft.sources.Safetensors.writeTokens(packed, path, shardMaxRows = 64)
      graft.sources.Safetensors.readTokens(s, path)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_examples"),
          max(size(col("input_ids"))).as("seq_len"),
          graft.operators.Dedup.hash60(concat_ws(",",
            sort_array(collect_list(concat_ws(":", col("example_id"),
              aggregate(col("input_ids"), lit(0L), (a, x) => a + x)))))).as("content_sig"))
        .orderBy("shard")
    }),
    "q158_safetensors" -> ((s, d) => {
      // Rows-only (binary sink plumbing, the q149 class): dump the
      // embedding table as safetensors shards (the LLM-ecosystem tensor
      // interchange format), read back through the binaryFile-explode
      // source, report per-shard vector counts, the dimension, and a
      // content signature over (id, rounded L2) — deterministic because
      // shard bytes are a pure function of the rows (fixed-order
      // headers) and repartitionByRange makes membership data-defined.
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_st_" +
        Integer.toHexString(d.hashCode)
      val dir = new java.io.File(path)
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
      val emb = Tables.embeddings(s, d)
        .select("vec_id", "embedding")
        .repartitionByRange(4, col("vec_id"))
        .sortWithinPartitions("vec_id")
      graft.sources.Safetensors.write(emb, path, shardMaxRows = 100)
      graft.sources.Safetensors.read(s, path)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_vecs"),
          max(size(col("embedding"))).as("dim"),
          graft.operators.Dedup.hash60(concat_ws(",",
            sort_array(collect_list(concat_ws(":", col("vec_id"),
              round(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding")), 4)))))).as("content_sig"))
        .orderBy("shard")
    }),
    "q147_mor_delete" -> ((s, d) => {
      // Merge-on-read lifecycle: overwrite → equality-delete (tombstone
      // file, zero data rewrite) → append that RE-INSERTS half the
      // deleted keys (immune to the older tombstone — dir scoping) →
      // compact (folds tombstones into fresh data). The oracle states
      // each snapshot's logical content from the base table alone.
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_mor_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val isDel = pmod(col("doc_id"), lit(MorDelMod)) === MorDelRem
      Snapshots.overwrite(docs, path)                                   // v1
      Snapshots.deleteWhere(s, path, isDel, "doc_id")                   // v2
      Snapshots.append(docs.where(isDel && pmod(col("doc_id"), lit(2L)) === 0)
        .withColumn("n_chars", col("n_chars") + 5000L), path)           // v3
      Snapshots.compact(s, path)                                        // v4
      (1L to 4L).map { id =>
        Snapshots.read(s, path, id)
          .agg(count(lit(1)).as("n_rows"), sum("n_chars").as("sum_chars"))
          .select(lit(id).as("snapshot"), col("n_rows"), col("sum_chars"))
      }.reduce(_ unionByName _)
        .join(Snapshots.log(s, path), "snapshot")
        .select("snapshot", "op", "n_rows", "sum_chars")
        .orderBy("snapshot")
    }),
    "q128_attribution_log" -> ((s, d) =>
      // The BATCH face of the stream-stream interval join twin
      // (touchpoints is batch/stream identical — withWatermark is a
      // no-op on a static frame; StreamingSpec pins streamed == batch
      // and report == q91's as-of pick on attributed purchases).
      graft.streaming.AttributionStream.toReport(
        graft.streaming.AttributionStream.touchpoints(Tables.events(s, d), AttribWindowSec))),
    "q127_boilerplate" -> ((s, d) =>
      CorpusPipeline.boilerplateRemoval(Tables.documents(s, d), SpanTokens, BoilerMinDocs)),
    "q126_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.hardNegatives(emb, Knn.labeledPanel(emb, RecallQueryIds), K, NegCeiling)
    }),
    "q123_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isDelta = pmod(col("doc_id"), lit(IncDeltaMod.toLong)) === IncDeltaRem
      // Fixed path per sf dir (the q10 overwrite convention).
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_band_index_" +
        Integer.toHexString(d.hashCode)
      Dedup.saveBandIndex(docs.where(!isDelta), path, ShingleK, NumHashes, RowsPerBand)
      // The report normalizes pair orientation to (min, max) so the
      // oracle can state the batch-equivalent answer; the operator's
      // own (corpus, delta) orientation is what a pipeline acts on
      // (drop the NEW copy).
      Dedup.incrementalPairs(path, docs.where(isDelta), ShingleK, NumHashes,
          RowsPerBand, MinEstJaccard)
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"), col("est_jaccard"))
        .orderBy("a", "b")
    }),
    "q194_audience_sketch" -> ((s, d) =>
      Sketches.audienceAlgebra(Tables.orders(s, d), ThetaK)),
    "q213_cms_panel" -> ((s, d) =>
      Sketches.cmsTermPanel(Tables.documents(s, d), CmsDepth, CmsWidth,
        CmsPanelK)),
    "q220_join_estimate" -> ((s, d) =>
      Sketches.cmsJoinEstimate(
        Tables.lineitem(s, d).where(col("l_returnflag") === JoinEstFlag),
        Tables.orders(s, d).where(col("o_orderpriority") === JoinEstPrio),
        CmsDepth, CmsJoinW)),
    "q195_pareto_customers" -> ((s, d) =>
      Skyline.bestCustomers(Tables.orders(s, d))),
    "q196_graph_distances" -> ((s, d) =>
      Graph.supplierDistanceDistribution(Tables.lineitem(s, d), TriMinCooc,
        BfsDepth)),
    "q196b_harmonic_centrality" -> ((s, d) =>
      Graph.supplierHarmonicCentrality(Tables.lineitem(s, d), TriMinCooc,
        BfsDepth, BfsTopN)),
    "q217_conformal_gate" -> ((s, d) =>
      Classifier.conformalGateReport(Tables.documents(s, d),
        DsirTargetSources, ClsBuckets, ClsIters, ConformalAlphaMicro)),
    "q197_quality_classifier" -> ((s, d) =>
      Classifier.qualityReport(Tables.documents(s, d), DsirTargetSources,
        ClsBuckets, ClsIters)),
    "q198_markov_attribution" -> ((s, d) =>
      Attribution.removalEffects(Tables.events(s, d), "purchase")),
    "q199_branch_merge" -> ((s, d) => {
      // Rows-only lifecycle (the q187/q189 class): fork a branch, land
      // batches on BOTH sides, prove isolation, then a zero-copy merge.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_branch_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      Snapshots.overwrite(docs.where(pmod(col("doc_id"), lit(3L)) === 0), path)
      Branches.create(s, path, "dev")
      Branches.append(docs.where(pmod(col("doc_id"), lit(3L)) === 1), path, "dev")
      Snapshots.append(docs.where(pmod(col("doc_id"), lit(3L)) === 2), path)
      val branchView = Branches.read(s, path, "dev").count() // base + branch only
      val mainBefore = Snapshots.read(s, path).count()
      val mergeId = Branches.merge(s, path, "dev")
      val mainAfter = Snapshots.read(s, path).count()
      Seq(
        ("branch_view", branchView),
        ("main_before_merge", mainBefore),
        ("main_after_merge", mainAfter),
        ("merge_snapshot", mergeId),
        ("merge_is_metadata_only",
          if (Snapshots.opOf(s, path, mergeId) == "merge:dev") 1L else 0L))
        .toDF("step", "n")
    }),
    "q200_dp_release" -> ((s, d) =>
      Privacy.dpTypeCounts(Tables.events(s, d), DpVocabulary, DpEpsilon, DpClamp, DpSeed)),
    "q201_functional_deps" -> ((s, d) =>
      Profile.functionalDeps(Tables.documents(s, d), FdPairs)),
    "q202_cuped_readout" -> ((s, d) =>
      Experiments.cupedReadout(Tables.events(s, d))),
    "q203_leakage_safe_split" -> ((s, d) =>
      CorpusPipeline.leakageSafeSplit(Tables.documents(s, d), ShingleK,
        NumHashes, RowsPerBand, MinEstJaccard, TrainPct)),
    "q204_attribution_panel" -> ((s, d) =>
      Attribution.modelPanel(Tables.events(s, d), "purchase")),
    "q208_survival_km" -> ((s, d) =>
      Survival.kaplanMeier(Tables.events(s, d), "view", "purchase")),
    "q209_conversion_ztest" -> ((s, d) =>
      Experiments.conversionZTest(Tables.events(s, d), "purchase")),
    "q214_sequential_test" -> ((s, d) =>
      Experiments.sequentialReadout(Tables.events(s, d), "purchase",
        MsprtTau, MsprtAlpha)),
    "q206_calibration" -> ((s, d) =>
      Classifier.calibrationReport(Tables.documents(s, d), DsirTargetSources,
        ClsBuckets, ClsIters, CalBins)),
    "q207_core_census" -> ((s, d) =>
      Graph.supplierCoreCensus(Tables.lineitem(s, d), TriMinCooc)),
    "q218_communities" -> ((s, d) =>
      Clusters.embeddingCommunitiesLsh(Tables.embeddings(s, d), KnnGraphK,
        LpaRounds, LpaTopN, KnnGraphTables, KnnGraphTarget)),
    "q205_partial_compaction" -> ((s, d) => {
      // Rows-only lifecycle (the q187 class): one healthy dir + three
      // drip-appends; ONE compact_small folds only the drips — the big
      // dir is carried by reference, rows bit-identical, and a second
      // run is a provable no-op.
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_binpack_" +
        Integer.toHexString(d.hashCode)
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      Snapshots.overwrite(docs.where(pmod(col("doc_id"), lit(10L)) >= 3), path)
      Seq(0L, 1L, 2L).foreach(r =>
        Snapshots.append(docs.where(pmod(col("doc_id"), lit(10L)) === r), path))
      val before = Snapshots.read(s, path).count()
      // threshold: half the healthy dir's bytes — drips qualify, it doesn't
      val bigBytes = f.getContentSummary(
        new org.apache.hadoop.fs.Path(path, "data/s1")).getLength
      val (id1, n1) = Snapshots.compactSmall(s, path, bigBytes / 2)
      val after = Snapshots.read(s, path).count()
      val (id2, n2) = Snapshots.compactSmall(s, path, bigBytes / 2)
      Seq(
        ("rows_before", before), ("rows_after", after),
        ("dirs_folded", n1.toLong), ("snapshot", id1),
        ("noop_second_run", if (id2 == id1 && n2 == 0) 1L else 0L))
        .toDF("step", "n")
    })
  )

  /** DuckDB-equivalent SQL per query key; keys absent here (q02, q05b,
    * q10, q18, q61b, q75, q94, q117, q118, q144, q145, q146, q149,
    * q151, q152, q197, q198, q199, q200) are non-SQL-expressible
    * (footer metadata / trained-vocab BPE / index file I/O / binary
    * feature plumbing / SVD-learned rotation / sequential greedy MMR /
    * approximate graph walk / WAV decode / graph-serving audits / tar
    * sink lifecycle / index-sync lifecycle / the joined serving
    * dashboard's graph legs / iterative GD training / the Markov
    * absorption solve / branch lifecycle / the DP release, whose true
    * counts must NOT be stated anywhere) → driver records a rows-only
    * check. */
  def oracleSql: Map[String, String] = OracleSql.all
}
