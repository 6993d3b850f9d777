package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup.hash60
import graft.operators.TextAnalysis.tokens
import org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint

/** Distributed suffix array over the token stream — the INDEX half of
  * Lee et al. 2022's ExactSubstr dedup (q159 is the windowed DETECTION
  * half; this is the exact, any-length machinery the paper actually
  * builds), via prefix doubling (Manber-Myers 1990) re-expressed as
  * Spark joins:
  *
  *   - round k ranks every position by its 2^k-token prefix; the next
  *     round ranks by the PAIR (rank(i), rank(i + 2^k)) — one equi-join
  *     against a shifted copy of the rank table, then a distributed
  *     dense-rank. Rounds stop when all ranks are distinct, i.e. after
  *     ceil(log2(longest repeat)) + 1 rounds — bounded by the repeat
  *     structure, not the corpus length.
  *   - the distributed dense-rank NEVER does a global sort: rank values
  *     are near-uniform (md5 hashes in round 0, dense 0..n-1 after), so
  *     DETERMINISTIC uniform spans between the collected min/max (one
  *     2-value agg — the q08 globalIndex discipline, immune to
  *     exchange-reuse replanning) bucket the pairs; a pair (r1, r2)
  *     lives entirely in bucket f(r1), so within-bucket dense_rank plus
  *     a prefix-sum over the ≤32-row bucket-count table is globally
  *     dense and correct.
  *   - per-doc UNIQUE sentinels (a space-prefixed ":<doc_id>" token no real token can equal) terminate every
  *     document, so no repeat ever spans a document boundary and padded
  *     rank equality is true equality (two distinct positions can never
  *     compare equal through a sentinel).
  *
  * The suffix order is lexicographic over the md5-PERMUTED alphabet
  * (token order = order of hash60(token)): every repeat/LCP readout is
  * alphabet-order independent, and hashing makes round-0 ranking a
  * zero-shuffle map instead of a vocabulary sort. 60-bit token-hash
  * collisions (would merge two tokens) are ~vocab²/2^61 — negligible,
  * and confined to round 0.
  *
  * LCP between rank-adjacent suffixes comes from the classic level
  * walk: for h = H, H/2, …, 1, if the two suffixes' rank-h tables agree
  * at the current offset, advance lcp by h — each step is two equi-joins
  * of the pair frame against a level table. rep(p) = max of p's two
  * adjacent LCPs = the longest repeat starting at p (the standard SA
  * property), which powers both readouts:
  *
  *   - [[repeatReport]] (q163): top-K longest repeated substrings with
  *     both occurrence sites — the memorization-risk shortlist.
  *   - [[exactSubstrCoverage]] (q164): per-doc tokens covered by any
  *     repeat ≥ minLen. For minLen = L this provably equals
  *     [[CorpusPipeline.repeatedSubstrings]] at window L (if s[p..p+r)
  *     repeats with r ≥ L, every window at p..p+r-L is duplicated and
  *     covers exactly [p, p+r); conversely a duplicated window IS a
  *     repeat ≥ L), so q164 carries q159's full SQL oracle — the whole
  *     prefix-doubling + LCP pipeline is hash-checked against DuckDB.
  *
  * Scale shape: every round is (1 hash join on gpos) + (1 bucket
  * exchange with within-bucket sort) + (1 tiny offset window); the LCP
  * walk is 2 joins per level over the corpus-sized pair frame; rounds
  * and levels are O(log longest-repeat). localCheckpoint after each
  * round cuts the lineage (the BpeTrain discipline; on a real cluster
  * this is checkpoint-to-storage). Driver-side state: 2-value min/max
  * aggs and the ≤32-row bucket tables — nothing corpus-sized.
  */
object SuffixArray {

  private val NumBuckets = 32

  /** Deterministic uniform bucket spans for a long column: (min, span).
    * One 2-value agg; a pure function of the data (never sampled). */
  private def spanOf(df: DataFrame, c: String): Option[(Long, Long)] = {
    val s = df.agg(min(col(c)).as("mn"), max(col(c)).as("mx")).collect()(0)
    if (s.isNullAt(0)) None
    else Some((s.getLong(0), math.max((s.getLong(1) - s.getLong(0)) / NumBuckets + 1, 1L)))
  }

  /** Globally-positioned token stream: (doc_id, pos, gpos, token,
    * is_sentinel). Documents are laid out in doc_id order via the
    * two-pass bucket placement; each contributes its tokens plus one
    * unique sentinel. */
  def stream(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        (size(col("__toks")) + 1).cast("long").as("len"))
    val empty = base.select(col("doc_id"), lit(0L).as("pos"),
      lit(0L).as("gpos"), lit("").as("token"),
      lit(false).as("is_sentinel")).limit(0)
    spanOf(base, "doc_id") match {
      case None => empty
      case Some((mn, span)) =>
        val parted = base.withColumn("bkt", ((col("doc_id") - mn) / span).cast("long"))
        val local = parted.withColumn("cum",
          sum(col("len")).over(Window.partitionBy("bkt").orderBy("doc_id")))
        val offs = parted.groupBy("bkt").agg(sum(col("len")).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(
            Window.partitionBy(lit(0)).orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("bkt", "off")
        local.join(broadcast(offs), "bkt")
          .select(col("doc_id"), col("len"),
            (col("off") + col("cum") - col("len")).as("dstart"),
            posexplode(concat(col("__toks"),
              array(concat_ws(":", lit(" "), col("doc_id"))))).as(Seq("pos", "token")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            (col("dstart") + col("pos")).as("gpos"), col("token"),
            (col("pos") === col("len") - 1).as("is_sentinel"))
    }
  }

  /** Rank-round radix: each round ranks by the TUPLE (rank(i),
    * rank(i+h), …, rank(i+(R-1)h)) and multiplies h by R. Since
    * [[withLeads]] fetches all R-1 shifted ranks in ONE window pass
    * (per-round cost is ~constant in R — a lead() per shift, not a
    * shuffle join per shift), the radix is set by the ROUND count
    * alone: R=16 reaches a 256-token repeat ceiling in 2 rounds and a
    * 65k ceiling in 3 (R=4 needed 4 and 8), and rounds carry the
    * per-round exchange + checkpoint + driver-sync fixed cost. The LCP
    * walk stays one join pass per level (base-R greedy decomposition
    * unrolled over the R-1 rank-vector entries), so fewer levels =
    * fewer walk joins too. */
  private val Radix = 16

  /** rank(gpos + j·h) for j = 0..cnt-1 as columns `f(0)..f(cnt-1)`
    * (null past the stream end), WITHOUT cnt-1 shifted self-joins:
    * gpos is DENSE 0..n-1 (stream() lays it out that way and every
    * rank table keeps all positions), so a row's j·h-ahead neighbor is
    * exactly j·h ROWS ahead — `lead(rank, j·h)` over ghost-padded
    * blocks. Rows in the first `reach` positions of each block are
    * replicated into the previous block (one narrow map + union), so
    * every native row sees its full reach inside ONE window partition:
    * one shuffle-by-block replaces cnt-1 shuffle joins, and the r15
    * measurement reads build 4.4 s → ~2 s, walk 3.7 s → ~1.5 s at
    * sf0.1. Falls back to the join formulation when the reach
    * overflows lead()'s Int offset (h grows geometrically; a corpus
    * whose longest repeat needs h ≥ 2³¹ tokens walks joins again). */
  private def withLeads(lev: DataFrame, h: Long, cnt: Int, n: Long,
                        f: Int => String): DataFrame = {
    val reach = (cnt - 1) * h
    if (reach >= Int.MaxValue.toLong) {
      var out = lev.select(col("gpos"), col("rank").as(f(0)))
      for (j <- 1 until cnt)
        out = out.join(
          lev.select((col("gpos") - j * h).as("gpos"), col("rank").as(f(j))),
          Seq("gpos"), "left")
      out
    } else if (reach == 0L) {
      lev.select(col("gpos"), col("rank").as(f(0)))
    } else {
      val b = math.max(n / NumBuckets + 1, 2 * reach)
      val native = lev.withColumn("__blk", (col("gpos") / b).cast("long"))
      val ghosts = native
        .where(col("gpos") % b < reach && col("__blk") > 0)
        .withColumn("__blk", col("__blk") - 1)
      val w = Window.partitionBy("__blk").orderBy("gpos")
      val cols = col("gpos") +: (0 until cnt).map { j =>
        (if (j == 0) col("rank") else lead(col("rank"), (j * h).toInt).over(w)).as(f(j))
      }
      native.unionByName(ghosts)
        .select(col("__blk") +: cols: _*)
        .where((col("gpos") / b).cast("long") === col("__blk"))
        .drop("__blk")
    }
  }

  /** Prefix-multiplying rank levels over a [[stream]]: Seq of (h, table)
    * where table(gpos → rank) ranks positions by their h-token prefix
    * (padded; padded equality is true equality, see object doc). h runs
    * 1, R, R², … — the LAST level's ranks are all-distinct; its rank IS
    * the position in the suffix array over the permuted alphabet. */
  def buildLevels(st: DataFrame): Seq[(Long, DataFrame)] = {
    val n = st.count()
    // LAZY checkpoint: materialized by the first round's driver-sync
    // job below (or by the caller's first action when n <= 1), then
    // reused by every later reference — round 0 costs no job of its own
    var rank = leanCheckpoint(
      st.select(col("gpos"), hash60(col("token")).as("rank")), eager = false)
    var levels = List((1L, rank))
    var h = 1L
    var done = n <= 1
    // bucket span is ANALYTIC, no per-round stats job: round-0 ranks are
    // md5-uniform in [0, 2^60); every later round's are dense [0, nd)
    var span = (1L << 60) / NumBuckets + 1
    while (!done && h < n) {
      val paired = withLeads(rank, h, Radix, n, j => s"r${j + 1}")
        .na.fill(-1L, (2 to Radix).map(j => s"r$j"))
      // ONE job per round, total: the windowed frame is LAZILY
      // checkpointed, and the single driver-sync action the loop cannot
      // avoid (nDistinct, the termination test) is what materializes it.
      // Per-bucket offsets come from a prefix-sum window over the
      // ≤NumBuckets-row count frame (re-aggregated from the cached RDD —
      // bounded by bucket count, not data) broadcast back in; `next`
      // stays LAZY (a narrow map over the checkpointed frame) until the
      // next round's sync — or the caller's first action — pulls it.
      val loc = leanCheckpoint(paired
        .withColumn("bkt", (col("r1") / span).cast("long"))
        .withColumn("dr", dense_rank().over(
          Window.partitionBy("bkt")
            .orderBy((1 to Radix).map(j => col(s"r$j")): _*)).cast("long")),
        eager = false)
      val cnts = loc.groupBy("bkt").agg(max(col("dr")).as("c"))
      val offs = cnts.select(col("bkt"), coalesce(
        sum(col("c")).over(Window.partitionBy(lit(0)).orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
      val next = loc.join(broadcast(offs), "bkt")
        .select(col("gpos"), (col("off") + col("dr") - 1L).as("rank"))
      h *= Radix
      rank = next
      levels = (h, next) :: levels
      val nDistinct = cnts.agg(sum(col("c"))).collect()(0).getLong(0)
      done = nDistinct == n
      span = nDistinct / NumBuckets + 1
    }
    levels.reverse
  }

  /** LCP between rank-adjacent suffix pairs: (gpos_a, gpos_b, lcp),
    * one row per adjacent pair in suffix-array order, via the
    * high-to-low level walk.
    *
    * `minFloor > 0` is the threshold fast path: pairs that cannot reach
    * lcp ≥ floorPow2(minFloor) are DROPPED before the cascade by one
    * equality test against the largest level ≤ minFloor at offset 0 —
    * an exact necessary condition (lcp ≥ h ⟺ the h-prefixes are equal),
    * so survivors' lcp values are still exact and nothing ≥ minFloor is
    * lost. With thresholded readouts (coverage at minLen, a
    * long-repeat shortlist) this shrinks the walk frame to the repeat
    * mass (~8% of positions on the test corpus) instead of every
    * adjacent pair. */
  def lcpAdjacent(levels: Seq[(Long, DataFrame)], minFloor: Long = 0L): DataFrame = {
    val sa = levels.last._2
    var cur = sa.select((col("rank") + 1).as("rank"), col("gpos").as("gpos_a"))
      .join(sa.select(col("rank"), col("gpos").as("gpos_b")), "rank")
      .select(col("gpos_a"), col("gpos_b"), lit(0L).as("lcp"))
    if (minFloor > 0) {
      val floors = levels.map(_._1).filter(_ <= minFloor)
      if (floors.nonEmpty) {
        val h0 = floors.max
        val lev0 = levels.find(_._1 == h0).get._2
        cur = cur
          .join(lev0.select(col("gpos").as("gpos_a"), col("rank").as("__ra")), "gpos_a")
          .join(lev0.select(col("gpos").as("gpos_b"), col("rank").as("__rb")), "gpos_b")
          .where(col("__ra") === col("__rb"))
          .select(col("gpos_a"), col("gpos_b"), lit(h0).as("lcp"))
      }
    }
    // the top level's ranks are all-distinct (that's the termination
    // condition), so it can never certify a match between two DIFFERENT
    // positions — start the walk at H/R. Each level certifies up to
    // Radix-1 h-steps (base-R greedy decomposition): the reachable tail
    // is (R-1)·(H/R + H/R² + … + 1) = H - 1, every possible LCP. The
    // R-1 uses happen in ONE join pass per side: a rank-VECTOR table
    // (ranks at offsets 0, h, …, (R-2)h via withLeads) is fetched at
    // gpos+lcp once, and the greedy's sequential compares become a
    // leading-equal-prefix count unrolled below — 2 joins per LEVEL
    // instead of 2 joins per level-use (6 vs 24 at 4 levels).
    val walkLevels = (if (levels.size > 1) levels.dropRight(1) else levels).reverse
    val n = levels.head._2.count() // cheap: the h=1 table is eager-checkpointed
    for ((h, lev) <- walkLevels) {
      // lazy checkpoint: materialized once on first use, shared by the
      // a- and b-side joins, and stats reset to a leaf (see below)
      val vec = leanCheckpoint(
        withLeads(lev, h, Radix - 1, n, j => s"v$j"), eager = false)
      val names = 0 until (Radix - 1)
      val va = vec.select(col("gpos").as("__ka") +:
        names.map(j => col(s"v$j").as(s"__a$j")): _*)
      val vb = vec.select(col("gpos").as("__kb") +:
        names.map(j => col(s"v$j").as(s"__b$j")): _*)
      def eq(j: Int) =
        col(s"__a$j").isNotNull && col(s"__b$j").isNotNull &&
          col(s"__a$j") === col(s"__b$j")
      // leading-equal count × h: entry j equal means the h-block at
      // offset lcp + j·h matches — the greedy stops at the first
      // mismatch, exactly the sequential walk's add sequence. A missed
      // join (gpos+lcp past the stream end) leaves nulls → eq(0) false
      // → add 0, the old left-join isNotNull contract.
      val add = names.foldRight(lit((Radix - 1).toLong * h)) { (j, rest) =>
        when(!eq(j), lit(j.toLong * h)).otherwise(rest)
      }
      cur = cur
        .withColumn("__ka", col("gpos_a") + col("lcp"))
        .withColumn("__kb", col("gpos_b") + col("lcp"))
        .join(va, Seq("__ka"), "left")
        .join(vb, Seq("__kb"), "left")
        .withColumn("lcp", col("lcp") + add)
        .select("gpos_a", "gpos_b", "lcp")
      // LAZY plan truncation at EVERY level. Not an optimization knob —
      // a correctness-of-cost one: Catalyst's SizeInBytesOnlyStats
      // visitJoin MULTIPLIES child sizes, so k chained joins estimate
      // size^3^k — a BigInt whose DIGIT COUNT grows exponentially, and
      // the driver burns minutes in BigInteger.multiply at planning
      // time (observed: 27+ min planning on the dup-heavy stress
      // corpus when levels were trimmed every 3rd step). A lazy
      // localCheckpoint rebases the logical plan on the level's RDD
      // immediately (stats reset to a leaf) while materialization
      // pipelines into the next action — no extra per-level job.
      cur = leanCheckpoint(cur, eager = false)
    }
    cur
  }

  /** q163: top-K longest repeated substrings — (doc_a, off_a, doc_b,
    * off_b, lcp), lcp desc. Each row is a rank-adjacent suffix pair;
    * a substring occurring m times surfaces as m-1 adjacent rows. */
  /** The shared SA index every serve leg reads: materialized sentinel
    * stream + rank-adjacent LCP at floor `minFloor` — built ONCE per
    * (corpus, threshold) and reused by [[repeatReportFrom]] /
    * [[exactSubstrCoverageFrom]] / [[exactSubstrRemoveFrom]]. The
    * prefix-doubling build is the most expensive machinery in the
    * tree (O(log longest-repeat) full-corpus join levels); paying it
    * once and fanning three reports off the pinned pair is the same
    * build/serve split as [[Search.saveTextIndex]] — a pipeline that
    * wants detection AND coverage AND removal shares one build. */
  def build(docs: DataFrame, minFloor: Long = 0L): (DataFrame, DataFrame) = {
    val st = leanCheckpoint(stream(docs))
    val lcp = leanCheckpoint(lcpAdjacent(buildLevels(st), minFloor))
    (st, lcp)
  }

  def repeatReport(docs: DataFrame, topK: Int = 20, minLen: Int = 1): DataFrame = {
    val (st, lcp) = build(docs, if (minLen > 1) minLen.toLong else 0L)
    repeatReportFrom(st, lcp, topK, minLen)
  }

  /** q163 serve leg off a prebuilt [[build]] pair. */
  def repeatReportFrom(st: DataFrame, lcp: DataFrame,
                       topK: Int = 20, minLen: Int = 1): DataFrame = {
    val pos = st.select(col("gpos"), col("doc_id"), col("pos"))
    lcp.where(col("lcp") >= math.max(minLen, 1))
      .join(pos.select(col("gpos").as("gpos_a"), col("doc_id").as("doc_a"),
        col("pos").as("off_a")), "gpos_a")
      .join(pos.select(col("gpos").as("gpos_b"), col("doc_id").as("doc_b"),
        col("pos").as("off_b")), "gpos_b")
      .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"), col("lcp"))
      .orderBy(col("lcp").desc, col("doc_a"), col("off_a"))
      .limit(topK)
  }

  /** q164: exact per-doc repeat coverage at threshold minLen — the SA
    * twin of [[CorpusPipeline.repeatedSubstrings]], same schema, and
    * provably the SAME ANSWER for minLen = windowTokens (object doc),
    * which is what lets it share q159's SQL oracle. rep(p) = max of
    * p's adjacent LCPs; islands merge [p, p + rep(p)) extents with the
    * q159 running-max discipline. */
  /** q168: ExactSubstr REMOVAL — the paper's actual mutation (Lee et
    * al. 2022 §4: "remove all but one occurrence"), completing the
    * family: q159 detects, q163 indexes, q164 measures, this one CUTS.
    * Rule (exact, documented): a position p is cut iff some occurrence
    * with LOWER stream position shares a ≥ minLen prefix with it; the
    * cut extends over p's maximal repeat extent. "Earlier survives":
    * duplicate-sharing suffixes form RUNS of adjacent ranks (pairwise
    * adjacent LCP ≥ minLen, transitive via the min rule), resolved into
    * groups by the SAME pointer-jumped connected components the LSH
    * dedup uses ([[Clusters.connectedComponents]] over the thresholded
    * adjacency pairs — node ids are gpos, so the cluster label IS the
    * earliest occurrence). Emits per doc: token counts kept/cut and a
    * fingerprint of the kept token sequence (the cleaned doc's
    * identity, oracle-able downstream).
    *
    * Scale shape: everything up to the groups is q164's machinery; CC
    * adds ~log(run length) label rounds over pair-mass-sized frames;
    * the cut explode is Σ extents (the duplicate mass, not the
    * corpus); the final rollup is one doc_id exchange with per-doc
    * bounded collect_list. Re-running on the cleaned text cuts nothing
    * new when cuts don't stitch new adjacencies together (spec-pinned
    * on the crafted corpus; the paper's procedure shares the caveat). */
  def exactSubstrRemove(docs: DataFrame, minLen: Int): DataFrame = {
    val (st, lcpAll) = build(docs, minLen.toLong)
    exactSubstrRemoveFrom(st, lcpAll, minLen)
  }

  /** q168 serve leg off a prebuilt [[build]] pair. */
  def exactSubstrRemoveFrom(st: DataFrame, lcpAll: DataFrame,
                            minLen: Int): DataFrame = {
    // feeds rep, the CC edges, and the join below — the parent pair is
    // already pinned by build(), so the filter re-evaluates cheaply
    val lcp = lcpAll.where(col("lcp") >= minLen)
    val rep = lcp
      .select(explode(array(
        struct(col("gpos_a").as("gpos"), col("lcp")),
        struct(col("gpos_b").as("gpos"), col("lcp")))).as("m"))
      .select(col("m.gpos").as("gpos"), col("m.lcp").as("lcp"))
      .groupBy("gpos").agg(max(col("lcp")).as("rep"))
    val groups = Clusters.connectedComponents(
      lcp.select(col("gpos_a").as("a"), col("gpos_b").as("b")))
    val marks = groups.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("gpos"))
      .join(rep, "gpos")
      .join(st.select(col("gpos"), col("doc_id"), col("pos")), "gpos")
      .select(col("doc_id"), col("pos"), col("rep"))
    // Merge cut extents into ISLANDS FIRST (the q164 running-max sweep),
    // then derive the cut set by an interval join of positions against
    // the per-doc island list — NEVER by exploding [pos, pos+rep)
    // positions: on a dup-heavy corpus Σ extents is duplicate-mass ×
    // extent (a doc of N equal tokens would explode N² rows) while
    // islands are disjoint, so the join emits each position at most
    // once and its cost is tokens × islands-per-doc.
    val byPosM = Window.partitionBy("doc_id").orderBy("pos")
    val cutIslands = marks
      .withColumn("prev_end", max(col("pos") + col("rep") - 1)
        .over(byPosM.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byPosM))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), max(col("pos") + col("rep") - 1).as("e"))
    val cuts = st.select(col("doc_id"), col("pos"))
      .join(cutIslands, Seq("doc_id"))
      .where(col("pos") >= col("s") && col("pos") <= col("e"))
      .select(col("doc_id"), col("pos"))
    st.where(!col("is_sentinel"))
      .join(cuts.withColumn("__cut", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cut").isNotNull, 1L).otherwise(0L)).as("n_cut"),
        hash60(concat_ws(" ", transform(
          array_sort(collect_list(when(col("__cut").isNull,
            struct(col("pos"), col("token"))))),
          c => c.getField("token")))).as("kept_fp"))
      .select(col("doc_id"), col("n_tokens"), col("n_cut"),
        (col("n_tokens") - col("n_cut")).as("n_kept"), col("kept_fp"))
      .orderBy("doc_id")
  }

  def exactSubstrCoverage(docs: DataFrame, minLen: Int): DataFrame = {
    val (st, lcp) = build(docs, minLen.toLong)
    exactSubstrCoverageFrom(docs, st, lcp, minLen)
  }

  /** q164 serve leg off a prebuilt [[build]] pair (`docs` supplies the
    * per-doc token totals the coverage ratio divides by). */
  def exactSubstrCoverageFrom(docs: DataFrame, st: DataFrame,
                              lcp: DataFrame, minLen: Int): DataFrame = {
    val rep = lcp.where(col("lcp") >= minLen)
      .select(explode(array(
        struct(col("gpos_a").as("gpos"), col("lcp")),
        struct(col("gpos_b").as("gpos"), col("lcp")))).as("m"))
      .select(col("m.gpos").as("gpos"), col("m.lcp").as("lcp"))
      .groupBy("gpos").agg(max(col("lcp")).as("rep"))
    val hits = rep.join(st.select(col("gpos"), col("doc_id"), col("pos")), "gpos")
      .select(col("doc_id"), col("pos"), col("rep"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val isl = hits
      .withColumn("prev_end", max(col("pos") + col("rep") - 1)
        .over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byPos))
    // an island's end is the max EXTENT inside it, not the last start
    val perIsland = isl.groupBy("doc_id", "island")
      .agg(min(col("pos")).as("s"), max(col("pos") + col("rep") - 1).as("e"),
        count(lit(1)).as("nw"))
    val perDoc = perIsland.groupBy("doc_id")
      .agg(sum(col("e") - col("s") + 1).as("covered"),
        sum(col("nw")).as("n_dup_windows"), count(lit(1)).as("n_islands"))
    docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        round(coalesce(col("covered"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }
}
