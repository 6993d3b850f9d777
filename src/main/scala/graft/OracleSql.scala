package graft

/** DuckDB oracle SQL for every SQL-expressible query key in
  * [[SparkEntry.queries]]. Each statement is generated from
  * [[SparkEntry.Params]] — the same constants the Spark plans use — and
  * mirrors the Spark expression tree step for step (double widening,
  * empty-token filtering, rounding before ranking; SURVEY.md §6).
  */
object OracleSql {
  import SparkEntry.Params._

  private val P = 1000000007L

  /** Whitespace tokens with empties filtered (matches TextAnalysis.tokens). */
  private def toks(text: String = "text") =
    s"list_filter(string_split_regex($text, '\\s+'), x -> x <> '')"

  /** 60-bit md5 token hash (matches Dedup.hash60). */
  private def hash60(s: String) = s"('0x' || substr(md5($s), 1, 15))::BIGINT"

  private def dotd(a: String, b: String) =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  private def l2sq(a: String, b: String) =
    s"list_sum(list_transform(list_zip(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), x -> (x[1]-x[2])*(x[1]-x[2])))"

  private def cosine(a: String, b: String) =
    s"${dotd(a, b)} / (sqrt(${dotd(a, a)}) * sqrt(${dotd(b, b)}))"

  /** Distinct word k-shingles (matches Dedup.shingles). */
  private def shingles(text: String = "text", k: Int = ShingleK) =
    s"""list_distinct(list_transform(range(1, len(${toks(text)}) - $k + 2),
       |  i -> array_to_string(list_slice(${toks(text)}, i, i + $k - 1), ' ')))""".stripMargin

  /** MinHash signature literal [sig_0, …] (matches Dedup.minhashSignatures). */
  private def minhashSig(sh: String): String =
    (0 until NumHashes).map { j =>
      val a = 1L + 2L * j
      val b = 7919L * (j + 1) % P
      s"list_min(list_transform($sh, s -> (((${hash60("s")} % $P) * $a + $b) % $P)))"
    }.mkString("[", ", ", "]")

  /** Recursive-CTE BFS (depth ≤ BfsDepth) over the thresholded
    * supplier co-occurrence graph — the naive V×V pair-frame statement
    * q196/q196b mirror (the Spark side never materializes the pair
    * frame: Graph.neighborhoodLevels). `md` = min distance per ordered
    * (src ≠ dst) pair. */
  private val bfsCtes =
    s"""WITH RECURSIVE li AS (
       |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
       |co AS (
       |  SELECT a.l_suppkey AS s, b.l_suppkey AS t
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2 HAVING count(*) >= $TriMinCooc),
       |e AS (SELECT s, t FROM co UNION ALL SELECT t AS s, s AS t FROM co),
       |bfs(src, dst, d) AS (
       |  SELECT s, t, 1 FROM e
       |  UNION
       |  SELECT b.src, e.t, b.d + 1 FROM bfs b JOIN e ON b.dst = e.s
       |  WHERE b.d < $BfsDepth),
       |md AS (
       |  SELECT src, dst, min(d) AS d FROM bfs WHERE src <> dst GROUP BY 1, 2)"""
      .stripMargin

  /** MinHash-LSH candidate CTE block (sigs → banded → cand) + the
    * est-Jaccard expression — shared by q14 and the q43 cluster
    * resolution so the pair derivation cannot drift between them. */
  private val minhashEst =
    s"round(CAST(list_sum(list_transform(list_zip(sig_a, sig_b), x -> CAST(x[1] = x[2] AS INT))) AS DOUBLE) / $NumHashes.0, 6)"
  private val minhashCtes: String = {
    val numBands = NumHashes / RowsPerBand
    val bandIds = (0 until numBands).mkString("[", ", ", "]")
    s"""sigs AS (
       |  SELECT doc_id, ${minhashSig("sh")} AS sig
       |  FROM (SELECT doc_id, ${shingles()} AS sh FROM documents)
       |  WHERE len(sh) > 0),
       |banded AS (
       |  SELECT doc_id, sig, t.band_id,
       |    array_to_string(list_slice(sig, t.band_id * $RowsPerBand + 1, t.band_id * $RowsPerBand + $RowsPerBand), '_') AS band_key
       |  FROM sigs CROSS JOIN (SELECT unnest($bandIds) AS band_id) t),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS sig_a, r.sig AS sig_b
       |  FROM banded l JOIN banded r
       |    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id)""".stripMargin
  }

  /** Unrolled connected-components CTE chain — the DuckDB mirror of
    * [[graft.operators.Clusters.connectedComponents]]'s hook+jump
    * rounds (neighbor-min then label-of-label pointer jump), stated as
    * 2·R MATERIALIZED per-node CTEs instead of a `WITH RECURSIVE`
    * transitive closure. The closure's working set is Σ(component
    * size²) — 163 s (q43) + 114 s (q203) of the r18 DuckDB sweep, 44%
    * of its total — where this chain is per-node-linear per round (the
    * q218 unroll convention). Each jump composes the label map with
    * itself, so R rounds cover min-label tree depths ~2^R; dup-cluster
    * graphs from LSH pairs are near-cliques that settle in 2-3 rounds,
    * and the Spark side's exact-convergence check (ClusterSpec) pins
    * the semantics both states share. Requires a CTE `lshpairs(a, b)`
    * in scope; yields `labeled(doc_id, cluster_id)`. */
  private def ccCtes(rounds: Int = 16): String = {
    val rs = (1 to rounds).map { r =>
      val prev = if (r == 1) "cc0" else s"ccj${r - 1}"
      s"""cch$r AS MATERIALIZED (
         |  SELECT l.v, least(l.l, coalesce(min(ln.l), l.l)) AS l
         |  FROM $prev l
         |  LEFT JOIN ccedges e ON e.src = l.v
         |  LEFT JOIN $prev ln ON ln.v = e.dst
         |  GROUP BY l.v, l.l),
         |ccj$r AS MATERIALIZED (
         |  SELECT a.v, least(a.l, b.l) AS l
         |  FROM cch$r a JOIN cch$r b ON b.v = a.l)""".stripMargin
    }.mkString(",\n")
    s"""ccedges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM lshpairs
       |  UNION ALL SELECT b AS src, a AS dst FROM lshpairs),
       |cc0 AS MATERIALIZED (
       |  SELECT src AS v, src AS l FROM ccedges GROUP BY src),
       |$rs,
       |labeled AS MATERIALIZED (
       |  SELECT v AS doc_id, l AS cluster_id FROM ccj$rounds)""".stripMargin
  }

  /** Product-quantization CTE blocks (q45/q45b): per subspace j a
    * codebook of stride sub-vectors and a row_number argmin encode —
    * the SQL mirror of [[graft.operators.Pq]]'s NearestCentroid-per-
    * slice, with the same round-6 distance and code-id tie-break as
    * the q09 assignment oracle. */
  private def pqSubL2(a: String, b: String, lo: Int, hi: Int) =
    s"list_sum(list_transform(list_zip(list_slice(CAST($a AS DOUBLE[]), $lo, $hi), $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
  private val pqSub = 64 / PqM
  // cleanEmb guards mirror the Spark operators' drop semantics
  // (Pq.cleanVec / Ivf.assignable raw-column filters): a null,
  // off-dim, or null-ELEMENT embedding neither seeds a codebook row
  // nor gets encoded. Without the length check the row_number
  // formulation would assign rn=1 to unencodable rows via
  // NULL-distance ordering; without the null-element check DuckDB's
  // list_sum would SKIP the null component and hand a dirty row a
  // real partial distance while Spark's kernel nulls it out — both
  // latent divergences a dirty corpus would surface.
  private def cleanEmb(c: String) =
    s"len($c) = 64 AND len(list_filter($c, x -> x IS NULL)) = 0"
  private val pqCtes: String =
    (0 until PqM).map { j =>
      val lo = j * pqSub + 1
      val hi = lo + pqSub - 1
      s"""cb$j AS (
         |  SELECT vec_id // $IvfStep AS code,
         |    list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi) AS s
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |enc$j AS (
         |  SELECT vec_id, code AS c$j FROM (
         |    SELECT v.vec_id, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${pqSubL2("v.embedding", "c.s", lo, hi)}, 6), c.code) AS rn
         |    FROM embeddings v CROSS JOIN cb$j c
         |    WHERE ${cleanEmb("v.embedding")}) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
  private val pqEncJoin: String =
    "FROM enc0 e0 " +
      (1 until PqM).map(j => s"JOIN enc$j e$j USING (vec_id)").mkString(" ")

  /** Per-subspace ADC lookup-table CTEs + their joins and summed
    * distance — shared by q45b (flat ADC) and q48 (IVF-pruned ADC) so
    * the distance derivation cannot drift between the two. */
  private val pqDtCtes: String =
    (0 until PqM).map { j =>
      val lo = j * pqSub + 1
      val hi = lo + pqSub - 1
      s"dt$j AS (SELECT code, round(${pqSubL2("qv", "s", lo, hi)}, 6) AS d FROM cb$j, q)"
    }.mkString(",\n")
  private val pqDtJoins: String =
    (0 until PqM).map(j => s"JOIN dt$j ON dt$j.code = e$j.c$j").mkString(" ")
  private val pqDtSum: String =
    (0 until PqM).map(j => s"dt$j.d").mkString(" + ")

  /** Scalar-quantization CTE block (q49/q49b): clean corpus, per-dim
    * [min, max] ranges, ranges pivoted to ordered lists — the SQL
    * mirror of Sq.ranges. The encode expression ($sqCodes) matches
    * Sq.encode's IEEE-double tree term for term: (x−mn)·255/(mx−mn)
    * floored and capped, 0 on degenerate zero-range dims. */
  private val sqCtes: String =
    s"""clean AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |  WHERE ${cleanEmb("embedding")}),
       |rng AS (
       |  SELECT i, min(e[i]) AS mn, max(e[i]) AS mx
       |  FROM clean, (SELECT unnest(range(1, ${SqDim + 1})) AS i) GROUP BY i),
       |rl AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM rng)""".stripMargin
  private val sqCodes: String =
    """list_transform(list_zip(e, mns, mxs),
      |    x -> CASE WHEN x[3] = x[2] THEN 0
      |         ELSE CAST(least(255, floor((x[1] - x[2]) * 255.0 / (x[3] - x[2]))) AS INT) END)""".stripMargin

  /** BM25 shared CTE block + final select (q34 and the q34b lexical leg).
    * Every mixed-type arithmetic operand is CAST to DOUBLE so DuckDB
    * cannot route through exact DECIMAL intermediates that round
    * differently than Spark's all-double pipeline (SURVEY.md §6). */
  private val bm25TermList = Bm25Terms.map(t => s"'$t'").mkString(", ")
  private val bm25Ctes =
    s"""WITH lens AS (
       |  SELECT doc_id, ts, len(ts) AS dl
       |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents)),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avgdl
       |  FROM lens),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(ts) AS term FROM lens)
       |  WHERE term IN ($bm25TermList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)""".stripMargin
  private val bm25Select =
    s"""SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
       |    round(sum(
       |      ln((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |      * tf * (CAST($Bm25K1 AS DOUBLE) + 1.0)
       |        / (tf + CAST($Bm25K1 AS DOUBLE)
       |           * (1.0 - CAST($Bm25B AS DOUBLE)
       |              + CAST($Bm25B AS DOUBLE) * dl / avgdl))), 6) AS score
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       |  GROUP BY doc_id""".stripMargin

  /** Multi-table sign-LSH cosine near-dup statement (q15b; reused as
    * the pair CTE of q39). Generated from the SAME hyperplanes the
    * Spark operator uses. */
  private val cosineLshSelect: String = {
    val planes = graft.operators.Dedup.hyperplanes(NPlanes * NTables, 64)
    // Dyadic k/1024 components → BigDecimal prints the exact double.
    def arr(h: Seq[Double]) =
      h.map(v => BigDecimal(v).underlying.toPlainString).mkString("[", ", ", "]::DOUBLE[]")
    def bucket(t: Int) =
      planes.slice(t * NPlanes, (t + 1) * NPlanes).zipWithIndex.map { case (h, j) =>
        s"(CASE WHEN ${dotd("embedding", arr(h))} >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
    val bucketCols = (0 until NTables).map(t => s"CAST(${bucket(t)} AS BIGINT) AS b$t").mkString(",\n    ")
    val unions = (0 until NTables).map(t =>
      s"SELECT l.vec_id AS a, r.vec_id AS b FROM bucketed l JOIN bucketed r ON l.b$t = r.b$t AND l.vec_id < r.vec_id")
      .mkString("\n  UNION\n  ")
    s"""WITH bucketed AS (
       |  SELECT vec_id,
       |    $bucketCols
       |  -- same exclusion rule as Dedup.cosineLsh: off-dim vectors
       |  -- never bucket (a mismatched dot is NULL there / an error here)
       |  FROM embeddings WHERE len(embedding) = 64),
       |cand AS (
       |  $unions),
       |normed AS (
       |  SELECT vec_id, embedding, sqrt(${dotd("embedding", "embedding")}) AS nrm FROM embeddings)
       |SELECT c.a, c.b,
       |  round(${dotd("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) AS cos
       |FROM cand c
       |JOIN normed va ON va.vec_id = c.a
       |JOIN normed vb ON vb.vec_id = c.b
       |WHERE round(${dotd("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) >= $CosineThreshold
       |ORDER BY a, b""".stripMargin
  }

  /** Shared by q36 (plain) and q115 (Bloom-pruned): the Bloom gate is
    * an exactness-preserving plan optimization — no false negatives,
    * false positives die in the equi-join — so BOTH keys verify
    * against the SAME exact statement. */
  private val ngramContamSql: String = {
    val hit = "CAST(sum(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
    s"""WITH tagged AS (
       |  SELECT doc_id, text,
       |    CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
       |         THEN 'train' ELSE 'eval' END AS split
       |  FROM documents),
       |ev AS (
       |  SELECT doc_id, ${hash60("s")} AS h
       |  FROM (SELECT doc_id, unnest(sh) AS s
       |        FROM (SELECT doc_id, ${shingles("text", ContamK)} AS sh FROM tagged WHERE split = 'eval'))),
       |tr AS (
       |  SELECT DISTINCT ${hash60("s")} AS h
       |  FROM (SELECT unnest(sh) AS s
       |        FROM (SELECT ${shingles("text", ContamK)} AS sh FROM tagged WHERE split = 'train')))
       |SELECT e.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  $hit AS n_overlap,
       |  round(CAST($hit AS DOUBLE) / count(*), 6) AS overlap_frac,
       |  CAST(round(CAST($hit AS DOUBLE) / count(*), 6) >= $ContamFlagFrac AS INT) AS flagged
       |FROM ev e LEFT JOIN tr t ON e.h = t.h
       |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q03_typed_project" ->
      """SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q04_embedding_cast" ->
      s"""SELECT vec_id,
         |  round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
         |  round(sqrt(${dotd("embedding", "embedding")}), 6) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q05_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(${toks()}) AS INT) AS n_tokens,
         |  CAST(len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), x -> x <> '')) AS INT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q06_token_cost" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(nt) AS DOUBLE) * 0.10 / 1000000.0, 6) AS cost_ada_v2_usd,
         |  round(CAST(sum(nt) AS DOUBLE) * 0.02 / 1000000.0, 6) AS cost_v3_small_usd
         |FROM (SELECT len(${toks()}) AS nt FROM documents)""".stripMargin,

    "q07_sample_export" ->
      s"""SELECT doc_id, lang, source, n_chars
         |FROM documents ORDER BY doc_id LIMIT $SampleN""".stripMargin,

    "q08_order_by" ->
      """SELECT vec_id, label,
        |  CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS idx
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q09_ivf_build" ->
      // same cleanEmb cents guard as q48/q51/q55/q57 (see q55's comment)
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c),
         |ranked AS (
         |  SELECT vec_id, centroid_id, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |  FROM scored)
         |SELECT vec_id, centroid_id, dist FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q12_knn_exact_dot" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT v.vec_id, v.label, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM embeddings v, q
         |ORDER BY score DESC, vec_id LIMIT $K""".stripMargin,

    "q12b_knn_exact_cosine" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT v.vec_id, v.label, round(${cosine("v.embedding", "q.qv")}, 6) AS score
         |FROM embeddings v, q
         |ORDER BY score DESC, vec_id LIMIT $K""".stripMargin,

    "q12c_ivf_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0),
         |probed AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1)
         |SELECT v.vec_id, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM assigned a
         |JOIN probed p ON a.centroid_id = p.centroid_id
         |JOIN embeddings v ON v.vec_id = a.vec_id, q
         |ORDER BY score DESC, v.vec_id LIMIT $K""".stripMargin,

    // q66: Matryoshka two-stage — prefix-dim shortlist, full-dim
    // re-rank. Both dots are the same left-to-right double
    // accumulation as q12's.
    "q66_mrl_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cand AS (
         |  SELECT v.vec_id FROM embeddings v, q
         |  ORDER BY round(${dotd(s"list_slice(v.embedding, 1, $MrlDim)",
                                  s"list_slice(q.qv, 1, $MrlDim)")}, 6) DESC, v.vec_id
         |  LIMIT $MrlShortlist)
         |SELECT v.vec_id, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM cand c JOIN embeddings v ON v.vec_id = c.vec_id, q
         |ORDER BY score DESC, v.vec_id LIMIT $K""".stripMargin,

    // q68: delete-aware probed search — q12c's geometry (centroids and
    // probe set from the FULL corpus, deleted mass included until
    // re-train, matching the tombstone contract) with tombstoned rows
    // subtracted from the assigned postings.
    "q68_delete_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |probed AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT v.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${l2sq("v.embedding", "c.c_emb")}, 6), c.centroid_id) AS rn
         |    FROM embeddings v CROSS JOIN cents c
         |    WHERE v.vec_id % $DeleteMod <> $DeleteRem AND ${cleanEmb("v.embedding")})
         |  WHERE rn = 1)
         |SELECT v.vec_id, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM assigned a
         |JOIN probed p ON a.centroid_id = p.centroid_id
         |JOIN embeddings v ON v.vec_id = a.vec_id, q
         |ORDER BY score DESC, v.vec_id LIMIT $K""".stripMargin,

    // q69: cell-split rebalance — q63's assignment CTEs, oversized
    // cells split between min/max-vec_id-seeded sub-centroids, ids
    // remapped old*2(+1). Same round-6 l2sq comparison as Spark's
    // when(); ties (hi not strictly closer) stay on the lo side.
    "q69_rebalance" ->
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id, embedding FROM (
         |    SELECT v.vec_id, c.centroid_id, v.embedding,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${l2sq("v.embedding", "c.c_emb")}, 6), c.centroid_id) AS rn
         |    FROM embeddings v CROSS JOIN cents c
         |    WHERE ${cleanEmb("v.embedding")}) WHERE rn = 1),
         |counts AS (
         |  SELECT centroid_id, count(*) AS n, min(vec_id) AS lo, max(vec_id) AS hi
         |  FROM assigned GROUP BY 1),
         |over_ AS (SELECT * FROM counts WHERE n > $RebalanceMax),
         |seeds AS (
         |  SELECT o.centroid_id, vl.embedding AS lo_emb, vh.embedding AS hi_emb
         |  FROM over_ o
         |  JOIN embeddings vl ON vl.vec_id = o.lo
         |  JOIN embeddings vh ON vh.vec_id = o.hi),
         |split AS (
         |  SELECT a.vec_id, a.centroid_id * 2 +
         |    CASE WHEN round(${l2sq("a.embedding", "s.hi_emb")}, 6) <
         |              round(${l2sq("a.embedding", "s.lo_emb")}, 6)
         |         THEN 1 ELSE 0 END AS new_id
         |  FROM assigned a JOIN seeds s ON a.centroid_id = s.centroid_id),
         |keep AS (
         |  SELECT a.vec_id, a.centroid_id * 2 AS new_id FROM assigned a
         |  WHERE a.centroid_id NOT IN (SELECT centroid_id FROM over_))
         |SELECT new_id AS centroid_id, CAST(count(*) AS BIGINT) AS n_vectors
         |FROM (SELECT * FROM split UNION ALL SELECT * FROM keep)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q64c: batched BQ — per-query row_number over the same unpacked
    // sign-diff Hamming as q64.
    "q64c_bq_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (${RecallQueryIds.mkString(", ")})),
         |scored AS (
         |  SELECT q.query_id, v.vec_id,
         |    CAST(list_sum(list_transform(list_zip(v.embedding, q.qv),
         |      x -> CAST((x[1] > 0) <> (x[2] > 0) AS INT))) AS BIGINT) AS hamming
         |  FROM embeddings v CROSS JOIN q
         |  WHERE ${cleanEmb("v.embedding")})
         |SELECT query_id, vec_id, hamming FROM (
         |  SELECT query_id, vec_id, hamming,
         |    row_number() OVER (PARTITION BY query_id ORDER BY hamming, vec_id) AS rn
         |  FROM scored)
         |WHERE rn <= $K
         |ORDER BY query_id, hamming, vec_id""".stripMargin,

    // q72: collocations by lift — n_ab·N/(df_a·df_b), one rounded
    // division, same association order as the Spark expression.
    "q72_collocations" ->
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest(${toks()}) AS tok FROM documents),
         |dfreq AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |pairs AS (
         |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
         |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2 HAVING count(*) >= $CollocMin)
         |SELECT p.tok_a, p.tok_b, CAST(p.n_ab AS BIGINT) AS n_ab,
         |  CAST(da.df AS BIGINT) AS df_a, CAST(db.df AS BIGINT) AS df_b,
         |  round((CAST(p.n_ab AS DOUBLE) * CAST(n_docs AS DOUBLE)) /
         |        (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE)), 6) AS lift
         |FROM pairs p
         |JOIN dfreq da ON da.tok = p.tok_a
         |JOIN dfreq db ON db.tok = p.tok_b, n
         |ORDER BY lift DESC, tok_a, tok_b LIMIT $K""".stripMargin,

    // q73: hourly anomalies — the integer-inequality gate mirrors the
    // Spark side exactly; z is one sqrt of an exact integer + one
    // division (both correctly rounded IEEE), then 6-dp.
    "q73_anomalies" ->
      s"""WITH hourly AS (
         |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |stats AS (
         |  SELECT event_type, count(*) AS cnt, sum(n) AS sum_n, sum(n * n) AS sum_n2
         |  FROM hourly GROUP BY 1)
         |SELECT h.event_type, h.hour, CAST(h.n AS BIGINT) AS n_events,
         |  round(CAST(h.n * s.cnt - s.sum_n AS DOUBLE) /
         |        sqrt(CAST(s.cnt * s.sum_n2 - s.sum_n * s.sum_n AS DOUBLE)), 6) AS z
         |FROM hourly h JOIN stats s ON h.event_type = s.event_type
         |WHERE (h.n * s.cnt - s.sum_n) * (h.n * s.cnt - s.sum_n) >
         |      $AnomZ * $AnomZ * (s.cnt * s.sum_n2 - s.sum_n * s.sum_n)
         |ORDER BY h.event_type, h.hour""".stripMargin,

    // q173: the corpus health card — every dial exact/integer-derived
    // until the final 6-dp ratio, mirrored aggregate for aggregate.
    "q173_corpus_card" ->
      s"""WITH base AS (SELECT lang, text, ${toks()} AS ts FROM documents),
         |d AS (SELECT count(*) AS n_docs,
         |             coalesce(sum(len(ts)), 0) AS total_tokens,
         |             count(DISTINCT text) AS n_distinct FROM base),
         |l AS (SELECT max(c) AS top_lang
         |      FROM (SELECT count(*) AS c FROM base GROUP BY lang)),
         |t AS (SELECT count(*) AS vocab,
         |             coalesce(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END), 0) AS hapax,
         |             max(f) AS top_f
         |      FROM (SELECT count(*) AS f
         |            FROM (SELECT unnest(ts) AS term FROM base) GROUP BY term))
         |SELECT metric, value FROM (
         |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM d
         |  UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM d
         |  UNION ALL SELECT 'mean_doc_tokens',
         |    round(CAST(total_tokens AS DOUBLE) / greatest(n_docs, 1), 6) FROM d
         |  UNION ALL SELECT 'exact_dup_frac',
         |    round(CAST(n_docs - n_distinct AS DOUBLE) / greatest(n_docs, 1), 6) FROM d
         |  UNION ALL SELECT 'top_lang_share',
         |    round(CAST(coalesce(top_lang, 0) AS DOUBLE)
         |      / greatest((SELECT n_docs FROM d), 1), 6) FROM l
         |  UNION ALL SELECT 'vocab', CAST(vocab AS DOUBLE) FROM t
         |  UNION ALL SELECT 'hapax_frac',
         |    round(CAST(hapax AS DOUBLE) / greatest(vocab, 1), 6) FROM t
         |  UNION ALL SELECT 'top_token_share',
         |    round(CAST(coalesce(top_f, 0) AS DOUBLE)
         |      / greatest((SELECT total_tokens FROM d), 1), 6) FROM t
         |) ORDER BY metric""".stripMargin,

    // q174: proximity = the |pa-pb| <= w relaxation of the phrase vote
    // algebra, mirrored directly.
    "q174_proximity_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, t.term, t.pos
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term, unnest(range(len(ts))) AS pos) t),
         |pa AS (SELECT doc_id, pos AS pa FROM toks WHERE term = '${ProxTerms._1}'),
         |pb AS (SELECT doc_id, pos AS pb FROM toks WHERE term = '${ProxTerms._2}'),
         |pairs AS (
         |  SELECT pa.doc_id, abs(pa - pb) AS d
         |  FROM pa JOIN pb USING (doc_id) WHERE abs(pa - pb) <= $ProxWindow)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(min(d) AS BIGINT) AS min_dist
         |FROM pairs GROUP BY doc_id ORDER BY n_pairs DESC, doc_id LIMIT $K""".stripMargin,

    // q176: degree-ordered triangle census over the thresholded
    // supplier co-occurrence graph — all-integer (ordering key
    // deg*1e12+id, coefficient in floor-divided micro-units), so the
    // whole census is hash-exact. Every step mirrors Graph.triangles.
    "q176_supplier_triangles" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         |pairs AS (
         |  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
         |e AS (SELECT src AS a, dst AS b FROM pairs
         |      GROUP BY 1, 2 HAVING count(*) >= $TriMinCooc),
         |deg AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY 1),
         |keyed AS (
         |  SELECT e.a, e.b, da.deg * 1000000000000 + e.a AS ka,
         |         db.deg * 1000000000000 + e.b AS kb
         |  FROM e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node),
         |o AS (
         |  SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
         |         CASE WHEN ka < kb THEN b ELSE a END AS dst,
         |         CASE WHEN ka < kb THEN kb ELSE ka END AS dst_key
         |  FROM keyed),
         |w AS (
         |  SELECT e1.src AS x, e1.dst AS v, e2.dst AS w2
         |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst_key < e2.dst_key),
         |t AS (SELECT x, v AS y, w2 AS z
         |      FROM w JOIN o ON w.v = o.src AND w.w2 = o.dst),
         |pn AS (
         |  SELECT node, CAST(count(*) AS BIGINT) AS triangles
         |  FROM (SELECT x AS node FROM t
         |        UNION ALL SELECT y FROM t
         |        UNION ALL SELECT z FROM t)
         |  GROUP BY 1)
         |SELECT d.node AS s_suppkey, d.deg AS degree,
         |  COALESCE(pn.triangles, 0) AS triangles,
         |  CASE WHEN d.deg >= 2
         |    THEN (2 * COALESCE(pn.triangles, 0) * 1000000) // (d.deg * (d.deg - 1))
         |    ELSE 0 END AS cc_micro
         |FROM deg d LEFT JOIN pn ON d.node = pn.node
         |ORDER BY triangles DESC, s_suppkey LIMIT $TriTopN""".stripMargin,

    // q186: audience overlap — the naive distinct-pair statement; the
    // bitmap AND plan must reproduce it exactly.
    "q186_audience_overlap" ->
      s"""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1),
         |ov AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    CAST(count(*) AS BIGINT) AS overlap
         |  FROM tu a JOIN tu b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT na.event_type AS type_a, nb.event_type AS type_b,
         |    na.n AS n_a, nb.n AS n_b
         |  FROM n na JOIN n nb ON na.event_type < nb.event_type)
         |SELECT p.type_a, p.type_b, p.n_a, p.n_b,
         |  COALESCE(ov.overlap, 0) AS overlap,
         |  round(CAST(COALESCE(ov.overlap, 0) AS DOUBLE)
         |    / CAST(p.n_a + p.n_b - COALESCE(ov.overlap, 0) AS DOUBLE), 6) AS jaccard
         |FROM pairs p
         |LEFT JOIN ov ON p.type_a = ov.type_a AND p.type_b = ov.type_b
         |ORDER BY p.type_a, p.type_b""".stripMargin,

    // q190: more-like-this — the same floor-quantized idf and
    // HUGEINT-exact weight products, mirrored term for term.
    "q190_more_like_this" ->
      s"""WITH terms AS (
         |  SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2),
         |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln((nn.n - count(*) + 0.5) / (count(*) + 0.5) + 1.0) * 1e6)
         |      AS BIGINT) AS idf_micro
         |  FROM terms, nn GROUP BY term, nn.n),
         |w AS (SELECT t.doc_id, t.term, t.tf, i.idf_micro
         |      FROM terms t JOIN idf i USING (term)),
         |norms AS (
         |  SELECT doc_id,
         |    sum(CAST(tf * idf_micro AS HUGEINT) * CAST(tf * idf_micro AS HUGEINT))
         |      AS norm2
         |  FROM w GROUP BY 1),
         |qvec AS (SELECT term, tf AS tf_q FROM w WHERE doc_id = $MltDocId),
         |qn AS (SELECT norm2 AS qnorm2 FROM norms WHERE doc_id = $MltDocId),
         |dots AS (
         |  SELECT w.doc_id,
         |    sum(CAST(w.tf * q.tf_q AS HUGEINT)
         |      * CAST(w.idf_micro * w.idf_micro AS HUGEINT)) AS dot,
         |    CAST(count(*) AS BIGINT) AS n_shared_terms
         |  FROM w JOIN qvec q USING (term)
         |  GROUP BY 1)
         |SELECT d.doc_id, d.n_shared_terms,
         |  round(CAST(d.dot AS DOUBLE)
         |    / (sqrt(CAST(nm.norm2 AS DOUBLE)) * sqrt(CAST(qn.qnorm2 AS DOUBLE))),
         |    6) AS cosine_sim
         |FROM dots d JOIN norms nm USING (doc_id), qn
         |WHERE d.doc_id <> $MltDocId
         |ORDER BY cosine_sim DESC, d.doc_id LIMIT $K""".stripMargin,

    // q192: SymSpell fuzzy lookup — deletion-neighborhood equi-join +
    // exact levenshtein confirm, both engines' classic DP distance.
    "q192_fuzzy_lookup" -> {
      val qvs = (FuzzyQuery +: (0 until FuzzyQuery.length)
        .map(i => FuzzyQuery.substring(0, i) + FuzzyQuery.substring(i + 1)))
        .distinct.map(v => s"('$v')").mkString(", ")
      s"""WITH dt AS (
         |  SELECT doc_id, t.term, count(*) AS tf
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2),
         |dict AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |vars AS (
         |  SELECT term, df, unnest(list_distinct(list_prepend(term,
         |    list_transform(range(1, len(term) + 1),
         |      i -> substr(term, 1, i - 1) || substr(term, i + 1))))) AS v
         |  FROM dict),
         |qv(v) AS (VALUES $qvs),
         |cand AS (SELECT DISTINCT term, df FROM vars JOIN qv USING (v))
         |SELECT term, df,
         |  CAST(levenshtein(term, '$FuzzyQuery') AS BIGINT) AS dist
         |FROM cand
         |WHERE levenshtein(term, '$FuzzyQuery') <= 1
         |ORDER BY df DESC, term LIMIT $K""".stripMargin
    },

    // q191: Rocchio confusion — q190's quantized-idf/HUGEINT algebra
    // with source profiles as the "query documents"; cosine rounds
    // BEFORE the per-doc argmax, ties to p_source.
    "q191_source_confusion" ->
      s"""WITH terms AS (
         |  SELECT doc_id, source, t.term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, source, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2, 3),
         |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
         |idf AS (
         |  SELECT term,
         |    CAST(floor(ln((nn.n - count(DISTINCT doc_id) + 0.5)
         |      / (count(DISTINCT doc_id) + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_micro
         |  FROM terms, nn GROUP BY term, nn.n),
         |w AS (SELECT t.doc_id, t.source, t.term, t.tf, i.idf_micro
         |      FROM terms t JOIN idf i USING (term)),
         |profiles AS (
         |  SELECT source AS p_source, term, CAST(sum(tf) AS BIGINT) AS tf_s
         |  FROM w GROUP BY 1, 2),
         |pnorm AS (
         |  SELECT p.p_source,
         |    sum(CAST(p.tf_s * i.idf_micro AS HUGEINT)
         |      * CAST(p.tf_s * i.idf_micro AS HUGEINT)) AS pnorm2
         |  FROM profiles p JOIN idf i USING (term) GROUP BY 1),
         |dnorm AS (
         |  SELECT doc_id,
         |    sum(CAST(tf * idf_micro AS HUGEINT)
         |      * CAST(tf * idf_micro AS HUGEINT)) AS dnorm2
         |  FROM w GROUP BY 1),
         |scores AS (
         |  SELECT w.doc_id, w.source, p.p_source,
         |    sum(CAST(w.tf * p.tf_s AS HUGEINT)
         |      * CAST(w.idf_micro * w.idf_micro AS HUGEINT)) AS dot
         |  FROM w JOIN profiles p USING (term)
         |  GROUP BY 1, 2, 3),
         |cosed AS (
         |  SELECT s.doc_id, s.source, s.p_source,
         |    round(CAST(s.dot AS DOUBLE)
         |      / (sqrt(CAST(dn.dnorm2 AS DOUBLE)) * sqrt(CAST(pn.pnorm2 AS DOUBLE))),
         |      6) AS cos
         |  FROM scores s
         |  JOIN dnorm dn USING (doc_id)
         |  JOIN pnorm pn USING (p_source)),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cos DESC, p_source) AS rn
         |  FROM cosed)
         |SELECT source, p_source AS predicted, CAST(count(*) AS BIGINT) AS n_docs
         |FROM best WHERE rn = 1
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q188: CUBE subtotal lattice — DuckDB's GROUP BY CUBE with the
    // same leftmost-is-MSB GROUPING() convention; DECIMAL sums, one
    // final round.
    "q188_revenue_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(year(l_shipdate) AS INT) AS ship_year,
         |  CAST(GROUPING(l_returnflag, l_linestatus, year(l_shipdate)) AS INT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
         |    AS DOUBLE), 6) AS revenue
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus, year(l_shipdate))
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
         |  ship_year NULLS FIRST, gid""".stripMargin,

    // q185: autocomplete — the inline term-dictionary statement; the
    // served plan is spec-pinned bit-equal to it.
    "q185_prefix_search" ->
      s"""WITH dt AS (
         |  SELECT doc_id, t.term, count(*) AS tf
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2),
         |dict AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(tf) AS BIGINT) AS tf
         |  FROM dt GROUP BY 1)
         |SELECT term, df, tf FROM dict
         |WHERE starts_with(term, '$PrefixQuery')
         |ORDER BY df DESC, term LIMIT $K""".stripMargin,

    // q210: pg_trgm trigram-similarity lookup — padded distinct
    // 3-grams, Jaccard over sets, the query's trigram list inlined
    // from the SAME JVM padding function the Spark literal uses.
    "q210_trigram_lookup" -> {
      val qTg = graft.operators.Search.trigramsOf(TrgQuery)
      val qList = qTg.map(g => "'" + g.replace("'", "''") + "'").mkString("[", ", ", "]")
      s"""WITH dt AS (
         |  SELECT doc_id, t.term, count(*) AS tf
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2),
         |dict AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |tg AS (
         |  SELECT term, df,
         |    list_distinct([substr(p, i, 3) for i in range(1, len(p) - 1)]) AS tgs
         |  FROM (SELECT term, df, '  ' || lower(term) || ' ' AS p FROM dict)),
         |scored AS (
         |  SELECT term, df,
         |    round(CAST(len(list_intersect(tgs, $qList)) AS DOUBLE) /
         |      CAST(len(tgs) + ${qTg.size} - len(list_intersect(tgs, $qList)) AS DOUBLE),
         |      6) AS sim
         |  FROM tg
         |  WHERE len(list_intersect(tgs, $qList)) > 0)
         |SELECT term, df, sim FROM scored
         |WHERE sim >= $TrgMinSim
         |ORDER BY sim DESC, df DESC, term LIMIT $K""".stripMargin
    },

    // q184: personalized PageRank, 3 unrolled rounds — q88's integer
    // floor arithmetic with the teleport mass returned to the seed.
    "q184_related_parts" -> {
      val seed = PprSeedPart * 2
      val perSeed = 1000000L * 15 / 100 // one seed: (1e6·(den−num)) // (den·1)
      def round(prev: String, out: String) =
        s"""$out AS (
           |  SELECT n0.node_id,
           |    CAST((CASE WHEN n0.node_id = $seed THEN $perSeed ELSE 0 END)
           |      + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n0
           |  LEFT JOIN (
           |    SELECT e.dst AS node_id, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS s
           |    FROM $prev p
           |    JOIN edges e ON p.node_id = e.src
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY 1) s USING (node_id))"""
      s"""WITH base AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |edges AS (
         |  SELECT src, dst FROM base
         |  UNION SELECT dst AS src, src AS dst FROM base),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node_id FROM edges),
         |pr0 AS (
         |  SELECT node_id,
         |    CASE WHEN node_id = $seed THEN 1000000 ELSE 0 END AS pr
         |  FROM nodes),
         |${round("pr0", "pr1")},
         |${round("pr1", "pr2")},
         |${round("pr2", "pr3")}
         |SELECT node_id,
         |  CASE WHEN node_id % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  node_id // 2 AS key, pr AS pr_micro
         |FROM pr3 WHERE pr > 0
         |ORDER BY pr_micro DESC, node_id LIMIT $PprTopN""".stripMargin
    },

    // q211: peak concurrency — the oracle states the naive one-window
    // sweep (running sum of per-instant net deltas over each type's
    // whole history); the distributed two-phase prefix sum must
    // reproduce it exactly. Half-open [start, start + value seconds)
    // sessions in exact epoch-microsecond integers.
    "q211_peak_concurrency" ->
      s"""WITH d AS (
         |  SELECT event_type, t, CAST(sum(dd) AS BIGINT) AS net FROM (
         |    SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t, 1 AS dd FROM events
         |    UNION ALL
         |    SELECT event_type,
         |      epoch_us(CAST(ts AS TIMESTAMP)) +
         |        CAST(round(greatest(value, 0) * 1000000) AS BIGINT), -1 FROM events)
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT event_type, t,
         |    sum(net) OVER (PARTITION BY event_type ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |  FROM d),
         |p AS (SELECT event_type, max(conc) AS peak FROM r GROUP BY 1)
         |SELECT r.event_type, CAST(p.peak AS BIGINT) AS peak_concurrency,
         |  min(r.t) AS peak_at_us
         |FROM r JOIN p ON r.event_type = p.event_type AND r.conc = p.peak
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // q183: rolling active users — the oracle states the NAIVE
    // per-window distinct; the bitmap plan must reproduce it exactly.
    "q183_active_users" ->
      s"""WITH du AS (
         |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
         |days AS (SELECT DISTINCT day FROM du)
         |SELECT strftime(d.day, '%Y-%m-%d') AS day,
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM du
         |   WHERE du.day = d.day) AS dau,
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM du
         |   WHERE du.day > d.day - INTERVAL 7 DAY AND du.day <= d.day) AS wau,
         |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM du
         |   WHERE du.day > d.day - INTERVAL 30 DAY AND du.day <= d.day) AS mau
         |FROM days d ORDER BY day""".stripMargin,

    // q182: hour-of-day slot anomalies — q73's exact-integer gate
    // conditioned on the (type, hod) population.
    "q182_seasonal_anomalies" ->
      s"""WITH hourly AS (
         |  SELECT event_type,
         |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |x AS (SELECT *, CAST(substring(hour, 12, 2) AS INT) AS hod FROM hourly),
         |s AS (
         |  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(n) AS BIGINT) AS sum_n, CAST(sum(n * n) AS BIGINT) AS sum_n2
         |  FROM x GROUP BY 1, 2)
         |SELECT x.event_type, x.hour, x.hod, x.n AS n_events,
         |  round(CAST(x.n * s.cnt - s.sum_n AS DOUBLE)
         |    / sqrt(CAST(s.cnt * s.sum_n2 - s.sum_n * s.sum_n AS DOUBLE)), 6) AS z_slot
         |FROM x JOIN s USING (event_type, hod)
         |WHERE (x.n * s.cnt - s.sum_n) * (x.n * s.cnt - s.sum_n)
         |  > ${AnomZ.toLong * AnomZ} * (s.cnt * s.sum_n2 - s.sum_n * s.sum_n)
         |ORDER BY x.event_type, x.hour""".stripMargin,

    // q177: Holt double-exponential smoothing — the same integer
    // micro-unit fold as Events.holtForecast, as a recursive CTE
    // walking each type's hourly series in t order. DuckDB `//` and
    // Spark `div` both truncate toward zero, so the recursion is
    // hash-exact at any length. b_eff/l' appear twice textually (a
    // SELECT item cannot reference a sibling alias) — same expression,
    // same value, exactly like the Spark fold.
    "q177_holt_forecast" -> {
      val aN = HoltAlphaNum; val bN = HoltBetaNum; val den = HoltDen
      val bEff = s"(CASE WHEN st.t = 1 THEN (s.n - st.x1) * 1000000 ELSE st.b END)"
      val lNew = s"(($aN * s.n * 1000000 + ${den - aN} * (st.l + $bEff)) // $den)"
      val fcols = (1 to HoltHorizon)
        .map(h => s"st.l + $h * st.b AS f${h}_micro").mkString(",\n         |  ")
      s"""WITH RECURSIVE hourly AS (
         |  SELECT event_type,
         |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |series AS (
         |  SELECT event_type, hour, n,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS t
         |  FROM hourly),
         |meta AS (
         |  SELECT event_type, max(t) AS n_hours, max(hour) AS last_hour
         |  FROM series GROUP BY 1),
         |step(event_type, t, l, b, x1) AS (
         |  SELECT event_type, t, n * 1000000, CAST(0 AS BIGINT), n
         |  FROM series WHERE t = 1
         |  UNION ALL
         |  SELECT s.event_type, s.t, $lNew,
         |    (($bN * ($lNew - st.l) + ${den - bN} * $bEff) // $den), st.x1
         |  FROM step st JOIN series s
         |    ON s.event_type = st.event_type AND s.t = st.t + 1)
         |SELECT m.event_type, m.n_hours, m.last_hour,
         |  st.l AS level_micro, st.b AS trend_micro,
         |  $fcols
         |FROM step st JOIN meta m
         |  ON st.event_type = m.event_type AND st.t = m.n_hours
         |ORDER BY m.event_type""".stripMargin
    },

    // q178: item-item covisitation cosine — the capped per-user pair
    // stream mirrored step for step; GroupedTopK's (order, tie) rule
    // is exactly row_number's, and the similarity rounds to 6 dp
    // BEFORE ranking on both sides.
    "q178_covisitation" ->
      s"""WITH ui AS (
         |  SELECT user_id,
         |    CAST(CAST(json_extract_string(props, '$$.k') AS INT) AS BIGINT) AS item,
         |    count(*) AS cnt
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2),
         |kept AS (
         |  SELECT user_id, item FROM (
         |    SELECT user_id, item,
         |      row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, item) AS rn
         |    FROM ui) WHERE rn <= $CovisitCap),
         |iu AS (SELECT item, CAST(count(*) AS BIGINT) AS n_users FROM kept GROUP BY 1),
         |co AS (
         |  SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS co_users
         |  FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT ia AS item, ib AS neighbor, co_users FROM co
         |  UNION ALL SELECT ib, ia, co_users FROM co),
         |scored AS (
         |  SELECT p.item, p.neighbor, p.co_users,
         |    round(CAST(p.co_users AS DOUBLE)
         |      / sqrt(CAST(ni.n_users * nj.n_users AS DOUBLE)), 6) AS cosine_sim
         |  FROM pairs p
         |  JOIN iu ni ON p.item = ni.item
         |  JOIN iu nj ON p.neighbor = nj.item),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY item
         |    ORDER BY cosine_sim DESC, neighbor) AS rn
         |  FROM scored)
         |SELECT item, neighbor, co_users, cosine_sim
         |FROM ranked WHERE rn <= $CovisitTopK
         |ORDER BY item, cosine_sim DESC, neighbor""".stripMargin,

    // q179: KWIC snippets — 1-based array_position/list_position and
    // inclusive 1-based slicing agree between the engines, so the
    // snippet string mirrors exactly.
    "q179_snippets" ->
      s"""WITH t AS (SELECT doc_id, ${toks()} AS ts FROM documents),
         |m AS (
         |  SELECT doc_id, ts,
         |    CAST(list_position(ts, '$SnippetTerm') AS BIGINT) AS match_pos,
         |    CAST(len(list_filter(ts, x -> x = '$SnippetTerm')) AS BIGINT) AS n_matches
         |  FROM t)
         |SELECT doc_id, match_pos, n_matches,
         |  array_to_string(list_slice(ts,
         |    greatest(1, match_pos - $SnippetContext),
         |    least(match_pos + $SnippetContext, len(ts))), ' ') AS snippet
         |FROM m WHERE match_pos > 0
         |ORDER BY n_matches DESC, doc_id LIMIT $K""".stripMargin,

    // q171: phrase search from the persisted positional index is
    // bit-equal to the inline vote algebra (SearchSpec pins it), so the
    // oracle states the algebra directly: token i of the phrase at
    // position p votes for start p-i; a start with all m votes is an
    // occurrence.
    "q171_phrase_search" -> {
      val q = PhraseQuery.trim.split("\\s+").filter(_.nonEmpty)
      val values = q.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, t.term, t.pos
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term, unnest(range(len(ts))) AS pos) t),
         |q(term, qi) AS (VALUES $values),
         |votes AS (
         |  SELECT doc_id, CAST(pos - qi AS BIGINT) AS st
         |  FROM toks JOIN q USING (term) WHERE pos - qi >= 0),
         |occ AS (
         |  SELECT doc_id, st FROM votes GROUP BY doc_id, st
         |  HAVING count(*) = ${q.length})
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(min(st) AS BIGINT) AS first_pos
         |FROM occ GROUP BY doc_id ORDER BY n_hits DESC, doc_id LIMIT $K""".stripMargin
    },

    "q170_effective_dim" ->
      s"""WITH clean AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE embedding IS NOT NULL AND ${cleanEmb("embedding")}),
         |pos AS (
         |  SELECT vec_id, r.i AS d,
         |    CAST(round(round(CAST(embedding[r.i] AS DOUBLE), 5) * 1e5, 0) AS BIGINT) AS x5
         |  FROM clean, LATERAL unnest(range(1, 65)) AS r(i)),
         |sxy AS (
         |  SELECT a.d AS da, b.d AS db,
         |    CAST(sum(a.x5 * b.x5) AS BIGINT) AS sxy10,
         |    count(*) AS n
         |  FROM pos a JOIN pos b USING (vec_id) GROUP BY 1, 2),
         |sx AS (
         |  SELECT d, CAST(sum(x5) AS BIGINT) AS sx5
         |  FROM pos GROUP BY 1),
         |cde AS (
         |  SELECT da, db,
         |    CAST(round(((sxy10 / 1e10) / n - (sa.sx5 / 1e5 / n) * (sb.sx5 / 1e5 / n)) * 1e6, 0) AS BIGINT) AS c6,
         |    n
         |  FROM sxy JOIN sx sa ON sxy.da = sa.d JOIN sx sb ON sxy.db = sb.d),
         |agg AS (
         |  SELECT max(n) AS n_vectors,
         |    CAST(sum(CASE WHEN da = db THEN c6 ELSE 0 END) AS BIGINT) AS tr6,
         |    CAST(sum(c6 * c6) AS BIGINT) AS tr2_12
         |  FROM cde)
         |SELECT CAST(n_vectors AS BIGINT) AS n_vectors, CAST(64 AS INT) AS dim,
         |  round(tr6 / 1e6, 6) AS total_variance,
         |  round((tr6 / 1e6) * (tr6 / 1e6) / greatest(tr2_12 / 1e12, 1e-12), 6) AS effective_dim,
         |  round((tr6 / 1e6) * (tr6 / 1e6) / greatest(tr2_12 / 1e12, 1e-12) / 64, 6) AS effective_dim_ratio
         |FROM agg""".stripMargin,

    "q169_vocab_growth" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    ${hash60(s"(CAST(doc_id AS VARCHAR) || ':$ShuffleEpoch')")} AS skey,
         |    ${toks()} AS ts, len(${toks()}) AS len
         |  FROM documents),
         |placed AS (
         |  SELECT doc_id, ts,
         |    CAST(sum(len) OVER (ORDER BY skey, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len AS BIGINT) AS start
         |  FROM base),
         |firsto AS (
         |  SELECT ts[r.i] AS term, CAST(min(start + r.i - 1) AS BIGINT) AS f
         |  FROM placed, LATERAL unnest(range(1, len(ts) + 1)) AS r(i)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(len) AS BIGINT) AS total FROM base),
         |bydec AS (
         |  SELECT (f * $HeapsCuts) // total AS d, count(*) AS nv
         |  FROM firsto, tot GROUP BY 1),
         |decs AS (SELECT CAST(unnest(range(0, $HeapsCuts)) AS BIGINT) AS d),
         |cum AS (
         |  SELECT d.d, coalesce(b.nv, 0) AS nv FROM decs d LEFT JOIN bydec b USING (d)),
         |curve AS (
         |  SELECT d, sum(nv) OVER (ORDER BY d
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vocab_seen
         |  FROM cum)
         |SELECT CAST(d + 1 AS INT) AS decile,
         |  CAST((d + 1) * total // $HeapsCuts AS BIGINT) AS n_prefix_tokens,
         |  CAST(vocab_seen AS BIGINT) AS vocab_seen,
         |  round(CAST(vocab_seen AS DOUBLE) /
         |    CAST(greatest((d + 1) * total // $HeapsCuts, 1) AS DOUBLE), 6) AS type_token_ratio
         |FROM curve, tot ORDER BY decile""".stripMargin,

    "q166_zipf_report" ->
      s"""WITH tf AS (
         |  SELECT t.term, count(*) AS c
         |  FROM documents, LATERAL unnest(${toks("lower(text)")}) AS t(term)
         |  GROUP BY 1),
         |totals AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
         |    CAST(count(*) AS BIGINT) AS vocab_size,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |    CAST(max(c) AS BIGINT) AS top1_n
         |  FROM tf),
         |top AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rank
         |  FROM (SELECT * FROM tf ORDER BY c DESC, term LIMIT $ZipfTopN)),
         |xy AS (
         |  SELECT CAST(count(*) AS BIGINT) AS np,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sx2
         |  FROM (SELECT CAST(round(round(ln(rank), 6) * 1e6, 0) AS BIGINT) AS x,
         |               CAST(round(round(ln(c), 6) * 1e6, 0) AS BIGINT) AS y FROM top))
         |SELECT total_tokens, vocab_size, n_hapax,
         |  round(CAST(top1_n AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS top1_share,
         |  np AS fit_n,
         |  round(CAST(np * sxy - sx * sy AS DOUBLE) /
         |        CAST(np * sx2 - sx * sx AS DOUBLE), 6) AS zipf_slope,
         |  round((CAST(sy AS DOUBLE) / 1e6 -
         |    (CAST(np * sxy - sx * sy AS DOUBLE) / CAST(np * sx2 - sx * sx AS DOUBLE))
         |      * (CAST(sx AS DOUBLE) / 1e6)) / CAST(np AS DOUBLE), 6) AS zipf_intercept
         |FROM xy, totals""".stripMargin,

    "q165_changepoint" ->
      s"""WITH hourly AS (
         |  SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |    count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, hour, n,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS t,
         |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM hourly),
         |stats AS (
         |  SELECT event_type, max(t) AS t_max, CAST(sum(n) AS BIGINT) AS total
         |  FROM cum GROUP BY 1),
         |scored AS (
         |  SELECT c.event_type, c.hour, c.t, c.cum, s.t_max, s.total,
         |    abs(s.t_max * c.cum - c.t * s.total) AS s_abs
         |  FROM cum c JOIN stats s USING (event_type)
         |  WHERE c.t < s.t_max),
         |best AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY s_abs DESC, t) AS rn
         |  FROM scored)
         |SELECT event_type, CAST(t_max AS BIGINT) AS n_hours, hour AS change_hour,
         |  CAST(t AS BIGINT) AS t_index,
         |  round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 6) AS mean_before,
         |  round(CAST(total - cum AS DOUBLE) / CAST(t_max - t AS DOUBLE), 6) AS mean_after,
         |  round(CAST(total - cum AS DOUBLE) / CAST(t_max - t AS DOUBLE)
         |    - CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 6) AS level_shift,
         |  round(CAST(s_abs AS DOUBLE) / CAST(t_max AS DOUBLE), 6) AS cusum_peak
         |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // q74: banded range join — the oracle states the NAIVE interval
    // join (DuckDB's IEJoin handles it); Spark's banded plan must
    // produce the identical counts, which is the point of the mirror.
    "q74_range_join" ->
      s"""WITH tgt AS (
         |  SELECT event_id, epoch_us(ts) AS t_us FROM events WHERE event_type = 'error'),
         |src AS (
         |  SELECT epoch_us(ts) AS s_us FROM events WHERE event_type = 'click'),
         |cnt AS (
         |  SELECT t.event_id, count(*) AS n
         |  FROM tgt t JOIN src s
         |    ON s.s_us >= t.t_us - ${RangeWindowSec}000000 AND s.s_us < t.t_us
         |  GROUP BY 1)
         |SELECT t.event_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_preceding
         |FROM tgt t LEFT JOIN cnt c ON t.event_id = c.event_id
         |ORDER BY t.event_id""".stripMargin,

    // q84: z-order layout report — pure integer bit interleave, the
    // bucket a shift of the z-value's high bits. No float anywhere.
    // q139: Hilbert report — the quadrant-rotation walk unrolled as one
    // generated CTE per bit level (SQL's named columns give the sharing
    // the Spark side gets from its codegen'd loop); all integer.
    // q143: the reconstructed v3 — the CDC-apply result must equal the
    // q92 change rule applied directly.
    "q143_cdc_apply" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN doc_id % $UpsertChangeMod = 0 THEN n_chars + 1000
         |       ELSE n_chars END AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    // q142: range-checksum drift localization; hash60 + bit_xor fold
    // over FIXED-WIDTH per-column md5 digests (r14: the delimited
    // concat_ws had an aliasing channel — ("a|b","c") == ("a","b|c") —
    // and a literal '<NULL>' string collided with NULL; 32-char
    // digests cannot alias a boundary and the NULL sentinel is outside
    // the hex alphabet).
    "q142_checksum_drift" -> {
      val sentinel = "*".repeat(32)
      def fold(src: String, suffix: String) =
        s"""SELECT doc_id % $ChecksumBuckets AS bucket,
           |    CAST(count(*) AS BIGINT) AS n_rows_$suffix,
           |    bit_xor(('0x' || substr(md5(concat(
           |      coalesce(md5(CAST(doc_id AS VARCHAR)), '$sentinel'),
           |      coalesce(md5(text), '$sentinel'),
           |      coalesce(md5(lang), '$sentinel'),
           |      coalesce(md5(source), '$sentinel'),
           |      coalesce(md5(CAST(n_chars AS VARCHAR)), '$sentinel'))), 1, 15))::BIGINT)
           |      AS checksum_$suffix
           |  FROM $src GROUP BY 1""".stripMargin
      s"""WITH b_src AS (
         |  SELECT doc_id, text, lang, source,
         |    CASE WHEN doc_id % $ChecksumDriftMod = $ChecksumDriftRem
         |         THEN n_chars + 1000 ELSE n_chars END AS n_chars
         |  FROM documents),
         |a AS (${fold("documents", "a")}),
         |b AS (${fold("b_src", "b")})
         |SELECT bucket, n_rows_a, checksum_a, n_rows_b, checksum_b
         |FROM a FULL JOIN b USING (bucket)
         |WHERE n_rows_a IS DISTINCT FROM n_rows_b
         |   OR checksum_a IS DISTINCT FROM checksum_b
         |ORDER BY bucket""".stripMargin
    },

    // q141: SCD2 over the same deterministic 3-version feed; the
    // restated (unchanged) v2 rows must COLLAPSE (no history row).
    // IS DISTINCT FROM mirrors Spark's null-safe struct <=>.
    "q141_scd2_history" ->
      s"""WITH feed AS (
         |  SELECT doc_id, source, n_chars, CAST(1 AS BIGINT) AS version FROM documents
         |  UNION ALL
         |  SELECT doc_id, source, n_chars + 1000, 2 FROM documents WHERE doc_id % $ScdChangeMod = 0
         |  UNION ALL
         |  SELECT doc_id, source, n_chars, 2 FROM documents WHERE doc_id % $ScdChangeMod = 1
         |  UNION ALL
         |  SELECT doc_id, source, n_chars + 2000, 3 FROM documents WHERE doc_id % $ScdDeepMod = 0),
         |marked AS (
         |  SELECT doc_id, source, n_chars, version,
         |    lag(version) OVER w AS __pv,
         |    lag(source) OVER w AS __ps,
         |    lag(n_chars) OVER w AS __pn
         |  FROM feed WINDOW w AS (PARTITION BY doc_id ORDER BY version)),
         |kept AS (
         |  SELECT doc_id, source, n_chars, version FROM marked
         |  WHERE __pv IS NULL
         |     OR __ps IS DISTINCT FROM source
         |     OR __pn IS DISTINCT FROM n_chars)
         |SELECT doc_id, source, n_chars,
         |  version AS valid_from,
         |  lead(version) OVER w2 AS valid_to,
         |  (lead(version) OVER w2 IS NULL) AS is_current
         |FROM kept WINDOW w2 AS (PARTITION BY doc_id ORDER BY version)
         |ORDER BY doc_id, valid_from""".stripMargin,

    // q140: the Spark side answers from the hourly bitmap rollup
    // (build → OR-merge → popcount); the oracle states the raw-scan
    // ground truth the pre-aggregate must reproduce exactly.
    "q140_bitmap_distinct" ->
      """SELECT event_type,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q139_hilbert_report" -> {
      val steps = (0 until ZBits).map { step =>
        val s = 1L << (ZBits - 1 - step)
        val prev = if (step == 0) "h_init" else s"h${step - 1}"
        s"""h$step AS (
           |  SELECT a, b,
           |    d + CAST(${s * s} AS BIGINT) * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
           |                      CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d,
           |    CASE WHEN (y & $s) = 0
           |         THEN CASE WHEN (x & $s) > 0 THEN $s - 1 - y ELSE y END
           |         ELSE x END AS x,
           |    CASE WHEN (y & $s) = 0
           |         THEN CASE WHEN (x & $s) > 0 THEN $s - 1 - x ELSE x END
           |         ELSE y END AS y
           |  FROM $prev)"""
      }.mkString(",\n")
      s"""WITH h_init AS (
         |  SELECT CAST(l_partkey AS BIGINT) AS a, CAST(l_suppkey AS BIGINT) AS b,
         |    CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem
         |  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
         |    AND l_partkey >= 0 AND l_suppkey >= 0
         |    AND l_partkey < ${1L << ZBits} AND l_suppkey < ${1L << ZBits}),
         |$steps
         |SELECT (d >> ${2 * ZBits - ZLbBuckets}) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(a) AS min_l_partkey, max(a) AS max_l_partkey,
         |  min(b) AS min_l_suppkey, max(b) AS max_l_suppkey
         |FROM h${ZBits - 1} GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "q84_zorder_report" -> {
      val zExpr = (0 until ZBits).map(i =>
        s"(((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1})")
        .map(t => s"($t)").mkString(" | ")
      s"""WITH keys AS (
         |  SELECT CAST(l_partkey AS BIGINT) AS a, CAST(l_suppkey AS BIGINT) AS b
         |  FROM lineitem
         |  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
         |    AND l_partkey >= 0 AND l_suppkey >= 0),
         |zz AS (SELECT a, b, ($zExpr) AS zv FROM keys)
         |SELECT (zv >> ${2 * ZBits - ZLbBuckets}) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(a) AS min_l_partkey, max(a) AS max_l_partkey,
         |  min(b) AS min_l_suppkey, max(b) AS max_l_suppkey
         |FROM zz GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    // q76: TPC-H Q3 shape — decimal-exact revenue, top-10 with a full
    // (o_orderdate, l_orderkey) tie-break so the cut line is unique.
    "q76_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  o_orderpriority
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = '$Q3Segment'
         |  AND o_orderdate < TIMESTAMP '$Q3Cutoff 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$Q3Cutoff 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    // q77: TPC-H Q13 shape — the exclusion lives in the JOIN condition
    // so zero-order customers survive into the c_count = 0 bucket.
    "q77_order_dist" ->
      s"""WITH per_customer AS (
         |  SELECT c_custkey, count(o_orderkey) AS c_count
         |  FROM customer LEFT OUTER JOIN orders
         |    ON c_custkey = o_custkey
         |    AND o_orderpriority NOT LIKE '$Q13ExcludedPriority%'
         |  GROUP BY c_custkey)
         |SELECT c_count, count(*) AS custdist
         |FROM per_customer GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // q78: TPC-H Q4 shape — EXISTS (DuckDB plans a semi join) mirrors
    // Spark's left_semi; counts can't double on multi-match orders.
    "q78_priority_count" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '$Q4From 00:00:00'
         |  AND o_orderdate < TIMESTAMP '$Q4Until 00:00:00'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // q79: transition matrix — lead() pairing pinned by (ts, event_id),
    // counts exact integers, p one division of two exact integers.
    // No date functions, so the sf1 BIGINT-ts corpus orders identically.
    "q79_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |cnt AS (
        |  SELECT event_type, next_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS p
        |FROM cnt ORDER BY event_type, next_type""".stripMargin,

    // q80: positional deciles — SQL-standard ntile in both engines; the
    // (n_chars, doc_id) compound order pins tie-straddling buckets.
    "q80_length_deciles" ->
      s"""WITH d AS (
         |  SELECT lang, n_chars,
         |    ntile($DecileBuckets) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
         |  FROM documents WHERE n_chars IS NOT NULL)
         |SELECT lang, decile, CAST(count(*) AS BIGINT) AS n_values,
         |  min(n_chars) AS min_value, max(n_chars) AS max_value,
         |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_value
         |FROM d GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,

    // q83: session paths — q17b's session assignment with the order
    // pinned by (ts, event_id); string_agg over the rn<=steps prefix.
    "q83_session_paths" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN prev_ts IS NULL
         |           OR date_diff('second', prev_ts, ts) > ${SessionGapMin * 60} THEN 1
         |         ELSE 0 END AS new_session
         |  FROM marked),
         |sess AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
         |  FROM flagged),
         |numbered AS (
         |  SELECT user_id, session_seq, event_type,
         |    row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS rn
         |  FROM sess),
         |paths AS (
         |  SELECT user_id, session_seq,
         |    string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM numbered WHERE rn <= $PathSteps GROUP BY user_id, session_seq)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT $K""".stripMargin,

    // q70: cohort retention — ISO-week truncation (both engines
    // truncate to Monday); integer counts, ratio of exact integers.
    "q70_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
        |sizes AS (SELECT cohort_week, count(*) AS cohort_size FROM cohort GROUP BY 1),
        |ret AS (
        |  SELECT c.cohort_week,
        |    CAST((u.week - c.cohort_week) // 7 AS INT) AS week_offset,
        |    count(DISTINCT u.user_id) AS n_users
        |  FROM uw u JOIN cohort c ON u.user_id = c.user_id GROUP BY 1, 2)
        |SELECT strftime(r.cohort_week, '%Y-%m-%d') AS cohort_week,
        |  r.week_offset, CAST(r.n_users AS BIGINT) AS n_users,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  round(CAST(r.n_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
        |FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
        |ORDER BY 1, 2""".stripMargin,

    // q71: systematic PPS sample — pure integer pin arithmetic
    // ((cum·n) // Σw), so the running-sum formulation here and Spark's
    // two-pass bucket cumsum must agree bit for bit.
    "q71_pps_sample" ->
      s"""WITH t AS (SELECT sum(n_chars) AS total FROM documents),
         |c AS (
         |  SELECT doc_id, n_chars,
         |    sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM documents)
         |SELECT doc_id, n_chars,
         |  CAST((cum * $PpsN) // total - ((cum - n_chars) * $PpsN) // total AS BIGINT) AS n_hits
         |FROM c, t
         |WHERE (cum * $PpsN) // total > ((cum - n_chars) * $PpsN) // total
         |ORDER BY doc_id""".stripMargin,

    // q153: weighted reservoir (Efraimidis-Spirakis) — u is exact
    // integer LCG arithmetic in both engines; the one float op
    // ln(u)/w ranks only after round(·, 6) (the q67 discipline), with
    // doc_id breaking rounded ties, so selection matches bit for bit.
    "q153_weighted_reservoir" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, source, n_chars,
         |    round(ln(CAST((doc_id * 1103515245 + $ReservoirSeed) % 2147483648 + 1 AS DOUBLE)
         |            / 2147483649.0) / CAST(n_chars AS DOUBLE), 6) AS skey
         |  FROM documents WHERE n_chars > 0)
         |SELECT doc_id, source, n_chars FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source ORDER BY skey DESC, doc_id) AS rn
         |  FROM keyed) WHERE rn <= $ReservoirK
         |ORDER BY source, doc_id""".stripMargin,

    // q67: batched exact top-k — the row_number formulation is the
    // SQL mirror of GroupedTopK's per-query bounded heaps.
    "q67_knn_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id IN (${RecallQueryIds.mkString(", ")}))
         |SELECT query_id, vec_id, score FROM (
         |  SELECT q.query_id, v.vec_id,
         |    round(${dotd("v.embedding", "q.qv")}, 6) AS score,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY round(${dotd("v.embedding", "q.qv")}, 6) DESC, v.vec_id) AS rn
         |  FROM embeddings v CROSS JOIN q)
         |WHERE rn <= $K
         |ORDER BY query_id, score DESC, vec_id""".stripMargin,

    // q126: hard-negative mining — q67's row_number formulation with
    // the different-label predicate and the near-dup ceiling applied
    // to the ROUNDED cosine on both engines (the 6-dp-exact literal
    // cannot sit between two engines' rounded values).
    "q126_hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |  FROM embeddings
         |  WHERE vec_id IN (${RecallQueryIds.mkString(", ")}))
         |SELECT query_id, vec_id, label, score FROM (
         |  SELECT q.query_id, v.vec_id, v.label,
         |    round(${cosine("v.embedding", "q.qv")}, 6) AS score,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY round(${cosine("v.embedding", "q.qv")}, 6) DESC, v.vec_id) AS rn
         |  FROM embeddings v CROSS JOIN q
         |  WHERE v.label <> q.qlabel
         |    AND round(${cosine("v.embedding", "q.qv")}, 6) < $NegCeiling)
         |WHERE rn <= $K
         |ORDER BY query_id, score DESC, vec_id""".stripMargin,

    // q136: graded ranking metrics — per-rank discounts round to
    // integer micro BEFORE summation (exact 64-bit DCG/IDCG), nDCG is
    // one shared-IEEE division; ln (not log2) because the ratio is
    // base-invariant and ln is the cross-engine-identical log (q34).
    "q136_rank_metrics" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |  FROM embeddings
         |  WHERE vec_id IN (${RecallQueryIds.mkString(", ")})),
         |ranked AS (
         |  SELECT query_id, qlabel, vec_id, label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, vec_id) AS rank
         |  FROM (SELECT q.query_id, q.qlabel, v.vec_id, v.label,
         |          round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |        FROM embeddings v CROSS JOIN q)),
         |topk AS (SELECT * FROM ranked WHERE rank <= $K),
         |per AS (
         |  SELECT query_id, qlabel,
         |    CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
         |    CAST(min(CASE WHEN label = qlabel THEN rank END) AS BIGINT) AS first_rel_rank,
         |    CAST(sum(CASE WHEN label = qlabel
         |                 THEN CAST(round(1000000.0 / ln(rank + 1.0)) AS BIGINT)
         |                 ELSE 0 END) AS BIGINT) AS dcg_micro
         |  FROM topk GROUP BY 1, 2),
         |sizes AS (
         |  SELECT label AS qlabel, CAST(count(*) AS BIGINT) AS n_rel_corpus
         |  FROM embeddings GROUP BY 1),
         |ideals AS (
         |  SELECT s.qlabel,
         |    CAST(sum(CASE WHEN t.i <= least($K, s.n_rel_corpus)
         |                 THEN CAST(round(1000000.0 / ln(t.i + 1.0)) AS BIGINT)
         |                 ELSE 0 END) AS BIGINT) AS idcg_micro
         |  FROM sizes s CROSS JOIN range(1, $K + 1) t(i)
         |  GROUP BY s.qlabel)
         |SELECT p.query_id, p.n_rel_at_k, p.first_rel_rank,
         |  CASE WHEN p.first_rel_rank IS NULL THEN 0
         |       ELSE 1000000 // p.first_rel_rank END AS mrr_micro,
         |  p.dcg_micro, i.idcg_micro,
         |  round(CAST(p.dcg_micro AS DOUBLE) / CAST(i.idcg_micro AS DOUBLE), 6) AS ndcg
         |FROM per p JOIN ideals i USING (qlabel)
         |ORDER BY p.query_id""".stripMargin,

    "q13_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keeper_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,

    "q14_minhash_lsh" ->
      s"""WITH $minhashCtes
         |SELECT a, b,
         |  $minhashEst AS est_jaccard
         |FROM cand
         |WHERE $minhashEst >= $MinEstJaccard
         |ORDER BY a, b""".stripMargin,

    // Semantically q14 restricted to pairs touching the delta split —
    // the SPARK side computes it incrementally (broadcast delta bands
    // into one scan of the persisted corpus index; DedupSpec pins the
    // equivalence), but the answer is batch-definable, so the oracle
    // states it directly.
    "q123_incremental_dedup" ->
      s"""WITH $minhashCtes
         |SELECT a, b,
         |  $minhashEst AS est_jaccard
         |FROM cand
         |WHERE $minhashEst >= $MinEstJaccard
         |  AND (a % $IncDeltaMod = $IncDeltaRem OR b % $IncDeltaMod = $IncDeltaRem)
         |ORDER BY a, b""".stripMargin,

    "q43_dup_clusters" ->
      s"""WITH $minhashCtes,
         |lshpairs AS MATERIALIZED (
         |  SELECT a, b FROM cand WHERE $minhashEst >= $MinEstJaccard),
         |${ccCtes()},
         |sizes AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM labeled GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
         |FROM labeled l JOIN sizes s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

    "q45_pq_encode" ->
      s"""WITH $pqCtes
         |SELECT e0.vec_id, ${(0 until PqM).map(j => s"e$j.c$j").mkString(", ")}
         |$pqEncJoin
         |ORDER BY e0.vec_id""".stripMargin,

    "q45b_pq_search" ->
      s"""WITH $pqCtes,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |$pqDtCtes
         |SELECT e0.vec_id,
         |  round($pqDtSum, 6) AS approx_dist
         |$pqEncJoin
         |$pqDtJoins
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin,

    "q48_ivfpq_search" ->
      s"""WITH $pqCtes,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |probed AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |$pqDtCtes
         |SELECT e0.vec_id,
         |  round($pqDtSum, 6) AS approx_dist
         |$pqEncJoin
         |$pqDtJoins
         |JOIN assigned a ON a.vec_id = e0.vec_id
         |JOIN probed p ON p.centroid_id = a.centroid_id
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin,

    // q82: per-cell quantization error — per-subspace error = min of
    // the SAME round-6 distance the enc CTEs rank by (min ≡ chosen
    // code's distance, tie-break-independent); row error sums exact
    // integer micro-units so accumulation order can't flip the hash.
    "q82_pq_error" ->
      s"""WITH ${(0 until PqM).map { j =>
            val lo = j * pqSub + 1
            val hi = lo + pqSub - 1
            s"""cb$j AS (
               |  SELECT vec_id // $IvfStep AS code,
               |    list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi) AS s
               |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
               |err$j AS (
               |  SELECT v.vec_id,
               |    CAST(round(min(round(${pqSubL2("v.embedding", "c.s", lo, hi)}, 6)) * 1000000) AS BIGINT) AS e$j
               |  FROM embeddings v CROSS JOIN cb$j c
               |  WHERE ${cleanEmb("v.embedding")} GROUP BY v.vec_id)""".stripMargin
          }.mkString(",\n")},
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |rowerr AS (
         |  SELECT a.centroid_id,
         |    ${(0 until PqM).map(j => s"e$j").mkString(" + ")} AS err_u
         |  FROM err0 e0 ${(1 until PqM).map(j => s"JOIN err$j e$j USING (vec_id)").mkString(" ")}
         |  JOIN assigned a ON a.vec_id = e0.vec_id)
         |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(CAST(sum(err_u) AS DOUBLE) / count(*) / 1000000, 6) AS mean_qerr,
         |  round(CAST(max(err_u) AS DOUBLE) / 1000000, 6) AS max_qerr
         |FROM rowerr GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,

    // q81: the composed serve path — q48's probe/ADC derivation with
    // the live set (label filter + tombstone exclusion) applied below
    // the shortlist cut, then an exact-L2 re-rank of the shortlist.
    "q81_serve_composed" ->
      s"""WITH $pqCtes,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |probed AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $FilterNProbe)),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |live AS (
         |  SELECT vec_id FROM embeddings
         |  WHERE label = $FilterLabel AND vec_id % $DeleteMod <> $DeleteRem),
         |$pqDtCtes,
         |short AS (
         |  SELECT e0.vec_id,
         |    round($pqDtSum, 6) AS approx_dist
         |  $pqEncJoin
         |  $pqDtJoins
         |  JOIN assigned a ON a.vec_id = e0.vec_id
         |  JOIN probed p ON p.centroid_id = a.centroid_id
         |  JOIN live l ON l.vec_id = e0.vec_id
         |  ORDER BY approx_dist, e0.vec_id LIMIT $BqShortlist)
         |SELECT v.vec_id, round(${l2sq("v.embedding", "q.qv")}, 6) AS dist
         |FROM embeddings v JOIN short s ON v.vec_id = s.vec_id, q
         |ORDER BY dist, v.vec_id LIMIT $K""".stripMargin,

    "q49_sq_encode" ->
      s"""WITH $sqCtes
         |SELECT vec_id, array_to_string($sqCodes, ',') AS codes_str
         |FROM clean, rl
         |ORDER BY vec_id""".stripMargin,

    "q49b_sq_search" ->
      s"""WITH $sqCtes,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |enc AS (SELECT vec_id, $sqCodes AS codes FROM clean, rl)
         |SELECT vec_id,
         |  round(list_sum(list_transform(list_zip(codes, mns, mxs, qv),
         |    x -> (CASE WHEN x[3] = x[2] THEN x[2]
         |          ELSE x[2] + (x[1] + 0.5) * (x[3] - x[2]) / 255.0 END) * x[4])), 6) AS score
         |FROM enc, rl, q
         |ORDER BY score DESC, vec_id LIMIT $K""".stripMargin,

    "q50_stratified_sample" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, source,
         |    ${hash60("CAST(doc_id AS VARCHAR)")} AS sample_key
         |  FROM documents)
         |SELECT doc_id, source, sample_key FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source ORDER BY sample_key, doc_id) AS rn
         |  FROM keyed) WHERE rn <= $StratumN
         |ORDER BY source, sample_key, doc_id""".stripMargin,

    "q51_outliers" ->
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id, dist FROM (
         |    SELECT vec_id, centroid_id, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |-- integer micro-units: dist is 6-dp-rounded, so dist*1e6 is
         |-- integer-valued and the mean test is exact 64-bit arithmetic
         |-- in both engines (no double-summation order dependence)
         |micro AS (
         |  SELECT vec_id, centroid_id, dist,
         |    CAST(round(dist * 1e6, 0) AS BIGINT) AS dist_micro FROM assigned),
         |stats AS (
         |  SELECT centroid_id, sum(dist_micro) AS sum_micro,
         |    count(*) AS n FROM micro GROUP BY 1)
         |SELECT m.vec_id, m.centroid_id, m.dist,
         |  CAST(CASE WHEN m.dist_micro * s.n * $OutlierDen > $OutlierNum * s.sum_micro
         |    THEN 1 ELSE 0 END AS INT) AS is_outlier
         |FROM micro m JOIN stats s USING (centroid_id)
         |ORDER BY m.vec_id""".stripMargin,

    "q52_funnel" -> {
      val stages = FunnelSteps.zipWithIndex.map { case (step, i) =>
        if (i == 0)
          s"f1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = '$step' GROUP BY 1)"
        else
          s"""f${i + 1} AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN f$i ON e.user_id = f$i.user_id
             |  WHERE e.event_type = '$step' AND e.ts > f$i.t GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val counts = FunnelSteps.zipWithIndex.map { case (step, i) =>
        s"SELECT ${i + 1} AS stage_idx, '$step' AS stage, count(*) AS n_users FROM f${i + 1}"
      }.mkString("\n  UNION ALL ")
      s"""WITH $stages,
         |counts AS (
         |  $counts)
         |SELECT stage_idx, stage, CAST(n_users AS BIGINT) AS n_users,
         |  round(CAST(n_users AS DOUBLE) /
         |    greatest(coalesce(lag(n_users) OVER (ORDER BY stage_idx), n_users), 1), 6) AS conv_rate
         |FROM counts ORDER BY stage_idx""".stripMargin
    },

    // q150: dedup-as-a-table-commit — v1 = the corpus, v2 = + exact
    // copies of every 5th doc, v3 = canonical-pick delete commit
    // (copies tombstoned; ties break to the lower id so the ORIGINALS
    // keep — v3 content == v1 content by construction).
    "q150_dedup_commit" ->
      """WITH dup AS (SELECT n_chars FROM documents WHERE doc_id % 5 = 0)
        |SELECT CAST(1 AS BIGINT) AS snapshot, 'overwrite' AS op,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
        |UNION ALL
        |SELECT 2, 'append',
        |  CAST((SELECT count(*) FROM documents) + count(*) AS BIGINT),
        |  CAST((SELECT sum(n_chars) FROM documents) + sum(n_chars) AS BIGINT)
        |FROM dup
        |UNION ALL
        |SELECT 3, 'delete', CAST(count(*) AS BIGINT),
        |  CAST(sum(n_chars) AS BIGINT) FROM documents
        |ORDER BY snapshot""".stripMargin,

    // q148: canonical-representative dedup — per normalized-content
    // group keep the best copy by the ALL-INTEGER key (stop_hits desc,
    // n_tokens desc, doc_id asc); window argmin mirrors Spark's max_by
    // over the negated-id struct.
    "q148_canonical_pick" ->
      """WITH keyed AS (
        |  SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
        |    doc_id,
        |    CAST(len(list_filter(
        |      list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
        |      t -> t IN ('the','a','and','of','to','in','is','it'))) AS BIGINT)
        |      AS stop_hits,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |ranked AS (
        |  SELECT *, count(*) OVER (PARTITION BY norm_hash) AS n_copies,
        |    row_number() OVER (PARTITION BY norm_hash
        |      ORDER BY stop_hits DESC, n_tokens DESC, doc_id ASC) AS rn
        |  FROM keyed)
        |SELECT norm_hash, CAST(n_copies AS BIGINT) AS n_copies,
        |  doc_id AS keeper_id, stop_hits AS keeper_stop_hits,
        |  n_tokens AS keeper_n_tokens
        |FROM ranked WHERE rn = 1 ORDER BY norm_hash""".stripMargin,

    "q53_normalized_dedup" ->
      """SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
        |  CAST(count(*) AS BIGINT) AS n_copies, min(doc_id) AS keeper_id
        |FROM documents GROUP BY 1 ORDER BY norm_hash""".stripMargin,

    "q54_dsir_weights" -> {
      val targets = DsirTargetSources.map(s => s"'$s'").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    CASE WHEN source IN ($targets) THEN 1 ELSE 0 END AS tgt,
         |    ${hash60("t.tok")} % $DsirBuckets AS b
         |  FROM documents, unnest(${toks()}) AS t(tok)),
         |model AS (SELECT b, count(*) AS cr, sum(tgt) AS ct FROM tok GROUP BY b),
         |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM model),
         |scoredt AS (
         |  SELECT t.doc_id,
         |    CAST(floor(ln(
         |      (CAST(m.ct + 1 AS DOUBLE) * CAST(tt.nr + $DsirBuckets AS DOUBLE)) /
         |      (CAST(m.cr + 1 AS DOUBLE) * CAST(tt.nt + $DsirBuckets AS DOUBLE)))
         |      * 1000000.0) AS BIGINT) AS lw
         |  FROM tok t JOIN model m USING (b) CROSS JOIN tot tt)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(lw) AS BIGINT) AS sum_lw_micro,
         |  CAST(floor(CAST(sum(lw) AS DOUBLE) / count(*)) AS BIGINT) AS avg_lw_micro
         |FROM scoredt GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q55_index_merge" ->
      // cents carries the same cleanEmb guard as q48/q51/q57: the Spark
      // side (Ivf.collectCentroids drop + NearestCentroid's ce.length==n
      // skip) never lets a null / off-dim / null-element stride row win
      // an assignment, so the oracle must not seed one either.
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND vec_id % $MergeMod <> $MergeRem
         |    AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist,
         |    v.vec_id % $MergeMod = $MergeRem AS is_new
         |  FROM embeddings v CROSS JOIN cents c),
         |ranked AS (
         |  SELECT vec_id, centroid_id, dist, is_new,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |  FROM scored)
         |SELECT vec_id, centroid_id, dist, is_new FROM ranked WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,

    "q56_percentiles" -> {
      val pcols = PercentileQs.map { p =>
        val r = s"((n - 1) * $p) // 100 + 1"
        s"max(CASE WHEN hi - c < $r AND $r <= hi THEN v END) AS p$p"
      }.mkString(",\n  ")
      s"""WITH pcounts AS (
         |  SELECT source, n_chars AS v, count(*) AS c FROM documents
         |  WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, v, c,
         |    sum(c) OVER (PARTITION BY source ORDER BY v) AS hi,
         |    sum(c) OVER (PARTITION BY source) AS n
         |  FROM pcounts)
         |SELECT source, CAST(max(n) AS BIGINT) AS n_values,
         |  $pcols
         |FROM cum GROUP BY source ORDER BY source""".stripMargin
    },

    "q57_ivfpq_residual" -> {
      def rSubL2(a: String, b: String, lo: Int, hi: Int) =
        s"list_sum(list_transform(list_zip(list_slice($a, $lo, $hi), $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
      val rCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        s"""rcb$j AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
           |    list_slice(r, $lo, $hi) AS s
           |  FROM resid WHERE vec_id % $IvfStep = $PqResOffset),
           |renc$j AS (
           |  SELECT vec_id, code AS c$j FROM (
           |    SELECT t.vec_id, c.code,
           |      row_number() OVER (PARTITION BY t.vec_id
           |        ORDER BY round(${rSubL2("t.r", "c.s", lo, hi)}, 6), c.code) AS rn
           |    FROM resid t CROSS JOIN rcb$j c) WHERE rn = 1),
           |rdt$j AS (
           |  SELECT qr.centroid_id, c.code, round(${rSubL2("qr.qr", "c.s", lo, hi)}, 6) AS d
           |  FROM qres qr CROSS JOIN rcb$j c)""".stripMargin
      }.mkString(",\n")
      val rEncJoins = (0 until PqM).map(j => s"JOIN renc$j e$j ON e$j.vec_id = t.vec_id").mkString(" ")
      val rDtJoins = (0 until PqM)
        .map(j => s"JOIN rdt$j ON rdt$j.centroid_id = t.centroid_id AND rdt$j.code = e$j.c$j")
        .mkString(" ")
      val rDtSum = (0 until PqM).map(j => s"rdt$j.d").mkString(" + ")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |resid AS (
         |  SELECT v.vec_id, a.centroid_id,
         |    list_transform(list_zip(CAST(v.embedding AS DOUBLE[]), c.c_emb), x -> x[1] - x[2]) AS r
         |  FROM embeddings v
         |  JOIN assigned a ON v.vec_id = a.vec_id
         |  JOIN cents c ON c.centroid_id = a.centroid_id),
         |probed AS (
         |  SELECT centroid_id, c_emb FROM (
         |    SELECT c.centroid_id, c.c_emb, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |qres AS (
         |  SELECT p.centroid_id,
         |    list_transform(list_zip(q.qv, p.c_emb), x -> x[1] - x[2]) AS qr
         |  FROM probed p, q),
         |$rCtes
         |SELECT t.vec_id, round($rDtSum, 6) AS approx_dist
         |FROM resid t
         |$rEncJoins
         |$rDtJoins
         |ORDER BY approx_dist, t.vec_id LIMIT $K""".stripMargin
    },

    "q58_multiprobe_lsh" -> {
      // Auto-sized planes (r17): p = smallest plane count in [4, 30]
      // with 2^p * MpTarget >= n — the same pure-integer comparison as
      // Dedup.autoPlanes, so both engines derive the identical p from
      // the corpus count. Hyperplane values are rebuilt in SQL from the
      // same LCG as Dedup.hyperplanes (plane index t*p+j, element i →
      // ((1664525*(idx*64+i)+1013904223) % 2^32 % 2048 - 1024)/1024),
      // exact integer arithmetic before one double division, so the
      // plane literals match the Scala doubles bitwise. Candidates =
      // Hamming<=1 bucket pairs via the probe-side unnest of
      // [exact, flip_0..flip_{p-1}].
      def planeList(t: Int) =
        s"""[((((1664525::BIGINT * (($t * p + j) * 64 + i) + 1013904223)
           |      % 4294967296) % 2048) - 1024) / 1024.0 for i in range(0, 64)]""".stripMargin
      def bucket(t: Int) =
        s"""CAST(list_sum([CASE WHEN ${dotd("embedding", planeList(t))} >= 0
           |      THEN (1::BIGINT << j) ELSE 0 END for j in range(0, p)]) AS BIGINT)""".stripMargin
      val bucketCols = (0 until MpTables)
        .map(t => s"${bucket(t)} AS b$t").mkString(",\n    ")
      val unions = (0 until MpTables).map { t =>
        val probes = s"list_concat([b$t], [xor(b$t, 1::BIGINT << j) for j in range(0, p)])"
        s"""SELECT l.vec_id AS a, r.vec_id AS b
           |  FROM (SELECT vec_id, unnest($probes) AS bk FROM bucketed) l
           |  JOIN bucketed r ON l.bk = r.b$t AND l.vec_id < r.vec_id""".stripMargin
      }.mkString("\n  UNION\n  ")
      s"""WITH params AS (
         |  SELECT coalesce(list_min(
         |      [pp for pp in range(4, 31) if (1::BIGINT << pp) * $MpTarget >= n]), 30) AS p
         |  FROM (SELECT count(*) AS n FROM embeddings)),
         |bucketed AS (
         |  SELECT vec_id, p,
         |    $bucketCols
         |  FROM embeddings, params WHERE len(embedding) = 64),
         |cand AS (
         |  $unions),
         |normed AS (
         |  SELECT vec_id, embedding, sqrt(${dotd("embedding", "embedding")}) AS nrm FROM embeddings)
         |SELECT c.a, c.b,
         |  round(${dotd("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) AS cos
         |FROM cand c
         |JOIN normed va ON va.vec_id = c.a
         |JOIN normed vb ON vb.vec_id = c.b
         |WHERE round(${dotd("va.embedding", "vb.embedding")} / (va.nrm * vb.nrm), 6) >= $CosineThreshold
         |ORDER BY a, b""".stripMargin
    },

    "q59_quality_report" -> {
      def hits(c: String, words: Seq[String]) =
        s"len(list_filter($c, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"
      s"""WITH sig AS (
         |  SELECT doc_id, lang, n_chars, ${toks()} AS t, ${toks("lower(text)")} AS lt
         |  FROM documents),
         |scoredq AS (
         |  SELECT doc_id, lang, CAST(len(t) AS INT) AS n_tokens,
         |    round(CAST(${hits("t", Seq("the", "a", "and", "of", "to", "in", "is", "it"))} AS DOUBLE)
         |      / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS stop_ratio,
         |    round(CAST(n_chars AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS mean_len,
         |    ${hits("lt", Seq("the", "and", "of", "to", "is"))} AS en,
         |    ${hits("lt", Seq("el", "la", "de", "que", "y"))} AS es,
         |    ${hits("lt", Seq("le", "la", "de", "et", "les"))} AS fr,
         |    ${hits("lt", Seq("der", "die", "und", "das", "ist"))} AS de
         |  FROM sig),
         |pred AS (
         |  SELECT doc_id, lang, n_tokens, stop_ratio, mean_len,
         |    CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
         |         WHEN de = greatest(en, es, fr, de) THEN 'de'
         |         WHEN en = greatest(en, es, fr, de) THEN 'en'
         |         WHEN es = greatest(en, es, fr, de) THEN 'es'
         |         ELSE 'fr' END AS lang_pred
         |  FROM scoredq),
         |reported AS (
         |  SELECT doc_id, n_tokens,
         |    concat_ws(',',
         |      CASE WHEN n_tokens < $QrMinTokens THEN 'too_few_tokens' END,
         |      CASE WHEN stop_ratio < $QrMinStopword THEN 'low_stopword' END,
         |      CASE WHEN mean_len > $QrMaxMeanTokenLen THEN 'long_tokens' END,
         |      CASE WHEN lang_pred <> 'und' AND lang_pred <> lang THEN 'lang_mismatch' END) AS reasons
         |  FROM pred)
         |SELECT doc_id, n_tokens, reasons, CAST(reasons = '' AS INT) AS keep
         |FROM reported ORDER BY doc_id""".stripMargin
    },

    "q160_attrition_funnel" -> {
      def hits(c: String, words: Seq[String]) =
        s"len(list_filter($c, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"
      s"""WITH sig AS (
         |  SELECT doc_id, lang, n_chars, ${toks()} AS t, ${toks("lower(text)")} AS lt
         |  FROM documents),
         |scoredq AS (
         |  SELECT doc_id, lang, CAST(len(t) AS INT) AS n_tokens,
         |    round(CAST(${hits("t", Seq("the", "a", "and", "of", "to", "in", "is", "it"))} AS DOUBLE)
         |      / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS stop_ratio,
         |    round(CAST(n_chars AS DOUBLE) / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS mean_len,
         |    ${hits("lt", Seq("the", "and", "of", "to", "is"))} AS en,
         |    ${hits("lt", Seq("el", "la", "de", "que", "y"))} AS es,
         |    ${hits("lt", Seq("le", "la", "de", "et", "les"))} AS fr,
         |    ${hits("lt", Seq("der", "die", "und", "das", "ist"))} AS de
         |  FROM sig),
         |pred AS (
         |  SELECT doc_id, lang, n_tokens, stop_ratio, mean_len,
         |    CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
         |         WHEN de = greatest(en, es, fr, de) THEN 'de'
         |         WHEN en = greatest(en, es, fr, de) THEN 'en'
         |         WHEN es = greatest(en, es, fr, de) THEN 'es'
         |         ELSE 'fr' END AS lang_pred
         |  FROM scoredq),
         |ff AS (
         |  SELECT CASE WHEN n_tokens < $QrMinTokens THEN 1
         |              WHEN stop_ratio < $QrMinStopword THEN 2
         |              WHEN mean_len > $QrMaxMeanTokenLen THEN 3
         |              WHEN lang_pred <> 'und' AND lang_pred <> lang THEN 4
         |              ELSE 0 END AS step
         |  FROM pred),
         |byrule AS (SELECT step, count(*) AS n FROM ff GROUP BY step),
         |tot AS (SELECT sum(n) AS total FROM byrule),
         |rules(step, rule) AS (VALUES (1, 'too_few_tokens'), (2, 'low_stopword'),
         |  (3, 'long_tokens'), (4, 'lang_mismatch')),
         |counts AS (
         |  SELECT r.step, r.rule, coalesce(b.n, 0) AS n
         |  FROM rules r LEFT JOIN byrule b USING (step)),
         |funnel AS (
         |  SELECT step, rule,
         |    total - coalesce(sum(n) OVER (ORDER BY step
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_in,
         |    n AS n_removed
         |  FROM counts, tot)
         |SELECT CAST(step AS INT) AS step, rule, CAST(n_in AS BIGINT) AS n_in,
         |  CAST(n_removed AS BIGINT) AS n_removed,
         |  CAST(n_in - n_removed AS BIGINT) AS n_out,
         |  round(CAST(n_removed AS DOUBLE) / CAST(greatest(n_in, 1) AS DOUBLE), 6) AS removed_share
         |FROM funnel ORDER BY step""".stripMargin
    },

    "q162_sample_index" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    ${hash60(s"(CAST(doc_id AS VARCHAR) || ':$ShuffleEpoch')")} AS skey,
         |    len(${toks()}) + 1 AS len
         |  FROM documents),
         |placed AS (
         |  SELECT doc_id,
         |    CAST(sum(len) OVER (ORDER BY skey, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len AS BIGINT) AS start,
         |    CAST(len AS BIGINT) AS len
         |  FROM base),
         |spans AS (
         |  SELECT t.example_id, p.doc_id, p.start,
         |    least(p.start + p.len, (t.example_id + 1) * $SampleSeqLen)
         |      - greatest(p.start, t.example_id * $SampleSeqLen) AS contrib
         |  FROM placed p, LATERAL unnest(generate_series(
         |    p.start // $SampleSeqLen,
         |    (p.start + p.len - 1) // $SampleSeqLen)) AS t(example_id))
         |SELECT CAST(example_id AS BIGINT) AS example_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(contrib) AS BIGINT) AS n_tokens,
         |  CAST(min_by(doc_id, start) AS BIGINT) AS start_doc,
         |  CAST(greatest(0, example_id * $SampleSeqLen - min(start)) AS BIGINT) AS start_offset
         |FROM spans GROUP BY example_id ORDER BY example_id""".stripMargin,

    "q161_fertility" ->
      s"""WITH f AS (
         |  SELECT lang, source, n_chars,
         |    len(${toks()}) AS w,
         |    len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), x -> x <> '')) AS b
         |  FROM documents)
         |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(b) AS BIGINT) AS n_subwords,
         |  round(CAST(sum(b) AS DOUBLE) / CAST(greatest(sum(w), 1) AS DOUBLE), 6) AS fertility,
         |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(greatest(sum(b), 1) AS DOUBLE), 6) AS chars_per_subword
         |FROM f GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q60_lsh_recall" ->
      s"""WITH truth AS (
         |  SELECT l.vec_id AS a, r.vec_id AS b
         |  FROM embeddings l JOIN embeddings r
         |    ON l.label = r.label AND l.vec_id < r.vec_id
         |  WHERE round(${cosine("l.embedding", "r.embedding")}, 6) >= $CosineThreshold),
         |lshp AS (SELECT a, b FROM ($cosineLshSelect)),
         |tc AS (SELECT count(*) AS n_truth FROM truth),
         |lc AS (SELECT count(*) AS n_lsh FROM lshp),
         |cc AS (SELECT count(*) AS n_common FROM truth JOIN lshp USING (a, b))
         |SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_lsh AS BIGINT) AS n_lsh,
         |  CAST(n_common AS BIGINT) AS n_common,
         |  round(CAST(n_common AS DOUBLE) / CAST(greatest(n_truth, 1) AS DOUBLE), 6) AS recall
         |FROM tc, lc, cc""".stripMargin,

    "q61_rpq_search" -> {
      // Normalized Sylvester-Hadamard rows: ±1/8 exactly (dim 64), so
      // the rotation is oracle-exact; dotd's list_sum matches the
      // codegen'd DotProduct's left-to-right accumulation.
      def hRow(i: Int) = (0 until 64)
        .map(j => if (Integer.bitCount(i & j) % 2 == 0) "0.125" else "-0.125")
        .mkString("[", ", ", "]::DOUBLE[]")
      def rotExprs(src: String) = (0 until 64)
        .map(i => dotd(src, hRow(i))).mkString(",\n      ")
      val rCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        def sub(a: String, b: String) =
          s"list_sum(list_transform(list_zip(list_slice($a, $lo, $hi), $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
        s"""hcb$j AS (
           |  SELECT vec_id // $IvfStep AS code, list_slice(r, $lo, $hi) AS s
           |  FROM rot WHERE vec_id % $IvfStep = 0),
           |henc$j AS (
           |  SELECT vec_id, code AS c$j FROM (
           |    SELECT t.vec_id, c.code,
           |      row_number() OVER (PARTITION BY t.vec_id
           |        ORDER BY round(${sub("t.r", "c.s")}, 6), c.code) AS rn
           |    FROM rot t CROSS JOIN hcb$j c) WHERE rn = 1),
           |hdt$j AS (
           |  SELECT c.code, round(${sub("q.qr", "c.s")}, 6) AS d
           |  FROM q CROSS JOIN hcb$j c)""".stripMargin
      }.mkString(",\n")
      val encJoins = (0 until PqM).map(j => s"JOIN henc$j e$j ON e$j.vec_id = e0.vec_id")
        .drop(1).mkString(" ")
      val dtJoins = (0 until PqM).map(j => s"JOIN hdt$j ON hdt$j.code = e$j.c$j").mkString(" ")
      val dtSum = (0 until PqM).map(j => s"hdt$j.d").mkString(" + ")
      s"""WITH rot AS (
         |  SELECT vec_id, [
         |      ${rotExprs("embedding")}] AS r
         |  FROM embeddings WHERE ${cleanEmb("embedding")}),
         |q AS (
         |  SELECT [
         |      ${rotExprs("embedding")}] AS qr
         |  FROM embeddings WHERE vec_id = $QueryVecId),
         |$rCtes
         |SELECT e0.vec_id, round($dtSum, 6) AS approx_dist
         |FROM henc0 e0
         |$encJoins
         |$dtJoins
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin
    },

    "q62_ann_recall" -> {
      // The batched serving paths' SQL mirror: per-query ADC lookup
      // LISTS (qdt$j = Spark's literal dist tables, indexed by code —
      // NOT a per-subspace join fan: a first formulation joined 8 enc
      // and 8 bdt relations in one SELECT and DuckDB's join-order
      // search ground >19 min at sf0.1; list indexing over a cross
      // join of 2 bounded tables cannot explode), per-query row_number
      // top-k everywhere Spark runs GroupedTopK, the same cb$j/enc$j
      // encode blocks as q45/q48, and q48's cents/probed/assigned
      // shapes lifted to the query panel. Truths mirror q12's dot
      // ranking and the PQ family's L2 ranking. List position c+1 ==
      // code c relies on contiguous stride codes — the same
      // vec_id/step==rank coincidence the Spark codebooks document on
      // the oracle corpus (the join formulation in q45b/q48 stays the
      // gap-robust reference). Multiply-referenced CTEs are
      // MATERIALIZED so DuckDB cannot re-inline the window scans.
      val qidList = RecallQueryIds.mkString(", ")
      val qdtCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        s"qdt$j AS MATERIALIZED (SELECT q.query_id, list(round(${pqSubL2("q.qv", "c.s", lo, hi)}, 6) ORDER BY c.code) AS ds$j FROM qset q CROSS JOIN cb$j c GROUP BY q.query_id)"
      }.mkString(",\n")
      val qdtJoins = (1 until PqM).map(j => s"JOIN qdt$j USING (query_id)").mkString(" ")
      val encJoins = (1 until PqM).map(j => s"JOIN enc$j e$j USING (vec_id)").mkString(" ")
      val encCols = (0 until PqM).map(j => s"e$j.c$j").mkString(", ")
      val listSum = (0 until PqM).map(j => s"t.ds$j[en.c$j + 1]").mkString(" + ")
      s"""WITH $pqCtes,
         |qset AS MATERIALIZED (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id IN ($qidList)),
         |truth_dot AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, v.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${dotd("v.embedding", "q.qv")}, 6) DESC, v.vec_id) AS rn
         |    FROM embeddings v CROSS JOIN qset q) WHERE rn <= $K),
         |truth_l2 AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, v.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${l2sq("v.embedding", "q.qv")}, 6), v.vec_id) AS rn
         |    FROM embeddings v CROSS JOIN qset q) WHERE rn <= $K),
         |cents AS MATERIALIZED (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |probed AS MATERIALIZED (
         |  SELECT query_id, centroid_id FROM (
         |    SELECT q.query_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${l2sq("c.c_emb", "q.qv")}, 6), c.centroid_id) AS rn
         |    FROM cents c CROSS JOIN qset q) WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS MATERIALIZED (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |ivf_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, a.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY round(${dotd("v.embedding", "q.qv")}, 6) DESC, a.vec_id) AS rn
         |    FROM assigned a
         |    JOIN probed p ON p.centroid_id = a.centroid_id
         |    JOIN embeddings v ON v.vec_id = a.vec_id
         |    JOIN qset q ON q.query_id = p.query_id) WHERE rn <= $K),
         |$qdtCtes,
         |qdts AS MATERIALIZED (
         |  SELECT * FROM qdt0 $qdtJoins),
         |encoded AS MATERIALIZED (
         |  SELECT e0.vec_id, $encCols
         |  FROM enc0 e0 $encJoins),
         |adc_scored AS MATERIALIZED (
         |  SELECT t.query_id, en.vec_id, round($listSum, 6) AS dist
         |  FROM encoded en CROSS JOIN qdts t),
         |adc_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |    FROM adc_scored) WHERE rn <= $K),
         |ivfpq_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT s.query_id, s.vec_id,
         |      row_number() OVER (PARTITION BY s.query_id ORDER BY s.dist, s.vec_id) AS rn
         |    FROM adc_scored s
         |    JOIN assigned a ON a.vec_id = s.vec_id
         |    JOIN probed p ON p.query_id = s.query_id AND p.centroid_id = a.centroid_id)
         |  WHERE rn <= $K),
         |per_method AS (
         |  SELECT 'ivf' AS method, query_id, count(*) AS n
         |  FROM ivf_res JOIN truth_dot USING (query_id, vec_id) GROUP BY query_id
         |  UNION ALL
         |  SELECT 'pq_adc', query_id, count(*)
         |  FROM adc_res JOIN truth_l2 USING (query_id, vec_id) GROUP BY query_id
         |  UNION ALL
         |  SELECT 'ivfpq', query_id, count(*)
         |  FROM ivfpq_res JOIN truth_l2 USING (query_id, vec_id) GROUP BY query_id),
         |grid AS (
         |  SELECT query_id, method FROM qset
         |  CROSS JOIN (SELECT unnest(['ivf', 'ivfpq', 'pq_adc']) AS method))
         |SELECT g.query_id, g.method,
         |  CAST(coalesce(p.n, 0) AS BIGINT) AS n_hits,
         |  round(CAST(coalesce(p.n, 0) AS DOUBLE) / $K, 6) AS recall
         |FROM grid g LEFT JOIN per_method p
         |  ON p.query_id = g.query_id AND p.method = g.method
         |ORDER BY g.query_id, g.method""".stripMargin
    },

    "q63_cell_balance" ->
      // q09's cents/scored/assigned shapes reduced to occupancy stats;
      // avg and skew are double divisions of exact integer counts,
      // identical expression trees both sides (a*b/c left-associated)
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |percell AS (SELECT centroid_id, count(*) AS n FROM assigned GROUP BY 1),
         |s AS (SELECT count(*) AS n_nonempty, sum(n) AS n_vectors,
         |        min(n) AS min_cell, max(n) AS max_cell FROM percell),
         |c AS (SELECT count(*) AS n_cells FROM cents),
         |t AS (SELECT count(*) AS n_total FROM embeddings)
         |SELECT CAST(n_cells AS BIGINT) AS n_cells,
         |  CAST(n_vectors AS BIGINT) AS n_vectors,
         |  CAST(n_total - n_vectors AS BIGINT) AS n_unassigned,
         |  CAST(n_cells - n_nonempty AS BIGINT) AS n_empty,
         |  CAST(min_cell AS BIGINT) AS min_cell,
         |  CAST(max_cell AS BIGINT) AS max_cell,
         |  round(CAST(n_vectors AS DOUBLE) / CAST(n_nonempty AS DOUBLE), 6) AS avg_cell,
         |  round(CAST(max_cell AS DOUBLE) * CAST(n_nonempty AS DOUBLE)
         |    / CAST(n_vectors AS DOUBLE), 6) AS skew
         |FROM s, c, t""".stripMargin,

    // q64: Hamming distance from the UNPACKED sign vectors — the sign
    // predicate x > 0 is exact in both engines (no accumulation, no
    // rounding), so this must equal Spark's popcount-over-packed-words
    // integer row for row. cleanEmb mirrors Bq.encode's drop rule.
    "q64_bq_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT v.vec_id,
         |  CAST(list_sum(list_transform(list_zip(v.embedding, q.qv),
         |    x -> CAST((x[1] > 0) <> (x[2] > 0) AS INT))) AS BIGINT) AS hamming
         |FROM embeddings v, q
         |WHERE ${cleanEmb("v.embedding")}
         |ORDER BY hamming, v.vec_id LIMIT $K""".stripMargin,

    // q64b: the two-stage serve — Hamming shortlist (same tie-break as
    // q64), exact-dot re-rank of only those rows.
    "q64b_bq_rerank" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cand AS (
         |  SELECT v.vec_id FROM embeddings v, q
         |  WHERE ${cleanEmb("v.embedding")}
         |  ORDER BY list_sum(list_transform(list_zip(v.embedding, q.qv),
         |    x -> CAST((x[1] > 0) <> (x[2] > 0) AS INT))), v.vec_id
         |  LIMIT $BqShortlist)
         |SELECT v.vec_id, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM cand c JOIN embeddings v ON v.vec_id = c.vec_id, q
         |ORDER BY score DESC, v.vec_id LIMIT $K""".stripMargin,

    // q65: exact filtered search — the predicate composes under the
    // scorer, nothing else changes.
    "q65_filtered_knn" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
         |SELECT v.vec_id, v.label, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM embeddings v, q
         |WHERE v.label = $FilterLabel
         |ORDER BY score DESC, vec_id LIMIT $K""".stripMargin,

    // q65b: filtered IVF = q12c's probe geometry (centroids and probe
    // set from the FULL corpus) with the predicate applied to the
    // assigned rows — the pre-filter semantics of
    // Ivf.searchInlineFiltered. cleanEmb mirrors the assignable drop.
    "q65b_filtered_ivf" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |probed AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $FilterNProbe)),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT v.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${l2sq("v.embedding", "c.c_emb")}, 6), c.centroid_id) AS rn
         |    FROM embeddings v CROSS JOIN cents c
         |    WHERE v.label = $FilterLabel AND ${cleanEmb("v.embedding")}) WHERE rn = 1)
         |SELECT v.vec_id, round(${dotd("v.embedding", "q.qv")}, 6) AS score
         |FROM assigned a
         |JOIN probed p ON a.centroid_id = p.centroid_id
         |JOIN embeddings v ON v.vec_id = a.vec_id, q
         |ORDER BY score DESC, v.vec_id LIMIT $K""".stripMargin,

    // q159: exact-substring repeat report — every-offset L-token
    // windows, duplicated = hash at ≥2 sites corpus-wide, per-doc
    // coverage via island-merged hit intervals (running-max window,
    // same pattern as the Spark side step for step).
    "q159_repeated_substrings" ->
      s"""WITH base AS (
         |  SELECT doc_id, len(ts) AS n_tokens, ts
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents)
         |  WHERE len(ts) > 0),
         |wins AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    ${hash60(s"array_to_string(list_slice(ts, i, i + $RepeatWindow - 1), ' ')")} AS h
         |  FROM base, unnest(range(1, len(ts) - $RepeatWindow + 2)) AS r(i)),
         |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
         |hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN duph USING (h)),
         |isl0 AS (
         |  SELECT doc_id, pos,
         |    max(pos + $RepeatWindow - 1) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM hits),
         |isl AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl0),
         |agg AS (
         |  SELECT doc_id, island, min(pos) AS s, max(pos) + $RepeatWindow - 1 AS e,
         |    count(*) AS nw
         |  FROM isl GROUP BY 1, 2),
         |perdoc AS (
         |  SELECT doc_id, sum(e - s + 1) AS covered, sum(nw) AS n_dup_windows,
         |    count(*) AS n_islands
         |  FROM agg GROUP BY 1)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(p.covered, 0) AS BIGINT) AS covered_tokens,
         |  CAST(coalesce(p.n_islands, 0) AS BIGINT) AS n_islands,
         |  round(CAST(coalesce(p.covered, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE), 6) AS dup_frac
         |FROM base b LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,

    // q164 is the SUFFIX-ARRAY computation of the same answer (see
    // SuffixArray.scala's object doc for the equality proof at
    // minLen == window): the oracle states WHAT — the windowed mirror —
    // and hash-checking it against the prefix-doubling + LCP pipeline
    // is exactly the point.
    "q164_exactsubstr_coverage" ->
      s"""WITH base AS (
         |  SELECT doc_id, len(ts) AS n_tokens, ts
         |  FROM (SELECT doc_id, ${toks()} AS ts FROM documents)
         |  WHERE len(ts) > 0),
         |wins AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    ${hash60(s"array_to_string(list_slice(ts, i, i + $RepeatWindow - 1), ' ')")} AS h
         |  FROM base, unnest(range(1, len(ts) - $RepeatWindow + 2)) AS r(i)),
         |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
         |hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN duph USING (h)),
         |isl0 AS (
         |  SELECT doc_id, pos,
         |    max(pos + $RepeatWindow - 1) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM hits),
         |isl AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl0),
         |agg AS (
         |  SELECT doc_id, island, min(pos) AS s, max(pos) + $RepeatWindow - 1 AS e,
         |    count(*) AS nw
         |  FROM isl GROUP BY 1, 2),
         |perdoc AS (
         |  SELECT doc_id, sum(e - s + 1) AS covered, sum(nw) AS n_dup_windows,
         |    count(*) AS n_islands
         |  FROM agg GROUP BY 1)
         |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
         |  CAST(coalesce(p.covered, 0) AS BIGINT) AS covered_tokens,
         |  CAST(coalesce(p.n_islands, 0) AS BIGINT) AS n_islands,
         |  round(CAST(coalesce(p.covered, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE), 6) AS dup_frac
         |FROM base b LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,

    "q46_span_dedup" ->
      s"""WITH sized AS (
         |  SELECT doc_id, ts FROM (SELECT doc_id, ${toks()} AS ts FROM documents)
         |  WHERE len(ts) > 0),
         |spans AS (
         |  SELECT doc_id, CAST(i AS INT) AS span_idx,
         |    array_to_string(list_slice(ts, CAST(i * $SpanTokens + 1 AS INT), CAST(i * $SpanTokens + $SpanTokens AS INT)), ' ') AS span
         |  FROM (SELECT doc_id, ts,
         |          unnest(range(0, CAST(ceil(len(ts) / CAST($SpanTokens AS DOUBLE)) AS BIGINT))) AS i
         |        FROM sized)),
         |hashed AS (
         |  SELECT doc_id, span_idx, span, ${hash60("span")} AS h,
         |    doc_id * 1048576 + span_idx AS okey
         |  FROM spans),
         |firsts AS (SELECT h, min(okey) AS first_okey FROM hashed GROUP BY h)
         |SELECT s.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN s.okey <> f.first_okey THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN s.okey = f.first_okey THEN s.span END, ' ' ORDER BY s.span_idx), '') AS clean_text
         |FROM hashed s JOIN firsts f USING (h)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // q127: frequency-threshold boilerplate removal — q46's span CTE
    // with the verdict flipped from first-occurrence-survives to
    // every-occurrence-of-a-common-span-removed (document-frequency
    // gate over DISTINCT doc_ids).
    "q127_boilerplate" ->
      s"""WITH sized AS (
         |  SELECT doc_id, ts FROM (SELECT doc_id, ${toks()} AS ts FROM documents)
         |  WHERE len(ts) > 0),
         |spans AS (
         |  SELECT doc_id, CAST(i AS INT) AS span_idx,
         |    array_to_string(list_slice(ts, CAST(i * $SpanTokens + 1 AS INT), CAST(i * $SpanTokens + $SpanTokens AS INT)), ' ') AS span
         |  FROM (SELECT doc_id, ts,
         |          unnest(range(0, CAST(ceil(len(ts) / CAST($SpanTokens AS DOUBLE)) AS BIGINT))) AS i
         |        FROM sized)),
         |hashed AS (
         |  SELECT doc_id, span_idx, span, ${hash60("span")} AS h
         |  FROM spans),
         |common AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS nd FROM hashed GROUP BY h)
         |  WHERE nd >= $BoilerMinDocs)
         |SELECT s.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN c.h IS NULL THEN s.span END, ' ' ORDER BY s.span_idx), '') AS clean_text
         |FROM hashed s LEFT JOIN common c ON s.h = c.h
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // q137: data-quality constraint suite — each check's violation
    // count stated directly; the regex mirrors java rlike via DuckDB
    // regexp_matches (both are unanchored-match-with-anchors-in-
    // pattern engines for this pattern class).
    "q137_quality_constraints" ->
      s"""SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
         |  SELECT 'not_null(doc_id)' AS check_name,
         |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
         |  FROM documents
         |  UNION ALL
         |  SELECT 'non_negative(n_chars)',
         |    CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'range(n_chars,1,400)',
         |    CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 1 OR n_chars > 400
         |                 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'in_set(lang)',
         |    CAST(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 0 ELSE 1 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'not_null(text)',
         |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'matches(source)',
         |    CAST(sum(CASE WHEN source IS NOT NULL AND regexp_matches(source, '^src[0-9]+$$')
         |                 THEN 0 ELSE 1 END) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 'unique(doc_id)',
         |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM (SELECT doc_id, count(*) AS c FROM documents GROUP BY doc_id)
         |  UNION ALL
         |  SELECT 'ref(user_id)',
         |    CAST(count(*) AS BIGINT)
         |  FROM events e
         |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
         |ORDER BY check_name""".stripMargin,

    // q138: native session_window == the lag/cumsum islands (Spark's
    // session merge is inclusive on the window close, so duration =
    // gap splits at exactly diff > gap); session_end = last ts + gap.
    "q138_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR date_diff('second', lag(ts) OVER w, ts) > ${SessionGapMin * 60}
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS seq
         |  FROM marked)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  strftime(max(ts) + INTERVAL ${SessionGapMin * 60} SECOND,
         |    '%Y-%m-%d %H:%M:%S') AS session_end,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  round(sum(value), 6) AS sum_value
         |FROM sess GROUP BY user_id, seq
         |ORDER BY user_id, session_start""".stripMargin,

    // q134: CDC between the full table (v2) and its CoW merge (v3) —
    // the oracle states the expected change feed directly: one
    // delete(old)/insert(new) pair per changed doc, nothing else.
    "q134_snapshot_diff" ->
      s"""SELECT doc_id, 'delete' AS change, source, n_chars
         |FROM documents WHERE doc_id % $UpsertChangeMod = 0
         |UNION ALL
         |SELECT doc_id, 'insert', source, n_chars + 1000
         |FROM documents WHERE doc_id % $UpsertChangeMod = 0
         |ORDER BY doc_id, change""".stripMargin,

    // q133: incremental MV refresh must equal the full-table summary —
    // the oracle states the recomputed answer; the Spark side builds
    // the snapshot chain and merges v1's summary with v2's delta only.
    "q133_mv_refresh" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         |  (CAST(sum(n_chars) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
         |    AS mean_chars_micro
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // q130: snapshot chain (v1 = non-delta load, v2 = +delta append,
    // v3 = CoW merge of the q92 change rule) — the oracle states each
    // snapshot's content directly over the documents table; the Spark
    // side must reproduce it by actually committing and time-travel
    // reading the manifests.
    // q147: merge-on-read lifecycle — each snapshot's LOGICAL content
    // stated from the base table (v1 all; v2 minus the tombstoned
    // slice; v3 plus the re-appended even half at +5000; v4 = v3, the
    // compaction-is-content-preserving claim).
    "q147_mor_delete" -> {
      val dels = s"doc_id % $MorDelMod = $MorDelRem"
      s"""WITH v2 AS (SELECT doc_id, n_chars FROM documents WHERE NOT ($dels)),
         |v3 AS (SELECT doc_id, n_chars FROM v2
         |       UNION ALL
         |       SELECT doc_id, n_chars + 5000 FROM documents
         |       WHERE ($dels) AND doc_id % 2 = 0)
         |SELECT CAST(1 AS BIGINT) AS snapshot, 'overwrite' AS op,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
         |UNION ALL
         |SELECT 2, 'delete', CAST(count(*) AS BIGINT),
         |  CAST(sum(n_chars) AS BIGINT) FROM v2
         |UNION ALL
         |SELECT 3, 'append', CAST(count(*) AS BIGINT),
         |  CAST(sum(n_chars) AS BIGINT) FROM v3
         |UNION ALL
         |SELECT 4, 'compact', CAST(count(*) AS BIGINT),
         |  CAST(sum(n_chars) AS BIGINT) FROM v3
         |ORDER BY snapshot""".stripMargin
    },

    "q130_time_travel" ->
      s"""SELECT CAST(1 AS BIGINT) AS snapshot, 'overwrite' AS op,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents WHERE doc_id % $IncDeltaMod <> $IncDeltaRem
         |UNION ALL
         |SELECT 2, 'append', CAST(count(*) AS BIGINT),
         |  CAST(sum(n_chars) AS BIGINT)
         |FROM documents
         |UNION ALL
         |SELECT 3, 'overwrite', CAST(count(*) AS BIGINT),
         |  CAST(sum(CASE WHEN doc_id % $UpsertChangeMod = 0
         |               THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
         |FROM documents
         |ORDER BY snapshot""".stripMargin,

    // q129: one-pass Poisson bootstrap — weights from the SAME 60-bit
    // hash and the SAME inverse-CDF double thresholds as the Spark
    // side (Profile.PoissonCum; Double.toString round-trips), all sums
    // cast to BIGINT before the integer-micro floor division (DuckDB
    // sums BIGINT into HUGEINT).
    "q129_bootstrap_ci" -> {
      val reps = BootstrapReps
      val cum = graft.operators.Profile.PoissonCum
      val uCols = (0 until reps).map { i =>
        s"(${hash60(s"CAST(doc_id AS VARCHAR) || ':$i'")}) / 1152921504606846976.0 AS u$i"
      }.mkString(",\n    ")
      val wCols = (0 until reps).map { i =>
        val whens = cum.zipWithIndex
          .map { case (c, k) => s"WHEN u$i < $c THEN $k" }.mkString(" ")
        s"CASE $whens ELSE ${cum.size} END AS w$i"
      }.mkString(",\n    ")
      val sums = (0 until reps).map { i =>
        s"CAST(sum(w$i * n_chars) AS BIGINT) AS swx$i, CAST(sum(w$i) AS BIGINT) AS sw$i"
      }.mkString(",\n    ")
      val means = (0 until reps).map(i => s"((swx$i * 1000000) // sw$i)")
      s"""WITH u AS (
         |  SELECT source, n_chars,
         |    ${uCols}
         |  FROM documents),
         |w AS (
         |  SELECT source, n_chars,
         |    ${wCols}
         |  FROM u),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS sx,
         |    ${sums}
         |  FROM w GROUP BY source)
         |SELECT source, n_docs,
         |  (sx * 1000000) // n_docs AS mean_chars_micro,
         |  least(${means.mkString(", ")}) AS boot_lo_micro,
         |  greatest(${means.mkString(", ")}) AS boot_hi_micro
         |FROM g
         |WHERE ${(0 until reps).map(i => s"sw$i > 0").mkString(" AND ")}
         |ORDER BY source""".stripMargin
    },

    "q47_profile" -> {
      val per = ProfileCols.map { c =>
        s"""  SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |    CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |    CAST(min($c) AS VARCHAR) AS min_val,
           |    CAST(max($c) AS VARCHAR) AS max_val
           |  FROM documents""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""SELECT * FROM (
         |$per
         |) ORDER BY "column"""".stripMargin
    },

    "q44_semdedup" ->
      s"""WITH cents AS (
         |  -- cleanEmb guards: same drop semantics as Ivf.assignable (see pqCtes note)
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |normed AS (
         |  SELECT a.vec_id, a.centroid_id, e.embedding,
         |    sqrt(${dotd("e.embedding", "e.embedding")}) AS nrm
         |  FROM assigned a JOIN embeddings e USING (vec_id)),
         |dropped AS (
         |  SELECT DISTINCT r.vec_id
         |  FROM normed l JOIN normed r
         |    ON l.centroid_id = r.centroid_id AND l.vec_id < r.vec_id
         |  WHERE round(${dotd("l.embedding", "r.embedding")} / (l.nrm * r.nrm), 6) >= $SemDedupCos)
         |SELECT n.vec_id, n.centroid_id,
         |  CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS dropped
         |FROM normed n LEFT JOIN dropped d ON n.vec_id = d.vec_id
         |ORDER BY n.vec_id""".stripMargin,

    "q14b_simhash" -> {
      val bits = 32
      val votes = (0 until bits)
        .map(i => s"CAST(sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$i")
        .mkString(",\n    ")
      val combine = (0 until bits)
        .map(i => s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH tok AS (
         |  SELECT doc_id, ${hash60("t.tok")} AS h
         |  FROM documents, unnest(${toks()}) AS t(tok)),
         |votes AS (
         |  SELECT doc_id,
         |    $votes
         |  FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($combine AS BIGINT) AS simhash
         |FROM votes ORDER BY doc_id""".stripMargin
    },

    "q14c_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, lang, source, ${shingles()} AS sh FROM documents),
         |pairs AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b,
         |    CAST(len(list_intersect(l.sh, r.sh)) AS INT) AS inter,
         |    CAST(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS INT) AS uni
         |  FROM sh l JOIN sh r
         |    ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id)
         |SELECT a, b, round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard
         |FROM pairs WHERE uni > 0 AND round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) > 0.0
         |ORDER BY a, b""".stripMargin,

    // q157: directed shingle containment (Broder's containment; the
    // asymmetric complement of q14c). Same blocked pair generator, both
    // per-side ratios rounded BEFORE the greatest() threshold, exactly
    // as the Spark side rounds before filtering.
    "q157_containment_pairs" ->
      s"""WITH sh AS (SELECT doc_id, lang, source, ${shingles()} AS sh FROM documents),
         |pairs AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b,
         |    CAST(len(list_intersect(l.sh, r.sh)) AS INT) AS inter,
         |    CAST(len(l.sh) AS INT) AS n_a, CAST(len(r.sh) AS INT) AS n_b
         |  FROM sh l JOIN sh r
         |    ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id)
         |SELECT a, b,
         |  round(CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS containment_a,
         |  round(CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS containment_b
         |FROM pairs
         |WHERE n_a > 0 AND n_b > 0 AND greatest(
         |    round(CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE), 6),
         |    round(CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE), 6)) >= $MinContainment
         |ORDER BY a, b""".stripMargin,

    // q156: cluster-balanced sample — q09's assignment CTE verbatim,
    // then a per-cell row_number cap ordered by the 60-bit md5 of the
    // vec_id (Dedup.hash60), tie-broken by vec_id.
    "q156_cluster_sample" ->
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c),
         |ranked AS (
         |  SELECT vec_id, centroid_id, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |  FROM scored),
         |assigned AS (SELECT vec_id, centroid_id, dist FROM ranked WHERE rn = 1),
         |keyed AS (
         |  SELECT vec_id, centroid_id, dist,
         |    ${hash60("CAST(vec_id AS VARCHAR)")} AS rk
         |  FROM assigned),
         |capped AS (
         |  SELECT centroid_id, vec_id, dist,
         |    row_number() OVER (PARTITION BY centroid_id ORDER BY rk, vec_id) AS rn2
         |  FROM keyed)
         |SELECT centroid_id, vec_id, dist FROM capped WHERE rn2 <= $CellCap
         |ORDER BY centroid_id, vec_id""".stripMargin,

    "q15_cosine_pairs" ->
      s"""SELECT l.vec_id AS a, r.vec_id AS b, l.label AS label,
         |  round(${cosine("l.embedding", "r.embedding")}, 6) AS cos
         |FROM embeddings l JOIN embeddings r
         |  ON l.label = r.label AND l.vec_id < r.vec_id
         |WHERE round(${cosine("l.embedding", "r.embedding")}, 6) >= $CosineThreshold
         |ORDER BY a, b""".stripMargin,

    "q15b_cosine_lsh" -> cosineLshSelect,

    "q39_embedding_contam" ->
      s"""WITH pairs AS ($cosineLshSelect),
         |tagged AS (
         |  SELECT a, b, cos,
         |    CASE WHEN ${hash60("CAST(a AS VARCHAR)")} % 100 < $TrainPct THEN 'train' ELSE 'eval' END AS sa,
         |    CASE WHEN ${hash60("CAST(b AS VARCHAR)")} % 100 < $TrainPct THEN 'train' ELSE 'eval' END AS sb
         |  FROM pairs)
         |SELECT CASE WHEN sa = 'eval' THEN a ELSE b END AS eval_id,
         |  CAST(count(*) AS BIGINT) AS n_train_matches,
         |  max(cos) AS max_cos
         |FROM tagged WHERE sa <> sb
         |GROUP BY 1 ORDER BY eval_id""".stripMargin,

    "q40_tfidf_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${toks()}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term, tf,
         |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
         |  FROM scored)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf
         |FROM ranked WHERE rn <= $TfidfK
         |ORDER BY doc_id, tfidf DESC, term""".stripMargin,

    "q16_quality_score" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(len(${toks()}) AS INT) AS n_tokens,
         |  round(CAST(len(list_filter(regexp_extract_all(text, '[.,;:!?]'), x -> x <> '')) AS DOUBLE)
         |    / CAST(greatest(len(${toks()}), 1) AS DOUBLE), 6) AS punct_ratio,
         |  round(CAST(len(list_filter(${toks()}, t -> t IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
         |    / CAST(greatest(len(${toks()}), 1) AS DOUBLE), 6) AS stopword_ratio,
         |  round(CAST(n_chars AS DOUBLE) / CAST(greatest(len(${toks()}), 1) AS DOUBLE), 6) AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q16b_lang_id" -> {
      def hits(words: Seq[String]) =
        s"len(list_filter(${toks("lower(text)")}, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
      val en = hits(Seq("the", "and", "of", "to", "is"))
      val es = hits(Seq("el", "la", "de", "que", "y"))
      val fr = hits(Seq("le", "la", "de", "et", "les"))
      val de = hits(Seq("der", "die", "und", "das", "ist"))
      s"""WITH scoredl AS (
         |  SELECT doc_id, lang, $en AS en, $es AS es, $fr AS fr, $de AS de
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
         |       WHEN de = greatest(en, es, fr, de) THEN 'de'
         |       WHEN en = greatest(en, es, fr, de) THEN 'en'
         |       WHEN es = greatest(en, es, fr, de) THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM scoredl ORDER BY doc_id""".stripMargin
    },

    "q16c_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(${toks()}, t -> ${hash60("t")} % $P)),
         |    (acc, x) -> (acc * 31 + x) % $P) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    // value sums in exact cents-longs (the q103 c_acctbal pattern):
    // raw double sums diverged from Spark's partial-agg order past the
    // 6-dp hash once sf1 made the hourly groups 10× deeper. The avg is
    // integer HALF-UP micro-units ((2a + b) // (2b)) — a double
    // quotient disagreed at an exact 6-dp tie (13911.3/320).
    // q132: RANGE-frame trailing window over the daily pre-aggregate —
    // the frame slides over the integer day NUMBER (gap-aware: absent
    // days contribute nothing), cents-long sums, integer-micro average
    // over PRESENT days.
    "q132_moving_revenue" ->
      s"""WITH daily0 AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
         |daily AS (
         |  SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num
         |  FROM daily0),
         |w AS (
         |  SELECT event_type, day, cents,
         |    CAST(sum(cents) OVER win AS BIGINT) AS win_cents,
         |    CAST(count(*) OVER win AS BIGINT) AS win_days
         |  FROM daily
         |  WINDOW win AS (PARTITION BY event_type ORDER BY day_num
         |    RANGE BETWEEN ${MovingDays - 1} PRECEDING AND CURRENT ROW))
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
         |  round(CAST(cents AS DOUBLE) / 100, 6) AS day_value,
         |  round(CAST(win_cents AS DOUBLE) / 100, 6) AS win_value,
         |  win_days,
         |  CAST(CAST((win_cents * 10000) // win_days AS BIGINT) AS DOUBLE)
         |    / 1000000 AS avg_day_value
         |FROM w ORDER BY event_type, day""".stripMargin,

    "q17_events_rollup" ->
      """WITH agg AS (
        |  SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hour, n_events,
        |  round(CAST(cents AS DOUBLE) / 100, 6) AS sum_value,
        |  CAST(CAST((2 * cents * 10000 + n_events) // (2 * n_events) AS BIGINT) AS DOUBLE)
        |    / 1000000 AS avg_value,
        |  n_users
        |FROM agg ORDER BY event_type, hour""".stripMargin,

    "q17b_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, value, ts,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, value, ts,
         |    CASE WHEN prev_ts IS NULL
         |           OR date_diff('second', prev_ts, ts) > ${SessionGapMin * 60} THEN 1
         |         ELSE 0 END AS new_session
         |  FROM marked),
         |sess AS (
         |  SELECT user_id, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_seq
         |  FROM flagged)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS sum_value
         |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "q19_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |views AS (
        |  SELECT user_id, ts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  round(p.value, 6) AS value,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |  round(v.view_value, 6) AS view_value,
        |  date_diff('second', v.ts, p.ts) AS secs_since_view
        |FROM purchases p
        |ASOF JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY event_id""".stripMargin,

    "q20_pricing_summary" ->
      """WITH priced AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS DECIMAL(12,2)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS disc_price,
        |    CAST(l_tax AS DECIMAL(12,2)) AS tax
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'),
        |charged AS (
        |  SELECT *, disc_price * (CAST(1 AS DECIMAL(12,2)) + tax) AS charge FROM priced),
        |aggd AS (
        |  SELECT l_returnflag, l_linestatus,
        |    round(CAST(sum(qty) AS DOUBLE), 6) AS sum_qty,
        |    round(CAST(sum(price) AS DOUBLE), 6) AS sum_base_price,
        |    round(CAST(sum(disc_price) AS DOUBLE), 6) AS sum_disc_price,
        |    round(CAST(sum(charge) AS DOUBLE), 6) AS sum_charge,
        |    CAST(count(*) AS BIGINT) AS count_order
        |  FROM charged GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
        |  sum_charge, count_order,
        |  round(sum_qty / count_order, 6) AS avg_qty,
        |  round(sum_base_price / count_order, 6) AS avg_price
        |FROM aggd ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q21_revenue_by_nation" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q22_top_docs_per_group" ->
      s"""SELECT lang, source, rnk, doc_id, n_chars FROM (
         |  SELECT lang, source, doc_id, n_chars,
         |    CAST(row_number() OVER (PARTITION BY lang, source
         |      ORDER BY n_chars DESC, doc_id) AS INT) AS rnk
         |  FROM documents)
         |WHERE rnk <= $TopKPerGroup ORDER BY lang, source, rnk""".stripMargin,

    "q23_length_histogram" ->
      s"""SELECT lang, CAST(floor(n_chars / $HistWidth) * $HistWidth AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "q24_running_value" ->
      """SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  round(value, 6) AS value,
        |  round(sum(value) OVER w_cum, 6) AS cum_value,
        |  round(avg(value) OVER w_3, 6) AS avg3_value
        |FROM events
        |WINDOW
        |  w_cum AS (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q25_doc_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang, source""".stripMargin,

    "q26_props_stats" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q28_corpus_prep" -> {
      val numBands = NumHashes / RowsPerBand
      val bandIds = (0 until numBands).mkString("[", ", ", "]")
      s"""WITH keepers AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |kept AS (
         |  SELECT d.* FROM documents d JOIN keepers USING (doc_id)),
         |sigs AS (
         |  SELECT doc_id, ${minhashSig("sh")} AS sig
         |  FROM (SELECT doc_id, ${shingles()} AS sh FROM kept)
         |  WHERE len(sh) > 0),
         |banded AS (
         |  SELECT doc_id, sig, t.band_id,
         |    array_to_string(list_slice(sig, t.band_id * $RowsPerBand + 1, t.band_id * $RowsPerBand + $RowsPerBand), '_') AS band_key
         |  FROM sigs CROSS JOIN (SELECT unnest($bandIds) AS band_id) t),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS sig_a, r.sig AS sig_b
         |  FROM banded l JOIN banded r
         |    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id),
         |dropped AS (
         |  SELECT DISTINCT b FROM cand
         |  WHERE round(CAST(list_sum(list_transform(list_zip(sig_a, sig_b), x -> CAST(x[1] = x[2] AS INT))) AS DOUBLE) / $NumHashes.0, 6) >= $MinEstJaccard),
         |final AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    CAST(len(${toks()}) AS INT) AS n_tokens
         |  FROM kept WHERE doc_id NOT IN (SELECT b FROM dropped))
         |SELECT doc_id, lang, source, n_chars, n_tokens FROM final
         |WHERE n_tokens >= $MinTokens
         |  AND CAST(n_chars AS DOUBLE) / n_tokens <= $MaxMeanTokenLen
         |ORDER BY doc_id""".stripMargin
    },

    "q29_corpus_split" ->
      s"""SELECT CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |            THEN 'train' ELSE 'eval' END AS split,
         |  lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "q30_chunk" -> {
      val step = ChunkSize - ChunkOverlap
      s"""WITH sized AS (
         |  SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) > 0),
         |idx AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, CAST(ceil(greatest(n - $ChunkOverlap, 1) / CAST($step AS DOUBLE)) AS BIGINT))) AS chunk_idx
         |  FROM sized)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |  substr(text, CAST(chunk_idx * $step + 1 AS INT), $ChunkSize) AS chunk,
         |  CAST(len(substr(text, CAST(chunk_idx * $step + 1 AS INT), $ChunkSize)) AS INT) AS chunk_chars
         |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin
    },

    "q30b_chunk_tokens" -> {
      val step = ChunkTokens - ChunkTokenOverlap
      s"""WITH toked AS (
         |  SELECT doc_id, ${toks()} AS ts FROM documents),
         |sized AS (
         |  SELECT doc_id, ts, len(ts) AS n FROM toked WHERE len(ts) > 0),
         |idx AS (
         |  SELECT doc_id, ts, n,
         |    unnest(range(0, CAST(ceil(greatest(n - $ChunkTokenOverlap, 1) / CAST($step AS DOUBLE)) AS BIGINT))) AS chunk_idx
         |  FROM sized)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |  array_to_string(list_slice(ts, CAST(chunk_idx * $step + 1 AS INT), CAST(chunk_idx * $step + $ChunkTokens AS INT)), ' ') AS chunk,
         |  CAST(least($ChunkTokens, n - chunk_idx * $step) AS INT) AS chunk_tokens
         |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin
    },

    "q31_contamination" ->
      s"""WITH tagged AS (
         |  SELECT sha256(text) AS h,
         |    CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |         THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |per_content AS (
         |  SELECT h,
         |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
         |    sum(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS n_eval
         |  FROM tagged GROUP BY h)
         |SELECT CAST(sum(n_eval) AS BIGINT) AS n_eval_docs,
         |  CAST(sum(CASE WHEN n_train > 0 THEN n_eval ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  round(CAST(sum(CASE WHEN n_train > 0 THEN n_eval ELSE 0 END) AS DOUBLE)
         |    / CAST(greatest(sum(n_eval), 1) AS DOUBLE), 6) AS contamination_rate
         |FROM per_content""".stripMargin,

    "q32_pack" -> {
      val step = ChunkTokens - ChunkTokenOverlap
      s"""WITH toked AS (
         |  SELECT doc_id, ${toks()} AS ts FROM documents),
         |sized AS (
         |  SELECT doc_id, ts, len(ts) AS n FROM toked WHERE len(ts) > 0),
         |chunks AS (
         |  SELECT doc_id,
         |    CAST(chunk_idx AS INT) AS chunk_idx,
         |    CAST(least($ChunkTokens, n - chunk_idx * $step) AS INT) AS chunk_tokens
         |  FROM (SELECT doc_id, n,
         |    unnest(range(0, CAST(ceil(greatest(n - $ChunkTokenOverlap, 1) / CAST($step AS DOUBLE)) AS BIGINT))) AS chunk_idx
         |    FROM sized)),
         |positioned AS (
         |  SELECT doc_id % $PackBuckets AS bucket, chunk_tokens,
         |    coalesce(sum(chunk_tokens) OVER (PARTITION BY doc_id % $PackBuckets
         |      ORDER BY doc_id, chunk_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM chunks)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(start_tok // $PackBudget AS BIGINT) AS pack_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(chunk_tokens) AS BIGINT) AS pack_tokens
         |FROM positioned GROUP BY 1, 2 ORDER BY bucket, pack_id""".stripMargin
    },

    "q33_redact" -> {
      import graft.operators.TextAnalysis.Pii
      // RE2 needs the 'g' flag for replace-all (java regexp_replace
      // already replaces all). Counts are taken on the text each
      // pattern actually sees, mirroring the Spark sequential pipeline.
      s"""WITH s1 AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '${Pii.Email}')) AS n_emails,
         |    regexp_replace(text, '${Pii.Email}', '<EMAIL>', 'g') AS t1
         |  FROM documents),
         |s2 AS (
         |  SELECT doc_id, n_emails,
         |    len(regexp_extract_all(t1, '${Pii.Ipv4}')) AS n_ips,
         |    regexp_replace(t1, '${Pii.Ipv4}', '<IP>', 'g') AS t2
         |  FROM s1)
         |SELECT doc_id,
         |  CAST(n_emails AS INT) AS n_emails,
         |  CAST(n_ips AS INT) AS n_ips,
         |  CAST(len(regexp_extract_all(t2, '${Pii.Phone}')) AS INT) AS n_phones,
         |  regexp_replace(t2, '${Pii.Phone}', '<PHONE>', 'g') AS clean_text
         |FROM s2 ORDER BY doc_id""".stripMargin
    },

    "q34_bm25" -> s"""$bm25Ctes
         |$bm25Select
         |ORDER BY score DESC, doc_id LIMIT $K""".stripMargin,

    // q131: BM25 from the persisted bucket-partitioned index is
    // bit-equal to inline BM25 (SearchSpec pins it), so the oracle is
    // q34's statement verbatim.
    "q131_text_index_serve" -> s"""$bm25Ctes
         |$bm25Select
         |ORDER BY score DESC, doc_id LIMIT $K""".stripMargin,

    "q34b_hybrid_rrf" ->
      s"""$bm25Ctes,
         |bm AS (
         |  $bm25Select
         |  ORDER BY score DESC, doc_id LIMIT $RrfDepth),
         |lex AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
         |  FROM bm),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |cosd AS (
         |  SELECT v.vec_id, round(${cosine("v.embedding", "q.qv")}, 6) AS score
         |  FROM embeddings v, q
         |  ORDER BY score DESC, vec_id LIMIT $RrfDepth),
         |sem AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT) AS sem_rank
         |  FROM cosd)
         |SELECT coalesce(l.id, s.id) AS id, l.lex_rank, s.sem_rank,
         |  round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + l.lex_rank), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / ($RrfK + s.sem_rank), 0), 6) AS rrf_score
         |FROM lex l FULL OUTER JOIN sem s ON l.id = s.id
         |ORDER BY rrf_score DESC, id LIMIT $K""".stripMargin,

    "q35_repetition" ->
      s"""WITH toked AS (SELECT doc_id, ${toks()} AS ts FROM documents),
         |grams AS (
         |  SELECT doc_id, array_to_string(list_slice(ts, i, i + 1), ' ') AS gram
         |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toked)),
         |counts AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(sum(c) AS BIGINT) AS n_grams,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_gram_frac,
         |  round(CAST(sum(c) - count(*) AS DOUBLE) / sum(c), 6) AS dup_gram_frac
         |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q36_ngram_contam" -> ngramContamSql,

    "q37_domain_mix" ->
      s"""WITH tagged AS (
         |  SELECT doc_id, source,
         |    20000 + (coalesce(CAST(regexp_extract(source, '[0-9]+') AS BIGINT), 0) % 5) * 15000 AS target_ppm,
         |    ${hash60("CAST(doc_id AS VARCHAR)")} % 1000000 AS u
         |  FROM documents),
         |counts AS (SELECT source, target_ppm, count(*) AS n_docs FROM tagged GROUP BY 1, 2),
         |budget AS (SELECT min((n_docs * 1000000) // target_ppm) AS b FROM counts),
         |rates AS (
         |  SELECT source, target_ppm, n_docs,
         |    (((b * target_ppm) // 1000000) * 1000000) // n_docs AS keep_ppm
         |  FROM counts CROSS JOIN budget),
         |kept AS (
         |  SELECT t.source, count(*) AS n_kept
         |  FROM tagged t JOIN rates r ON t.source = r.source
         |  WHERE t.u < r.keep_ppm GROUP BY 1),
         |tot AS (SELECT sum(n_kept) AS total_kept FROM kept)
         |SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
         |  CAST(r.target_ppm AS BIGINT) AS target_ppm,
         |  CAST(r.keep_ppm AS BIGINT) AS keep_ppm,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST((coalesce(k.n_kept, 0) * 1000000) // greatest(total_kept, 1) AS BIGINT) AS achieved_ppm
         |FROM rates r LEFT JOIN kept k ON r.source = k.source CROSS JOIN tot
         |ORDER BY r.source""".stripMargin,

    "q38_lm_score" ->
      s"""WITH tagged AS (
         |  SELECT doc_id, text,
         |    CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |         THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, split, substr(text, CAST(i AS INT), 2) AS bg
         |  FROM (SELECT doc_id, split, text, unnest(range(1, len(text))) AS i FROM tagged)),
         |trn AS (SELECT bg, count(*) AS cnt FROM bg WHERE split = 'train' GROUP BY 1),
         |ctx AS (SELECT substr(bg, 1, 1) AS c, sum(cnt) AS ctx_cnt FROM trn GROUP BY 1),
         |v AS (SELECT count(DISTINCT substr(bg, 2, 1)) AS vs FROM trn),
         |scoredbg AS (
         |  SELECT doc_id,
         |    CAST(floor(ln(CAST(coalesce(t.cnt, 0) + 1 AS DOUBLE)
         |      / (coalesce(c.ctx_cnt, 0) + vs)) * 1000000.0) AS BIGINT) AS lp
         |  FROM bg d
         |  LEFT JOIN trn t ON d.bg = t.bg
         |  LEFT JOIN ctx c ON substr(d.bg, 1, 1) = c.c
         |  CROSS JOIN v)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(lp) AS BIGINT) AS sum_logp_micro,
         |  round(CAST(sum(lp) AS DOUBLE) / (1000000.0 * count(*)), 6) AS avg_logp
         |FROM scoredbg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q230: LOO source valuation — the q38 model restated at the
    // (source, bg) grain; every per-source model is count SUBTRACTION
    // off the same CTEs the Spark side derives, and both score legs
    // keep the q38 micro-unit discipline (floor(ln·1e6) BIGINTs,
    // eval-count weighting, integer sums).
    "q230_source_influence" ->
      s"""WITH tagged AS (
         |  SELECT doc_id, source, text,
         |    CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |         THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |bg AS (
         |  SELECT source, split, substr(text, CAST(i AS INT), 2) AS bg
         |  FROM (SELECT source, split, text,
         |        unnest(range(1, len(text))) AS i FROM tagged)),
         |srccnt AS (SELECT source, bg, count(*) AS cnt_s FROM bg
         |           WHERE split = 'train' GROUP BY 1, 2),
         |gtab AS (SELECT bg, sum(cnt_s) AS cnt FROM srccnt GROUP BY 1),
         |ctxs AS (SELECT source, substr(bg, 1, 1) AS c, sum(cnt_s) AS ctx_s
         |         FROM srccnt GROUP BY 1, 2),
         |ctx AS (SELECT substr(bg, 1, 1) AS c, sum(cnt) AS ctx_cnt
         |        FROM gtab GROUP BY 1),
         |globu AS (SELECT substr(bg, 2, 1) AS u, sum(cnt) AS u_cnt
         |          FROM gtab GROUP BY 1),
         |srcu AS (SELECT source, substr(bg, 2, 1) AS u, sum(cnt_s) AS u_s
         |         FROM srccnt GROUP BY 1, 2),
         |v AS (SELECT count(*) AS vs FROM globu),
         |vloo AS (SELECT source, count(*) AS lost_u
         |         FROM srcu JOIN globu USING (u)
         |         WHERE u_s = u_cnt GROUP BY 1),
         |evalbg AS (SELECT bg, count(*) AS ecnt FROM bg
         |           WHERE split = 'eval' GROUP BY 1),
         |neval AS (SELECT sum(ecnt) AS n_eval FROM evalbg),
         |fullm AS (
         |  SELECT CAST(sum(ecnt * CAST(floor(ln(
         |      CAST(coalesce(g.cnt, 0) + 1 AS DOUBLE)
         |      / (coalesce(x.ctx_cnt, 0) + vs)) * 1000000.0) AS BIGINT))
         |    AS BIGINT) AS sum_logp_full_micro
         |  FROM evalbg e
         |  LEFT JOIN gtab g USING (bg)
         |  LEFT JOIN ctx x ON substr(e.bg, 1, 1) = x.c
         |  CROSS JOIN v),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |loo AS (
         |  SELECT s.source, vs - coalesce(l.lost_u, 0) AS v_loo,
         |    CAST(sum(e.ecnt * CAST(floor(ln(
         |      CAST(coalesce(g.cnt, 0) - coalesce(sc.cnt_s, 0) + 1 AS DOUBLE)
         |      / (coalesce(x.ctx_cnt, 0) - coalesce(cs.ctx_s, 0)
         |         + (vs - coalesce(l.lost_u, 0)))) * 1000000.0) AS BIGINT))
         |      AS BIGINT) AS sum_logp_loo_micro
         |  FROM srcs s CROSS JOIN evalbg e
         |  LEFT JOIN srccnt sc ON sc.source = s.source AND sc.bg = e.bg
         |  LEFT JOIN gtab g ON g.bg = e.bg
         |  LEFT JOIN ctxs cs ON cs.source = s.source
         |    AND cs.c = substr(e.bg, 1, 1)
         |  LEFT JOIN ctx x ON x.c = substr(e.bg, 1, 1)
         |  LEFT JOIN vloo l ON l.source = s.source
         |  CROSS JOIN v
         |  GROUP BY 1, 2),
         |tm AS (SELECT source, sum(cnt_s) AS n_train_bigrams
         |       FROM srccnt GROUP BY 1)
         |SELECT loo.source,
         |  CAST(coalesce(tm.n_train_bigrams, 0) AS BIGINT) AS n_train_bigrams,
         |  CAST(v_loo AS BIGINT) AS v_loo,
         |  sum_logp_full_micro,
         |  sum_logp_loo_micro,
         |  CAST(sum_logp_loo_micro - sum_logp_full_micro AS BIGINT) AS delta_micro,
         |  round(CAST(sum_logp_loo_micro - sum_logp_full_micro AS DOUBLE)
         |    / (1000000.0 * n_eval), 6) AS avg_delta
         |FROM loo LEFT JOIN tm USING (source)
         |CROSS JOIN fullm CROSS JOIN neval
         |ORDER BY source""".stripMargin,

    // q231: Pearson χ² independence over the FULL lang×source grid —
    // absent cells count 0 via the margin cross join; the numerator
    // difference o·N − r·c clears to exact integers before the one
    // double division, then order-immune micro BIGINT sums.
    "q231_strata_chisq" ->
      """WITH obs AS (SELECT lang AS rv, source AS cv, count(*) AS o
        |             FROM documents GROUP BY 1, 2),
        |rt AS (SELECT rv, sum(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT cv, sum(o) AS c FROM obs GROUP BY 1),
        |nn AS (SELECT sum(o) AS n FROM obs),
        |grid AS (
        |  SELECT rt.rv, ct.cv, coalesce(obs.o, 0) AS o, rt.r, ct.c, nn.n
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN obs ON obs.rv = rt.rv AND obs.cv = ct.cv
        |  CROSS JOIN nn),
        |cells AS (
        |  SELECT rv, cv, o, r, c,
        |    CAST(floor(CAST(r AS DOUBLE) * c * 1000000.0 / n) AS BIGINT)
        |      AS expected_micro,
        |    CAST(floor(CAST(o * n - r * c AS DOUBLE)
        |        * CAST(o * n - r * c AS DOUBLE) * 1000000.0
        |        / (CAST(n AS DOUBLE) * r * c)) AS BIGINT) AS contrib_micro
        |  FROM grid),
        |tot AS (SELECT CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro,
        |  CAST((count(DISTINCT rv) - 1) * (count(DISTINCT cv) - 1) AS BIGINT)
        |    AS df FROM cells)
        |SELECT rv AS lang, cv AS source, CAST(o AS BIGINT) AS obs,
        |  CAST(r AS BIGINT) AS row_total, CAST(c AS BIGINT) AS col_total,
        |  expected_micro, contrib_micro, chi2_micro, df
        |FROM cells CROSS JOIN tot ORDER BY lang, source""".stripMargin,

    // q155: word-bigram Stupid Backoff — the pair stream, both count
    // tables, and both micro-unit score legs mirrored verbatim; the
    // len >= 2 gate matches the Spark side's pre-sequence filter.
    "q155_backoff_lm" ->
      s"""WITH tagged AS (
         |  SELECT doc_id, ${toks()} AS tk,
         |    CASE WHEN ${hash60("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |         THEN 'train' ELSE 'eval' END AS split
         |  FROM documents),
         |pairs AS (
         |  SELECT doc_id, split,
         |    tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
         |  FROM (SELECT doc_id, split, tk, unnest(range(1, len(tk))) AS i
         |        FROM tagged WHERE len(tk) >= 2)),
         |trn AS (SELECT w1, w2, count(*) AS cnt_bg FROM pairs
         |        WHERE split = 'train' GROUP BY 1, 2),
         |ctx AS (SELECT w1, sum(cnt_bg) AS cnt_ctx FROM trn GROUP BY 1),
         |uni AS (SELECT w2 AS u_w, sum(cnt_bg) AS cnt_uni FROM trn GROUP BY 1),
         |nv AS (SELECT sum(cnt_bg) AS n_pairs_train, count(DISTINCT w2) AS vs
         |       FROM trn),
         |scored AS (
         |  SELECT p.doc_id,
         |    CAST(floor(CASE WHEN t.cnt_bg IS NOT NULL
         |      THEN ln(CAST(t.cnt_bg AS DOUBLE) / c.cnt_ctx)
         |      ELSE ln(0.4 * CAST(coalesce(u.cnt_uni, 0) + 1 AS DOUBLE)
         |              / (n_pairs_train + vs))
         |      END * 1000000.0) AS BIGINT) AS lp
         |  FROM pairs p
         |  LEFT JOIN trn t ON p.w1 = t.w1 AND p.w2 = t.w2
         |  LEFT JOIN ctx c ON p.w1 = c.w1
         |  LEFT JOIN uni u ON p.w2 = u.u_w
         |  CROSS JOIN nv)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(lp) AS BIGINT) AS sum_logp_micro,
         |  round(CAST(sum(lp) AS DOUBLE) / (1000000.0 * count(*)), 6) AS avg_logp
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q41_vocab_stats" ->
      s"""WITH tok AS (SELECT source, unnest(${toks()}) AS term FROM documents),
         |tf AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |agg AS (
         |  SELECT source, count(*) AS n_distinct_tokens, sum(c) AS n_tokens
         |  FROM tf GROUP BY 1),
         |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
         |SELECT source,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
         |  round(CAST(n_distinct_tokens AS DOUBLE) / n_tokens, 6) AS type_token_ratio
         |FROM agg JOIN nd USING (source) ORDER BY source""".stripMargin,

    "q42_centroid_stats" ->
      """WITH xs AS (
        |  SELECT label, CAST(i - 1 AS INT) AS pos,
        |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |aggd AS (
        |  SELECT label, pos, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        |  FROM xs GROUP BY 1, 2)
        |SELECT label, pos, CAST(n AS BIGINT) AS n,
        |  round(sx / n, 6) AS mean,
        |  round(sxx / n - (sx / n) * (sx / n), 6) AS variance
        |FROM aggd ORDER BY label, pos""".stripMargin,

    "q27_supplier_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_type LIKE '%PROMO%'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    // q85: φ-heavy hitters — pure integer gate c·phiInv > N; share is
    // one division of exact integers, rounded at emission.
    "q85_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest(${toks()}) AS term FROM documents),
         |tf AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT sum(c) AS n_total FROM tf)
         |SELECT term, CAST(c AS BIGINT) AS c,
         |  round(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share
         |FROM tf, tot WHERE c * $HeavyPhiInv > n_total
         |ORDER BY c DESC, term""".stripMargin,

    // q86: two-sample χ² drift — d = c1·n2 − c2·n1 exact in BIGINT,
    // the cell statistic evaluated in double with the SAME association
    // as the Spark plan ((d·d) / ((n1·n2)·(c1+c2))), rounded at
    // emission and ranked on the rounded value.
    "q86_token_drift" ->
      s"""WITH tok AS (
         |  SELECT source AS slice, unnest(${toks()}) AS term FROM documents
         |  WHERE source IN ('$DriftSliceA', '$DriftSliceB')),
         |tf AS (SELECT slice, term, count(*) AS c FROM tok GROUP BY 1, 2),
         |a AS (SELECT term, c AS c1 FROM tf WHERE slice = '$DriftSliceA'),
         |b AS (SELECT term, c AS c2 FROM tf WHERE slice = '$DriftSliceB'),
         |n1t AS (SELECT sum(c) AS n1 FROM tf WHERE slice = '$DriftSliceA'),
         |n2t AS (SELECT sum(c) AS n2 FROM tf WHERE slice = '$DriftSliceB'),
         |j AS (
         |  SELECT COALESCE(a.term, b.term) AS term,
         |    COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
         |  FROM a FULL OUTER JOIN b ON a.term = b.term)
         |SELECT term, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
         |  round((CAST(c1 * n2 - c2 * n1 AS DOUBLE) * CAST(c1 * n2 - c2 * n1 AS DOUBLE))
         |    / ((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) * CAST(c1 + c2 AS DOUBLE)), 6) AS chi2
         |FROM j, n1t, n2t WHERE c1 + c2 >= $DriftMinCount
         |ORDER BY chi2 DESC, term LIMIT $DriftTopN""".stripMargin,

    // q88: integer-micro-unit PageRank, 3 unrolled rounds — every
    // update is 64-bit floor arithmetic (`//` here, `div` in Spark),
    // so a fixed iteration count is hash-exact across engines.
    "q88_supply_rank" -> {
      // CAST the per-round sum back to BIGINT: DuckDB widens sum() to
      // HUGEINT, which pandas renders as float and flips the hash
      def round(prev: String, out: String) =
        s"""$out AS (
           |  SELECT n0.node_id,
           |    CAST((1000000 * ${100 - 85}) // (100 * nn.n)
           |      + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n0
           |  LEFT JOIN (
           |    SELECT e.dst AS node_id, CAST(sum(p.pr // d.outdeg) AS BIGINT) AS s
           |    FROM $prev p
           |    JOIN edges e ON p.node_id = e.src
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY 1) s USING (node_id), nn)"""
      s"""WITH base AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |edges AS (
         |  SELECT src, dst FROM base
         |  UNION SELECT dst AS src, src AS dst FROM base),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node_id FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |pr0 AS (SELECT node_id, 1000000 // nn.n AS pr FROM nodes, nn),
         |${round("pr0", "pr1")},
         |${round("pr1", "pr2")},
         |${round("pr2", "pr3")}
         |SELECT node_id,
         |  CASE WHEN node_id % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
         |  node_id // 2 AS key, pr AS pr_micro
         |FROM pr3 ORDER BY pr_micro DESC, node_id LIMIT $PrTopN""".stripMargin
    },

    // q89: winsorized robust stats — clamp bounds are exact discrete
    // order statistics (rank = (n·p + 999) // 1000 over the per-group
    // value histogram's cumulative counts); no float before the final
    // rounded means.
    "q89_winsorized" ->
      s"""WITH h AS (
         |  SELECT source AS g, n_chars AS v, count(*) AS c
         |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT g, v, c,
         |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
         |    sum(c) OVER (PARTITION BY g) AS n
         |  FROM h),
         |b AS (
         |  SELECT g,
         |    min(v) FILTER (WHERE cum >= (n * $WinsorLoPm + 999) // 1000) AS lo_value,
         |    min(v) FILTER (WHERE cum >= (n * $WinsorHiPm + 999) // 1000) AS hi_value
         |  FROM cum GROUP BY g),
         |w AS (
         |  SELECT d.source AS g, d.n_chars AS v, b.lo_value, b.hi_value,
         |    greatest(least(d.n_chars, b.hi_value), b.lo_value) AS wv
         |  FROM documents d JOIN b ON d.source = b.g
         |  WHERE d.n_chars IS NOT NULL)
         |SELECT g AS source, CAST(count(*) AS BIGINT) AS n_values,
         |  min(lo_value) AS lo_value, min(hi_value) AS hi_value,
         |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_value,
         |  round(CAST(sum(wv) AS DOUBLE) / count(*), 6) AS winsorized_mean
         |FROM w GROUP BY g ORDER BY g""".stripMargin,

    // q90: MAD outliers — lower-median convention keeps median, MAD,
    // deviations and the k·MAD gate all in 64-bit integers.
    "q90_mad_outliers" ->
      s"""WITH vals AS (
         |  SELECT source AS g, n_chars AS v FROM documents
         |  WHERE n_chars IS NOT NULL),
         |h1 AS (SELECT g, v, count(*) AS c FROM vals GROUP BY 1, 2),
         |c1 AS (
         |  SELECT g, v,
         |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
         |    sum(c) OVER (PARTITION BY g) AS n
         |  FROM h1),
         |m1 AS (
         |  SELECT g, min(v) FILTER (WHERE cum >= (n + 1) // 2) AS med
         |  FROM c1 GROUP BY g),
         |dev AS (
         |  SELECT vals.g, med, abs(v - med) AS d
         |  FROM vals JOIN m1 USING (g)),
         |h2 AS (SELECT g, d AS v, count(*) AS c FROM dev GROUP BY 1, 2),
         |c2 AS (
         |  SELECT g, v,
         |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
         |    sum(c) OVER (PARTITION BY g) AS n
         |  FROM h2),
         |m2 AS (
         |  SELECT g, min(v) FILTER (WHERE cum >= (n + 1) // 2) AS mad
         |  FROM c2 GROUP BY g)
         |SELECT g AS source, CAST(count(*) AS BIGINT) AS n_values,
         |  min(med) AS median, min(mad) AS mad,
         |  CAST(sum(CASE WHEN d > mad * $MadK THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers
         |FROM dev JOIN m2 USING (g) GROUP BY g ORDER BY g""".stripMargin,

    // q91: tolerance as-of attribution — DuckDB's native ASOF LEFT
    // JOIN with the staleness bound applied in the projection, nulling
    // timestamp and payload atomically like the Spark plan.
    "q91_click_attribution" ->
      s"""WITH purchases AS (
         |  SELECT event_id, user_id, ts, value FROM events
         |  WHERE event_type = 'purchase'),
         |clicks AS (
         |  SELECT user_id, ts, max(event_id) AS click_id
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |j AS (
         |  SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS c_ts, c.click_id,
         |    CASE WHEN c.ts IS NOT NULL
         |           AND date_diff('second', c.ts, p.ts) <= $AttribWindowSec
         |         THEN 1 ELSE 0 END AS fresh
         |  FROM purchases p
         |  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts)
         |SELECT event_id, user_id,
         |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
         |  round(value, 6) AS value,
         |  CASE WHEN fresh = 1 THEN click_id END AS click_id,
         |  CASE WHEN fresh = 1 THEN date_diff('second', c_ts, ts) END
         |    AS secs_since_click,
         |  CAST(fresh AS INTEGER) AS attributed
         |FROM j ORDER BY event_id""".stripMargin,

    // q128: attribution touchpoint log folded to per-purchase report —
    // the batch face of the stream-stream interval join (q91's as-of
    // answers "the one last click"; this keeps every in-window
    // touchpoint, then resolves most-recent by (secs, click_id DESC)).
    "q128_attribution_log" ->
      s"""WITH p AS (
         |  SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'purchase'),
         |c AS (
         |  SELECT event_id AS click_id, user_id, ts FROM events
         |  WHERE event_type = 'click'),
         |log AS (
         |  SELECT p.event_id, c.click_id,
         |    date_diff('second', c.ts, p.ts) AS secs_before
         |  FROM p JOIN c ON p.user_id = c.user_id
         |    AND c.ts <= p.ts
         |    AND date_diff('second', c.ts, p.ts) <= $AttribWindowSec)
         |SELECT event_id, n_clicks, click_id, secs_before FROM (
         |  SELECT event_id, click_id, secs_before,
         |    CAST(count(*) OVER (PARTITION BY event_id) AS BIGINT) AS n_clicks,
         |    row_number() OVER (PARTITION BY event_id
         |      ORDER BY secs_before, click_id DESC) AS rn
         |  FROM log)
         |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // q92: copy-on-write MERGE — NOT EXISTS (not NOT IN) mirrors the
    // anti-join's null-key semantics: a null-keyed base row persists.
    "q92_upsert" ->
      s"""WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
         |changed AS (
         |  SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
         |  FROM base WHERE doc_id % $UpsertChangeMod = 0),
         |fresh AS (
         |  SELECT doc_id + $UpsertIdShift AS doc_id, lang, source, n_chars
         |  FROM base WHERE doc_id % $UpsertInsertMod = 0),
         |upd AS (SELECT * FROM changed UNION ALL SELECT * FROM fresh)
         |SELECT * FROM (
         |  SELECT b.doc_id, b.lang, b.source, b.n_chars FROM base b
         |  WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.doc_id = b.doc_id)
         |  UNION ALL SELECT * FROM upd)
         |ORDER BY doc_id""".stripMargin,

    // q93: percentile normalization — percent_rank over the unique
    // (value, id) order divides two exact integers; round at emission.
    "q93_pct_normalize" ->
      """SELECT doc_id, lang, n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS pct
        |FROM documents WHERE n_chars IS NOT NULL ORDER BY doc_id""".stripMargin,

    // q95: α=1/2 temperature sampling — s = floor(sqrt(n)·1000) is
    // engine-identical (IEEE sqrt + exact ×1000/floor below 2^53);
    // quotas are integer division; selection order is q50's
    // (hash60(doc_id), doc_id).
    "q95_temperature_sample" ->
      s"""WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         |weighted AS (
         |  SELECT source, n,
         |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS s
         |  FROM counts),
         |tot AS (SELECT CAST(sum(s) AS BIGINT) AS st FROM weighted),
         |quotas AS (
         |  SELECT source, least(n, ($TempBudget * s) // st) AS quota
         |  FROM weighted, tot),
         |keyed AS (
         |  SELECT doc_id, source,
         |    ${hash60("CAST(doc_id AS VARCHAR)")} AS sample_key
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY source ORDER BY sample_key, doc_id) AS rn
         |  FROM keyed)
         |SELECT doc_id, source FROM ranked JOIN quotas USING (source)
         |WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    // q96: blocked fuzzy join — levenshtein is an integer DP, same
    // classic distance in both engines; blocking on (lang, first word)
    // with the r17 occupancy guard mirrored: blocks over FuzzyMaxBlock
    // sub-block on hash60(second word) mod ceil(cnt/maxBlock).
    "q96_fuzzy_pairs" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, lang,
         |    string_split(text, ' ')[1] AS w1,
         |    coalesce(string_split(text, ' ')[2], '') AS w2,
         |    substr(text, 1, $FuzzyPrefixLen) AS p
         |  FROM documents WHERE text IS NOT NULL),
         |d AS (
         |  SELECT doc_id, lang, w1, p,
         |    CASE WHEN count(*) OVER (PARTITION BY lang, w1) <= $FuzzyMaxBlock THEN 0
         |         ELSE ${hash60("w2")} %
         |           CAST(floor((count(*) OVER (PARTITION BY lang, w1) + ${FuzzyMaxBlock - 1})
         |                / $FuzzyMaxBlock.0) AS BIGINT) END AS sub
         |  FROM d0)
         |SELECT a.lang, a.doc_id AS a, b.doc_id AS b,
         |  CAST(levenshtein(a.p, b.p) AS INTEGER) AS dist
         |FROM d a JOIN d b ON a.lang = b.lang AND a.w1 = b.w1 AND a.sub = b.sub
         |WHERE a.doc_id < b.doc_id AND levenshtein(a.p, b.p) <= $FuzzyMaxDist
         |ORDER BY a, b""".stripMargin,

    // q215: Fellegi-Sunter linkage — same capped blocking as q96, u
    // from exact collision moments (HUGEINT mirrors DECIMAL(38)),
    // ln-ratio weights as one shared double expression, 6dp round
    // before ranking.
    "q215_linkage_scores" -> {
      val fields = Seq(("lang", LinkMLang), ("source", LinkMSource),
        ("lb", LinkMLen), ("w2", LinkMW2))
      val uDefs = fields.map { case (f, _) =>
        s"""u_$f AS (
           |  SELECT (CAST(sum(CAST(c AS HUGEINT) * (c - 1)) + 1 AS DOUBLE)) /
           |    (CAST((SELECT CAST(n AS HUGEINT) * (n - 1) FROM nn) + 2
           |      AS DOUBLE)) AS u
           |  FROM (SELECT count(*) AS c FROM base GROUP BY $f))""".stripMargin
      }.mkString(",\n")
      val weightSum = fields.map { case (f, m) =>
        s"""(CASE WHEN a.$f = b.$f
           |  THEN ln($m / (SELECT u FROM u_$f))
           |  ELSE ln(${1.0 - m} / (1.0 - (SELECT u FROM u_$f))) END)"""
          .stripMargin
      }.mkString(" +\n")
      val agreeCols = fields.map { case (f, _) =>
        s"CAST(CASE WHEN a.$f = b.$f THEN 1 ELSE 0 END AS INT) AS agree_$f"
      }.mkString(",\n  ")
      s"""WITH base AS (
         |  SELECT doc_id, lang, source, n_chars // 100 AS lb,
         |    string_split(text, ' ')[1] AS w1,
         |    coalesce(string_split(text, ' ')[2], '') AS w2
         |  FROM documents WHERE text IS NOT NULL),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
         |$uDefs,
         |blk AS (
         |  SELECT *,
         |    CASE WHEN count(*) OVER (PARTITION BY w1) <= $FuzzyMaxBlock THEN 0
         |         ELSE ${hash60("w2")} %
         |           CAST(floor((count(*) OVER (PARTITION BY w1) + ${FuzzyMaxBlock - 1})
         |                / $FuzzyMaxBlock.0) AS BIGINT) END AS sub
         |  FROM base)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  $agreeCols,
         |  round($weightSum, 6) AS score
         |FROM blk a JOIN blk b ON a.w1 = b.w1 AND a.sub = b.sub
         |WHERE a.doc_id < b.doc_id
         |ORDER BY score DESC, a, b LIMIT $LinkTopN""".stripMargin
    },

    // q97: conversion-latency deciles — first-to-first latency in
    // whole seconds (>= admits same-instant), ntile over the unique
    // (latency, user_id) order, mean from exact integers.
    "q97_conversion_latency" ->
      s"""WITH tfrom AS (
         |  SELECT user_id, min(ts) AS t_from FROM events
         |  WHERE event_type = '$ConvFrom' GROUP BY 1),
         |tto AS (
         |  SELECT e.user_id, t_from, min(e.ts) AS t_to
         |  FROM events e JOIN tfrom USING (user_id)
         |  WHERE e.event_type = '$ConvTo' AND e.ts >= t_from
         |  GROUP BY 1, 2),
         |lat AS (
         |  SELECT user_id, date_diff('second', t_from, t_to) AS latency
         |  FROM tto),
         |d AS (
         |  SELECT latency,
         |    ntile($DecileBuckets) OVER (ORDER BY latency, user_id) AS decile
         |  FROM lat)
         |SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         |  min(latency) AS min_secs, max(latency) AS max_secs,
         |  round(CAST(sum(latency) AS DOUBLE) / count(*), 6) AS mean_secs
         |FROM d GROUP BY decile ORDER BY decile""".stripMargin,

    // q98: TPC-H Q14 shape — promo/total decimal sums in ONE pass,
    // one double division at emission.
    "q98_promo_share" ->
      s"""WITH j AS (
         |  SELECT CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS disc,
         |    p_type LIKE '%PROMO%' AS is_promo
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '$Q14From 00:00:00'
         |    AND l_shipdate < TIMESTAMP '$Q14Until 00:00:00'),
         |s AS (
         |  SELECT
         |    sum(CASE WHEN is_promo THEN disc ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo,
         |    sum(disc) AS total
         |  FROM j)
         |SELECT
         |  round(100 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6) AS promo_share_pct,
         |  round(CAST(promo AS DOUBLE), 6) AS promo_revenue,
         |  round(CAST(total AS DOUBLE), 6) AS total_revenue
         |FROM s""".stripMargin,

    // q99: TPC-H Q10 shape — returned-item revenue ranking, decimal
    // sums, (revenue desc, custkey) tie-pinned top-n.
    "q99_returned_ranking" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
         |    AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '$Q10From 00:00:00'
         |  AND o_orderdate < TIMESTAMP '$Q10Until 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT $Q10TopN""".stripMargin,

    // q100: per-group least squares — integer moment sums, closed
    // forms in double once at emission, identical association.
    "q100_linear_fit" ->
      s"""WITH base AS (
         |  SELECT source, CAST(n_chars AS BIGINT) AS x,
         |    CAST(len(${toks()}) AS BIGINT) AS y
         |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
         |agg AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM base GROUP BY source)
         |SELECT source, n,
         |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         |  round((CAST(sy AS DOUBLE) -
         |        (CAST(n * sxy - sx * sy AS DOUBLE) /
         |         CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         |        / CAST(n AS DOUBLE), 6) AS intercept,
         |  round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)) /
         |        (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
         |FROM agg ORDER BY source""".stripMargin,

    // q101: Pearson r — cent-unit BIGINT moments (never corr(): engines
    // disagree on float accumulation; scale cancels in r and slope),
    // Σy² alone in DECIMAL (cents² would overflow) rescaled by 1e4,
    // closed form in double once with the Spark plan's association.
    "q101_price_corr" ->
      """WITH base AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS xu,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yu,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |agg AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xu) AS BIGINT) AS sx, CAST(sum(yu) AS BIGINT) AS sy,
        |    CAST(sum(xu * yu) AS BIGINT) AS sxy,
        |    CAST(sum(xu * xu) AS BIGINT) AS sxx,
        |    sum(y * y) AS syy
        |  FROM base GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * (CAST(syy AS DOUBLE) * 10000) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
        |FROM agg ORDER BY l_returnflag""".stripMargin,

    // q87: TPC-H Q6 shape — money math in DECIMAL(12,2) (exact,
    // order-free sums), discount band compared in decimal too.
    "q87_forecast_revenue" ->
      s"""SELECT
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE), 6) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '$Q6From 00:00:00'
         |  AND l_shipdate < TIMESTAMP '$Q6Until 00:00:00'
         |  AND CAST(l_discount AS DECIMAL(12,2))
         |    BETWEEN CAST('$Q6DiscLo' AS DECIMAL(12,2)) AND CAST('$Q6DiscHi' AS DECIMAL(12,2))
         |  AND l_quantity < $Q6MaxQty""".stripMargin,

    // q102: TPC-H Q19 shape — per-clause conjunctions OR'd post-join;
    // money in DECIMAL(12,2) like q87. The clause list is generated
    // from the same Q19Bands constant as the Spark plan.
    "q102_band_revenue" -> {
      val clauses = Q19Bands.map { case (b, sLo, sHi, qLo, qHi) =>
        s"""(p_brand = '$b' AND p_size BETWEEN $sLo AND $sHi
           |    AND l_quantity >= $qLo AND l_quantity <= $qHi)""".stripMargin
      }.mkString("\n   OR ")
      s"""SELECT
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE $clauses""".stripMargin
    },

    // q103: TPC-H Q22 shape — the above-average comparison is integer
    // cross-multiplied (bal_cents * n_pos > sum_pos_cents) so no float
    // average exists to disagree about at the boundary; sums kept in
    // BIGINT (DuckDB widens to HUGEINT otherwise — q88 lesson).
    "q103_dormant_rich" ->
      s"""WITH pos AS (
         |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_pos,
         |         CAST(count(*) AS BIGINT) AS n_pos
         |  FROM customer WHERE c_acctbal > 0),
         |active AS (
         |  SELECT DISTINCT o_custkey FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '$Q22From 00:00:00'
         |    AND o_orderdate < TIMESTAMP '$Q22Until 00:00:00')
         |SELECT c_mktsegment,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  round(CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100, 6) AS total_balance
         |FROM customer, pos
         |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_pos
         |  AND c_custkey NOT IN (SELECT o_custkey FROM active)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // q104: TPC-H Q17 shape — the per-group average gate is integer
    // cross-multiplied exactly like the Spark plan
    // (qty·n·fracInv < Σqty ⟺ qty < avg/fracInv; quantities integral
    // in this corpus), so no float average exists at the boundary.
    // Window form mirrors the single-pass Spark plan shape.
    "q104_small_qty_revenue" ->
      s"""WITH j AS (
         |  SELECT l_partkey,
         |    CAST(round(l_quantity) AS BIGINT) AS qty_u,
         |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = '$Q17Brand'),
         |w AS (
         |  SELECT qty_u, price,
         |    CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n_part,
         |    CAST(sum(qty_u) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty
         |  FROM j)
         |SELECT round(CAST(sum(price) AS DOUBLE), 6) AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_small
         |FROM w WHERE qty_u * n_part * $Q17FracInv < sum_qty""".stripMargin,

    // q105: TPC-H Q18 shape — HAVING on an integral quantity sum, then
    // join back; ordering (o_totalprice desc, o_orderkey) is total
    // because orderkey is unique, so the LIMIT cut line is exact.
    "q105_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) > $Q18MinQty)
         |SELECT c_name, c_custkey, o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  round(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 6) AS o_totalprice,
         |  total_qty
         |FROM orders JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT $Q18TopN""".stripMargin,

    // q106: TPC-H Q15 shape — max-with-TIES via decimal-exact equality
    // against the scalar max (both sides the same exact DECIMAL sum, so
    // equality cannot split a tie the way a float max-join could).
    "q106_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS r
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '$Q15From 00:00:00'
         |    AND l_shipdate < TIMESTAMP '$Q15Until 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 6) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE r = (SELECT max(r) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    // q107: TPC-H Q11 shape — revenue in exact 10⁻⁴-unit BIGINTs (the
    // DECIMAL(12,2)×(1−DECIMAL(12,2)) product has scale 4, so ×10000 is
    // exactly integral per row) and the ×-of-average gate is integer
    // cross-multiplied (r·np·den > tot·num), mirroring the Spark plan.
    "q107_revenue_concentration" ->
      s"""WITH per AS (
         |  SELECT l_partkey,
         |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)) AS BIGINT) AS r_units,
         |    CAST(count(*) AS BIGINT) AS n_items
         |  FROM lineitem GROUP BY l_partkey),
         |g AS (
         |  SELECT CAST(sum(r_units) AS BIGINT) AS tot,
         |    CAST(count(*) AS BIGINT) AS np
         |  FROM per)
         |SELECT l_partkey,
         |  round(CAST(r_units AS DOUBLE) / 10000, 6) AS revenue,
         |  n_items,
         |  round(CAST(r_units AS DOUBLE) * CAST(np AS DOUBLE)
         |    / CAST(tot AS DOUBLE), 6) AS x_avg
         |FROM per, g
         |WHERE r_units * np * $Q11Den > tot * $Q11Num
         |ORDER BY revenue DESC, l_partkey""".stripMargin,

    // q108: TPC-H Q21 shape — both correlated existentials collapsed
    // into one per-order aggregate (n_supp = 1 ⟹ max(l_suppkey) IS the
    // sole supplier), exactly the Spark plan's single-shuffle form;
    // (n_solo_orders desc, s_suppkey) is a total order so LIMIT is exact.
    "q108_sole_supplier" ->
      s"""WITH per_order AS (
         |  SELECT l_orderkey,
         |    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
         |    max(l_suppkey) AS the_supp
         |  FROM lineitem GROUP BY l_orderkey),
         |solo AS (
         |  SELECT the_supp, CAST(count(*) AS BIGINT) AS n_solo_orders
         |  FROM per_order WHERE n_supp = 1 GROUP BY the_supp)
         |SELECT s_suppkey, s_name, n_solo_orders
         |FROM solo JOIN supplier ON the_supp = s_suppkey
         |ORDER BY n_solo_orders DESC, s_suppkey LIMIT $Q21TopN""".stripMargin,

    // q109: TPC-H Q2 shape — the per-(part,supplier) offer is a DECIMAL
    // min (no unit-price division), so the tie-keeping equality
    // join-back is exact on both engines; round(·,6) on a 2-dec acctbal
    // is identity, so the ORDER BY sees the same doubles.
    "q109_cheapest_supplier" ->
      s"""WITH rs AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = '$Q2Region'),
         |pk AS (
         |  SELECT p_partkey FROM part
         |  WHERE p_type = '$Q2Type'
         |    AND p_size IN (${Q2Sizes.mkString(", ")})),
         |offers AS (
         |  SELECT l_partkey, l_suppkey, s_name, s_acctbal, n_name,
         |    min(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS offer
         |  FROM lineitem JOIN pk ON l_partkey = p_partkey
         |  JOIN rs ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2, 3, 4, 5),
         |best AS (
         |  SELECT l_partkey AS b_partkey, min(offer) AS best_offer
         |  FROM offers GROUP BY 1)
         |SELECT round(s_acctbal, 6) AS s_acctbal, s_name, n_name,
         |  l_partkey, l_suppkey, round(CAST(offer AS DOUBLE), 6) AS min_price
         |FROM offers JOIN best
         |  ON l_partkey = b_partkey AND offer = best_offer
         |ORDER BY s_acctbal DESC, s_name, l_partkey LIMIT $Q2TopN""".stripMargin,

    // q110: TPC-H Q12 shape — both conditional counts in one pass;
    // sums cast to BIGINT (DuckDB widens integer sums to HUGEINT
    // otherwise — q88 lesson).
    "q110_priority_shipping" -> {
      val crit = Q12Critical.map(p => s"'$p'").mkString(", ")
      s"""SELECT l_returnflag,
         |  CAST(sum(CASE WHEN o_orderpriority IN ($crit)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ($crit)
         |    THEN 0 ELSE 1 END) AS BIGINT) AS other_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '$Q12From 00:00:00'
         |  AND l_shipdate < TIMESTAMP '$Q12Until 00:00:00'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    // q111: TPC-H Q16 shape — the at-risk exclusion is written NOT IN
    // here but the subquery is provably non-NULL (s_suppkey is a key),
    // so it matches the engine's LEFT ANTI plan; the pair set distincts
    // before the bucket count.
    "q111_supplier_diversity" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand <> '$Q16ExclBrand'
         |    AND p_size IN (${Q16Sizes.mkString(", ")})
         |    AND l_suppkey NOT IN
         |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
         |SELECT p_brand, p_type, p_size,
         |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM pairs GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // q112: TPC-H Q20 shape — integral quantity sums, integer
    // cross-multiplied dominance gate (q·den > total·num), semi-join
    // written IN (provably non-NULL key set).
    "q112_dominant_suppliers" ->
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '$Q20From 00:00:00'
         |    AND l_shipdate < TIMESTAMP '$Q20Until 00:00:00'
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT l_suppkey, q,
         |    CAST(sum(q) OVER (PARTITION BY l_partkey) AS BIGINT) AS total
         |  FROM ps)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN
         |  (SELECT DISTINCT l_suppkey FROM tot WHERE q * $Q20Den > total * $Q20Num)
         |ORDER BY s_name""".stripMargin,

    // q113: TPC-H Q7 shape — revenue in DECIMAL, year() integral, the
    // symmetric disjunctive pair predicate verbatim on both engines.
    "q113_binational_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '$Q7From 00:00:00'
         |  AND l_shipdate < TIMESTAMP '$Q7Until 00:00:00'
         |  AND ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
         |    OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    // q154: TPC-H Q9 shape — the partsupp cost leg stands in as the
    // exact DECIMAL min observed offer per (part, supplier) over
    // lineitem (the q109 discipline); profit = disc - min_offer is
    // exact DECIMAL subtraction summed exactly, cast once, round 6.
    "q154_q9_profit" ->
      s"""WITH cost AS (
         |  SELECT l_partkey AS c_part, l_suppkey AS c_supp,
         |    min(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS min_offer
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (1 - CAST(l_discount AS DECIMAL(12,2))) - min_offer) AS DOUBLE), 6)
         |    AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN cost ON l_partkey = c_part AND l_suppkey = c_supp
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%$Q9NameLike%'
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,

    // q114: TPC-H Q8 shape — numerator/denominator as exact DECIMAL
    // sums in one conditional pass, then the q98 share recipe: each
    // sum casts to double once (exact below 2^53 scale-units), one
    // shared-IEEE division, round 6.
    "q114_market_share" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(12,2))
         |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS disc,
         |    n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = '$Q8Region'
         |    AND o_orderdate >= TIMESTAMP '$Q8From 00:00:00'
         |    AND o_orderdate < TIMESTAMP '$Q8Until 00:00:00'
         |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '$Q8Type'))
         |SELECT o_year,
         |  round(CAST(sum(CASE WHEN supp_nation = '$Q8Nation' THEN disc
         |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(sum(disc) AS DOUBLE), 6) AS mkt_share,
         |  round(CAST(sum(CASE WHEN supp_nation = '$Q8Nation' THEN disc
         |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE), 6) AS nation_revenue,
         |  round(CAST(sum(disc) AS DOUBLE), 6) AS total_revenue
         |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    // q115: the Bloom gate is exactness-preserving (see ngramContamSql
    // scaladoc) — identical oracle to q36.
    "q115_bloom_decontam" -> ngramContamSql,

    // q116: fvecs export → DSv2 re-ingest differential. The oracle
    // re-derives idx as the id rank over the SAME clean set the writer
    // exports, and norms go integer (round·1e6, the q82 recipe) before
    // the bucket sum — a lost/dup/corrupt record anywhere in the
    // roundtrip breaks the hash.
    "q116_fvecs_roundtrip" ->
      s"""WITH clean AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |idxd AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
         |    CAST(round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) * 1000000) AS BIGINT) AS norm_u
         |  FROM clean)
         |SELECT idx % 16 AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(norm_u) AS BIGINT) AS sum_norm_u
         |FROM idxd GROUP BY 1 ORDER BY 1""".stripMargin,

    // q119: embedding drift — reference geography from the even-id half
    // (stride 2·IvfStep rows are all even), one argmin pass, integer
    // ppm shares (floor) + micro-unit means (the q51 recipe).
    "q119_embedding_drift" ->
      s"""WITH cents AS (
         |  SELECT vec_id // ${2 * IvfStep} AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % ${2 * IvfStep} = 0 AND ${cleanEmb("embedding")}),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id, dist FROM (
         |    SELECT vec_id, centroid_id, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |micro AS (
         |  SELECT centroid_id, vec_id % 2 AS half,
         |    CAST(round(dist * 1000000) AS BIGINT) AS dist_micro
         |  FROM assigned),
         |percell AS (
         |  SELECT centroid_id,
         |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
         |    CAST(sum(CASE WHEN half = 0 THEN dist_micro ELSE 0 END) AS BIGINT) AS s_ref,
         |    CAST(sum(CASE WHEN half = 1 THEN dist_micro ELSE 0 END) AS BIGINT) AS s_cur
         |  FROM micro GROUP BY centroid_id),
         |tot AS (
         |  SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
         |    CAST(sum(n_cur) AS BIGINT) AS tot_cur FROM percell)
         |SELECT centroid_id, n_ref, n_cur,
         |  CAST(n_ref * 1000000 // tot_ref AS BIGINT) AS share_ref_ppm,
         |  CAST(n_cur * 1000000 // tot_cur AS BIGINT) AS share_cur_ppm,
         |  CAST(n_cur * 1000000 // tot_cur - n_ref * 1000000 // tot_ref AS BIGINT) AS delta_ppm,
         |  CAST(CASE WHEN n_ref > 0 THEN s_ref // n_ref ELSE -1 END AS BIGINT) AS mean_ref_micro,
         |  CAST(CASE WHEN n_cur > 0 THEN s_cur // n_cur ELSE -1 END AS BIGINT) AS mean_cur_micro,
         |  CAST(abs(n_cur * 1000000 // tot_cur - n_ref * 1000000 // tot_ref) >= 2000 AS INT) AS drifted
         |FROM percell CROSS JOIN tot ORDER BY centroid_id""".stripMargin,

    "q120_corpus_shuffle" ->
      s"""WITH keyed AS (
         |  SELECT doc_id,
         |    ${hash60(s"(CAST(doc_id AS VARCHAR) || ':$ShuffleEpoch')")} AS skey
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(skey % $ShuffleShards AS INT) AS shard,
         |  CAST(row_number() OVER (
         |    PARTITION BY skey % $ShuffleShards
         |    ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
         |FROM keyed ORDER BY shard, pos""".stripMargin,

    "q122_maxsim" ->
      s"""WITH toks AS (
         |  SELECT vec_id // $MaxSimTokensPerDoc AS mdoc_id, vec_id, embedding
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qv FROM toks
         |  WHERE mdoc_id = $MaxSimQueryDoc),
         |scored AS (
         |  SELECT t.mdoc_id, q.q_id,
         |    CAST(round(round(${dotd("t.embedding", "q.qv")}, 6) * 1000000) AS BIGINT) AS dot_micro
         |  FROM toks t CROSS JOIN q),
         |best AS (
         |  SELECT mdoc_id, q_id, max(dot_micro) AS best_micro
         |  FROM scored GROUP BY 1, 2)
         |SELECT mdoc_id,
         |  CAST(sum(best_micro) AS BIGINT) AS maxsim_micro,
         |  CAST(count(*) AS BIGINT) AS n_qtokens
         |FROM best GROUP BY mdoc_id
         |ORDER BY maxsim_micro DESC, mdoc_id LIMIT $MaxSimTopN""".stripMargin,

    "q122b_maxsim_batch" -> {
      val panel = MaxSimPanel.mkString("(", ", ", ")")
      s"""WITH toks AS (
         |  SELECT vec_id // $MaxSimTokensPerDoc AS mdoc_id, vec_id, embedding
         |  FROM embeddings),
         |q AS (
         |  SELECT mdoc_id AS q_doc, vec_id AS q_id, embedding AS qv FROM toks
         |  WHERE mdoc_id IN $panel),
         |scored AS (
         |  SELECT q.q_doc, t.mdoc_id, q.q_id,
         |    CAST(round(round(${dotd("t.embedding", "q.qv")}, 6) * 1000000) AS BIGINT) AS dot_micro
         |  FROM toks t CROSS JOIN q),
         |best AS (
         |  SELECT q_doc, mdoc_id, q_id, max(dot_micro) AS best_micro
         |  FROM scored GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT q_doc, mdoc_id,
         |    CAST(sum(best_micro) AS BIGINT) AS maxsim_micro,
         |    CAST(count(*) AS BIGINT) AS n_qtokens
         |  FROM best GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY q_doc ORDER BY maxsim_micro DESC, mdoc_id) AS rn
         |  FROM agg)
         |SELECT q_doc, mdoc_id, maxsim_micro, n_qtokens
         |FROM ranked WHERE rn <= $MaxSimTopN
         |ORDER BY q_doc, maxsim_micro DESC, mdoc_id""".stripMargin
    },

    // q194: theta-sketch audience algebra — below ThetaK distinct per
    // segment the sketches are EXACT, so the oracle states the exact
    // distinct set algebra (the q186 convention, plus union/difference
    // which only the sketch serves at scale).
    "q194_audience_sketch" ->
      s"""WITH tu AS (
         |  SELECT DISTINCT o_orderpriority AS segment, o_custkey AS u
         |  FROM orders),
         |n AS (SELECT segment, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY 1),
         |ov AS (
         |  SELECT a.segment AS seg_a, b.segment AS seg_b,
         |    CAST(count(*) AS BIGINT) AS overlap
         |  FROM tu a JOIN tu b ON a.u = b.u AND a.segment < b.segment
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT na.segment AS seg_a, nb.segment AS seg_b,
         |    na.n AS n_a, nb.n AS n_b
         |  FROM n na JOIN n nb ON na.segment < nb.segment)
         |SELECT p.seg_a, p.seg_b, p.n_a, p.n_b,
         |  p.n_a + p.n_b - COALESCE(ov.overlap, 0) AS n_union,
         |  COALESCE(ov.overlap, 0) AS n_intersect,
         |  p.n_a - COALESCE(ov.overlap, 0) AS n_diff_a
         |FROM pairs p
         |LEFT JOIN ov ON p.seg_a = ov.seg_a AND p.seg_b = ov.seg_b
         |ORDER BY p.seg_a, p.seg_b""".stripMargin,

    // q213: Count-Min panel — the sketch grid is DETERMINISTIC (d row
    // hashes carved from one md5, disjoint 7-hex windows), so the
    // oracle rebuilds the exact same d×w counters from token counts
    // via group-by and answers the same min-over-rows point queries;
    // the Spark side builds the grid as a single-row mergeable
    // aggregate with zero token-grain exchange.
    "q213_cms_panel" ->
      s"""WITH tk AS (
         |  SELECT t.term
         |  FROM (SELECT ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t),
         |cnt AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
         |  FROM tk GROUP BY 1),
         |rws AS (SELECT unnest(range(0, $CmsDepth)) AS i),
         |grid AS (
         |  SELECT r.i,
         |    ('0x' || substr(md5(c.term), 1 + 7 * r.i, 7))::BIGINT % $CmsWidth
         |      AS b,
         |    CAST(sum(c.exact_cnt) AS BIGINT) AS bc
         |  FROM cnt c CROSS JOIN rws r GROUP BY 1, 2),
         |panel AS (
         |  SELECT term, exact_cnt FROM cnt
         |  ORDER BY exact_cnt DESC, term LIMIT $CmsPanelK),
         |est AS (
         |  SELECT p.term, p.exact_cnt, CAST(min(g.bc) AS BIGINT) AS cms_cnt
         |  FROM panel p CROSS JOIN rws r
         |  JOIN grid g ON g.i = r.i
         |    AND g.b = ('0x' || substr(md5(p.term), 1 + 7 * r.i, 7))::BIGINT
         |      % $CmsWidth
         |  GROUP BY 1, 2)
         |SELECT term, exact_cnt, cms_cnt, cms_cnt - exact_cnt AS overest
         |FROM est ORDER BY exact_cnt DESC, term""".stripMargin,

    // q216: association rules — baskets, exact integer supports, the
    // same integer support gate (100·sup ≥ pct·n), double conf/lift
    // rounded before ranking.
    "q216_assoc_rules" ->
      s"""WITH baskets AS (
         |  SELECT DISTINCT l_orderkey AS o, p_brand AS item
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders
         |  FROM baskets),
         |isup AS (
         |  SELECT item, CAST(count(*) AS BIGINT) AS sup
         |  FROM baskets GROUP BY 1),
         |psup AS (
         |  SELECT x.item AS ia, y.item AS ib, CAST(count(*) AS BIGINT) AS sup_ab
         |  FROM baskets x JOIN baskets y ON x.o = y.o AND x.item < y.item
         |  GROUP BY 1, 2
         |  HAVING CAST(count(*) AS BIGINT) * 100 >=
         |    (SELECT n_orders FROM nn) * $RuleMinSupPct),
         |rules AS (
         |  SELECT ia AS ant, ib AS cons, sup_ab FROM psup
         |  UNION ALL
         |  SELECT ib AS ant, ia AS cons, sup_ab FROM psup)
         |SELECT r.ant, r.cons, r.sup_ab AS support,
         |  round(CAST(r.sup_ab AS DOUBLE) / a.sup, 6) AS confidence,
         |  round(CAST(r.sup_ab AS DOUBLE) * CAST(nn.n_orders AS DOUBLE) /
         |    (CAST(a.sup AS DOUBLE) * CAST(c.sup AS DOUBLE)), 6) AS lift
         |FROM rules r
         |JOIN isup a ON a.item = r.ant
         |JOIN isup c ON c.item = r.cons
         |CROSS JOIN nn
         |ORDER BY lift DESC, ant, cons LIMIT $RuleTopN""".stripMargin,

    // q221: RFM segmentation — customer frame + three standard-ntile
    // scores over mirrored (measure, custkey) tie orders (the q97
    // cross-engine ntile precedent), exact cents.
    "q221_rfm_segments" ->
      s"""WITH pc AS (
         |  SELECT o_custkey,
         |    max(epoch_us(o_orderdate) // 86400000000) AS last_day,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM orders GROUP BY 1),
         |mx AS (SELECT max(epoch_us(o_orderdate) // 86400000000)
         |  AS corpus_day FROM orders),
         |scored AS (
         |  SELECT pc.*, mx.corpus_day - pc.last_day AS recency,
         |    ntile(5) OVER (ORDER BY mx.corpus_day - pc.last_day DESC,
         |      pc.o_custkey) AS r_score,
         |    ntile(5) OVER (ORDER BY pc.freq ASC, pc.o_custkey) AS f_score,
         |    ntile(5) OVER (ORDER BY pc.cents ASC, pc.o_custkey) AS m_score
         |  FROM pc, mx)
         |SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT)
         |  AS f_score, CAST(m_score AS INT) AS m_score,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(cents) AS BIGINT) AS total_cents
         |FROM scored GROUP BY 1, 2, 3
         |ORDER BY r_score, f_score, m_score""".stripMargin,

    // q222: token entropy — per-term −p·ln p floor-quantized to micro
    // BEFORE the per-doc sum (the q38 discipline), integer rollups.
    "q222_token_entropy" ->
      s"""WITH tf AS (
         |  SELECT doc_id, source, t.term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, source, ${toks()} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2, 3),
         |dl AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len
         |  FROM tf GROUP BY 1),
         |pd AS (
         |  SELECT tf.doc_id, tf.source,
         |    CAST(sum(CAST(floor(
         |      (-(CAST(tf.tf AS DOUBLE) / dl.len) *
         |        ln(CAST(tf.tf AS DOUBLE) / dl.len)) * 1e6)
         |      AS BIGINT)) AS BIGINT) AS ent_micro
         |  FROM tf JOIN dl USING (doc_id) GROUP BY 1, 2)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ent_micro) // count(*) AS BIGINT) AS mean_entropy_micro,
         |  CAST(min(ent_micro) AS BIGINT) AS min_entropy_micro,
         |  CAST(max(ent_micro) AS BIGINT) AS max_entropy_micro
         |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin,

    // q223: Good-Turing unseen mass — N, V, N1, N2 off one
    // (source, term) rollup; two exact-operand ratios at 6dp.
    "q223_good_turing" ->
      s"""WITH tf AS (
         |  SELECT source, t.term, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, ${toks("lower(text)")} AS ts FROM documents),
         |  LATERAL (SELECT unnest(ts) AS term) t
         |  GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS total_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab_size,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / sum(c), 6) AS p0_unseen,
         |  round(CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
         |    THEN 2.0 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
         |      / sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
         |    ELSE 0.0 END, 6) AS c1_star
         |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,

    // q224: distinct-n diversity — per (source, n) exact distinct/total
    // over the unioned 1/2/3-gram streams (list_slice windows mirror
    // Spark's sequence+slice transform; len < n yields no rows on both
    // engines).
    "q224_ngram_diversity" -> {
      val grams = (1 to DiversityMaxN).map { n =>
        if (n == 1) "SELECT source, 1 AS n, unnest(t) AS gram FROM tk"
        else
          s"""SELECT source, $n AS n,
             |    unnest(list_transform(range(1, len(t) - $n + 2),
             |      i -> array_to_string(list_slice(t, i, i + $n - 1), ' '))) AS gram
             |  FROM tk""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH tk AS (
         |  SELECT source, ${toks("lower(text)")} AS t FROM documents),
         |g AS (
         |  $grams)
         |SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
         |  CAST(count(DISTINCT ${hash60("gram")}) AS BIGINT) AS distinct_ngrams,
         |  round(CAST(count(DISTINCT ${hash60("gram")}) AS DOUBLE) / count(*), 6) AS diversity
         |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // q225: HITS — the same integer-micro half-rounds unrolled
    // (raw sums of exact integers, renormalized by raw*1e6 // max(raw)
    // each half-round), MATERIALIZED so the edge CTE is built once.
    // q228: IVF-routed MaxSim — q48's cents/assigned/probed derivation
    // (round-6 L2, centroid-id tie-break) composed with q122's exact
    // micro-unit MaxSim scorer, restricted to candidate docs (any doc
    // with a token resident in a cell probed by any query token).
    "q228_maxsim_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |  WHERE vec_id // $MaxSimTokensPerDoc = $MaxSimQueryDoc),
         |probed AS (
         |  SELECT DISTINCT centroid_id FROM (
         |    SELECT q.q_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${l2sq("c.c_emb", "q.qv")}, 6), c.centroid_id) AS rn
         |    FROM q CROSS JOIN cents c)
         |  WHERE rn <= $MaxSimNProbe),
         |scored AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    round(${l2sq("v.embedding", "c.c_emb")}, 6) AS dist
         |  FROM embeddings v CROSS JOIN cents c
         |  WHERE ${cleanEmb("v.embedding")}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
         |    FROM scored) WHERE rn = 1),
         |cand AS (
         |  SELECT DISTINCT a.vec_id // $MaxSimTokensPerDoc AS mdoc_id
         |  FROM assigned a JOIN probed p USING (centroid_id)),
         |toks AS (
         |  SELECT vec_id // $MaxSimTokensPerDoc AS mdoc_id, vec_id, embedding
         |  FROM embeddings),
         |scoredm AS (
         |  SELECT t.mdoc_id, q.q_id,
         |    CAST(round(round(${dotd("t.embedding", "q.qv")}, 6) * 1000000) AS BIGINT) AS dot_micro
         |  FROM toks t JOIN cand USING (mdoc_id) CROSS JOIN q),
         |best AS (
         |  SELECT mdoc_id, q_id, max(dot_micro) AS best_micro
         |  FROM scoredm GROUP BY 1, 2)
         |SELECT mdoc_id,
         |  CAST(sum(best_micro) AS BIGINT) AS maxsim_micro,
         |  CAST(count(*) AS BIGINT) AS n_qtokens
         |FROM best GROUP BY mdoc_id
         |ORDER BY maxsim_micro DESC, mdoc_id LIMIT $MaxSimTopN""".stripMargin,

    // q227: Q21-shape wait-fault attribution — one grouped rollup to
    // (order, supplier, last_ship), the EXISTS/NOT-EXISTS correlation
    // stated as one windowed pass (supplier count, order max, at-max
    // count), then the strict-unique-last filter and the top-N.
    "q227_wait_blockers" ->
      s"""WITH sd AS (
         |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
         |  FROM lineitem GROUP BY 1, 2),
         |w AS (
         |  SELECT l_orderkey, l_suppkey, last_ship,
         |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         |    max(last_ship) OVER (PARTITION BY l_orderkey) AS dmax
         |  FROM sd),
         |m AS (
         |  SELECT *, sum(CASE WHEN last_ship = dmax THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY l_orderkey) AS n_at_max
         |  FROM w)
         |SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
         |FROM m JOIN supplier s ON m.l_suppkey = s.s_suppkey
         |WHERE n_supp >= 2 AND n_at_max = 1 AND last_ship = dmax
         |GROUP BY 1, 2
         |ORDER BY numwait DESC, s_name LIMIT $WaitTopN""".stripMargin,

    "q225_hits_rank" -> {
      val rounds = (1 to HitsIters).map { r =>
        s"""ar$r AS MATERIALIZED (
           |  SELECT e.s, CAST(sum(h.h) AS BIGINT) AS araw
           |  FROM e JOIN h${r - 1} h ON e.c = h.c GROUP BY 1),
           |a$r AS MATERIALIZED (
           |  SELECT s, araw * 1000000 // (SELECT max(araw) FROM ar$r) AS a
           |  FROM ar$r),
           |hr$r AS MATERIALIZED (
           |  SELECT e.c, CAST(sum(a.a) AS BIGINT) AS hraw
           |  FROM e JOIN a$r a ON e.s = a.s GROUP BY 1),
           |h$r AS MATERIALIZED (
           |  SELECT c, hraw * 1000000 // (SELECT max(hraw) FROM hr$r) AS h
           |  FROM hr$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |h0 AS MATERIALIZED (
         |  SELECT DISTINCT c, 1000000::BIGINT AS h FROM e),
         |$rounds,
         |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS n_customers FROM e GROUP BY 1)
         |SELECT a.s AS s_suppkey, CAST(a.a AS BIGINT) AS authority_micro,
         |  deg.n_customers
         |FROM a$HitsIters a JOIN deg USING (s)
         |ORDER BY authority_micro DESC, s_suppkey LIMIT $HitsTopN""".stripMargin
    },

    // q214: mSPRT always-valid sequential readout — the oracle states
    // the same closed-form normal-mixture likelihood ratio over the
    // same cumulative day-grain counts (exact integers under running
    // sums; exp/sqrt per the q208 precedent, 6dp after the running
    // min). 1/Λ is computed directly so huge evidence underflows to 0
    // instead of overflowing.
    "q214_sequential_test" ->
      s"""WITH base AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
         |  FROM events),
         |pu AS (
         |  SELECT user_id % 2 AS arm, min(day) AS first_day,
         |    min(CASE WHEN event_type = 'purchase' THEN day END) AS conv_day
         |  FROM base GROUP BY user_id),
         |looks AS (
         |  SELECT day, arm FROM (SELECT DISTINCT day FROM base)
         |  CROSS JOIN (SELECT unnest([0, 1]) AS arm)),
         |ent AS (
         |  SELECT arm, first_day AS day, count(*) AS e FROM pu GROUP BY 1, 2),
         |cv AS (
         |  SELECT arm, conv_day AS day, count(*) AS c FROM pu
         |  WHERE conv_day IS NOT NULL GROUP BY 1, 2),
         |cum AS (
         |  SELECT l.arm, l.day,
         |    CAST(sum(COALESCE(e.e, 0)) OVER
         |      (PARTITION BY l.arm ORDER BY l.day) AS BIGINT) AS n,
         |    CAST(sum(COALESCE(cv.c, 0)) OVER
         |      (PARTITION BY l.arm ORDER BY l.day) AS BIGINT) AS c
         |  FROM looks l
         |  LEFT JOIN ent e ON e.arm = l.arm AND e.day = l.day
         |  LEFT JOIN cv ON cv.arm = l.arm AND cv.day = l.day),
         |byday AS (
         |  SELECT day,
         |    max(CASE WHEN arm = 0 THEN n END) AS n_0,
         |    max(CASE WHEN arm = 0 THEN c END) AS conv_0,
         |    max(CASE WHEN arm = 1 THEN n END) AS n_1,
         |    max(CASE WHEN arm = 1 THEN c END) AS conv_1
         |  FROM cum GROUP BY 1),
         |stat AS (
         |  SELECT *,
         |    CAST(conv_0 AS DOUBLE) / n_0 AS p0,
         |    CAST(conv_1 AS DOUBLE) / n_1 AS p1,
         |    CAST(conv_0 + conv_1 AS DOUBLE) / (n_0 + n_1) AS pp
         |  FROM byday),
         |stat2 AS (
         |  SELECT *, pp * (1.0 - pp) * (1.0 / n_0 + 1.0 / n_1) AS v
         |  FROM stat),
         |lam AS (
         |  SELECT *,
         |    CASE WHEN n_0 = 0 OR n_1 = 0 OR v = 0 THEN 1.0
         |      ELSE least(1.0, sqrt((v + $MsprtTau * $MsprtTau) / v) *
         |        exp(-(p1 - p0) * (p1 - p0) * $MsprtTau * $MsprtTau /
         |          (2.0 * v * (v + $MsprtTau * $MsprtTau))))
         |    END AS p_look
         |  FROM stat2),
         |run AS (
         |  SELECT *, min(p_look) OVER (ORDER BY day) AS p_run FROM lam)
         |SELECT day, n_0, conv_0, n_1, conv_1,
         |  round(CASE WHEN n_0 = 0 THEN 0.0 ELSE p0 END, 6) AS rate_0,
         |  round(CASE WHEN n_1 = 0 THEN 0.0 ELSE p1 END, 6) AS rate_1,
         |  round(p_run, 6) AS p_always_valid,
         |  CAST(CASE WHEN p_run <= $MsprtAlpha THEN 1 ELSE 0 END AS INT)
         |    AS significant
         |FROM run ORDER BY day""".stripMargin,

    // q220: CMS join-size estimate — both grids rebuilt in SQL from
    // key counts (the q213 md5-window contract over the keys' decimal
    // string form), est = min over rows of the bucket-matched counter
    // dot (guarded to 0 when any row shares no bucket), graded against
    // the executed join.
    "q220_join_estimate" ->
      s"""WITH ka AS (
         |  SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
         |  WHERE l_returnflag = '$JoinEstFlag'),
         |kb AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
         |  WHERE o_orderpriority = '$JoinEstPrio'),
         |ca AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM ka GROUP BY 1),
         |cb AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM kb GROUP BY 1),
         |rws AS (SELECT unnest(range(0, $CmsDepth)) AS i),
         |ga AS (
         |  SELECT r.i,
         |    ('0x' || substr(md5(ca.k), 1 + 7 * r.i, 7))::BIGINT % $CmsJoinW
         |      AS b,
         |    CAST(sum(ca.c) AS BIGINT) AS bc
         |  FROM ca CROSS JOIN rws r GROUP BY 1, 2),
         |gb AS (
         |  SELECT r.i,
         |    ('0x' || substr(md5(cb.k), 1 + 7 * r.i, 7))::BIGINT % $CmsJoinW
         |      AS b,
         |    CAST(sum(cb.c) AS BIGINT) AS bc
         |  FROM cb CROSS JOIN rws r GROUP BY 1, 2),
         |rowdot AS (
         |  SELECT ga.i, CAST(sum(ga.bc * gb.bc) AS BIGINT) AS dot
         |  FROM ga JOIN gb ON ga.i = gb.i AND ga.b = gb.b GROUP BY 1),
         |est AS (
         |  SELECT CASE WHEN (SELECT count(*) FROM rowdot) < $CmsDepth
         |    THEN 0 ELSE (SELECT CAST(min(dot) AS BIGINT) FROM rowdot)
         |    END AS est_join),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ka),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM kb),
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_join
         |  FROM ka JOIN kb USING (k))
         |SELECT na.n_a, nb.n_b, est.est_join, ex.exact_join,
         |  est.est_join - ex.exact_join AS overest
         |FROM na, nb, est, ex""".stripMargin,

    // q195: skyline — the oracle states the textbook O(n²) NOT EXISTS
    // dominance anti-join; the Spark plan is the distributed
    // sort-and-sweep (two exchanges). Cents quantized per ROW before
    // the sum, so both engines sum exact integers.
    "q195_pareto_customers" ->
      s"""WITH pts AS (
         |  SELECT o_custkey,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS spend_cents,
         |    CAST(count(*) AS BIGINT) AS n_orders
         |  FROM orders GROUP BY 1)
         |SELECT p.o_custkey, p.spend_cents, p.n_orders
         |FROM pts p
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM pts d
         |  WHERE d.spend_cents >= p.spend_cents AND d.n_orders >= p.n_orders
         |    AND (d.spend_cents > p.spend_cents OR d.n_orders > p.n_orders))
         |ORDER BY p.spend_cents DESC, p.o_custkey""".stripMargin,

    // q196/q196b: the oracle states the naive recursive-CTE BFS over
    // the V×V pair frame; the Spark plan never materializes pairs
    // (bitmap frontier OR, one join + one agg per depth).
    "q196_graph_distances" ->
      s"""$bfsCtes
         |SELECT d, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM md GROUP BY 1 ORDER BY 1""".stripMargin,

    "q196b_harmonic_centrality" ->
      s"""$bfsCtes
         |SELECT src AS s_suppkey, CAST(count(*) AS BIGINT) AS n_reached,
         |  CAST(sum(1000000 // d) AS BIGINT) AS harmonic_micro
         |FROM md GROUP BY 1
         |ORDER BY harmonic_micro DESC, s_suppkey LIMIT $BfsTopN""".stripMargin,

    // q218: embedding communities — mutual-kNN graph over the
    // multi-probe sign-LSH candidate stream (the SAME auto-sized
    // planes/probes as the Spark path: p from the q58 pure-integer
    // comparison, LCG hyperplanes rebuilt per (table, bit), Hamming<=1
    // probe unions), exact rounded cosine + vec_id tie-break among
    // candidates, LpaRounds unrolled sync-LPA rounds (the q184 unroll
    // convention; argmax as row_number over (count desc, label)),
    // census + label-purity + modularity as double ratios of exact
    // integer counts (multiplication, not pow, matching Spark).
    "q218_communities" -> {
      def planeList(t: Int) =
        s"""[((((1664525::BIGINT * (($t * p + j) * 64 + i) + 1013904223)
           |      % 4294967296) % 2048) - 1024) / 1024.0 for i in range(0, 64)]""".stripMargin
      def bucket(t: Int) =
        s"""CAST(list_sum([CASE WHEN ${dotd("embedding", planeList(t))} >= 0
           |      THEN (1::BIGINT << j) ELSE 0 END for j in range(0, p)]) AS BIGINT)""".stripMargin
      val bucketCols = (0 until KnnGraphTables)
        .map(t => s"${bucket(t)} AS b$t").mkString(",\n    ")
      val unions = (0 until KnnGraphTables).map { t =>
        val probes = s"list_concat([b$t], [xor(b$t, 1::BIGINT << j) for j in range(0, p)])"
        s"""SELECT l.vec_id AS a, r.vec_id AS b
           |  FROM (SELECT vec_id, unnest($probes) AS bk FROM bucketed) l
           |  JOIN bucketed r ON l.bk = r.b$t AND l.vec_id < r.vec_id""".stripMargin
      }.mkString("\n  UNION\n  ")
      val rounds = (1 to LpaRounds).map { r =>
        s"""l$r AS MATERIALIZED (
           |  SELECT v, label FROM (
           |    SELECT e.s AS v, l.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY e.s
           |        ORDER BY count(*) DESC, l.label) AS rn
           |    FROM e JOIN l${r - 1} l ON e.t = l.v
           |    GROUP BY e.s, l.label)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH params AS (
         |  SELECT coalesce(list_min(
         |      [pp for pp in range(4, 31) if (1::BIGINT << pp) * $KnnGraphTarget >= n]), 30) AS p
         |  FROM (SELECT count(*) AS n FROM embeddings)),
         |bucketed AS MATERIALIZED (
         |  SELECT vec_id, p,
         |    $bucketCols
         |  FROM embeddings, params WHERE len(embedding) = 64),
         |cand AS MATERIALIZED (
         |  $unions),
         |cs AS MATERIALIZED (
         |  SELECT c.a, c.b,
         |    round(${cosine("va.embedding", "vb.embedding")}, 6) AS sim
         |  FROM cand c
         |  JOIN embeddings va ON va.vec_id = c.a
         |  JOIN embeddings vb ON vb.vec_id = c.b),
         |dir AS MATERIALIZED (
         |  SELECT a, b, sim FROM cs
         |  UNION ALL SELECT b AS a, a AS b, sim FROM cs),
         |knn AS MATERIALIZED (
         |  SELECT a, b FROM (
         |    SELECT a, b,
         |      row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
         |    FROM dir)
         |  WHERE rn <= $KnnGraphK),
         |mut AS MATERIALIZED (
         |  SELECT x.a AS s, x.b AS t FROM knn x
         |  JOIN knn y ON x.a = y.b AND x.b = y.a
         |  WHERE x.a < x.b),
         |eu AS MATERIALIZED (SELECT s, t FROM mut UNION ALL SELECT t AS s, s AS t FROM mut),
         |e AS MATERIALIZED (SELECT s, t FROM eu
         |  UNION ALL SELECT DISTINCT s, s AS t FROM eu),
         |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS label FROM e),
         |$rounds,
         |m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM mut),
         |deg AS MATERIALIZED (SELECT s AS v, count(*) AS deg FROM eu GROUP BY 1),
         |ds AS MATERIALIZED (
         |  SELECT l.label AS community, CAST(sum(d.deg) AS BIGINT) AS deg_sum,
         |    CAST(count(*) AS BIGINT) AS n_members
         |  FROM l$LpaRounds l JOIN deg d USING (v) GROUP BY 1),
         |ie AS MATERIALIZED (
         |  SELECT la.label AS community, CAST(count(*) AS BIGINT) AS internal_edges
         |  FROM mut JOIN l$LpaRounds la ON mut.s = la.v
         |  JOIN l$LpaRounds lb ON mut.t = lb.v
         |  WHERE la.label = lb.label GROUP BY 1),
         |per AS MATERIALIZED (
         |  SELECT ds.community, ds.n_members,
         |    COALESCE(ie.internal_edges, 0) AS internal_edges, ds.deg_sum
         |  FROM ds LEFT JOIN ie USING (community)),
         |q AS MATERIALIZED (
         |  SELECT round(sum(
         |    CAST(internal_edges AS DOUBLE) / m.m_edges -
         |    (CAST(deg_sum AS DOUBLE) / (2.0 * m.m_edges)) *
         |    (CAST(deg_sum AS DOUBLE) / (2.0 * m.m_edges))), 6) AS modularity
         |  FROM per, m),
         |maj AS MATERIALIZED (
         |  SELECT community, lab AS majority_label,
         |    CAST(n_lab AS BIGINT) AS n_majority
         |  FROM (
         |    SELECT l.label AS community, b.label AS lab, count(*) AS n_lab,
         |      row_number() OVER (PARTITION BY l.label
         |        ORDER BY count(*) DESC, b.label) AS rn
         |    FROM l$LpaRounds l JOIN embeddings b ON l.v = b.vec_id
         |    GROUP BY 1, 2)
         |  WHERE rn = 1)
         |SELECT per.community, per.n_members, per.internal_edges,
         |  maj.majority_label,
         |  maj.n_majority * 1000000 // per.n_members AS purity_micro,
         |  q.modularity
         |FROM per JOIN maj USING (community), q
         |ORDER BY per.n_members DESC, per.community LIMIT $LpaTopN""".stripMargin
    },

    // q203: leakage-safe split — the q43 cluster machinery + the q29
    // split rule keyed on the cluster representative; both leak dials
    // stated from the same labeled frame.
    "q203_leakage_safe_split" -> {
      def splitOf(id: String) =
        s"CASE WHEN ${hash60(s"CAST($id AS VARCHAR)")} % 100 < $TrainPct THEN 'train' ELSE 'eval' END"
      s"""WITH $minhashCtes,
         |lshpairs AS MATERIALIZED (
         |  SELECT a, b FROM cand WHERE $minhashEst >= $MinEstJaccard),
         |${ccCtes()},
         |tagged AS (
         |  SELECT d.doc_id, l.cluster_id,
         |    ${splitOf("COALESCE(l.cluster_id, d.doc_id)")} AS split,
         |    ${splitOf("d.doc_id")} AS naive_split
         |  FROM documents d LEFT JOIN labeled l USING (doc_id)),
         |dials AS (
         |  SELECT
         |    CAST(COALESCE(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS leaky_clusters_safe,
         |    CAST(COALESCE(sum(CASE WHEN nns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS leaky_clusters_naive
         |  FROM (
         |    SELECT cluster_id, count(DISTINCT split) AS ns,
         |      count(DISTINCT naive_split) AS nns
         |    FROM tagged WHERE cluster_id IS NOT NULL GROUP BY 1))
         |SELECT t.split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN t.cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_docs,
         |  CAST(count(DISTINCT t.cluster_id) AS BIGINT) AS n_clusters,
         |  any_value(d.leaky_clusters_safe) AS leaky_clusters_safe,
         |  any_value(d.leaky_clusters_naive) AS leaky_clusters_naive
         |FROM tagged t CROSS JOIN dials d
         |GROUP BY 1 ORDER BY t.split""".stripMargin
    },

    // q208: Kaplan-Meier — the identical ordered grid, n(t) and the
    // survival log-sum as one windowed pass; censored rows carry d=0
    // (ln 1 = 0) so they shape n(t) without touching S.
    "q208_survival_km" ->
      s"""WITH t0 AS (
         |  SELECT user_id, min(ts) AS t0 FROM events
         |  WHERE event_type = 'view' GROUP BY 1),
         |tp AS (
         |  SELECT user_id, min(ts) AS tp FROM events
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |tl AS (SELECT user_id, max(ts) AS tl FROM events GROUP BY 1),
         |obs AS (
         |  SELECT
         |    CASE WHEN tp.tp IS NOT NULL AND tp.tp >= t0.t0
         |      THEN (epoch_us(tp.tp) - epoch_us(t0.t0)) // 1000000
         |      ELSE (epoch_us(tl.tl) - epoch_us(t0.t0)) // 1000000 END AS t_sec,
         |    CASE WHEN tp.tp IS NOT NULL AND tp.tp >= t0.t0
         |      THEN 1 ELSE 0 END AS ev
         |  FROM t0 JOIN tl USING (user_id) LEFT JOIN tp USING (user_id)),
         |grid AS (
         |  SELECT t_sec, CAST(count(*) AS BIGINT) AS n_at,
         |    CAST(sum(ev) AS BIGINT) AS d
         |  FROM obs GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n_total FROM grid),
         |risk AS (
         |  SELECT t_sec, n_at, d,
         |    CAST(n_total - COALESCE(sum(n_at) OVER (ORDER BY t_sec
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS n_risk
         |  FROM grid CROSS JOIN tot),
         |km AS (
         |  SELECT t_sec, n_risk, d,
         |    CASE WHEN d = n_risk THEN 0 ELSE
         |      CAST(floor(exp(sum(ln(CASE WHEN d = n_risk THEN 1.0
         |        ELSE 1.0 - CAST(d AS DOUBLE) / n_risk END))
         |      OVER (ORDER BY t_sec ROWS BETWEEN UNBOUNDED PRECEDING
         |        AND CURRENT ROW)) * 1e6 + 0.5) AS BIGINT) END
         |      AS survival_micro
         |  FROM risk)
         |SELECT t_sec, n_risk, d, survival_micro
         |FROM km WHERE d > 0 ORDER BY t_sec""".stripMargin,

    // q209: two-proportion z-test — exact counts, one mirrored double
    // expression for the statistic.
    "q209_conversion_ztest" ->
      s"""WITH pu AS (
         |  SELECT user_id % 2 AS arm,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id),
         |a AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(conv) AS BIGINT) AS c
         |  FROM pu GROUP BY 1),
         |w AS (
         |  SELECT
         |    (SELECT n FROM a WHERE arm = 0) AS n_0,
         |    (SELECT c FROM a WHERE arm = 0) AS conv_0,
         |    (SELECT n FROM a WHERE arm = 1) AS n_1,
         |    (SELECT c FROM a WHERE arm = 1) AS conv_1),
         |s AS (
         |  SELECT *, CAST(conv_0 AS DOUBLE) / n_0 AS p0,
         |    CAST(conv_1 AS DOUBLE) / n_1 AS p1,
         |    CAST(conv_0 + conv_1 AS DOUBLE) / (n_0 + n_1) AS pp
         |  FROM w),
         |s2 AS (
         |  SELECT *, sqrt(pp * (1.0 - pp) * (1.0 / n_0 + 1.0 / n_1)) AS se
         |  FROM s)
         |SELECT n_0, conv_0, n_1, conv_1,
         |  round(p0, 6) AS rate_0, round(p1, 6) AS rate_1,
         |  round(CASE WHEN se = 0 THEN 0.0 ELSE (p1 - p0) / se END, 6) AS z,
         |  CAST(CASE WHEN abs(CASE WHEN se = 0 THEN 0.0
         |      ELSE (p1 - p0) / se END) > 1.959964
         |    THEN 1 ELSE 0 END AS INT) AS significant
         |FROM s2""".stripMargin,

    // q204: the rule-based attribution panel — per-journey positions
    // from one windowed pass, every credit exact floor-divided micro.
    "q204_attribution_panel" ->
      s"""WITH pos0 AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS p
         |  FROM events),
         |pos AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN p END)
         |    OVER (PARTITION BY user_id) AS conv_pos
         |  FROM pos0),
         |touches AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n
         |  FROM pos WHERE conv_pos IS NOT NULL AND p < conv_pos)
         |SELECT event_type AS channel,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS first_touch,
         |  CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT)
         |    AS last_touch,
         |  CAST(sum(1000000 // n) AS BIGINT) AS linear_micro,
         |  CAST(sum(CASE WHEN n = 1 THEN 1000000 WHEN n = 2 THEN 500000
         |    WHEN rn = 1 OR rn = n THEN 400000
         |    ELSE 200000 // (n - 2) END) AS BIGINT) AS position_micro,
         |  CAST(sum((rn * 1000000) // ((n * (n + 1)) // 2)) AS BIGINT)
         |    AS decay_micro
         |FROM touches GROUP BY 1 ORDER BY channel""".stripMargin,

    // q201: functional-dependency audit — one block per candidate
    // pair, each mirroring the two-level distinct rollup.
    "q201_functional_deps" ->
      FdPairs.map { case (det, dep) =>
        s"""SELECT '$det' AS det_col, '$dep' AS dep_col,
           |  CAST(count(*) AS BIGINT) AS n_det,
           |  CAST(sum(deps) AS BIGINT) AS n_combos,
           |  CAST(CASE WHEN sum(CASE WHEN deps > 1 THEN 1 ELSE 0 END) = 0
           |    THEN 1 ELSE 0 END AS INT) AS holds,
           |  CASE WHEN count(*) = 0 THEN 0
           |    ELSE CAST(sum(CASE WHEN deps > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      * 1000000 // count(*) END AS violation_micro
           |FROM (
           |  SELECT det, CAST(count(*) AS BIGINT) AS deps
           |  FROM (SELECT $det AS det, $dep AS dep FROM documents GROUP BY 1, 2)
           |  GROUP BY 1)""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY det_col, dep_col"),

    // q202: CUPED readout — every moment is exact integer arithmetic
    // (HUGEINT cross moments mirror Spark's DECIMAL(38)); θ and the
    // means are then identical double expressions over exact scalars.
    "q202_cuped_readout" ->
      s"""WITH base AS (
         |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
         |    epoch_us(ts) // 86400000000 AS day
         |  FROM events),
         |piv AS (SELECT (min(day) + max(day) + 1) // 2 AS cutday FROM base),
         |pu AS (
         |  SELECT user_id % 2 AS arm,
         |    CAST(sum(CASE WHEN day < cutday THEN cents ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN day >= cutday THEN cents ELSE 0 END) AS BIGINT) AS y
         |  FROM base, piv GROUP BY user_id),
         |pooled AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         |    sum(CAST(x AS HUGEINT) * y) AS sxy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx,
         |    sum(CAST(y AS HUGEINT) * y) AS syy
         |  FROM pu),
         |arms AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |    sum(x) AS sxa, sum(y) AS sya
         |  FROM pu GROUP BY 1),
         |stats AS (
         |  SELECT *,
         |    CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
         |      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
         |        / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
         |    CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0.0
         |      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
         |        * CAST(n * sxy - sx * sy AS DOUBLE)
         |        / (CAST(n * sxx - sx * sx AS DOUBLE)
         |          * CAST(n * syy - sy * sy AS DOUBLE)) END AS rho2
         |  FROM arms CROSS JOIN pooled)
         |SELECT arm, n_users,
         |  round(CAST(sya AS DOUBLE) / (100.0 * n_users), 6) AS mean_y,
         |  round((CAST(sya AS DOUBLE) - theta *
         |      (CAST(sxa AS DOUBLE) - n_users * (CAST(sx AS DOUBLE) / n)))
         |    / (100.0 * n_users), 6) AS mean_y_cuped,
         |  round(theta, 6) AS theta,
         |  round(rho2, 6) AS var_reduction
         |FROM stats ORDER BY arm""".stripMargin
  )

  // ---------------------------------------------------------------------
  // sf1-BOUNDED oracle variants for the PQ/IVF family.
  //
  // The naive mirrors above re-derive the full N×cells assignment and
  // the N×codes PQ encode in SQL — quadratic-ish scans that time out at
  // sf1 (200 k vectors × 8 000 stride codes). These variants turn the
  // sf1 check from "Spark side sane" into an exact verdict by bounding
  // the work, not the arithmetic (every distance/rounding expression is
  // the same builder the full mirrors use, so the two cannot drift):
  //
  //  * `spark_assigned` — a VIEW the runner registers over Spark's own
  //    q09_ivf_build output at sf1. Substituting it for the derived
  //    `assigned` CTE removes the N×cells wall; the substitution is
  //    justified by `assign_spotcheck`, which re-derives the argmin
  //    EXACTLY for a deterministic 1/97 sample of vectors and emits any
  //    disagreement (the runner fails on a single row).
  //  * Search keys (q48/q57/q81) then restrict the per-vector encode to
  //    PROBED-CELL MEMBERS only — the exact set the top-k can draw
  //    from, so the verdict is complete, not sampled: |members| ≈
  //    N·nprobe/cells.
  //  * q82's per-cell report is checked exactly for the 5 smallest cell
  //    ids (the runner filters Spark's rows to the same cells).
  //  * q62 is checked exactly for its ivf and ivfpq legs (the flat
  //    pq_adc leg scores the whole corpus by definition — it is covered
  //    by the q45b sampled-universe check instead).
  //  * Flat-scoring keys (q45b/q61) use a SAMPLED UNIVERSE: every 10th
  //    vector ∪ the codebook stride rows ∪ Spark's claimed top-k
  //    (views `spark_q45b`/`spark_q61`). The bounded top-k over that
  //    universe must EQUAL Spark's: claimed scores are re-derived
  //    exactly, and any sampled vector that beat a claimed one would
  //    displace it — a one-row-in-ten exact refutation screen.
  //
  // Driven by scripts/sf1_pq_check.py; dumped by Verify as
  // oracle_sql_sf1bounded.json.
  // ---------------------------------------------------------------------

  private val Sf1SpotMod = 97 // assignment spot-check stride (~1%)
  private val Sf1SampleMod = 10 // flat-leg sampled-universe stride
  private val Sf1ErrCells = 5 // q82 sampled cell count

  /** The pqCtes encode block with enc$j restricted to a member set. */
  private def boundedPqCtes(members: String): String =
    (0 until PqM).map { j =>
      val lo = j * pqSub + 1
      val hi = lo + pqSub - 1
      s"""cb$j AS (
         |  SELECT vec_id // $IvfStep AS code,
         |    list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi) AS s
         |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
         |enc$j AS (
         |  SELECT vec_id, code AS c$j FROM (
         |    SELECT v.vec_id, c.code,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${pqSubL2("v.embedding", "c.s", lo, hi)}, 6), c.code) AS rn
         |    FROM embeddings v JOIN $members m ON m.vec_id = v.vec_id
         |    CROSS JOIN cb$j c
         |    WHERE ${cleanEmb("v.embedding")}) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private val centsCte =
    s"""cents AS (
       |  SELECT vec_id // $IvfStep AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_emb
       |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")})""".stripMargin

  val sf1Bounded: Map[String, String] = Map(
    "assign_spotcheck" ->
      s"""WITH $centsCte,
         |sample AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % $Sf1SpotMod = 0 AND ${cleanEmb("embedding")}),
         |exact AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT s.vec_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY round(${l2sq("s.embedding", "c.c_emb")}, 6), c.centroid_id) AS rn
         |    FROM sample s CROSS JOIN cents c) WHERE rn = 1)
         |SELECT e.vec_id, e.centroid_id AS expect_cell, a.centroid_id AS spark_cell
         |FROM exact e LEFT JOIN spark_assigned a USING (vec_id)
         |WHERE a.centroid_id IS NULL OR a.centroid_id <> e.centroid_id
         |ORDER BY e.vec_id""".stripMargin,

    "q48_ivfpq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |$centsCte,
         |probedc AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |members AS (
         |  SELECT a.vec_id FROM spark_assigned a JOIN probedc p USING (centroid_id)),
         |${boundedPqCtes("members")},
         |$pqDtCtes
         |SELECT e0.vec_id,
         |  round($pqDtSum, 6) AS approx_dist
         |$pqEncJoin
         |$pqDtJoins
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin,

    "q81_serve_composed" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |$centsCte,
         |probedc AS (
         |  SELECT centroid_id FROM (
         |    SELECT c.centroid_id, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $FilterNProbe)),
         |members AS (
         |  SELECT a.vec_id FROM spark_assigned a JOIN probedc p USING (centroid_id)),
         |live AS (
         |  SELECT vec_id FROM embeddings
         |  WHERE label = $FilterLabel AND vec_id % $DeleteMod <> $DeleteRem),
         |${boundedPqCtes("members")},
         |$pqDtCtes,
         |short AS (
         |  SELECT e0.vec_id,
         |    round($pqDtSum, 6) AS approx_dist
         |  $pqEncJoin
         |  $pqDtJoins
         |  JOIN live l ON l.vec_id = e0.vec_id
         |  ORDER BY approx_dist, e0.vec_id LIMIT $BqShortlist)
         |SELECT v.vec_id, round(${l2sq("v.embedding", "q.qv")}, 6) AS dist
         |FROM embeddings v JOIN short s ON v.vec_id = s.vec_id, q
         |ORDER BY dist, v.vec_id LIMIT $K""".stripMargin,

    "q57_ivfpq_residual" -> {
      def rSubL2(a: String, b: String, lo: Int, hi: Int) =
        s"list_sum(list_transform(list_zip(list_slice($a, $lo, $hi), $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
      val rCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        s"""rcb$j AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
           |    list_slice(r, $lo, $hi) AS s
           |  FROM residS),
           |renc$j AS (
           |  SELECT vec_id, code AS c$j FROM (
           |    SELECT t.vec_id, c.code,
           |      row_number() OVER (PARTITION BY t.vec_id
           |        ORDER BY round(${rSubL2("t.r", "c.s", lo, hi)}, 6), c.code) AS rn
           |    FROM residM t CROSS JOIN rcb$j c) WHERE rn = 1),
           |rdt$j AS (
           |  SELECT qr.centroid_id, c.code, round(${rSubL2("qr.qr", "c.s", lo, hi)}, 6) AS d
           |  FROM qres qr CROSS JOIN rcb$j c)""".stripMargin
      }.mkString(",\n")
      val rEncJoins = (0 until PqM).map(j => s"JOIN renc$j e$j ON e$j.vec_id = t.vec_id").mkString(" ")
      val rDtJoins = (0 until PqM)
        .map(j => s"JOIN rdt$j ON rdt$j.centroid_id = t.centroid_id AND rdt$j.code = e$j.c$j")
        .mkString(" ")
      val rDtSum = (0 until PqM).map(j => s"rdt$j.d").mkString(" + ")
      // residS = codebook stride rows only (same rows, hence the same
      // row_number codes, as the full mirror's resid subset); residM =
      // probed members only — the complete candidate set of the top-k.
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |$centsCte,
         |probedce AS (
         |  SELECT centroid_id, c_emb FROM (
         |    SELECT c.centroid_id, c.c_emb, round(${l2sq("c.c_emb", "q.qv")}, 6) AS cdist
         |    FROM cents c, q
         |    ORDER BY cdist, centroid_id LIMIT $NProbe)),
         |residS AS (
         |  SELECT v.vec_id,
         |    list_transform(list_zip(CAST(v.embedding AS DOUBLE[]), c.c_emb), x -> x[1] - x[2]) AS r
         |  FROM embeddings v
         |  JOIN spark_assigned a ON v.vec_id = a.vec_id
         |  JOIN cents c ON c.centroid_id = a.centroid_id
         |  WHERE v.vec_id % $IvfStep = $PqResOffset),
         |residM AS (
         |  SELECT v.vec_id, a.centroid_id,
         |    list_transform(list_zip(CAST(v.embedding AS DOUBLE[]), c.c_emb), x -> x[1] - x[2]) AS r
         |  FROM embeddings v
         |  JOIN spark_assigned a ON v.vec_id = a.vec_id
         |  JOIN probedce p ON p.centroid_id = a.centroid_id
         |  JOIN cents c ON c.centroid_id = a.centroid_id),
         |qres AS (
         |  SELECT p.centroid_id,
         |    list_transform(list_zip(q.qv, p.c_emb), x -> x[1] - x[2]) AS qr
         |  FROM probedce p, q),
         |$rCtes
         |SELECT t.vec_id, round($rDtSum, 6) AS approx_dist
         |FROM residM t
         |$rEncJoins
         |$rDtJoins
         |ORDER BY approx_dist, t.vec_id LIMIT $K""".stripMargin
    },

    "q82_pq_error" ->
      s"""WITH cellsample AS (
         |  SELECT DISTINCT centroid_id FROM spark_assigned
         |  ORDER BY centroid_id LIMIT $Sf1ErrCells),
         |members AS (
         |  SELECT a.vec_id, a.centroid_id
         |  FROM spark_assigned a JOIN cellsample USING (centroid_id)),
         |${(0 until PqM).map { j =>
            val lo = j * pqSub + 1
            val hi = lo + pqSub - 1
            s"""cb$j AS (
               |  SELECT vec_id // $IvfStep AS code,
               |    list_slice(CAST(embedding AS DOUBLE[]), $lo, $hi) AS s
               |  FROM embeddings WHERE vec_id % $IvfStep = 0 AND ${cleanEmb("embedding")}),
               |err$j AS (
               |  SELECT v.vec_id,
               |    CAST(round(min(round(${pqSubL2("v.embedding", "c.s", lo, hi)}, 6)) * 1000000) AS BIGINT) AS e$j
               |  FROM embeddings v JOIN members m ON m.vec_id = v.vec_id
               |  CROSS JOIN cb$j c
               |  WHERE ${cleanEmb("v.embedding")} GROUP BY v.vec_id)""".stripMargin
          }.mkString(",\n")},
         |rowerr AS (
         |  SELECT m.centroid_id,
         |    ${(0 until PqM).map(j => s"e$j").mkString(" + ")} AS err_u
         |  FROM err0 e0 ${(1 until PqM).map(j => s"JOIN err$j e$j USING (vec_id)").mkString(" ")}
         |  JOIN members m ON m.vec_id = e0.vec_id)
         |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(CAST(sum(err_u) AS DOUBLE) / count(*) / 1000000, 6) AS mean_qerr,
         |  round(CAST(max(err_u) AS DOUBLE) / 1000000, 6) AS max_qerr
         |FROM rowerr GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,

    "q62_ann_recall" -> {
      val qidList = RecallQueryIds.mkString(", ")
      // ADC lookup by JOIN on code, not by list position: the full
      // mirror's `ds[code+1]` indexing needs CONTIGUOUS stride codes,
      // and the sf1 key-shifted copies break that (vec_id//step jumps
      // 4 M between copies). The join formulation is gap-robust, and
      // the join-order explosion that forced list-indexing at full
      // scale cannot happen here: `encoded` holds only probed-cell
      // members (~N·nprobe/cells rows), not the corpus.
      val qdtCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        s"qdt$j AS MATERIALIZED (SELECT q.query_id, c.code, round(${pqSubL2("q.qv", "c.s", lo, hi)}, 6) AS d FROM qset q CROSS JOIN cb$j c)"
      }.mkString(",\n")
      val encJoins = (1 until PqM).map(j => s"JOIN enc$j e$j USING (vec_id)").mkString(" ")
      val encCols = (0 until PqM).map(j => s"e$j.c$j").mkString(", ")
      val qdtLookupJoins = (0 until PqM).map { j =>
        val qidEq = if (j == 0) "" else s" AND q$j.query_id = q0.query_id"
        s"JOIN qdt$j q$j ON q$j.code = en.c$j$qidEq"
      }.mkString("\n  ")
      val joinSum = (0 until PqM).map(j => s"q$j.d").mkString(" + ")
      s"""WITH qset AS MATERIALIZED (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id IN ($qidList)),
         |truth_dot AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, v.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${dotd("v.embedding", "q.qv")}, 6) DESC, v.vec_id) AS rn
         |    FROM embeddings v CROSS JOIN qset q) WHERE rn <= $K),
         |truth_l2 AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.query_id, v.vec_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${l2sq("v.embedding", "q.qv")}, 6), v.vec_id) AS rn
         |    FROM embeddings v CROSS JOIN qset q) WHERE rn <= $K),
         |${centsCte.replace("cents AS (", "cents AS MATERIALIZED (")},
         |probed AS MATERIALIZED (
         |  SELECT query_id, centroid_id FROM (
         |    SELECT q.query_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY round(${l2sq("c.c_emb", "q.qv")}, 6), c.centroid_id) AS rn
         |    FROM cents c CROSS JOIN qset q) WHERE rn <= $NProbe),
         |members AS MATERIALIZED (
         |  SELECT DISTINCT a.vec_id FROM spark_assigned a
         |  JOIN probed p USING (centroid_id)),
         |ivf_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, a.vec_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY round(${dotd("v.embedding", "q.qv")}, 6) DESC, a.vec_id) AS rn
         |    FROM spark_assigned a
         |    JOIN probed p ON p.centroid_id = a.centroid_id
         |    JOIN embeddings v ON v.vec_id = a.vec_id
         |    JOIN qset q ON q.query_id = p.query_id) WHERE rn <= $K),
         |${boundedPqCtes("members")},
         |$qdtCtes,
         |encoded AS MATERIALIZED (
         |  SELECT e0.vec_id, $encCols
         |  FROM enc0 e0 $encJoins),
         |adc_scored AS MATERIALIZED (
         |  SELECT q0.query_id, en.vec_id, round($joinSum, 6) AS dist
         |  FROM encoded en
         |  $qdtLookupJoins),
         |ivfpq_res AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT s.query_id, s.vec_id,
         |      row_number() OVER (PARTITION BY s.query_id ORDER BY s.dist, s.vec_id) AS rn
         |    FROM adc_scored s
         |    JOIN spark_assigned a ON a.vec_id = s.vec_id
         |    JOIN probed p ON p.query_id = s.query_id AND p.centroid_id = a.centroid_id)
         |  WHERE rn <= $K),
         |per_method AS (
         |  SELECT 'ivf' AS method, query_id, count(*) AS n
         |  FROM ivf_res JOIN truth_dot USING (query_id, vec_id) GROUP BY query_id
         |  UNION ALL
         |  SELECT 'ivfpq', query_id, count(*)
         |  FROM ivfpq_res JOIN truth_l2 USING (query_id, vec_id) GROUP BY query_id),
         |grid AS (
         |  SELECT query_id, method FROM qset
         |  CROSS JOIN (SELECT unnest(['ivf', 'ivfpq']) AS method))
         |SELECT g.query_id, g.method,
         |  CAST(coalesce(p.n, 0) AS BIGINT) AS n_hits,
         |  round(CAST(coalesce(p.n, 0) AS DOUBLE) / $K, 6) AS recall
         |FROM grid g LEFT JOIN per_method p
         |  ON p.query_id = g.query_id AND p.method = g.method
         |ORDER BY g.query_id, g.method""".stripMargin
    },

    "q45b_pq_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = $QueryVecId),
         |universe AS (
         |  SELECT vec_id FROM embeddings WHERE vec_id % $Sf1SampleMod = 0
         |  UNION SELECT vec_id FROM spark_q45b),
         |${boundedPqCtes("universe")},
         |$pqDtCtes
         |SELECT e0.vec_id,
         |  round($pqDtSum, 6) AS approx_dist
         |$pqEncJoin
         |$pqDtJoins
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin,

    "q61_rpq_search" -> {
      def hRow(i: Int) = (0 until 64)
        .map(j => if (Integer.bitCount(i & j) % 2 == 0) "0.125" else "-0.125")
        .mkString("[", ", ", "]::DOUBLE[]")
      def rotExprs(src: String) = (0 until 64)
        .map(i => dotd(src, hRow(i))).mkString(",\n      ")
      val rCtes = (0 until PqM).map { j =>
        val lo = j * pqSub + 1
        val hi = lo + pqSub - 1
        def sub(a: String, b: String) =
          s"list_sum(list_transform(list_zip(list_slice($a, $lo, $hi), $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
        s"""hcb$j AS (
           |  SELECT vec_id // $IvfStep AS code, list_slice(r, $lo, $hi) AS s
           |  FROM rot WHERE vec_id % $IvfStep = 0),
           |henc$j AS (
           |  SELECT vec_id, code AS c$j FROM (
           |    SELECT t.vec_id, c.code,
           |      row_number() OVER (PARTITION BY t.vec_id
           |        ORDER BY round(${sub("t.r", "c.s")}, 6), c.code) AS rn
           |    FROM rot t CROSS JOIN hcb$j c) WHERE rn = 1),
           |hdt$j AS (
           |  SELECT c.code, round(${sub("q.qr", "c.s")}, 6) AS d
           |  FROM q CROSS JOIN hcb$j c)""".stripMargin
      }.mkString(",\n")
      val encJoins = (0 until PqM).map(j => s"JOIN henc$j e$j ON e$j.vec_id = e0.vec_id")
        .drop(1).mkString(" ")
      val dtJoins = (0 until PqM).map(j => s"JOIN hdt$j ON hdt$j.code = e$j.c$j").mkString(" ")
      val dtSum = (0 until PqM).map(j => s"hdt$j.d").mkString(" + ")
      // rot restricted to the sampled universe ∪ codebook stride rows
      // (hcb derives from rot, so the strided rows must stay) ∪ Spark's
      // claimed top-k.
      s"""WITH rot AS (
         |  SELECT vec_id, [
         |      ${rotExprs("embedding")}] AS r
         |  FROM embeddings WHERE ${cleanEmb("embedding")}
         |    AND (vec_id % $Sf1SampleMod = 0 OR vec_id % $IvfStep = 0
         |      OR vec_id IN (SELECT vec_id FROM spark_q61))),
         |q AS (
         |  SELECT [
         |      ${rotExprs("embedding")}] AS qr
         |  FROM embeddings WHERE vec_id = $QueryVecId),
         |$rCtes
         |SELECT e0.vec_id, round($dtSum, 6) AS approx_dist
         |FROM henc0 e0
         |$encJoins
         |$dtJoins
         |ORDER BY approx_dist, e0.vec_id LIMIT $K""".stripMargin
    }
  )
}
