package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality — PageRank over an edge list, the
  * graph-analytics staple beside [[Clusters.connectedComponents]]'
  * min-label propagation (the reference has no graph surface at all;
  * a corpus pipeline meets these graphs constantly: dup-pair graphs,
  * link graphs, co-occurrence/supply bipartite graphs).
  *
  * Exactness contract (the q38/q71 integer discipline): ranks live in
  * integer MICRO-UNITS and every update is 64-bit integer arithmetic —
  * per-edge contribution is `pr div outdeg` (floor), damping is
  * `(dampNum · Σ) div dampDen` plus the `(10⁶ · (dampDen − dampNum))
  * div (dampDen · N)` teleport term. Floor division is deterministic
  * in both engines (`div` / `//`), so a FIXED iteration count is
  * hash-exact cross-engine — no float mass, no convergence epsilon.
  * (Float PageRank sums are order-dependent; integer sums are not.)
  *
  * Scale shape per iteration: one join of the rank frame with the
  * edge list on src (both hash-partitioned on the same key — AQE
  * reuses the exchange across iterations) and one groupBy(dst) with
  * map-side partial sums — 2 shuffles × `iters`, the
  * [[Clusters.connectedComponents]] cost model with a FIXED round
  * count instead of a structural one. Ranks are one long per node;
  * the total state is O(V), never O(V²).
  *
  * Overflow headroom: per-node rank ≤ 10⁶ micro-units, an in-sum ≤
  * 10⁶·indeg, so `dampNum · Σ` stays under 2⁶³ up to ~10¹¹ in-edges
  * per node — beyond any real graph's hub.
  */
object Graph {

  /** Symmetrize a directed edge list: both directions of every edge,
    * de-duplicated. PageRank over `symmetrize(e)` is undirected
    * centrality. */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Integer-micro-unit PageRank: `iters` fixed rounds at damping
    * `dampNum/dampDen` over a (src, dst) edge list. Every node present
    * in the edge list participates; on a symmetrized list there are no
    * dangling nodes (every node has out-edges), which is the intended
    * input — pass [[symmetrize]]d edges for undirected graphs.
    * Returns (node_id, pr_micro) for all nodes. */
  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Int = 85, dampDen: Int = 100,
               reliable: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen out of [0, 1]")
    val sc = edges.sparkSession.sparkContext
    // Same round-checkpoint bookkeeping as
    // [[Clusters.connectedComponents]]: pin the edge frame and each
    // round's ranks so lineage (= recomputation of the whole chain per
    // round) cannot grow with the iteration count, and free rounds the
    // loop has advanced past. Without this the r10 bench measured the
    // 3-round plan re-deriving the distinct edge list per round — 13×
    // DuckDB; pinned, the loop touches each input once.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val cp = if (reliable) df.checkpoint() else df.localCheckpoint()
      (cp, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    val (e, eIds) = checkpointTracked(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val (deg, degIds) = checkpointTracked(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    // deg already holds exactly one row per source node — the node set
    // is a projection of it, no second distinct exchange over the edges
    val nodes = deg.select(col("src").as("node_id"))
    val n = deg.count() // one job; N is a scalar in every update term
    require(n > 0, "empty edge list")
    val teleport = (1000000L * (dampDen - dampNum)) / (dampDen * n)
    var (pr, prIds) = checkpointTracked(
      nodes.withColumn("pr_micro", lit(1000000L / n)))
    (1 to iters).foreach { _ =>
      // `div`, not `/`: Column./ is DOUBLE division, and a truncated
      // double quotient can land one off the exact floor for large
      // numerators — `div` is the 64-bit integer floor both engines share
      val contrib = pr
        .join(e, pr("node_id") === e("src"))
        .join(deg, "src")
        .select(col("dst").as("node_id"),
          expr("pr_micro div outdeg").as("contrib"))
        .groupBy("node_id").agg(sum("contrib").as("s"))
      val (next, nextIds) = checkpointTracked(
        nodes.join(contrib, Seq("node_id"), "left")
          .select(col("node_id"),
            expr(s"${teleport}L + (${dampNum}L * coalesce(s, 0L)) div ${dampDen}L")
              .as("pr_micro")))
      free(prIds)
      pr = next
      prIds = nextIds
    }
    free(eIds); free(degIds)
    pr
  }

  /** Supply-graph centrality report (q88): PageRank over the bipartite
    * part–supplier co-occurrence graph (an edge per DISTINCT
    * (l_partkey, l_suppkey) pair in lineitem, namespaced 2k / 2k+1 so
    * the two key spaces can't collide), top-n nodes by rank. The
    * bipartite hub set — parts sourced everywhere, suppliers stocking
    * everything — is what a real pipeline feeds back as join-skew and
    * sampling-weight hints. */
  def supplyRank(lineitem: DataFrame, iters: Int, topN: Int): DataFrame = {
    val edges = lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pageRank(symmetrize(edges), iters)
      .select(col("node_id"),
        when(pmod(col("node_id"), lit(2L)) === 0, lit("part"))
          .otherwise(lit("supplier")).as("kind"),
        expr("node_id div 2").as("key"),
        col("pr_micro"))
      .orderBy(desc("pr_micro"), asc("node_id"))
      .limit(topN)
  }
}
