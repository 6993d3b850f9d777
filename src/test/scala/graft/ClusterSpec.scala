package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Dedup}

/** Round-5 cluster resolution: connected components over candidate
  * pairs (q43) and SemDeDup semantic pruning (q44). */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Clusters.connectedComponents(pairs.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("connectedComponents labels a chain with its minimum") {
    // 1-2, 2-3, 3-4, 4-5: one component, diameter 4 — exercises the
    // pointer jump (plain neighbor-min needs 4 rounds; this converges
    // under the maxIters guard either way, but the label must be exact)
    val out = components(Seq((2L, 3L), (1L, 2L), (4L, 5L), (3L, 4L)))
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.toSet == Set((1L, 5L)))
  }

  test("connectedComponents keeps disjoint cliques apart") {
    val clique1 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val clique2 = Seq((20L, 21L))
    val out = components(clique1 ++ clique2)
    assert(out(10L) == ((10L, 3L)) && out(11L) == ((10L, 3L)) && out(12L) == ((10L, 3L)))
    assert(out(20L) == ((20L, 2L)) && out(21L) == ((20L, 2L)))
  }

  test("connectedComponents on an empty pair set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Clusters.connectedComponents(empty).isEmpty)
  }

  test("connectedComponents matches a brute-force closure on real LSH pairs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.minhashLsh(docs, 3, 12, 2, 0.5).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // brute force: union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val got = components(pairs).map { case (n, (c, _)) => n -> c }
    assert(got == expected)
  }

  test("semDedup drops the higher-id member of a crafted near-twin only") {
    // 4 vectors, step 2 → centroids from vec 0 and 2. Vectors 0 and 1
    // are near-identical (same cluster, cos ≈ 1); vectors 2 and 3 are
    // orthogonal (same cluster, cos 0). Only 1 must drop.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)),
      (1L, v(0.99, 0.01, 0, 0)),
      (2L, v(0, 0, 1, 0)),
      (3L, v(0, 0, 0, 1))
    ).toDF("vec_id", "embedding")
    val out = Clusters.semDedup(vecs, step = 2, threshold = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(0L)._2 == 0 && out(1L)._2 == 1)
    assert(out(2L)._2 == 0 && out(3L)._2 == 0)
    assert(out(0L)._1 == out(1L)._1)
  }

  test("semDedupRefined drops the same crafted near-twin (refined centroids, same contract)") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)),
      (1L, v(0.99, 0.01, 0, 0)),
      (2L, v(0, 0, 1, 0)),
      (3L, v(0, 0, 0, 1))
    ).toDF("vec_id", "embedding")
    val out = Clusters.semDedupRefined(vecs, step = 2, threshold = 0.9, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 1, "near-twin must still drop under refined centroids")
    assert(Seq(0L, 2L, 3L).forall(out(_) == 0))
  }

  test("semDedup keep-set has no surviving near-twins within a cluster") {
    import graft.functions.VectorFunctions._
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Clusters.semDedup(vecs, 25, 0.4)
    assert(out.where(col("dropped") === 1).count() > 0) // threshold bites
    val kept = out.where(col("dropped") === 0)
      .join(vecs.select("vec_id", "embedding"), "vec_id")
      .select(col("centroid_id"), col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
    // the drop rule consults ALL lower-id members (kept or not), so in
    // particular no two KEPT members of one cluster may cross the bar
    val crossing = kept.as("l").join(kept.as("r"),
        col("l.centroid_id") === col("r.centroid_id") && col("l.vec_id") < col("r.vec_id"))
      .where(dot(col("l.embedding"), col("r.embedding"))
        / (col("l.nrm") * col("r.nrm")) >= 0.4)
    assert(crossing.isEmpty)
  }

  test("embeddingDrift: identical halves read zero drift; a shifted half flags its cell") {
    import spark.implicits._
    import graft.operators.Clusters
    // 2 cells (step=2 → stride-4 centroids at ids 0 and 4): even/odd
    // halves built IDENTICAL per cell → every delta_ppm must be 0.
    def vec(x: Float, y: Float) = Array(x, y)
    val balanced = Seq(
      0L -> vec(0f, 0f), 1L -> vec(0f, 0f), 2L -> vec(0.1f, 0f), 3L -> vec(0.1f, 0f),
      4L -> vec(5f, 5f), 5L -> vec(5f, 5f), 6L -> vec(5.1f, 5f), 7L -> vec(5.1f, 5f)
    ).toDF("vec_id", "embedding")
    val even = Clusters.embeddingDrift(balanced, step = 2).collect()
    assert(even.length == 2)
    even.foreach { r =>
      assert(r.getLong(5) == 0L, s"delta_ppm nonzero in balanced corpus: $r")
      assert(r.getInt(8) == 0)
    }
    // Move every odd-id (current-half) row into cell 1's neighborhood:
    // cell 1 over-represents in the current half → both cells flag.
    val shifted = Seq(
      0L -> vec(0f, 0f), 1L -> vec(5f, 5f), 2L -> vec(0.1f, 0f), 3L -> vec(5.1f, 5f),
      4L -> vec(5f, 5f), 5L -> vec(5f, 5f), 6L -> vec(5.1f, 5f), 7L -> vec(5.1f, 5f)
    ).toDF("vec_id", "embedding")
    val out = Clusters.embeddingDrift(shifted, step = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(5) < 0 && out(0L).getInt(8) == 1)   // cell 0 lost current share
    assert(out(1L).getLong(5) > 0 && out(1L).getInt(8) == 1)   // cell 1 gained it
    // Share columns are exact floor-ppm of the halves.
    assert(out(1L).getLong(1) == 2L || out(0L).getLong(1) == 2L)
  }

  test("effective dim: exactly 2.0 for a two-axis corpus, 1.0 for a " +
    "collapsed one; dirty vectors drop from the count") {
    def axis(d: Int, v: Float) = {
      val a = Array.fill(64)(0f); a(d) = v; a
    }
    val twoAxis = Seq(
      (1L, axis(0, 1f)), (2L, axis(0, -1f)),
      (3L, axis(1, 1f)), (4L, axis(1, -1f)),
      (5L, null.asInstanceOf[Array[Float]]),      // dropped: null
      (6L, Array.fill(63)(0f))                     // dropped: wrong dim
    ).toDF("vec_id", "embedding")
    val r = Clusters.effectiveDim(twoAxis).collect()(0)
    assert(r.getLong(0) == 4L, s"dirty rows not dropped: $r")
    assert(r.getDouble(2) == 1.0, s"total variance: $r")     // 0.5 + 0.5
    assert(r.getDouble(3) == 2.0, s"PR should be exactly 2: $r")
    val collapsed = Seq((1L, axis(0, 1f)), (2L, axis(0, -1f)))
      .toDF("vec_id", "embedding")
    val c = Clusters.effectiveDim(collapsed).collect()(0)
    assert(c.getDouble(3) == 1.0, s"collapsed PR should be 1: $c")
  }

  test("embeddingCommunities (q218): planted orthogonal clusters are " +
    "recovered at purity 1.0 with positive modularity") {
    import spark.implicits._
    // 3 clusters of 12, each hugging its own axis with a small
    // deterministic within-cluster wobble — mutual-kNN keeps edges
    // within clusters (cross-cluster cosine ≈ 0), LPA labels each.
    def planted(k: Int) = {
      val vecs = (0 until 36).map { i =>
        val c = i / 12
        val v = Array.fill(6)(0.01f * ((i * 7 + 5) % 11))
        v(c) = 10f + (i % 12) * 0.1f
        (i.toLong, v, c)
      }.toDF("vec_id", "embedding", "label")
      Clusters.embeddingCommunities(vecs, k, 5, 20).collect()
    }
    // dense regime (k near cluster size): within-cluster mutual graph
    // is near-complete, a clique converges in one round → exact recovery
    val dense = planted(10)
    assert(dense.length == 3, s"want 3 communities: ${dense.mkString("; ")}")
    dense.foreach { r =>
      assert(r.getLong(1) == 12L, s"cluster size: $r")
      assert(r.getLong(4) == 1000000L, s"purity must be 1.0: $r")
    }
    assert(dense.map(_.getInt(3)).toSet == Set(0, 1, 2),
      "each community's majority label must be its planted cluster")
    assert(dense.head.getDouble(5) > 0.5,
      s"planted partition must score high modularity: ${dense.head}")
    // sparse regime (k=4): fixed-round LPA from singleton labels may
    // REFINE a planted cluster into sub-communities, but never mixes
    // two clusters — every community stays label-pure
    val sparse = planted(4)
    assert(sparse.forall(_.getLong(4) == 1000000L),
      s"sparse-regime communities must still be pure: ${sparse.mkString("; ")}")
    assert(sparse.map(_.getLong(1)).sum == 36L &&
      sparse.map(_.getInt(3)).toSet == Set(0, 1, 2),
      "refinement must cover all three planted clusters")
  }

  test("embeddingCommunities: a reciprocated pair settles to ONE " +
    "2-member community (the self-ballot breaks sync oscillation); " +
    "deterministic across partitionings") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(10f, 0f, 0f), 0), (2L, Array(10.1f, 0f, 0f), 0),
      (3L, Array(0f, 10f, 0f), 1), (4L, Array(0f, 10.1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Clusters.embeddingCommunities(vecs, 1, 3, 10).collect()
    assert(out.length == 2 && out.forall(_.getLong(1) == 2L),
      s"two 2-member communities expected: ${out.mkString("; ")}")
    val corpus = Tables.embeddings(spark, sf001)
    val a = Clusters.embeddingCommunities(corpus, 6, 5, 20).collect()
    val b = Clusters.embeddingCommunities(corpus.repartition(11), 6, 5, 20)
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("embeddingCommunitiesLsh (q218 shipped path): candidate-stream " +
    "communities EQUAL the exact twin on planted 64-dim clusters at " +
    "recall-sufficient dials; deterministic across partitionings") {
    import spark.implicits._
    // 4 clusters of 12 hugging orthogonal axes in the LSH dim (64):
    // within-cluster cosine ≈ 1 → per-bit sign-collision ≈ 1 → the
    // multi-probe candidate stream contains every within-cluster pair,
    // so top-k-among-candidates == exact top-k and the two paths must
    // agree row for row.
    val vecs = (0 until 48).map { i =>
      val c = i / 12
      val v = Array.fill(64)(0.003f * ((i * 7 + 5) % 11))
      v(c) = 10f + (i % 12) * 0.1f
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
    val exact = Clusters.embeddingCommunities(vecs, 6, 5, 20)
      .collect().map(_.toString).toSeq
    val lsh = Clusters.embeddingCommunitiesLsh(vecs, 6, 5, 20,
      nTables = 2, targetPerBucket = 8)
      .collect().map(_.toString).toSeq
    assert(lsh == exact,
      s"candidate path must match the exact twin:\nexact=$exact\nlsh=$lsh")
    // determinism across partitionings (the exact-path test's contract
    // extends to the shipped path)
    val corpus = Tables.embeddings(spark, sf001)
    val a = Clusters.embeddingCommunitiesLsh(corpus, 6, 5, 20, 2, 32)
      .collect().map(_.toString).toSeq
    val b = Clusters.embeddingCommunitiesLsh(corpus.repartition(11), 6, 5, 20, 2, 32)
      .collect().map(_.toString).toSeq
    assert(a == b, "LSH-path communities must not depend on partitioning")
    // the candidate stream is BOUNDED: far fewer pairs than n(n-1)/2
    val n = corpus.count()
    val cand = graft.operators.Dedup.lshCandidatesMultiProbe(corpus,
      graft.operators.Dedup.autoPlanes(corpus, 32), 2).count()
    assert(cand < n * (n - 1) / 4,
      s"candidates ($cand) must be well under all-pairs (${n * (n - 1) / 2})")
  }

  test("embeddingCommunities candidates seam is generator-agnostic: " +
    "IVF cell co-residents recover the same planted communities as the " +
    "exact twin (one assignment pass shared with the q44/q203 class)") {
    import spark.implicits._
    val vecs = (0 until 48).map { i =>
      val c = i / 12
      val v = Array.fill(64)(0.003f * ((i * 7 + 5) % 11))
      v(c) = 10f + (i % 12) * 0.1f
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
    val exact = Clusters.embeddingCommunities(vecs, 6, 5, 20)
      .collect().map(_.toString).toSeq
    // step 12 → 4 seed centroids, one per planted axis cluster: every
    // within-cluster pair is a co-resident candidate, so top-k among
    // candidates == exact top-k
    val ivf = Clusters.embeddingCommunities(vecs,
      graft.operators.Ivf.cellCandidatePairs(vecs, 12), 6, 5, 20)
      .collect().map(_.toString).toSeq
    assert(ivf == exact,
      s"IVF-routed candidates must match the exact twin:\nexact=$exact\nivf=$ivf")
  }

  test("labelPropagation: two cliques joined by one bridge edge keep " +
    "distinct labels; a single clique converges to its min id") {
    import spark.implicits._
    def clique(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a < b
    } yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val labels = graft.operators.Graph.labelPropagation(edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (1L to 5L).map(labels)
    val right = (11L to 15L).map(labels)
    assert(left.toSet.size == 1 && right.toSet.size == 1,
      s"each clique must agree internally: $labels")
    assert(left.head != right.head,
      s"bridge must not merge the cliques: $labels")
  }
}
