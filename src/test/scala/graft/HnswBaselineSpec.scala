package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Knn, Nsw, RecallAudit}

/** Measured comparison of the per-cell NSW + IVF-routing design
  * (operators/Nsw.scala) against a REAL single-node hierarchical HNSW
  * — the reference's index structure (HNSW.Net, Program.cs:125-204) —
  * at matched dials on the gate corpus. hnswlib/HNSW.Net themselves
  * are unreachable offline, so the baseline is a faithful in-test
  * implementation of the published algorithm (Malkov & Yashunin,
  * TPAMI 2018): exponential level assignment, greedy descent through
  * the upper layers, efConstruction beam insert with bidirectional
  * links trimmed to M (2M at layer 0), ef beam search. Dot-product
  * scoring, exactly like the reference (Program.cs:152) and the
  * distributed graph.
  *
  * What this pins: the redesign's structural claim — routing via a
  * centroid argmin + per-cell bottom-layer graphs loses little recall
  * vs the monolithic graph whose top layers it replaces — as a
  * MEASURED number (BASELINE.md "NSW vs HNSW" section), not prose. */
class HnswBaselineSpec extends SparkSpec {

  /** Minimal faithful single-node HNSW over dot-product similarity. */
  private final class Hnsw(dim: Int, m: Int, efC: Int, seed: Long) {
    private val maxM0 = 2 * m
    private val mult = 1.0 / math.log(m.toDouble)
    private val rnd = new scala.util.Random(seed)
    private val vecs = mutable.ArrayBuffer[Array[Float]]()
    private val ids = mutable.ArrayBuffer[Long]()
    // links(node)(level) = neighbor node indices
    private val links = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    private var entry = -1
    private var topLevel = -1

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      -s // smaller = closer
    }

    /** Beam search one layer from `ep`, width `ef`; returns (dist, node)
      * ascending by dist. */
    private def searchLayer(q: Array[Float], ep: Seq[Int], level: Int,
                            ef: Int): mutable.PriorityQueue[(Double, Int)] = {
      val visited = mutable.HashSet[Int](ep: _*)
      // candidates: nearest-first; results: farthest-first (cap ef)
      val cand = mutable.PriorityQueue[(Double, Int)]()(
        Ordering.by[(Double, Int), Double](_._1).reverse)
      val res = mutable.PriorityQueue[(Double, Int)]()
      ep.foreach { n => val d = dist(q, vecs(n)); cand.enqueue((d, n)); res.enqueue((d, n)) }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty && cand.head._1 <= res.head._1) {
        val (_, c) = cand.dequeue()
        links(c)(level).foreach { n =>
          if (!visited(n)) {
            visited += n
            val d = dist(q, vecs(n))
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((d, n)); res.enqueue((d, n))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
      res
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = vecs.size
      val level = math.floor(-math.log(rnd.nextDouble()) * mult).toInt
      vecs += v; ids += id
      links += Array.fill(level + 1)(mutable.ArrayBuffer[Int]())
      if (entry < 0) { entry = node; topLevel = level; return }
      var ep = entry
      // greedy descent through layers above the new node's level
      var l = topLevel
      while (l > level) {
        var improved = true
        while (improved) {
          improved = false
          links(ep)(l).foreach { n =>
            if (dist(v, vecs(n)) < dist(v, vecs(ep))) { ep = n; improved = true }
          }
        }
        l -= 1
      }
      // beam insert from min(topLevel, level) down to 0
      var eps = Seq(ep)
      l = math.min(topLevel, level)
      while (l >= 0) {
        val found = searchLayer(v, eps, l, efC).toSeq.sortBy(_._1)
        val cap = if (l == 0) maxM0 else m
        val chosen = found.take(m).map(_._2)
        chosen.foreach { n =>
          links(node)(l) += n
          links(n)(l) += node
          if (links(n)(l).size > cap) {
            val trimmed = links(n)(l)
              .sortBy(x => dist(vecs(n), vecs(x))).take(cap)
            links(n)(l) = trimmed
          }
        }
        eps = found.map(_._2)
        l -= 1
      }
      if (level > topLevel) { topLevel = level; entry = node }
    }

    def search(q: Array[Float], k: Int, ef: Int): Seq[Long] = {
      var ep = entry
      var l = topLevel
      while (l > 0) {
        var improved = true
        while (improved) {
          improved = false
          links(ep)(l).foreach { n =>
            if (dist(q, vecs(n)) < dist(q, vecs(ep))) { ep = n; improved = true }
          }
        }
        l -= 1
      }
      searchLayer(q, Seq(ep), 0, math.max(ef, k)).toSeq
        .sortBy(_._1).take(k).map(x => ids(x._2))
    }
  }

  test("per-cell NSW + IVF routing holds recall@20 against a faithful " +
    "single-node HNSW at matched M/ef on the gate corpus") {
    val k = 20
    val queryIds = Seq(0L, 7L, 42L, 101L, 250L, 333L, 512L, 777L, 1200L, 1701L)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val rows = emb.where(size(col("embedding")) === 64)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = 64

    // exact dot-product truth per query
    val byId = rows.toMap
    val truth = queryIds.map { q =>
      val qv = byId(q)
      q -> rows.map { case (id, v) =>
        (id, (0 until dim).map(i => qv(i).toDouble * v(i).toDouble).sum)
      }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap

    // single-node HNSW: M=8/efC=32/ef=64 — the distributed graph's dials
    val t0 = System.nanoTime()
    val h = new Hnsw(dim, m = 8, efC = 32, seed = 42)
    rows.foreach { case (id, v) => h.insert(id, v) }
    val hBuildMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    val hRecall = queryIds.map { q =>
      h.search(byId(q), k, ef = 64).toSet.intersect(truth(q)).size.toDouble / k
    }
    val hSearchMs = (System.nanoTime() - t1) / 1e6
    val hMean = hRecall.sum / hRecall.size

    // distributed per-cell NSW at the same graph dials. HNSW's ef=64
    // beam roams the WHOLE graph; the per-cell design deliberately
    // bounds search to nprobe cells (that bound IS the partition-
    // pruning scale story), so the comparable number is the nprobe
    // RECALL CURVE — the dial q62's autoNProbe turns — up to a
    // coverage in HNSW's ballpark, not one fixed low-coverage point.
    import graft.SparkEntry.Params.IvfStep
    val t2 = System.nanoTime()
    val graph = Nsw.build(emb, IvfStep, m = 8, efC = 32).localCheckpoint(true)
    val nBuildMs = (System.nanoTime() - t2) / 1e6
    val cents = Ivf.centroids(emb, IvfStep)
    val nCells = cents.count()
    val curve = Seq(4, 8, 16, 24).map { nprobe =>
      val t3 = System.nanoTime()
      val rows = RecallAudit.nswRecallFor(emb, graph, cents, queryIds,
        nprobe = nprobe, k = k, ef = 64).collect()
      val ms = (System.nanoTime() - t3) / 1e6
      (nprobe, rows.map(_.getDouble(3)).sum / rows.length, ms)
    }

    info(f"HNSW (single-node): build $hBuildMs%.0f ms, ${queryIds.size} " +
      f"searches $hSearchMs%.0f ms, mean recall@$k $hMean%.3f (whole-graph beam)")
    curve.foreach { case (np, r, ms) =>
      info(f"NSW per-cell: nprobe $np/$nCells -> recall@$k $r%.3f " +
        f"(batch $ms%.0f ms; graph build $nBuildMs%.0f ms)")
    }
    assert(hMean >= 0.8, f"HNSW baseline itself under-recalls: $hMean%.3f")
    val best = curve.map(_._2).max
    assert(best >= hMean - 0.1,
      f"per-cell NSW recall tops out at $best%.3f vs HNSW $hMean%.3f — " +
        "the routing redesign is losing the bottom layer, not just coverage")
    assert(curve.map(_._2) == curve.map(_._2).sorted,
      s"recall must rise with nprobe: $curve")
  }
}
