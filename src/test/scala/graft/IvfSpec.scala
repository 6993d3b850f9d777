package graft

import graft.operators.{Ivf, Knn}

/** IVF approximate search quality + index persistence roundtrip. */
class IvfSpec extends SparkSpec {
  import SparkEntry.Params._

  private def emb = Tables.embeddings(spark, sf001)

  test("IVF search recall@20 >= 0.9 vs exact top-k at sf0.01") {
    val q = Knn.queryVector(emb, QueryVecId)
    val exact = Knn.topKDot(emb, q, K).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val approx = Ivf.searchInline(emb, IvfStep, q, NProbe, K).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / K
    assert(recall >= 0.9, s"recall@$K = $recall (exact=$exact approx=$approx)")
  }

  test("persisted index roundtrips: postings cover every vector exactly once") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_spec"
    Ivf.save(emb, IvfStep, path)
    val (postings, cents) = Ivf.load(spark, path)
    val n = emb.count()
    assert(postings.count() === n)
    assert(postings.select("vec_id").distinct().count() === n)
    assert(cents.count() === Ivf.centroids(emb, IvfStep).count())
    // Search over the loaded index == inline search (same plan semantics)
    val q = Knn.queryVector(emb, QueryVecId)
    val fromDisk = Ivf.search(postings, cents, q, NProbe, K)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = Ivf.searchInline(emb, IvfStep, q, NProbe, K)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromDisk === inline)
  }
}
