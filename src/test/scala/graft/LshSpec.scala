package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.VectorFunctions

/** Quality guarantees of the multi-table sign-LSH near-dup operator on
  * constructed data with known ground truth. */
class LshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** 100 random unit vectors + a perturbed near-dup for 30 of them.
    * σ=0.02 per component → ‖noise‖≈0.16 → cos ≈ 0.987; at 8 bits ×
    * 4 tables the expected pair-collision probability is ≈0.99.
    * Deterministic seed. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 100).map(i => (i.toLong, unit()))
    val dups = (0 until 30).map { i =>
      val src = base(i)._2
      val noisy = src.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      val n = math.sqrt(noisy.map(x => x * x.toDouble).sum)
      (1000L + i, noisy.map(x => (x / n).toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("multi-table LSH finds >= 80% of planted near-dup pairs") {
    val found = Dedup.cosineLsh(corpus, nPlanes = 8, nTables = 4, threshold = 0.9, dim = dim)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 30).map(i => (i.toLong, 1000L + i)).toSet
    val recall = (planted intersect found).size.toDouble / planted.size
    assert(recall >= 0.8, s"recall = $recall over ${planted.size} planted pairs")
  }

  test("multi-probe at half the tables recovers single-probe-at-full-tables recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 30).map(i => (i.toLong, 1000L + i)).toSet
    val single2 = pairs(Dedup.cosineLsh(corpus, 8, 2, 0.9, dim))
    val multi2 = pairs(Dedup.cosineLshMultiProbe(corpus, 8, 2, 0.9, dim))
    val single4 = pairs(Dedup.cosineLsh(corpus, 8, 4, 0.9, dim))
    // Hamming<=1 probing strictly widens the candidate set per table...
    assert(single2.subsetOf(multi2),
      "multi-probe must contain every exact-bucket pair of the same tables")
    // ...and at 2 tables must find at least as many planted pairs as
    // exact-bucket probing finds with 4 (the operator's whole point:
    // recall from probes, not from more hyperplane kernels)
    val rm = (planted intersect multi2).size
    val r4 = (planted intersect single4).size
    assert(rm >= r4, s"multi-probe@2 found $rm planted pairs < single-probe@4's $r4")
  }

  test("recall report: consistent counts, high recall on planted near-dups at 0.9") {
    val labeled = corpus.withColumn("label", lit(1)) // one block: truth = all qualifying pairs
    val rep = Dedup.lshRecallReport(labeled, nPlanes = 8, nTables = 4, threshold = 0.9)
      .collect().head
    val (nt, nl, nc, rec) =
      (rep.getLong(0), rep.getLong(1), rep.getLong(2), rep.getDouble(3))
    assert(nt >= 30, "ground truth must include the planted pairs")
    assert(nc <= math.min(nt, nl))
    assert(math.abs(rec - nc.toDouble / math.max(nt, 1L)) < 1e-6)
    // cos >= 0.9 is the regime this family serves: collision prob ~0.99
    assert(rec >= 0.8, s"recall $rec at the near-dup threshold")
  }

  test("every reported pair really exceeds the threshold (no false positives)") {
    val rows = Dedup.cosineLsh(corpus, 8, 4, 0.9, dim).collect()
    assert(rows.nonEmpty)
    // Recompute cosine exactly for each reported pair.
    val byId = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { r =>
      val (a, b, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (va, vb) = (byId(a), byId(b))
      val d = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val exact = d / (math.sqrt(va.map(x => x.toDouble * x).sum) * math.sqrt(vb.map(x => x.toDouble * x).sum))
      assert(math.abs(exact - cos) < 1e-5, s"pair ($a,$b): reported $cos vs exact $exact")
      assert(cos >= 0.9)
    }
  }

  test("single-table vs multi-table: amplification strictly widens the candidate set") {
    val single = Dedup.cosineLsh(corpus, 8, 1, 0.9, dim).count()
    val multi = Dedup.cosineLsh(corpus, 8, 4, 0.9, dim).count()
    assert(multi >= single)
  }

  test("LSH output is a subset of the exact blocked pair set by value") {
    // Exact pairs via the norms-precomputed formulation on a single
    // block (test-only cross join is acceptable at 130 rows).
    val exact = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"),
        VectorFunctions.norm(col("embedding")).as("na"))
      .crossJoin(corpus.select(col("vec_id").as("b"), col("embedding").as("eb"),
        VectorFunctions.norm(col("embedding")).as("nb")))
      .where(col("a") < col("b"))
      .withColumn("cos", round(VectorFunctions.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .where(col("cos") >= 0.9)
      .select("a", "b", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.cosineLsh(corpus, 8, 4, 0.9, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(exact), s"LSH reported pairs not in exact set: ${lsh -- exact}")
  }

  test("autoPlanes tracks log2(n/target): 10x corpus adds ~log2(10) planes, " +
    "clamps hold, and the auto multiprobe keeps the verify contract") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val p1 = Dedup.autoPlanes(emb, 8)
    val n = emb.count()
    assert(p1 == math.ceil(math.log(n / 8.0) / math.log(2)).toInt, s"p1=$p1 n=$n")
    // 10x the corpus (any rows; only count matters) -> +3..4 planes
    val big = emb.unionByName(emb).unionByName(emb).unionByName(emb).unionByName(emb)
      .unionByName(emb).unionByName(emb).unionByName(emb).unionByName(emb).unionByName(emb)
    val p10 = Dedup.autoPlanes(big, 8)
    assert(p10 - p1 >= 3 && p10 - p1 <= 4, s"p1=$p1 p10=$p10")
    val tiny = Seq((1L, Seq.fill(64)(1f))).toDF("vec_id", "embedding")
    assert(Dedup.autoPlanes(tiny) == 4, "lower clamp missed")
    // every reported pair is a TRUE pair regardless of plane count
    val auto = Dedup.cosineLshMultiProbeAuto(emb, 2, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = Dedup.cosinePairs(
        emb.withColumn("label", org.apache.spark.sql.functions.lit(0)), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exactPairs), "auto multiprobe broke the verify contract")
  }
}
