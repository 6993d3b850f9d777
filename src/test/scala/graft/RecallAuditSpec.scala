package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, RecallAudit}

/** Round-9 ANN recall audit (q62): shape, bounds, and the full-probe
  * degeneracies that pin the audit to exact search. */
class RecallAuditSpec extends SparkSpec {
  import SparkEntry.Params._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val qids = Seq(0L, 7L, 42L)

  test("one row per (query, method); n_hits/recall consistent and bounded") {
    val rows = RecallAudit.annRecallReport(emb, IvfStep, PqM, qids, NProbe, K).collect()
    assert(rows.length == qids.length * 3)
    val keys = rows.map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keys == (for (q <- qids; m <- Seq("ivf", "pq_adc", "ivfpq")) yield (q, m)).toSet)
    rows.foreach { r =>
      val hits = r.getLong(2)
      val recall = r.getDouble(3)
      assert(hits >= 0 && hits <= K, s"n_hits $hits out of range")
      assert(recall == hits.toDouble / K, s"recall $recall != n_hits/$K")
    }
  }

  test("full probe pins the audit: ivf recall 1.0, ivfpq == pq_adc per query") {
    val nCents = Ivf.centroids(emb, IvfStep).count().toInt
    val rows = RecallAudit.annRecallReport(emb, IvfStep, PqM, qids, nCents, K).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    qids.foreach { q =>
      // full-probe IVF is exact dot search — recall must be exactly 1
      assert(rows((q, "ivf")) == K, s"query $q: full-probe ivf recall != 1.0")
      // full-probe ADC rereads every cell — identical to the flat scan
      assert(rows((q, "ivfpq")) == rows((q, "pq_adc")),
        s"query $q: full-probe ivfpq != flat ADC")
    }
  }
}
