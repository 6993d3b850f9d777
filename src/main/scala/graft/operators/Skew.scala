package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew (sort-merge
  * partitions split past
  * `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`), but it
  * cannot split a SINGLE key's hash bucket across tasks when one key
  * dominates (the classic null-key / celebrity-user case). Salting can:
  * scatter the big side across `salts` sub-keys and replicate the small
  * side once per salt, so the hot key fans out over `salts` tasks. The
  * small side grows ×salts — use only when it is broadcast-small or the
  * skew is worse than the replication.
  */
object Skew {

  /** Salted inner equi-join on `key`. The big side's salt is derived
    * deterministically from a hash of the whole row, so runs are
    * reproducible; the small side is replicated `salts` times via a
    * literal-array explode (no shuffle of its own). Row multiplicity is
    * preserved exactly — every big row matches exactly the one salted
    * copy of each small match.
    *
    * Limitation: rows that are BIT-IDENTICAL in every column share a
    * salt (their content cannot deterministically distinguish them), so
    * a hot key consisting of exact duplicate rows still lands in one
    * task. If that is the skew shape, add a distinguishing column
    * upstream (ingest offset, file+row position) — trading determinism
    * for `monotonically_increasing_id()` here would make replays
    * non-reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn(
      "__salt", pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
