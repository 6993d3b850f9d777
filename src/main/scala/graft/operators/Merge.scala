package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE — the lake-maintenance upsert every table
  * format ships as `MERGE INTO` (Delta/Iceberg/Hudi): matched base
  * rows are REPLACED by their update row, unmatched updates INSERT,
  * untouched base rows persist byte-for-byte. The relational core is
  * two operators: an anti-join (base minus updated keys) and a union —
  * which is exactly what a format's copy-on-write writer executes per
  * touched file.
  *
  * Scale shape: the anti-join broadcasts whenever the update batch is
  * small (the overwhelmingly common MERGE: a day's corrections into a
  * years-deep table — Catalyst picks broadcast from stats); at
  * comparable scale it degrades to one hash shuffle on the key. A
  * real lake writer prunes FIRST — only files whose key-range stats
  * intersect the update batch rewrite (the [[Ivf.compact]]
  * affected-cells discipline, same idea at table scope); rows here
  * model the post-prune rewrite set. Null-key base rows never match
  * an update (anti-join null semantics) and therefore persist.
  */
object Merge {

  /** MERGE `updates` into `base` on `key`: replace-or-insert. Both
    * frames must share the output schema (enforced by unionByName). */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
}
