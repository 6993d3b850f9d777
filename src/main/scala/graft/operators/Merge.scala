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

  /** SCD Type-2 dimension build — the effective-dated history every
    * warehouse keeps for slowly-changing dimensions (Kimball's type 2):
    * from a change feed of full attribute states `(key, version,
    * attrs…)`, produce one row per key per DISTINCT consecutive state
    * with `valid_from`/`valid_to` version bounds (open = NULL) and an
    * `is_current` flag. Feeds commonly RESTATE unchanged rows (a full
    * nightly extract does nothing else), so the load-bearing step is
    * consecutive-duplicate collapse: a new history row opens only when
    * a TRACKED attribute actually changes — null-safe comparison, so
    * NULL→value and value→NULL transitions count as changes.
    *
    * Scale shape: ONE hash exchange on the key serves both windows —
    * the lag (change detection) and the post-filter lead (validity
    * bounds) share partitioning AND ordering, so Catalyst plans a
    * single sort and the filter between them is row-local. Per-key
    * work is bounded by that key's version count (dimension keys have
    * handfuls of versions, never corpus-scale — skew-free by nature of
    * the data). Composes with [[graft.operators.Snapshots]]: `diff`'s
    * insert feed per version IS a change feed. */
  def scd2(changes: DataFrame, key: String, version: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "at least one tracked attribute required")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(version)
    val state = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(state, 1).over(w))
      // null-safe: first row per key (lag NULL) always opens history
      .where(col("__prev").isNull || !(col("__prev") <=> state))
      .withColumn("valid_from", col(version).cast("long"))
      .withColumn("valid_to", lead(col(version), 1).over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", version)
  }
}
