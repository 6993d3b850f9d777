package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ / dbt-test /
  * Great-Expectations class): a table's CONTRACT — non-null keys,
  * uniqueness, value ranges, categorical domains, referential
  * integrity — evaluated as data, not assumed. At 100 TB the design
  * constraint is pass COUNT, not expressiveness: every row-local
  * predicate folds into ONE aggregation pass (conditional sums —
  * map-side partials, a 1-row result), uniqueness is one key-grouped
  * pass bounded by O(distinct keys), and each referential check is one
  * anti-join that AQE broadcasts when the dimension fits. The report
  * is a DataFrame — a pipeline gates a snapshot commit
  * ([[Snapshots]]) on `n_violations == 0` rather than a human reading
  * a log.
  */
object Quality {

  /** A named row-local constraint: `pred` must hold for every row. */
  final case class Check(name: String, pred: Column)

  /** Standard constraint builders — thin, composable, and all
    * row-local (so they share the single-pass evaluation). */
  def notNull(c: String): Check = Check(s"not_null($c)", col(c).isNotNull)
  def nonNegative(c: String): Check =
    Check(s"non_negative($c)", col(c).isNotNull && col(c) >= 0)
  def inRange(c: String, lo: Long, hi: Long): Check =
    Check(s"range($c,$lo,$hi)", col(c).isNotNull && col(c) >= lo && col(c) <= hi)
  def inSet(c: String, values: Seq[String]): Check =
    Check(s"in_set($c)", col(c).isin(values: _*))
  def matches(c: String, regex: String): Check =
    Check(s"matches($c)", col(c).isNotNull && col(c).rlike(regex))

  /** Evaluate row-local checks in ONE pass: per check, the number of
    * violating rows. Output: (check, n_rows, n_violations, pass). */
  def checkRows(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    // The result rides a map() keyed by check name, and Spark's default
    // mapKeyDedupPolicy=EXCEPTION turns a duplicate name (the same
    // builder applied twice) into a whole-suite runtime failure instead
    // of a per-check report — reject it eagerly with a message that
    // names the duplicates.
    val dups = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate check name(s): ${dups.mkString(", ")} — give each check a unique name")
    val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map { case (c, i) =>
      // coalesce: sum over ZERO rows is NULL — an empty table has no
      // violations, not unknown ones.
      coalesce(sum(when(c.pred, 0L).otherwise(1L)), lit(0L)).as(s"__v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.name), col(s"__v$i"))
    }
    row.select(col("__n"), map(pairs: _*).as("__m"))
      .select(col("__n"), explode(col("__m")).as(Seq("check_name", "n_violations")))
      .select(col("check_name"), col("__n").as("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Uniqueness: number of key values carried by more than one row,
    * and the surplus rows they account for. One key-grouped pass. */
  def checkUnique(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(when(col("__c") > 1, 1L).otherwise(0L)), lit(0L)).as("dup_keys"),
        coalesce(sum(when(col("__c") > 1, col("__c") - 1).otherwise(0L)), lit(0L))
          .as("surplus_rows"))
      .select(lit(s"unique($key)").as("check_name"),
        col("dup_keys"), col("surplus_rows"),
        (col("dup_keys") === 0L).as("pass"))

  /** Referential integrity: rows of `df` whose `fk` has no match in
    * `dim.pk` — an anti-join count (null FKs are orphans: a null never
    * equi-matches, which is also the SQL semantics of a lost
    * reference). */
  def checkRef(df: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame =
    df.select(col(fk))
      .join(dim.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .select(lit(s"ref($fk)").as("check_name"), col("orphans"),
        (col("orphans") === 0L).as("pass"))

  /** The full suite over the corpus star: one report row per
    * constraint, ordered by check name — the shape a commit gate
    * consumes. The range check is deliberately tight enough to FAIL on
    * this corpus (long documents exist), so the report demonstrably
    * detects violations rather than rubber-stamping. */
  def corpusReport(docs: DataFrame, events: DataFrame,
                   customer: DataFrame): DataFrame = {
    val rowChecks = checkRows(docs, Seq(
      notNull("doc_id"),
      nonNegative("n_chars"),
      inRange("n_chars", 1L, 400L),
      inSet("lang", Seq("en", "de", "fr", "es", "zh")),
      notNull("text"),
      matches("source", "^src[0-9]+$")))
      .select(col("check_name"), col("n_violations"), col("pass"))
    val unique = checkUnique(docs, "doc_id")
      .select(col("check_name"), col("dup_keys").as("n_violations"), col("pass"))
    val ref = checkRef(events, "user_id", customer, "c_custkey")
      .select(col("check_name"), col("orphans").as("n_violations"), col("pass"))
    rowChecks.unionByName(unique).unionByName(ref).orderBy("check_name")
  }
}
