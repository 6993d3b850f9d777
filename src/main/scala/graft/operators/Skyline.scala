package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two maximize-dimensions — the
  * multi-criteria "best rows" query (Börzsönyi et al., ICDE 2001: the
  * SKYLINE OF operator): keep every row not DOMINATED by another, where
  * `d` dominates `p` iff `d.x >= p.x && d.y >= p.y` and is strictly
  * better in at least one dimension.
  *
  * The naive formulation is an O(n²) self-anti-join (the oracle states
  * exactly that). The 2-D skyline collapses to a SORT + running max:
  * a point survives iff its `y` beats the max `y` over all STRICTLY
  * larger `x`, and it carries the max `y` of its own `x` group. A
  * single global window would express that but serializes the whole
  * frame through one task; instead the scan is distributed as a
  * textbook parallel prefix:
  *
  *  1. group to distinct `x` → per-group `ymax` (one hash exchange);
  *  2. range-partition the group frame by `x` DESC (equal keys land in
  *     one partition, so "preceding partition" always means strictly
  *     larger `x`);
  *  3. per-partition running max via a window PARTITIONED BY the
  *     physical partition id — no global sort, no single-task frame;
  *  4. carry-in between partitions from the per-partition max-`y`
  *     table — #partitions rows, a bounded driver collect, broadcast
  *     back as a literal map.
  *
  * Survivor groups then semi-join back to the input (hash join on `x`)
  * keeping rows at their group's `ymax` — duplicates of a frontier
  * point all survive (neither dominates the other), matching the
  * NOT EXISTS semantics exactly. Total cost: two exchanges over the
  * group frame + one join, vs the quadratic pair join; at 100 TB the
  * frontier scan is the only part that grows, and it grows linearly. */
object Skyline {

  /** Frontier of `df` maximizing (`xCol`, `yCol`), both integral.
    * Output: all surviving rows (original columns), ordered by
    * `xCol` DESC then the remaining columns for determinism. */
  def paretoMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sparkContext.defaultParallelism / 4)

    val groups = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    // leanCheckpoint pins the range partitioning: the frame is read
    // twice (per-partition maxes, then the windowed scan) and the pid
    // column must mean the same physical split in both reads.
    val parts = org.apache.spark.sql.graftbridge.SqlBridge.leanCheckpoint(
      groups
        .repartitionByRange(nPart, col(xCol).desc)
        .sortWithinPartitions(col(xCol).desc)
        .withColumn("__pid", spark_partition_id()))

    // Bounded collect: one row per partition (#partitions << data).
    val pidMax: Array[(Int, Long)] = parts.groupBy("__pid")
      .agg(max("__ymax").as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // carry[pid] = max ymax over all partitions with strictly larger x
    // (= smaller pid under DESC range partitioning)
    val carry = scala.collection.mutable.Map[Int, Long]()
    var run = Long.MinValue
    pidMax.foreach { case (pid, m) => carry(pid) = run; run = math.max(run, m) }
    val carryCol: Column = carry.foldLeft(lit(Long.MinValue)) {
      case (acc, (pid, m)) => when(col("__pid") === pid, lit(m)).otherwise(acc)
    }

    val w = Window.partitionBy("__pid").orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierGroups = parts
      .withColumn("__prev",
        greatest(coalesce(max("__ymax").over(w), lit(Long.MinValue)), carryCol))
      .where(col("__ymax") > col("__prev"))
      .select(col(xCol), col("__ymax"))

    df.join(frontierGroups, Seq(xCol))
      .where(col(yCol) === col("__ymax"))
      .drop("__ymax")
  }

  /** q195: "best customers" frontier — Pareto-optimal customers over
    * (total spend, order count): nobody both spends more AND orders
    * more. Spend is exact integer cents (per-ROW rounding before the
    * sum, so the long arithmetic is engine-independent). */
  def bestCustomers(orders: DataFrame): DataFrame = {
    val pts = orders.groupBy(col("o_custkey"))
      .agg(
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_cents"),
        count(lit(1)).as("n_orders"))
    paretoMax(pts, "spend_cents", "n_orders")
      .select(col("o_custkey"), col("spend_cents"), col("n_orders"))
      .orderBy(desc("spend_cents"), asc("o_custkey"))
  }
}
