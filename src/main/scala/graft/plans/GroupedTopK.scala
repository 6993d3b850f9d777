package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SqlBridge

import scala.collection.mutable

/** Grouped top-k as a first-class operator — SURVEY.md §4 preference
  * (c): custom LogicalPlan + Strategy + physical operators.
  *
  *   GroupedTopKFinalExec            ⟵ exact per-key top-k
  *     └─ Exchange (hash on key)     ⟵ inserted by EnsureRequirements
  *        └─ GroupedTopKPartialExec  ⟵ per-partition per-key bounded heaps
  *
  * The shuffle carries at most k rows per (key, upstream partition) —
  * the partial/final aggregation contract applied to top-k.
  * Correctness: the global top-k of a key is a subset of the union of
  * its per-partition top-ks, so partial pruning never drops a result
  * row.
  *
  * Honesty note: since 3.5 Spark's own `InferWindowGroupLimit` gives
  * the `row_number() <= k` window formulation the same partial/final
  * prune (WindowGroupLimit Partial below the exchange), so this
  * operator is NOT a throughput win over a well-planned window query.
  * What it adds: (a) the full custom-operator ladder in one place —
  * logical node, planning strategy, distribution-driven exchange
  * insertion, partial/final execs — and (b) a heap-only path with no
  * per-partition sort and no rank column when callers only need the
  * top-k ROWS (WindowGroupLimit still sorts each partition and
  * evaluates the window function).
  */
case class GroupedTopK(groupExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
                       child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupedTopK requires k > 0, got $k")
  // An empty group list would reach ClusteredDistribution(Nil) and die
  // deep inside EnsureRequirements with an obscure requirement error;
  // fail at the API boundary instead (global top-k without groups is
  // `orderBy(...).limit(k)` — TakeOrderedAndProject already optimal).
  require(groupExprs.nonEmpty,
    "GroupedTopK requires at least one group expression; for a global top-k use orderBy(...).limit(k)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** Shared per-key bounded-heap pass: emits at most k rows per group key
  * from its input iterator (exact when the input holds every row of a
  * key, partial otherwise). */
private[plans] object TopKByKey {
  def prune(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
            order: Seq[SortOrder], k: Int, output: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, output)
    // "least" in this ordering = best (head of the reversed heap = worst kept)
    val ord = new LazilyGeneratedOrdering(order, output)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row) // transient buffer — copied only on insert
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord) // max-heap: head = worst
          heaps.put(key.copy(), h)
          h
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.dequeueAll.iterator)
  }
}

case class GroupedTopKPartialExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                                  k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    // Capture only serializable fields — the closure must not drag the
    // SparkPlan node itself to the executors.
    val (g, o, kk, out) = (groupExprs, order, k, output)
    child.execute().mapPartitions(TopKByKey.prune(_, g, o, kk, out))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKPartialExec =
    copy(child = newChild)
}

case class GroupedTopKFinalExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                                k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // EnsureRequirements inserts the hash exchange on the group key here.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupExprs, order, k, output)
    child.execute().mapPartitions(TopKByKey.prune(_, g, o, kk, out))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKFinalExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKFinalExec(g, o, k,
        GroupedTopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** DataFrame-level entry: top `k` rows per `groupCols` group under
    * the compound `orders` (e.g. `col("n_chars").desc, col("doc_id")`;
    * include a unique tiebreak for deterministic results). Registers
    * the planning strategy on the session idempotently. */
  def topK(df: DataFrame, groupCols: Seq[Column], orders: Seq[Column], k: Int): DataFrame = {
    // The DataFrame's OWN session, not the thread-local active one —
    // in a multi-session JVM the strategy must land on the session
    // that will plan this frame. Registration is synchronized: the
    // extraStrategies read-modify-write is not atomic.
    val spark = df.sparkSession
    GroupedTopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val child = SqlBridge.analyzedPlan(df)
    val sortOrders = orders.map(o => SqlBridge.eagerExpression(o) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    SqlBridge.ofRows(spark,
      GroupedTopK(groupCols.map(SqlBridge.eagerExpression), sortOrders, k, child))
  }
}
