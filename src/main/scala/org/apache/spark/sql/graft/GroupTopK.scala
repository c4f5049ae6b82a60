package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator: logical node + planner
  * strategy + physical heap operator — the whole-operator extension tier
  * (custom `LogicalPlan` → `Rule`-free strategy → `SparkPlan`) for a
  * semantics Spark's built-ins only approximate.
  *
  * The built-in shape, `row_number().over(partitionBy(g).orderBy(o)) <= k`,
  * SORTS every group in full (WindowExec: exchange + per-partition sort,
  * O(n log n) and full materialization). This operator keeps a bounded heap
  * per group — O(n log k) comparisons, O(groups·k) memory, no sort buffer —
  * the per-group analog of `TakeOrderedAndProject`, which is the reference
  * engine's defining plan shape (SURVEY §3.1) generalized to Q simultaneous
  * queries.
  */
object GroupTopK {

  /** Top `k` rows per group of `groupCols`, "top" defined by `order`
    * (e.g. `col("score").desc`, tie-breaks included). Output rows keep the
    * child schema; within a group they are emitted in `order`.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k >= 1 && groupCols.nonEmpty && order.nonEmpty)
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    ensureStrategy(spark)
    // session-aware Column → Expression conversion (Bridge's lazy wrapper
    // would leave unresolvable ColumnNode expressions in the plan)
    val sortOrder = order.map(c => spark.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val node = GroupTopKNode(groupCols.map(spark.expression), sortOrder, k,
      df.queryExecution.analyzed)
    Dataset.ofRows(spark, node)
  }

  /** Idempotently register the planner strategy on the session. */
  def ensureStrategy(spark: ClassicSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
}

/** Logical node — expressions resolve against the child via the standard
  * analyzer traversal (they are constructor args of Expression type).
  */
case class GroupTopKNode(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

/** Planner strategy: partial-then-final, the `TakeOrderedAndProject`
  * partial/final split generalized per group. The partial node runs in the
  * input partitions (no distribution requirement) and caps each group at k
  * rows per partition, so the exchange the final node's clustered
  * distribution inserts carries ≤ groups·k·P rows instead of every scored
  * row — for batch k-NN that is the difference between shuffling n·Q scored
  * pairs and shuffling Q·k·P survivors.
  */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupTopKNode =>
      val partial =
        GroupTopKExec(g.groupExprs, g.sortOrder, g.k, partial = true, planLater(g.child))
      GroupTopKExec(g.groupExprs, g.sortOrder, g.k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical operator: a single pass per partition maintains a ≤k bounded
  * heap per group — no sort of the input, memory bounded by groups·k rows.
  * Runs in two modes: `partial = true` processes input partitions as-is
  * (map-side reduction, emits ≤ groups·k rows per partition); the final
  * node declares a clustered distribution on the group keys (the planner
  * inserts the one hash exchange) and merges the partial survivors.
  * Top-k is a semigroup — topK(A ∪ B) = topK(topK(A) ∪ topK(B)) — so the
  * two-level heap composition is exact, not approximate.
  */
case class GroupTopKExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String = if (partial) "GroupTopKPartial" else "GroupTopK"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  // rows stay in their input partition — declare it, or every downstream
  // operator needing the same clustering re-shuffles the output
  // (SparkPlan's default is UnknownPartitioning)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupProjection = groupExprs
    val order = sortOrder
    val limit = k
    val outputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupProjection, childOutput)
      val ordering = RowOrdering.create(order, childOutput)
      // PriorityQueue dequeues its MAXIMUM, which under a best-first
      // ordering is the current worst row — exactly the eviction candidate.
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      numGroups += heaps.size
      heaps.valuesIterator.flatMap { h =>
        outputRows += h.size
        h.toSeq.sorted(ordering)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
