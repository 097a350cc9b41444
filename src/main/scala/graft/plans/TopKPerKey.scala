package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator for the
  * `row_number() OVER (PARTITION BY k ORDER BY s) <= k` idiom.
  *
  * This node keeps a bounded k-row heap PER KEY on the map side (the
  * top-k analog of partial aggregation: the same two-phase shape
  * `TakeOrderedAndProjectExec` gives the GLOBAL top-k), so the exchange
  * carries at most k·|keys-per-task| rows, and the final pass re-merges
  * heaps after the shuffle. Unlike Spark's own partial
  * `WindowGroupLimitExec` (3.5+), which demands SORTED input — a full
  * O(n log n) map-side Tungsten sort with spill before any pruning —
  * the heap consumes its input unsorted in O(n log k) with O(k·keys)
  * memory and no spill path at all. The rows that survive are exactly
  * the rows the window form would keep whenever the sort order is
  * total — the engine's oracle discipline everywhere (and with a
  * non-total order the window form's own answer is already
  * nondeterministic; the heap picks one of the same valid answers).
  *
  * Memory: one ≤k-row heap per distinct key per task — k·keys rows,
  * the operator's contract (the [[GroupedTopKRule]] rewrite refuses
  * k > [[GroupedTopKRule.MaxK]]). This is the same bound the REWRITTEN
  * plan's final WindowExec sort pays, so the cap is about map-side
  * hash-map growth, not a new asymptotic.
  */
case class TopKPerKey(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical grouped top-k: `partial = true` runs map-side before the
  * exchange (bounding what shuffles), `partial = false` re-merges after
  * it (requiring clustering on the keys, which EnsureRequirements
  * satisfies with one hash exchange — reused by any window/aggregate
  * above that clusters the same way).
  */
case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keyExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keys = keyExprs
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // dequeues the row that sorts LAST (the current worst of the k)
      val base = RowOrdering.create(sortOrder, childOutput)
      val ord: Ordering[UnsafeRow] = base.on((r: UnsafeRow) => r: InternalRow)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new scala.collection.mutable.PriorityQueue[UnsafeRow]()(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.foreach(out += _))
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
