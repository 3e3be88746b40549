package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-group — the custom
  * LogicalPlan + SparkStrategy + SparkPlan path (SURVEY §2.6 O4/top-k).
  *
  * The window-function formulation (`row_number().over(partitionBy(g)
  * .orderBy(o)) <= k`) must shuffle EVERY row of every group and sort whole
  * partitions before it can drop anything. This operator keeps a bounded
  * heap of k rows per group per input partition (the map-side "partial"
  * phase), so only `numPartitions × groups × k` rows reach the shuffle, and
  * the reduce-side "final" phase merges heaps — no full sort anywhere.
  * That is the same partial/final economics as Spark's own
  * `TakeOrderedAndProjectExec`, generalized to per-group.
  *
  * Semantics: emits the SET of first-k rows per group under `order` (total
  * with a tiebreak); row order within the output is unspecified — callers
  * apply their own final ORDER BY, like any relational operator.
  *
  * Memory: O(groups-per-partition × k) rows — the same residency class as
  * hash aggregation, and strictly less than the window's full-partition
  * sort buffer.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner rule: logical TopKPerGroup → partial exec → (exchange inserted by
  * EnsureRequirements) → final exec.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val groupLocal = groupExprs
    // serializable, codegen'd on first use inside each task
    val ordering = new LazilyGeneratedOrdering(order, childOutput)
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      // heap head = WORST retained row (reverse ordering) → O(log k) evict
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          -ordering.compare(a, b)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.add(row.copy())
        else if (ordering.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerGroup (partial)" else "TopKPerGroup (final)"
}
