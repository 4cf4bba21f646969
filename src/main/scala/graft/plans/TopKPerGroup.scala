package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator custom plan (SURVEY.md §2.J escalation path (c)):
  * groupwise top-k as a first-class operator — logical node + planner
  * strategy + physical exec, registered through GraftExtensions.
  *
  * Spark's built-in formulation (row_number window + filter) SORTS every
  * row of every group; the udaf_topk Aggregator bounds state but must
  * pack rows into its aggregation buffer. This operator keeps the rows
  * themselves and the bounded-state execution: a per-group k-element
  * heap behind a required ClusteredDistribution — the planner inserts
  * the single hash Exchange, and each task retains at most k rows per
  * group it owns. Memory is O(groups-per-task × k) regardless of group
  * size; no per-group sort ever happens.
  */
case class TopKPerGroup(groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    ordering: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The one shuffle: co-locate each group, then the heap pass is
    * task-local. Empty grouping degenerates to global top-k on a single
    * task (AllTuples), like TakeOrderedAndProject's final stage.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val gExprs = groupExprs
    val out = output
    val kk = k
    // codegen'd row comparator; lazily (re)generated on executors
    val ord = new LazilyGeneratedOrdering(ordering, out)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, out)
      // max-heap under `ord` (compare < 0 = sorts earlier = better), so
      // the head is the WORST retained row — the eviction candidate
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // emit each group's survivors in sort order (deterministic)
      heaps.valuesIterator.flatMap(_.toSeq.sorted(ord))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans the logical node; injected via GraftExtensions. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PlanOps {
  /** Groupwise top-k through the custom operator. `orderCols` are
    * (name, ascending) pairs; include a unique tie-break column for
    * deterministic results. Column names go in as UnresolvedAttribute
    * (the analyzer resolves them against the child — Spark 4's Column
    * wrappers don't resolve inside non-builtin nodes).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Descending
    val sortOrders = orderCols.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(UnresolvedAttribute.quoted), sortOrders, k,
        df.queryExecution.analyzed))
  }
}
