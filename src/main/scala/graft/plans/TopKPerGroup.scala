// Copyright (c) 2026 graft contributors
// SPDX-License-Identifier: Apache-2.0

package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per group as a first-class physical operator — the full
  * custom-operator escalation path the engine otherwise avoids
  * (SURVEY.md §2 preference order (c): LogicalPlan + SparkStrategy +
  * SparkPlan, installable via `SparkSessionExtensions`).
  *
  * Why an operator instead of `row_number().over(window) <= k`: the
  * window plan SORTS every partition in full — O(n log n) comparisons
  * and a spill surface proportional to the data — to keep k rows per
  * group. This operator keeps a bounded heap per group (O(n log k),
  * memory O(groups × k)) and, crucially, runs TWICE: a partial pass
  * before the exchange prunes each map partition to ≤ k rows per
  * group, so the shuffle moves at most partitions × groups × k rows
  * no matter how large the fact table is. At 100 TB that turns a
  * full-data sort-shuffle into a metadata-sized one (the same
  * partial/final split Spark applies to aggregates, applied to
  * per-group top-k).
  */
object TopKPerGroup {

  /** Logical marker node: "keep the top `k` rows of each `groupExprs`
    * group under `order`". Output = child output (row-preserving).
    */
  final case class TopKPerGroupNode(groupExprs: Seq[Expression],
      order: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(
        newChild: LogicalPlan): LogicalPlan = copy(child = newChild)
  }

  /** Plans the logical node as partial → (shuffle on group keys via
    * requiredChildDistribution) → final.
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupNode(g, o, k, child) =>
        val partial =
          TopKPerGroupExec(g, o, k, planLater(child), partial = true)
        TopKPerGroupExec(g, o, k, partial, partial = false) :: Nil
      case _ => Nil
    }
  }

  /** One in-memory pass per partition: hash of bounded heaps, worst
    * kept row at each heap's head. The partial variant accepts any
    * input distribution (it only prunes); the final variant demands
    * co-located groups, which EnsureRequirements satisfies with one
    * exchange over the ALREADY-PRUNED stream.
    */
  final case class TopKPerGroupExec(groupExprs: Seq[Expression],
      order: Seq[SortOrder], k: Int, child: SparkPlan,
      partial: Boolean) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override def outputPartitioning = child.outputPartitioning

    override protected def withNewChildInternal(
        newChild: SparkPlan): SparkPlan = copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val g = groupExprs
      val o = order
      val limit = k
      val schema = child.output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(g, schema)
        val ordering = RowOrdering.create(o, schema)
        // head of each heap = the WORST kept row (reverse ordering)
        val revCmp = ordering.reverse
        val heaps =
          mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
        iter.foreach { row =>
          val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
            new java.util.PriorityQueue[InternalRow](limit + 1, revCmp))
          if (heap.size < limit) heap.offer(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.offer(row.copy())
          }
        }
        heaps.valuesIterator.flatMap { heap =>
          // drain worst-first, fill backwards → rows emit in order
          val arr = new Array[InternalRow](heap.size)
          var i = arr.length - 1
          while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
          arr.iterator
        }
      }, preservesPartitioning = true)
    }
  }

  /** Optimizer rule: a deterministic filter over ONLY the group
    * columns commutes with per-group top-k (dropping whole groups
    * can't change any surviving group's top rows), so push it below
    * the node — at scale that sends the predicate on toward the scan
    * (partition pruning / parquet pushdown) instead of filtering
    * after the heaps ran over every group.
    *
    * The guard requires every group expression to be a plain
    * Attribute, not merely that the filter's references appear among
    * the group expressions' references: with a COMPUTED group key
    * (e.g. `a % 10`) a predicate on `a` references only group-expr
    * inputs yet is not constant within a group, so pushing it below
    * the heap would change which rows win. The node is public and the
    * rule session-wide, so the guard can't rely on how topK() happens
    * to call it.
    */
  object PushFilterThroughTopK
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
    import org.apache.spark.sql.catalyst.plans.logical.Filter

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond,
          t @ TopKPerGroupNode(groupExprs, _, _, child))
          if cond.deterministic &&
            groupExprs.forall(_.isInstanceOf[Attribute]) &&
            f.condition.references.subsetOf(AttributeSet(groupExprs)) =>
        t.copy(child = Filter(cond, child))
    }
  }

  /** Install the strategy + pushdown rule on `spark` (idempotent).
    * Sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * get both automatically.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(Strategy))
      spark.experimental.extraStrategies = cur :+ Strategy
    val curOpt = spark.experimental.extraOptimizations
    if (!curOpt.contains(PushFilterThroughTopK))
      spark.experimental.extraOptimizations = curOpt :+ PushFilterThroughTopK
  }

  /** API entry: top `k` rows per `groupCols` group, ordered by
    * `order` (column name, ascending?). Ties resolve by the order
    * columns only — include a unique column for determinism.
    */
  def topK(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute = lp.output
      .find(_.name == name)
      .getOrElse(throw new NoSuchElementException(
        s"column $name not in ${lp.output.map(_.name)}"))
    val sortOrder = order.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftSql.datasetOf(spark,
      TopKPerGroupNode(groupCols.map(attr), sortOrder, k, lp))
  }
}
