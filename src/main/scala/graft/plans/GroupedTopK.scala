package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.SparkShim
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan: top-k rows PER GROUP, with a 1-based `rank`
  * column appended — the operator behind every "top n per partition" pattern
  * here (ANN per-query neighbors, per-language top words, TopCount sets).
  *
  * The DataFrame spelling, `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k`, plans as WindowExec: a FULL SORT of every group's
  * rows, k kept, the rest discarded — at 100 TB that is a sort of the whole
  * shuffle output. This operator instead keeps a bounded heap of k rows per
  * group on each input partition (map side, before the exchange), shuffles
  * only ≤ k·groups pre-aggregated rows, and merges heaps on the reduce side:
  * the classic partial/final agg shape, applied to top-k. No sort of
  * anything larger than k ever happens.
  *
  * Registered as a [[SparkStrategy]] (GroupedTopKExec) — the (c) rung of the
  * custom-operator ladder: LogicalPlan + Strategy + SparkPlan, after (a)
  * composition and (b) native expressions (DotProduct, MinHashSig, ...).
  *
  * `order` must be a total order within each group (e.g. a unique id as the
  * final tiebreak) for the k winners and their ranks to be deterministic —
  * the same requirement row_number() has.
  *
  * Memory model: one k-row heap per DISTINCT group per partition, held in a
  * hash map (no spill). That's the right trade when groups ≪ rows (top-k
  * per query vector / language / flag — k·groups rows total); for
  * near-unique grouping keys prefer the sort-based window form, whose
  * external sort spills.
  */
final case class GroupedTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rank", IntegerType,
      nullable = false)())
  extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  require(groupExprs.nonEmpty,
    "GroupedTopK needs group keys; global top-k is orderBy().limit(k)")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is minted here, not read from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

object GroupedTopK {

  /** Top `k` rows of `df` per `groupCols` combination under `orderCols`
    * (wrap with .desc/.asc as needed; a plain column sorts ascending),
    * ranked 1..k in a `rank` column appended after the input columns. */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    SparkShim.addStrategy(spark, GroupedTopKStrategy)
    val sortOrder = orderCols.map(c => SparkShim.catalystExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    SparkShim.ofRows(spark,
      GroupedTopK(groupCols.map(SparkShim.catalystExpression),
        sortOrder, k, SparkShim.logicalPlan(df)))
  }
}

/** Plans [[GroupedTopK]] as partial → (exchange via EnsureRequirements) →
  * final [[GroupedTopKExec]]. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopK =>
      val partial = GroupedTopKExec(g.groupExprs, g.order, g.k,
        partial = true, rankAttr = None, planLater(g.child))
      GroupedTopKExec(g.groupExprs, g.order, g.k,
        partial = false, rankAttr = Some(g.rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group. Partial mode emits each input partition's
  * per-group survivors unranked (≤ k·groups rows into the shuffle); final
  * mode requires clustering on the group keys, merges, and emits the k
  * winners with ranks. Only k-row arrays are ever sorted. */
final case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: Option[Attribute],
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupE, orderE, childOut, kk, isPartial, rank) =
      (groupExprs, order, child.output, k, partial, rankAttr)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOut)
      val ord = RowOrdering.create(orderE, childOut) // first under ord = rank 1
      // heap head = worst retained row (reverse comparator) → O(log k) evict
      val reverse: java.util.Comparator[InternalRow] =
        (a: InternalRow, b: InternalRow) => ord.compare(b, a)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy()); ()
        }
      }
      import scala.jdk.CollectionConverters._
      if (isPartial) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        val outProj = UnsafeProjection.create(output, childOut :+ rank.get)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val arr = heap.toArray(new Array[InternalRow](heap.size))
          java.util.Arrays.sort(arr, ord)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(r, rankRow)).copy()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
