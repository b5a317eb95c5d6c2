package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  GenericInternalRow,
  JoinedRow,
  RowNumber,
  SortOrder,
  UnsafeProjection,
  WindowExpression
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** §2.8 whole-operator extension: the SQL surface for ScaleRank.
  *
  * `row_number() OVER (ORDER BY …)` written in SQL (or the Column API)
  * plans an unpartitioned WindowExec — every row through ONE task, the
  * single worst scale cliff a user can hit by accident. The DataFrame
  * helper [[graft.operators.ScaleRank]] exists for engine code; this
  * rule serves the same semantics to SQL users automatically:
  *
  * {{{
  *   Window [row_number() over (order by o) as rn]   — partitionSpec EMPTY
  *     child
  * }}}
  *
  * becomes [[GlobalRankNode]], planned as [[GlobalRankExec]]: the child
  * is globally RANGE-partitioned and locally sorted (EnsureRequirements
  * inserts the exchange — a parallel sort, not a 1-task window), then a
  * metadata-sized per-partition count pass stitches partition offsets
  * onto local positions — `RDD.zipWithIndex`'s contract inside a
  * SparkPlan. The count job reuses the exchange's shuffle files; only
  * the reduce-side local sort runs twice.
  *
  * Deliberately conservative; fires only when the window computes
  * exactly one expression, a `row_number`, with an empty partition spec
  * and a deterministic order — `rank`/`dense_rank` (tie semantics) and
  * multi-expression windows keep the stock plan.
  */
case class GlobalRankNode(
    order: Seq[SortOrder],
    rankAttr: Attribute, // keeps the window alias's exprId so parents resolve
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object GlobalRankRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.length == 1 &&
          w.orderSpec.forall(_.child.deterministic) =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
          GlobalRankNode(w.orderSpec, alias.toAttribute, w.child)
        case _ => w
      }
  }
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(order, rankAttr, child) =>
      GlobalRankExec(order, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  // a GLOBAL ordering requirement: EnsureRequirements plans a range
  // exchange + per-partition sort — the parallel shape of a total sort
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // pass 1: per-partition row counts — numPartitions longs on the
    // driver (metadata, not data). The exchange's map-side shuffle files
    // are written once and reused by pass 2.
    val counts = rdd
      .mapPartitions(it => Iterator.single(it.size.toLong), preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val childOutput = child.output
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var i = offsets(pid)
      it.map { row =>
        i += 1
        // row_number is IntegerType — mirror its overflow domain exactly
        rankRow.update(0, i.toInt)
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object GlobalRank {

  /** Ensure rule + strategy are installed on the session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(GlobalRankRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalRankRewrite
    }
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(GlobalRankStrategy)) {
      spark.experimental.extraStrategies = strategies :+ GlobalRankStrategy
    }
  }
}
