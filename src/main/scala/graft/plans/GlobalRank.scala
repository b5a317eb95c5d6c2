package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Add,
  Alias,
  Attribute,
  AttributeReference,
  BindReferences,
  Cast,
  Expression,
  GenericInternalRow,
  If,
  IntegralDivide,
  JoinedRow,
  LessThanOrEqual,
  Literal,
  Multiply,
  NTile,
  Remainder,
  RowNumber,
  SortOrder,
  Subtract,
  UnsafeProjection,
  WindowExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  Join,
  JoinHint,
  LogicalPlan,
  Project,
  UnaryNode,
  Window
}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

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

/** Second idiom served by the same machinery: GLOBAL `ntile(k)` — a
  * 1-task window in stock Spark — rewritten to GlobalRank + a
  * broadcast count + the closed-form tile mapping (the first n mod k
  * tiles take ⌈n/k⌉ rows; q57's arithmetic as a reusable rule). The
  * extra cost vs the stock plan is one count scan of the child; the
  * win is that the sort fans out. Edge k ≥ n never divides by zero:
  * the If's else branch is lazily evaluated and unreachable there
  * (boundary = n covers every rank).
  */
object GlobalNtileRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.length == 1 &&
          w.orderSpec.forall(_.child.deterministic) =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(NTile(Literal(k: Int, IntegerType)), _), name)
            if k >= 1 =>
          val rankAttr = AttributeReference("_gn_rank", IntegerType, nullable = false)()
          val ranked = GlobalRankNode(w.orderSpec, rankAttr, w.child)
          val cntAlias = Alias(
            AggregateExpression(
              org.apache.spark.sql.catalyst.expressions.aggregate.Count(Seq(Literal(1))),
              org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
              isDistinct = false
            ),
            "_gn_n"
          )()
          val cnt = Aggregate(Nil, Seq(cntAlias), w.child)
          val joined = Join(ranked, cnt, Cross, None, JoinHint.NONE)
          val n = cntAlias.toAttribute
          val rn = Cast(rankAttr, LongType)
          val kL = Literal(k.toLong, LongType)
          val one = Literal(1L, LongType)
          val nBig = Remainder(n, kL)
          val sizeBig = IntegralDivide(Subtract(Add(n, kL), one), kL)
          val sizeSmall = IntegralDivide(n, kL)
          val boundary = Multiply(nBig, sizeBig)
          val tile = If(
            LessThanOrEqual(rn, boundary),
            Add(IntegralDivide(Subtract(rn, one), sizeBig), one),
            Add(Add(nBig, IntegralDivide(Subtract(Subtract(rn, boundary), one), sizeSmall)), one)
          )
          val out = Alias(Cast(tile, IntegerType), name)(exprId = alias.exprId)
          Project(w.child.output :+ out, joined)
        case _ => w
      }
  }

}

/** Third idiom: GLOBAL RUNNING TOTAL — `sum(x) OVER (ORDER BY … ROWS
  * UNBOUNDED PRECEDING)` with no PARTITION BY (ScaleRank.withRunningSum
  * as an optimizer rule). Same two-pass contract as GlobalRank with the
  * count pass swapped for per-partition value sums. Conservative: fires
  * only for a single NON-NULLABLE LongType sum (null prefixes would
  * need SQL's all-null-frame-is-null semantics; other numeric widths
  * keep the stock plan).
  */
case class GlobalPrefixSumNode(
    order: Seq[SortOrder],
    sumExpr: Expression, // the summand, bound against child.output
    outAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object GlobalPrefixSumRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.length == 1 &&
          w.orderSpec.forall(_.child.deterministic) =>
      w.windowExpressions.head match {
        case alias @ Alias(
              WindowExpression(
                AggregateExpression(Sum(e, _), _, false, _, _),
                org.apache.spark.sql.catalyst.expressions.WindowSpecDefinition(
                  _,
                  _,
                  org.apache.spark.sql.catalyst.expressions.SpecifiedWindowFrame(
                    org.apache.spark.sql.catalyst.expressions.RowFrame,
                    org.apache.spark.sql.catalyst.expressions.UnboundedPreceding,
                    org.apache.spark.sql.catalyst.expressions.CurrentRow
                  )
                )
              ),
              _
            ) if e.dataType == LongType && !e.nullable && e.deterministic =>
          GlobalPrefixSumNode(w.orderSpec, e, alias.toAttribute, w.child)
        case _ => w
      }
  }
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(order, rankAttr, child) =>
      GlobalRankExec(order, rankAttr, planLater(child)) :: Nil
    case GlobalPrefixSumNode(order, sumExpr, outAttr, child) =>
      GlobalPrefixSumExec(order, sumExpr, outAttr, planLater(child)) :: Nil
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

case class GlobalPrefixSumExec(
    order: Seq[SortOrder],
    sumExpr: Expression,
    outAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val se = sumExpr
    val partials = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(se, childOutput)
          var s = 0L
          it.foreach(r => s += bound.eval(r).asInstanceOf[Long])
          Iterator.single(s)
        },
        preservesPartitioning = true
      )
      .collect()
    val offsets = partials.scanLeft(0L)(_ + _)
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val bound = BindReferences.bindReference(se, childOutput)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val sumRow = new GenericInternalRow(1)
      var acc = offsets(pid)
      it.map { row =>
        acc += bound.eval(row).asInstanceOf[Long]
        sumRow.update(0, acc)
        proj(joined(row, sumRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object GlobalRank {

  /** Ensure rules + strategy are installed on the session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(GlobalRankRewrite, GlobalNtileRewrite, GlobalPrefixSumRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
      }
    }
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(GlobalRankStrategy)) {
      spark.experimental.extraStrategies = strategies :+ GlobalRankStrategy
    }
  }
}
