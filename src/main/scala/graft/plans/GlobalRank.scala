package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  BindReferences,
  CumeDist,
  DenseRank,
  EvalMode,
  Expression,
  GenericInternalRow,
  JoinedRow,
  Literal,
  NTile,
  PercentRank,
  Rank,
  RowNumber,
  SortOrder,
  UnsafeProjection,
  UnsafeRow,
  WindowExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType}

/** Which global window idiom a [[GlobalRankNode]] computes. All six
  * share one physical shape — a parallel range-exchange sort plus a
  * metadata-sized per-partition stitch — differing only in what the
  * stitch carries (row counts; tie-run boundary keys; the total n;
  * cume_dist's forward head-run chain).
  */
sealed trait GlobalRankMode extends Serializable
object GlobalRankMode {
  case object RowNum extends GlobalRankMode
  case object RankTies extends GlobalRankMode
  case object DenseRankTies extends GlobalRankMode
  case object PercentRankTies extends GlobalRankMode
  case object CumeDistTies extends GlobalRankMode
  final case class NtileK(k: Int) extends GlobalRankMode
}

/** §2.8 whole-operator extension: the SQL surface for ScaleRank.
  *
  * `row_number() / rank() / dense_rank() / percent_rank() / cume_dist()
  * / ntile(k) OVER (ORDER BY …)`
  * written with an empty PARTITION BY plans an unpartitioned WindowExec
  * — every row through ONE task, the single worst scale cliff a SQL
  * user can hit by accident. This rule family serves all six from the
  * same machinery:
  *
  * {{{
  *   Window [rank() over (order by o) as r]    — partitionSpec EMPTY
  *     child
  * }}}
  *
  * becomes [[GlobalRankNode]], planned as [[GlobalRankExec]]: the child
  * is globally RANGE-partitioned and locally sorted (EnsureRequirements
  * inserts the exchange — a parallel sort, not a 1-task window), then a
  * metadata pass stitches partition offsets onto local positions. The
  * count job reuses the exchange's shuffle files; only the reduce-side
  * local sort runs twice.
  *
  * Per-mode stitch metadata (all O(numPartitions) on the driver):
  *  - row_number: per-partition row counts (zipWithIndex's contract).
  *  - ntile(k): the same counts — n is the offset array's last entry,
  *    and the uneven-tile mapping is closed-form from (rn, n, k), so
  *    ntile costs ONE scan of the child (round 13 planned a second
  *    count scan + broadcast join; round 14 reads n off the rank
  *    exec's own metadata — no duplicate subtree, no determinism
  *    hazard on nondeterministic children).
  *  - rank()/dense_rank()/percent_rank(): ties are exact across partition cuts — each
  *    partition reports (count, distinct peer groups, first/last order
  *    key, trailing-run length), and the driver walks boundaries to
  *    compute, per partition, the global rank of its HEAD peer group
  *    (which may have started many partitions back when one key spans
  *    whole partitions) and its dense-rank start (connected boundaries
  *    collapse the double-counted key). Order keys are compared as
  *    UnsafeRow bytes, which equals null-safe value equality for all
  *    non-floating types; float/double order keys keep the stock plan
  *    (-0.0/NaN byte patterns differ from SQL equality).
  *
  * Deliberately conservative: fires only on single-expression windows
  * with a deterministic order; everything else keeps the stock plan.
  */
case class GlobalRankNode(
    order: Seq[SortOrder],
    rankAttr: Attribute, // keeps the window alias's exprId so parents resolve
    mode: GlobalRankMode,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Third idiom: GLOBAL RUNNING TOTAL — `sum(x) OVER (ORDER BY … ROWS
  * UNBOUNDED PRECEDING)` with no PARTITION BY (ScaleRank.withRunningSum
  * as an optimizer rule). Same two-pass contract as GlobalRank with the
  * count pass swapped for per-partition value partials. Since round 14
  * it covers NULLABLE inputs (per-partition partials carry an
  * any-non-null flag, so the SQL all-null-prefix-is-null semantics
  * stitch exactly) and DECIMAL sums (partials accumulate in unbounded
  * BigDecimal; each emitted prefix re-checks the result precision —
  * NULL on overflow under LEGACY, ArithmeticException under ANSI,
  * matching CheckOverflow). Long sums wrap under LEGACY exactly like
  * the stock hash aggregate; under ANSI both passes add with
  * Math.addExact — a throw can be spuriously conservative only when a
  * partition-local partial exceeds ±2⁶³ while the global prefix does
  * not (a pathological oscillating ledger), and that failure mode is
  * loud, never wrong data. `try_sum` keeps the stock plan.
  */
case class GlobalPrefixSumNode(
    order: Seq[SortOrder],
    sumExpr: Expression, // the summand, bound against child.output
    outAttr: Attribute,
    ansi: Boolean,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Seventh idiom (round 15): GLOBAL RUNNING EXTREMUM — `min(x)/max(x)
  * OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)` with no PARTITION BY
  * (the high-watermark / record-so-far / drawdown-peak query). Same
  * two-pass stitch as the prefix sum with the partial being a single
  * extremum value per partition. Unlike the rank stitches this needs
  * only ORDERING comparisons — `TypeUtils.getInterpretedOrdering`, the
  * same ordering stock Min/Max aggregate with — so float/double inputs
  * are fully supported (no byte-equality hazard; NaN/-0.0 order exactly
  * as stock). Any orderable atomic type rides it. SQL null semantics:
  * nulls are skipped, an all-null prefix emits null.
  */
case class GlobalPrefixExtremumNode(
    order: Seq[SortOrder],
    valExpr: Expression,
    outAttr: Attribute,
    isMax: Boolean,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Ninth idiom (round 15): GLOBAL RANGE-frame running sum — `sum(x)
  * OVER (ORDER BY t)` with NO frame clause, the single most common way
  * a SQL user writes a cumulative total, defaults to RANGE BETWEEN
  * UNBOUNDED PRECEDING AND CURRENT ROW: every row's frame runs through
  * the END of its PEER GROUP (ties included). Distributes with the
  * prefix-sum machinery plus cume_dist's group mechanics: pass 1
  * collects per-partition (sum, any-non-null) partials AND tie
  * metadata (first/last order keys, head-group/tail-group sums);
  * inside a partition each group's value is the global prefix through
  * its end (buffer one peer group, emit on group close); only the LAST
  * group chains the following partitions' head-group sums — the same
  * forward walk as cume_dist. Float order keys keep the stock plan
  * (byte key equality); Long rides LEGACY/ANSI add semantics, Decimal
  * unbounded-BigDecimal partials with per-emission precision checks —
  * both exactly as [[GlobalPrefixSumExec]].
  */
/** Which aggregate a RANGE-frame node folds: sum, count (emit 0 when
  * nothing counted), or min/max (ordering comparisons — float INPUTS
  * legal; float ORDER KEYS are gated out for all kinds, the group
  * stitch needs byte key equality).
  */
sealed trait RangeAggKind extends Serializable
object RangeAggKind {
  case object SumK extends RangeAggKind
  case object CountK extends RangeAggKind
  final case class ExtremumK(isMax: Boolean) extends RangeAggKind
}

case class GlobalRangePrefixSumNode(
    order: Seq[SortOrder],
    sumExpr: Expression,
    outAttr: Attribute,
    ansi: Boolean,
    kind: RangeAggKind,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Eighth idiom (round 15): GLOBAL `lag(e, k)` / `lead(e, k)` — the
  * last global-window family PlanLint could only WARN about. With a
  * LITERAL offset k, the cross-partition information each partition
  * needs is exactly k evaluated values from its neighbors: lag seeds a
  * k-deep FIFO with the previous partitions' tail values; lead drains
  * its last ≤k rows against the following partitions' head values.
  * Pass 1 collects (count, first-k values, last-k values) per
  * partition — O(P·k) driver metadata, gated at k ≤ 1024 (beyond that
  * the stock plan + the lint warning stand). Non-foldable defaults
  * keep the stock plan (their cross-partition need is row-dependent).
  *
  * IGNORE NULLS (round 18 — the r17 verdict's #3): the k-th NON-NULL
  * value before/after the current row. The cross-partition need is
  * still exactly k values — the trailing/leading k NON-NULL values per
  * partition, the same O(P·k) metadata shape — plus each partition's
  * non-null COUNT so the driver walk knows when to keep crossing
  * partitions whose non-null supply ran short. Pass 2 for lag keeps a
  * k-deep FIFO of the most recent NON-NULL values (peek, don't pop —
  * null rows consume nothing); lead pairs each row with the global
  * index of its k-th following non-null value (need = nn-so-far + k)
  * and serves rows as the stream reaches their index. Lead's pending
  * buffer is bounded by k + the longest null run — versus the stock
  * plan's whole-relation single-task buffer, strictly better at any
  * null density.
  */
case class GlobalOffsetWindowNode(
    order: Seq[SortOrder],
    valExpr: Expression,
    k: Int,
    isLag: Boolean,
    default: Expression, // foldable
    ignoreNulls: Boolean,
    outAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Eleventh idiom (round 16): GLOBAL `first_value(e)` — any frame whose
  * LOWER bound is UNBOUNDED PRECEDING contains the relation's first row
  * in EVERY row's frame, so the window value is ONE GLOBAL CONSTANT
  * under the order (nondeterministic under ties exactly like stock).
  * The round-16 split measurement motivated it: a mixed window's stock
  * remainder re-sorts the whole relation in ONE task, so splitting
  * `sum + rank + first_value` only ADDED work (0.69× at 50M) — but
  * first_value was the remainder, and as a constant it needs no window
  * at all: pass 1 takes each partition's first (or first non-null, for
  * IGNORE NULLS) evaluated value — O(P) driver metadata off the same
  * shuffle files — and pass 2 attaches the winning constant. With it,
  * `sum + rank + first_value OVER w` runs with NO single-task pass
  * anywhere.
  */
case class GlobalFirstValueNode(
    order: Seq[SortOrder],
    valExpr: Expression,
    ignoreNulls: Boolean,
    isFirst: Boolean, // false = the mirrored last_value over a frame ENDING at UNBOUNDED FOLLOWING
    outAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Thirteenth idiom (round 16): GLOBAL k-TH VALUE — the constant half
  * of `nth_value(e, k)` over a frame starting at UNBOUNDED PRECEDING:
  * the k-th row of the relation under the order (null when the
  * relation holds fewer than k rows). Pass 1 collects each partition's
  * first ≤k evaluated values — O(P·k) driver metadata, the
  * lag/lead head machinery reused; the rule composes the frame-size
  * condition from the row_number / RANGE-count legs. The rewrite
  * marks nth as an OFFSET idiom so the monotonic tiebreak makes the
  * pass-1 pick and the pass-2 row positions provably consistent under
  * tied order keys.
  */
case class GlobalKthValueNode(
    order: Seq[SortOrder],
    valExpr: Expression,
    k: Int,
    ignoreNulls: Boolean,
    outAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Twelfth idiom (round 16): GLOBAL SCALAR AGGREGATE — `sum(x) OVER
  * ()`, `count(*) OVER ()`, `min/max/avg(x) OVER ()` (the
  * share-of-total staple every BI query writes) and the same
  * aggregates over an explicit full `ROWS/RANGE BETWEEN UNBOUNDED
  * PRECEDING AND UNBOUNDED FOLLOWING` frame: the window value is ONE
  * relation-wide constant, order-independent. Stock Spark plans an
  * AllTuples 1-task window that BUFFERS the entire relation; this node
  * computes per-partition partials (O(P) driver metadata) and attaches
  * the combined constant — NO exchange, NO sort, NO buffer, child
  * partitioning preserved. Exact kinds only (long/decimal sum, count,
  * min/max, long avg): a double sum's FP combine order would differ
  * from stock's row-order accumulation, so double sums keep the stock
  * plan via the split. The two passes re-execute the child (a scan
  * reads twice when no shuffle boundary caches it) — still strictly
  * better than materializing the whole relation in one task.
  */
case class GlobalScalarAggNode(
    sumExpr: Expression,
    outAttr: Attribute,
    ansi: Boolean,
    kind: RangeAggKind,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** THE unified rewrite (round 15 — supersedes the four per-idiom
  * rules): an unpartitioned Window whose EVERY expression is one of
  * the nine rewritable idioms is decomposed into a chain of
  * special-purpose nodes — one per expression, all requiring the same
  * `OrderedDistribution`, so the whole chain shares ONE range
  * exchange. Before this, `sum(x) OVER w, count(*) OVER w, rank()
  * OVER w` (same spec ⇒ the analyzer merges them into one Window node)
  * silently kept the 1-task plan because each rule demanded a
  * single-expression window. Any non-rewritable expression in the mix
  * keeps the whole stock Window (+ the PlanLint warning).
  *
  * Idioms and their gates:
  *  - row_number — always.
  *  - rank/dense_rank/percent_rank/cume_dist — non-float order keys
  *    (recursively: structs/arrays containing floats excluded).
  *  - ntile(k literal ≥ 1) — always.
  *  - sum over ROWS UNBOUNDED..CURRENT — long/decimal input, non-TRY.
  *  - sum over RANGE UNBOUNDED..CURRENT (SQL's DEFAULT frame) —
  *    long/decimal input, non-TRY, non-float order keys.
  *  - count(...) over RANGE UNBOUNDED..CURRENT — rewritten as a 0/1
  *    tally with count's empty-frame-is-zero semantics.
  *  - min/max over ROWS UNBOUNDED..CURRENT — any orderable atomic
  *    type (floats LEGAL — ordering comparisons only).
  *  - lag/lead with literal offset ≤ 1024 and foldable default —
  *    IGNORE NULLS included since round 18 (k-th non-null via non-null
  *    boundary metadata; see [[GlobalOffsetWindowNode]]).
  */
object GlobalWindowRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{
    If,
    IsNull,
    NamedExpression,
    Or,
    SpecifiedWindowFrame,
    WindowSpecDefinition
  }
  import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Count, Max, Min}
  import org.apache.spark.sql.catalyst.expressions.{
    CurrentRow => CRow,
    RangeFrame => RFrame,
    RowFrame => RowsFrame,
    UnboundedPreceding => UPrec
  }

  private val maxK = 1024

  private def hasFloat(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case DoubleType | FloatType                   => true
    case st: org.apache.spark.sql.types.StructType => st.fields.exists(f => hasFloat(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType  => hasFloat(a.elementType)
    case m: org.apache.spark.sql.types.MapType    => hasFloat(m.keyType) || hasFloat(m.valueType)
    case _                                        => false
  }
  private def floatingOrder(order: Seq[SortOrder]): Boolean =
    order.exists(o => hasFloat(o.dataType))

  private def rowsToCurrent(ws: WindowSpecDefinition) = ws.frameSpecification match {
    case SpecifiedWindowFrame(RowsFrame, UPrec, CRow) => true
    case _                                            => false
  }
  private def rangeToCurrent(ws: WindowSpecDefinition) = ws.frameSpecification match {
    case SpecifiedWindowFrame(RFrame, UPrec, CRow) => true
    case _                                         => false
  }
  // A frame bound provably AT or AFTER the current row/peer group:
  // CURRENT ROW, UNBOUNDED FOLLOWING, or a non-negative FOLLOWING
  // offset literal. Round-17 ADVICE fix (medium): an offset-PRECEDING
  // upper (ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) makes the
  // frame EMPTY for the head row(s), where stock first_value yields
  // NULL — the constant rewrite must not fire there. Non-literal /
  // non-integral offsets conservatively keep the stock plan.
  private def boundAtOrAfterCurrent(b: Expression): Boolean = b match {
    case CRow                                                            => true
    case org.apache.spark.sql.catalyst.expressions.UnboundedFollowing   => true
    case Literal(v: Int, _)                                              => v >= 0
    case Literal(v: Long, _)                                             => v >= 0
    case Literal(v: Short, _)                                            => v >= 0
    case Literal(v: Byte, _)                                             => v >= 0
    case _                                                               => false
  }
  // mirror: provably AT or BEFORE the current row/peer group
  private def boundAtOrBeforeCurrent(b: Expression): Boolean = b match {
    case CRow                 => true
    case UPrec                => true
    case Literal(v: Int, _)   => v <= 0
    case Literal(v: Long, _)  => v <= 0
    case Literal(v: Short, _) => v <= 0
    case Literal(v: Byte, _)  => v <= 0
    case _                    => false
  }
  // frame whose LOWER bound is UNBOUNDED PRECEDING and that is NEVER
  // EMPTY — every row's frame contains the relation's first row
  private def frameFromStart(ws: WindowSpecDefinition) = ws.frameSpecification match {
    case SpecifiedWindowFrame(_, UPrec, upper) => boundAtOrAfterCurrent(upper)
    case _                                     => false
  }
  // frame whose UPPER bound is UNBOUNDED FOLLOWING and that is never
  // empty — contains the last row
  private def frameToEnd(ws: WindowSpecDefinition) = ws.frameSpecification match {
    case SpecifiedWindowFrame(_, lower, org.apache.spark.sql.catalyst.expressions.UnboundedFollowing) =>
      boundAtOrBeforeCurrent(lower)
    case _ => false
  }
  // the FULL frame — every row's frame is the whole relation, so any
  // order-independent aggregate over it is one global constant
  private def frameFull(ws: WindowSpecDefinition) = ws.frameSpecification match {
    case SpecifiedWindowFrame(_, UPrec, org.apache.spark.sql.catalyst.expressions.UnboundedFollowing) =>
      true
    case _ => false
  }

  private def sumType(e: Expression): Boolean =
    e.dataType == LongType || e.dataType.isInstanceOf[DecimalType]

  /** count(...) as a 0/1 row tally: 1 where no argument is null. */
  private def countTally(seq: Seq[Expression]): Expression = seq
    .filter(_.nullable)
    .map(e => IsNull(e): Expression)
    .reduceOption(Or)
    .map(cond => If(cond, Literal(0L), Literal(1L)): Expression)
    .getOrElse(Literal(1L))

  private def orderableAtomic(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | _: StringType | BooleanType | DateType | TimestampType |
          TimestampNTZType | BinaryType =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
      case _ => false
    }
  }

  /** A rewritable window expression. `build` takes the EFFECTIVE order
    * (the two-pass lag/lead idiom gets a tiebreak-extended TOTAL order
    * — see [[apply]]) and the accumulated child. `offset` marks that
    * idiom: it is the only one whose pass-1 boundary VALUES pair with
    * pass-2 row POSITIONS, so with tied order keys the two passes'
    * independent local sorts could disagree within a tie and emit a
    * lag/lead consistent with NO single row ordering (round-16 ADVICE).
    * Every other idiom is tie-order-independent (counts, key-equality
    * runs, group aggregates) or self-consistent within one pass.
    */
  private final case class Rewritable(
      offset: Boolean,
      build: (Seq[SortOrder], LogicalPlan) => LogicalPlan
  )

  /** Classify one window expression; None leaves it to the stock
    * Window remainder (see [[apply]]'s split).
    */
  /** True when re-executing `p` is guaranteed to produce the same rows
    * — no nondeterministic expression (rand()/uuid()/…) anywhere in the
    * subtree. The FULL-frame scalar-agg idiom is the one exec that
    * requires NO exchange beneath it, so its two passes (pass-1 partial
    * collect + pass-2 attach) re-execute the child RDD from scratch;
    * over a nondeterministic child the passes could disagree and the
    * attached constant wouldn't match the emitted rows (round-17 ADVICE
    * fix, low). Every other two-pass exec sits above its own range
    * exchange, whose map outputs are computed once and reused by both
    * passes.
    */
  private def planDeterministic(p: LogicalPlan): Boolean =
    !p.exists(n => n.expressions.exists(ex => ex.exists(!_.deterministic)))

  private def builderFor(
      order: Seq[SortOrder],
      ne: NamedExpression,
      childDet: Boolean
  ): Option[Rewritable] = ne match {
    case alias @ Alias(WindowExpression(fn, ws), _) =>
      fn match {
        case _: RowNumber =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.RowNum, c)))
        case _: Rank if !floatingOrder(order) =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.RankTies, c)))
        case _: DenseRank if !floatingOrder(order) =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.DenseRankTies, c)))
        case _: PercentRank if !floatingOrder(order) =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.PercentRankTies, c)))
        case _: CumeDist if !floatingOrder(order) =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.CumeDistTies, c)))
        case NTile(Literal(k: Int, IntegerType)) if k >= 1 =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRankNode(o, alias.toAttribute, GlobalRankMode.NtileK(k), c)))
        case AggregateExpression(s0 @ Sum(e, _), _, false, _, _)
            if rowsToCurrent(ws) && sumType(e) && e.deterministic &&
              s0.evalContext.evalMode != EvalMode.TRY =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalPrefixSumNode(
              o,
              e,
              alias.toAttribute,
              s0.evalContext.evalMode == EvalMode.ANSI,
              c
            )))
        case AggregateExpression(s0 @ Sum(e, _), _, false, _, _)
            if rangeToCurrent(ws) && !floatingOrder(order) && sumType(e) && e.deterministic &&
              s0.evalContext.evalMode != EvalMode.TRY =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRangePrefixSumNode(
              o,
              e,
              alias.toAttribute,
              s0.evalContext.evalMode == EvalMode.ANSI,
              RangeAggKind.SumK,
              c
            )))
        case AggregateExpression(Count(seq), _, false, _, _)
            if rangeToCurrent(ws) && !floatingOrder(order) && seq.forall(_.deterministic) =>
          // count(...) = running tally of rows where no argument is null;
          // empty-frame emits 0, never null (CountRangeSumOps)
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRangePrefixSumNode(o, countTally(seq), alias.toAttribute, ansi = false, RangeAggKind.CountK, c)))
        case AggregateExpression(Count(seq), _, false, _, _)
            if rowsToCurrent(ws) && seq.forall(_.deterministic) =>
          // count over ROWS UNBOUNDED..CURRENT = a prefix sum of the 0/1
          // tally (round 16, the avg decomposition's count leg exposed
          // directly); the frame always holds ≥ 1 row so the sum never
          // hits the all-null-is-null case — the tally is non-nullable
          Some(Rewritable(offset = false, (o, c) =>
            GlobalPrefixSumNode(o, countTally(seq), alias.toAttribute, ansi = false, c)))
        case AggregateExpression(Max(e), _, false, _, _)
            if rowsToCurrent(ws) && orderableAtomic(e.dataType) && e.deterministic =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalPrefixExtremumNode(o, e, alias.toAttribute, isMax = true, c)))
        case AggregateExpression(Min(e), _, false, _, _)
            if rowsToCurrent(ws) && orderableAtomic(e.dataType) && e.deterministic =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalPrefixExtremumNode(o, e, alias.toAttribute, isMax = false, c)))
        case AggregateExpression(Max(e), _, false, _, _)
            if rangeToCurrent(ws) && !floatingOrder(order) &&
              orderableAtomic(e.dataType) && e.deterministic =>
          // max through the peer group's END — the DEFAULT frame form
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRangePrefixSumNode(
              o, e, alias.toAttribute, ansi = false, RangeAggKind.ExtremumK(true), c)))
        case AggregateExpression(Min(e), _, false, _, _)
            if rangeToCurrent(ws) && !floatingOrder(order) &&
              orderableAtomic(e.dataType) && e.deterministic =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalRangePrefixSumNode(
              o, e, alias.toAttribute, ansi = false, RangeAggKind.ExtremumK(false), c)))
        // FULL-frame aggregates (round 16, twelfth idiom): `agg(x) OVER
        // ()` (the no-ORDER default frame) and explicit UNBOUNDED
        // PRECEDING..UNBOUNDED FOLLOWING — one order-independent global
        // constant; per-partition partials, NO exchange, NO buffer.
        // Double sums keep the stock plan (FP combine order).
        case AggregateExpression(s0 @ Sum(e, _), _, false, _, _)
            if frameFull(ws) && childDet && sumType(e) && e.deterministic &&
              s0.evalContext.evalMode != EvalMode.TRY =>
          Some(Rewritable(offset = false, (_, c) =>
            GlobalScalarAggNode(
              e, alias.toAttribute, s0.evalContext.evalMode == EvalMode.ANSI, RangeAggKind.SumK, c)))
        case AggregateExpression(Count(seq), _, false, _, _)
            if frameFull(ws) && childDet && seq.forall(_.deterministic) =>
          Some(Rewritable(offset = false, (_, c) =>
            GlobalScalarAggNode(countTally(seq), alias.toAttribute, ansi = false, RangeAggKind.CountK, c)))
        case AggregateExpression(Max(e), _, false, _, _)
            if frameFull(ws) && childDet && orderableAtomic(e.dataType) && e.deterministic =>
          Some(Rewritable(offset = false, (_, c) =>
            GlobalScalarAggNode(e, alias.toAttribute, ansi = false, RangeAggKind.ExtremumK(true), c)))
        case AggregateExpression(Min(e), _, false, _, _)
            if frameFull(ws) && childDet && orderableAtomic(e.dataType) && e.deterministic =>
          Some(Rewritable(offset = false, (_, c) =>
            GlobalScalarAggNode(e, alias.toAttribute, ansi = false, RangeAggKind.ExtremumK(false), c)))
        case AggregateExpression(Average(e, em), _, false, _, _)
            if frameFull(ws) && childDet && e.dataType == LongType && e.deterministic &&
              em != EvalMode.TRY =>
          Some(Rewritable(offset = false, (_, c) => buildScalarAvg(alias, e, c)))
        // avg (round 16): sum/count COMPOSE from two already-proven modes
        // — an exact LONG prefix sum plus a 0/1-tally prefix count, then
        // one projected divide. Stock Average(long) runs its running sum
        // in DOUBLE (value-by-value FP adds); the exact-long-sum-then-one
        // -divide here is equal whenever the running double sum is exact
        // (< 2^53) and MORE accurate beyond — never less. LongType only:
        // decimal avg's result-scale/rounding internals are stock's
        // (DecimalType avg keeps the stock plan via the split), double
        // input is excluded like every float sum (FP add order). The
        // divide is ALWAYS legacy — stock Average divides count-0 to
        // null even under ANSI. Round-17 ADVICE fix: the sum leg
        // accumulates in DECIMAL(38,0) (exact, unbounded BigDecimal
        // stitch internally) instead of addExact LONG — stock ANSI
        // Average NEVER overflows (its running sum is a double), so an
        // addExact leg would make a query that succeeds on stock throw
        // past Long.MaxValue; the decimal leg never throws and never
        // wraps in ANY eval mode (38 digits ≈ 10^19 max-valued rows).
        case AggregateExpression(Average(e, em), _, false, _, _)
            if rowsToCurrent(ws) && e.dataType == LongType && e.deterministic &&
              em != EvalMode.TRY =>
          Some(Rewritable(offset = false, (o, c) =>
            buildAvg(o, alias, e, c, rows = true)))
        case AggregateExpression(Average(e, em), _, false, _, _)
            if rangeToCurrent(ws) && !floatingOrder(order) && e.dataType == LongType &&
              e.deterministic && em != EvalMode.TRY =>
          Some(Rewritable(offset = false, (o, c) =>
            buildAvg(o, alias, e, c, rows = false)))
        // first_value over any never-empty frame STARTING at UNBOUNDED
        // PRECEDING (round 16): the first row is in every frame, so the
        // value is ONE GLOBAL CONSTANT under the order — no window pass
        // at all, O(P) boundary metadata (nondeterministic under ties
        // exactly like stock). Mirrored: last_value over a frame ENDING
        // at UNBOUNDED FOLLOWING. IGNORE NULLS requires the FULL frame
        // (round-17 ADVICE fix, high): with a frame ending at CURRENT
        // ROW, rows before the first non-null have an all-null frame
        // where stock yields NULL — the relation-wide first non-null is
        // only a constant when every frame spans the whole relation.
        case AggregateExpression(org.apache.spark.sql.catalyst.expressions.aggregate.First(e, ign), _, false, _, _)
            if order.nonEmpty && (if (ign) frameFull(ws) else frameFromStart(ws)) &&
              e.deterministic =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalFirstValueNode(o, e, ign, isFirst = true, alias.toAttribute, c)))
        case AggregateExpression(org.apache.spark.sql.catalyst.expressions.aggregate.Last(e, ign), _, false, _, _)
            if order.nonEmpty && (if (ign) frameFull(ws) else frameToEnd(ws)) &&
              e.deterministic =>
          Some(Rewritable(offset = false, (o, c) =>
            GlobalFirstValueNode(o, e, ign, isFirst = false, alias.toAttribute, c)))
        // nth_value (round 16, thirteenth idiom): the k-th-row constant
        // plus a frame-size condition — full frame needs none; ROWS-to-
        // current gates on row_number >= k; the default RANGE frame on
        // the peer-group END position (the CountK count). Marked offset
        // so the tiebreak keeps the pass-1 pick and pass-2 positions on
        // ONE total order under ties. IGNORE NULLS over the FULL frame
        // is ALSO one constant (the k-th NON-NULL of the whole
        // relation; pass-1 skips nulls — round 17, and the shape
        // Catalyst lowers explicit-frame first_value IGNORE NULLS to);
        // over running frames it keeps the stock plan.
        case org.apache.spark.sql.catalyst.expressions
              .NthValue(e, Literal(k: Int, IntegerType), ign)
            if order.nonEmpty && k >= 1 && k <= maxK && e.deterministic && frameFull(ws) =>
          Some(Rewritable(offset = true, (o, c) =>
            GlobalKthValueNode(o, e, k, ign, alias.toAttribute, c)))
        case org.apache.spark.sql.catalyst.expressions
              .NthValue(e, Literal(k: Int, IntegerType), false)
            if order.nonEmpty && k >= 1 && k <= maxK && e.deterministic && rowsToCurrent(ws) =>
          Some(Rewritable(offset = true, (o, c) => buildNth(o, alias, e, k, c, rows = true, order)))
        case org.apache.spark.sql.catalyst.expressions
              .NthValue(e, Literal(k: Int, IntegerType), false)
            if order.nonEmpty && k >= 1 && k <= maxK && e.deterministic &&
              rangeToCurrent(ws) && !floatingOrder(order) =>
          Some(Rewritable(offset = true, (o, c) => buildNth(o, alias, e, k, c, rows = false, order)))
        case org.apache.spark.sql.catalyst.expressions
              .Lag(e, Literal(k: Int, IntegerType), dflt, ign)
            if k >= 1 && k <= maxK && e.deterministic && dflt.foldable =>
          Some(Rewritable(offset = true, (o, c) =>
            GlobalOffsetWindowNode(o, e, k, isLag = true, dflt, ign, alias.toAttribute, c)))
        case org.apache.spark.sql.catalyst.expressions
              .Lead(e, Literal(k: Int, IntegerType), dflt, ign)
            if k >= 1 && k <= maxK && e.deterministic && dflt.foldable =>
          Some(Rewritable(offset = true, (o, c) =>
            GlobalOffsetWindowNode(o, e, k, isLag = false, dflt, ign, alias.toAttribute, c)))
        case _ => None
      }
    case _ => None
  }

  /** avg(e) decomposed: chain an exact long prefix sum + a prefix
    * count over the SAME order, divide once, and re-emit under the
    * original alias's exprId so parents resolve. ROWS frame counts via
    * a plain prefix sum of the 0/1 tally (current row always in frame);
    * the default RANGE frame rides CountK's group machinery.
    */
  private def buildAvg(
      o: Seq[SortOrder],
      alias: Alias,
      e: Expression,
      c: LogicalPlan,
      rows: Boolean
  ): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference,
      Cast,
      Divide,
      NumericEvalContext
    }
    // DECIMAL(38,0) sum leg (round-17 ADVICE fix): exact like the old
    // addExact long, but never throws/wraps — stock Average's double
    // accumulator never overflows, so neither may the decomposition
    val decT = DecimalType(38, 0)
    val sumA = AttributeReference("__graft_avg_sum", decT, nullable = true)()
    val cntA = AttributeReference("__graft_avg_cnt", LongType, nullable = true)()
    val sumIn: Expression = Cast(e, decT)
    val tally: Expression =
      if (e.nullable) If(IsNull(e), Literal(0L), Literal(1L)) else Literal(1L)
    val withSum =
      if (rows) GlobalPrefixSumNode(o, sumIn, sumA, ansi = false, c)
      else GlobalRangePrefixSumNode(o, sumIn, sumA, ansi = false, RangeAggKind.SumK, c)
    val withCnt =
      if (rows) GlobalPrefixSumNode(o, tally, cntA, ansi = false, withSum)
      else GlobalRangePrefixSumNode(o, tally, cntA, ansi = false, RangeAggKind.CountK, withSum)
    // LEGACY divide even under ANSI: /0 (all-null prefix) yields null,
    // exactly stock Average's evaluateExpression
    val avg = Alias(
      Divide(
        Cast(sumA, DoubleType),
        Cast(cntA, DoubleType),
        NumericEvalContext(EvalMode.LEGACY)
      ),
      alias.name
    )(alias.exprId, alias.qualifier)
    Project(c.output :+ avg, withCnt)
  }

  /** avg over the FULL frame: global exact sum + global count + one
    * legacy divide — all constants, no exchange.
    */
  private def buildScalarAvg(
      alias: Alias,
      e: Expression,
      c: LogicalPlan
  ): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{
      AttributeReference,
      Cast,
      Divide,
      NumericEvalContext
    }
    // DECIMAL(38,0) sum leg — same overflow-proofing as buildAvg
    val decT = DecimalType(38, 0)
    val sumA = AttributeReference("__graft_savg_sum", decT, nullable = true)()
    val cntA = AttributeReference("__graft_savg_cnt", LongType, nullable = true)()
    val tally: Expression =
      if (e.nullable) If(IsNull(e), Literal(0L), Literal(1L)) else Literal(1L)
    val withSum = GlobalScalarAggNode(Cast(e, decT), sumA, ansi = false, RangeAggKind.SumK, c)
    val withCnt = GlobalScalarAggNode(tally, cntA, ansi = false, RangeAggKind.CountK, withSum)
    val avg = Alias(
      Divide(
        Cast(sumA, DoubleType),
        Cast(cntA, DoubleType),
        NumericEvalContext(EvalMode.LEGACY)
      ),
      alias.name
    )(alias.exprId, alias.qualifier)
    Project(c.output :+ avg, withCnt)
  }

  /** nth_value over a from-start frame ENDING at the current row /
    * peer-group end: the k-th-row constant gated by the frame-size
    * condition (row position for ROWS, group-end count for RANGE —
    * the latter built on the PLAIN order so peer groups stay the
    * user's keys while the constant leg rides the tiebreak-extended
    * total order `o`).
    */
  private def buildNth(
      o: Seq[SortOrder],
      alias: Alias,
      e: Expression,
      k: Int,
      c: LogicalPlan,
      rows: Boolean,
      plainOrder: Seq[SortOrder]
  ): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual}
    val vkA = AttributeReference("__graft_nth_vk", e.dataType, nullable = true)()
    val withVk = GlobalKthValueNode(o, e, k, ignoreNulls = false, vkA, c)
    val (posA, withPos, cond) =
      if (rows) {
        val rnA = AttributeReference("__graft_nth_rn", IntegerType, nullable = false)()
        (rnA,
          GlobalRankNode(o, rnA, GlobalRankMode.RowNum, withVk): LogicalPlan,
          GreaterThanOrEqual(rnA, Literal(k)))
      } else {
        val cntA = AttributeReference("__graft_nth_cnt", LongType, nullable = false)()
        (cntA,
          GlobalRangePrefixSumNode(
            plainOrder, Literal(1L), cntA, ansi = false, RangeAggKind.CountK, withVk): LogicalPlan,
          GreaterThanOrEqual(cntA, Literal(k.toLong)))
      }
    val _ = posA
    val nth = Alias(
      If(cond, vkA, Literal(null, e.dataType)),
      alias.name
    )(alias.exprId, alias.qualifier)
    Project(c.output :+ nth, withPos)
  }

  /** The split (round 16 — supersedes round 15's all-or-nothing gate):
    * every rewritable expression chains over ONE shared range exchange;
    * any non-rewritable remainder keeps a stock Window ON TOP of the
    * chain (its own 1-task AllTuples pass computes ONLY the remainder —
    * before, one `first_value` in the mix silently dragged every
    * sibling onto the 1-task plan; PlanLint still warns on the
    * remainder). When the chain contains a lag/lead, a
    * monotonically-increasing-id tiebreak column is projected UNDER the
    * exchange (computed once in the map-side stage, reused by both
    * passes via the shuffle files) and appended to the offset nodes'
    * order, making their two-pass local sorts provably identical even
    * with tied order keys; offset nodes chain FIRST so the single range
    * exchange is keyed on the extended order — every non-offset node
    * above is satisfied by prefix (equal keys colocate under range
    * partitioning). A final Project restores the Window's exact output
    * (attribute order included) and drops the tiebreak.
    */
  /** Session kill switch (round 17): `SET
    * spark.graft.windowRewrite.enabled=false` keeps every stock window
    * plan — an escape hatch if a user query hits a rewrite edge, and
    * the lever the stock-parity tests flip.
    */
  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.windowRewrite.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.orderSpec.forall(_.child.deterministic) &&
          w.windowExpressions
            .exists(builderFor(w.orderSpec, _, planDeterministic(w.child)).isDefined) =>
      val order = w.orderSpec
      val childDet = planDeterministic(w.child)
      val entries = w.windowExpressions.map(ne => ne -> builderFor(order, ne, childDet))
      val stockExprs = entries.collect { case (ne, None) => ne }
      val rewritables = entries.collect { case (ne, Some(r)) => (ne, r) }
      val needTb = rewritables.exists(_._2.offset)
      val (base, extOrder) =
        if (!needTb) (w.child, order)
        else {
          val tb = Alias(
            org.apache.spark.sql.catalyst.expressions.MonotonicallyIncreasingID(),
            "__graft_offset_tb"
          )()
          val p: LogicalPlan = Project(w.child.output :+ tb, w.child)
          (p, order :+ SortOrder(tb.toAttribute, org.apache.spark.sql.catalyst.expressions.Ascending))
        }
      // offsets first (bottom of the chain): the exchange their
      // OrderedDistribution creates is ranged on the EXTENDED order;
      // stable sort keeps each group's relative order
      val chained = rewritables
        .sortBy { case (_, r) => if (r.offset) 0 else 1 }
        .foldLeft(base) { case (acc, (_, r)) =>
          r.build(if (r.offset) extOrder else order, acc)
        }
      // The remainder KEEPS the stock 1-task sort DELIBERATELY (round
      // 18, measured at 50M): an order-preserving gather exec that
      // feeds the remainder the chain's global order was built and
      // benchmarked in two mechanisms — a narrow coalesce(1) (merges
      // the whole reduce stage into the single task, serializing the
      // per-partition sorts and every chained pass-2: 59.8 s vs stock
      // 50.2) and a parallel materialization barrier (spillable cache +
      // count job: 62.4 s — the chain's pass-1 jobs re-sort per job and
      // the cache round-trips the relation). Both cost MORE than the
      // one sort they remove: 50M compact rows external-sort in a
      // single task faster than they serialize/round-trip. The split's
      // value on mixed shapes stays what round 16 measured — un-dragged
      // siblings and 1-expression remainder state — not remainder wall
      // time. See SCALING.md round 18.
      val withStock: LogicalPlan =
        if (stockExprs.isEmpty) chained
        else Window(stockExprs, Nil, order, chained)
      if (!needTb && stockExprs.isEmpty) withStock
      else Project(w.output, withStock)

    // NO-ORDER global window (round 16, twelfth idiom): `agg(x) OVER
    // ()` — every expression is a full-frame aggregate or stays in the
    // stock remainder; the rewritten ones are relation-wide constants
    // computed with NO exchange at all
    case w: Window
        if w.partitionSpec.isEmpty && w.orderSpec.isEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.exists(builderFor(Nil, _, planDeterministic(w.child)).isDefined) =>
      val childDet = planDeterministic(w.child)
      val entries = w.windowExpressions.map(ne => ne -> builderFor(Nil, ne, childDet))
      val stockExprs = entries.collect { case (ne, None) => ne }
      val chained = entries
        .collect { case (_, Some(r)) => r }
        .foldLeft(w.child)((acc, r) => r.build(Nil, acc))
      if (stockExprs.isEmpty) chained
      else Project(w.output, Window(stockExprs, Nil, Nil, chained))
  }
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(order, rankAttr, mode, child) =>
      GlobalRankExec(order, rankAttr, mode, planLater(child)) :: Nil
    case GlobalPrefixSumNode(order, sumExpr, outAttr, ansi, child) =>
      GlobalPrefixSumExec(order, sumExpr, outAttr, ansi, planLater(child)) :: Nil
    case GlobalPrefixExtremumNode(order, valExpr, outAttr, isMax, child) =>
      GlobalPrefixExtremumExec(order, valExpr, outAttr, isMax, planLater(child)) :: Nil
    case GlobalOffsetWindowNode(order, valExpr, k, isLag, default, ign, outAttr, child) =>
      GlobalOffsetWindowExec(order, valExpr, k, isLag, default, ign, outAttr, planLater(child)) :: Nil
    case GlobalFirstValueNode(order, valExpr, ignoreNulls, isFirst, outAttr, child) =>
      GlobalFirstValueExec(order, valExpr, ignoreNulls, isFirst, outAttr, planLater(child)) :: Nil
    case GlobalScalarAggNode(sumExpr, outAttr, ansi, kind, child) =>
      GlobalScalarAggExec(sumExpr, outAttr, ansi, kind, planLater(child)) :: Nil
    case GlobalKthValueNode(order, valExpr, k, ign, outAttr, child) =>
      GlobalKthValueExec(order, valExpr, k, ign, outAttr, planLater(child)) :: Nil
    case GlobalRangePrefixSumNode(order, sumExpr, outAttr, ansi, kind, child) =>
      GlobalRangePrefixSumExec(order, sumExpr, outAttr, ansi, kind, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-partition tie metadata for rank()/dense_rank()/cume_dist():
  * row count, distinct peer groups, first/last order-key bytes,
  * trailing-run length, and (round 15) HEAD-run length — the forward
  * mirror of tailRun, what cume_dist's end-position walk chains. Key
  * bytes are UnsafeProjection output — null-safe value equality for
  * every non-floating type (the rewrite gates floats out). Top-level so
  * the metadata task closure serializes without the plan.
  */
private[plans] case class RankPartMeta(
    n: Long,
    d: Long,
    first: Array[Byte],
    last: Array[Byte],
    tailRun: Long,
    headRun: Long
)

/** Spill-safe one-peer-group row buffer for the pass-2 iterators that
  * must hold a whole tie group before its frame value is known
  * (CumeDistTies, GlobalRangePrefixSumExec). Round-16 ADVICE fix: the
  * previous in-heap ArrayBuffer of copied rows could OOM an executor
  * on a fat peer group (few distinct order keys — exactly the
  * tie-heavy inputs these modes target) where stock WindowExec would
  * spill. Backed by TWO alternating ExternalAppendOnlyUnsafeRowArray
  * instances (stock's frame buffer, same conf thresholds) because the
  * flushed iterator is consumed lazily while the NEXT group is already
  * accumulating — an EAOUR iterator is invalidated by add/clear on its
  * own instance. The callers' drain invariant (advance() never reads
  * the source while outIt.hasNext) guarantees the swapped-out buffer's
  * iterator is exhausted before its next clear(). Task-side only (the
  * array needs a TaskContext to spill).
  */
private[plans] final class SpillableGroupBuffer(
    schema: Seq[Attribute],
    inMemoryThreshold: Int,
    spillThreshold: Int,
    spillSizeThreshold: Long
) {
  import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray
  private def mk() =
    new ExternalAppendOnlyUnsafeRowArray(
      inMemoryThreshold,
      spillSizeThreshold,
      spillThreshold,
      spillSizeThreshold
    )
  private var cur = mk()
  private var other = mk()
  // sorted child rows are UnsafeRow in practice; the projection is the
  // safety net for any InternalRow producer (add() copies either way)
  private val toUnsafe = UnsafeProjection.create(schema, schema)
  def add(row: InternalRow): Unit = row match {
    case u: UnsafeRow => cur.add(u)
    case r            => cur.add(toUnsafe(r))
  }
  def nonEmpty: Boolean = !cur.isEmpty

  /** Iterate the accumulated group and start a fresh one. The returned
    * iterator must be exhausted before the NEXT swapAndIterate().
    */
  def swapAndIterate(): Iterator[UnsafeRow] = {
    val full = cur
    cur = other
    other = full
    cur.clear()
    full.generateIterator()
  }
}

case class GlobalRankExec(
    order: Seq[SortOrder],
    rankAttr: Attribute,
    mode: GlobalRankMode,
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
    val childOutput = child.output
    val orderExprs = order.map(_.child)
    val outAttrs = output
    mode match {
      case GlobalRankMode.RowNum | GlobalRankMode.NtileK(_) =>
        // pass 1: per-partition row counts — numPartitions longs on the
        // driver (metadata, not data). The exchange's map-side shuffle
        // files are written once and reused by pass 2.
        val counts = rdd
          .mapPartitions(it => Iterator.single(it.size.toLong), preservesPartitioning = true)
          .collect()
        val offsets = counts.scanLeft(0L)(_ + _)
        // ntile's whole-relation inputs, straight off the offset table —
        // the n the round-13 rewrite re-scanned the child for
        val ntileOf: Long => Long = mode match {
          case GlobalRankMode.NtileK(k) =>
            val n = offsets.last
            val kL = k.toLong
            val nBig = if (n == 0L) 0L else n % kL
            val sizeBig = if (n == 0L) 1L else (n + kL - 1L) / kL
            val sizeSmall = n / kL
            val boundary = nBig * sizeBig
            rn =>
              if (rn <= boundary) (rn - 1L) / sizeBig + 1L
              else nBig + (rn - boundary - 1L) / sizeSmall + 1L
          case _ => identity[Long]
        }
        rdd.mapPartitionsWithIndex { (pid, it) =>
          val proj = UnsafeProjection.create(outAttrs, outAttrs)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          var i = offsets(pid)
          it.map { row =>
            i += 1
            // row_number/ntile are IntegerType — mirror the overflow domain
            rankRow.update(0, ntileOf(i).toInt)
            proj(joined(row, rankRow))
          }
        }

      case GlobalRankMode.RankTies | GlobalRankMode.DenseRankTies |
          GlobalRankMode.PercentRankTies =>
        val dense = mode == GlobalRankMode.DenseRankTies
        val pct = mode == GlobalRankMode.PercentRankTies
        // pass 1: per-partition tie metadata (counts + boundary keys)
        val metas = collectTieMetas(rdd, orderExprs, childOutput)
        val offsets = metas.scanLeft(0L)(_ + _.n)
        // rank: global position of each partition's HEAD peer group —
        // walk back through contiguous same-key tails (a key spanning
        // whole partitions chains the walk)
        val headRank = Array.tabulate(metas.length) { i =>
          if (metas(i).n == 0L) 0L
          else {
            var back = 0L
            var j = i - 1
            var cont = true
            while (cont && j >= 0) {
              val m = metas(j)
              if (m.n == 0L) j -= 1
              else if (java.util.Arrays.equals(m.last, metas(i).first)) {
                back += m.tailRun
                if (m.d == 1L) j -= 1 else cont = false
              } else cont = false
            }
            offsets(i) - back + 1L
          }
        }
        // dense_rank: distinct-group prefix, minus one per boundary whose
        // adjacent keys connect (the straddling group counted twice)
        val denseStart = new Array[Long](metas.length)
        var cumD = 0L
        var cumConn = 0L
        var prevLast: Array[Byte] = null
        var i0 = 0
        while (i0 < metas.length) {
          val m = metas(i0)
          if (m.n > 0L) {
            if (prevLast != null && java.util.Arrays.equals(prevLast, m.first)) cumConn += 1L
            denseStart(i0) = cumD - cumConn
            cumD += m.d
            prevLast = m.last
          }
          i0 += 1
        }
        val nTotal = offsets.last
        rdd.mapPartitionsWithIndex { (pid, it) =>
          val proj = UnsafeProjection.create(orderExprs, childOutput)
          val outProj = UnsafeProjection.create(outAttrs, outAttrs)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          val off = offsets(pid)
          val hr = headRank(pid)
          val ds = denseStart(pid)
          var prevKey: UnsafeRow = null
          var pos = 0L // local row position, 1-based
          var gs = 0L // local peer-group start position, 1-based
          var ld = 0L // local dense rank
          var inHead = true // still inside the partition's first peer group
          it.map { row =>
            val k = proj(row)
            pos += 1L
            if (prevKey == null) { prevKey = k.copy(); gs = 1L; ld = 1L }
            else if (!k.equals(prevKey)) {
              prevKey = k.copy(); gs = pos; ld += 1L; inHead = false
            }
            val v = if (dense) ds + ld else if (inHead) hr else off + gs
            if (pct) {
              // stock PercentRank's own formula and edge: (rank−1)/(n−1), 0 for n=1
              rankRow.update(0, if (nTotal > 1L) (v - 1L).toDouble / (nTotal - 1L) else 0.0d)
            } else {
              // rank/dense_rank are IntegerType — mirror the overflow domain
              rankRow.update(0, v.toInt)
            }
            outProj(joined(row, rankRow))
          }
        }

      case GlobalRankMode.CumeDistTies =>
        // cume_dist = (global END position of the row's peer group) / n.
        // INSIDE a partition, a group's end is the next group's start − 1
        // — known one group ahead, so pass 2 buffers ONE peer group at a
        // time (exactly stock WindowExec's frame buffer for cume_dist,
        // here per-partition instead of whole-relation). Only the
        // partition's LAST group needs cross-partition info: its end is
        // this partition's last row plus the chained HEAD-run lengths of
        // following partitions holding the same key — the forward mirror
        // of rank()'s backward tail-run walk, off the same metadata.
        val metas = collectTieMetas(rdd, orderExprs, childOutput)
        val offsets = metas.scanLeft(0L)(_ + _.n)
        val tailEnd = Array.tabulate(metas.length) { i =>
          if (metas(i).n == 0L) 0L
          else {
            var fwd = 0L
            var j = i + 1
            var cont = true
            while (cont && j < metas.length) {
              val m = metas(j)
              if (m.n == 0L) j += 1
              else if (java.util.Arrays.equals(m.first, metas(i).last)) {
                fwd += m.headRun
                // d == 1 ⇒ the whole partition is one key: keep chaining
                if (m.d == 1L) j += 1 else cont = false
              } else cont = false
            }
            offsets(i) + metas(i).n + fwd
          }
        }
        val nTotal = offsets.last
        val inMemT = conf.windowExecBufferInMemoryThreshold
        val spillT = conf.windowExecBufferSpillThreshold
        val spillSizeT = conf.windowExecBufferSpillSizeThreshold
        rdd.mapPartitionsWithIndex { (pid, it) =>
          val proj = UnsafeProjection.create(orderExprs, childOutput)
          val outProj = UnsafeProjection.create(outAttrs, outAttrs)
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          val off = offsets(pid)
          val te = tailEnd(pid)
          new Iterator[InternalRow] {
            private var prevKey: UnsafeRow = null
            private var pos = 0L // local row position, 1-based
            private val buf = new SpillableGroupBuffer(childOutput, inMemT, spillT, spillSizeT)
            private var outIt: Iterator[InternalRow] = Iterator.empty
            private var srcDone = false
            private def flush(endPos: Long): Iterator[InternalRow] = {
              val cd = endPos.toDouble / nTotal
              buf.swapAndIterate().map { r =>
                rankRow.update(0, cd)
                outProj(joined(r, rankRow))
              }
            }
            private def advance(): Unit = {
              while (!outIt.hasNext && !srcDone) {
                if (!it.hasNext) {
                  srcDone = true
                  // last group of the partition: the forward-stitched end
                  if (buf.nonEmpty) outIt = flush(te)
                } else {
                  val row = it.next()
                  val k = proj(row)
                  pos += 1L
                  if (prevKey == null) {
                    prevKey = k.copy()
                    buf.add(row)
                  } else if (k.equals(prevKey)) {
                    buf.add(row)
                  } else {
                    // group ended at local position pos−1
                    prevKey = k.copy()
                    outIt = flush(off + pos - 1L)
                    buf.add(row)
                  }
                }
              }
            }
            override def hasNext: Boolean = { advance(); outIt.hasNext }
            override def next(): InternalRow = { advance(); outIt.next() }
          }
        }
    }
  }

  /** Pass 1 for the tie-aware modes: per-partition counts + boundary
    * keys + head/tail run lengths — O(numPartitions) metadata on the
    * driver; the exchange's shuffle files are reused by pass 2.
    */
  private def collectTieMetas(
      rdd: RDD[InternalRow],
      orderExprs: Seq[Expression],
      childOutput: Seq[Attribute]
  ): Array[RankPartMeta] =
    rdd
      .mapPartitions(
        { it =>
          val proj = UnsafeProjection.create(orderExprs, childOutput)
          var n = 0L
          var d = 0L
          var run = 0L
          var headRun = 0L
          var first: UnsafeRow = null
          var prevKey: UnsafeRow = null
          it.foreach { row =>
            val k = proj(row)
            if (n == 0L) { prevKey = k.copy(); first = prevKey; d = 1L; run = 1L }
            else if (k.equals(prevKey)) { run += 1L }
            else {
              if (d == 1L) headRun = n // first key change: rows so far = head group
              prevKey = k.copy(); d += 1L; run = 1L
            }
            n += 1L
          }
          if (d == 1L) headRun = n // single-group (or empty) partition
          Iterator.single(
            RankPartMeta(
              n,
              d,
              if (first == null) null else first.getBytes,
              if (prevKey == null) null else prevKey.getBytes,
              run,
              headRun
            )
          )
        },
        preservesPartitioning = true
      )
      .collect()

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

case class GlobalPrefixSumExec(
    order: Seq[SortOrder],
    sumExpr: Expression,
    outAttr: Attribute,
    ansi: Boolean,
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

  override protected def doExecute(): RDD[InternalRow] = outAttr.dataType match {
    case LongType        => executeLong()
    case dt: DecimalType => executeDecimal(dt)
    case other =>
      throw new IllegalStateException(s"GlobalPrefixSumExec: unsupported type $other")
  }

  private def executeLong(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val se = sumExpr
    val strict = ansi
    def add(a: Long, b: Long): Long = if (strict) Math.addExact(a, b) else a + b
    // pass 1: per-partition (partial sum, any-non-null) — the null flag
    // is what stitches SQL's all-null-prefix-is-null semantics exactly
    val partials = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(se, childOutput)
          var s = 0L
          var seen = false
          it.foreach { r =>
            val v = bound.eval(r)
            if (v != null) { s = if (strict) Math.addExact(s, v.asInstanceOf[Long]) else s + v.asInstanceOf[Long]; seen = true }
          }
          Iterator.single((s, seen))
        },
        preservesPartitioning = true
      )
      .collect()
    val offsets = partials.scanLeft((0L, false)) { case ((a, sa), (b, sb)) => (add(a, b), sa || sb) }
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val bound = BindReferences.bindReference(se, childOutput)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val sumRow = new GenericInternalRow(1)
      var acc = offsets(pid)._1
      var seen = offsets(pid)._2
      it.map { row =>
        val v = bound.eval(row)
        if (v != null) { acc = add(acc, v.asInstanceOf[Long]); seen = true }
        if (seen) sumRow.update(0, acc) else sumRow.setNullAt(0)
        proj(joined(row, sumRow))
      }
    }
  }

  private def executeDecimal(dt: DecimalType): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val se = sumExpr
    val strict = ansi
    val prec = dt.precision
    val scale = dt.scale
    // partials accumulate in UNBOUNDED java BigDecimal — exact however
    // long the prefix runs; the result-precision check happens per
    // emitted value, mirroring CheckOverflow's placement
    val partials = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(se, childOutput)
          var s = java.math.BigDecimal.ZERO
          var seen = false
          it.foreach { r =>
            val v = bound.eval(r)
            if (v != null) {
              s = s.add(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
              seen = true
            }
          }
          Iterator.single((s, seen))
        },
        preservesPartitioning = true
      )
      .collect()
    val offsets = partials.scanLeft((java.math.BigDecimal.ZERO, false)) {
      case ((a, sa), (b, sb)) => (a.add(b), sa || sb)
    }
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val bound = BindReferences.bindReference(se, childOutput)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val sumRow = new GenericInternalRow(1)
      var acc = offsets(pid)._1
      var seen = offsets(pid)._2
      it.map { row =>
        val v = bound.eval(row)
        if (v != null) {
          acc = acc.add(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
          seen = true
        }
        if (seen) {
          val d = org.apache.spark.sql.types.Decimal(acc)
          if (d.changePrecision(prec, scale)) sumRow.update(0, d)
          else if (strict)
            throw new ArithmeticException(
              s"GlobalPrefixSum: $acc cannot be represented as Decimal($prec, $scale)"
            )
          else sumRow.setNullAt(0)
        } else sumRow.setNullAt(0)
        proj(joined(row, sumRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Physical plan for [[GlobalPrefixExtremumNode]]: range exchange +
  * local sort (EnsureRequirements), a per-partition extremum pass
  * (ONE value per partition on the driver), then the running-extremum
  * emission with each partition seeded by the prefix-merge of the
  * partials before it. Values retained across rows are defensively
  * copied (`InternalRow.copyValue`) — eval output may alias the
  * iterator's reused row buffer.
  */
case class GlobalPrefixExtremumExec(
    order: Seq[SortOrder],
    valExpr: Expression,
    outAttr: Attribute,
    isMax: Boolean,
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
    val ve = valExpr
    val maxMode = isMax
    val dt = valExpr.dataType
    // the SAME ordering stock Min/Max aggregate with — SQL semantics
    // for NaN/-0.0/collated strings come for free
    def better(ord: Ordering[Any], cand: Any, cur: Any): Boolean =
      if (cur == null) true
      else if (maxMode) ord.compare(cand, cur) > 0
      else ord.compare(cand, cur) < 0
    val partials = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(ve, childOutput)
          val ord = org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(dt)
          var ext: Any = null
          it.foreach { r =>
            val v = bound.eval(r)
            if (v != null && better(ord, v, ext)) ext = InternalRow.copyValue(v)
          }
          Iterator.single(ext)
        },
        preservesPartitioning = true
      )
      .collect()
    val ordD = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
    val offsets = partials.scanLeft(null: Any) { (a, b) =>
      if (b == null) a else if (better(ordD, b, a)) b else a
    }
    val outAttrs = output
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val bound = BindReferences.bindReference(ve, childOutput)
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val extRow = new GenericInternalRow(1)
      var acc: Any = offsets(pid)
      it.map { row =>
        val v = bound.eval(row)
        if (v != null && better(ord, v, acc)) acc = InternalRow.copyValue(v)
        if (acc == null) extRow.setNullAt(0) else extRow.update(0, acc)
        proj(joined(row, extRow))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Per-partition boundary metadata for [[GlobalOffsetWindowExec]]: the
  * first/last ≤k EVALUATED input values (copied out of the row
  * buffers) plus `nn`, the count of values those arrays draw from —
  * every row's value for the plain variant, the partition's NON-NULL
  * values for IGNORE NULLS — what the driver walk compares against k
  * to know whether to keep crossing partitions. Top-level for closure
  * serialization.
  */
private[plans] case class OffsetPartMeta(nn: Long, head: Array[Any], tail: Array[Any])

/** Null-TOLERANT fixed-capacity FIFO (java.util.ArrayDeque rejects
  * nulls, and SQL lag/lead values are nullable by nature).
  */
private[plans] final class NullableRing(cap: Int) {
  private val buf = new Array[Any](math.max(cap, 1))
  private var start = 0
  private var n = 0
  def size: Int = n
  def addLast(v: Any): Unit = {
    buf((start + n) % buf.length) = v
    if (n < buf.length) n += 1
    else start = (start + 1) % buf.length // overwrite oldest (caller keeps n ≤ cap)
  }
  def removeFirst(): Any = {
    val v = buf(start)
    buf(start) = null
    start = (start + 1) % buf.length
    n -= 1
    v
  }
  def peekFirst: Any = buf(start) // oldest = the k-th most recent at capacity
  def toArray: Array[Any] = Array.tabulate(n)(i => buf((start + i) % buf.length))
}

/** Physical plan for [[GlobalOffsetWindowNode]]: range exchange + local
  * sort, a boundary-values metadata pass (O(P·k) on the driver), then
  * one streaming pass — lag keeps a k-deep value FIFO seeded from the
  * previous partitions' tails; lead buffers at most k rows and drains
  * the last ones against the following partitions' heads. IGNORE NULLS
  * (round 18): the FIFO/heads/tails hold NON-NULL values only; lag
  * PEEKS the FIFO (a null row consumes nothing) and lead serves each
  * row when the stream reaches its k-th following non-null (need index
  * = non-nulls-so-far + k), draining leftovers against the following
  * partitions' non-null heads.
  */
case class GlobalOffsetWindowExec(
    order: Seq[SortOrder],
    valExpr: Expression,
    k: Int,
    isLag: Boolean,
    default: Expression,
    ignoreNulls: Boolean,
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
    val ve = valExpr
    val kk = k
    val ign = ignoreNulls
    val defaultVal: Any = default.eval(null) // foldable by the rewrite gate
    // pass 1: boundary values per partition (non-null only under IGNORE
    // NULLS — a null is never a servable offset value there)
    val metas = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(ve, childOutput)
          val head = scala.collection.mutable.ArrayBuffer.empty[Any]
          val tail = new NullableRing(kk) // keeps the LAST ≤k kept values
          var nn = 0L
          it.foreach { r =>
            val v = InternalRow.copyValue(bound.eval(r))
            if (!ign || v != null) {
              if (head.size < kk) head += v
              tail.addLast(v)
              nn += 1L
            }
          }
          Iterator.single(OffsetPartMeta(nn, head.toArray, tail.toArray))
        },
        preservesPartitioning = true
      )
      .collect()
    // driver stitch: lag seeds = last k kept values BEFORE partition p;
    // lead drains = first k kept values AFTER partition p; the walk
    // crosses partitions while the supply (nn) ran short of k
    val seeds: Array[Array[Any]] =
      if (isLag)
        Array.tabulate(metas.length) { p =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
          var j = p - 1
          while (j >= 0 && buf.size < kk) {
            // prepend partition j's tail (already its LAST ≤k values)
            buf.prependAll(metas(j).tail.takeRight(kk - buf.size))
            // if partition j supplied fewer than k values, keep walking
            j = if (metas(j).nn < kk && buf.size < kk) j - 1 else -1
          }
          buf.toArray
        }
      else
        Array.tabulate(metas.length) { p =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
          var j = p + 1
          while (j < metas.length && buf.size < kk) {
            buf ++= metas(j).head.take(kk - buf.size)
            j = if (metas(j).nn < kk && buf.size < kk) j + 1 else metas.length
          }
          buf.toArray
        }
    val outAttrs = output
    if (isLag && ign) {
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val bound = BindReferences.bindReference(ve, childOutput)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        val fifo = new NullableRing(kk) // the k most recent NON-NULLS
        seeds(pid).foreach(fifo.addLast)
        it.map { row =>
          // PEEK, don't pop: a null row consumes nothing; at capacity
          // the oldest entry IS the k-th most recent non-null
          val lagged = if (fifo.size == kk) fifo.peekFirst else defaultVal
          val v = bound.eval(row)
          if (v != null) fifo.addLast(InternalRow.copyValue(v)) // evicts oldest at cap
          if (lagged == null) vRow.setNullAt(0) else vRow.update(0, lagged)
          proj(joined(row, vRow))
        }
      }
    } else if (!isLag && ign) {
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val bound = BindReferences.bindReference(ve, childOutput)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        val after = seeds(pid)
        new Iterator[InternalRow] {
          // (row, need): need = global index of the row's k-th following
          // non-null = non-nulls-through-this-row + k. Needs are
          // non-decreasing, so pending is FIFO and vals drains in step;
          // pending is bounded by k + the longest null run, vals by k
          private val pending = new java.util.ArrayDeque[(InternalRow, Long)]()
          private val vals = new java.util.ArrayDeque[(Long, Any)]() // (globalIdx, non-null value)
          private var nnCount = 0L
          private var nnTotal = -1L // set at source end
          private def emit(row: InternalRow, v: Any): InternalRow = {
            if (v == null) vRow.setNullAt(0) else vRow.update(0, v)
            proj(joined(row, vRow))
          }
          override def hasNext: Boolean = !pending.isEmpty || it.hasNext
          override def next(): InternalRow = {
            while (true) {
              if (!pending.isEmpty && pending.peekFirst()._2 <= nnCount) {
                val (row, need) = pending.removeFirst()
                while (!vals.isEmpty && vals.peekFirst()._1 < need) vals.removeFirst()
                // vals head is exactly `need` — the k-th following non-null
                return emit(row, vals.peekFirst()._2)
              }
              if (it.hasNext) {
                val row = it.next()
                val v = bound.eval(row)
                if (v != null) {
                  nnCount += 1L
                  vals.addLast((nnCount, InternalRow.copyValue(v)))
                }
                pending.addLast((row.copy(), nnCount + kk))
              } else {
                if (nnTotal < 0) nnTotal = nnCount
                // drain: the (need − nnTotal)-th non-null AFTER this
                // partition, from the following partitions' heads
                val (row, need) = pending.removeFirst()
                val idx = need - nnTotal - 1
                return emit(row, if (idx >= 0 && idx < after.length) after(idx.toInt) else defaultVal)
              }
            }
            throw new IllegalStateException("unreachable")
          }
        }
      }
    } else if (isLag) {
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val bound = BindReferences.bindReference(ve, childOutput)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        val fifo = new NullableRing(kk)
        seeds(pid).foreach(fifo.addLast)
        it.map { row =>
          val lagged = if (fifo.size == kk) fifo.removeFirst() else defaultVal
          fifo.addLast(InternalRow.copyValue(bound.eval(row)))
          if (lagged == null) vRow.setNullAt(0) else vRow.update(0, lagged)
          proj(joined(row, vRow))
        }
      }
    } else {
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val bound = BindReferences.bindReference(ve, childOutput)
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        val after = seeds(pid)
        new Iterator[InternalRow] {
          private val pending = new java.util.ArrayDeque[InternalRow](kk + 1)
          private var drainIdx = 0
          private var drainCount = 0 // rows left in pending at source end
          private var draining = false
          private def emit(row: InternalRow, v: Any): InternalRow = {
            if (v == null) vRow.setNullAt(0) else vRow.update(0, v)
            proj(joined(row, vRow))
          }
          override def hasNext: Boolean = !pending.isEmpty || it.hasNext
          override def next(): InternalRow = {
            while (!draining && it.hasNext && pending.size <= kk) {
              pending.addLast(it.next().copy())
              if (pending.size > kk) {
                // the row k behind the one just read pairs with its value
                val row = pending.removeFirst()
                val bnd = bound
                return emit(row, bnd.eval(pending.peekLast()))
              }
            }
            if (!draining && !it.hasNext) { draining = true; drainCount = pending.size }
            // drain: remaining rows pair with the following partitions'
            // head values (index i + k − m for the i-th remaining row)
            val row = pending.removeFirst()
            val idx = drainIdx + kk - drainCount
            drainIdx += 1
            emit(row, if (idx >= 0 && idx < after.length) after(idx) else defaultVal)
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Per-partition metadata for the RANGE-frame running sum: row/group
  * counts, boundary order-key bytes, and the sums (+ any-non-null
  * flags) of the whole partition, its FIRST peer group and its LAST
  * peer group. Accumulators are Long or java BigDecimal (both
  * serializable). Top-level for closure serialization.
  */
private[plans] case class RangeSumPartMeta(
    n: Long,
    d: Long,
    first: Array[Byte],
    last: Array[Byte],
    tot: Any,
    totSeen: Boolean,
    head: Any,
    headSeen: Boolean,
    tail: Any,
    tailSeen: Boolean
)

/** Typed accumulator ops for [[GlobalRangePrefixSumExec]] — mirrors
  * [[GlobalPrefixSumExec]]'s per-type semantics exactly (LEGACY long
  * adds wrap like the stock hash aggregate, ANSI uses addExact;
  * decimal accumulates in unbounded BigDecimal with the precision
  * check at each emission).
  */
private[plans] sealed trait RangeSumOps extends Serializable {
  def zero: Any
  def add(a: Any, b: Any): Any
  def fromInput(v: Any): Any

  /** Write `acc` (when `seen`) into slot 0, or null. */
  def write(row: GenericInternalRow, acc: Any, seen: Boolean): Unit
}
private[plans] final class LongRangeSumOps(strict: Boolean) extends RangeSumOps {
  def zero: Any = 0L
  def add(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    if (strict) Math.addExact(x, y) else x + y
  }
  def fromInput(v: Any): Any = v.asInstanceOf[Long]
  def write(row: GenericInternalRow, acc: Any, seen: Boolean): Unit =
    if (seen) row.update(0, acc.asInstanceOf[Long]) else row.setNullAt(0)
}
/** count() semantics: the accumulator is a plain row tally driven by a
  * never-null 0/1 input expression; an empty frame emits 0, never null.
  */
private[plans] final class CountRangeSumOps extends RangeSumOps {
  def zero: Any = 0L
  def add(a: Any, b: Any): Any = a.asInstanceOf[Long] + b.asInstanceOf[Long]
  def fromInput(v: Any): Any = v.asInstanceOf[Long]
  def write(row: GenericInternalRow, acc: Any, seen: Boolean): Unit =
    row.update(0, if (seen) acc.asInstanceOf[Long] else 0L)
}
/** min/max through the peer group's end: a null-started accumulator
  * merged by the same interpreted ordering stock Min/Max use; values
  * are defensively copied on retention. Emits the input type directly
  * (no precision mechanics).
  */
private[plans] final class ExtremumRangeOps(
    dt: org.apache.spark.sql.types.DataType,
    isMax: Boolean
) extends RangeSumOps {
  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
  def zero: Any = null
  def add(a: Any, b: Any): Any =
    if (a == null) b
    else if (b == null) a
    else if (isMax == (ord.compare(b, a) > 0)) b
    else a
  def fromInput(v: Any): Any = InternalRow.copyValue(v)
  def write(row: GenericInternalRow, acc: Any, seen: Boolean): Unit =
    if (!seen || acc == null) row.setNullAt(0) else row.update(0, acc)
}
private[plans] final class DecimalRangeSumOps(prec: Int, scale: Int, strict: Boolean)
    extends RangeSumOps {
  def zero: Any = java.math.BigDecimal.ZERO
  def add(a: Any, b: Any): Any =
    a.asInstanceOf[java.math.BigDecimal].add(b.asInstanceOf[java.math.BigDecimal])
  def fromInput(v: Any): Any =
    v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
  def write(row: GenericInternalRow, acc: Any, seen: Boolean): Unit =
    if (!seen) row.setNullAt(0)
    else {
      val d = org.apache.spark.sql.types.Decimal(acc.asInstanceOf[java.math.BigDecimal])
      if (d.changePrecision(prec, scale)) row.update(0, d)
      else if (strict)
        throw new ArithmeticException(
          s"GlobalRangePrefixSum: $acc cannot be represented as Decimal($prec, $scale)"
        )
      else row.setNullAt(0)
    }
}

/** Physical plan for [[GlobalRangePrefixSumNode]]: every row's value is
  * the global sum through the END of its peer group. Same two-pass
  * shape as the other idioms; pass 2 buffers ONE peer group (stock
  * WindowExec's RANGE-frame buffer, per-partition) and only the last
  * group consults the forward head-group chain.
  */
/** Per-partition edge-value metadata for [[GlobalFirstValueExec]]:
  * row presence, the partition's edge (first/last) row value, and its
  * first/last NON-NULL value for IGNORE NULLS. Top-level so the task
  * closure serializes without the plan.
  */
private[plans] case class EdgeValPartMeta(
    nonEmpty: Boolean,
    edgeVal: Any,
    hasNonNull: Boolean,
    nonNullVal: Any
)

/** Eleventh idiom exec: the global first_value/last_value CONSTANT.
  * Pass 1 streams each partition once for its edge values (O(P) driver
  * metadata off the reused shuffle files); the driver picks the first
  * (or last) qualifying partition's value; pass 2 attaches it to every
  * row. No window buffer, no single-task pass.
  */
case class GlobalFirstValueExec(
    order: Seq[SortOrder],
    valExpr: Expression,
    ignoreNulls: Boolean,
    isFirst: Boolean,
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
    val ve = valExpr
    val ign = ignoreNulls
    val first = isFirst
    val metas = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(ve, childOutput)
          var nonEmpty = false
          var edgeVal: Any = null
          var hasNonNull = false
          var nonNullVal: Any = null
          it.foreach { row =>
            val v = InternalRow.copyValue(bound.eval(row))
            if (!nonEmpty) { nonEmpty = true; edgeVal = v }
            if (!first) edgeVal = v // last row wins
            if (v != null && (!first || !hasNonNull)) { hasNonNull = true; nonNullVal = v }
            // for last: keep overwriting so the LAST non-null wins
            if (v != null && !first) nonNullVal = v
          }
          Iterator.single(EdgeValPartMeta(nonEmpty, edgeVal, hasNonNull, nonNullVal))
        },
        preservesPartitioning = true
      )
      .collect()
    val ordered = if (first) metas.toSeq else metas.reverseIterator.toSeq
    val constant: Any =
      if (ign) ordered.find(_.hasNonNull).map(_.nonNullVal).orNull
      else ordered.find(_.nonEmpty).map(_.edgeVal).orNull
    val outAttrs = output
    rdd.mapPartitions(
      { it =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        if (constant == null) vRow.setNullAt(0) else vRow.update(0, constant)
        it.map(row => proj(joined(row, vRow)))
      },
      preservesPartitioning = true
    )
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Thirteenth idiom exec: the global k-th-row value CONSTANT. Pass 1
  * streams each partition for its first ≤k evaluated values + row
  * count (O(P·k) driver metadata, the lag/lead head machinery); the
  * driver concatenates heads in partition order and indexes the k-th
  * (null — with the found flag false — when the relation holds fewer
  * than k rows); pass 2 attaches it. Gated k ≤ 1024 like lag/lead.
  */
case class GlobalKthValueExec(
    order: Seq[SortOrder],
    valExpr: Expression,
    k: Int,
    ignoreNulls: Boolean,
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
    val ve = valExpr
    val kk = k
    val skipNulls = ignoreNulls
    // ignoreNulls: n counts and heads hold only NON-NULL values — the
    // stitch below then walks non-null counts, landing on the k-th
    // non-null of the whole relation (null when fewer than k exist)
    val metas = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(ve, childOutput)
          val head = scala.collection.mutable.ArrayBuffer.empty[Any]
          var n = 0L
          it.foreach { row =>
            val v = bound.eval(row)
            if (!(skipNulls && v == null)) {
              if (head.size < kk) head += InternalRow.copyValue(v)
              n += 1L
            }
          }
          Iterator.single((n, head.toArray))
        },
        preservesPartitioning = true
      )
      .collect()
    // the k-th row's value across partitions in order; heads carry the
    // first min(k, n_p) values of each, so walking cumulative counts
    // lands inside some partition's head whenever total n >= k
    var constant: Any = null
    var remaining = kk.toLong
    var i = 0
    var found = false
    while (!found && i < metas.length) {
      val (n, head) = metas(i)
      if (remaining <= n) {
        // the target row is in partition i; its head holds at least
        // min(k, n) >= remaining values
        constant = head((remaining - 1).toInt)
        found = true
      } else {
        remaining -= n
      }
      i += 1
    }
    val cst = constant
    val outAttrs = output
    rdd.mapPartitions(
      { it =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        if (cst == null) vRow.setNullAt(0) else vRow.update(0, cst)
        it.map(row => proj(joined(row, vRow)))
      },
      preservesPartitioning = true
    )
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Twelfth idiom exec: the relation-wide aggregate CONSTANT. Pass 1
  * folds each partition to one (partial, seen) pair — O(P) driver
  * metadata; the driver combines them with the same [[RangeSumOps]]
  * the RANGE exec trusts (exact long/decimal sums, tally counts,
  * interpreted-ordering extrema); pass 2 attaches the constant. NO
  * required distribution or ordering — the child's partitioning is
  * preserved, no exchange, no sort, no whole-relation buffer.
  */
case class GlobalScalarAggExec(
    sumExpr: Expression,
    outAttr: Attribute,
    ansi: Boolean,
    kind: RangeAggKind,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr :: Nil)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  private def opsFor(): RangeSumOps = kind match {
    case RangeAggKind.CountK           => new CountRangeSumOps
    case RangeAggKind.ExtremumK(isMax) => new ExtremumRangeOps(outAttr.dataType, isMax)
    case RangeAggKind.SumK =>
      outAttr.dataType match {
        case LongType        => new LongRangeSumOps(ansi)
        case dt: DecimalType => new DecimalRangeSumOps(dt.precision, dt.scale, ansi)
        case other =>
          throw new IllegalStateException(s"GlobalScalarAggExec: unsupported sum type $other")
      }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val ops = opsFor()
    val rdd = child.execute()
    val childOutput = child.output
    val se = sumExpr
    val partials = rdd
      .mapPartitions(
        { it =>
          val bound = BindReferences.bindReference(se, childOutput)
          var acc = ops.zero
          var seen = false
          it.foreach { row =>
            val v = bound.eval(row)
            if (v != null) {
              acc = ops.add(acc, ops.fromInput(InternalRow.copyValue(v)))
              seen = true
            }
          }
          Iterator.single((acc, seen))
        },
        preservesPartitioning = true
      )
      .collect()
    var total = ops.zero
    var anySeen = false
    partials.foreach { case (p, s) => if (s) { total = ops.add(total, p); anySeen = true } }
    val tot = total
    val seenAll = anySeen
    val outAttrs = output
    rdd.mapPartitions(
      { it =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val vRow = new GenericInternalRow(1)
        ops.write(vRow, tot, seenAll)
        it.map(row => proj(joined(row, vRow)))
      },
      preservesPartitioning = true
    )
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

case class GlobalRangePrefixSumExec(
    order: Seq[SortOrder],
    sumExpr: Expression,
    outAttr: Attribute,
    ansi: Boolean,
    kind: RangeAggKind,
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
    val ops: RangeSumOps = kind match {
      case RangeAggKind.CountK => new CountRangeSumOps
      case RangeAggKind.ExtremumK(isMax) => new ExtremumRangeOps(outAttr.dataType, isMax)
      case RangeAggKind.SumK =>
        outAttr.dataType match {
          case LongType        => new LongRangeSumOps(ansi)
          case dt: DecimalType => new DecimalRangeSumOps(dt.precision, dt.scale, ansi)
          case other =>
            throw new IllegalStateException(s"GlobalRangePrefixSumExec: unsupported sum type $other")
        }
    }
    val rdd = child.execute()
    val childOutput = child.output
    val orderExprs = order.map(_.child)
    val se = sumExpr
    // pass 1: partition/head-group/tail-group sums + boundary keys
    val metas = rdd
      .mapPartitions(
        { it =>
          val kproj = UnsafeProjection.create(orderExprs, childOutput)
          val bound = BindReferences.bindReference(se, childOutput)
          var n = 0L
          var d = 0L
          var first: UnsafeRow = null
          var prevKey: UnsafeRow = null
          var tot = ops.zero; var totSeen = false
          var head = ops.zero; var headSeen = false
          var grp = ops.zero; var grpSeen = false
          it.foreach { row =>
            val k = kproj(row)
            if (n == 0L) { prevKey = k.copy(); first = prevKey; d = 1L }
            else if (!k.equals(prevKey)) {
              if (d == 1L) { head = grp; headSeen = grpSeen }
              prevKey = k.copy(); d += 1L
              grp = ops.zero; grpSeen = false
            }
            val v = bound.eval(row)
            if (v != null) {
              val a = ops.fromInput(v)
              tot = ops.add(tot, a); totSeen = true
              grp = ops.add(grp, a); grpSeen = true
            }
            n += 1L
          }
          if (d == 1L) { head = grp; headSeen = grpSeen }
          Iterator.single(
            RangeSumPartMeta(
              n,
              d,
              if (first == null) null else first.getBytes,
              if (prevKey == null) null else prevKey.getBytes,
              tot,
              totSeen,
              head,
              headSeen,
              grp,
              grpSeen
            )
          )
        },
        preservesPartitioning = true
      )
      .collect()
    // driver: prefix offsets + the forward head-group chain per partition
    val offsets = new Array[Any](metas.length)
    val offSeen = new Array[Boolean](metas.length)
    var acc = ops.zero; var accSeen = false
    var i = 0
    while (i < metas.length) {
      offsets(i) = acc; offSeen(i) = accSeen
      if (metas(i).n > 0L) { acc = ops.add(acc, metas(i).tot); accSeen ||= metas(i).totSeen }
      i += 1
    }
    val fwd = new Array[Any](metas.length)
    val fwdSeen = new Array[Boolean](metas.length)
    i = 0
    while (i < metas.length) {
      var f = ops.zero; var fs = false
      if (metas(i).n > 0L) {
        var j = i + 1
        var cont = true
        while (cont && j < metas.length) {
          val m = metas(j)
          if (m.n == 0L) j += 1
          else if (java.util.Arrays.equals(m.first, metas(i).last)) {
            f = ops.add(f, m.head); fs ||= m.headSeen
            if (m.d == 1L) j += 1 else cont = false
          } else cont = false
        }
      }
      fwd(i) = f; fwdSeen(i) = fs
      i += 1
    }
    val outAttrs = output
    val inMemT = conf.windowExecBufferInMemoryThreshold
    val spillT = conf.windowExecBufferSpillThreshold
    val spillSizeT = conf.windowExecBufferSpillSizeThreshold
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val kproj = UnsafeProjection.create(orderExprs, childOutput)
      val bound = BindReferences.bindReference(se, childOutput)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val vRow = new GenericInternalRow(1)
      val pFwd = fwd(pid); val pFwdSeen = fwdSeen(pid)
      new Iterator[InternalRow] {
        private var prevKey: UnsafeRow = null
        private var accL: Any = offsets(pid)
        private var seenL: Boolean = offSeen(pid)
        private val buf = new SpillableGroupBuffer(childOutput, inMemT, spillT, spillSizeT)
        private var outIt: Iterator[InternalRow] = Iterator.empty
        private var srcDone = false
        private def flush(value: Any, seen: Boolean): Iterator[InternalRow] =
          buf.swapAndIterate().map { r =>
            ops.write(vRow, value, seen)
            proj(joined(r, vRow))
          }
        private def advance(): Unit = {
          while (!outIt.hasNext && !srcDone) {
            if (!it.hasNext) {
              srcDone = true
              // last group: the forward chain completes its frame
              if (buf.nonEmpty) outIt = flush(ops.add(accL, pFwd), seenL || pFwdSeen)
            } else {
              val row = it.next()
              val k = kproj(row)
              if (prevKey != null && !k.equals(prevKey)) {
                // group closed at the PREVIOUS row — snapshot before adding
                prevKey = k.copy()
                val snapVal = accL; val snapSeen = seenL
                val v = bound.eval(row)
                if (v != null) { accL = ops.add(accL, ops.fromInput(v)); seenL = true }
                outIt = flush(snapVal, snapSeen)
                buf.add(row)
              } else {
                if (prevKey == null) prevKey = k.copy()
                val v = bound.eval(row)
                if (v != null) { accL = ops.add(accL, ops.fromInput(v)); seenL = true }
                buf.add(row)
              }
            }
          }
        }
        override def hasNext: Boolean = { advance(); outIt.hasNext }
        override def next(): InternalRow = { advance(); outIt.next() }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object GlobalRank {

  /** Ensure rules + strategy are installed on the session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(GlobalWindowRewrite: Rule[LogicalPlan]).foreach { r =>
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
