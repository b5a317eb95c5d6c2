package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampType}

/** MATERIALIZED-VIEW REWRITE (§2.8, the `Rule[LogicalPlan]` extension
  * level): a registered rollup of mergeable partials (c6's per-(day,
  * type) table) transparently answers aggregate queries written against
  * the RAW fact table. At 100 TB this is the difference between a
  * dashboard group-by costing a full-history scan and costing a scan of
  * a days×types summary — without the query author knowing the summary
  * exists.
  *
  * A registration ([[MvRegistry.register]]) binds a source VIEW (any
  * chain of deterministic projections over one parquet relation) to a
  * summary table with
  *   - `dims`: grouping dimensions, each given as a SQL expression over
  *     the source view's columns (a bare column name, or a derived form
  *     like `cast(ts as date)`) mapped to the summary column that
  *     stores it,
  *   - one or more measures, summarized per dims row as a shared
  *     `n = count(1)` plus `sm = sum(m)`, `mn = min(m)`, `mx = max(m)`
  *     for each ([[MvRegistry.registerMeasures]] — the warehouse rollup
  *     shape where one partials table answers several dashboards).
  *
  * Matching is STRUCTURAL, not name-based: both the registered dim
  * expressions and the query's expressions are normalized into
  * templates — their attribute references rewritten down the
  * projection chain to name-keyed placeholders on the base relation —
  * and compared with `semanticEquals`. A query names nothing; it just
  * computes the same thing the summary grouped by.
  *
  * The rule rewrites `Aggregate(G, A, scan(source))` when
  *   - the scan reaches the source relation through deterministic
  *     Projects and Filters,
  *   - every filter conjunct, after replacing each maximal
  *     dim-matching subtree with its summary column, references ONLY
  *     summary columns (all raw rows behind one partial row share its
  *     dim values, so a dims-only predicate commutes with the
  *     pre-grouping; any finer predicate disqualifies the rewrite),
  *   - every grouping expression is deterministic and, after the same
  *     substitution, references only summary columns — so grouping by
  *     a dim, or by ANY function of dims (`trunc(dt, 'month')`), is
  *     admitted: re-aggregating partials under a coarser grouping is
  *     the partial-merge algebra applied twice (day→month is exactly
  *     the month-from-day rollup), and
  *   - every aggregate call in `A` is `count(1)` / `count(m)` /
  *     `sum(m)` / `min(m)` / `max(m)` / `avg(m)` on the measure, with
  *     no DISTINCT and no FILTER clause. Scalar expressions above and
  *     around the calls (`round(sum(m), 2)`, arithmetic, …) are
  *     preserved — only the aggregate-function nodes are substituted.
  *
  * The substitution is the standard partial-merge algebra: `count(1) →
  * sum(n)`, `sum(m) → sum(sm)`, `min(m) → min(mn)`, `max(m) → max(mx)`,
  * `avg(m) → sum(sm) / sum(n)`. `count(m)`/`avg(m)` additionally
  * require the registrar's `measureNonNull` attestation, because the
  * summary's `n` counts rows, not non-null measures. Output attribute
  * ids are preserved (aliases reuse the original exprIds), so operators
  * above the Aggregate — sorts, projections, joins — are untouched by
  * the swap.
  *
  * Correctness contract: summing per-group partial sums re-associates
  * float addition exactly like Spark's own two-phase hash aggregate
  * does between map-side and final partials — the same tolerance the
  * oracle gate already admits for every grouped sum.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty) plan
    else
      plan.transformUp { case agg: Aggregate =>
        tryRewrite(agg).getOrElse(agg)
      }

  /** A name-keyed placeholder for a base-relation column: the exprId is
    * a pure function of the (lowercased) column name, so structurally
    * equal expressions from DIFFERENT plan instances canonicalize
    * identically and compare with `semanticEquals`. The id space is
    * offset into the high range so it can't collide with the analyzer's
    * sequential ids within any realistic process lifetime.
    */
  private def templateAttr(a: Attribute): AttributeReference = {
    val n = a.name.toLowerCase(java.util.Locale.ROOT)
    // 62-bit id from two independent murmur passes: a 30-bit hash could
    // plausibly collide between two columns of one wide relation, which
    // would alias two different dims and corrupt the rewrite
    val h = (scala.util.hashing.MurmurHash3.stringHash(n, 0x9747b28c).toLong << 31) ^
      (scala.util.hashing.MurmurHash3.stringHash(n, 0x85ebca6b).toLong & 0x7fffffffL)
    AttributeReference(n, a.dataType, nullable = true)(
      exprId = ExprId(0x4000000000000000L | (h & 0x3fffffffffffffffL))
    )
  }

  /** Rewrite `e` into its base-relation template: every attribute
    * reference replaced by its recorded template (itself an expression
    * over name-keyed base columns). None if `e` is non-deterministic or
    * touches an attribute the projection chain didn't carry.
    */
  private[graft] def templateOf(
      e: Expression,
      names: Map[ExprId, Expression]
  ): Option[Expression] = {
    if (!e.deterministic) return None
    var ok = true
    val t = e.transformUp {
      case a: AttributeReference =>
        names.get(a.exprId) match {
          case Some(tm) => tm
          case None     => ok = false; a
        }
    }
    if (ok) Some(foldConstants(t)) else None
  }

  /** Normalize constant subtrees to literals so templates captured
    * pre-optimization compare equal to query shapes the optimizer has
    * already constant-folded (`ts div cast(1000 as bigint)` vs
    * `ts div 1000`). Evaluation failures keep the node as-is.
    */
  private def foldConstants(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      try Literal.create(f.eval(null), f.dataType)
      catch { case _: Exception => f }
  }

  /** Walk deterministic Projects and Filters down to a parquet
    * relation, building the exprId → base-template map for every
    * attribute the chain carries (bare columns AND deterministic
    * derived aliases — `timestamp_micros(ts div 1000) as ts`,
    * `cast(ts as date) as dt`, …) and collecting filter conjuncts
    * (validated against the MV's dims later). Any other node shape
    * disqualifies the subtree.
    */
  private[graft] def baseOf(
      plan: LogicalPlan
  ): Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] =
    plan match {
      case lr: LogicalRelation =>
        Some((lr, lr.output.map(a => a.exprId -> (templateAttr(a): Expression)).toMap, Seq.empty))
      case Project(items, child) =>
        baseOf(child).map { case (lr, inner, conds) =>
          val carried = items.flatMap {
            case a: AttributeReference if inner.contains(a.exprId) =>
              Some(a.exprId -> inner(a.exprId))
            case al: Alias => templateOf(al.child, inner).map(t => al.exprId -> t)
            case _         => None
          }.toMap
          // cumulative: lower-level ids stay resolvable so that filter
          // conjuncts captured BELOW this Project still validate
          (lr, inner ++ carried, conds)
        }
      case Filter(cond, child) if cond.deterministic =>
        baseOf(child).map { case (lr, inner, conds) => (lr, inner, conds :+ cond) }
      case _ => None
    }

  /** Walk deterministic Projects and Filters down to an INNER equi-ish
    * Join — the star-dashboard shape `Aggregate(fact ⋈ dim)` after
    * column pruning has stacked pass-through/alias Projects above the
    * join. Returns the join plus alias definitions and filter conjuncts
    * RESOLVED down to join-output attributes (a `_groupingexpression`
    * alias or a filter above the top Project references names that
    * don't exist at the join — resolution rewrites them in terms of the
    * two join sides, so the fact/dim split can be decided per subtree).
    */
  private[graft] def joinOf(
      plan: LogicalPlan
  ): Option[(Join, Map[ExprId, Expression], Seq[Expression])] = plan match {
    case j: Join => Some((j, Map.empty, Seq.empty))
    case Project(items, child) =>
      joinOf(child).flatMap { case (j, above, conds) =>
        def resolve(e: Expression): Expression = e.transformUp {
          case a: AttributeReference => above.getOrElse(a.exprId, a)
        }
        var ok = true
        val added = items.flatMap {
          case _: AttributeReference                => None
          case al: Alias if al.child.deterministic  => Some(al.exprId -> resolve(al.child))
          case _                                    => ok = false; None
        }
        if (ok) Some((j, above ++ added, conds)) else None
      }
    case Filter(cond, child) if cond.deterministic =>
      joinOf(child).map { case (j, above, conds) =>
        val resolved = cond.transformUp {
          case a: AttributeReference => above.getOrElse(a.exprId, a)
        }
        (j, above, conds :+ resolved)
      }
    case _ => None
  }

  private[graft] def sourcePaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _                    => Seq.empty
  }

  /** Try every summary registered for the scanned relation, COARSEST
    * first (fewest dims — the smallest partials table), and take the
    * first that can answer the aggregate: classic MV selection. A
    * type-only rollup (T rows) beats day×type partials (D×T rows)
    * for a type-grouped dashboard; the finer summary still catches
    * queries the coarse one must bail on.
    */
  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    tryRewriteScan(agg).orElse(tryRewriteJoin(agg))

  private def tryRewriteScan(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (lr, names, conds) <- baseOf(agg.child)
      candidates = MvRegistry.lookup(sourcePaths(lr))
      rewritten <- candidates.view.flatMap(mv => rewriteAggregate(agg, names, conds, mv)).headOption
    } yield rewritten
  }

  /** STAR-JOIN rewrite: `Aggregate(G, A, fact ⋈ dim)` answered from the
    * fact's registered rollup when the join keys on the fact side are
    * registered dims. Soundness is the same commuting argument as dim
    * filters: every raw row behind one partial row carries identical
    * dim values, so an inner join ON dims treats the whole partial
    * uniformly — each summary row is matched (or dropped, or
    * duplicated) exactly as each of its raw rows would be. count/sum
    * scale with the duplication on both sides; min/max are duplication-
    * insensitive; avg divides two identically-scaled sums. Grouping and
    * filtering may freely mix dim-table attributes with registered
    * dims; any aggregate ARGUMENT from the dim side bails (a summary
    * carries no dim-table partials).
    */
  private def tryRewriteJoin(agg: Aggregate): Option[LogicalPlan] =
    joinOf(agg.child).filter { case (j, _, _) =>
      j.condition.exists(_.deterministic)
    }.flatMap { case (j, above, aboveConds) =>
      // the FACT must be the preserved side: a dim-preserved outer join
      // emits one null-extended row per unmatched dim row, which the
      // summary's n-weighted algebra cannot see (sum over a null n
      // skips the row the raw side keeps)
      def typeOk(factLeft: Boolean): Boolean = j.joinType match {
        case Inner                           => true
        case LeftOuter | LeftSemi | LeftAnti => factLeft
        case RightOuter                      => !factLeft
        case _                               => false
      }
      def attempt(factSide: LogicalPlan, factLeft: Boolean): Option[LogicalPlan] =
        if (!typeOk(factLeft)) None
        else
          baseOf(factSide).flatMap { case (lr, names, factConds) =>
            val resolve: Expression => Expression = e =>
              e.transformUp { case a: AttributeReference => above.getOrElse(a.exprId, a) }
            MvRegistry
              .lookup(sourcePaths(lr))
              .view
              .flatMap(mv =>
                rewriteAggregate(agg, names, factConds ++ aboveConds, mv, resolve,
                  joinWrap = Some((j, factLeft))))
              .headOption
          }
      attempt(j.left, factLeft = true).orElse(attempt(j.right, factLeft = false))
    }

  /** `resolve` maps query-side expressions down to join-output
    * attributes before template matching (identity on the scan path);
    * `joinWrap` carries the star join to rebuild around the summary on
    * the fact side.
    */
  private def rewriteAggregate(
      agg: Aggregate,
      names: Map[ExprId, Expression],
      conds: Seq[Expression],
      mv: MvRegistry.MvDef,
      resolve: Expression => Expression = identity,
      joinWrap: Option[(Join, Boolean)] = None
  ): Option[LogicalPlan] = {
    val summary = mv.summaryPlan()
    val sAttr: Map[String, Attribute] = summary.output.map(a => a.name -> a).toMap
    // summary must actually carry the columns the registration promises
    val promised =
      mv.dimTemplates.map(_._2) ++ (mv.cnt +: mv.measures.flatMap(m => Seq(m.sm, m.mn, m.mx)))
    if (!promised.forall(sAttr.contains)) return None

    // Substitution happens in TEMPLATE space: the query expression is
    // first normalized down the projection chain (so shapes the
    // optimizer re-rooted — PullOutGroupingExpressions'
    // `_groupingexpression` aliases — still match structurally), then
    // every maximal dim-template subtree becomes its summary column.
    def substTemplate(t: Expression): Expression =
      mv.dimTemplates.collectFirst { case (dt, c) if dt.semanticEquals(t) => sAttr(c) } match {
        case Some(attr) => attr
        case None       => t.mapChildren(substTemplate)
      }
    def isPlaceholder(a: Attribute): Boolean = (a.exprId.id & 0x4000000000000000L) != 0
    def fullySubstituted(e: Expression): Boolean =
      !e.exists { case a: AttributeReference => isPlaceholder(a); case _ => false }
    def subDims(e: Expression): Expression =
      templateOf(e, names) match {
        case Some(t) =>
          val r = substTemplate(t)
          if (fullySubstituted(r)) r else e.mapChildren(subDims)
        case None => e.mapChildren(subDims)
      }
    // after substitution, no reference may still point at the source
    def clean(e: Expression): Boolean = e.references.forall(a => !names.contains(a.exprId))

    // DAY-BOUNDARY PREDICATE LIFT: the optimizer unwraps
    // `cast(ts as date) = D` into `ts >= midnight(D) AND ts <
    // midnight(D+1) AND isnotnull(ts)` (UnwrapCastInBinaryComparison)
    // long before this rule runs, so a dashboard's day filter never
    // survives in dim form. When a dim is registered as
    // `cast(X as date)`, a comparison of X against an EXACT local
    // midnight is equivalent to a date comparison on the dim — rows on
    // either side of the boundary land in disjoint day partials — and
    // is lifted back; any intra-day instant disqualifies the conjunct.
    // Only admit Cast dims whose analyzed timeZoneId matches the CURRENT
    // session timezone: the midnight boundaries below are computed with
    // the session zone, so a dim registered under a different zone would
    // lift `ts >= midnight(D)` to a WRONG `dt >= D` (different rows on
    // either side of the boundary). Mismatch disables the lift (the
    // structural path stays safe — Cast.semanticEquals compares zones).
    val dateDims: Seq[(Expression, Attribute)] = mv.dimTemplates.collect {
      case (Cast(inner, DateType, tz, _), c) if tz.contains(conf.sessionLocalTimeZone) =>
        (inner, sAttr(c))
    }
    val zone = java.time.ZoneId.of(conf.sessionLocalTimeZone)
    def tsDim(x: Expression): Option[Attribute] =
      templateOf(x, names).flatMap(t =>
        dateDims.collectFirst { case (inner, attr) if inner.semanticEquals(t) => attr })
    def dayBoundary(l: Literal): Option[Int] = l match {
      case Literal(micros: Long, TimestampType) =>
        val days = DateTimeUtils.microsToDays(micros, zone)
        if (DateTimeUtils.daysToMicros(days, zone) == micros) Some(days) else None
      case _ => None
    }
    // `isnotnull(X)` where some dim is `cast(f(X) as date)` and f is a
    // null-faithful chain (null in ⇔ null out): equivalent to
    // isnotnull(dim) — the null rows are exactly the null-dim partials
    def nonZeroLiteral(e: Expression): Boolean = e match {
      case Literal(null, _)                                  => false
      case Literal(v: java.lang.Number, _)                   => v.doubleValue() != 0.0
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => !d.isZero
      case _                                                 => false
    }
    def nullFaithful(inner: Expression, xt: Expression): Boolean =
      inner.semanticEquals(xt) || {
        // divisions are null-faithful ONLY with a provably non-zero
        // literal divisor: under ANSI-off, x/0 is NULL for non-null x,
        // so a variable (or zero) divisor would let the isnotnull(X) →
        // IsNotNull(dim) lift drop rows the raw query keeps
        val whitelisted = !inner.exists {
          case _: AttributeReference | _: Literal => false
          case d: Divide                          => !nonZeroLiteral(d.right)
          case d: IntegralDivide                  => !nonZeroLiteral(d.right)
          case e =>
            !Seq("Cast", "MicrosToTimestamp", "MillisToTimestamp", "SecondsToTimestamp",
              "Multiply", "Add", "Subtract", "UnaryMinus")
              .contains(e.getClass.getSimpleName)
        }
        whitelisted && (xt match {
          case a: AttributeReference => inner.references.map(_.exprId).toSet == Set(a.exprId)
          case _                     => false
        })
      }
    def liftDay(c: Expression): Option[Expression] = c match {
      case IsNotNull(x) =>
        templateOf(x, names).flatMap(xt =>
          dateDims.collectFirst { case (inner, attr) if nullFaithful(inner, xt) => IsNotNull(attr) })
      case GreaterThanOrEqual(x, l: Literal) =>
        for { a <- tsDim(x); d <- dayBoundary(l) } yield GreaterThanOrEqual(a, Literal(d, DateType))
      case LessThan(x, l: Literal) =>
        for { a <- tsDim(x); d <- dayBoundary(l) } yield LessThan(a, Literal(d, DateType))
      case LessThanOrEqual(l: Literal, x) =>
        for { a <- tsDim(x); d <- dayBoundary(l) } yield GreaterThanOrEqual(a, Literal(d, DateType))
      case GreaterThan(l: Literal, x) =>
        for { a <- tsDim(x); d <- dayBoundary(l) } yield LessThan(a, Literal(d, DateType))
      case _ => None
    }

    // filter conjuncts: rewrite each onto the summary (structural match
    // first, day-boundary lift second) and apply BELOW the new
    // aggregate; a conjunct touching anything finer than the dims
    // cannot be answered by pre-grouped partials
    def conjunctsOf(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
      case x         => Seq(x)
    }
    val newConds: Seq[Option[Expression]] = conds.flatMap(conjunctsOf).map { c =>
      val generic = subDims(c)
      if (clean(generic)) Some(generic) else liftDay(c)
    }
    if (!newConds.forall(_.isDefined)) return None
    // star path: a conjunct may legitimately reference dim-table
    // attributes (a filter above the join) — those must stay ABOVE the
    // rebuilt join; summary-only conjuncts go below it (scan path:
    // everything is summary-only by construction)
    val summaryAttrs = AttributeSet(summary.output)
    val (belowConds, aboveJoinConds) =
      newConds.flatten.partition(_.references.subsetOf(summaryAttrs))
    if (joinWrap.isEmpty && aboveJoinConds.nonEmpty) return None
    val filteredSummary = belowConds.foldLeft(summary: LogicalPlan) { (p, c) =>
      Filter(c, p)
    }

    // grouping: any deterministic expression over dims — a coarser
    // grouping of partials merges exactly like Spark's own partial/
    // final aggregate split
    if (!agg.groupingExpressions.forall(_.deterministic)) return None
    val newGrouping = agg.groupingExpressions.map(e => subDims(resolve(e)))
    if (!newGrouping.forall(clean)) return None

    def measureFor(e: Expression): Option[MvRegistry.MvMeasure] =
      templateOf(e, names).flatMap(t => mv.measures.find(_.template.semanticEquals(t)))
    def agge(fn: AggregateFunction): Expression = fn.toAggregateExpression()

    var ok = true
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val replaced = resolve(ne).transformUp {
        case ae @ AggregateExpression(fn, _, isDistinct, filter, _) =>
          if (filter.nonEmpty) { ok = false; Literal(null) }
          else if (isDistinct) {
            // DISTINCT over group-constant arguments (round 8): the
            // summary carries EXACTLY the distinct dim combinations
            // (groupBy never emits an empty group), so the distinct
            // aggregate runs unchanged over the substituted args —
            // `count(distinct cast(ts as date))` is answered by a
            // distinct over the summary's dt column. Any argument
            // touching a real measure stays a bail.
            val newArgs = fn.children.map(subDims)
            if (newArgs.forall(a => clean(a) && a.deterministic)) {
              val fn2 = fn.withNewChildren(newArgs).asInstanceOf[AggregateFunction]
              if (fn2.dataType == ae.dataType) ae.copy(aggregateFunction = fn2)
              else { ok = false; Literal(null) }
            } else { ok = false; Literal(null) }
          } else {
            // count → Coalesce(sum(n), 0): a GLOBAL aggregate over a
            // dim-filtered summary that matches zero rows must still
            // return 0, but Sum over no rows is NULL (grouped shapes
            // are safe either way — empty groups vanish on both
            // sides). count(NULL-literal) is excluded: it must stay 0
            // on the raw side, not become the row count.
            val substituted: Option[Expression] = fn match {
              case Count(Seq(Literal(v, _))) if v != null =>
                Some(Coalesce(Seq(agge(Sum(sAttr(mv.cnt))), Literal(0L, LongType))))
              case Count(Seq(m)) if measureFor(m).exists(_.nonNull) =>
                Some(Coalesce(Seq(agge(Sum(sAttr(mv.cnt))), Literal(0L, LongType))))
              case Sum(m, _) if measureFor(m).isDefined =>
                Some(agge(Sum(sAttr(measureFor(m).get.sm))))
              case Min(m) if measureFor(m).isDefined =>
                Some(agge(Min(sAttr(measureFor(m).get.mn))))
              case Max(m) if measureFor(m).isDefined =>
                Some(agge(Max(sAttr(measureFor(m).get.mx))))
              case Average(m, _) if measureFor(m).exists(_.nonNull) =>
                // cast BOTH sides: Divide requires same-type inputs,
                // and Sum(long-typed partials) would otherwise build
                // an ill-typed long/double division post-analysis
                Some(Divide(
                  Cast(agge(Sum(sAttr(measureFor(m).get.sm))), DoubleType),
                  Cast(agge(Sum(sAttr(mv.cnt))), DoubleType)))
              // GROUP-CONSTANT fallback (round 8): an argument whose
              // substituted form is deterministic and entirely off the
              // fact side — a dim-table column through the star join,
              // or any function of registered dims — is CONSTANT across
              // every raw row behind one partial row, so it aggregates
              // over the summary by weighting with the row count:
              // sum(g) → sum(g×n), count(g) → sum(n where g non-null),
              // min/max(g) unchanged. This is how a star dashboard
              // sums a dim-carried weight without any dim partials
              // existing. (The measure cases above must stay first:
              // a fact measure's raw column never substitutes clean.)
              case Sum(m, _) =>
                val m2 = subDims(m)
                if (!clean(m2) || !m2.deterministic) None
                else
                  m2.dataType match {
                    case ByteType | ShortType | IntegerType | LongType =>
                      Some(agge(Sum(Multiply(Cast(m2, LongType), Cast(sAttr(mv.cnt), LongType)))))
                    case FloatType | DoubleType =>
                      Some(agge(Sum(Multiply(Cast(m2, DoubleType), Cast(sAttr(mv.cnt), DoubleType)))))
                    case _ => None // decimal: precision algebra differs — bail
                  }
              case Min(m) =>
                val m2 = subDims(m)
                if (clean(m2) && m2.deterministic) Some(agge(Min(m2))) else None
              case Max(m) =>
                val m2 = subDims(m)
                if (clean(m2) && m2.deterministic) Some(agge(Max(m2))) else None
              case Count(Seq(m)) =>
                val m2 = subDims(m)
                if (clean(m2) && m2.deterministic)
                  Some(Coalesce(Seq(
                    agge(Sum(If(IsNotNull(m2), Cast(sAttr(mv.cnt), LongType), Literal(0L, LongType)))),
                    Literal(0L, LongType))))
                else None
              case _ => None
            }
            // the substitution runs POST-analysis: parent operators
            // were resolved against the original dataType, so any
            // width change (decimal-sum precision growth, int vs
            // long partials) disqualifies the rewrite rather than
            // silently retyping the column
            substituted match {
              case Some(e) if e.dataType == ae.dataType => e
              case _                                    => ok = false; Literal(null)
            }
          }
      }
      val substituted = subDims(replaced)
      // any surviving reference to the source side means an
      // expression shape we don't cover — bail
      if (!clean(substituted)) ok = false
      substituted match {
        case a: Attribute => Alias(a, ne.name)(exprId = ne.exprId)
        case al: Alias    => Alias(al.child, ne.name)(exprId = ne.exprId)
        case other        => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    if (!ok) return None
    val newChild: LogicalPlan = joinWrap match {
      case None => filteredSummary
      case Some((j, factLeft)) =>
        // the join condition itself must land entirely on registered
        // dims (+ dim-table attrs): a key the summary didn't group by
        // cannot re-join the partials
        val newCond = j.condition.map(subDims)
        if (!newCond.forall(clean)) return None
        val rebuilt =
          if (factLeft) j.copy(left = filteredSummary, condition = newCond)
          else j.copy(right = filteredSummary, condition = newCond)
        aboveJoinConds.foldLeft(rebuilt: LogicalPlan)((p, c) => Filter(c, p))
    }
    Some(
      agg.copy(
        groupingExpressions = newGrouping,
        aggregateExpressions = newAggExprs,
        child = newChild
      )
    )
  }
}

/** Registry binding source parquet paths to their rollup summaries.
  * Registration is explicit (the maintenance job that builds the
  * summary owns the binding); lookups key on the source relation's
  * root paths so the rule never guesses.
  */
object MvRegistry {

  /** One summarized measure: the source expression's base template plus
    * the summary columns carrying its sum/min/max partials. `nonNull`
    * is the registrar's attestation that the measure has no nulls
    * (required for `count(m)`/`avg(m)`, since `cnt` counts rows).
    */
  final case class MvMeasure(
      template: Expression,
      sm: String,
      mn: String,
      mx: String,
      nonNull: Boolean
  )

  /** A measure registration request: `expr` is a SQL expression over
    * the source view's columns; `sm`/`mn`/`mx` name the summary's
    * sum/min/max partial columns for it.
    */
  final case class MeasureSpec(
      expr: String,
      sm: String,
      mn: String,
      mx: String,
      nonNull: Boolean = true
  )

  final case class MvDef(
      summaryPlan: () => LogicalPlan,
      dimTemplates: Seq[(Expression, String)],
      cnt: String,
      measures: Seq[MvMeasure]
  )

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Vector[MvDef]]()

  def isEmpty: Boolean = registry.isEmpty

  /** Bind aggregates over `source` — a view of deterministic
    * projections over ONE parquet relation (e.g. `Tables.events`) — to
    * `summary`. `dims` maps a SQL expression over the source view's
    * columns (bare name or derived, e.g. `cast(ts as date)`) to the
    * summary column storing it; `cnt`/`sm`/`mn`/`mx` name the summary's
    * count/sum/min/max partials over the `measure` expression.
    * `measureNonNull` attests the measure has no nulls — required for
    * `count(m)`/`avg(m)` rewrites (the summary counts rows).
    */
  def register(
      spark: SparkSession,
      source: DataFrame,
      summary: DataFrame,
      dims: Map[String, String],
      measure: String,
      cnt: String = "n",
      sm: String = "sv",
      mn: String = "mnv",
      mx: String = "mxv",
      measureNonNull: Boolean = true
  ): Unit =
    registerMeasures(spark, source, summary, dims, cnt, Seq(MeasureSpec(measure, sm, mn, mx, measureNonNull)))

  /** The multi-measure form: one summary row carries the shared row
    * count plus sum/min/max partials for EVERY registered measure —
    * the usual warehouse rollup shape (a lineitem summary answering
    * both quantity and revenue dashboards from the same partials).
    */
  def registerMeasures(
      spark: SparkSession,
      source: DataFrame,
      summary: DataFrame,
      dims: Map[String, String],
      cnt: String,
      measures: Seq[MeasureSpec]
  ): Unit = {
    val (lr, names, conds) = MvRewrite
      .baseOf(source.queryExecution.analyzed)
      .getOrElse(
        throw new IllegalArgumentException(
          "MV source must be deterministic projections over a single parquet relation"))
    require(conds.isEmpty, "MV source view must be unfiltered — partials over a filtered view would answer unfiltered queries")
    val path = MvRewrite.sourcePaths(lr) match {
      case Seq(only) => only
      case other =>
        throw new IllegalArgumentException(s"MV source must have exactly one root path, got $other")
    }
    // resolve each registered expression against the source view, then
    // normalize to a base-relation template for structural matching
    def tmpl(sql: String): Expression = {
      val analyzed = source
        .select(org.apache.spark.sql.functions.expr(sql).as("__mv_t"))
        .queryExecution
        .analyzed
      val child = analyzed match {
        case Project(Seq(al: Alias), _) => al.child
        case other =>
          throw new IllegalArgumentException(s"cannot resolve MV expression '$sql': $other")
      }
      MvRewrite
        .templateOf(child, names)
        .getOrElse(
          throw new IllegalArgumentException(
            s"MV expression '$sql' must be deterministic over source columns"))
    }
    // re-resolve the summary per use: fresh attribute ids per rewrite,
    // so two rewrites in one query can't collide
    val builder = () =>
      summary.queryExecution.analyzed match {
        case lr: LogicalRelation => lr.newInstance()
        case other               => other
      }
    val mvDef = MvDef(
      builder,
      dims.toSeq.map { case (k, v) => (tmpl(k), v) },
      cnt,
      measures.map(m => MvMeasure(tmpl(m.expr), m.sm, m.mn, m.mx, m.nonNull))
    )
    // several summaries may serve one source (a type-only rollup AND
    // day×type partials); keep them coarsest-first so selection scans
    // the smallest admissible table. Re-registering the SAME dim set
    // truly supersedes (prior def dropped) — otherwise superseded defs
    // accumulate in long-lived sessions and a stale one (e.g. pointing
    // at a deleted temp summary dir) could still be selected whenever
    // the newer def bails.
    def sameDims(a: MvDef): Boolean =
      a.dimTemplates.size == mvDef.dimTemplates.size &&
        mvDef.dimTemplates.forall { case (t, _) => a.dimTemplates.exists(_._1.semanticEquals(t)) }
    registry.compute(
      normalize(path),
      (_, old) =>
        (mvDef +: Option(old).getOrElse(Vector.empty).filterNot(sameDims))
          .sortBy(_.dimTemplates.size)
    )
  }

  def unregister(sourcePath: String): Unit = registry.remove(normalize(sourcePath))
  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** The MVs bound to this exact single-root relation, coarsest first. */
  def lookup(rootPaths: Seq[String]): Seq[MvDef] = rootPaths match {
    case Seq(only) => Option(registry.get(normalize(only))).getOrElse(Vector.empty)
    case _         => Seq.empty
  }
}
