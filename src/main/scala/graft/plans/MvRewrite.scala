package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** MATERIALIZED-VIEW REWRITE (§2.8, the `Rule[LogicalPlan]` extension
  * level): a registered rollup of mergeable partials (c6's per-(day,
  * type) table) transparently answers aggregate queries written against
  * the RAW fact table. At 100 TB this is the difference between a
  * dashboard group-by costing a full-history scan and costing a scan of
  * a days×types summary — without the query author knowing the summary
  * exists.
  *
  * A registration ([[MvRegistry.register]]) binds a source parquet path
  * to a summary table with
  *   - `dims`: source grouping columns stored verbatim in the summary,
  *   - one measure column, summarized as `n = count(1)`, `sm = sum(m)`,
  *     `mn = min(m)`, `mx = max(m)` per dims row.
  *
  * The rule rewrites `Aggregate(G, A, scan(source))` when
  *   - the scan reaches the source relation through pass-through
  *     Projects and deterministic Filters whose predicates reference
  *     ONLY dim columns (all raw rows behind one partial row share its
  *     dim values, so a dim-only predicate commutes with the
  *     pre-grouping and is re-applied to the summary; any finer
  *     predicate disqualifies the rewrite),
  *   - every grouping expression is a bare dim attribute, and
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

  /** Walk pass-through Projects and deterministic Filters down to a
    * parquet relation, building the exprId → source-column-name map for
    * attributes that survive untransformed and collecting filter
    * conjuncts (validated against the MV's dims later — a predicate on
    * anything finer than a dim cannot be answered by pre-grouped
    * partials). Any other node shape disqualifies the subtree.
    */
  private def baseOf(
      plan: LogicalPlan
  ): Option[(LogicalRelation, Map[ExprId, String], Seq[Expression])] =
    plan match {
      case lr: LogicalRelation =>
        Some((lr, lr.output.map(a => a.exprId -> a.name).toMap, Seq.empty))
      case Project(items, child) =>
        baseOf(child).map { case (lr, inner, conds) =>
          val passThrough = items.collect {
            case a: AttributeReference if inner.contains(a.exprId) => a.exprId -> inner(a.exprId)
            case al @ Alias(ar: AttributeReference, _) if inner.contains(ar.exprId) =>
              al.exprId -> inner(ar.exprId)
          }.toMap
          // cumulative: lower-level ids stay resolvable so that filter
          // conjuncts captured BELOW this Project still validate
          (lr, inner ++ passThrough, conds)
        }
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) if cond.deterministic =>
        baseOf(child).map { case (lr, inner, conds) => (lr, inner, conds :+ cond) }
      case _ => None
    }

  private def sourcePaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _                    => Seq.empty
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (lr, names, conds) <- baseOf(agg.child)
      mv <- MvRegistry.lookup(sourcePaths(lr))
      rewritten <- rewriteAggregate(agg, names, conds, mv)
    } yield rewritten
  }

  private def rewriteAggregate(
      agg: Aggregate,
      names: Map[ExprId, String],
      conds: Seq[Expression],
      mv: MvRegistry.MvDef
  ): Option[LogicalPlan] = {
    val summary = mv.summaryPlan()
    val sAttr: Map[String, Attribute] = summary.output.map(a => a.name -> a).toMap
    // summary must actually carry the columns the registration promises
    if (!(mv.dims.values ++ Seq(mv.cnt, mv.sm, mv.mn, mv.mx)).forall(sAttr.contains))
      return None

    // filter conjuncts: every referenced column must be a dim (all raw
    // rows behind one partial row share its dim values, so a dim-only
    // predicate commutes with the pre-grouping); rewrite them onto the
    // summary attributes and apply BELOW the new aggregate
    val rewrittenConds: Option[Seq[Expression]] =
      conds.foldLeft(Option(Seq.empty[Expression])) { (acc, cond) =>
        acc.flatMap { seq =>
          var condOk = true
          val sub = cond.transformUp {
            case a: AttributeReference =>
              names.get(a.exprId).flatMap(mv.dims.get) match {
                case Some(sumName) => sAttr(sumName)
                case None          => condOk = false; a
              }
          }
          if (condOk) Some(seq :+ sub) else None
        }
      }
    if (rewrittenConds.isEmpty) return None
    val filteredSummary = rewrittenConds.get.foldLeft(summary: LogicalPlan) { (p, c) =>
      org.apache.spark.sql.catalyst.plans.logical.Filter(c, p)
    }

    // grouping: bare dim attributes only
    val groupMap: Option[Seq[(Attribute, Attribute)]] =
      agg.groupingExpressions.foldLeft(Option(Seq.empty[(Attribute, Attribute)])) {
        case (acc, a: AttributeReference) =>
          for {
            seq <- acc
            srcName <- names.get(a.exprId)
            sumName <- mv.dims.get(srcName)
          } yield seq :+ (a: Attribute, sAttr(sumName))
        case _ => None
      }
    groupMap match {
      case None => None
      case Some(pairs) =>
        val dimSub: Map[ExprId, Attribute] = pairs.map { case (src, dst) => src.exprId -> dst }.toMap

        def isMeasure(e: Expression): Boolean = e match {
          case a: AttributeReference => names.get(a.exprId).contains(mv.measure)
          case _                     => false
        }
        def agge(fn: AggregateFunction): Expression = fn.toAggregateExpression()

        var ok = true
        val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
          val replaced = ne.transformUp {
            case ae @ AggregateExpression(fn, _, isDistinct, filter, _) =>
              if (isDistinct || filter.nonEmpty) { ok = false; Literal(null) }
              else {
                // count → Coalesce(sum(n), 0): a GLOBAL aggregate over a
                // dim-filtered summary that matches zero rows must still
                // return 0, but Sum over no rows is NULL (grouped shapes
                // are safe either way — empty groups vanish on both
                // sides). count(NULL-literal) is excluded: it must stay 0
                // on the raw side, not become the row count.
                val substituted: Option[Expression] = fn match {
                  case Count(Seq(Literal(v, _))) if v != null =>
                    Some(Coalesce(Seq(agge(Sum(sAttr(mv.cnt))), Literal(0L, LongType))))
                  case Count(Seq(m)) if isMeasure(m) && mv.measureNonNull =>
                    Some(Coalesce(Seq(agge(Sum(sAttr(mv.cnt))), Literal(0L, LongType))))
                  case Sum(m, _) if isMeasure(m) => Some(agge(Sum(sAttr(mv.sm))))
                  case Min(m) if isMeasure(m)    => Some(agge(Min(sAttr(mv.mn))))
                  case Max(m) if isMeasure(m)    => Some(agge(Max(sAttr(mv.mx))))
                  case Average(m, _) if isMeasure(m) && mv.measureNonNull =>
                    // cast BOTH sides: Divide requires same-type inputs,
                    // and Sum(long-typed partials) would otherwise build
                    // an ill-typed long/double division post-analysis
                    Some(Divide(
                      Cast(agge(Sum(sAttr(mv.sm))), DoubleType),
                      Cast(agge(Sum(sAttr(mv.cnt))), DoubleType)))
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
          val substituted = replaced.transformUp {
            case a: AttributeReference if dimSub.contains(a.exprId) => dimSub(a.exprId)
          }
          // any surviving reference to the source side means an
          // expression shape we don't cover — bail
          substituted.foreach {
            case a: AttributeReference if names.contains(a.exprId) => ok = false
            case _                                                 =>
          }
          substituted match {
            case a: Attribute   => Alias(a, ne.name)(exprId = ne.exprId)
            case al: Alias      => Alias(al.child, ne.name)(exprId = ne.exprId)
            case other          => Alias(other, ne.name)(exprId = ne.exprId)
          }
        }
        if (!ok) None
        else
          Some(
            agg.copy(
              groupingExpressions = pairs.map(_._2),
              aggregateExpressions = newAggExprs,
              child = filteredSummary
            )
          )
    }
  }
}

/** Registry binding source parquet paths to their rollup summaries.
  * Registration is explicit (the maintenance job that builds the
  * summary owns the binding); lookups key on the source relation's
  * root paths so the rule never guesses.
  */
object MvRegistry {

  final case class MvDef(
      summaryPlan: () => LogicalPlan,
      dims: Map[String, String],
      measure: String,
      cnt: String,
      sm: String,
      mn: String,
      mx: String,
      measureNonNull: Boolean
  )

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def isEmpty: Boolean = registry.isEmpty

  /** Bind `sourcePath`'s aggregates to `summary`. `dims` maps source
    * grouping columns to their summary columns; `cnt`/`sm`/`mn`/`mx`
    * name the summary's count/sum/min/max partials over `measure`.
    * `measureNonNull` attests the measure has no nulls — required for
    * `count(m)`/`avg(m)` rewrites (the summary counts rows).
    */
  def register(
      spark: SparkSession,
      sourcePath: String,
      summary: DataFrame,
      dims: Map[String, String],
      measure: String,
      cnt: String = "n",
      sm: String = "sv",
      mn: String = "mnv",
      mx: String = "mxv",
      measureNonNull: Boolean = true
  ): Unit = {
    // re-resolve the summary per use: fresh attribute ids per rewrite,
    // so two rewrites in one query can't collide
    val builder = () => summary.queryExecution.analyzed match {
      case lr: LogicalRelation => lr.newInstance()
      case other               => other
    }
    registry.put(normalize(sourcePath), MvDef(builder, dims, measure, cnt, sm, mn, mx, measureNonNull))
  }

  def unregister(sourcePath: String): Unit = registry.remove(normalize(sourcePath))
  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** The MV bound to this exact single-root relation, if any. */
  def lookup(rootPaths: Seq[String]): Option[MvDef] = rootPaths match {
    case Seq(only) => Option(registry.get(normalize(only)))
    case _         => None
  }
}
