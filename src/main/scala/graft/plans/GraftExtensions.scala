package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the §2.8 custom expressions on the SQL surface, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works exactly like the
  * Column API (`GraftExpressions.dotF`). Install either via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * post-hoc with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    // window-top-k → TopKPerKey rewrite + the strategy that plans it
    e.injectOptimizerRule(_ => TopKRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
    // unpartitioned rank/ntile/running-agg/offset windows → the
    // distributed GlobalRank family (one unified rule since round 15)
    e.injectOptimizerRule(_ => GlobalWindowRewrite)
    e.injectPlannerStrategy(_ => GlobalRankStrategy)
    // exact rolling quantile in O(log k)/row (e57's large-k scale path)
    e.injectPlannerStrategy(_ => RollingQuantileStrategy)
    // registered-rollup answering of raw-table aggregates
    e.injectOptimizerRule(_ => MvRewrite)
    // stored-stats broadcast pricing of registered-table joins
    e.injectOptimizerRule(_ => StatsPlanner.StatsBroadcastRule)
  }
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def litDouble(e: Expression): Double = {
    require(e.foldable, s"expected a literal, got $e")
    e.eval() match {
      // SQL fractional literals parse as DECIMAL, not DOUBLE
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number                             => n.doubleValue()
      case other => throw new IllegalArgumentException(s"expected a numeric literal, got $other")
    }
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => FloatVecDot(es(0), es(1))),
    "graft_minhash" -> (es => MinHashSig(es(0), 64)),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_shingle_hashes" -> (es => ShingleHashes(es(0), 3)),
    "graft_intersect_size" -> (es => SortedLongIntersectSize(es(0), es(1))),
    // sketch aggregates: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression, so these work anywhere SUM does
    "graft_kll" -> (es => KllSketchAgg(es(0), 200)),
    "graft_kll_merge" -> (es => KllMergeAgg(es(0), 200)),
    "graft_kll_quantile" -> (es => KllQuantileAt(es(0), litDouble(es(1)))),
    "graft_theta" -> (es => ThetaSketchAgg(es(0))),
    "graft_theta_estimate" -> (es => ThetaEstimate(es(0))),
    "graft_theta_intersect" -> (es => ThetaIntersectEstimate(es(0), es(1))),
    // one-pass quantized Gramian over array<float> (v20/s32's moment
    // buffer) — SQL: graft_gramian(embedding, 64)
    "graft_gramian" -> (es => GramianAgg(es(0), litInt(es(1))))
  )

  private def litInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal, got $e")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"expected an int literal, got $other")
    }
  }

  /** Idempotent post-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    }
    if (!spark.experimental.extraOptimizations.contains(MvRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite
    }
    if (!spark.experimental.extraOptimizations.contains(StatsPlanner.StatsBroadcastRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StatsPlanner.StatsBroadcastRule
    }
    TopK.install(spark)
    GlobalRank.install(spark)
    AsofJoin.install(spark)
  }
}
