package graft.api

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed event row for the `Dataset[T]` surface (timestamps surfaced as
  * microseconds so the case class stays primitive-only).
  */
final case class TypedEvent(
    event_id: Long,
    ts_us: Long,
    user_id: Long,
    event_type: String,
    value: Double
)

/** Welford/Chan running-variance buffer: count, mean, and sum of squared
  * deviations. Numerically stable one-pass form; `merge` is the parallel
  * (Chan) combination, so partial buffers combine associatively across
  * partitions exactly like any other mergeable summary in this engine.
  */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

final case class MeanVar(n: Long, mean: Double, variance: Double)

/** The typed `Aggregator` API — the Dataset-native extension level
  * (complements the Catalyst `TypedImperativeAggregate`s in
  * graft.plans): compiles to the same partial/final aggregation physical
  * plan as any SQL aggregate, but is written against plain Scala values
  * with full type checking.
  */
object WelfordAgg extends Aggregator[Double, WelfordBuf, MeanVar] {
  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    WelfordBuf(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      WelfordBuf(
        n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n
      )
    }
  }

  override def finish(r: WelfordBuf): MeanVar =
    MeanVar(r.n, r.mean, if (r.n > 1) r.m2 / (r.n - 1) else 0.0)

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
}

/** Typed-API operators: the same engine through `Dataset[T]` +
  * `KeyValueGroupedDataset` instead of untyped Columns. Catalyst still
  * plans them (groupByKey is a hash exchange with partial aggregation,
  * identical shape to groupBy().agg()), so the 100 TB behavior is
  * unchanged — the difference is only compile-time types at the API edge.
  */
object TypedOps {

  def typedEvents(s: SparkSession, d: String) = {
    import s.implicits._
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("user_id"),
        col("event_type"),
        col("value")
      )
      .as[TypedEvent]
  }

  /** q44: per-type value mean/variance through the typed Aggregator.
    * Output is rounded for cross-engine parity with DuckDB's avg /
    * var_samp — Welford-merge and two-pass variance agree far below the
    * rounding threshold on well-conditioned data.
    */
  def q44TypedStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    typedEvents(s, d)
      .groupByKey(_.event_type)
      .mapValues(_.value)
      .agg(WelfordAgg.toColumn.name("mv"))
      .toDF("event_type", "mv")
      .select(
        col("event_type"),
        col("mv.n").as("n"),
        round(col("mv.mean"), 4).as("avg_value"),
        round(col("mv.variance"), 4).as("var_value")
      )
      .orderBy("event_type")
  }
}
