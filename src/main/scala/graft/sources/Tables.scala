package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated parquet tables.
  *
  * Plain tables are read as-is (schema lives in the parquet footer; Catalyst
  * handles column pruning + predicate pushdown into the scan). The `events`
  * table needs normalization: its `ts` column is parquet TIMESTAMP(NANOS),
  * which Spark only reads via `spark.sql.legacy.parquet.nanosAsLong=true`
  * (set in [[graft.GraftSession]]) as a raw int64 of epoch-nanoseconds.
  * [[events]] converts it to a microsecond TimestampType with integer
  * division (`ts div 1000` — no double round-trip, which would lose
  * precision above 2^53).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized to a microsecond TimestampType. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    // With nanosAsLong the nanos column arrives as LongType; otherwise
    // (future Spark versions reading nanos natively) keep it untouched.
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
