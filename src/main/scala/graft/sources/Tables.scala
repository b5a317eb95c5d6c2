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

  /** Register the FULL table set in the session catalog so any oracle
    * SQL text runs by table NAME through `spark.sql` — the surface a SQL
    * user (or a BI tool) drives the engine with. `events` registers
    * through its normalizing loader so `ts` is a real TimestampType by
    * name too. Views are lazy logical plans over the parquet scans:
    * column pruning and predicate pushdown behave exactly as when the
    * typed loaders are composed directly, so this adds surface, not a
    * copy. (On a cluster with a persistent metastore the same loaders
    * back `CREATE TABLE ... USING parquet LOCATION` DDL; temp views are
    * the in-session equivalent.)
    */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings")
      .foreach(t => table(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
  }

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
