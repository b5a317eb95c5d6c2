package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration for the graft engine.
  *
  * All entry points (Verify, Bench, tests) route through [[configure]] so
  * the engine-critical confs are applied uniformly:
  *
  *  - AQE on: runtime coalescing + skew-join splitting is the 100 TB
  *    answer to skewed shuffle keys.
  *  - `nanosAsLong`: the `events` table carries parquet TIMESTAMP(NANOS)
  *    which Spark's vectorized reader rejects; we read the raw int64 and
  *    convert to a microsecond timestamp in [[graft.sources.Tables]].
  *  - UTC session timezone: oracle (DuckDB) parity for date arithmetic.
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.compression.codec", "snappy")
    // dims (region/nation/supplier/part at any SF; customer at small SF)
    // stay broadcastable; explicit broadcast() hints are used regardless.
    .config("spark.sql.autoBroadcastJoinThreshold", "64MB")

  /** Local session for tests / ad-hoc mains, with the graft SQL functions
    * and planner strategy installed.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors().min(32)): SparkSession = {
    val s = configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(s)
    graft.plans.TopK.install(s)
    s
  }
}
