package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact `row_number` WITHOUT a single-task sort — the scale-safe
  * replacement for `row_number().over(Window.orderBy(...))` (global)
  * and for per-group windows whose groups are individually huge.
  *
  * Mechanics: range-partition on (group ++ order) keys so each group's
  * rows land order-contiguously across partitions; per-(partition,
  * group) local `row_number` windows (parallel — every WindowExec keyed
  * on `pid`); then shift each local rank by the count of same-group
  * rows in earlier partitions. The offset table is METADATA-sized (one
  * row per (partition, group) pair), its cumulative sum is a window
  * over that tiny table keyed by group (or, for a global rank, over
  * `numPartitions` rows total), and it re-joins as a broadcast. No
  * driver-side collect anywhere; the input is pinned once
  * (`localCheckpoint`) so the counts job and the rank job see the SAME
  * partition assignment.
  *
  * Correctness note: `order` must be a TOTAL order (callers append a
  * unique tie-breaker column) — the range partitioner puts equal keys
  * in one partition, so a total order makes the stitched rank exactly
  * the rank a global sort would produce.
  */
object ScaleRank {

  /** Append `rankCol` = the 1-based rank of each row within its
    * `group` (empty Seq ⇒ one global group) under `order`.
    */
  def withRank(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      rankCol: String,
      numPartitions: Int = 32
  ): DataFrame = {
    val gCols = group.map(col)
    val parts = df
      .repartitionByRange(numPartitions, (gCols ++ order): _*)
      .withColumn("_sr_pid", spark_partition_id())
      .localCheckpoint()
    val counts = parts
      .groupBy((col("_sr_pid") +: gCols): _*)
      .agg(count(lit(1)).as("_sr_n"))
    val wOff = Window
      .partitionBy(gCols: _*)
      .orderBy(col("_sr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_sr_off", coalesce(sum("_sr_n").over(wOff), lit(0L)))
      .drop("_sr_n")
    val wLocal = Window.partitionBy((col("_sr_pid") +: gCols): _*).orderBy(order: _*)
    parts
      .join(broadcast(offsets), "_sr_pid" +: group)
      .withColumn(rankCol, col("_sr_off") + row_number().over(wLocal))
      .drop("_sr_pid", "_sr_off")
  }

  /** Append `outCol` = the INCLUSIVE running sum of `valueCol` within
    * its `group` under `order` — the prefix-sum twin of [[withRank]]
    * (same range-partition + pid-keyed local windows + metadata-grain
    * offset stitch; the offsets cumulate per-partition VALUE sums
    * instead of row counts). Exact for integer and decimal values
    * (the sums reassociate but never round); the usual total-order
    * tie-breaker requirement applies.
    */
  def withRunningSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      valueCol: String,
      outCol: String,
      numPartitions: Int = 32
  ): DataFrame = {
    val gCols = group.map(col)
    val parts = df
      .repartitionByRange(numPartitions, (gCols ++ order): _*)
      .withColumn("_sr_pid", spark_partition_id())
      .localCheckpoint()
    val counts = parts
      .groupBy((col("_sr_pid") +: gCols): _*)
      .agg(sum(valueCol).as("_sr_s"))
    val wOff = Window
      .partitionBy(gCols: _*)
      .orderBy(col("_sr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_sr_off", sum("_sr_s").over(wOff))
      .drop("_sr_s")
    val wLocal = Window
      .partitionBy((col("_sr_pid") +: gCols): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .join(broadcast(offsets), "_sr_pid" +: group)
      .withColumn(
        outCol,
        coalesce(col("_sr_off"), lit(0)) + sum(valueCol).over(wLocal)
      )
      .drop("_sr_pid", "_sr_off")
  }
}
