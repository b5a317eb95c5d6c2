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
  * the rank a global sort would produce. NULL group keys are ranked as
  * an ordinary group (the offset stitch joins null-safely, matching
  * `row_number` window semantics).
  *
  * Cost note: `localCheckpoint` materializes the range-partitioned
  * input to executor block storage (memory-and-disk) for the duration
  * of the two jobs — at cluster scale, budget executor storage for one
  * copy of the ranked projection (project away unneeded columns before
  * calling). `numPartitions` defaults to the cluster's
  * `defaultParallelism` so a 1000-executor run fans the sort out
  * automatically; pass it explicitly to tune range sizes.
  */
object ScaleRank {

  /** numPartitions ≤ 0 ⇒ derive from the session's defaultParallelism
    * (never a hard-coded constant — a petabyte through 32 ranges is a
    * cluster-user footgun).
    */
  private def resolveParts(df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else math.max(df.sparkSession.sparkContext.defaultParallelism, 1)

  /** Null-safe broadcast stitch of the metadata-grain offset table back
    * onto the partitioned rows: `<=>` on group columns so NULL group
    * keys keep their offsets (a USING join would silently drop them —
    * SQL null-join semantics), plain `===` on the never-null pid.
    */
  private def stitchOffsets(
      parts: DataFrame,
      offsets: DataFrame,
      group: Seq[String]
  ): DataFrame = {
    val renamed = group.zipWithIndex
      .foldLeft(offsets.withColumnRenamed("_sr_pid", "_sr_opid")) { case (d, (g, i)) =>
        d.withColumnRenamed(g, s"_sr_g$i")
      }
    val cond = group.zipWithIndex.foldLeft(col("_sr_pid") === col("_sr_opid")) {
      case (c, (g, i)) => c && (col(g) <=> col(s"_sr_g$i"))
    }
    val joined = parts.join(broadcast(renamed), cond)
    group.indices.foldLeft(joined.drop("_sr_opid"))((d, i) => d.drop(s"_sr_g$i"))
  }

  /** Append `rankCol` = the 1-based rank of each row within its
    * `group` (empty Seq ⇒ one global group) under `order`.
    */
  def withRank(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      rankCol: String,
      numPartitions: Int = 0
  ): DataFrame = {
    val gCols = group.map(col)
    val parts = df
      .repartitionByRange(resolveParts(df, numPartitions), (gCols ++ order): _*)
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
    stitchOffsets(parts, offsets, group)
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
      numPartitions: Int = 0
  ): DataFrame = {
    val gCols = group.map(col)
    val parts = df
      .repartitionByRange(resolveParts(df, numPartitions), (gCols ++ order): _*)
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
    stitchOffsets(parts, offsets, group)
      .withColumn(
        outCol,
        coalesce(col("_sr_off"), lit(0)) + sum(valueCol).over(wLocal)
      )
      .drop("_sr_pid", "_sr_off")
  }
}
