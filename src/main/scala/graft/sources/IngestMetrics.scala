package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Ops-facing observability over a running/finished ingest: throughput
  * from the engine's progress events, data quality from the landed
  * table. The khose-style health signals — rows/sec, batch latency,
  * corrupt-record rate — without any custom instrumentation in the
  * pipeline itself.
  */
object IngestMetrics {

  final case class IngestSummary(
      nDataBatches: Int,
      inputRows: Long,
      avgRowsPerSec: Double,
      maxTriggerMs: Long
  )

  def summarize(progress: Seq[StreamingQueryProgress]): IngestSummary = {
    val withData = progress.filter(_.numInputRows > 0)
    val rates = withData.map(_.processedRowsPerSecond).filterNot(r => r.isNaN || r.isInfinite)
    IngestSummary(
      nDataBatches = withData.length,
      inputRows = withData.map(_.numInputRows).sum,
      avgRowsPerSec = if (rates.nonEmpty) rates.sum / rates.length else 0.0,
      maxTriggerMs = progress
        .map(p => Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
        .foldLeft(0L)(math.max)
    )
  }

  /** Per-micro-batch event-time lag signals (the "is ingest keeping up
    * and what is it discarding" pair every watermarked pipeline needs on
    * a dashboard): how far the watermark trails wall-clock at trigger
    * time, how far it trails the newest event seen this batch, and how
    * many rows the stateful operators dropped as too-late.
    */
  final case class BatchLag(
      batchId: Long,
      /** trigger wall-clock minus current watermark — total end-to-end
        * lag, inflated at startup when the watermark is still at epoch */
      watermarkDelayMs: Long,
      /** max event time this batch minus watermark — the in-flight
        * event-time spread the watermark has yet to absorb (-1 when the
        * batch carried no data) */
      eventTimeLagMs: Long,
      /** rows discarded by watermark eviction across this batch's
        * stateful operators — the LOSS the lateness policy actually
        * caused, the number to alarm on */
      lateDropped: Long
  )

  /** Lag metrics for every progress event of a WATERMARKED query (empty
    * for stateless ingest — there is no watermark to lag).
    */
  def lagPerBatch(progress: Seq[StreamingQueryProgress]): Seq[BatchLag] =
    progress
      .filter(p => p.eventTime != null && p.eventTime.containsKey("watermark"))
      .map { p =>
        val wm = java.time.Instant.parse(p.eventTime.get("watermark")).toEpochMilli
        val trig = java.time.Instant.parse(p.timestamp).toEpochMilli
        val maxEv = Option(p.eventTime.get("max"))
          .map(java.time.Instant.parse(_).toEpochMilli - wm)
          .getOrElse(-1L)
        val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        BatchLag(p.batchId, trig - wm, maxEv, dropped)
      }
      .toSeq

  /** Corrupt-record accounting over a landed table that carries the
    * permissive `_corrupt` column: (n_rows, n_corrupt, corrupt_rate).
    */
  def corruptStats(s: SparkSession, path: String): DataFrame =
    s.read
      .parquet(path)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt")).as("n_corrupt"),
        round(count(col("_corrupt")).cast("double") / count(lit(1)), 6).as("corrupt_rate")
      )
}
