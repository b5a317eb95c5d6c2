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
