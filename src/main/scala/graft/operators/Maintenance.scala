package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Table-maintenance jobs for the landed columnar data — the part of a
  * khose-style pipeline that keeps the immutable store healthy: streaming
  * ingest inevitably produces many small files per time partition;
  * compaction rewrites them to target-size files so downstream scans pay
  * one open per ~targetBytes instead of one per trigger.
  */
object Maintenance {

  /** Rewrite `inPath` (partitioned by `partitionCols`) into `outPath`
    * with ~targetBytes output files. Sizing comes from the actual input
    * byte count; the repartition is keyed on the partition columns so
    * each output directory is written by few tasks (no tasks×dirs file
    * explosion). At 100 TB this runs per-partition-predicate (compact
    * only cold partitions), not whole-table.
    */
  def compact(
      s: SparkSession,
      inPath: String,
      outPath: String,
      partitionCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024
  ): Unit = {
    val df = s.read.parquet(inPath)
    val fs = new Path(inPath).getFileSystem(s.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(inPath)).getLength
    val nFiles = math.max(1, (totalBytes / targetBytes).toInt)
    df.repartition(nFiles, partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(outPath)
  }

  def fileCount(s: SparkSession, path: String): Long =
    s.read.parquet(path).inputFiles.length.toLong

  /** c1: stage events as a fragmented day-partitioned table (8 files per
    * day — the post-ingest shape), compact it, and return per-day counts
    * from the COMPACTED data; the oracle computes the same from the
    * source table, so row preservation is what's checked. File-count
    * reduction is asserted in ScalaTest.
    */
  def c1Compact(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c1_").toString
    Tables
      .events(s, d)
      .withColumn("dt", col("ts").cast("date"))
      .repartition(8)
      .write
      .partitionBy("dt")
      .parquet(s"$dir/frag")
    compact(s, s"$dir/frag", s"$dir/compact", Seq("dt"))
    s.read
      .parquet(s"$dir/compact")
      .groupBy(col("dt").cast("date").as("dt"))
      .agg(count(lit(1)).as("n"))
      .orderBy("dt")
  }
}
