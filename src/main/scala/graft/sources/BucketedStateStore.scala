package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-BUCKETED incremental state store: the bounded-write upsert the
  * corpus-sized streaming folds need (khose's ingest-maintained dedup
  * index / live dashboards — see docs/khose notes on `state`).
  *
  * The copy-on-write folds (s22/s23/s37/s38 before round 14) rewrote the
  * ENTIRE state every micro-batch — O(batches × state) write
  * amplification, invisible at sf0.1 but the maintenance-loop
  * scale-killer on a 100 TB crawl whose keeper table is corpus-sized.
  * This store keeps the same exactly-once, arrival-order-insensitive
  * semantics while bounding each batch's writes to the buckets its keys
  * actually touch:
  *
  * {{{
  *   <root>/buckets_v<b>/_b=<k>/part-*.parquet   ONLY buckets batch b rewrote
  *   <root>/manifest_<b>                          bucket -> data dir (relative),
  *                                                published by atomic rename
  * }}}
  *
  * Every manifest maps ALL `numBuckets` buckets; untouched buckets keep
  * pointing at the version directory that last rewrote them, so a batch
  * writes O(touched buckets × bucket size) bytes — with buckets sized to
  * the parquet sweet spot (128–512 MB at scale, so numBuckets grows with
  * state), that is O(batch), never O(state). This is the
  * manifest-pointer layout every table format (Iceberg/Delta) uses for
  * partial rewrites, reduced to the single-writer streaming-fold case.
  *
  * Crash/retry discipline (single writer, monotone batchIds — the
  * foreachBatch contract): the base state for batch b is the newest
  * manifest with id < b, NEVER b's own half-written attempt, so a retry
  * that died between data write and manifest rename recomputes from the
  * committed base and overwrites its own debris (deterministic batch ⇒
  * identical bytes). The manifest rename is atomic; callers layering
  * multiple stores under one fold (s38's keep+tot) still use their own
  * commit marker as the outer commit point and read AT that marker's id.
  */
object BucketedStateStore {

  /** Deterministic bucket of a key tuple — Murmur3 `hash`, stable across
    * batches, sessions, and partition layouts.
    */
  def bucketOf(keys: Seq[Column], numBuckets: Int): Column =
    pmod(hash(keys: _*), lit(numBuckets)).cast("int")

  private def manifestPath(root: String, batchId: Long) =
    Paths.get(root, f"manifest_$batchId%020d")

  /** True iff `batchId`'s manifest is published — the commit check a
    * single-store fold uses to acknowledge foreachBatch redeliveries
    * (multi-store folds keep their own outer marker).
    */
  def committed(root: String, batchId: Long): Boolean =
    Files.exists(manifestPath(root, batchId))

  /** Newest committed manifest id strictly BELOW `batchId` (the base a
    * retry must fold onto), or the newest overall when `batchId` is
    * `Long.MaxValue` (read paths).
    */
  private[graft] def latestManifestBefore(root: String, batchId: Long): Option[Long] = {
    val names = Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
    val ids = names.collect {
      case n if n.startsWith("manifest_") => n.stripPrefix("manifest_").toLong
    }
    ids.filter(_ < batchId) match {
      case e if e.isEmpty => None
      case xs             => Some(xs.max)
    }
  }

  private def readManifest(root: String, batchId: Long): Map[Int, String] = {
    val lines = Files.readAllLines(manifestPath(root, batchId))
    val b = Map.newBuilder[Int, String]
    lines.forEach { l =>
      if (l.nonEmpty) {
        val i = l.indexOf('\t')
        b += (l.substring(0, i).toInt -> l.substring(i + 1))
      }
    }
    b.result()
  }

  private def writeManifest(root: String, batchId: Long, m: Map[Int, String]): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_manifest_tmp_$batchId")
    val body = m.toSeq.sorted.map { case (k, p) => s"$k\t$p" }.mkString("\n")
    Files.writeString(tmp, body)
    Files.move(
      tmp,
      manifestPath(root, batchId),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING
    )
  }

  /** Fold `incoming` into the store for `batchId`, rewriting ONLY the
    * buckets containing incoming keys. `merge(prevTouched, incoming)`
    * receives the previous rows OF THE TOUCHED BUCKETS ONLY (empty-schema
    * DataFrame of `incoming`'s schema when the store is new) and returns
    * the full replacement rows for those buckets — an associative keyed
    * fold (min/sum/latest-by-seq) whose output keys stay in the touched
    * set by construction. Publishes `manifest_<batchId>` even when the
    * batch touches nothing, so readers can resolve every committed id.
    */
  def upsert(
      root: String,
      batchId: Long,
      incoming: DataFrame,
      keys: Seq[String],
      numBuckets: Int,
      stateSchema: Option[org.apache.spark.sql.types.StructType] = None
  )(merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = incoming.sparkSession
    val prev = latestManifestBefore(root, batchId).map(readManifest(root, _)).getOrElse(Map.empty)
    val bcol = bucketOf(keys.map(col), numBuckets)
    val inc = incoming.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = inc.select(bcol.as("_b")).distinct().collect().map(_.getInt(0)).toSet
      val untouched = prev.view.filterKeys(k => !touched.contains(k)).toMap
      val newEntries: Map[Int, String] =
        if (touched.isEmpty) Map.empty
        else {
          val prevPaths = touched.toSeq.sorted.flatMap(prev.get).distinct.map(p => s"$root/$p")
          val prevTouched =
            if (prevPaths.isEmpty)
              // no state yet: an empty frame at the STATE schema (defaults
              // to incoming's — pass stateSchema when the fold transforms
              // the batch shape into a different stored shape, e.g. s36)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                stateSchema.getOrElse(inc.schema)
              )
            else {
              // a version dir can hold other buckets too (it wrote several
              // at once) — re-derive the bucket and keep only touched rows
              spark.read.parquet(prevPaths: _*).filter(bcol.isin(touched.toSeq: _*))
            }
          val out = s"buckets_v$batchId"
          // one file per bucket per rewrite (not shuffle-partitions-many):
          // the bucket IS the file-size unit — 128-512 MB at scale
          merge(prevTouched, inc)
            .withColumn("_b", bcol)
            .repartition(col("_b"))
            .write
            .partitionBy("_b")
            .mode("overwrite")
            .parquet(s"$root/$out")
          touched.map(k => k -> s"$out/_b=$k").toMap
        }
      writeManifest(root, batchId, untouched ++ newEntries)
    } finally {
      inc.unpersist()
      ()
    }
  }

  /** State as of the manifest committed AT OR BEFORE `batchId` (callers
    * with an outer commit marker pass the marker's id; `Long.MaxValue`
    * reads the newest). None while the store has no manifest or no data.
    */
  def readAt(s: SparkSession, root: String, batchId: Long): Option[DataFrame] =
    latestManifestBefore(root, math.addExact(batchId, 1)).flatMap { id =>
      val paths = readManifest(root, id).values.toSeq.distinct.sorted.map(p => s"$root/$p")
      if (paths.isEmpty) None else Some(s.read.parquet(paths: _*))
    }

  def readLatest(s: SparkSession, root: String): Option[DataFrame] =
    readAt(s, root, Long.MaxValue - 1)

  /** COMPACTION: rewrite the full live state as ONE fresh version (all
    * buckets re-bucketed and rewritten under `buckets_v<batchId>`) and
    * publish its manifest. Bounds the version-chain length a long
    * stream accumulates — the c1-compaction counterpart for this store;
    * run it at the cadence that amortizes (every K batches, the write
    * amplification becomes state/K per batch). Keys are re-hashed, so
    * compaction may also CHANGE `numBuckets` (grow buckets as state
    * grows — the 100 TB knob). Old versions stay readable until
    * [[gcOrphans]].
    */
  def compact(
      spark: SparkSession,
      root: String,
      batchId: Long,
      keys: Seq[String],
      numBuckets: Int
  ): Unit = {
    val live = readAt(spark, root, batchId)
      .getOrElse(throw new IllegalStateException(s"no live state to compact under $root"))
    val out = s"buckets_v$batchId"
    val bcol = bucketOf(keys.map(col), numBuckets)
    live
      .withColumn("_b", bcol)
      .repartition(col("_b"))
      .write
      .partitionBy("_b")
      .mode("overwrite")
      .parquet(s"$root/$out")
    val written = bucketsWrittenBy(root, batchId)
    writeManifest(root, batchId, written.map(k => k -> s"$out/_b=$k").toMap)
  }

  /** GARBAGE-COLLECT versions the NEWEST manifest no longer references:
    * older manifests and unreferenced `buckets_v*` dirs are deleted.
    * Single-writer discipline: call when no reader is pinned to an old
    * snapshot (c7/c33's retention contract). Returns deleted paths.
    */
  def gcOrphans(root: String): Seq[String] = {
    latestManifestBefore(root, Long.MaxValue) match {
      case None => Seq.empty
      case Some(latest) =>
        val referenced = readManifest(root, latest).values
          .map(p => p.split("/")(0)) // buckets_v<id> component
          .toSet
        val dir = new java.io.File(root)
        val victims = Option(dir.list()).getOrElse(Array.empty[String]).filter { n =>
          (n.startsWith("buckets_v") && !referenced.contains(n)) ||
          (n.startsWith("manifest_") && n.stripPrefix("manifest_").toLong != latest)
        }
        victims.foreach(n => SnapshotStore.deleteTree(Paths.get(root, n)))
        victims.toSeq.sorted
    }
  }

  /** Bytes of parquet data written FOR one batch's version (test/audit
    * hook: the written-bytes-O(batch) pin).
    */
  private[graft] def bytesWrittenBy(root: String, batchId: Long): Long = {
    val dir = Paths.get(root, s"buckets_v$batchId")
    if (!Files.exists(dir)) 0L
    else {
      val st = Files.walk(dir)
      try st.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally st.close()
    }
  }

  /** Buckets a batch's version rewrote (test/audit hook). */
  private[graft] def bucketsWrittenBy(root: String, batchId: Long): Set[Int] = {
    val dir = new java.io.File(s"$root/buckets_v$batchId")
    Option(dir.list()).getOrElse(Array.empty[String])
      .collect { case n if n.startsWith("_b=") => n.stripPrefix("_b=").toInt }
      .toSet
  }

  /** Total live-state parquet bytes under the newest manifest. */
  private[graft] def liveStateBytes(root: String): Long =
    latestManifestBefore(root, Long.MaxValue).map(liveStateBytesAt(root, _)).getOrElse(0L)

  /** Live-state bytes as of a SPECIFIC manifest — what a full-state COW
    * fold would have rewritten at that batch (audit hook).
    */
  private[graft] def liveStateBytesAt(root: String, manifestId: Long): Long =
    readManifest(root, manifestId).values.toSeq.distinct.map { p =>
      val dir = Paths.get(root, p)
      if (!Files.exists(dir)) 0L
      else {
        val st = Files.walk(dir)
        try st.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
        finally st.close()
      }
    }.sum

  /** All committed manifest ids, ascending (audit hook). */
  private[graft] def manifestIds(root: String): Seq[Long] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty[String])
      .collect { case n if n.startsWith("manifest_") => n.stripPrefix("manifest_").toLong }
      .sorted
      .toSeq
}
