package graft.sources

import java.net.URI
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
  *                                                published atomically
  * }}}
  *
  * Every manifest maps ALL live buckets; untouched buckets keep
  * pointing at the version directory that last rewrote them, so a batch
  * writes O(touched buckets × bucket size) bytes — with buckets sized to
  * the parquet sweet spot (128–512 MB at scale, so numBuckets grows with
  * state), that is O(batch), never O(state). This is the
  * manifest-pointer layout every table format (Iceberg/Delta) uses for
  * partial rewrites, reduced to the single-writer streaming-fold case.
  * The manifest also records the store's `numBuckets` (a `#numBuckets=N`
  * header, round 15): a caller passing a different bucket count than the
  * committed layout fails FAST instead of silently hashing keys into the
  * wrong buckets — only [[compact]] may change it (it re-hashes
  * everything).
  *
  * Crash/retry discipline (single writer, monotone batchIds — the
  * foreachBatch contract): the base state for batch b is the newest
  * manifest with id < b, NEVER b's own half-written attempt, so a retry
  * that died between data write and manifest publish recomputes from the
  * committed base and overwrites its own debris (deterministic batch ⇒
  * identical bytes). Callers layering multiple stores under one fold
  * (s38's keep+tot) still use their own commit marker as the outer
  * commit point and read AT that marker's id.
  *
  * COMMIT PROTOCOL BY FILESYSTEM (round 15 — the 100 TB deployment
  * story; before this the store was java.nio-only):
  *
  *  - local paths (no scheme / `file:`): java.nio temp-write +
  *    `ATOMIC_MOVE` rename — the fast path every sandboxed test rides.
  *  - HDFS (and rename-atomic DFSs): Hadoop `FileContext.rename(…,
  *    Options.Rename.OVERWRITE)` of a temp file — the POSIX-rename
  *    analogue; readers see the old or the new manifest, never bytes
  *    in between.
  *  - object stores (`s3a`/`gs`/`abfs`/…): NO rename at all — renames
  *    there are copy+delete and non-atomic. The manifest is written
  *    DIRECTLY with `FileSystem.create`; on these stores the object
  *    becomes visible only at `close()` (one PUT), which IS the atomic
  *    publish. Single-writer discipline makes the overwrite-on-retry
  *    PUT safe (same id ⇒ identical bytes). Multi-writer deployments
  *    need a conditional-put / pointer-swap layer on top — documented
  *    in SCALING.md, deliberately out of scope for the single-writer
  *    fold contract.
  */
object BucketedStateStore {

  /** Deterministic bucket of a key tuple — Murmur3 `hash`, stable across
    * batches, sessions, and partition layouts.
    */
  def bucketOf(keys: Seq[Column], numBuckets: Int): Column =
    pmod(hash(keys: _*), lit(numBuckets)).cast("int")

  /** Auto-compaction cadence for [[upsert]]: every K committed batches
    * the store self-compacts + GCs down to the last TWO manifests
    * (amortized extra write cost state/K per batch; chain length stays
    * ≤ K+1). Default 0 = OPT-IN (round-16 ADVICE fix): compaction's GC
    * deletes older snapshots, which silently breaks (a) readers pinned
    * to an older id under the time-travel contract [[readAt]]
    * documents and (b) restart-replay of a batch older than the GC
    * horizon (its base manifest is gone, so the fold would rebuild
    * from empty). Callers that only ever read the LATEST committed id
    * and replay at most the newest batch (the s40 dedup-compact
    * pattern) opt in per call or fleet-wide via
    * `GRAFT_STATE_COMPACT_EVERY`.
    */
  private[graft] def defaultCompactEvery: Int =
    sys.env.get("GRAFT_STATE_COMPACT_EVERY") match {
      case None => 0
      case Some(raw) =>
        val k = scala.util.Try(raw.trim.toInt).getOrElse(
          throw new IllegalArgumentException(
            s"GRAFT_STATE_COMPACT_EVERY must be a non-negative int (0 disables); got '$raw'"
          )
        )
        require(
          k >= 0,
          s"GRAFT_STATE_COMPACT_EVERY must be >= 0 (0 disables); got $k"
        )
        k
    }

  // ---------------------------------------------------------------------
  // Filesystem abstraction: nio fast path locally, Hadoop FS elsewhere.
  // ---------------------------------------------------------------------

  private[graft] sealed trait StoreIO {
    def list(root: String): Seq[String]
    def exists(root: String, rel: String): Boolean
    def readLines(root: String, rel: String): Seq[String]

    /** Atomically publish `rel` under `root` with `body` (see the
      * commit-protocol table in the object doc).
      */
    def publish(root: String, rel: String, body: String): Unit

    /** CONDITIONAL publish (round 16, the multi-writer leg): atomically
      * publish `rel` ONLY IF IT DOES NOT EXIST. Returns true when this
      * caller created it, false when another writer already had — the
      * create-if-absent / If-None-Match primitive a multi-writer commit
      * linearizes on. Per filesystem:
      *  - local/NFS: temp write + `ATOMIC_MOVE` WITHOUT
      *    REPLACE_EXISTING — the kernel rejects the move when the target
      *    exists (atomic + exclusive in one syscall).
      *  - HDFS: `FileContext.rename` WITHOUT the OVERWRITE option —
      *    same exclusivity from the NameNode's atomic namespace op.
      *  - object stores: `FileSystem.create(path, overwrite = false)`.
      *    On connectors with conditional-write support this maps to a
      *    true `If-None-Match: *` PUT; on older connectors it is
      *    HEAD-then-PUT with a small race window — strictly better than
      *    the unconditional PUT, and the window is documented in
      *    SCALING.md rather than silently ignored.
      */
    def publishExclusive(root: String, rel: String, body: String): Boolean
    def deleteTree(root: String, rel: String): Unit
    def treeBytes(root: String, rel: String): Long
  }

  private object NioIO extends StoreIO {
    def list(root: String): Seq[String] =
      Option(new java.io.File(root).list()).getOrElse(Array.empty[String]).toSeq
    def exists(root: String, rel: String): Boolean = Files.exists(Paths.get(root, rel))
    def readLines(root: String, rel: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(Paths.get(root, rel)).asScala.toSeq
    }
    def publish(root: String, rel: String, body: String): Unit = {
      Files.createDirectories(Paths.get(root))
      val tmp = Paths.get(root, s"_tmp_$rel")
      Files.writeString(tmp, body)
      Files.move(
        tmp,
        Paths.get(root, rel),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING
      )
    }
    def publishExclusive(root: String, rel: String, body: String): Boolean = {
      Files.createDirectories(Paths.get(root))
      // per-attempt temp name: two racers must not clobber each other's
      // staging file before they race on the target. NOT rename: POSIX
      // rename(2) (= ATOMIC_MOVE here) silently REPLACES an existing
      // target; link(2) fails with EEXIST atomically and the full
      // content exists at link time — the classic exclusive-publish
      // primitive.
      val tmp = Paths.get(root, s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}_$rel")
      Files.writeString(tmp, body)
      try {
        Files.createLink(Paths.get(root, rel), tmp)
        Files.deleteIfExists(tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); false
        case _: java.nio.file.FileSystemException if Files.exists(Paths.get(root, rel)) =>
          // some filesystems surface the exists-rejection as a generic
          // FileSystemException — a lost race only when the target is
          // actually there
          Files.deleteIfExists(tmp); false
      }
    }
    def deleteTree(root: String, rel: String): Unit =
      SnapshotStore.deleteTree(Paths.get(root, rel))
    def treeBytes(root: String, rel: String): Long = {
      val dir = Paths.get(root, rel)
      if (!Files.exists(dir)) 0L
      else {
        val st = Files.walk(dir)
        try st.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
        finally st.close()
      }
    }
  }

  /** Hadoop-API IO: `renameAtomic = false` on object stores, where the
    * manifest is published by direct create (PUT-at-close visibility).
    */
  private[graft] final class HadoopIO(
      fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      renameAtomic: Boolean
  ) extends StoreIO {
    import org.apache.hadoop.fs.{Path => HPath}
    private def p(root: String, rel: String) = new HPath(root, rel)
    def list(root: String): Seq[String] = {
      val r = new HPath(root)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).map(_.getPath.getName).toSeq
    }
    def exists(root: String, rel: String): Boolean = fs.exists(p(root, rel))
    def readLines(root: String, rel: String): Seq[String] = {
      val in = fs.open(p(root, rel))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    def publish(root: String, rel: String, body: String): Unit = {
      val target = p(root, rel)
      fs.mkdirs(new HPath(root))
      if (renameAtomic) {
        val tmp = p(root, s"_tmp_$rel")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes("UTF-8"))
        finally out.close()
        org.apache.hadoop.fs.FileContext
          .getFileContext(target.toUri, conf)
          .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } else {
        // object store: the object appears atomically at close() — one PUT
        val out = fs.create(target, true)
        try out.write(body.getBytes("UTF-8"))
        finally out.close()
      }
    }
    def publishExclusive(root: String, rel: String, body: String): Boolean = {
      val target = p(root, rel)
      fs.mkdirs(new HPath(root))
      if (renameAtomic) {
        // HDFS: exclusive atomic namespace op — rename WITHOUT OVERWRITE
        val tmp = p(root, s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}_$rel")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes("UTF-8"))
        finally out.close()
        try {
          org.apache.hadoop.fs.FileContext
            .getFileContext(target.toUri, conf)
            .rename(tmp, target) // no Rename.OVERWRITE: fails if target exists
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            fs.delete(tmp, false); false
          case _: java.io.IOException if fs.exists(target) =>
            fs.delete(tmp, false); false
        }
      } else {
        // object store: create(overwrite = false) — a conditional PUT on
        // connectors that support it, HEAD-then-PUT elsewhere
        try {
          val out = fs.create(target, false)
          try out.write(body.getBytes("UTF-8"))
          finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(target)        => false
        }
      }
    }
    def deleteTree(root: String, rel: String): Unit = { fs.delete(p(root, rel), true); () }
    def treeBytes(root: String, rel: String): Long = {
      val dir = p(root, rel)
      if (!fs.exists(dir)) 0L
      else fs.getContentSummary(dir).getLength
    }
  }

  private val objectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "abfs", "abfss", "wasb", "wasbs", "cos", "swift")

  private[graft] def ioFor(root: String): StoreIO = {
    val scheme = Option(URI.create(root.replace(" ", "%20")).getScheme).map(_.toLowerCase).orNull
    if (scheme == null || scheme == "file") NioIO
    else {
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = org.apache.hadoop.fs.FileSystem.get(URI.create(root), conf)
      new HadoopIO(fs, conf, renameAtomic = !objectStoreSchemes.contains(scheme))
    }
  }

  // ---------------------------------------------------------------------

  private def manifestName(batchId: Long) = f"manifest_$batchId%020d"

  /** True iff `batchId`'s manifest is published — the commit check a
    * single-store fold uses to acknowledge foreachBatch redeliveries
    * (multi-store folds keep their own outer marker).
    */
  def committed(root: String, batchId: Long): Boolean =
    ioFor(root).exists(root, manifestName(batchId))

  /** Newest committed manifest id strictly BELOW `batchId` (the base a
    * retry must fold onto), or the newest overall when `batchId` is
    * `Long.MaxValue` (read paths).
    */
  private[graft] def latestManifestBefore(root: String, batchId: Long): Option[Long] = {
    val ids = ioFor(root).list(root).collect {
      case n if n.startsWith("manifest_") => n.stripPrefix("manifest_").toLong
    }
    ids.filter(_ < batchId) match {
      case e if e.isEmpty => None
      case xs             => Some(xs.max)
    }
  }

  /** Parsed manifest: bucket→dir map plus the recorded bucket count
    * (None on pre-round-15 manifests, which carried no header).
    */
  private def readManifestFull(root: String, batchId: Long): (Map[Int, String], Option[Int]) = {
    val lines = ioFor(root).readLines(root, manifestName(batchId))
    var nb: Option[Int] = None
    val b = Map.newBuilder[Int, String]
    lines.foreach { l =>
      if (l.startsWith("#numBuckets=")) nb = Some(l.stripPrefix("#numBuckets=").toInt)
      else if (l.nonEmpty) {
        val i = l.indexOf('\t')
        b += (l.substring(0, i).toInt -> l.substring(i + 1))
      }
    }
    (b.result(), nb)
  }

  private def readManifest(root: String, batchId: Long): Map[Int, String] =
    readManifestFull(root, batchId)._1

  private def manifestBody(m: Map[Int, String], numBuckets: Int): String =
    (s"#numBuckets=$numBuckets" +:
      m.toSeq.sorted.map { case (k, p) => s"$k\t$p" }).mkString("\n")

  private def writeManifest(root: String, batchId: Long, m: Map[Int, String], numBuckets: Int): Unit =
    ioFor(root).publish(root, manifestName(batchId), manifestBody(m, numBuckets))

  /** Fold `incoming` into the store for `batchId`, rewriting ONLY the
    * buckets containing incoming keys. `merge(prevTouched, incoming)`
    * receives the previous rows OF THE TOUCHED BUCKETS ONLY (empty-schema
    * DataFrame of `incoming`'s schema when the store is new) and returns
    * the full replacement rows for those buckets — an associative keyed
    * fold (min/sum/latest-by-seq) whose output keys stay in the touched
    * set by construction. A KEY-DELETING merge is also legal (round-15
    * ADVICE fix): manifest entries come from the bucket dirs the write
    * ACTUALLY produced, so a touched bucket whose merge output is empty
    * is dropped from the manifest — its keys are gone, readers never
    * chase a nonexistent path. Publishes `manifest_<batchId>` even when
    * the batch touches nothing, so readers can resolve every committed
    * id. When `autoCompactEvery` > 0 (OPT-IN; default 0 — see
    * [[defaultCompactEvery]] for why), every K-th batch the store
    * self-compacts and GCs down to the last two manifests (retrying
    * the NEWEST batch still finds a base < b), keeping the version
    * chain bounded on week-long streams at the cost of older
    * snapshots.
    *
    * Returns the parquet bytes this batch's INCREMENTAL write produced
    * (0 for a no-touch batch), captured BEFORE any auto-compaction GC
    * retires the version dir — a compaction-trigger batch's dir is
    * deleted inside this call (the compacted manifest references only
    * the `…c` dir), so a post-hoc `bytesWrittenBy` would read 0 and
    * silently undercount the write-amplification ledger (round-16
    * ADVICE fix; StateAudit consumes this).
    *
    * `multiWriter = true` (round 16) lifts the single-writer contract
    * for THIS batch id: the version dir gets a writer-unique name (two
    * racers never clobber each other's parquet) and the manifest is
    * published via the create-if-absent [[StoreIO.publishExclusive]]
    * primitive — exactly one racer's (dir, manifest) pair wins; the
    * loser deletes its staged dir and gets a
    * `ConcurrentModificationException` naming the batch id (its fold
    * may be STALE — retry against the winner's state, the
    * Delta/Iceberg OCC loop). Object-store caveat inherited from
    * publishExclusive: true atomicity needs a conditional-PUT-capable
    * connector.
    */
  def upsert(
      root: String,
      batchId: Long,
      incoming: DataFrame,
      keys: Seq[String],
      numBuckets: Int,
      stateSchema: Option[org.apache.spark.sql.types.StructType] = None,
      autoCompactEvery: Int = defaultCompactEvery,
      multiWriter: Boolean = false
  )(merge: (DataFrame, DataFrame) => DataFrame): Long = {
    val spark = incoming.sparkSession
    val baseId = latestManifestBefore(root, batchId)
    val (prev, prevBuckets) = baseId.map(readManifestFull(root, _)).getOrElse((Map.empty[Int, String], None))
    prevBuckets.foreach { nb =>
      require(
        nb == numBuckets,
        s"BucketedStateStore at $root is committed with numBuckets=$nb but upsert " +
          s"was called with $numBuckets — keys would hash into the wrong buckets. " +
          s"Only compact() may change the bucket count."
      )
    }
    val bcol = bucketOf(keys.map(col), numBuckets)
    // writer-unique version dir under multiWriter: two racers staging
    // the same batch id must never overwrite each other's parquet
    val out =
      if (multiWriter) s"buckets_v${batchId}w${java.util.UUID.randomUUID().toString.take(8)}"
      else s"buckets_v$batchId"
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
          // one file per bucket per rewrite (not shuffle-partitions-many):
          // the bucket IS the file-size unit — 128-512 MB at scale
          merge(prevTouched, inc)
            .withColumn("_b", bcol)
            .repartition(col("_b"))
            .write
            .partitionBy("_b")
            .mode("overwrite")
            .parquet(s"$root/$out")
          // entries from the dirs the write PRODUCED: a touched bucket the
          // merge emptied has no dir and gets no entry (explicit delete)
          bucketDirsIn(root, out).filter(touched).map(k => k -> s"$out/_b=$k").toMap
        }
      val entries = untouched ++ newEntries
      if (multiWriter) {
        val body = manifestBody(entries, numBuckets)
        if (!ioFor(root).publishExclusive(root, manifestName(batchId), body)) {
          // lost the commit race: drop the staged dir, surface loudly —
          // this writer's fold may be stale relative to the winner's
          ioFor(root).deleteTree(root, out)
          throw new java.util.ConcurrentModificationException(
            s"BucketedStateStore at $root: batch $batchId was committed by another " +
              "writer — retry the fold against the winner's state (OCC)"
          )
        }
      } else {
        writeManifest(root, batchId, entries, numBuckets)
      }
    } finally {
      inc.unpersist()
      ()
    }
    // ledger read BEFORE compaction can GC this batch's version dir
    val wroteBytes = ioFor(root).treeBytes(root, out)
    if (autoCompactEvery > 0 && batchId > 0 && batchId % autoCompactEvery == 0) {
      compact(spark, root, batchId, keys, numBuckets, dirSuffix = "c")
      gcOrphans(root, keepLast = 2)
      ()
    }
    wroteBytes
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
    * buckets re-bucketed and rewritten under `buckets_v<batchId><suffix>`)
    * and publish its manifest. Bounds the version-chain length a long
    * stream accumulates — the c1-compaction counterpart for this store;
    * run it at the cadence that amortizes (every K batches, the write
    * amplification becomes state/K per batch — [[upsert]] wires exactly
    * that policy by default since round 15). Keys are re-hashed, so
    * compaction may also CHANGE `numBuckets` (grow buckets as state
    * grows — the 100 TB knob). `dirSuffix` keeps the compacted dir
    * distinct when compacting AT an id whose upsert already produced
    * `buckets_v<id>` (the auto-compaction case: reading and overwriting
    * the same dir would race Spark's lazy scan). Old versions stay
    * readable until [[gcOrphans]].
    */
  def compact(
      spark: SparkSession,
      root: String,
      batchId: Long,
      keys: Seq[String],
      numBuckets: Int,
      dirSuffix: String = ""
  ): Unit = {
    val live = readAt(spark, root, batchId)
      .getOrElse(throw new IllegalStateException(s"no live state to compact under $root"))
    val out = s"buckets_v$batchId$dirSuffix"
    val bcol = bucketOf(keys.map(col), numBuckets)
    live
      .withColumn("_b", bcol)
      .repartition(col("_b"))
      .write
      .partitionBy("_b")
      .mode("overwrite")
      .parquet(s"$root/$out")
    val written = bucketDirsIn(root, out)
    writeManifest(root, batchId, written.map(k => k -> s"$out/_b=$k").toMap, numBuckets)
  }

  /** GARBAGE-COLLECT versions no retained manifest references: all but
    * the newest `keepLast` manifests, and `buckets_v*` dirs none of the
    * keepers point at, are deleted. `keepLast = 2` is what the
    * auto-compaction path uses — a crashed-and-redelivered batch b can
    * still rebase on a manifest < b. Single-writer discipline: call when
    * no reader is pinned to an older snapshot (c7/c33's retention
    * contract). Returns deleted paths.
    */
  def gcOrphans(root: String, keepLast: Int = 1): Seq[String] = {
    val io = ioFor(root)
    val ids = manifestIds(root)
    if (ids.isEmpty) Seq.empty
    else {
      val kept = ids.takeRight(math.max(1, keepLast)).toSet
      val referenced = kept.flatMap { id =>
        readManifest(root, id).values.map(p => p.split("/")(0)) // buckets_v<id> component
      }
      val victims = io.list(root).filter { n =>
        (n.startsWith("buckets_v") && !referenced.contains(n)) ||
        (n.startsWith("manifest_") && !kept.contains(n.stripPrefix("manifest_").toLong))
      }
      victims.foreach(n => io.deleteTree(root, n))
      victims.sorted
    }
  }

  /** Bytes of parquet data written FOR one batch's version (test/audit
    * hook: the written-bytes-O(batch) pin).
    */
  private[graft] def bytesWrittenBy(root: String, batchId: Long): Long =
    ioFor(root).treeBytes(root, s"buckets_v$batchId")

  /** Bytes the auto-compaction at `batchId` wrote (0 when none ran) —
    * the amortized-cost side of the audit ledger.
    */
  private[graft] def compactionBytesAt(root: String, batchId: Long): Long =
    ioFor(root).treeBytes(root, s"buckets_v${batchId}c")

  /** Bucket ids with data dirs under a version dir. */
  private def bucketDirsIn(root: String, versionDir: String): Set[Int] =
    ioFor(s"$root/$versionDir")
      .list(s"$root/$versionDir")
      .collect { case n if n.startsWith("_b=") => n.stripPrefix("_b=").toInt }
      .toSet

  /** Buckets a batch's version rewrote (test/audit hook). */
  private[graft] def bucketsWrittenBy(root: String, batchId: Long): Set[Int] =
    bucketDirsIn(root, s"buckets_v$batchId")

  /** Total live-state parquet bytes under the newest manifest. */
  private[graft] def liveStateBytes(root: String): Long =
    latestManifestBefore(root, Long.MaxValue).map(liveStateBytesAt(root, _)).getOrElse(0L)

  /** Live-state bytes as of a SPECIFIC manifest — what a full-state COW
    * fold would have rewritten at that batch (audit hook).
    */
  private[graft] def liveStateBytesAt(root: String, manifestId: Long): Long =
    readManifest(root, manifestId).values.toSeq.distinct
      .map(p => ioFor(root).treeBytes(root, p))
      .sum

  /** All committed manifest ids, ascending (audit hook). */
  private[graft] def manifestIds(root: String): Seq[Long] =
    ioFor(root)
      .list(root)
      .collect { case n if n.startsWith("manifest_") => n.stripPrefix("manifest_").toLong }
      .sorted
}
