package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import graft.sources.{IngestMetrics, StreamIngest}

/** The khose-equivalent SERVICE: a config-driven, long-running ingest
  * daemon over the [[graft.sources.StreamIngest]] library. Point it at a
  * config file and it runs until stopped:
  *
  * {{{
  *   sbt "runMain graft.IngestMain /path/to/ingest.conf"
  * }}}
  *
  * Responsibilities beyond the library call:
  *  - config FILE parsing (properties `key=value` lines or a flat JSON
  *    object — both shapes a khose-style deployment ships);
  *  - a per-micro-batch metrics line on stdout (`[ingest-metrics] {...}`:
  *    rows, rate, trigger latency, watermark lag, late-dropped) via a
  *    [[StreamingQueryListener]] — the ops signal a dashboard tails;
  *  - graceful shutdown: SIGTERM (JVM shutdown hook) or the appearance of
  *    `control.stopFile` stops the queries between micro-batches. The
  *    file sink commits each batch atomically through its transaction
  *    log, so a stop at ANY point leaves a checkpoint a restart resumes
  *    exactly-once from — stop/restart is the crash-safety story, not a
  *    special case;
  *  - a final `[ingest-summary]` line (batches, rows, avg rate) on exit.
  *
  * Config keys (beyond [[StreamIngest.fromConfig]]'s source/schema/sink
  * keys): `trigger.mode` = processingTime (default) | availableNow (drain
  * the backlog, then exit — the batch-backfill mode), `trigger.intervalMs`
  * (default 1000), `dlq.path` (enables the dead-letter split),
  * `control.stopFile` (drain-stop when this path appears),
  * `spark.cores` (local session width; production would spark-submit
  * against a cluster master instead).
  */
object IngestMain {

  /** Parse a config file body: a flat JSON object (`{"k": "v", ...}`) if
    * it starts with `{`, else properties lines (`k=v`, `#` comments,
    * blank lines ignored; values may contain `=`).
    */
  def parseConfig(text: String): Map[String, String] = {
    val t = text.trim
    if (t.startsWith("{")) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(t)
      require(node.isObject, "JSON config must be a flat object of string keys")
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    } else {
      t.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val i = l.indexOf('=')
          require(i > 0, s"config line is not key=value: '$l'")
          l.substring(0, i).trim -> l.substring(i + 1).trim
        }
        .toMap
    }
  }

  private def triggerOf(conf: Map[String, String]): Trigger =
    conf.getOrElse("trigger.mode", "processingTime") match {
      case "availableNow" => Trigger.AvailableNow()
      case "processingTime" =>
        Trigger.ProcessingTime(s"${conf.getOrElse("trigger.intervalMs", "1000").toLong} milliseconds")
      case other => throw new IllegalArgumentException(s"unknown trigger.mode: $other")
    }

  /** Handle on a launched daemon: the running queries plus the control
    * surface `main` (and the restart test) drives.
    */
  final class Daemon(
      spark: SparkSession,
      val queries: Seq[StreamingQuery],
      listener: StreamingQueryListener,
      stopFile: Option[Path]
  ) {
    @volatile private var stopped = false

    /** Graceful stop: idempotent, stops every query (the file sink's
      * per-batch atomic commit means the checkpoint is clean wherever
      * this lands) and detaches the metrics listener.
      */
    def stop(): Unit = synchronized {
      if (!stopped) {
        stopped = true
        queries.foreach(q => if (q.isActive) q.stop())
        spark.streams.removeListener(listener)
      }
    }

    /** Block until every query terminates on its own (AvailableNow
      * drain, or a failure — rethrown), or the stop file appears.
      */
    def await(pollMs: Long = 200L): Unit = {
      var done = false
      while (!done && !stopped) {
        // Inspect EVERY terminated query: with multiple sinks (e.g. the
        // DLQ split) the first to finish may be the clean one — a failure
        // in any other query must still surface as the daemon's failure.
        queries.filter(q => !q.isActive).foreach { q =>
          q.exception.foreach { e => stop(); throw e }
        }
        if (queries.forall(q => !q.isActive)) done = true
        else if (stopFile.exists(Files.exists(_))) stop()
        else Thread.sleep(pollMs)
      }
      stop()
    }
  }

  /** Build and start the daemon from a parsed config — everything `main`
    * does except session construction and blocking, so tests drive the
    * identical path. `metricsOut` receives the per-batch metrics lines
    * (stdout in production, a collector in tests).
    */
  def launch(
      spark: SparkSession,
      conf: Map[String, String],
      metricsOut: String => Unit = println
  ): Daemon = {
    val cfg = StreamIngest.fromConfig(conf).copy(trigger = triggerOf(conf))
    val listener = new StreamingQueryListener {
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val o = mapper.createObjectNode()
        o.put("query", p.id.toString)
        o.put("batch", p.batchId)
        o.put("rows", p.numInputRows)
        o.put("rowsPerSec",
          if (p.processedRowsPerSecond.isNaN || p.processedRowsPerSecond.isInfinite) 0.0
          else p.processedRowsPerSecond)
        o.put("triggerMs", Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
        IngestMetrics.lagPerBatch(Seq(p)).headOption.foreach { lag =>
          o.put("watermarkDelayMs", lag.watermarkDelayMs)
          o.put("lateDropped", lag.lateDropped)
        }
        metricsOut(s"[ingest-metrics] ${mapper.writeValueAsString(o)}")
      }
    }
    spark.streams.addListener(listener)
    val queries = conf.get("dlq.path") match {
      case Some(dlq) => val (good, bad) = StreamIngest.runWithDlq(spark, cfg, dlq); Seq(good, bad)
      case None      => Seq(StreamIngest.run(spark, cfg))
    }
    new Daemon(spark, queries, listener, conf.get("control.stopFile").map(Paths.get(_)))
  }

  /** stdout plus (when `metrics.file` is configured) an append-only
    * JSON-lines file — the liveness/lag record an ops dashboard tails
    * without scraping the process's stdout.
    */
  private[graft] def metricsSink(conf: Map[String, String]): String => Unit = {
    val toFile: Option[String => Unit] = conf.get("metrics.file").map { path =>
      Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
      line =>
        Files.writeString(
          Paths.get(path),
          line + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND
        ): Unit
    }
    line => { println(line); toFile.foreach(_(line)) }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.IngestMain <config-file>")
    val conf = parseConfig(Files.readString(Paths.get(args(0))))
    val spark = GraftSession.local(
      conf.get("spark.cores").map(_.toInt).getOrElse(Runtime.getRuntime.availableProcessors().min(32))
    )
    val daemon = launch(spark, conf, metricsSink(conf))
    sys.addShutdownHook(daemon.stop())
    try daemon.await()
    finally {
      daemon.queries.foreach { q =>
        println(s"[ingest-summary] ${IngestMetrics.summarize(q.recentProgress.toIndexedSeq)}")
      }
      if (conf.getOrElse("spark.stopOnExit", "true").toBoolean) spark.stop()
    }
  }
}
