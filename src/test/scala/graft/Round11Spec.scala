package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 regression pins for the round-10 ADVICE items: daemon
  * failure visibility with multiple sinks, foreachBatch replay
  * idempotence for the s28 sum-fold and the s27 append, the SqlMain
  * driver-materialization hole, and the version-annotation sidecar the
  * idempotence fix rides on.
  */
class Round11AdviceSpec extends AnyFunSuite {
  import TestSession._
  import java.nio.file.{Files, Paths}
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

  test("Daemon.await surfaces a failure in ANY query, not just the first to terminate") {
    val root = TempDirs.create("graft_await_multi_")
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/a.txt"), "1\n2\n3\n")
    def src = spark.readStream.text(in)
    // clean query drains instantly; failing query sleeps so the clean one
    // terminates FIRST — the round-10 bug returned success in exactly
    // this ordering (find() saw the clean inactive query, no exception,
    // forall(!isActive) eventually true, failure never rethrown).
    val good = src.writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ck_good")
      .trigger(Trigger.AvailableNow())
      .start()
    val bad = src.writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        Thread.sleep(1500)
        throw new RuntimeException("sink exploded")
      }
      .option("checkpointLocation", s"$root/ck_bad")
      .trigger(Trigger.AvailableNow())
      .start()
    val noop = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    val daemon = new IngestMain.Daemon(spark, Seq(good, bad), noop, None)
    val thrown = intercept[Exception] { daemon.await(pollMs = 50L) }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(thrown).exists(_.contains("sink exploded")), s"got: $thrown")
    daemon.stop()
  }

  test("s28FoldBatch: a replayed batchId is acknowledged without double-summing") {
    import spark.implicits._
    val store = TempDirs.create("graft_s28_idem_") + "/store"
    val b0 = Seq(("click", "2024-01-01 01:10:00"), ("click", "2024-01-01 01:20:00"))
      .toDF("event_type", "ts_s")
      .selectExpr("event_type", "cast(ts_s as timestamp) as ts")
    def counts(): Map[String, Long] =
      graft.sources.SnapshotStore
        .readCurrent(spark, store)
        .collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("cnt"))
        .toMap
    graft.operators.StreamingBatch.s28FoldBatch(store, b0, 0L)
    assert(counts() == Map("click" -> 2L))
    // at-least-once redelivery of the SAME batch: must be a no-op
    graft.operators.StreamingBatch.s28FoldBatch(store, b0, 0L)
    assert(counts() == Map("click" -> 2L), "replayed batch was summed twice")
    assert(graft.sources.SnapshotStore.currentVersion(store).contains(1L),
      "replay must not even publish a new version")
    // a genuinely new batch still folds
    graft.operators.StreamingBatch.s28FoldBatch(store, b0, 1L)
    assert(counts() == Map("click" -> 4L))
  }

  test("SnapshotStore.annotate/annotation: sidecar rides the staged->published rename, invisible to the scan") {
    import spark.implicits._
    val store = TempDirs.create("graft_annot_") + "/store"
    val staged = s"$store/_stage_x"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(staged)
    graft.sources.SnapshotStore.annotate(staged, "batch", "42")
    val v = graft.sources.SnapshotStore.commitStagedIfCurrent(store, None, staged)
    assert(v.contains(1L))
    assert(graft.sources.SnapshotStore.annotation(store, 1L, "batch").contains("42"))
    assert(graft.sources.SnapshotStore.annotation(store, 1L, "other").isEmpty)
    // the underscore sidecar must not perturb the parquet read
    assert(graft.sources.SnapshotStore.readCurrent(spark, store).count() == 1L)
  }

  test("c11 default accuracy: GK octile edges keep every bin within the documented rank-error of n/8") {
    // sf0.01 lineitem (~60k rows) EXCEEDS the default GK accuracy (10^4),
    // so the summary genuinely compresses — this exercises the
    // approximate regime, not exact retention. GK guarantees each edge's
    // rank within n/accuracy of the target, so a bin (between two edges)
    // deviates from n/8 by at most 2n/accuracy, plus slack for the
    // 4-decimal edge rounding merging near-equal values.
    val sf001 = "/root/testdata/sf0.01"
    val rows = graft.operators.Maintenance.c11EquidepthHist(spark, sf001).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n > 2 * 10000, "test must run in the compressed-GK regime")
    val tol = 2.0 * n / 10000 + 32
    val expected = n / 8.0
    rows.foreach { r =>
      val dev = math.abs(r.getAs[Long]("n") - expected)
      assert(dev <= tol, s"bin ${r.getAs[Long]("bin")} count ${r.getAs[Long]("n")} deviates $dev > $tol from $expected")
    }
    assert(rows.length == 8)
  }

  test("q43: the accuracy knob is semantics-free below the compression threshold") {
    // at sf0.001 every metric column is far smaller than both accuracies,
    // so GK retains everything in both configs and the scores must be
    // IDENTICAL — pins that gate config and production default run the
    // same code path, differing only in summary compression.
    val a = graft.operators.Relational.q43Rfm(spark, sf).collect().map(_.toString).sorted
    val b = graft.operators.Relational.q43Rfm(spark, sf, accuracy = 10000000).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("m14b real-decode dHash equals the synthetic-model m14 bit-for-bit") {
    // the staged PNGs encode the synthetic pixel model, so a correct
    // ImageIO decode + raster downsample must land on identical hashes;
    // any decoder deviation (dims, bit depth, sample order) diverges
    val real = graft.operators.Multimodal.m14bDHashReal(spark, sf).collect().map(_.toString)
    val synth = graft.operators.Multimodal.m14DHash(spark, sf).collect().map(_.toString)
    assert(real.nonEmpty && real.sameElements(synth))
  }

  test("c26 greedy bins: every bin boundary per day has crossed its multiple of the target") {
    val rows = graft.operators.Maintenance.c26CompactionPlan(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("dt")).values.foreach { bins =>
      val sorted = bins.sortBy(_.getAs[Long]("bin"))
      sorted.zipWithIndex.foreach { case (b, i) =>
        val before = sorted.take(i).map(_.getAs[Long]("n_rows")).sum
        // bin k only opens once the preceding cumulative crossed k*target
        assert(before >= 200L * b.getAs[Long]("bin"),
          s"bin ${b.getAs[Long]("bin")} opened at cumulative $before")
      }
      // hour spans never overlap between consecutive bins
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0).getAs[Long]("last_hr") < pair(1).getAs[Long]("first_hr"))
      }
    }
  }

  test("e39 rate limit: burst bounded by event count, breach flag consistent") {
    val rows = graft.operators.Events.e39RateLimit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mx, breach) = (r.getAs[Long]("n_events"), r.getAs[Long]("max_burst"), r.getAs[Boolean]("breach"))
      assert(mx >= 1 && mx <= n)
      assert(breach == (mx >= 4))
    }
  }

  test("q53 sweep-line: every order line opens before it ships (net deltas cancel)") {
    val rows = graft.operators.Relational.q53IntervalOverlap(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("peak_open") >= 0))
  }

  test("t34 entropy equals an independent in-memory recompute") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.operators.TextAnalysis.t34Entropy(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_types") == counts.size.toLong)
      val sclnc = counts.values.map { c =>
        BigDecimal(c) * BigDecimal(math.log(c.toDouble)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val h = math.log(toks.length.toDouble) - sclnc.toDouble / toks.length
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-6, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("q54 co-purchase equals a brute-force basket recompute") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val expected = li.groupBy(_._1).values.flatMap { basket =>
      val parts = basket.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length) yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2L).toMap
    val got = graft.operators.Relational.q54Copurchase(spark, sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) -> r.getAs[Long]("n_orders")).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("e40 PSI: cohorts partition the events and PSI is symmetric-positive") {
    val rows = graft.operators.Events.e40PsiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    // PSI >= 0 always (sum of (p-q)ln(p/q) terms, each nonnegative)
    rows.foreach(r => assert(r.getAs[Double]("psi") >= 0.0 && r.getAs[Long]("n_bins") >= 1))
  }

  test("t36 winnowing: every complete window contains a selected fingerprint (coverage guarantee)") {
    val fps = graft.operators.TextAnalysis.t36Winnowing(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("pos")).toSet).toMap
    assert(fps.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text").collect()
    var checked = 0
    docs.foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val nGrams = toks.length - 4
      val nWindows = nGrams - 3
      if (nWindows >= 1) {
        val sel = fps(r.getLong(0))
        (1 to nWindows).foreach { t =>
          assert((t to t + 3).exists(p => sel.contains(p.toLong)), s"doc ${r.getLong(0)} window $t uncovered")
        }
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("c28 WAP: the corrupted candidate never publishes; the store lands exactly one version") {
    val rows = graft.operators.Maintenance.c28Wap(spark, sf).collect()
    assert(rows.length == 6)
    val byAttempt = rows.groupBy(_.getAs[Int]("attempt"))
    assert(byAttempt(1).forall(!_.getAs[Boolean]("published")))
    assert(byAttempt(1).exists(r => r.getAs[String]("check_name") == "null_key" && !r.getAs[Boolean]("passed")))
    assert(byAttempt(2).forall(r => r.getAs[Boolean]("published") && r.getAs[Boolean]("passed")))
  }

  test("SqlMain.runScript: a large mid-script SELECT executes WITHOUT landing on the driver") {
    // round-13 contract (r12 ADVICE): mid-script non-commands are FULLY
    // evaluated via a noop write — every row executes on executors
    // (late-row assert_true fires, pinned in Round13Spec), but nothing
    // is collect()ed. A billion-row range through a driver collect would
    // OOM; through the noop sink it's a codegen count-loop that finishes
    // comfortably inside the bound.
    val t0 = System.nanoTime()
    val out = SqlMain.runScript(spark,
      """CREATE OR REPLACE TEMP VIEW r11_tiny AS SELECT 1 AS one;
        |SELECT id FROM range(1000000000);
        |SELECT one FROM r11_tiny""".stripMargin)
    val rows = out.collect()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(rows.map(_.getInt(0)).toSeq == Seq(1))
    assert(elapsedSec < 120.0, f"mid-script SELECT cost $elapsedSec%.1f s - did it land on the driver?")
  }
}
