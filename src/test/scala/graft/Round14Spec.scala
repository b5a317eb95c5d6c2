package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 hardening differentials: the bounded-write bucketed state
  * store behind the corpus-sized streaming folds (s22/s23/s37/s38) —
  * per-batch written bytes O(batch × bucket), never O(state) — and its
  * crash/retry discipline.
  */
class Round14Spec extends AnyFunSuite {
  import TestSession._
  import graft.sources.BucketedStateStore

  test("BucketedStateStore: a 1-key batch rewrites ONE bucket; written bytes O(batch), not O(state)") {
    import spark.implicits._
    val root = graft.TempDirs.create("graft_bss_")
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    // batch 0: 512 distinct keys — populates every one of the 16 buckets
    val big = (0 until 512).map(i => (s"key_$i", 1L)).toDF("k", "n")
    BucketedStateStore.upsert(root, 0L, big, Seq("k"), 16)(merge)
    assert(BucketedStateStore.bucketsWrittenBy(root, 0L).size == 16)
    // batch 1: ONE key — exactly one bucket dir may be rewritten
    val tiny = Seq(("key_7", 5L)).toDF("k", "n")
    BucketedStateStore.upsert(root, 1L, tiny, Seq("k"), 16)(merge)
    assert(BucketedStateStore.bucketsWrittenBy(root, 1L).size == 1)
    val w1 = BucketedStateStore.bytesWrittenBy(root, 1L)
    val live = BucketedStateStore.liveStateBytes(root)
    assert(w1 > 0 && w1 * 4 < live, s"batch-1 wrote $w1 B vs $live B live state — not bounded")
    // and the fold is still exact: key_7 = 1 + 5, everything else intact
    val rows = BucketedStateStore.readLatest(spark, root).get.collect()
    assert(rows.length == 512)
    val byK = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byK("key_7") == 6L && byK("key_8") == 1L)
  }

  test("BucketedStateStore: retry after a crash between data write and manifest rebases on the committed id") {
    import spark.implicits._
    val root = graft.TempDirs.create("graft_bss_retry_")
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    BucketedStateStore.upsert(root, 0L, Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), Seq("k"), 4)(merge)
    // first attempt of batch 1 COMMITTED (manifest exists); a foreachBatch
    // redelivery must be acknowledged by the caller's committed() check —
    // but even a raw re-upsert of the same batch is safe: it rebases on
    // manifest_0 (strictly below its own id) and lands identical bytes
    val b1 = Seq(("a", 10L)).toDF("k", "n")
    BucketedStateStore.upsert(root, 1L, b1, Seq("k"), 4)(merge)
    assert(BucketedStateStore.committed(root, 1L))
    val once = BucketedStateStore.readLatest(spark, root).get.collect().map(_.toString).sorted
    BucketedStateStore.upsert(root, 1L, b1, Seq("k"), 4)(merge) // the retry
    val twice = BucketedStateStore.readLatest(spark, root).get.collect().map(_.toString).sorted
    assert(once.sameElements(twice), "retry double-folded the batch")
    assert(once.exists(_.contains("11")), s"a=1+10 expected: ${once.mkString(",")}")
  }

  test("s38Fold: tiny follow-up batch writes one keeper bucket; chopped folds equal the one-shot fold") {
    import spark.implicits._
    val big = (0 until 200).map(i => (i.toLong, s"doc body $i unique tokens ${i * 7}")).toDF("doc_id", "text")
    val tiny = Seq((999L, "zz yy xx ww")).toDF("doc_id", "text")
    val root = graft.TempDirs.create("graft_s38_bw_")
    graft.operators.StreamingBatch.s38Fold(root, 0L, big)
    graft.operators.StreamingBatch.s38Fold(root, 1L, tiny)
    // the single new content hash lands in exactly one bucket
    assert(BucketedStateStore.bucketsWrittenBy(s"$root/keep", 1L).size == 1)
    val w1 = BucketedStateStore.bytesWrittenBy(s"$root/keep", 1L)
    val live = BucketedStateStore.liveStateBytes(s"$root/keep")
    assert(w1 * 4 < live, s"s38 batch-1 keeper write $w1 B vs $live B state — not O(batch)")
    // equivalence: the same rows folded in ONE batch land identical keepers + totals
    val rootAll = graft.TempDirs.create("graft_s38_oneshot_")
    graft.operators.StreamingBatch.s38Fold(rootAll, 0L, big.unionByName(tiny))
    def keepRows(r: String, id: Long) = BucketedStateStore
      .readAt(spark, s"$r/keep", id).get.collect().map(_.toString).sorted.toSeq
    assert(keepRows(root, 1L) == keepRows(rootAll, 0L))
    val totChopped = spark.read.parquet(s"$root/tot_v1").collect().map(_.toString).toSeq
    val totOneShot = spark.read.parquet(s"${rootAll}/tot_v0").collect().map(_.toString).toSeq
    assert(totChopped == totOneShot)
  }

  test("s38Fold: a retry that died before the outer marker refolds from the marked base (no double count)") {
    import spark.implicits._
    val root = graft.TempDirs.create("graft_s38_crash_")
    val b0 = Seq((1L, "aa bb cc"), (2L, "dd ee")).toDF("doc_id", "text")
    val b1 = Seq((3L, "aa bb cc")).toDF("doc_id", "text") // dup of doc 1's content
    graft.operators.StreamingBatch.s38Fold(root, 0L, b0)
    graft.operators.StreamingBatch.s38Fold(root, 1L, b1)
    val keep1 = BucketedStateStore.readAt(spark, s"$root/keep", 1L).get
      .collect().map(_.toString).sorted
    val tot1 = spark.read.parquet(s"$root/tot_v1").collect().map(_.toString)
    // simulate: batch 1 wrote keep-manifest + tot but CRASHED before the
    // marker — the redelivery must recompute both from batch 0's marker
    // and land identical state
    assert(new java.io.File(s"$root/commit_1").delete())
    graft.operators.StreamingBatch.s38Fold(root, 1L, b1)
    assert(new java.io.File(s"$root/commit_1").exists())
    val keepR = BucketedStateStore.readAt(spark, s"$root/keep", 1L).get
      .collect().map(_.toString).sorted
    assert(keepR.sameElements(keep1))
    assert(spark.read.parquet(s"$root/tot_v1").collect().map(_.toString).sameElements(tot1))
    assert(keep1.length == 2) // doc 3's content deduped onto doc 1's keeper
  }

  private def unwrap(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p                                                                => p
    }

  test("GlobalRank: global rank()/dense_rank() plan distributed and stitch boundary ties exactly") {
    // 200-row peer groups over 4 shuffle partitions: groups MUST straddle
    // partition cuts, and id % 2 (500-row groups) chains a key across
    // whole partitions — the hard case for the offset walk
    for ((mod, q) <- Seq((5, "rank"), (5, "dense_rank"), (2, "rank"), (2, "dense_rank"))) {
      val df = spark.sql(
        s"SELECT id, $q() OVER (ORDER BY id % $mod) AS r FROM range(1000)"
      )
      val exec = unwrap(df)
      assert(
        exec.collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty,
        s"$q over id%$mod not rewritten:\n$exec"
      )
      assert(
        exec.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
        }.isEmpty
      )
      val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val groupSize = 1000 / mod
      (0L until 1000L).foreach { id =>
        val key = (id % mod).toInt
        val expected = if (q == "rank") key * groupSize + 1 else key + 1
        assert(got(id) == expected, s"$q(id=$id, mod=$mod): got ${got(id)}, want $expected")
      }
    }
    // untied order: rank == row_number; string keys with NULLs: null
    // order-keys are peers of each other (null-safe key equality)
    val untied = spark.sql("SELECT id, rank() OVER (ORDER BY id DESC) AS r FROM range(1000)")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    untied.foreach { case (id, r) => assert(r == (1000 - id).toInt) }
    import spark.implicits._
    val withNulls = Seq(
      (1L, Some("b")), (2L, None: Option[String]), (3L, Some("a")),
      (4L, None: Option[String]), (5L, Some("a"))
    ).toDF("id", "g")
    withNulls.createOrReplaceTempView("gr14_nulls")
    // single-expression windows so the rewrite fires (multi-expression
    // windows deliberately keep the stock plan)
    val nrDf = spark.sql("SELECT id, rank() OVER (ORDER BY g) AS r FROM gr14_nulls")
    val ndDf = spark.sql("SELECT id, dense_rank() OVER (ORDER BY g) AS d FROM gr14_nulls")
    assert(unwrap(nrDf).collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty)
    assert(unwrap(ndDf).collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty)
    // spark sorts NULLS FIRST asc: nulls (ids 2,4) rank 1; 'a' (3,5) rank 3; 'b' (1) rank 5
    val nrm = nrDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ndm = ndDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(nrm == Map(1L -> 5, 2L -> 1, 3L -> 3, 4L -> 1, 5L -> 3), s"rank: $nrm")
    assert(ndm == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2), s"dense_rank: $ndm")
  }

  test("BucketedStateStore: random batch chops land the identical state (fold equivalence)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"), min("tag").as("tag"))
    val rows = (0 until 400).map(i => (s"k${rnd.nextInt(80)}", rnd.nextInt(9).toLong + 1L, rnd.nextInt(1000).toLong))
    // one-shot reference fold
    val refRoot = graft.TempDirs.create("graft_bss_prop_ref_")
    BucketedStateStore.upsert(refRoot, 0L, rows.toDF("k", "n", "tag"), Seq("k"), 8)(merge)
    val expect = BucketedStateStore.readLatest(spark, refRoot).get
      .collect().map(_.toString).sorted.toSeq
    // three random chops, each with random batch sizes AND random bucket counts
    (1 to 3).foreach { trial =>
      val root = graft.TempDirs.create(s"graft_bss_prop_${trial}_")
      var rest = rows
      var b = 0L
      val buckets = 1 + rnd.nextInt(16)
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(math.min(150, rest.size))
        BucketedStateStore.upsert(root, b, rest.take(take).toDF("k", "n", "tag"), Seq("k"), buckets)(merge)
        rest = rest.drop(take)
        b += 1
      }
      val got = BucketedStateStore.readLatest(spark, root).get
        .collect().map(_.toString).sorted.toSeq
      assert(got == expect, s"trial $trial (buckets=$buckets, batches=$b) diverged from one-shot fold")
    }
  }

  test("BucketedStateStore: compact rewrites live state as ONE version; gcOrphans deletes the rest") {
    import spark.implicits._
    val root = graft.TempDirs.create("graft_bss_compact_")
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    (0 until 5).foreach { b =>
      val batch = (0 until 40).map(i => (s"k${(b * 7 + i) % 60}", 1L)).toDF("k", "n")
      BucketedStateStore.upsert(root, b.toLong, batch, Seq("k"), 8)(merge)
    }
    val before = BucketedStateStore.readLatest(spark, root).get.collect().map(_.toString).sorted
    BucketedStateStore.compact(spark, root, 100L, Seq("k"), numBuckets = 8)
    val victims = BucketedStateStore.gcOrphans(root)
    assert(victims.nonEmpty, "gc found nothing to delete after compaction")
    // every surviving data dir is the compacted version; old manifests gone
    val left = new java.io.File(root).list().toSeq
    assert(left.filter(_.startsWith("buckets_v")) == Seq("buckets_v100"))
    assert(left.count(_.startsWith("manifest_")) == 1)
    // content identical; compacted bytes = live bytes (one full copy, no history)
    val after = BucketedStateStore.readLatest(spark, root).get.collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction changed content")
    // bytesWrittenBy also counts the version dir's _SUCCESS/.crc sidecars
    // that sit above the bucket subdirs — allow that sliver
    val wrote = BucketedStateStore.bytesWrittenBy(root, 100L)
    val live = BucketedStateStore.liveStateBytes(root)
    assert(wrote >= live && wrote - live < 100, s"compacted $wrote B vs live $live B")
  }

  test("GlobalRank: global percent_rank() stitches (rank−1)/(n−1) exactly, incl. the n=1 edge") {
    val df = spark.sql(
      "SELECT id, percent_rank() OVER (ORDER BY id % 5) AS pr FROM range(1000)"
    )
    val exec = unwrap(df)
    assert(
      exec.collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty,
      s"percent_rank not rewritten:\n$exec"
    )
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    (0L until 1000L).foreach { id =>
      val expected = ((id % 5) * 200).toDouble / 999.0
      assert(got(id) == expected, s"percent_rank(id=$id): ${got(id)} != $expected")
    }
    // n = 1 edge: stock semantics say 0.0
    val one = spark.sql("SELECT id, percent_rank() OVER (ORDER BY id) AS pr FROM range(1)")
    assert(one.collect().head.getDouble(1) == 0.0)
    // cume_dist rides the rewrite too since round 15 (the forward
    // head-run stitch) — see Round15Spec for its value differentials
    val cd = spark
      .sql("SELECT id, cume_dist() OVER (ORDER BY id % 5) AS cd FROM range(100)")
      .queryExecution
      .optimizedPlan
    assert(cd.collect { case g: graft.plans.GlobalRankNode => g }.nonEmpty)
  }

  test("GlobalRank family: randomized tie differentials vs an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 3).foreach { trial =>
      val n = 500 + rnd.nextInt(1500)
      val mod = 1 + rnd.nextInt(20) // tie density: up to n/1 .. n/20-wide peer groups
      val keys = Vector.fill(n)(rnd.nextInt(mod).toLong)
      keys.zipWithIndex.map { case (k, i) => (k, i.toLong, (k % 7) + 1) }
        .toDF("k", "id", "v").createOrReplaceTempView("gr14_rand")
      // reference maps from the key multiset
      val sortedKeys = keys.sorted
      val below = keys.distinct.sorted.map(k => k -> sortedKeys.indexWhere(_ == k)).toMap
      val denseOf = keys.distinct.sorted.zipWithIndex.toMap
      def run(sql: String) = {
        val df = spark.sql(sql)
        assert(
          unwrap(df).collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty ||
            unwrap(df).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
          s"trial $trial not rewritten: $sql"
        )
        df.collect()
      }
      run("SELECT id, k, rank() OVER (ORDER BY k) AS r FROM gr14_rand").foreach { row =>
        assert(row.getInt(2) == below(row.getLong(1)) + 1, s"rank trial $trial")
      }
      run("SELECT id, k, dense_rank() OVER (ORDER BY k) AS r FROM gr14_rand").foreach { row =>
        assert(row.getInt(2) == denseOf(row.getLong(1)) + 1, s"dense trial $trial")
      }
      run("SELECT id, k, percent_rank() OVER (ORDER BY k) AS r FROM gr14_rand").foreach { row =>
        val exp = below(row.getLong(1)).toDouble / (n - 1)
        assert(row.getDouble(2) == exp, s"pct trial $trial")
      }
      // prefix sum over the UNIQUE (k, id) order — reference by sorted scan
      val orderRef = keys.zipWithIndex
        .map { case (k, i) => (k, i.toLong, (k % 7) + 1) }
        .sortBy(t => (t._1, t._2))
      val cums = orderRef.scanLeft(0L)((a, t) => a + t._3).drop(1)
      val cumOf = orderRef.map(_._2).zip(cums).toMap
      run(
        "SELECT id, sum(v) OVER (ORDER BY k, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM gr14_rand"
      ).foreach { row => assert(row.getLong(1) == cumOf(row.getLong(0)), s"prefix trial $trial") }
    }
  }

  test("GlobalNtile: single scan — n rides the rank exec's own offsets, no second child pass") {
    val df = spark.sql("SELECT id, ntile(7) OVER (ORDER BY id) AS t FROM range(1003)")
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty)
    // round 13 planned child-count + broadcast-nested-loop join; round 14
    // must plan NEITHER (the duplicate-subtree determinism hazard is gone)
    assert(
      exec.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }.isEmpty,
      s"ntile still joins a count subtree:\n$exec"
    )
    assert(
      exec.collect { case r: org.apache.spark.sql.execution.RangeExec => r }.length == 1,
      s"ntile still scans the child twice:\n$exec"
    )
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val sizes = (0 until 7).map(i => 1003 / 7 + (if (i < 1003 % 7) 1 else 0))
    val expected = sizes.zipWithIndex
      .flatMap { case (sz, i) => Seq.fill(sz)(i + 1) }
      .zipWithIndex.map { case (t, idx) => idx.toLong -> t }.toMap
    assert(got == expected)
  }

  test("GlobalPrefixSum: nullable inputs — all-null prefix is NULL, then sums ignore nulls") {
    import spark.implicits._
    Seq(
      (1L, None: Option[Long]), (2L, None: Option[Long]), (3L, Some(10L)),
      (4L, None: Option[Long]), (5L, Some(5L))
    ).toDF("i", "v").createOrReplaceTempView("gr14_ps_null")
    val df = spark.sql(
      "SELECT i, sum(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM gr14_ps_null"
    )
    assert(
      unwrap(df).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
      "nullable long running total not rewritten"
    )
    val got = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(10L), 4L -> Some(10L), 5L -> Some(15L)))
  }

  test("GlobalPrefixSum: decimal running totals stitch exactly (q60's financial idiom)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, BigDecimal(i, 2))) // exactly i × 10⁻²
    rows.toDF("i", "v").createOrReplaceTempView("gr14_ps_dec")
    val df = spark.sql(
      "SELECT i, sum(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM gr14_ps_dec"
    )
    assert(
      unwrap(df).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
      s"decimal running total not rewritten:\n${unwrap(df)}"
    )
    val got = df.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    var acc = java.math.BigDecimal.ZERO
    (1 to 500).foreach { i =>
      acc = acc.add(new java.math.BigDecimal(i).movePointLeft(2))
      assert(got(i.toLong).compareTo(acc) == 0, s"prefix at i=$i: ${got(i.toLong)} != $acc")
    }
  }

  test("q65/q66 plan through the GlobalRank family at data grain (no 1-task window)") {
    // round 16: q65 moved to exact BIGINT cents; the decimal prefix leg
    // is gated by q73 (decimals born exact from integer cents)
    val q65 = graft.operators.Relational.q65CumRevenue(spark, sf)
    assert(
      unwrap(q65).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
      s"q65 missed the prefix exec:\n${unwrap(q65)}"
    )
    val q73 = graft.operators.Relational.q73CentsDecimal(spark, sf)
    assert(
      unwrap(q73).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
      s"q73 missed the decimal prefix exec:\n${unwrap(q73)}"
    )
    val q66 = graft.operators.Relational.q66QuantityRank(spark, sf)
    assert(
      unwrap(q66).collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty,
      s"q66 missed the tie-aware rank exec:\n${unwrap(q66)}"
    )
    val q67 = graft.operators.Relational.q67SpendPercentile(spark, sf)
    assert(
      unwrap(q67).collect {
        case g: graft.plans.GlobalRankExec if g.mode == graft.plans.GlobalRankMode.PercentRankTies => g
      }.nonEmpty,
      s"q67 missed the percent_rank exec:\n${unwrap(q67)}"
    )
    // q60's cumulative revenue now rides the decimal prefix exec too
    // (it used ScaleRank scaffolding before round 14)
    val q60 = graft.operators.Relational.q60AbcClass(spark, sf)
    assert(
      unwrap(q60).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty,
      s"q60 missed the decimal prefix exec:\n${unwrap(q60)}"
    )
    Seq(q65, q73, q66, q67, q60).foreach { df =>
      assert(
        unwrap(df).collect {
          case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
        }.isEmpty,
        "a 1-task global window survived"
      )
    }
  }

  test("GlobalPrefixSum: ANSI overflow throws loudly; try_sum keeps the stock plan") {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = spark.sql(
        s"SELECT id, sum(${Long.MaxValue / 2}L + id) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM range(10)"
      )
      assert(unwrap(df).collect { case g: graft.plans.GlobalPrefixSumExec => g }.nonEmpty)
      val ex = intercept[Exception] { df.collect() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(
        chain(ex).exists(_.isInstanceOf[ArithmeticException]),
        s"expected ArithmeticException under ANSI, got $ex"
      )
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
    val trySum = spark.sql(
      "SELECT id, try_sum(id) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM range(10)"
    )
    assert(
      trySum.queryExecution.optimizedPlan.collect {
        case g: graft.plans.GlobalPrefixSumNode => g
      }.isEmpty,
      "try_sum must keep the stock plan (overflow-to-null semantics)"
    )
  }
}
