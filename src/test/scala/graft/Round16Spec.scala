package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-16 differentials: the mixed-window SPLIT (rewritable
  * expressions chain over one exchange, the non-rewritable remainder
  * keeps a stock Window computing ONLY itself), the avg(long)
  * sum/count decomposition, the lag/lead tiebreak (two-pass boundary
  * consistency under tied order keys), the spillable peer-group
  * buffer, the q65 exact-cents rebuild + q73 decimal-leg gate, and the
  * opt-in auto-compaction default.
  */
class Round16Spec extends AnyFunSuite {
  import TestSession._

  private def unwrap(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p                                                                => p
    }

  test("split rewrite: one non-rewritable expression no longer drags siblings onto the 1-task plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260901L)
    val rows = (0 until 900).map { i =>
      (i.toLong, rnd.nextInt(8), rnd.nextInt(40).toLong)
    }
    rows.toDF("i", "k", "x").createOrReplaceTempView("r16_split")
    // avg over DOUBLE input is NOT a rewritable idiom (FP add order);
    // pre-round-16 its presence silently kept sum+rank on the stock
    // 1-task window too
    val df = spark.sql(
      """SELECT i, k, sum(x) OVER w AS s, rank() OVER w AS r,
        | round(avg(CAST(x AS DOUBLE)) OVER w, 6) AS ad
        |FROM r16_split WINDOW w AS (ORDER BY k)""".stripMargin
    )
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalRangePrefixSumExec => g }.length == 1,
      s"sum should ride the range exec:\n$exec")
    assert(exec.collect { case g: graft.plans.GlobalRankExec => g }.length == 1,
      s"rank should ride the rank exec:\n$exec")
    val stock = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(stock.length == 1 && stock.head.windowExpression.length == 1,
      s"the stock remainder should compute ONLY the double avg:\n$exec")
    // parity against hand-computed reference
    val byKey = rows.groupBy(_._2)
    val keys = byKey.keys.toSeq.sorted
    var sAcc = 0L; var rk = 1L; var cnt = 0L
    val ref = scala.collection.mutable.Map.empty[Int, (Long, Long, Double)]
    keys.foreach { k =>
      val g = byKey(k)
      val rankOfK = rk
      g.foreach { case (_, _, x) => sAcc += x; cnt += 1 }
      rk += g.length
      ref(k) = (sAcc, rankOfK, sAcc.toDouble / cnt)
    }
    df.collect().foreach { r =>
      val k = r.getInt(1)
      val (es, er, ea) = ref(k)
      assert(r.getLong(2) == es, s"sum at k=$k")
      assert(r.getInt(3).toLong == er, s"rank at k=$k")
      assert(math.abs(r.getDouble(4) - ea) < 1e-5, s"double avg at k=$k")
    }
  }

  test("global first_value/last_value are O(P)-metadata constants — nulls, IGNORE NULLS, both edges") {
    import spark.implicits._
    // head value NULL, tail value NULL — exercises the ignoreNulls walk
    val rows = Seq(
      (1L, Option.empty[Long]),
      (2L, Some(20L)),
      (3L, Some(30L)),
      (4L, Option.empty[Long])
    )
    rows.toDF("i", "x").createOrReplaceTempView("r16_edge")
    val df = spark.sql(
      """SELECT i,
        | first_value(x) OVER w AS fv,
        | first_value(x) IGNORE NULLS OVER w AS fvn,
        | last_value(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
        | last_value(x) IGNORE NULLS OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lvn
        |FROM r16_edge WINDOW w AS (ORDER BY i)""".stripMargin
    )
    val exec = unwrap(df)
    // r17 ADVICE fix: fvn (IGNORE NULLS over the default running frame)
    // is NOT a global constant — at i=1 its frame holds only the NULL,
    // where stock yields NULL — so it stays in the stock-Window
    // remainder via the split; the other three ride the constant exec
    // (fv: from-start frame respecting nulls; lv/lvn: the FULL frame).
    assert(exec.collect { case g: graft.plans.GlobalFirstValueExec => g }.length == 3,
      s"three edge values should ride the constant exec:\n$exec")
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.length == 1, s"fvn should keep exactly one stock remainder window:\n$exec")
    df.collect().foreach { r =>
      assert(r.isNullAt(1), s"fv at i=${r.getLong(0)}") // first row's x IS null
      // stock parity for the running-frame IGNORE NULLS shape: NULL
      // until the first non-null enters the frame, 20 after
      if (r.getLong(0) == 1L) assert(r.isNullAt(2), "fvn at i=1: frame holds only the NULL")
      else assert(r.getLong(2) == 20L, s"fvn at i=${r.getLong(0)}")
      assert(r.isNullAt(3), "last row's x IS null")
      assert(r.getLong(4) == 30L, "last non-null")
    }
    // stock-parity assertion for the running-frame IGNORE NULLS shape:
    // the same query with the rewrite rule disabled must match row-for-row
    val stock = {
      spark.conf.set("spark.graft.windowRewrite.enabled", "false")
      try spark.sql(
        """SELECT i, first_value(x) IGNORE NULLS OVER (ORDER BY i) AS fvn
          |FROM r16_edge ORDER BY i""".stripMargin).collect()
      finally spark.conf.unset("spark.graft.windowRewrite.enabled")
    }
    val ours = df.select("i", "fvn").orderBy("i").collect()
    stock.zip(ours).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1) &&
        (a.isNullAt(1) || a.getLong(1) == b.getLong(1)), s"stock parity at i=${a.getLong(0)}")
    }
    // last_value with the DEFAULT frame (ends at CURRENT ROW) is NOT a
    // global constant — must keep the stock plan
    val dflt = spark.sql("SELECT i, last_value(x) OVER (ORDER BY i) AS lv FROM r16_edge")
    assert(unwrap(dflt).collect { case g: graft.plans.GlobalFirstValueExec => g }.isEmpty)
    // scale-ish shape across many partitions: constant equals the head
    // of the total order
    val big = spark.sql(
      "SELECT id, first_value(id * 3 + 1) OVER (ORDER BY id DESC) AS fv FROM range(100000)"
    )
    assert(unwrap(big).collect { case g: graft.plans.GlobalFirstValueExec => g }.nonEmpty)
    assert(big.collect().forall(_.getLong(1) == 99999L * 3 + 1))
  }

  test("avg(long) decomposition: ROWS and default-RANGE frames match hand-computed averages incl. null runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260902L)
    val rows = (0 until 800).map { i =>
      val v: Option[Long] = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toLong)
      (i.toLong, rnd.nextInt(7), v)
    }
    rows.toDF("i", "k", "x").createOrReplaceTempView("r16_avg")
    // ROWS frame: per-row running average under a TOTAL order
    val dfRows = spark.sql(
      """SELECT i, avg(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a
        |FROM r16_avg""".stripMargin
    )
    assert(unwrap(dfRows).collect { case g: graft.plans.GlobalPrefixSumExec => g }.length == 2,
      s"avg should chain sum+count prefix execs:\n${unwrap(dfRows)}")
    assert(unwrap(dfRows).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    val sortedRows = rows.sortBy(_._1)
    var s = 0L; var c = 0L
    val refRows = sortedRows.map { case (i, _, v) =>
      v.foreach { x => s += x; c += 1 }
      i -> (if (c == 0) None else Some(s.toDouble / c))
    }.toMap
    dfRows.collect().foreach { r =>
      val got = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(got == refRows(r.getLong(0)), s"rows-avg at i=${r.getLong(0)}")
    }
    // default RANGE frame: average through the peer group's END
    val dfRange = spark.sql(
      "SELECT i, k, avg(x) OVER (ORDER BY k) AS a FROM r16_avg"
    )
    assert(unwrap(dfRange).collect { case g: graft.plans.GlobalRangePrefixSumExec => g }.length == 2)
    val byKey = rows.groupBy(_._2)
    var s2 = 0L; var c2 = 0L
    val refRange = byKey.keys.toSeq.sorted.map { k =>
      byKey(k).foreach { case (_, _, v) => v.foreach { x => s2 += x; c2 += 1 } }
      k -> (if (c2 == 0) None else Some(s2.toDouble / c2))
    }.toMap
    dfRange.collect().foreach { r =>
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == refRange(r.getInt(1)), s"range-avg at k=${r.getInt(1)}")
    }
  }

  test("count over ROWS UNBOUNDED..CURRENT rides the prefix exec — nulls skipped, count(*) counts rows") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (i.toLong, if (i % 3 == 0) None else Some(i.toLong))
    }
    rows.toDF("i", "x").createOrReplaceTempView("r16_cnt")
    val df = spark.sql(
      """SELECT i,
        | count(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
        | count(*) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |FROM r16_cnt""".stripMargin
    )
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalPrefixSumExec => g }.length == 2,
      s"both counts should ride prefix execs:\n$exec")
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    df.collect().foreach { r =>
      val i = r.getLong(0)
      val expCx = (0L to i).count(_ % 3 != 0).toLong
      assert(r.getLong(1) == expCx, s"count(x) at i=$i")
      assert(r.getLong(2) == i + 1, s"count(*) at i=$i")
    }
  }

  test("offset tiebreak: lag over ALL-tied order keys is consistent with ONE row ordering (chain property)") {
    import spark.implicits._
    // every order key equal: pre-round-16, the two independent pass
    // sorts could disagree within the tie and emit a lag sequence
    // consistent with NO single ordering (a value duplicated/skipped)
    val n = 5000
    (0 until n).map(i => (i.toLong, 1)).toDF("id", "k").createOrReplaceTempView("r16_tie")
    val df = spark.sql("SELECT id, lag(id, 1) OVER (ORDER BY k) AS p FROM r16_tie")
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalOffsetWindowExec => g }.nonEmpty, s"$exec")
    // the tiebreak column must not leak into the output
    assert(df.columns.toSeq == Seq("id", "p"))
    val got = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.length == n)
    // chain property: exactly one row has null lag (the global head);
    // every other row's lag names a DISTINCT id; following the
    // successor map visits all n rows exactly once — i.e. the lag
    // column describes one total ordering of the rows
    val nulls = got.filter(_._2.isEmpty)
    assert(nulls.length == 1, s"expected exactly one null lag, got ${nulls.length}")
    val pred = got.collect { case (id, Some(p)) => p -> id }.toMap
    assert(pred.size == n - 1, "a lag value was duplicated or skipped — inconsistent row ordering")
    var cur = nulls.head._1
    var visited = 1
    while (pred.contains(cur)) { cur = pred(cur); visited += 1 }
    assert(visited == n, s"successor chain covered $visited of $n rows")
  }

  test("offset tiebreak: values still exact vs stock formula when the order IS total, k spans partitions") {
    val df = spark.sql(
      "SELECT id, lag(id * 3, 250) OVER (ORDER BY id) AS v, lead(id * 3, 7) OVER (ORDER BY id) AS w FROM range(2000)"
    )
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalOffsetWindowExec => g }.length == 2, s"$exec")
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val lagE = if (id >= 250) Some((id - 250) * 3) else None
      val leadE = if (id + 7 < 2000) Some((id + 7) * 3) else None
      assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == lagE, s"lag at $id")
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == leadE, s"lead at $id")
    }
  }

  test("spillable peer-group buffer: a fat tie group beyond the in-memory threshold spills and stays exact") {
    import spark.implicits._
    val prevInMem = spark.conf.get("spark.sql.windowExec.buffer.in.memory.threshold")
    val prevSpill = spark.conf.get("spark.sql.windowExec.buffer.spill.threshold")
    try {
      // thresholds far below the group size force EAOUR through its
      // spill path inside GlobalRangePrefixSumExec and CumeDistTies
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "64")
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "128")
      val n = 20000
      (0 until n).map(i => (i.toLong, i % 3, 1L)).toDF("i", "k", "x")
        .createOrReplaceTempView("r16_spill")
      // 3 peer groups of ~6667 rows each — every group >> thresholds
      val df = spark.sql(
        "SELECT i, k, sum(x) OVER (ORDER BY k) AS s, cume_dist() OVER (ORDER BY k) AS cd FROM r16_spill"
      )
      val exec = unwrap(df)
      assert(exec.collect { case g: graft.plans.GlobalRangePrefixSumExec => g }.nonEmpty, s"$exec")
      assert(exec.collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty, s"$exec")
      val counts = Array(0, 1, 2).map(k => (0 until n).count(_ % 3 == k).toLong)
      val cumCounts = counts.scanLeft(0L)(_ + _).tail
      df.collect().foreach { r =>
        val k = r.getInt(1)
        assert(r.getLong(2) == cumCounts(k), s"spilled range-sum at k=$k")
        assert(math.abs(r.getDouble(3) - cumCounts(k).toDouble / n) < 1e-12, s"spilled cume_dist at k=$k")
      }
    } finally {
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", prevInMem)
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", prevSpill)
    }
  }

  test("q65 exact cents + q73 decimal leg: same running totals, BIGINT surfaces both (r17)") {
    val q65 = graft.operators.Relational.q65CumRevenue(spark, sf)
    assert(q65.schema("price_cents").dataType == org.apache.spark.sql.types.LongType)
    assert(q65.schema("cum_cents").dataType == org.apache.spark.sql.types.LongType)
    val q73 = graft.operators.Relational.q73CentsDecimal(spark, sf)
    // round 17: the gate edge is BIGINT cents; the DECIMAL(18,2) leg
    // stays INTERNAL (plan-pinned below via the analyzed plan type)
    assert(q73.schema("cum_cents").dataType == org.apache.spark.sql.types.LongType)
    assert(
      q73.queryExecution.analyzed.toString.contains("decimal(18,2)"),
      "q73 lost its internal decimal(18,2) leg"
    )
    val c65 = q65.collect()
    val c73 = q73.collect()
    assert(c65.length == c73.length && c65.nonEmpty)
    // the decimal leg's value IS the cents value (born from the same
    // integers): cum_cents (from decimal) == cum_cents (long leg)
    c65.zip(c73).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0)) // o_orderkey, same total order
      assert(a.getLong(3) == b.getLong(3), s"orderkey ${a.getLong(0)}")
    }
    // running total is monotone non-decreasing (prices are positive)
    c65.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getLong(3) <= w(1).getLong(3))
    }
  }

  test("upsert auto-compaction is OPT-IN: default keeps every manifest (time travel + replay safe)") {
    import spark.implicits._
    val bss = graft.sources.BucketedStateStore
    val root = graft.TempDirs.create("graft_r16_optin_")
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    (0 until 6).foreach { b =>
      bss.upsert(root, b.toLong, Seq((s"k$b", 1L)).toDF("k", "n"), Seq("k"), 4)(merge)
    }
    // every snapshot id still resolvable — nothing was GC'd
    assert(bss.manifestIds(root) == (0L until 6L).toSeq)
    (0 until 6).foreach { b =>
      val st = bss.readAt(spark, root, b.toLong).get.count()
      assert(st == b + 1L, s"snapshot $b")
    }
    // and the fold's returned write ledger is non-zero for a writing batch
    val wrote = bss.upsert(root, 6L, Seq(("k6", 1L)).toDF("k", "n"), Seq("k"), 4)(merge)
    assert(wrote > 0L)
  }

  test("upsert returns the batch's written bytes even when auto-compaction GCs the version dir") {
    import spark.implicits._
    val bss = graft.sources.BucketedStateStore
    val root = graft.TempDirs.create("graft_r16_ledger_")
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    (0 until 4).map { b =>
      bss.upsert(root, b.toLong, Seq((s"k$b", 1L)).toDF("k", "n"), Seq("k"), 2,
        autoCompactEvery = 2)(merge)
    }.zipWithIndex.foreach { case (wrote, b) =>
      assert(wrote > 0L, s"batch $b reported 0 written bytes (compaction GC'd the ledger read)")
    }
    // compaction DID run: batch 2's raw version dir is gone
    assert(bss.bytesWrittenBy(root, 2L) == 0L, "buckets_v2 should have been GC'd by the cadence")
  }

  test("q74/e56 plans: the avg decomposition and the split remainder at data grain") {
    val q74 = unwrap(graft.operators.Relational.q74RunningAvg(spark, sf))
    assert(q74.collect { case g: graft.plans.GlobalPrefixSumExec => g }.length == 2,
      s"q74 should chain sum+count prefix execs:\n$q74")
    assert(q74.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, s"q74 still plans a 1-task window:\n$q74")
    val e56 = unwrap(graft.operators.Events.e56MixedReport(spark, sf))
    // cum_n (CountK) + cum_cents (SumK) + avg → SumK + CountK = 4 execs
    assert(e56.collect { case g: graft.plans.GlobalRangePrefixSumExec => g }.length == 4,
      s"e56 should chain 4 range execs:\n$e56")
    // first_value rides the round-16 constant exec — NO stock window,
    // NO single-task pass anywhere in e56
    assert(e56.collect { case g: graft.plans.GlobalFirstValueExec => g }.length == 1,
      s"e56's first_value should ride the constant exec:\n$e56")
    assert(e56.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, s"e56 should have no stock global window:\n$e56")
    // the whole five-expression chain shares ONE (us, event_id) range
    // exchange; the only other exchange is the query's own output
    // ORDER BY event_id
    val chainEx = e56.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if x.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] &&
            x.outputPartitioning.asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]
              .ordering.length == 2 => x
    }
    assert(chainEx.length == 1, s"e56 chain should share one (us, event_id) exchange:\n$e56")
  }

  test("nth_value: k-th-row constant + frame-size condition across ROWS/RANGE/full frames, ties, k>n") {
    import spark.implicits._
    // unique order — all three frames have closed-form expectations
    val df = spark.sql(
      """SELECT id,
        | nth_value(id * 7, 5) OVER (ORDER BY id) AS nr,
        | nth_value(id * 7, 5) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nw,
        | nth_value(id * 7, 5) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nf,
        | nth_value(id * 7, 100) OVER (ORDER BY id) AS ng
        |FROM range(50)""".stripMargin
    )
    val exec = unwrap(df)
    assert(exec.collect { case g: graft.plans.GlobalKthValueExec => g }.length == 4,
      s"all four nth_values should ride the kth exec:\n$exec")
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, s"stock window survived:\n$exec")
    df.collect().foreach { r =>
      val id = r.getLong(0)
      val exp = if (id >= 4) Some(28L) else None
      assert((if (r.isNullAt(1)) None else Some(r.getLong(1))) == exp, s"range nth at $id")
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == exp, s"rows nth at $id")
      assert(r.getLong(3) == 28L, s"full nth at $id")
      assert(r.isNullAt(4), s"k>n nth at $id")
    }
    // ALL-TIED order keys: the tiebreak keeps the pick and the row
    // positions on one total order — ROWS: exactly n-k+1 rows non-null,
    // all the same member of the value set; RANGE: ONE peer group whose
    // end covers k, so EVERY row carries the constant
    val n = 4000
    (0 until n).map(i => (i.toLong, 1)).toDF("v", "c").createOrReplaceTempView("r16_nth_tie")
    val dt = spark.sql(
      """SELECT v, nth_value(v, 7) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a,
        | nth_value(v, 7) OVER (ORDER BY c) AS b
        |FROM r16_nth_tie""".stripMargin
    )
    val got = dt.collect()
    val aVals = got.filter(!_.isNullAt(1)).map(_.getLong(1)).toSeq
    assert(aVals.length == n - 6, s"rows-frame non-null count ${aVals.length}")
    assert(aVals.distinct.length == 1 && aVals.head >= 0 && aVals.head < n)
    val bVals = got.map(_.getLong(2)).toSeq
    assert(bVals.distinct.length == 1 && bVals.head == aVals.head,
      "RANGE frame must attach the SAME k-th pick to every row")
    // IGNORE NULLS keeps the stock plan
    val ig = spark.sql(
      "SELECT id, nth_value(id, 3) IGNORE NULLS OVER (ORDER BY id) AS v FROM range(10)"
    )
    assert(unwrap(ig).collect { case g: graft.plans.GlobalKthValueExec => g }.isEmpty)
  }

  test("agg OVER () constants: zero exchanges, parity incl. all-null sum, split for double sums") {
    import spark.implicits._
    val rows = (0 until 777).map(i => (i.toLong, (i % 50).toLong, if (i % 2 == 0) Some(i.toLong) else None))
    rows.toDF("i", "x", "y").createOrReplaceTempView("r16_scalar")
    val df = spark.sql(
      """SELECT i,
        | sum(x) OVER () AS sx, count(*) OVER () AS cs, count(y) OVER () AS cy,
        | min(x) OVER () AS mn, max(x) OVER () AS mx, avg(x) OVER () AS ax
        |FROM r16_scalar""".stripMargin
    )
    val exec = unwrap(df)
    // sum, count(*), count(y), min, max, avg→sum+count = 7 scalar execs
    assert(exec.collect { case g: graft.plans.GlobalScalarAggExec => g }.length == 7,
      s"all six aggregates should ride the scalar exec:\n$exec")
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"stock window survived:\n$exec")
    assert(exec.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
    }.isEmpty, s"agg OVER () should need NO exchange:\n$exec")
    val expSum = rows.map(_._2).sum
    val expCy = rows.count(_._3.isDefined).toLong
    df.collect().foreach { r =>
      assert(r.getLong(1) == expSum)
      assert(r.getLong(2) == 777L)
      assert(r.getLong(3) == expCy)
      assert(r.getLong(4) == 0L && r.getLong(5) == 49L)
      assert(math.abs(r.getDouble(6) - expSum.toDouble / 777) < 1e-9)
    }
    // all-null input: sum/min/max null, count 0
    Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("i", "z")
      .createOrReplaceTempView("r16_scalar_null")
    val dn = spark.sql(
      "SELECT i, sum(z) OVER () AS sz, count(z) OVER () AS cz, max(z) OVER () AS mz FROM r16_scalar_null"
    )
    assert(unwrap(dn).collect { case g: graft.plans.GlobalScalarAggExec => g }.length == 3)
    dn.collect().foreach { r =>
      assert(r.isNullAt(1) && r.getLong(2) == 0L && r.isNullAt(3))
    }
    // double sum keeps the stock plan (FP combine order) via the split
    val dd = spark.sql(
      "SELECT i, sum(CAST(x AS DOUBLE)) OVER () AS sd, count(*) OVER () AS c2 FROM r16_scalar"
    )
    val dexec = unwrap(dd)
    assert(dexec.collect { case g: graft.plans.GlobalScalarAggExec => g }.length == 1,
      s"count should still ride the scalar exec:\n$dexec")
    val stock = dexec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(stock.length == 1 && stock.head.windowExpression.length == 1,
      s"the double sum should keep a 1-expression stock remainder:\n$dexec")
    // explicit full frame WITH an order is the same constant
    val ff = spark.sql(
      """SELECT i, sum(x) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS s
        |FROM r16_scalar""".stripMargin
    )
    assert(unwrap(ff).collect { case g: graft.plans.GlobalScalarAggExec => g }.length == 1, s"$ff")
    ff.collect().foreach(r => assert(r.getLong(1) == expSum))
  }

  test("multiWriter upsert: two racing writers of ONE batch id — exactly one wins, loser's staging is gone") {
    import spark.implicits._
    val bss = graft.sources.BucketedStateStore
    def merge(p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =
      p.unionByName(i).groupBy("k").agg(sum("n").as("n"))
    // repeat the race a few times — interleavings vary per run
    (0 until 3).foreach { trial =>
      val root = graft.TempDirs.create(s"graft_r16_mw${trial}_")
      bss.upsert(root, 0L, Seq(("base", 1L)).toDF("k", "n"), Seq("k"), 2)(merge)
      val outcomes = new java.util.concurrent.ConcurrentHashMap[String, Option[Throwable]]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = Seq("wA", "wB").map { w =>
        new Thread(() => {
          gate.await()
          try {
            bss.upsert(root, 1L, Seq((w, 10L)).toDF("k", "n"), Seq("k"), 2,
              multiWriter = true)(merge)
            outcomes.put(w, None)
          } catch { case t: Throwable => outcomes.put(w, Some(t)) }
        })
      }
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(120000))
      val losers = Seq("wA", "wB").filter(w => outcomes.get(w).isDefined)
      val winners = Seq("wA", "wB").filterNot(losers.contains)
      assert(winners.length == 1,
        s"trial $trial: expected exactly one winner, losers=$losers " +
          losers.map(w => outcomes.get(w)).mkString("; "))
      assert(losers.forall(w => outcomes.get(w).get.isInstanceOf[java.util.ConcurrentModificationException]),
        s"trial $trial: loser must see ConcurrentModificationException, got ${losers.map(outcomes.get)}")
      // the committed state is the winner's fold, consistent and complete
      val state = bss.readLatest(spark, root).get.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(state == Map("base" -> 1L, winners.head -> 10L), s"trial $trial: $state")
      // the loser's staged version dir was cleaned up; nothing dangles
      // after a GC pass keyed on the kept manifests
      bss.gcOrphans(root, keepLast = 2)
      val state2 = bss.readLatest(spark, root).get.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(state2 == state, s"trial $trial post-GC: $state2")
    }
  }

  test("GRAFT_STATE_COMPACT_EVERY validation: malformed value names the env var") {
    // defaultCompactEvery reads the env lazily; simulate the parse path
    val ex = intercept[IllegalArgumentException] {
      val raw = "sometimes"
      val k = scala.util.Try(raw.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"GRAFT_STATE_COMPACT_EVERY must be a non-negative int (0 disables); got '$raw'"
        )
      )
      k
    }
    assert(ex.getMessage.contains("GRAFT_STATE_COMPACT_EVERY"))
  }

  test("v30 guards: hops/beam < 1 raise a meaningful error, not an NPE") {
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.v30KnnGraphSearch(spark, sf, hops = 0)
    }
    assert(e1.getMessage.contains("hops"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.v30KnnGraphSearch(spark, sf, beam = 0)
    }
    assert(e2.getMessage.contains("beam"))
  }
}
