package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 differentials: the frame-bound edge fixes (IGNORE NULLS
  * constants require the FULL frame; from-start/to-end frames must be
  * provably never-empty), the overflow-proof DECIMAL(38,0) avg sum
  * leg, the nondeterministic-child gate on the exchange-less scalar
  * agg, and the `spark.graft.windowRewrite.enabled` kill switch — plus
  * the STOCK-PARITY PROPERTY BATTERY: every first/last/nth_value ×
  * frame-shape combination is executed twice, rewrite on vs off, and
  * must match row-for-row. The battery is what keeps any future frame
  * guard honest: a rewrite that fires where stock semantics differ
  * fails here before it ships.
  */
class Round17Spec extends AnyFunSuite {
  import TestSession._

  private def unwrap(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p                                                                => p
    }

  private def withRewriteOff[T](body: => T): T = {
    spark.conf.set("spark.graft.windowRewrite.enabled", "false")
    try body
    finally spark.conf.unset("spark.graft.windowRewrite.enabled")
  }

  private lazy val parityView: Unit = {
    import spark.implicits._
    // head AND tail null runs, interior nulls, 8 partitions — the
    // shapes that distinguish empty-frame / all-null-frame semantics
    val rows = (1 to 200).map { i =>
      val x: Option[Long] =
        if (i <= 3 || i >= 198 || i % 17 == 0) None else Some(i.toLong * 3 % 97)
      (i.toLong, x)
    }
    rows.toDF("i", "x").repartition(8).createOrReplaceTempView("r17_parity")
  }

  test("stock-parity battery: first/last/nth_value x frame shapes, rewrite on vs off") {
    parityView
    val frames = Seq(
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING",
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING", // EMPTY at head
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
      "ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING",
      "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING", // EMPTY at tail
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW" // the default shape
    )
    val fns = Seq(
      "first_value(x)",
      "last_value(x)",
      "first_value(x) IGNORE NULLS",
      "last_value(x) IGNORE NULLS",
      "nth_value(x, 3)",
      // exercises the round-17 ignoreNulls GlobalKthValueExec path on
      // the full frame, stock everywhere else
      "nth_value(x, 3) IGNORE NULLS"
    )
    for (fr <- frames; fn <- fns) {
      val sql = s"SELECT i, $fn OVER (ORDER BY i $fr) AS v FROM r17_parity ORDER BY i"
      val ours = spark.sql(sql).collect()
      val stock = withRewriteOff(spark.sql(sql).collect())
      ours.zip(stock).foreach { case (a, b) =>
        assert(
          a.isNullAt(1) == b.isNullAt(1) && (a.isNullAt(1) || a.getLong(1) == b.getLong(1)),
          s"parity break: [$fn OVER ($fr)] at i=${a.getLong(0)}: ours=${a.get(1)} stock=${b.get(1)}"
        )
      }
    }
  }

  test("empty-frame shapes keep the stock plan; never-empty offset frames ride the constant exec") {
    parityView
    def firstValPlan(fr: String) =
      unwrap(spark.sql(s"SELECT i, first_value(x) OVER (ORDER BY i $fr) AS v FROM r17_parity"))
    // provably never-empty: constant exec fires
    val good = firstValPlan("ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING")
    assert(good.collect { case g: graft.plans.GlobalFirstValueExec => g }.nonEmpty, s"$good")
    // empty at head: must NOT fire
    val bad = firstValPlan("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")
    assert(bad.collect { case g: graft.plans.GlobalFirstValueExec => g }.isEmpty, s"$bad")
    // IGNORE NULLS + running frame: must NOT fire (all-null head frames)
    val ign = unwrap(spark.sql(
      "SELECT i, first_value(x) IGNORE NULLS OVER (ORDER BY i) AS v FROM r17_parity"))
    assert(ign.collect { case g: graft.plans.GlobalFirstValueExec => g }.isEmpty, s"$ign")
  }

  test("avg(long) decomposition survives sums past Long.MaxValue (decimal(38,0) leg, no throw)") {
    import spark.implicits._
    val big = Long.MaxValue / 2
    Seq((1L, big), (2L, big), (3L, big), (4L, big))
      .toDF("i", "v")
      .createOrReplaceTempView("r17_big")
    val df = spark.sql(
      "SELECT i, avg(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a " +
        "FROM r17_big ORDER BY i")
    // the decomposition must fire (prefix execs present) AND not throw
    // even though the prefix sum passes 1.5x Long.MaxValue at row 3
    assert(unwrap(df).collect { case g: graft.plans.GlobalPrefixSumExec => g }.length == 2,
      s"avg should chain sum+count prefix execs:\n${unwrap(df)}")
    val got = df.collect().map(_.getDouble(1))
    // every running avg is exactly big (all values equal) — the decimal
    // sum is exact, the one divide is of exact integers
    got.foreach(a => assert(math.abs(a - big.toDouble) / big.toDouble < 1e-15, s"avg=$a"))
    // stock parity (stock accumulates in double — tolerance, not bits)
    val stock = withRewriteOff(df.collect().map(_.getDouble(1)))
    got.zip(stock).foreach { case (a, b) =>
      assert(math.abs(a - b) / math.max(1.0, math.abs(b)) < 1e-12, s"$a vs $b")
    }
  }

  test("agg OVER () on a nondeterministic child keeps the stock plan (two-pass disagreement guard)") {
    val nd = spark.sql(
      "SELECT id, sum(v) OVER () AS t FROM (SELECT id, CAST(rand(7) * 100 AS BIGINT) AS v FROM range(1000))")
    assert(unwrap(nd).collect { case g: graft.plans.GlobalScalarAggExec => g }.isEmpty,
      s"scalar agg must not two-pass a nondeterministic child:\n${unwrap(nd)}")
    // deterministic child: still fires
    val det = spark.sql(
      "SELECT id, sum(v) OVER () AS t FROM (SELECT id, id % 100 AS v FROM range(1000))")
    assert(unwrap(det).collect { case g: graft.plans.GlobalScalarAggExec => g }.nonEmpty,
      s"deterministic child should ride the scalar exec:\n${unwrap(det)}")
  }

  test("e58 LOCF: per-user carry-forward matches an in-memory replay; window stays partitioned") {
    val df = graft.operators.Events.e58Locf(spark, TestSession.sf)
    val p = unwrap(df)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, s"no global window in a partitioned LOCF:\n$p")
    val rows = df.collect()
    // replay: per user in (us, event_id) order, carry the last non-null
    val byUser = rows.groupBy(_.getLong(1)).view.mapValues(_.sortBy(r => (r.getLong(2), r.getLong(0))))
    byUser.foreach { case (u, rs) =>
      var carry: Option[Long] = None
      rs.foreach { r =>
        if (!r.isNullAt(3)) carry = Some(r.getLong(3))
        carry match {
          case None    => assert(r.isNullAt(4), s"user $u event ${r.getLong(0)}: expected NULL before first obs")
          case Some(v) => assert(!r.isNullAt(4) && r.getLong(4) == v, s"user $u event ${r.getLong(0)}")
        }
      }
    }
    // the null pattern is real: some user's head rows are pre-observation
    assert(rows.exists(_.isNullAt(3)), "click events must null the observation")
  }

  test("t52 split leakage: counts match an in-memory recompute; leakage vanishes on deduped content") {
    val got = graft.operators.TextAnalysis.t52SplitLeakage(spark, TestSession.sf).collect()
    val docs = graft.sources.Tables
      .documents(spark, TestSession.sf)
      .selectExpr(
        "doc_id", "lang",
        "md5(array_join(array_sort(array_distinct(filter(split(text, ' '), x -> x != ''))), ' ')) AS fp",
        "substr(md5(CAST(doc_id AS STRING)), 1, 1) AS hx")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def split(hx: String) = if (hx == "c" || hx == "d") "val" else if (hx == "e" || hx == "f") "test" else "train"
    val byLang = docs.groupBy(_._2)
    got.foreach { r =>
      val lang = r.getString(0)
      val ds = byLang(lang)
      assert(r.getLong(1) == ds.count(d => split(d._4) == "train").toLong, s"$lang n_train")
      assert(r.getLong(2) == ds.count(d => split(d._4) == "val").toLong, s"$lang n_val")
      assert(r.getLong(3) == ds.count(d => split(d._4) == "test").toLong, s"$lang n_test")
      val leakedFps = ds.groupBy(_._3).filter(_._2.map(d => split(d._4)).distinct.size >= 2)
      assert(r.getLong(4) == leakedFps.size.toLong, s"$lang leaked_fps")
      assert(r.getLong(5) == leakedFps.values.map(_.size.toLong).sum, s"$lang leaked_docs")
    }
    // duplicated content IS present in the synthetic corpus, so the
    // audit has something to catch...
    assert(got.map(_.getLong(4)).sum > 0, "expected real leakage on the raw corpus")
    // ...and on fp-deduped content (one doc per fingerprint — d1/d7's
    // contract) every fp lives in exactly one split: leakage is zero
    val dedupLeaks = docs.groupBy(_._3).filter { case (_, ds) =>
      ds.sortBy(_._1).take(1).map(d => split(d._4)).distinct.size >= 2
    }
    assert(dedupLeaks.isEmpty)
  }

  test("t53 budget sample: Hamilton apportionment exactly (quota sum = budget, |quota - exact share| < 1)") {
    val rows = graft.operators.TextAnalysis.t53BudgetSample(spark, TestSession.sf).collect()
    assert(rows.length == 100, s"the full budget must be drawn, got ${rows.length}")
    val quotas = rows.map(r => (r.getString(0), r.getLong(4))).distinct.toMap
    assert(quotas.values.sum == 100L)
    // independent recompute of the exact shares
    val docs = graft.sources.Tables
      .documents(spark, TestSession.sf)
      .selectExpr("lang", "CAST(size(filter(split(text,' '), x -> x != '')) AS LONG) AS n")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val w = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val bigW = w.values.sum
    quotas.foreach { case (lang, q) =>
      val exact = 100.0 * w(lang) / bigW
      assert(math.abs(q - exact) < 1.0, s"$lang: quota $q vs exact $exact (Hamilton stays within 1)")
    }
    // within-language picks are the k smallest md5(doc_id) strings
    val hx = graft.sources.Tables
      .documents(spark, TestSession.sf)
      .selectExpr("lang", "doc_id", "md5(CAST(doc_id AS STRING)) AS hx")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.groupBy(_.getString(0)).foreach { case (lang, picked) =>
      val expect = hx.filter(_._1 == lang).sortBy(t => (t._3, t._2)).take(quotas(lang).toInt).map(_._2).toSet
      assert(picked.map(_.getLong(1)).toSet == expect, s"$lang picks")
    }
  }

  test("s41 streaming LOCF == e58 batch window, row for row (incl. NULL heads)") {
    val sf = TestSession.sf
    // both emit (event_id, user_id, us, v_obs, locf) ordered by event_id
    val stream = graft.operators.StreamingBatch.s41StreamLocf(spark, sf).collect()
    val batch = graft.operators.Events.e58Locf(spark, sf).collect()
    assert(stream.length == batch.length && stream.nonEmpty)
    stream.zip(batch).foreach { case (s1, b1) =>
      assert(s1.getLong(0) == b1.getLong(0), "event_id")
      assert(s1.getLong(1) == b1.getLong(1), s"user_id at ${s1.getLong(0)}")
      assert(s1.getLong(2) == b1.getLong(2), s"us at ${s1.getLong(0)}")
      assert(Option(s1.get(3)) == Option(b1.get(3)), s"v_obs at ${s1.getLong(0)}")
      assert(Option(s1.get(4)) == Option(b1.get(4)), s"locf at ${s1.getLong(0)}")
    }
    // the NULL-head shape is really exercised: some user's first rows
    // precede their first observation
    assert(stream.exists(_.isNullAt(4)), "at least one pre-observation NULL locf")
  }

  test("kill switch: spark.graft.windowRewrite.enabled=false keeps every stock window plan") {
    parityView
    val sql = "SELECT i, row_number() OVER (ORDER BY i) AS rn FROM r17_parity"
    assert(unwrap(spark.sql(sql)).collect { case g: graft.plans.GlobalRankExec => g }.nonEmpty)
    withRewriteOff {
      val off = unwrap(spark.sql(sql))
      assert(off.collect { case g: graft.plans.GlobalRankExec => g }.isEmpty, s"$off")
      assert(off.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.nonEmpty, s"$off")
    }
  }

  test("q77/q78 shapes: constant execs + stock remainder exactly as documented") {
    val sf = TestSession.sf
    val q77 = graft.operators.Relational.q77FrameBounds(spark, sf)
    val p77 = unwrap(q77)
    assert(p77.collect { case g: graft.plans.GlobalFirstValueExec => g }.length == 2,
      s"fv_follow+lv_precede ride the constant exec:\n$p77")
    assert(p77.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.length == 1, s"fv_gap keeps exactly one stock remainder:\n$p77")
    // head row of the (cents DESC, orderkey) order: fv_gap IS NULL there
    val head77 = q77.selectExpr("fv_gap", "cents").orderBy(org.apache.spark.sql.functions.desc("cents"),
      org.apache.spark.sql.functions.col("o_orderkey")).limit(1).collect()(0)
    assert(head77.isNullAt(0), "empty head frame must be NULL")

    val q78 = graft.operators.Relational.q78FirstNonnullRunning(spark, sf)
    val p78 = unwrap(q78)
    // Catalyst lowers explicit-frame first_value IGNORE NULLS to
    // nth_value(e, 1, ignoreNulls=true) — the full-frame twin rides
    // the (round-17 ignoreNulls-capable) k-th-value exec
    assert(p78.collect { case g: graft.plans.GlobalKthValueExec if g.ignoreNulls => g }.length == 1,
      s"only the full-frame IGNORE NULLS twin rides the exec:\n$p78")
    assert(p78.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }.length == 1, s"the running IGNORE NULLS leg keeps one stock window:\n$p78")
    val rows78 = q78.orderBy("o_date", "o_orderkey").collect()
    // running leg: NULL exactly while the prefix is all-null, constant after
    var seen: Option[Long] = None
    rows78.foreach { r =>
      if (seen.isEmpty && !r.isNullAt(2)) seen = Some(r.getLong(2))
      seen match {
        case None    => assert(r.isNullAt(3), s"orderkey ${r.getLong(0)}")
        case Some(v) => assert(!r.isNullAt(3) && r.getLong(3) == v, s"orderkey ${r.getLong(0)}")
      }
      assert(!r.isNullAt(4) && r.getLong(4) == rows78.collectFirst {
        case rr if !rr.isNullAt(2) => rr.getLong(2)
      }.get)
    }
  }
}
