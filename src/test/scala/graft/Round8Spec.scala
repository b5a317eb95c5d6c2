package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: the MvRewrite soundness corners from the round-7
  * advice — the day-boundary lift under a session-timezone change, the
  * null-faithfulness of division chains in the isnotnull lift, and true
  * supersede semantics for re-registration. Value-level MV parity stays
  * with the DuckDB oracle gate; these pin the bail paths the gate can't
  * reach (a bail produces correct-but-unrewritten plans, so only plan
  * assertions can distinguish sound from lucky).
  */
class Round8Spec extends AnyFunSuite {
  import TestSession._
  import graft.operators.Maintenance
  import graft.plans.{MvRegistry, MvRewrite}
  import graft.sources.Tables

  // ------------------------------------------------------------------
  // Day-boundary lift vs session timezone: the lift computes midnight
  // boundaries with the CURRENT session zone, so a day dim registered
  // under a different zone maps `ts >= midnight(D)` to different rows
  // than `dt >= D`. The rule must disable the lift (bail to raw scan),
  // never lift wrongly.
  // ------------------------------------------------------------------
  test("mv rewrite: day-boundary lift disabled when session timezone differs from registration") {
    val tzKey = "spark.sql.session.timeZone"
    val originalTz = spark.conf.get(tzKey)
    try {
      val dir = Maintenance.mvStore(spark, sf)
      Maintenance.registerEventsMv(spark, sf, dir) // Cast dims carry tz=UTC
      def dayFiltered() = Tables.events(spark, sf)
        .filter(col("ts").cast("date") >= lit(java.sql.Date.valueOf("2024-01-10")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      // same zone: the unwrapped midnight comparison lifts back onto the
      // summary's dt column and the rollup answers the dashboard
      val lifted = dayFiltered()
      val liftedPlan = lifted.queryExecution.executedPlan.toString
      assert(liftedPlan.contains("graft_c16") && !liftedPlan.contains("events.parquet"),
        s"day-filtered aggregate should answer from partials under the registration zone:\n$liftedPlan")
      // changed zone: midnight(2024-01-10, NY) is an intra-day instant of
      // the UTC-built dt partials — the lift MUST NOT fire
      spark.conf.set(tzKey, "America/New_York")
      val bailed = dayFiltered()
      val bailedPlan = bailed.queryExecution.executedPlan.toString
      assert(bailedPlan.contains("events.parquet") && !bailedPlan.contains("graft_c16"),
        s"day filter under a different session zone must scan raw, not lift:\n$bailedPlan")
      // and the raw-scan answer equals the registry-free answer (bail is
      // invisible to results)
      val withMv = bailed.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val noMv = dayFiltered().collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(withMv == noMv)
    } finally {
      spark.conf.set(tzKey, originalTz)
      MvRegistry.clear()
    }
  }

  // ------------------------------------------------------------------
  // isnotnull lift null-faithfulness: under ANSI-off, x div 0 is NULL
  // for non-null x, so a dim chain dividing by zero is NOT null-
  // faithful — lifting isnotnull(x) to isnotnull(dim) would drop every
  // row the raw query keeps. Division is only admitted with a provably
  // non-zero literal divisor.
  // ------------------------------------------------------------------
  test("mv rewrite: isnotnull lift rejects div-by-zero dim chains, admits non-zero literal divisors") {
    val dir = TempDirs.create("graft_r8div_")
    try {
      spark.range(200)
        .select(
          when(col("id") % 5 === 0, lit(null)).otherwise(col("id")).cast("long").as("x"),
          (col("id") % 7).cast("double").as("v"))
        .write.parquet(s"$dir/src")
      val src = spark.read.parquet(s"$dir/src")
      def summarize(dimSql: String, out: String): Unit =
        src.groupBy(expr(dimSql).as("dt"))
          .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mnv"), max("v").as("mxv"))
          .write.parquet(out)

      // div-by-zero chain (try_divide: a TRY-mode Divide, the same class
      // the whitelist admits): dim is NULL for every row, but x is
      // non-null on 4/5 of them — the lift would hand those rows' counts
      // to the dropped NULL partial. Must bail to the raw scan.
      val zeroDim = "cast(timestamp_seconds(try_divide(x, 0)) as date)"
      summarize(zeroDim, s"$dir/partials_zero")
      MvRegistry.register(spark, src, spark.read.parquet(s"$dir/partials_zero"),
        dims = Map(zeroDim -> "dt"), measure = "v")
      val qZero = src.filter(col("x").isNotNull)
        .groupBy(expr(zeroDim).as("dt")).agg(count(lit(1)).as("n"))
      val zeroPlan = qZero.queryExecution.executedPlan.toString
      assert(zeroPlan.contains("src") && !zeroPlan.contains("partials_zero"),
        s"isnotnull over a div-by-zero dim chain must not lift:\n$zeroPlan")
      // value sanity: one NULL-dt group carrying the 160 non-null xs
      val zeroRows = qZero.collect()
      assert(zeroRows.length == 1 && zeroRows.head.isNullAt(0) && zeroRows.head.getLong(1) == 160L)

      // non-zero literal divisor: null in ⇔ null out holds, the lift is
      // sound and the rollup answers the filtered aggregate
      MvRegistry.clear()
      val okDim = "cast(timestamp_seconds(x div 2) as date)"
      summarize(okDim, s"$dir/partials_ok")
      MvRegistry.register(spark, src, spark.read.parquet(s"$dir/partials_ok"),
        dims = Map(okDim -> "dt"), measure = "v")
      val qOk = src.filter(col("x").isNotNull)
        .groupBy(expr(okDim).as("dt")).agg(count(lit(1)).as("n"))
      val okPlan = qOk.queryExecution.executedPlan.toString
      assert(okPlan.contains("partials_ok") && !okPlan.contains("src"),
        s"isnotnull over a non-zero-literal division chain should lift:\n$okPlan")
      val got = qOk.collect().map(r => Option(r.getDate(0)).map(_.toString) -> r.getLong(1)).toMap
      MvRegistry.clear()
      val raw = src.filter(col("x").isNotNull)
        .groupBy(expr(okDim).as("dt")).agg(count(lit(1)).as("n"))
        .collect().map(r => Option(r.getDate(0)).map(_.toString) -> r.getLong(1)).toMap
      assert(got == raw)
    } finally MvRegistry.clear()
  }

  // ------------------------------------------------------------------
  // Star-join rewrite (c16f): an inner join ON a registered dim
  // commutes with the pre-grouping, so the summary replaces the fact
  // scan INSIDE the join; a join on a non-dim fact key, or an
  // aggregate argument from the dim side, must bail to the raw scan.
  // ------------------------------------------------------------------
  test("mv rewrite through star join: dim-key join lifts, non-dim key and dim-side measures bail") {
    import spark.implicits._
    try {
      val dir = Maintenance.mvStore(spark, sf)
      Maintenance.registerEventsMv(spark, sf, dir)
      val dim = Seq(("click", "engagement", 1.5), ("purchase", "revenue", 9.0))
        .toDF("etype", "category", "weight")
      val events = Tables.events(spark, sf)

      // join on the registered dim, group by the dim table's attribute
      val starQ = events.join(broadcast(dim), col("event_type") === col("etype"))
        .groupBy("category")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      val starPlan = starQ.queryExecution.executedPlan.toString
      assert(starPlan.contains("graft_c16") && !starPlan.contains("events.parquet"),
        s"star join on a registered dim should answer from partials:\n$starPlan")
      // and values equal the registry-free run
      val got = starQ.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val raw = starQ.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == raw)

      // join key NOT a registered dim (user_id): partials can't re-join
      Maintenance.registerEventsMv(spark, sf, dir)
      val userDim = Seq((1L, "vip"), (2L, "basic")).toDF("uid", "tier")
      val badKey = events.join(broadcast(userDim), col("user_id") === col("uid"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"))
      val badKeyPlan = badKey.queryExecution.executedPlan.toString
      assert(badKeyPlan.contains("events.parquet") && !badKeyPlan.contains("graft_c16"),
        s"join on a non-dim fact key must scan raw:\n$badKeyPlan")

      // dim-side aggregate argument (c16g): no weight partials exist,
      // but weight is group-constant, so sum(weight) rewrites to
      // sum(weight × n) over the joined summary — with value parity
      val dimMeasure = events.join(broadcast(dim), col("event_type") === col("etype"))
        .groupBy("category")
        .agg(round(sum("weight"), 2).as("sum_weight"), round(min("weight"), 2).as("min_weight"))
      val dimMeasurePlan = dimMeasure.queryExecution.executedPlan.toString
      assert(dimMeasurePlan.contains("graft_c16") && !dimMeasurePlan.contains("events.parquet"),
        s"group-constant dim measure should answer from partials:\n$dimMeasurePlan")
      val gotW = dimMeasure.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val rawW = dimMeasure.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(gotW == rawW)
      Maintenance.registerEventsMv(spark, sf, dir)

      // avg of a dim-side column has no group-constant substitution
      // implemented — must bail to the raw scan
      val dimAvg = events.join(broadcast(dim), col("event_type") === col("etype"))
        .groupBy("category")
        .agg(round(avg("weight"), 4).as("avg_weight"))
      val dimAvgPlan = dimAvg.queryExecution.executedPlan.toString
      assert(dimAvgPlan.contains("events.parquet") && !dimAvgPlan.contains("graft_c16"),
        s"dim-side avg must scan raw:\n$dimAvgPlan")

      // dim-side FILTER above the join is fine: partials still answer,
      // with the filter kept above the rebuilt join
      val filtered = events.join(broadcast(dim), col("event_type") === col("etype"))
        .filter(col("weight") > 2.0)
        .groupBy("category")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      val filteredPlan = filtered.queryExecution.executedPlan.toString
      assert(filteredPlan.contains("graft_c16") && !filteredPlan.contains("events.parquet"),
        s"dim-side filter should not block the star rewrite:\n$filteredPlan")
      val gotF = filtered.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val rawF = filtered.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(gotF == rawF)
    } finally MvRegistry.clear()
  }

  // ------------------------------------------------------------------
  // Stats-driven planning (c19): the SAME physical tables planned under
  // truthful and falsified catalogs, with Spark's own auto-broadcast
  // sizing disabled — the join strategy must follow the CATALOG
  // (truthful small dim → broadcast; falsified-huge → shuffle;
  // falsified-skewed probe → salted), with value parity throughout.
  // ------------------------------------------------------------------
  test("stats-driven join: catalog flips broadcast / shuffle / salt, values invariant") {
    import graft.plans.StatsPlanner
    import graft.plans.StatsPlanner.{KeyStats, TableStats}
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val aabtKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val abt = spark.conf.get(abtKey)
    val aabt = spark.conf.getOption(aabtKey)
    try {
      spark.conf.set(abtKey, "-1")
      spark.conf.set(aabtKey, "-1")
      val supplier = Tables.supplier(spark, sf).select("s_nationkey", "s_acctbal")
      val nation = Tables.nation(spark, sf)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      val truth = Map(
        "supplier" -> StatsPlanner.analyze(supplier, Seq("s_nationkey")),
        "nation" -> StatsPlanner.analyze(nation, Seq("s_nationkey")))
      def join(cat: Map[String, TableStats]) =
        StatsPlanner.statsJoin(supplier, "supplier", nation, "nation", "s_nationkey", cat)
      def planOf(cat: Map[String, TableStats]) = join(cat).queryExecution.executedPlan.toString

      // truthful: nation is a few kB by its stored estimate → broadcast,
      // even though Spark's own sizing is disabled
      val pTruth = planOf(truth)
      assert(pTruth.contains("BroadcastHashJoin"), pTruth)

      // falsified sizes: both sides claimed GiB-scale → plain shuffle join
      val bigNation = truth("nation").copy(estBytes = 1L << 30)
      val bigSupplier = truth("supplier").copy(estBytes = 2L << 30)
      val bigCat = Map("supplier" -> bigSupplier, "nation" -> bigNation)
      val pBig = planOf(bigCat)
      assert(!pBig.contains("BroadcastHashJoin") && !pBig.contains("_salt"), pBig)

      // falsified skew: the probe side's stored top-key frequency claims
      // one nationkey dominates → deterministic salting kicks in
      val skewCat = Map(
        "supplier" -> bigSupplier.copy(keys =
          Map("s_nationkey" -> KeyStats(ndv = 25, topKey = "7", topFreq = bigSupplier.nRows))),
        "nation" -> bigNation)
      val pSkew = planOf(skewCat)
      assert(pSkew.contains("_salt"), pSkew)

      // the catalog moves the plan, never the values
      def vals(cat: Map[String, TableStats]) = join(cat)
        .groupBy("n_name").agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = vals(truth)
      assert(vals(bigCat) == expected && vals(skewCat) == expected)
    } finally {
      spark.conf.set(abtKey, abt)
      aabt match {
        case Some(v) => spark.conf.set(aabtKey, v)
        case None    => spark.conf.unset(aabtKey)
      }
    }
  }

  // ------------------------------------------------------------------
  // Transparent stats broadcast: with BOTH sides' stats registered by
  // root path, a plain join (no hint, Spark sizing off) gets the
  // broadcast hint from the catalog; unregistered or falsified-huge
  // catalogs leave the shuffle join. The MvRewrite registration
  // pattern applied to CBO pricing.
  // ------------------------------------------------------------------
  test("transparent stats broadcast rule follows the registered catalog") {
    import graft.plans.StatsPlanner
    import graft.plans.StatsPlanner.StatsRegistry
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val aabtKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val abt = spark.conf.get(abtKey)
    val aabt = spark.conf.getOption(aabtKey)
    try {
      spark.conf.set(abtKey, "-1")
      spark.conf.set(aabtKey, "-1")
      graft.plans.GraftExtensions.register(spark) // idempotent
      val supplier = Tables.supplier(spark, sf).select("s_nationkey", "s_acctbal")
      val nation = Tables.nation(spark, sf)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      def plan() = supplier.join(nation, Seq("s_nationkey"))
        .queryExecution.executedPlan.toString

      StatsRegistry.clear()
      val pNone = plan()
      assert(!pNone.contains("BroadcastHashJoin"), pNone)

      val supStats = StatsPlanner.analyze(supplier, Seq("s_nationkey"))
      val natStats = StatsPlanner.analyze(nation, Seq("s_nationkey"))
      StatsRegistry.register(Tables.supplier(spark, sf), supStats)
      StatsRegistry.register(Tables.nation(spark, sf), natStats)
      val pReg = plan()
      assert(pReg.contains("BroadcastHashJoin"), pReg)

      // falsified: both sides claimed huge -> hint withheld
      StatsRegistry.register(Tables.nation(spark, sf), natStats.copy(estBytes = 1L << 30))
      StatsRegistry.register(Tables.supplier(spark, sf), supStats.copy(estBytes = 2L << 30))
      val pBig = plan()
      assert(!pBig.contains("BroadcastHashJoin"), pBig)

      // an explicit user hint always wins over the catalog
      StatsRegistry.register(Tables.nation(spark, sf), natStats)
      StatsRegistry.register(Tables.supplier(spark, sf), supStats)
      val pUser = supplier.join(nation.hint("shuffle_merge"), Seq("s_nationkey"))
        .queryExecution.executedPlan.toString
      assert(!pUser.contains("BroadcastHashJoin"), pUser)
    } finally {
      StatsRegistry.clear()
      spark.conf.set(abtKey, abt)
      aabt match {
        case Some(v) => spark.conf.set(aabtKey, v)
        case None    => spark.conf.unset(aabtKey)
      }
    }
  }

  // ------------------------------------------------------------------
  // DISTINCT-over-dims and fact-preserved OUTER joins: the two round-8
  // algebra extensions the oracle gate can't plan-distinguish. A
  // distinct on a measure must still bail; a dim-preserved outer join
  // (dim LEFT OUTER fact) must bail — its null-extended dim rows are
  // invisible to the n-weighted summary algebra.
  // ------------------------------------------------------------------
  test("mv rewrite: distinct-over-dims lifts, distinct-over-measure bails; outer joins only fact-preserved") {
    import spark.implicits._
    try {
      val dir = Maintenance.mvStore(spark, sf)
      Maintenance.registerEventsMv(spark, sf, dir)
      val events = Tables.events(spark, sf)

      // count(distinct day) answered by a distinct over summary dt
      val q = events.groupBy("event_type")
        .agg(countDistinct(col("ts").cast("date")).as("n_days"), count(lit(1)).as("n"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("graft_c16") && !p.contains("events.parquet"), p)
      val got = q.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      MvRegistry.clear()
      val raw = q.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == raw)

      // distinct over a real measure: no partials can answer it
      Maintenance.registerEventsMv(spark, sf, dir)
      val qBad = events.groupBy("event_type").agg(countDistinct(col("value")).as("nv"))
      val pBad = qBad.queryExecution.executedPlan.toString
      assert(pBad.contains("events.parquet") && !pBad.contains("graft_c16"), pBad)

      // fact-preserved LEFT OUTER join lifts (fact LEFT OUTER dim)...
      val dim = Seq(("click", "engagement"), ("purchase", "revenue")).toDF("etype", "category")
      val qOuter = events.join(broadcast(dim), col("event_type") === col("etype"), "left_outer")
        .groupBy("category")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      val pOuter = qOuter.queryExecution.executedPlan.toString
      assert(pOuter.contains("graft_c16") && !pOuter.contains("events.parquet"), pOuter)
      val gotO = qOuter.collect()
        .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val rawO = qOuter.collect()
        .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(gotO == rawO)

      // ...and a dim-preserved outer join (dim LEFT OUTER fact) bails
      Maintenance.registerEventsMv(spark, sf, dir)
      val qDimOuter = dim.join(events, col("etype") === col("event_type"), "left_outer")
        .groupBy("category")
        .agg(count(lit(1)).as("n"))
      val pDimOuter = qDimOuter.queryExecution.executedPlan.toString
      assert(pDimOuter.contains("events.parquet") && !pDimOuter.contains("graft_c16"), pDimOuter)

      // semi join on the dim key lifts too
      Maintenance.registerEventsMv(spark, sf, dir)
      val qSemi = events.join(broadcast(dim), col("event_type") === col("etype"), "left_semi")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      val pSemi = qSemi.queryExecution.executedPlan.toString
      assert(pSemi.contains("graft_c16") && !pSemi.contains("events.parquet"), pSemi)
      val gotS = qSemi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      MvRegistry.clear()
      val rawS = qSemi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotS == rawS)
    } finally MvRegistry.clear()
  }

  // ------------------------------------------------------------------
  // v2 LSH recall at BENCH scale (sf0.1): the recall=1.0 measurement
  // lived at sf0.01 — a 10× corpus packs each LSH bucket 10× denser,
  // so this pins that multiprobe quality scales with the corpus (the
  // brute side broadcasts 10 query vectors; cheap at any SF).
  // ------------------------------------------------------------------
  test("v2 LSH recall@5 >= 0.9 at sf0.1") {
    import graft.operators.Similarity
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sf01/embeddings.parquet").exists)
    val exact = Similarity.v1KnnBrute(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.v2KnnLsh(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 at sf0.1 = $recall")
  }

  // ------------------------------------------------------------------
  // Registration supersede: re-registering the SAME dim set replaces
  // the prior def (no unbounded accumulation, no stale summary path
  // reachable); a DIFFERENT dim set still accumulates (the lattice).
  // ------------------------------------------------------------------
  test("mv registry: equal-dims re-registration supersedes; different dims accumulate") {
    val dir = TempDirs.create("graft_r8reg_")
    try {
      val events = Tables.events(spark, sf)
      val Some((lr, _, _)) = MvRewrite.baseOf(events.queryExecution.analyzed)
      val paths = MvRewrite.sourcePaths(lr)
      def buildTypeRollup(out: String): Unit =
        events.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("value").as("sv"),
            min("value").as("mnv"), max("value").as("mxv"))
          .write.parquet(out)
      buildTypeRollup(s"$dir/gen1")
      MvRegistry.register(spark, events, spark.read.parquet(s"$dir/gen1"),
        dims = Map("event_type" -> "event_type"), measure = "value")
      assert(MvRegistry.lookup(paths).size == 1)
      // same dims again → still exactly one def, and it is the NEW one
      buildTypeRollup(s"$dir/gen2")
      MvRegistry.register(spark, events, spark.read.parquet(s"$dir/gen2"),
        dims = Map("event_type" -> "event_type"), measure = "value")
      assert(MvRegistry.lookup(paths).size == 1,
        "equal-dims re-registration must supersede, not accumulate")
      val q = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("gen2") && !plan.contains("gen1"),
        s"superseded summary must be unreachable:\n$plan")
      // a different dim set joins the lattice instead of superseding
      Maintenance.registerEventsMv(spark, sf, Maintenance.mvStore(spark, sf)) // (type, day)
      assert(MvRegistry.lookup(paths).size == 2)
    } finally MvRegistry.clear()
  }

  // ------------------------------------------------------------------
  // d16 exact-substring dedup: the whole distributed pipeline (gram
  // anchoring → cross-doc vocabulary → interval merge) must reproduce
  // an independent single-threaded reference implementation exactly.
  // The DuckDB oracle re-runs the same SQL shape; this recompute shares
  // NO code or query structure with the operator.
  // ------------------------------------------------------------------
  test("d16 substring spans equal an independent driver-side recompute") {
    val k = 8
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .sortBy(_._1)
    val gramDocs = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    for ((id, toks) <- docs; i <- 0 to toks.length - k)
      gramDocs.getOrElseUpdate(toks.slice(i, i + k).mkString(" "), scala.collection.mutable.Set.empty) += id
    val expected = docs.flatMap { case (id, toks) =>
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      for (i <- 0 to toks.length - k
           if gramDocs(toks.slice(i, i + k).mkString(" ")).size >= 2) {
        val (s0, e0) = (i.toLong, (i + k - 1).toLong)
        if (spans.nonEmpty && s0 <= spans.last._2 + 1)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e0))
        else spans += ((s0, e0))
      }
      spans.map { case (a, b) => (id, a, b, b - a + 1) }
    }
    val got = graft.operators.Dedup.d16SubstringDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty, "fixture should contain duplicated spans")
    assert(got == expected.toSeq)
  }

  // ------------------------------------------------------------------
  // t24 BM25: distributed scoring + rounded-rank selection must equal a
  // from-scratch in-memory BM25 (same k1/b/idf definitions).
  // ------------------------------------------------------------------
  test("t24 BM25 top-15 equals an independent driver-side recompute") {
    val q = Seq("spark", "join", "window")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val n = docs.length.toDouble
    val lens = docs.map { case (id, t) => id -> t.length }.toMap
    val withToks = lens.values.count(_ > 0)
    val avgdl = lens.values.filter(_ > 0).map(_.toLong).sum.toDouble / withToks
    val df = q.map(t => t -> docs.count(_._2.contains(t))).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val s = q.map { t =>
        val tc = toks.count(_ == t).toDouble
        if (tc == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1) * (tc * 2.2) /
          (tc + 1.2 * (1 - 0.75 + 0.75 * lens(id) / avgdl))
      }.sum
      if (s > 0) Some(id -> math.round(s * 1e6) / 1e6) else None
    }.sortBy { case (id, s) => (-s, id) }.take(15)
    val got = graft.operators.TextAnalysis.t24Bm25(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == expected.toSeq)
  }

  // ------------------------------------------------------------------
  // s19: the stream-maintained rollup must be what ANSWERS the star
  // dashboard (fact scan replaced by the foreachBatch-built summary),
  // with values equal to the registry-free raw recompute.
  // ------------------------------------------------------------------
  test("s19: stream-built rollup answers the star dashboard through the join rewrite") {
    import spark.implicits._
    try {
      val dashboard = graft.operators.StreamingBatch.s19StreamStarMv(spark, sf)
      val plan = dashboard.queryExecution.executedPlan.toString
      assert(plan.contains("state_v") && !plan.contains("events.parquet"),
        s"star dashboard should answer from the stream-built rollup:\n$plan")
      val got = dashboard.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      MvRegistry.clear()
      val dim = Seq(
        ("click", "engagement"), ("view", "engagement"),
        ("signup", "acquisition"), ("purchase", "revenue"), ("error", "ops")
      ).toDF("etype", "category")
      val raw = Tables.events(spark, sf)
        .join(broadcast(dim), col("event_type") === col("etype"))
        .groupBy("category")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == raw)
    } finally MvRegistry.clear()
  }

  // ------------------------------------------------------------------
  // c20 expectation suite: every metric must equal an independent
  // driver-side recompute over the collected fixture, and the suite
  // must actually FAIL a violated expectation (the fixture's composite
  // key is genuinely non-unique) — a suite that always passes tests
  // nothing.
  // ------------------------------------------------------------------
  test("c20 expectations equal a driver-side recompute and catch the real PK violation") {
    val l = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_discount", "l_returnflag")
      .collect()
    val n = l.length.toDouble
    val pkD = l.map(r => (r.getLong(0), r.getInt(1))).distinct.length / n
    val discOk = l.count(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) / n
    val rfOk = l.count(r => Set("A", "N", "R")(r.getString(5))) / n
    val shipNn = l.count(!_.isNullAt(2)) / n
    val minQty = math.round(l.map(_.getDouble(3)).min * 100) / 100.0
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val got = Maintenance.c20Expectations(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got("lineitem_pk_uniqueness") == ((r6(pkD), pkD == 1.0)))
    assert(!got("lineitem_pk_uniqueness")._2, "fixture's composite key is non-unique; suite must flag it")
    assert(got("lineitem_discount_in_unit_range") == ((r6(discOk), discOk == 1.0)))
    assert(got("lineitem_returnflag_accepted") == ((r6(rfOk), rfOk == 1.0)))
    assert(got("lineitem_shipdate_completeness") == ((r6(shipNn), shipNn == 1.0)))
    assert(got("lineitem_quantity_min_nonneg") == ((minQty, minQty >= 0.0)))
  }

  // ------------------------------------------------------------------
  // t25 perplexity gate: scores and terciles must equal an independent
  // in-memory bigram-LM recompute (same decimal quantization, same
  // ntile semantics), and the keep rule must drop exactly the tail.
  // ------------------------------------------------------------------
  test("t25 perplexity terciles equal an independent driver-side bigram-LM recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
    val bigrams = docs.flatMap { case (id, lang, tk) =>
      tk.sliding(2).filter(_.length == 2).map(p => (id, lang, p(0) + " " + p(1)))
    }
    val c2 = bigrams.groupBy(_._3).map { case (g, v) => g -> v.length }
    val c1 = bigrams.groupBy(_._3.split(" ")(0)).map { case (w, v) => w -> v.length }
    val scored = bigrams.groupBy(b => (b._1, b._2)).map { case ((id, lang), bs) =>
      val slp = bs.map { b =>
        BigDecimal(math.round(math.log(c2(b._3).toDouble / c1(b._3.split(" ")(0))) * 1e9))./(BigDecimal(1e9))
      }.sum
      (id, lang, bs.length.toLong, math.round(slp.toDouble / bs.length * 1e6) / 1e6)
    }.toSeq
    val expected = scored.groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy { case (id, _, _, s) => (-s, id) }
      val n = sorted.length
      val (base, extra) = (n / 3, n % 3)
      sorted.zipWithIndex.map { case ((id, lang, nb, s), i) =>
        val tercile = // ntile: first `extra` buckets get base+1 rows
          if (i < (base + 1) * extra) i / (base + 1) + 1
          else extra + (i - (base + 1) * extra) / base + 1
        (id, lang, nb, s, tercile.toLong, tercile <= 2)
      }
    }.toSeq.sortBy(_._1)
    val got = graft.operators.TextAnalysis.t25PerplexityFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    assert(got.exists(!_._6) && got.count(_._6) > got.length / 2)
  }

  // ------------------------------------------------------------------
  // d17 SemDeDup: assignment + within-cluster dup decisions must equal
  // an independent recompute, the pair join must be a cluster equi-join
  // (no Cartesian/BNLJ node), and some semantic dups must exist.
  // ------------------------------------------------------------------
  test("d17 semdedup equals an independent recompute; pair stage is an equi-join") {
    val df = graft.operators.Dedup.d17SemDedup(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"within-cluster pairs must come from the cluster equi-join:\n$plan")
    val e = Tables.embeddings(spark, sf).select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val dim = e.head._3.length
    val cen = e.groupBy(_._2).map { case (lbl, vs) =>
      lbl -> Array.tabulate(dim) { i =>
        math.round(vs.map(_._3(i).toDouble).sum / vs.length * 1e4) / 1e4
      }
    }
    val assign = e.map { case (id, _, v) =>
      val dists = cen.toSeq.map { case (lbl, c) =>
        val d0 = (0 until dim).map { i =>
          val sq = (v(i).toDouble - c(i)) * (v(i).toDouble - c(i))
          BigDecimal(math.round(sq * 1e10)) / BigDecimal(1e10)
        }.sum
        (d0, lbl)
      }
      id -> dists.minBy { case (d0, lbl) => (d0, lbl) }._2.toLong
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d0, na, nb) = (0.0, 0.0, 0.0)
      for (i <- 0 until dim) {
        d0 += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = e.map(x => x._1 -> x._3).toMap
    val dup = (for {
      (ia, _, _) <- e; (ib, _, _) <- e
      if ia < ib && assign(ia) == assign(ib) && cos(byId(ia), byId(ib)) >= 0.4
    } yield ib).toSet
    val expected = e.map(_._1).sorted.map(id => (id, assign(id), !dup(id)))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected.toSeq)
    assert(dup.nonEmpty, "fixture should contain semantic duplicates")
  }

  // ------------------------------------------------------------------
  // p5 chain wiring: value parity is the full-chain DuckDB oracle; this
  // pins the composition semantics — the survivor set is exactly
  // (t25-keep minus semantic drops among survivors), span trimming is
  // computed over survivors only (never more removal than the global
  // d16 restricted to the same docs), and the trim actually fires.
  // ------------------------------------------------------------------
  test("p5: survivor set composes the staged decisions; spans trim survivors only") {
    import graft.operators.{Curate, Dedup, TextAnalysis}
    val p5 = Curate.p5CurateLlm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val kept1 = TextAnalysis.t25PerplexityFilter(spark, sf)
      .filter(col("keep")).select("doc_id")
    val members = Dedup.semDedupMembers(spark, sf)
      .join(kept1.withColumnRenamed("doc_id", "vec_id"), "vec_id")
    val drops = Dedup.semDedupDrops(members, 0.4).collect().map(_.getLong(0)).toSet
    val expectedIds = kept1.collect().map(_.getLong(0)).filterNot(drops).sorted
    assert(p5.map(_._1).toSeq == expectedIds.toSeq)
    assert(p5.forall { case (_, n, rem, kept) => kept == n - rem && rem >= 0 && kept >= 0 })
    assert(p5.exists(_._3 > 0), "fixture should contain trimmable duplicated spans")
    // survivor-scoped spans can only shrink vs the global span set
    val globalRemoved = Dedup.d16SubstringDedup(spark, sf).groupBy("doc_id")
      .agg(sum("span_tokens").as("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p5.forall { case (id, _, rem, _) => rem <= globalRemoved.getOrElse(id, 0L) })
  }

  // ------------------------------------------------------------------
  // s20 ≡ d17: the stream-built pair index must reproduce the batch
  // SemDeDup table row for row — the point of the order-insensitive
  // pair design (a similar pair is recorded whichever side arrives
  // first, so keep decisions can't depend on batch boundaries).
  // ------------------------------------------------------------------
  // ------------------------------------------------------------------
  // v11 MMR: the greedy diversified selection must equal an independent
  // driver-side recompute (same λ, same rounding-before-argmax, same
  // tiebreak) — the oracle replays it in SQL, this replays it in plain
  // Scala with no shared code.
  // ------------------------------------------------------------------
  test("v11 MMR selection equals an independent greedy recompute") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val qe = e.find(_._1 == 0L).get._2
    val qn = math.sqrt(dot(qe, qe))
    val cands = e.filter(_._1 != 0L).map { case (id, v) =>
      (id, v, dot(v, qe) / (math.sqrt(dot(v, v)) * qn))
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    var sel = Vector.empty[(Long, Double, Array[Float])]
    for (_ <- 1 to 5) {
      val scored = cands.filter(c => !sel.exists(_._1 == c._1)).map { case (id, v, rel) =>
        val mx =
          if (sel.isEmpty) 0.0
          else sel.map(s => dot(v, s._3) / (math.sqrt(dot(v, v)) * math.sqrt(dot(s._3, s._3)))).max
        (id, r6(0.5 * rel - 0.5 * mx), v)
      }
      sel :+= scored.minBy { case (id, sc, _) => (-sc, id) }
    }
    val expected = sel.zipWithIndex.map { case ((id, sc, _), i) => (i + 1L, id, sc) }
    val got = graft.operators.Similarity.v11Mmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    assert(got.map(_._2).distinct.length == 5)
  }

  // ------------------------------------------------------------------
  // c21 schema evolution: the landed generations must genuinely differ
  // in schema (narrow float / no channel vs wide double + channel), and
  // the evolved dashboard must equal a driver recompute that replays
  // the float round-trip and decimal quantization.
  // ------------------------------------------------------------------
  test("c21 evolved read equals a recompute replaying the float round-trip") {
    val ev = Tables.events(spark, sf)
      .select(col("ts").cast("date").as("dt"), col("event_type"), col("value"), col("user_id"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getDouble(2), r.getLong(3)))
    val pivot = ev.map(_._1).min.plusDays(15)
    def q2(vs: Seq[Double]): Double = {
      val s = vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      s.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val g1 = ev.filter(_._1.isBefore(pivot)).groupBy(_._2).map { case (t, rows) =>
      (1L, t, rows.length.toLong, q2(rows.toSeq.map(r => r._3.toFloat.toDouble)), 0L)
    }
    val g2 = ev.filter(r => !r._1.isBefore(pivot)).groupBy(_._2).map { case (t, rows) =>
      (2L, t, rows.length.toLong, q2(rows.toSeq.map(_._3)), rows.length.toLong)
    }
    val expected = (g1 ++ g2).toSeq.sortBy(r => (r._1, r._2))
    val got = Maintenance.c21SchemaEvolution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(g1.nonEmpty && g2.nonEmpty, "pivot must split the fixture into two generations")
  }

  // ------------------------------------------------------------------
  // t26 naive Bayes: predictions must equal an independent in-memory
  // NB (same Laplace smoothing, same decimal quantization, same exact-
  // decimal argmax), and the classifier must beat the random baseline.
  // ------------------------------------------------------------------
  test("t26 NB predictions equal an independent recompute and beat chance") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
    val classes = docs.map(_._2).distinct.sorted
    val cc = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for ((_, src, toks) <- docs; w <- toks) cc((src, w)) += 1
    val tknC = classes.map(c => c -> cc.collect { case ((s2, _), n) if s2 == c => n }.sum).toMap
    val vSize = cc.keys.map(_._2).toSet.size
    val nC = docs.groupBy(_._2).map { case (c, v) => c -> v.length }
    def lnq(x: Double) = BigDecimal(math.round(math.log(x) * 1e9)) / BigDecimal(1e9)
    val expected = docs.sortBy(_._1).map { case (id, src, toks) =>
      val counts = toks.groupBy(identity).map { case (w, v) => w -> v.length }
      val scores = classes.map { c =>
        val sw = counts.map { case (w, cnt) =>
          BigDecimal(cnt) * lnq((cc((c, w)) + 1).toDouble / (tknC(c) + vSize))
        }.sum
        c -> (sw + lnq(nC(c).toDouble / docs.length))
      }
      val (pred, score) = scores.minBy { case (c, s2) => (-s2, c) }
      (id, src, pred, math.round(score.toDouble * 1e6) / 1e6, pred == src)
    }
    val got = graft.operators.TextAnalysis.t26DomainNb(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected.toSeq)
    val acc = got.count(_._5).toDouble / got.length
    assert(acc > 1.5 / classes.length, s"accuracy $acc should beat the ${1.0 / classes.length} random baseline")
  }

  test("s20 streaming semdedup table equals batch d17 row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val streamed = rows(graft.operators.StreamingBatch.s20StreamSemDedup(spark, sf))
    val batch = rows(graft.operators.Dedup.d17SemDedup(spark, sf))
    assert(streamed == batch)
    assert(streamed.exists(!_._3), "fixture should contain semantic duplicates")
  }

  // ------------------------------------------------------------------
  // m9: the JDK RIFF/WAVE parse must return exactly the encoded int16
  // samples (PCM is lossless). The oracle gate hash-checks the same
  // equality; this pins it in-suite with an independent driver-side
  // replay of the generating arithmetic.
  // ------------------------------------------------------------------
  test("m9 WAV decode equals the generating arithmetic (real RIFF parse)") {
    val got = graft.operators.Multimodal.m9WavDecode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got.nonEmpty)
    val expected = got.map(_._1).map { id =>
      val n = 64 + (id % 41).toInt
      val vs = Array.tabulate(n)(i => ((id * 31 + i.toLong * i * 7919) % 65536) - 32768)
      (id, 8000, n.toLong, vs.sum, vs.map(math.abs).max, vs.map(v => v * v).sum)
    }
    assert(got == expected)
  }

  // ------------------------------------------------------------------
  // v12: hybrid filtered kNN — every neighbor satisfies the metadata
  // predicate, the predicate reaches the parquet scan (the 100 TB
  // pruning claim), and ranks equal an independent driver-side brute
  // recompute over the filtered corpus.
  // ------------------------------------------------------------------
  test("v12 filtered knn: predicate pushed to scan, neighbors filtered, ranks exact") {
    val df = graft.operators.Similarity.v12FilteredKnn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(label,5)"), s"label range predicate should be pushed:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val embs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val labels = embs.map(e => e._1 -> e._3).toMap
    assert(got.nonEmpty && got.forall { case (_, _, cid) => labels(cid) < 5 })
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val expected = embs.filter(_._1 < 10).sortBy(_._1).flatMap { case (qid, qe, _) =>
      val qn = math.sqrt(dot(qe, qe))
      embs
        .filter(e => e._3 < 5 && e._1 != qid)
        .map(e => (e._1, dot(qe, e._2) / (qn * math.sqrt(dot(e._2, e._2)))))
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(5)
        .zipWithIndex
        .map { case ((cid, _), i) => (qid, i + 1, cid) }
    }.toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------------------
  // d18: the regex canonicalizer must agree with an independent
  // character-level normalizer on every raw URL, and the fixture must
  // genuinely mix surface variants inside each canonical group (else
  // the cross-variant collapse — the point of the operator — is
  // untested).
  // ------------------------------------------------------------------
  test("d18 url dedup: canonicalizer equals independent recompute; groups mix variants") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def rawUrl(id: Long): String = {
      val host = s"src${id % 20}.example.com"
      val path = s"/page/${id % 60}"
      (id / 20) % 4 match {
        case 0 => s"https://$host$path"
        case 1 => s"HTTPS://${host.toUpperCase}$path/"
        case 2 => s"https://www.$host$path?utm_source=feed&utm_campaign=x"
        case _ => s"https://$host:443$path#sec-2"
      }
    }
    // independent canonicalizer: java.net.URI parse, not regex
    def canon(raw: String): String = {
      val u = new java.net.URI(raw)
      val scheme = u.getScheme.toLowerCase
      val host = u.getHost.toLowerCase.stripPrefix("www.")
      val port = if (u.getPort == 443 && scheme == "https" || u.getPort == -1) "" else s":${u.getPort}"
      val path = u.getPath.stripSuffix("/")
      val query = Option(u.getQuery)
        .map(_.split("&").filterNot(_.startsWith("utm_")).mkString("&"))
        .filter(_.nonEmpty)
        .map("?" + _)
        .getOrElse("")
      s"$scheme://$host$port$path$query"
    }
    val byCanon = docs.groupBy { case (id, _) => canon(rawUrl(id)) }
    // every group spans more than one raw surface form
    assert(byCanon.values.forall(g => g.map { case (id, _) => rawUrl(id) }.distinct.length > 1))
    val expected = byCanon.toSeq.map { case (c, g) =>
      val keep = g.minBy { case (id, nc) => (-nc, id) }
      (c, keep._1, g.length.toLong, g.map(_._2).max)
    }.sortBy(_._1)
    val got = graft.operators.Dedup.d18UrlDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------------------
  // s21: the value-level drop semantics are the oracle gate's job; this
  // spec pins what the gate can't see — that rows were discarded by the
  // WATERMARK STATE (the engine's own counter), not filtered upstream,
  // and that the drop volume brackets the planted lateness schedule
  // (every one-batch-late straggler survives, only two-batch-late ones
  // can drop).
  // ------------------------------------------------------------------
  test("s21: late rows genuinely dropped by watermark state, one-batch-late rows survive") {
    val out = graft.operators.StreamingBatch.s21LateDataAudit(spark, sf)
    val kept = out.agg(sum("n")).head().getLong(0)
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val d0 = ev.agg(to_date(min("ts"))).head().getDate(0)
    val shift2 = ev
      .filter(pmod(col("user_id"), lit(7)) === 0)
      .withColumn("pos", pmod(datediff(to_date(col("ts")), lit(d0)), lit(3)))
    val shift2All = shift2.count()
    val shift2Early = shift2.filter(col("pos") < 2).count()
    assert(graft.operators.StreamingBatch.lastDroppedByWatermark.get() > 0,
      "engine's dropped-by-watermark counter must fire")
    assert(kept <= total - shift2Early, "early-position two-batch-late stragglers must drop")
    assert(kept >= total - shift2All, "nothing beyond the two-batch-late cohort may drop")
  }

  // ------------------------------------------------------------------
  // t27: DSIR importance weights — exact-decimal recompute agreement
  // plus the semantic point: target-domain (en) documents must score
  // higher on average than off-domain ones.
  // ------------------------------------------------------------------
  test("t27 DSIR weights equal a BigDecimal recompute and prefer the target domain") {
    val got = graft.operators.TextAnalysis.t27Dsir(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
    def bucket(bg: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16) % 256
    }
    val feats = docs.map { case (id, lang, ts) =>
      (id, lang, ts.sliding(2).filter(_.length == 2).map(p => bucket(p.mkString(" ")))
        .toSeq.groupBy(identity).map { case (b, o) => b -> o.size.toLong })
    }.filter(_._3.nonEmpty)
    val cs = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val ct = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, lang, fm) <- feats; (b, c) <- fm) {
      cs(b) += c; if (lang == "en") ct(b) += c
    }
    val (stot, ttot) = (cs.values.sum, ct.values.sum)
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val wb = cs.keys.map { b =>
      b -> (q9(math.log((ct(b) + 1).toDouble / (ttot + 256))) - q9(math.log((cs(b) + 1).toDouble / (stot + 256))))
    }.toMap
    val expected = feats.map { case (id, lang, fm) =>
      val lw = fm.map { case (b, c) => BigDecimal(c) * wb(b) }.sum
      // cast-to-double FIRST, then round — the operator/oracle order
      (id, lang, fm.values.sum, BigDecimal(lw.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, lw > 0)
    }.sortBy(_._1).toSeq
    assert(got == expected)
    val (en, rest) = got.partition(_._2 == "en")
    assert(en.map(_._4).sum / en.size > rest.map(_._4).sum / rest.size,
      "target-domain docs should carry higher importance weight")
  }
}
