package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 hardening differentials: the GramianAgg split-accumulator
  * overflow program (the round-11 verdict's 100×-scale hazard), the
  * image-decode loud-failure path, the t36 position-field guard, and
  * SqlMain's bounded materialization of mid-script non-commands.
  */
class Round12Spec extends AnyFunSuite {
  import TestSession._

  test("GramianAgg stays exact past the old single-long overflow bound (1e7-row group)") {
    // A constant unit vector at dim=2: per-row cross moment q·q = 1e12,
    // so 1e7 rows sum to 1e19 > Long.MaxValue (9.22e18) — the round-11
    // single-long accumulator wrapped here silently. The split (hi,lo)
    // accumulator must reconstruct the moment exactly.
    val n = 10000000L
    val g = spark
      .range(n)
      .select(array(lit(1.0f), lit(1.0f)).as("v"))
      .agg(graft.plans.GraftExpressions.gramian(col("v"), 2).as("g"))
      .collect()(0)
      .getSeq[Long](0)
      .toArray
    assert(g(0) == n)
    assert(g(1) == 1000000L * n && g(2) == 1000000L * n) // component sums
    val expect = BigInt("10000000000000000000") // 1e12 · 1e7 — exceeds Long.MaxValue
    assert(expect > BigInt(Long.MaxValue))
    // layout: [n, S0, S1, (hi,lo)00, (hi,lo)01, (hi,lo)11]
    for (k <- Seq(3, 5, 7))
      assert(graft.plans.GramianAgg.moment(g(k), g(k + 1)) == expect)
  }

  test("GramianAgg merge fails loudly (addExact) instead of wrapping") {
    val agg = graft.plans.GramianAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(lit(null).cast("array<float>")),
      2
    )
    val a = agg.createAggregationBuffer()
    val b = agg.createAggregationBuffer()
    a(3) = Long.MaxValue
    b(3) = 1L
    intercept[ArithmeticException](agg.merge(a, b))
  }

  test("decodeImage names the doc_id on corrupt bytes instead of a bare NPE") {
    val ex = intercept[IllegalArgumentException](
      graft.operators.Multimodal.decodeImage(42L, Array[Byte](1, 2, 3))
    )
    assert(ex.getMessage.contains("doc_id=42"))
    // and a valid PNG still round-trips through the same path
    val png = graft.operators.Multimodal.encodePng(4, 4, i => i * 16)
    val img = graft.operators.Multimodal.decodeImage(7L, png)
    assert(img.getWidth == 4 && img.getHeight == 4)
  }

  test("SqlMain runs mid-script non-command statements (bounded), commands eagerly") {
    // assert_true in a mid-script SELECT must actually execute: before
    // the round-12 fix the statement was built and discarded.
    val script =
      """CREATE OR REPLACE TEMP VIEW r12_t AS SELECT 1 AS x;
        |SELECT assert_true(x = 99, 'r12 boom') FROM r12_t;
        |SELECT x FROM r12_t""".stripMargin
    val ex = intercept[Exception] {
      graft.SqlMain.runScript(spark, script)
    }
    assert(ex.getMessage.contains("r12 boom"))
    // happy path: the bounded materialization doesn't disturb results
    val ok = graft.SqlMain.runScript(
      spark,
      """CREATE OR REPLACE TEMP VIEW r12_t2 AS SELECT 5 AS x;
        |SELECT assert_true(x = 5) FROM r12_t2;
        |SELECT x + 1 AS y FROM r12_t2""".stripMargin
    )
    assert(ok.collect().map(_.getInt(0)).toSeq == Seq(6))
  }

  test("ScaleRank.withRank equals a global row_number, grouped and ungrouped") {
    import org.apache.spark.sql.expressions.Window
    val df = spark
      .range(5000)
      .select(
        (col("id") % 7).as("g"),
        pmod(xxhash64(col("id")), lit(997)).as("x"),
        col("id")
      )
    // grouped: rank within g under (x, id)
    val got = graft.operators.ScaleRank
      .withRank(df, Seq("g"), Seq(col("x"), col("id")), "r")
      .select("g", "id", "r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = df
      .withColumn("r", row_number().over(Window.partitionBy("g").orderBy(col("x"), col("id"))))
      .select("g", "id", "r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong)
      .toMap
    assert(got == want && got.size == 5000)
    // ungrouped: global rank
    val gotG = graft.operators.ScaleRank
      .withRank(df, Seq.empty, Seq(desc("x"), col("id")), "r")
      .select("id", "r")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val wantG = df
      .withColumn("r", row_number().over(Window.orderBy(desc("x"), col("id"))))
      .select("id", "r")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong)
      .toMap
    assert(gotG == wantG)
  }

  test("q58 skyline equals the brute-force strict-dominance recompute") {
    val parts = graft.sources.Tables
      .part(spark, sf)
      .select("p_partkey", "p_size", "p_retailprice")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = parts
      .filter { p =>
        !parts.exists(q =>
          q._3 <= p._3 && q._2 >= p._2 && (q._3 < p._3 || q._2 > p._2)
        )
      }
      .map(p => (p._1, p._2, p._3))
      .sortBy(p => (p._2, p._1))
      .toSeq
    val got = graft.operators.Relational
      .q58Skyline(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    assert(got == expected && got.nonEmpty)
    // frontier shape: as size rises, price strictly rises
    val bySize = got.map(p => (p._2, p._3)).distinct.sortBy(_._1)
    assert(bySize.zip(bySize.drop(1)).forall { case ((_, a), (_, b)) => b > a })
  }

  test("q59 semi-additive balances equal a per-customer carry-forward recompute") {
    val o = graft.sources.Tables
      .orders(spark, sf)
      .selectExpr(
        "o_custkey",
        "cast(date_trunc('month', o_orderdate) as date) as m",
        "o_orderdate",
        "o_orderkey",
        // round-13: the engine moved to exact integer cents (q59's
        // engine-cast-independent money path) — recompute in the same
        // domain
        "cast(round(o_totalprice * 100) as bigint) as cents"
      )
      .collect()
      .map(r =>
        (r.getLong(0), r.getDate(1), r.getTimestamp(2), r.getLong(3), r.getLong(4))
      )
    val months = o.map(_._2).distinct.sortBy(_.getTime)
    // per customer: latest order per active month, carried to the next active month
    val perCust = o.groupBy(_._1).map { case (c, rows) =>
      val bal = rows
        .groupBy(_._2)
        .map { case (m, rs) => m -> rs.maxBy(r => (r._3.getTime, r._4))._5 }
        .toSeq
        .sortBy(_._1.getTime)
      c -> bal
    }
    val expected = months.map { m =>
      val live = perCust.values.flatMap { bal =>
        bal.takeWhile(_._1.getTime <= m.getTime).lastOption.map(_._2)
      }.toSeq
      (m, live.size.toLong, live.sum / 100.0)
    }
    val got = graft.operators.Relational
      .q59SemiAdditive(spark, sf)
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got.map(g => (g._1.toString, g._2, g._3)).toList ==
      expected.map(e => (e._1.toString, e._2, e._3)).toList && got.nonEmpty)
  }

  test("e44 engagement gini equals the textbook rank formula, bounded [0,1)") {
    val counts = graft.sources.Tables
      .events(spark, sf)
      .groupBy("event_type", "user_id")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val swx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      t -> math.rint((2.0 * swx - (n + 1.0) * sx) / (n.toDouble * sx) * 1e6) / 1e6
    }
    val got = graft.operators.Events
      .e44EngagementGini(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(3))
      .toMap
    assert(got == expected && got.nonEmpty)
    assert(got.values.forall(g => g >= 0.0 && g < 1.0))
  }

  test("c33: reading a vacuumed version fails with an explicit error; current reads fine") {
    val report = graft.operators.Maintenance.c33VersionGc(spark, sf).collect()
    assert(report.length == 4)
    assert(report.count(_.getAs[String]("status") == "expired") == 2)
    // the audit is idempotent: a rerun vacuums nothing and reports the same
    val again = graft.operators.Maintenance.c33VersionGc(spark, sf).collect()
    assert(again.map(_.toString).toSeq == report.map(_.toString).toSeq)
  }

  test("c34 SCD2 rows: one current row per user, half-open intervals chain exactly") {
    val rows = graft.operators.Maintenance
      .c34Scd2Build(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
         if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(5))
      )
    val byUser = rows.groupBy(_._1)
    assert(byUser.values.forall(_.count(_._5) == 1)) // exactly one open run
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_._3)
      // valid_to of each closed row equals the next row's valid_from
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._4.contains(b._3))
      }
      assert(sorted.last._4.isEmpty)
      // consecutive runs never share a type (else they'd be one run)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) => assert(a._2 != b._2) }
    }
  }

  test("s35 fan-in lands both topics, partition-pruned per topic") {
    val rep = graft.operators.StreamingBatch
      .s35MultiTopicFanin(spark, sf)
      .collect()
    val topics = rep.map(_.getString(0)).distinct.sorted
    assert(topics.toSeq == Seq("events_avro", "events_csv"))
    val byTopic = rep.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byTopic("events_avro") == byTopic("events_csv")) // same source, same rows
  }

  test("v23 mutuality equals a brute-force reverse-edge check over the v5 edge set") {
    val edges = graft.operators.Similarity
      .v5KnnGraph(spark, sf)
      .select("q_id", "c_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val set = edges.toSet
    val labels = graft.sources.Tables
      .embeddings(spark, sf)
      .select("vec_id", "label")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val expected = edges
      .groupBy(e => labels(e._1))
      .map { case (l, es) =>
        val mut = es.count(e => set.contains((e._2, e._1)))
        l -> ((es.length.toLong, mut.toLong, math.rint(mut.toDouble / es.length * 1e6) / 1e6))
      }
    val got = graft.operators.Similarity
      .v23KnnMutuality(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected && got.nonEmpty)
  }

  test("ScaleRank.withRunningSum equals a global window prefix sum, grouped and ungrouped") {
    import org.apache.spark.sql.expressions.Window
    val df = spark
      .range(4000)
      .select(
        (col("id") % 5).as("g"),
        pmod(xxhash64(col("id")), lit(991)).as("x"),
        (pmod(xxhash64(col("id") + 7), lit(100)) + 1).as("v"),
        col("id")
      )
    val got = graft.operators.ScaleRank
      .withRunningSum(df, Seq("g"), Seq(col("x"), col("id")), "v", "cum")
      .select("g", "id", "cum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = df
      .withColumn(
        "cum",
        sum("v").over(
          Window
            .partitionBy("g")
            .orderBy(col("x"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
      .select("g", "id", "cum")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want && got.size == 4000)
    val gotG = graft.operators.ScaleRank
      .withRunningSum(df, Seq.empty, Seq(desc("x"), col("id")), "v", "cum")
      .select("id", "cum")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val wantG = df
      .withColumn(
        "cum",
        sum("v").over(
          Window
            .orderBy(desc("x"), col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
      .select("id", "cum")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(gotG == wantG)
  }

  test("s36 streaming SCD2 is bit-identical to c34's one-shot batch build") {
    val batch = graft.operators.Maintenance.c34Scd2Build(spark, sf).collect().toSeq
    val stream = graft.operators.StreamingBatch.s36StreamScd2(spark, sf).collect().toSeq
    assert(stream == batch && stream.nonEmpty)
  }

  test("s36 fold acknowledges a redelivered batch without reapplying it") {
    import org.apache.spark.sql.functions._
    val root = graft.TempDirs.create("graft_s36_replay_")
    val store = s"$root/store"
    val mk = (ids: Seq[(Long, Long, String, Long)]) => {
      import spark.implicits._
      ids
        .toDF("user_id", "event_id", "event_type", "us")
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          timestamp_micros(col("us")).as("ts")
        )
    }
    val b0 = mk(Seq((1L, 1L, "a", 1000L), (1L, 2L, "a", 2000L), (2L, 3L, "x", 1500L)))
    val b1 = mk(Seq((1L, 4L, "b", 3000L), (2L, 5L, "x", 2500L)))
    graft.operators.StreamingBatch.s36FoldScd2(store, b0, 0L)
    graft.operators.StreamingBatch.s36FoldScd2(store, b1, 1L)
    def cur() = graft.sources.BucketedStateStore.readLatest(spark, store).get
    val after = cur().collect().map(_.toString).sorted
    // redeliver batch 1 (at-least-once): the committed manifest must acknowledge it
    graft.operators.StreamingBatch.s36FoldScd2(store, b1, 1L)
    val replay = cur().collect().map(_.toString).sorted
    assert(replay.toSeq == after.toSeq)
    // and the runs are what the history implies: user 1 a→b, user 2 one open x run
    val rows = cur()
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(rows.toSeq == Seq((1L, "a", 1000L, 3000L, 2L), (1L, "b", 3000L, -1L, 1L), (2L, "x", 1500L, -1L, 2L)))
  }

  test("t42 Kneser-Ney cross-entropy equals a brute-force in-memory recompute") {
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val bgs = docs.flatMap { case (id, ts) => ts.zip(ts.drop(1)).map(b => (id, b)) }
    val cvw = bgs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cv = cvw.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1v = cvw.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1w = cvw.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nb = cvw.size.toLong
    def p(v: String, w: String): Double =
      math.max(cvw((v, w)) - 0.75, 0.0) / cv(v) + 0.75 * n1v(v) / cv(v) * n1w(w) / nb
    val expected = bgs
      .groupBy(_._1)
      .map { case (id, bs) =>
        val lps = bs.map { case (_, (v, w)) => BigDecimal(math.rint(math.log(p(v, w)) * 1e9) / 1e9) }
        id -> (bs.size.toLong, math.rint(-(lps.sum.toDouble) / bs.size * 1e6) / 1e6)
      }
    val got = graft.operators.TextAnalysis
      .t42KneserNey(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == expected && got.nonEmpty)
  }

  test("q60 ABC classes partition all parts and respect the cumulative boundaries") {
    val rows = graft.operators.Relational
      .q60AbcClass(spark, sf)
      .collect()
      // r17: revenue surfaces as DOUBLE (portable-surface rule)
      .map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDouble(2)), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val total = rows.map(_._3).sum
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    // class A alone stays ≤ 80% + one part's worth; A+B ≤ 95% + one part
    assert(rows(0)._3 * 100 > total * 60) // A is the bulk by construction of Pareto data or not — sanity floor
    val nParts = graft.sources.Tables
      .lineitem(spark, sf)
      .select(countDistinct("l_partkey"))
      .collect()(0)
      .getLong(0)
    assert(rows.map(_._2).sum == nParts)
  }

  test("d22 minhash estimates match an in-memory md5 signature recompute, errors bounded") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val docs = graft.sources.Tables
      .documents(spark, sf)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .filter(_._2.length >= 3)
    val shingles = docs.map { case (id, ts) =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }.toMap
    def sig(id: Long): Seq[Long] =
      (0 until 16).map(k =>
        shingles(id).map(t => java.lang.Long.parseLong(md5hex(t + "#" + k).take(15), 16)).min
      )
    val rows = graft.operators.Dedup
      .d22MinhashFidelity(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, jac, est, err) =>
      val matches = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      assert(est == math.rint(matches.toDouble / 16 * 1e4) / 1e4)
      assert(err == math.rint(math.abs(est - jac) * 1e4) / 1e4)
      // 16 components: binomial std ≈ 0.125 at j=0.5 — 4σ bound
      assert(err <= 0.5)
    }
  }

  test("v24 simplified silhouette equals a brute-force centroid recompute") {
    val vecs = graft.sources.Tables
      .embeddings(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray))
    val dim = vecs.head._3.length
    val cents = vecs
      .groupBy(_._2)
      .view
      .mapValues { vs =>
        Array.tabulate(dim)(i => math.rint(vs.map(_._3(i).toDouble).sum / vs.length * 1e4) / 1e4 + 0.0)
      }
      .toMap
    def dist(x: Array[Float], c: Array[Double]): Double = {
      val s = x.indices
        .map(i => BigDecimal(math.rint((x(i) - c(i)) * (x(i) - c(i)) * 1e12) / 1e12))
        .sum
      math.rint(math.sqrt(s.toDouble) * 1e9) / 1e9
    }
    val si = vecs.map { case (_, l, x) =>
      val a = dist(x, cents(l))
      val b = cents.filter(_._1 != l).values.map(dist(x, _)).min
      l -> BigDecimal(math.rint((b - a) / math.max(a, b) * 1e9) / 1e9)
    }
    val expected = si.groupBy(_._1).map { case (l, ss) =>
      l -> ((ss.length.toLong,
             math.rint(ss.map(_._2).sum.toDouble / ss.length * 1e6) / 1e6,
             ss.count(_._2 < 0).toLong))
    }
    val got = graft.operators.Similarity
      .v24Silhouette(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == expected && got.nonEmpty)
  }

  test("m20 trim spans equal the generating-formula recompute") {
    val rows = graft.operators.Multimodal
      .m20AudioTrim(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, f, l, kept) =>
      assert(n == 64 + id % 41)
      val v = Array.tabulate(n.toInt)(i => ((id * 31 + i.toLong * i * 7919) % 65536) - 32768)
      val sumSq = v.map(x => x * x).sum
      val loud = v.indices.filter(i => v(i) * v(i) * n >= sumSq)
      assert(f == loud.head.toLong && l == loud.last.toLong && kept == l - f + 1)
    }
  }

  test("c35 merge-on-read: deletes never touch base files, vectors stay tiny") {
    val inv1 = graft.operators.Maintenance.c35BaseInventory(spark, sf)
    // rerunning the query (fresh read + anti-join) must not disturb base
    val inv2 = graft.operators.Maintenance.c35BaseInventory(spark, sf)
    assert(inv1 == inv2 && inv1.nonEmpty)
    // and the served read equals base-minus-both-predicates recomputed
    val raw = graft.sources.Tables
      .events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val surv = raw.filter(r => r._2 % 7 != 3 && r._3 != "error")
    val expected = surv.groupBy(_._3).map { case (t, rs) =>
      t -> ((rs.length.toLong, math.rint(rs.map(_._4).sum * 100) / 100))
    }
    val got = graft.operators.Maintenance
      .c35MergeOnRead(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == expected.keySet && !got.keySet.contains("error"))
    got.foreach { case (t, (n, sv)) =>
      assert(n == expected(t)._1)
      assert(math.abs(sv - expected(t)._2) < 1e-6) // sum order differs; 2dp rounding absorbs it
    }
  }

  test("t43 JS divergence: symmetric-bounded, equals a brute-force recompute") {
    val counts = graft.sources.Tables
      .documents(spark, sf)
      .selectExpr("source", "explode(filter(split(text, ' '), x -> x != '')) as tok")
      .groupBy("source", "tok")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val sources = counts.keys.map(_._1).toSeq.distinct.sorted
    val vocab = counts.keys.map(_._2).toSeq.distinct
    val tot = sources.map(s0 => s0 -> vocab.map(t => counts.getOrElse((s0, t), 0L)).sum).toMap
    def p(s0: String, t: String) = counts.getOrElse((s0, t), 0L).toDouble / tot(s0)
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val (sa, sb) = (sources(i), sources(j))
      val terms = vocab.map { t =>
        val (pa, pb) = (p(sa, t), p(sb, t))
        val m = (pa + pb) / 2
        val ta = if (pa > 0) BigDecimal(math.rint(pa * math.log(pa / m) * 1e9) / 1e9) else BigDecimal(0)
        val tb = if (pb > 0) BigDecimal(math.rint(pb * math.log(pb / m) * 1e9) / 1e9) else BigDecimal(0)
        (ta, tb)
      }
      (sa, sb) -> math.rint((terms.map(_._1).sum + terms.map(_._2).sum).toDouble / 2 * 1e6) / 1e6
    }).toMap
    val got = graft.operators.TextAnalysis
      .t43JsDivergence(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(got == expected && got.nonEmpty)
    assert(got.values.forall(v => v >= 0.0 && v <= math.log(2) + 1e-9))
  }

  test("e46 anomalies: every flagged cell exceeds the 3-MAD gate, non-flagged don't") {
    val scoredRows = graft.operators.Events
      .e45ForecastBacktest(spark, sf)
      .collect() // just to ensure shared path runs; the real check below
    assert(scoredRows.nonEmpty)
    val flagged = graft.operators.Events
      .e46SeasonalAnomalies(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(5)))
    assert(flagged.nonEmpty)
    // recompute residual distribution per type and the MAD gate
    val counts = graft.sources.Tables
      .events(spark, sf)
      .selectExpr("event_type", "dayofmonth(ts) as dm", "hour(ts) as hr")
      .groupBy("event_type", "dm", "hr")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    val types = counts.keys.map(_._1).toSeq.distinct
    def interpMedian(xs: Seq[Double]): Double = {
      val s0 = xs.sorted
      val n = s0.length
      if (n % 2 == 1) s0(n / 2) else (s0(n / 2 - 1) + s0(n / 2)) / 2
    }
    val expected = types.flatMap { t =>
      val cells = for (d0 <- 8 to 28; h <- 0 to 23)
        yield (d0, h, counts.getOrElse((t, d0, h), 0L) - counts.getOrElse((t, d0 - 7, h), 0L))
      val med = interpMedian(cells.map(_._3.toDouble))
      val mad = interpMedian(cells.map(c => math.abs(c._3 - med)))
      cells.filter(c => math.abs(c._3 - med) > 3 * mad).map(c => (t, c._1, c._2, c._3))
    }.toSet
    assert(flagged.toSet == expected)
  }

  test("e45 backtest: dense spine size, exact MAE recompute per type") {
    val counts = graft.sources.Tables
      .events(spark, sf)
      .selectExpr("event_type", "dayofmonth(ts) as dm", "hour(ts) as hr")
      .groupBy("event_type", "dm", "hr")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    val types = counts.keys.map(_._1).toSeq.distinct
    val expected = types.map { t =>
      val pts = for (d <- 8 to 28; h <- 0 to 23) yield {
        val a = counts.getOrElse((t, d, h), 0L)
        val f = counts.getOrElse((t, d - 7, h), 0L)
        math.abs(a - f)
      }
      t -> math.rint(pts.sum.toDouble / pts.size * 1e6) / 1e6
    }.toMap
    val got = graft.operators.Events
      .e45ForecastBacktest(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (t, (n, mae, smape)) =>
      assert(n == 21L * 24)
      assert(mae == expected(t))
      assert(smape >= 0.0 && smape <= 2.0)
    }
  }
}
