package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized DIFFERENTIAL tests for the round-10 operators: each
  * compares the distributed pipeline against an independent brute-force
  * Scala implementation on random inputs. These catch what the DuckDB
  * oracle can't — the oracle shares the operator's algebraic shape, the
  * brute force shares nothing but the spec.
  */
class Round10RandomizedSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

  test("v16 triangle machinery == brute-force triple count on 5 seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    (1 to 5).foreach { trial =>
      val n = 12 + rnd.nextInt(20)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a.toLong, b.toLong)).toSeq
      val got = graft.operators.Similarity
        .triangleStats(edges.toDF("a", "b"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getAs[Long]("degree"), r.getAs[Long]("n_tri"))))
        .toMap
      // brute force: adjacency set + all ordered triples
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        a <- 0L until n; b <- (a + 1) until n if adj.getOrElse(a, Set.empty)(b)
        c <- (b + 1) until n
        if adj.getOrElse(b, Set.empty)(c) && adj.getOrElse(a, Set.empty)(c)
      } { triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1 }
      adj.keys.foreach { v =>
        val (deg, tri) = got(v)
        assert(deg == adj(v).size, s"trial $trial node $v degree")
        assert(tri == triPerNode(v), s"trial $trial node $v triangles: $tri vs ${triPerNode(v)}")
      }
    }
  }

  test("e38 ACF == BigDecimal recompute with the same quantization on the real series") {
    val got = graft.operators.Events.e38Acf(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Int]("lag")) -> r.getAs[Double]("acf")).toMap
    // independent recompute: dense hourly series per type, exact decimals
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(date_trunc("hour", col("ts"))).as("hus"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val hourUs = 3600000000L
    ev.map(_._1).distinct.foreach { tpe =>
      val cnt = ev.filter(_._1 == tpe).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val xs = (mn to mx by hourUs).map(h => cnt.getOrElse(h, 0L))
      val h = xs.length
      val xbar = BigDecimal(xs.sum.toDouble / h).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val dev = xs.map(x => (BigDecimal(x) - xbar).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      val den = dev.map(d => d * d).sum
      (1 to 6).foreach { l =>
        val num = (0 until h - l).map(t => dev(t) * dev(t + l)).sum
        val expect = BigDecimal(num.toDouble / den.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((tpe, l)) - expect) < 1e-9, s"$tpe lag $l")
      }
    }
  }

  test("m13 scenes == direct Scala islands over the same synthetic frames (all docs)") {
    val got = graft.operators.Multimodal.m13SceneSegments(spark, sf).collect()
      .groupBy(_.getLong(0))
    val docIds = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    docIds.foreach { id =>
      val nf = (24 + id % 40).toInt
      val v = (0 until nf).map(i => (id * 31 + i.toLong * i * 7919) % 256)
      // direct: cut where |delta| >= 96, scene = running cut count
      val cuts = (0 until nf).map(i => if (i == 0 || math.abs(v(i) - v(i - 1)) >= 96) 1 else 0)
      val sid = cuts.scanLeft(0)(_ + _).tail
      val expect = sid.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1).map { case (s0, xs) =>
        (s0.toLong, xs.map(_._2).min.toLong, xs.map(_._2).max.toLong, xs.size.toLong,
          xs.map(x => v(x._2)).sum)
      }
      val g = got(id).sortBy(_.getAs[Long]("scene_id")).map(r =>
        (r.getAs[Long]("scene_id"), r.getAs[Long]("start_f"), r.getAs[Long]("end_f"),
          r.getAs[Long]("n_frames"), r.getAs[Long]("sum_v"))).toSeq
      assert(g == expect, s"doc $id")
    }
  }

  test("m14 dHash == direct Scala hash on every doc; clusters consistent") {
    val got = graft.operators.Multimodal.m14DHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dhash")).toMap
    got.keys.foreach { id =>
      val w = (4 + id % 13).toInt; val h = (4 + (id * 7) % 11).toInt
      def px(i: Long) = (id * 31 + i * 7919) % 256
      var hash = 0L
      for (r <- 0 until 8; c <- 0 until 7) {
        def g(cc: Int) = px(math.min(r * h / 8, h - 1).toLong * w + math.min(cc * w / 8, w - 1))
        if (g(c) > g(c + 1)) hash |= (1L << (r * 7 + c))
      }
      assert(got(id) == hash, s"doc $id: ${got(id)} vs $hash")
    }
  }

  test("e37 bursts == direct Scala detection from the raw hourly counts") {
    val got = graft.operators.Events.e37BurstWindows(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("start_h").getTime,
        r.getAs[java.sql.Timestamp]("end_h").getTime, r.getAs[Long]("n_events"))).toSet
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(date_trunc("hour", col("ts"))).as("hus"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).flatMap { case (tpe, rows) =>
      val cnt = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val total = cnt.map(_._2).sum; val nh = cnt.size
      val burst = cnt.filter { case (_, c) => c * nh * 2 >= total * 3 }
      // islands over consecutive hour indices
      val runs = scala.collection.mutable.Buffer.empty[Seq[(Long, Long)]]
      var cur = scala.collection.mutable.Buffer.empty[(Long, Long)]
      burst.foreach { case (h, c) =>
        if (cur.nonEmpty && h - cur.last._1 != 3600000000L) { runs += cur.toSeq; cur = scala.collection.mutable.Buffer.empty }
        cur += ((h, c))
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.map(r => (tpe, r.head._1 / 1000, r.last._1 / 1000, r.map(_._2).sum))
    }.toSet
    assert(got == expect, s"got ${got.size} bursts vs ${expect.size}")
  }

  test("q52 market share == direct Scala recompute from collected rows") {
    val got = graft.operators.Relational.q52MarketShare(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val asiaSup = graft.sources.Tables.supplier(spark, sf)
      .join(graft.sources.Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), (col("r_name") === "ASIA").as("asia"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).as("y"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
    val byYear = li.groupBy(_.getInt(0))
    byYear.foreach { case (y, xs) =>
      def dec(r: org.apache.spark.sql.Row) =
        BigDecimal(r.getDouble(2) * (1.0 - r.getDouble(3)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val total = xs.map(dec).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val asia = xs.filter(r => asiaSup(r.getLong(1))).map(dec).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val (gt, ga) = got(y)
      assert(math.abs(gt - total.toDouble) < 1e-6 && math.abs(ga - asia.toDouble) < 1e-6,
        s"year $y: ($gt,$ga) vs ($total,$asia)")
    }
  }

  test("t33 RAKE == direct Scala RAKE on 5 seeded random corpora") {
    import spark.implicits._
    val stops = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val vocab = Vector("data", "spark", "join", "query", "fast", "the", "a", "of", "in", "is")
    val rnd = new scala.util.Random(1031)
    (1 to 5).foreach { trial =>
      val docs = (0 until 6).map { id =>
        (id.toLong, (0 until (8 + rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dir = TempDirs.create(s"graft_rake_rand_")
      docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.operators.TextAnalysis.t33RakeKeywords(spark, dir).collect()
        .map(r => (r.getLong(0), r.getAs[Int]("rank"), r.getAs[String]("phrase"), r.getAs[Double]("score")))
      // direct RAKE per doc
      val expect = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        // phrase runs of consecutive non-stopwords
        val runs = scala.collection.mutable.Buffer.empty[Vector[String]]
        var cur = Vector.empty[String]
        toks.foreach { w =>
          if (stops(w)) { if (cur.nonEmpty) { runs += cur; cur = Vector.empty } }
          else cur = cur :+ w
        }
        if (cur.nonEmpty) runs += cur
        val occ = runs.flatMap(p => p.map(w => (w, p.length)))
        val wscore = occ.groupBy(_._1).map { case (w, os) =>
          w -> BigDecimal(os.map(_._2).sum.toDouble / os.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
        runs
          .map(p => (p.mkString(" "), p.length, p.map(wscore).sum))
          .sortBy { case (ph, _, ps) => (-ps, ph) }
          .take(3)
          .zipWithIndex
          .map { case ((ph, _, ps), i) =>
            (id, i + 1, ph, ps.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
      }
      assert(got.toSeq == expect.toSeq, s"trial $trial:\n got=${got.toSeq}\n exp=${expect.toSeq}")
    }
  }
}
