package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Maintenance, SkewJoin}

/** Randomized differential properties (seeded — replayable) pinning the
  * custom operators to their composed/built-in reference forms on
  * adversarial generated data: duplicate keys, negative and tied order
  * values, empty sides, skewed multiplicities.
  */
class RandomizedSpec extends AnyFunSuite {
  import TestSession._

  test("topKPerKey == window row_number top-k on random data (20 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(1000 + trial)
      val n = 30 + rnd.nextInt(120)
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until n).map { i =>
        // ~15% NULL order values: DESC NULLS LAST must match the window
        val v: java.lang.Double =
          if (rnd.nextDouble() < 0.15) null
          else math.round((rnd.nextDouble() - 0.5) * 20) / 2.0
        ("g" + rnd.nextInt(5), i.toLong, v)
      }
      val df = rows.toDF("g", "id", "v") // ties (and nulls) in v are frequent by construction
      val viaTopk = graft.plans.TopK
        .topKPerKey(df, Seq("g"), "v", "id", k)
        .select("g", "id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSet
      val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
      val viaWindow = df
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("g", "id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSet
      assert(viaTopk == viaWindow, s"trial $trial k=$k")
    }
  }

  test("TopKRewrite: rewritten idiom == un-rewritten window on random data incl. nulls (10 trials)") {
    import spark.implicits._
    for (trial <- 0 until 10) {
      val rnd = new scala.util.Random(6000 + trial)
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until 80).map { i =>
        val v: java.lang.Double =
          if (rnd.nextDouble() < 0.2) null else math.round((rnd.nextDouble() - 0.5) * 10) / 2.0
        ("g" + rnd.nextInt(4), i.toLong, v)
      }
      val df = rows.toDF("g", "id", "v")
      val w = Window.partitionBy("g").orderBy(desc("v"), col("id"))
      val idiom = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).select("g", "id")
      assert(
        idiom.queryExecution.sparkPlan
          .collectFirst { case t: graft.plans.TopKPerKeyExec => t }
          .isDefined,
        s"trial $trial: rewrite did not fire"
      )
      val viaRewrite = idiom.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // keeping rn in the output suppresses the rewrite → true window plan
      val viaWindow = df
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("g", "id", "rn")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSet
      assert(viaRewrite == viaWindow, s"trial $trial k=$k")
    }
  }

  test("saltedJoin == plain inner join on random multiplicity keys (10 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 10) {
      val rnd = new scala.util.Random(2000 + trial)
      // skewed: key 0 dominates the left side
      val left = (0 until 200).map { i =>
        (if (rnd.nextDouble() < 0.5) 0L else rnd.nextInt(10).toLong, i.toLong)
      }.toDF("k", "lv")
      val right = (0 until 30).map(i => (rnd.nextInt(12).toLong, i.toLong)).toDF("k", "rv")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val salted = canon(SkewJoin.saltedJoin(left, right, "k", 1 + rnd.nextInt(6)).select("k", "lv", "rv"))
      val plain = canon(left.join(right, "k").select("k", "lv", "rv"))
      assert(salted == plain, s"trial $trial")
    }
  }

  test("mergeUpsert: source wins, all keys survive, idempotent (10 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 10) {
      val rnd = new scala.util.Random(3000 + trial)
      val tgt = (0 until 40).map(i => (rnd.nextInt(25).toLong, s"t$i", rnd.nextInt(50).toLong)).toDF("k", "v", "ver")
      val src = (0 until 25).map(i => (rnd.nextInt(30).toLong, s"s$i", rnd.nextInt(50).toLong)).toDF("k", "v", "ver")
      val ord = Seq(col("ver").desc, col("v").desc) // total order within (k, side)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      val once = Maintenance.mergeUpsert(tgt, src, Seq("k"), ord)
      val m = canon(once)
      // exactly one row per key; key set = union
      assert(m.map(_._1).distinct.size == m.size)
      val tgtKeys = tgt.select("k").collect().map(_.getLong(0)).toSet
      val srcKeys = src.select("k").collect().map(_.getLong(0)).toSet
      assert(m.map(_._1).toSet == (tgtKeys ++ srcKeys))
      // source precedence: every key present in src resolves to a src row
      m.filter(r => srcKeys.contains(r._1)).foreach(r => assert(r._2.startsWith("s"), s"trial $trial: $r"))
      // idempotent: re-applying the same updates changes nothing
      assert(canon(Maintenance.mergeUpsert(once, src, Seq("k"), ord)) == m, s"trial $trial")
    }
  }

  test("MisraGries superset guarantee on skewed random streams (10 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 10) {
      val rnd = new scala.util.Random(4000 + trial)
      val k = 3 + rnd.nextInt(6)
      // zipf-ish: term j drawn with weight ~ 1/(j+1)
      val weights = (0 until 40).map(j => 1.0 / (j + 1))
      val total = weights.sum
      def draw(): Int = {
        var x = rnd.nextDouble() * total; var j = 0
        while (x > weights(j)) { x -= weights(j); j += 1 }
        j
      }
      val terms = (0 until 3000).map(_ => "t" + draw())
      val df = terms.toDF("t").repartition(1 + rnd.nextInt(8)) // random merge tree
      val cands = df
        .agg(graft.plans.GraftExpressions.mgCandidates(col("t"), k).as("c"))
        .collect()(0)
        .getSeq[String](0)
        .toSet
      assert(cands.size <= k - 1)
      val counts = terms.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val heavy = counts.filter(_._2 > terms.size.toDouble / k).keys
      heavy.foreach(t => assert(cands.contains(t), s"trial $trial k=$k missing $t"))
    }
  }

  test("FloatVecDot: commutative bit-for-bit and equal to a plain fold (20 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 20) {
      val rnd = new scala.util.Random(5000 + trial)
      val dim = 1 + rnd.nextInt(96)
      val a = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      val b = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      val Array(dab, dba) = df
        .select(
          graft.plans.GraftExpressions.dotF(col("a"), col("b")).as("ab"),
          graft.plans.GraftExpressions.dotF(col("b"), col("a")).as("ba")
        )
        .collect()(0) match { case r => Array(r.getDouble(0), r.getDouble(1)) }
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(dab == ref && dba == ref, s"trial $trial dim=$dim")
    }
  }

  test("KLL sketch quantiles bracket the exact quantiles on random data (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(8000 + trial)
      val n = 500 + rnd.nextInt(2000)
      // mix of heavy-tailed and uniform values, with repeats
      val vals = (0 until n).map { _ =>
        if (rnd.nextDouble() < 0.3) math.exp(rnd.nextGaussian() * 2)
        else math.round(rnd.nextDouble() * 100) / 2.0
      }
      val df = vals.toDF("v").repartition(7) // force partial-buffer merges
      val ranks = Seq(0.1, 0.5, 0.9)
      val row = df
        .agg(graft.plans.GraftExpressions.kllSketch(col("v")).as("sk"))
        .select(
          ranks.map(q => graft.plans.GraftExpressions.kllQuantile(col("sk"), q).as(s"q$q")): _*
        )
        .collect()(0)
      val sorted = vals.sorted
      ranks.zipWithIndex.foreach { case (q, i) =>
        val got = row.getDouble(i)
        // ±3% rank tolerance (k=200 is ±1.65% at 99% confidence)
        val lo = sorted(math.max(0, (n * (q - 0.03)).toInt))
        val hi = sorted(math.min(n - 1, (n * (q + 0.03)).toInt))
        assert(got >= lo && got <= hi, s"trial $trial q=$q got=$got not in [$lo, $hi]")
      }
    }
  }

  test("theta sketch: estimate and pairwise intersection exact below nominal k (8 seeded trials)") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val rnd = new scala.util.Random(9000 + trial)
      // two overlapping key sets, both far below nominal 4096
      val aSet = (0 until 300 + rnd.nextInt(500)).map(_ => rnd.nextInt(5000).toLong).distinct
      val bSet = (0 until 300 + rnd.nextInt(500)).map(_ => rnd.nextInt(5000).toLong).distinct
      val df = (aSet.map(("a", _)) ++ bSet.map(("b", _))).toDF("g", "k").repartition(5)
      val sk = df
        .groupBy("g")
        .agg(graft.plans.GraftExpressions.thetaSketch(col("k")).as("sk"))
        .collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
        .toMap
      val est = Seq("a", "b").map { g =>
        spark
          .range(1)
          .select(graft.plans.GraftExpressions.thetaEstimate(lit(sk(g))).as("e"))
          .collect()(0)
          .getDouble(0)
      }
      assert(math.round(est(0)) == aSet.size && math.round(est(1)) == bSet.size, s"trial $trial")
      val inter = spark
        .range(1)
        .select(
          graft.plans.GraftExpressions.thetaIntersect(lit(sk("a")), lit(sk("b"))).as("i")
        )
        .collect()(0)
        .getDouble(0)
      assert(math.round(inter) == (aSet.toSet intersect bSet.toSet).size, s"trial $trial")
    }
  }
}
