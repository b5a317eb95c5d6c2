package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Shared local session for all suites (one per JVM — Test/fork=true). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
}

/** Structural invariants per operator. Value-level correctness is the
  * DuckDB oracle gate (scripts/check_oracle.py / the driver); these specs
  * pin the properties the oracle can't see: determinism, approximate-
  * operator recall/precision floors, cross-operator consistency.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("q1 groups by (returnflag, linestatus) — at most 3x2 groups, all counted") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum > 0)
  }

  test("q5 semi + q6 anti partition the customer filter domains") {
    val semi = Relational.q5SemiJoin(spark, sf).count()
    val anti = Relational.q6AntiJoin(spark, sf).count()
    val customers = graft.sources.Tables.customer(spark, sf).count()
    assert(anti <= customers && semi <= customers)
  }

  test("q9 emits at most k rows per group, ranks 1..k") {
    val rows = Relational.q9TopkGroup(spark, sf).collect()
    val perGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(perGroup.values.forall(g => g.length <= 3 && g.map(_.getAs[Int]("rn")).sorted.sameElements(1 to g.length)))
  }

  test("q10 rollup contains the grand-total row equal to table count") {
    val rows = Relational.q10Rollup(spark, sf).collect()
    val total = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(total.getAs[Long]("n") == graft.sources.Tables.lineitem(spark, sf).count())
  }
}

class WideningSpec extends AnyFunSuite {
  import TestSession._

  test("q23 approx distinct within 5% of exact") {
    val approx = Relational.q23ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.countDistinct("l_partkey").as("p"),
        org.apache.spark.sql.functions.countDistinct("l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$k orders: $ao vs $o")
    }
  }

  test("e8 resample spine is dense: types x hours, zero-filled") {
    val rows = Events.e8Resample(spark, sf).collect()
    val types = rows.map(_.getString(1)).distinct.length
    val hours = rows.map(_.getLong(0)).distinct.length
    assert(rows.length == types * hours)
    assert(rows.exists(_.getLong(2) == 0L)) // gaps exist at sf0.001 and get filled
  }

  test("q24 custom TopKPerKeyExec is planned and matches the window form exactly") {
    val custom = Relational.q24TopkCustom(spark, sf)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    // two passes (partial + final), exactly one exchange between them and
    // none after — the final pass advertises its partitioning
    assert("TopKPerKey ".r.findAllIn(plan).length == 2)
    val viaWindow = Relational.q9TopkGroup(spark, sf).collect().toSeq
    assert(custom.collect().toSeq == viaWindow)
  }

  test("custom expressions are callable from the SQL surface") {
    graft.plans.GraftExtensions.register(spark)
    val dot = spark
      .sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark
      .sql("SELECT graft_simhash64(array('spark', 'query', 'engine')) AS h")
      .head().getLong(0)
    assert(sh != 0L)
  }

  test("dt-partitioned layout gives partition-pruned scans") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    graft.sources.Tables
      .events(spark, sf)
      .withColumn("dt", col("ts").cast("date"))
      .write.partitionBy("dt").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t").filter(col("dt") === "2024-01-03")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(dt") || scan.contains("PartitionFilters: [ isnotnull(dt"))
    // only the matching dt directory's files are read
    assert(q.queryExecution.executedPlan.collectLeaves().head.toString.contains("dt"))
    assert(q.count() > 0)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse dirs persist — clear them so saveAsTable can recreate
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
    graft.sources.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val j = spark.table("b_lineitem").join(
      spark.table("b_orders").hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(j.count() > 0)
  }

  test("salted skew join equals the plain join") {
    import graft.operators.SkewJoin
    val li = graft.sources.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey").as("l_orderkey"), org.apache.spark.sql.functions.col("o_totalprice"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", 8).count()
    assert(salted == plain)
  }

  test("csv and json batch sources roundtrip with explicit schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_").toString
    val src = graft.sources.Tables.orders(spark, sf).limit(100)
    src.write.option("header", "true").csv(s"$dir/csv")
    src.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").schema(src.schema).csv(s"$dir/csv")
    val json = spark.read.schema(src.schema).json(s"$dir/json")
    assert(csv.count() == 100 && json.count() == 100)
    assert(csv.schema == src.schema && json.schema == src.schema)
  }

  test("schema evolution: mergeSchema reads old+new files as one table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_schema_").toString
    Seq((1L, "a")).toDF("id", "f1").write.parquet(s"$dir/p1")
    Seq((2L, "b", 3.0)).toDF("id", "f1", "f2").write.parquet(s"$dir/p2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/p1", s"$dir/p2")
    assert(merged.columns.sorted.sameElements(Array("f1", "f2", "id")))
    assert(merged.count() == 2)
    assert(merged.filter(org.apache.spark.sql.functions.col("f2").isNull).count() == 1)
  }
}

class EventsSpec extends AnyFunSuite {
  import TestSession._

  test("events loader normalizes nanos to TimestampType") {
    val e = graft.sources.Tables.events(spark, sf)
    assert(e.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(e.count() > 0)
  }

  test("e2 session event counts sum to total events; session ids start at 1") {
    val sess = Events.e2Sessionize(spark, sf).collect()
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(sess.map(_.getAs[Long]("n_events")).sum == total)
    assert(sess.filter(_.getAs[Long]("session_id") == 1L).nonEmpty)
  }

  test("e6 keeps exactly one row per user") {
    val d = Events.e6DedupLatest(spark, sf)
    assert(d.count() == d.select("user_id").distinct().count())
  }
}

class DedupSpec extends AnyFunSuite {
  import TestSession._

  test("d2 MinHash-LSH equals the exact tau=0.5 pair set (d4 ground truth)") {
    val lsh = Dedup.d2MinhashLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.d4NgramJaccard(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH ${lsh.size} pairs vs exact ${exact.size}")
    assert(exact.nonEmpty) // the corpus has planted near-dups
  }

  test("d3 SimHash: finds planted near-dups with high precision") {
    val sim = Dedup.d3Simhash(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.d4NgramJaccard(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    val precision = (sim & exact).size.toDouble / sim.size
    val recall = (sim & exact).size.toDouble / exact.size
    assert(precision >= 0.7, s"precision $precision")
    assert(recall >= 0.4, s"recall $recall")
  }

  test("d6 clusters: canonical is the min doc_id of each component and a member of it") {
    val rows = Dedup.d6DedupClusters(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val byComp = rows.groupBy(_._2)
    assert(byComp.forall { case (canon, members) => members.map(_._1).min == canon })
  }

  test("c1 compaction reduces file count and preserves rows") {
    import graft.operators.Maintenance
    val dir = java.nio.file.Files.createTempDirectory("graft_c1t_").toString
    graft.sources.Tables
      .events(spark, sf)
      .withColumn("dt", org.apache.spark.sql.functions.col("ts").cast("date"))
      .repartition(8)
      .write
      .partitionBy("dt")
      .parquet(s"$dir/frag")
    Maintenance.compact(spark, s"$dir/frag", s"$dir/compact", Seq("dt"))
    assert(Maintenance.fileCount(spark, s"$dir/compact") < Maintenance.fileCount(spark, s"$dir/frag"))
    assert(
      spark.read.parquet(s"$dir/compact").count() == spark.read.parquet(s"$dir/frag").count()
    )
  }

  test("d1 exact dedup covers every document exactly once") {
    val d1 = Dedup.d1DedupExact(spark, sf)
    assert(d1.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) ==
      graft.sources.Tables.documents(spark, sf).count())
  }
}

class SimilaritySpec extends AnyFunSuite {
  import TestSession._

  test("v1 returns exactly k neighbors per query, self excluded, cos in [-1,1]") {
    val rows = Similarity.v1KnnBrute(spark, sf).collect()
    assert(rows.length == 10 * 5)
    assert(rows.forall(r => r.getAs[Long]("c_id") != r.getAs[Long]("q_id")))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0))
  }

  test("v2 LSH recall@5 vs v1 is above floor and deterministic") {
    val v1 = Similarity.v1KnnBrute(spark, sf).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val v2a = Similarity.v2KnnLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val v2b = Similarity.v2KnnLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(v2a == v2b) // seeded planes: stable across runs
    assert((v2a & v1).size.toDouble / v1.size >= 0.8) // multiprobe: 1.0 measured
  }
}

class TextSpec extends AnyFunSuite {
  import TestSession._

  test("t1 language ID predicts a code for every doc") {
    val rows = TextAnalysis.t1LangId(spark, sf).collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getAs[String]("lang_pred").nonEmpty))
  }

  test("t3 regex tokens >= whitespace tokens (splitting is only finer)") {
    val rows = TextAnalysis.t3TokenCount(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Int]("n_re_tokens") >= r.getAs[Int]("n_ws_tokens")))
  }

  test("t4 rolling fingerprint is order-sensitive and deterministic") {
    val a = TextAnalysis.t4FingerprintRolling(spark, sf).collect().map(_.getLong(1))
    val b = TextAnalysis.t4FingerprintRolling(spark, sf).collect().map(_.getLong(1))
    assert(a.sameElements(b))
    assert(a.distinct.length > 1)
  }
}
