package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** §2.1 relational / OLAP operator set over the TPC-H-ish tables.
  *
  * Every query is a declarative DataFrame plan: filters/projections reach
  * the parquet scan (PushedFilters/ReadSchema), aggregations get map-side
  * partial aggregation for free, dimension joins are explicitly
  * `broadcast()` so no shuffle of the fact side is wasted on a small dim.
  *
  * Oracle-parity conventions (see SURVEY.md §6): every computed column is
  * aliased identically to the DuckDB SQL in `SparkEntry.oracleSql`,
  * floating aggregates are rounded, and output ordering is fully
  * deterministic (all-column ORDER BY).
  */
object Relational {

  private def ts(lit0: String) = to_timestamp(lit(lit0))

  /** Q1-pattern pricing summary: multi-key groupBy, sum/avg/count. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6-pattern: selective filter + narrow projection, all pushed to scan. */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(
        col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 25
      )
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows")
      )

  /** Q3-pattern: 3-way join + grouped revenue. customer dim broadcast.
    * Revenue sums DECIMAL-quantized line amounts (the q36 discipline):
    * the per-line double product is bit-identical on any engine, its
    * decimal(18,6) quantization is exact, and decimal sums are
    * associativity-independent — so group totals reproduce at any
    * parallelism and any SF (double sums crossed the half-cent rounding
    * boundary at sf0.1).
    */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1996-01-01"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1996-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("decimal(38,2)")
          .cast("double")
          .as("revenue")
      )
      .orderBy(desc("revenue"), col("l_orderkey"))
  }

  /** Star join with broadcast dims: revenue per nation within one region. */
  def q4BroadcastJoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  /** Left-semi (EXISTS): customers with ≥1 late order. */
  def q5SemiJoin(s: SparkSession, d: String): DataFrame = {
    val late = Tables.orders(s, d).filter(col("o_orderdate") >= ts("2000-01-01"))
    Tables
      .customer(s, d)
      .filter(col("c_mktsegment") === "MACHINERY")
      .join(late, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti (NOT EXISTS): customers with no late order. */
  def q6AntiJoin(s: SparkSession, d: String): DataFrame = {
    val late = Tables.orders(s, d).filter(col("o_orderdate") >= ts("2000-01-01"))
    Tables
      .customer(s, d)
      .join(late, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Windows: row_number + running sum per supplier, first 5 rows each. */
  def q7Window(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables
      .lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "running_qty",
        round(sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
      )
      .filter(col("rn") <= 5)
      .select("l_suppkey", "rn", "l_orderkey", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  /** Distinct counting (exact). */
  def q8Distinct(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(col("l_quantity") > 10)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")
      )

  /** Per-group top-k via ranking window. */
  def q9TopkGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables
      .orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderpriority", "rn")
  }

  /** ROLLUP subtotals; grouping keys coalesced to 'ALL' for the subtotal rows. */
  def q10Rollup(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"),
        col("n")
      )
      .orderBy("rf", "ls")

  /** Exact interpolated percentiles per group (DuckDB quantile_cont parity). */
  def q11Percentile(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        // round via float-multiply (round(x*100)/100) to resolve
        // interpolation half-ties the way DuckDB's double round() does —
        // Spark's decimal-exact round(x, 2) breaks the other way when the
        // interpolated midpoint reprs as ...4999999995
        (round(expr("percentile(l_extendedprice, 0.5D)") * 100) / 100).as("med_price"),
        (round(expr("percentile(l_extendedprice, 0.9D)") * 100) / 100).as("p90_price"),
        (round(expr("percentile(l_quantity, 0.25D)") * 100) / 100).as("p25_qty")
      )
      .orderBy("l_returnflag")

  /** Set operations: INTERSECT / EXCEPT over nation keys. */
  def q12Setops(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nk")).distinct()
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
    val both  = cn.intersect(sn).withColumn("tag", lit("both"))
    val conly = cn.except(sn).withColumn("tag", lit("customer_only"))
    both.unionAll(conly).select("nk", "tag").orderBy("tag", "nk")
  }

  /** Pivot-style conditional aggregation. */
  def q13ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        round(sum(when(col("c_mktsegment") === "BUILDING", col("c_acctbal")).otherwise(0.0)), 2)
          .as("building_bal"),
        sum(when(col("c_mktsegment") === "MACHINERY", 1).otherwise(0)).cast("long").as("n_machinery"),
        sum(when(col("c_mktsegment") === "AUTOMOBILE", 1).otherwise(0)).cast("long").as("n_auto"),
        count(lit(1)).as("n_total")
      )
      .orderBy("c_nationkey")

  /** String function battery (semantics shared with ANSI SQL / DuckDB). */
  def q14StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables
      .part(s, d)
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("tag"),
        regexp_replace(col("p_name"), " ", "_").as("snake")
      )
      .orderBy("p_partkey")

  /** Casts / null semantics: floor-div, NULLIF/COALESCE, timestamp→date. */
  def q15CastsNulls(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_k"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_alt"),
        col("o_orderdate").cast("date").as("od")
      )
      .orderBy("o_orderkey")

  /** Correlated-aggregate pattern: customers above their nation's average
    * balance. Declared as a broadcast join against the per-nation aggregate
    * (the distributed form of the correlated scalar subquery).
    */
  def q16CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val nationAvg = c.groupBy(col("c_nationkey").as("nk")).agg(avg("c_acctbal").as("nation_avg"))
    c.join(broadcast(nationAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("ab"))
      .orderBy("c_custkey")
  }

  /** 5-table chain join: revenue per region. Dims broadcast, facts shuffle. */
  def q17MultiJoinChain(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("r_name")

  /** Range (band) join: facts against a small interval table. The range
    * table is broadcast (nested-loop against 3 rows); at scale with many
    * ranges the plan is bin-then-equi-join, noted in SURVEY §5.
    */
  def q19RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ranges = Seq((0, 10, "low"), (10, 25, "mid"), (25, 100, "high")).toDF("lo", "hi", "label")
    Tables
      .lineitem(s, d)
      .join(broadcast(ranges), col("l_quantity") > col("lo") && col("l_quantity") <= col("hi"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("label")
  }

  /** Pivot: status columns per priority (explicit value list keeps the
    * schema static — no driver-side distinct scan).
    */
  def q20Pivot(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .orderBy("o_orderpriority")

  /** Analytic window battery: lag/lead/ntile/percent_rank. */
  def q21WindowAnalytics(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables
      .lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        lag("l_quantity", 1).over(w).as("qty_lag"),
        lead("l_quantity", 1).over(w).as("qty_lead"),
        ntile(4).over(w).as("qtile"),
        round(percent_rank().over(w), 6).as("pr")
      )
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // total order over all output columns for oracle parity
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("pr"), col("qtile"),
        col("qty_lag").asc_nulls_first, col("qty_lead").asc_nulls_first)
  }

  /** GROUPING SETS through the engine's SQL surface (spark.sql over a
    * registered view — the same Catalyst plan as the DataFrame API).
    */
  def q22GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pri,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pri""".stripMargin
    )
  }

  /** Sketch-based distinct counting (HyperLogLog++) — the 100 TB path
    * where exact countDistinct's shuffle is the bottleneck. Rows-only
    * (sketch estimates are engine-specific); accuracy vs exact is
    * asserted in ScalaTest.
    */
  def q23ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders")
      )
      .orderBy("l_returnflag")

  /** Per-group top-k through the custom TopKPerKey physical operator
    * (bounded per-key heaps, partial pass before the shuffle — O(n log k)
    * vs the window form's full per-key sort; see graft.plans.TopKPerKey).
    * Same semantics as q9, so it shares q9's oracle shape.
    */
  def q24TopkCustom(s: SparkSession, d: String): DataFrame = {
    val top = graft.plans.TopK.topKPerKey(
      Tables.orders(s, d),
      Seq("o_orderpriority"),
      "o_totalprice",
      "o_orderkey",
      3
    )
    val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    top
      .withColumn("rn", row_number().over(w))
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Correlated aggregate via window (no self-join): orders above their
    * customer's average — one shuffle on the correlation key.
    */
  def q25WindowCorrelated(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables
      .orders(s, d)
      .withColumn("cavg", avg("o_totalprice").over(w))
      .filter(col("o_totalprice") > col("cavg"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("p"))
      .orderBy("o_orderkey")
  }

  /** CUBE: all grouping combinations (vs rollup's hierarchy). */
  def q26Cube(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"),
        col("n")
      )
      .orderBy("rf", "ls")

  /** arg-max/arg-min aggregation (max_by/min_by). */
  def q27ArgMax(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        max_by(col("c_name"), col("c_acctbal")).as("richest"),
        min_by(col("c_name"), col("c_acctbal")).as("poorest"),
        round(max("c_acctbal"), 2).as("max_bal")
      )
      .orderBy("c_nationkey")

  /** Ordered string aggregation over a distinct set. */
  def q28StringAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy("o_orderpriority")
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"))
      .orderBy("o_orderpriority")

  /** RANGE window frame: per-customer revenue within a sliding 30-day
    * value range of each order date (range frames bound by VALUE, not
    * row count).
    */
  def q29RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("od_s"))
      .rangeBetween(-30L * 86400, 0L)
    Tables
      .orders(s, d)
      .filter(col("o_custkey") <= 100)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("od_s"),
        col("o_totalprice")
      )
      .withColumn("rev_30d", round(sum("o_totalprice").over(w), 2))
      .select("o_orderkey", "o_custkey", "rev_30d")
      .orderBy("o_orderkey", "o_custkey", "rev_30d")
  }

  /** FULL OUTER join: nations having customers and/or suppliers. */
  def q30FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    c.withColumnRenamed("nk", "cnk")
      .join(p.withColumnRenamed("nk", "snk"), col("cnk") === col("snk"), "full_outer")
      .select(
        coalesce(col("cnk"), col("snk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp")
      )
      .orderBy("nationkey")
  }

  /** Date/time function battery: interval add, month add with
    * end-of-month clamping, last_day, calendar extracts.
    */
  def q31DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        (dayofweek(col("o_orderdate")) - 1).as("dow0")
      )
      .orderBy("o_orderkey")

  /** NULL aggregation semantics: count(*) vs count(col), null-skipping
    * sum/avg, all-null groups (nulls manufactured via nullif).
    */
  def q32NullAggs(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .withColumn("bal_or_null", when(col("c_acctbal") > 0, col("c_acctbal")))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("bal_or_null")).as("n_pos"),
        round(sum("bal_or_null"), 2).as("sum_pos"),
        round(avg("bal_or_null"), 4).as("avg_pos"),
        round(min("bal_or_null"), 2).as("min_pos")
      )
      .orderBy("c_mktsegment")

  /** Consecutive-row deltas: each order vs the customer's previous order
    * (lag over the per-customer timeline).
    */
  def q33OrderDeltas(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(s, d)
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .filter(col("prev_price").isNotNull)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") - col("prev_price"), 2).as("delta")
      )
      .orderBy("o_orderkey", "o_custkey", "delta")
  }

  /** HAVING: post-aggregation filter. */
  def q18Having(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")

  /** Approximate percentile sketch (Greenwald-Khanna via Spark's
    * approx_percentile): the 100 TB replacement for [[q11Percentile]] —
    * exact per-group percentile needs a full sort per group, while the
    * sketch is a bounded-size mergeable summary riding the normal partial
    * agg path. rows-only in the driver gate (sketch internals differ per
    * engine); the ScalaTest gate bounds it against q11's exact values
    * (accuracy parameter 10000 ⇒ rank error ≤ n/10000).
    */
  def q34ApproxPercentile(s: SparkSession, d: String, accuracy: Int = 10000): DataFrame =
    Tables
      .lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr(s"approx_percentile(l_extendedprice, 0.5D, $accuracy)"), 2).as("med_price"),
        round(expr(s"approx_percentile(l_extendedprice, 0.9D, $accuracy)"), 2).as("p90_price"),
        round(expr(s"approx_percentile(l_quantity, 0.25D, $accuracy)"), 2).as("p25_qty")
      )
      .orderBy("l_returnflag")

  /** Skew-salted fact-fact join: [[SkewJoin.saltedJoin]] splits each hot
    * join key across `salts` reducers (deterministic row-hash salt, build
    * side replicated salts×). The oracle is the PLAIN join — salting must
    * be semantically invisible.
    */
  def q35SaltedJoin(s: SparkSession, d: String): DataFrame =
    SkewJoin
      .saltedJoin(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
        Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "l_orderkey",
        salts = 4
      )
      .groupBy("o_orderpriority")
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Auto-rewritten top-k: written as the UNIVERSAL SQL idiom
    * (row_number window + rank filter, rank dropped afterward) — the
    * [[graft.plans.TopKRewrite]] optimizer rule recognizes the shape and
    * plans [[graft.plans.TopKPerKeyExec]] (bounded heaps, ≤ k rows per
    * key per partition on the exchange) instead of a full per-key sort.
    * The oracle runs the literal window form, so the rewrite is proven
    * semantics-preserving; the plan swap is asserted in ScalaTest.
    */
  def q37AutoTopk(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s) // idempotent: rule + strategy
    val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables
      .orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderpriority"), desc("price"), col("o_orderkey"))
  }

  /** NULL-safe ROLLUP: subtotal rows are identified by `grouping()`
    * bits, not by key nullness — the correct general pattern (the
    * coalesce-based q10 form would conflate a genuine NULL key value
    * with a subtotal row; this data has no NULL keys, but the operator
    * library must not rely on that).
    */
  def q38GroupingId(s: SparkSession, d: String): DataFrame = {
    // grouping() is only legal inside the aggregate — expressed through
    // the engine's SQL surface. Per-call unique view name (concurrent
    // invocations over different datasets must not race on a shared
    // catalog entry), dropped after analysis — s.sql resolves the view
    // eagerly, so the returned DataFrame doesn't need it to survive.
    val view = s"graft_q38_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.lineitem(s, d).createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT
         | CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
         | CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
         | CAST(2 * grouping(l_returnflag) + grouping(l_linestatus) AS INT) AS gid,
         | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         |FROM $view
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid, rf, ls""".stripMargin
    )
    finally s.catalog.dropTempView(view)
  }

  /** q39: running COUNT(DISTINCT) over a window — which neither Spark
    * nor standard SQL supports directly — via the first-occurrence
    * decomposition: row_number()=1 inside (customer, priority) marks the
    * first sighting, and a running sum of those marks over the
    * customer's order timeline IS the distinct-priorities-seen-so-far
    * count. Two window passes over the same customer partitioning (one
    * shuffle; the second sort reuses the clustering), no state beyond
    * the frame.
    */
  def q39RunningDistinct(s: SparkSession, d: String): DataFrame = {
    val firstW = Window
      .partitionBy("o_custkey", "o_orderpriority")
      .orderBy("o_orderdate", "o_orderkey")
    val runW = Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(s, d)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .withColumn("first_seen", when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        sum("first_seen").over(runW).as("n_prio_seen")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact decimal money aggregation: doubles are cast to DECIMAL before
    * summing, so the group totals are exact (associativity-independent —
    * no float rounding drift at any parallelism) and need no rounding for
    * cross-engine parity. The 100 TB relevance: decimal sums make
    * partial-agg results reproducible run-to-run regardless of partition
    * count; float sums do not.
    */
  def q36DecimalAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag"),
        // round-then-cast: quantize the raw double in DOUBLE space first
        // so the per-row decimal cast cannot hit an engine-dependent
        // rounding tie (the doubles are identical bits in both engines).
        round(col("l_extendedprice"), 2).cast("decimal(18,2)").as("p"),
        round(col("l_discount"), 2).cast("decimal(18,4)").as("disc")
      )
      .groupBy("l_returnflag")
      .agg(
        // exact decimal sums; surfaced as double ONLY at the output edge
        // (the driver's pandas compare hashes pyarrow Decimal objects
        // differently from DuckDB's float64 decimals — equal values,
        // different hash). The double of an exact 2/4-dp decimal is the
        // same IEEE value in both engines.
        sum("p").cast("decimal(38,2)").cast("double").as("sum_price"),
        sum("disc").cast("decimal(38,4)").cast("double").as("sum_disc"),
        count(lit(1)).as("n")
      )
      .orderBy("l_returnflag")

  /** The relational ALL quantifier via NOT EXISTS, as identical SQL text
    * on both engines: suppliers none of whose lineitems carry a deep
    * discount (and who have shipped at least once — vacuous truth
    * excluded). Catalyst plans the two correlated subqueries as
    * anti/semi joins.
    */
  def q46ForallSuppliers(s: SparkSession, d: String): DataFrame = {
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val (vs, vl) = (s"graft_q46s_$sfx", s"graft_q46l_$sfx")
    Tables.supplier(s, d).createOrReplaceTempView(vs)
    Tables.lineitem(s, d).createOrReplaceTempView(vl)
    try s.sql(
      s"""SELECT s_suppkey, s_name FROM $vs
         |WHERE NOT EXISTS (SELECT 1 FROM $vl
         |  WHERE l_suppkey = s_suppkey AND l_quantity > 48 AND l_discount >= 0.095)
         | AND EXISTS (SELECT 1 FROM $vl WHERE l_suppkey = s_suppkey)
         |ORDER BY s_suppkey""".stripMargin
    )
    finally {
      s.catalog.dropTempView(vs)
      s.catalog.dropTempView(vl)
    }
  }

  /** Month-over-month growth per region: the time-series business metric
    * as a lag over the post-aggregation monthly series (regions × months
    * rows — window cost is nil after reduction). The ratio divides
    * pre-rounded revenues, so both engines divide identical doubles.
    */
  def q45MomGrowth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("r_name").orderBy("mth")
    Tables
      .orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), date_trunc("month", col("o_orderdate")).cast("date").as("mth"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .withColumn("mom", round(col("rev") / lag("rev", 1).over(w) - 1.0, 6))
      .select("r_name", "mth", "rev", "mom")
      .orderBy("r_name", "mth")
  }

  /** RFM customer segmentation (recency / frequency / monetary) WITHOUT a
    * global sort: quintile scores come from the four quantile thresholds
    * of each metric (one scalar-sized aggregate, broadcast back) instead
    * of a global ntile — the e12 de-skew pattern applied to scoring, so
    * nothing ever totals-orders the customer table. Thresholds come from
    * a BOUNDED Greenwald-Khanna summary (`approx_percentile`), not
    * Spark's exact `percentile` (which buffers the whole metric column
    * in one aggregation buffer — an OOM at 100 TB customer counts): GK
    * state is O(accuracy·log n) and partial-agg mergeable. q34_exact
    * discipline: at `accuracy` ≫ n the summary never compresses and each
    * threshold is EXACTLY the element at rank ceil(q·n) — the driver
    * gate runs that configuration against a sorted-list-index oracle;
    * the default's rank error ≤ n/accuracy is bounded in ScalaTest.
    * Threshold comparisons run on pre-rounded doubles, so both engines
    * score identically.
    */
  def q43Rfm(s: SparkSession, d: String, accuracy: Int = 10000): DataFrame = {
    val base = Tables
      .orders(s, d)
      .groupBy("o_custkey")
      .agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum("o_totalprice"), 2).as("monetary")
      )
    val mx = base.agg(max("last_day").as("mxd"))
    val withR = base
      .crossJoin(broadcast(mx))
      .withColumn("recency_days", datediff(col("mxd"), col("last_day")))
    // thresholds rounded identically on both engines BEFORE comparing, so
    // a data point exactly on a threshold can't flip buckets on the last
    // ulp of the interpolation arithmetic
    val th = withR.agg(
      expr(s"transform(approx_percentile(cast(recency_days as double), array(0.2D, 0.4D, 0.6D, 0.8D), $accuracy), x -> round(x, 4))")
        .as("tr"),
      expr(s"transform(approx_percentile(cast(frequency as double), array(0.2D, 0.4D, 0.6D, 0.8D), $accuracy), x -> round(x, 4))")
        .as("tf"),
      expr(s"transform(approx_percentile(cast(monetary as double), array(0.2D, 0.4D, 0.6D, 0.8D), $accuracy), x -> round(x, 4))")
        .as("tm")
    )
    def bucket(
        c: org.apache.spark.sql.Column,
        t: org.apache.spark.sql.Column
    ): org.apache.spark.sql.Column =
      lit(1) + when(c > t.getItem(0), 1).otherwise(0) + when(c > t.getItem(1), 1).otherwise(0) +
        when(c > t.getItem(2), 1).otherwise(0) + when(c > t.getItem(3), 1).otherwise(0)
    withR
      .crossJoin(broadcast(th))
      .select(
        col("o_custkey"),
        col("recency_days"),
        col("frequency"),
        col("monetary"),
        // low recency = recently active = best score
        (lit(6) - bucket(col("recency_days").cast("double"), col("tr"))).as("r_score"),
        bucket(col("frequency").cast("double"), col("tf")).as("f_score"),
        bucket(col("monetary"), col("tm")).as("m_score")
      )
      .orderBy("o_custkey")
  }

  /** NOT IN three-valued-logic semantics, run as IDENTICAL SQL text on
    * both engines: a NULL planted in the subquery list (nullif) makes
    * `x NOT IN (...)` never-true for every row — the classic silent-
    * empty-result trap — while the null-stripped list returns the real
    * anti-join count. Both counts in one row pin the semantics.
    */
  def q42NotInNull(s: SparkSession, d: String): DataFrame = {
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val (vc, vo) = (s"graft_q42c_$sfx", s"graft_q42o_$sfx")
    Tables.customer(s, d).createOrReplaceTempView(vc)
    Tables.orders(s, d).createOrReplaceTempView(vo)
    try s.sql(
      s"""SELECT
         | (SELECT count(*) FROM $vc
         |   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM $vo)) AS n_with_null,
         | (SELECT count(*) FROM $vc
         |   WHERE c_custkey NOT IN (SELECT o_custkey FROM $vo WHERE o_custkey <> 7)) AS n_without_null""".stripMargin
    )
    finally {
      s.catalog.dropTempView(vc)
      s.catalog.dropTempView(vo)
    }
  }

  /** Share-of-total (ratio-to-report): each nation's revenue as a share
    * of its region's total, via a window SUM over the 25-row aggregate —
    * the window runs AFTER reduction, so it costs nothing at any scale.
    * Shares divide the already-rounded per-nation totals, so both engines
    * divide bit-identical doubles.
    */
  def q41ShareOfTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("r_name")
    Tables
      .orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .withColumn("region_share", round(col("revenue") / sum("revenue").over(w), 6))
      .select("r_name", "n_name", "revenue", "region_share")
      .orderBy("r_name", "n_name")
  }

  /** LATERAL join (correlated table subquery with ORDER BY + LIMIT) as
    * identical SQL text on both engines — the q46 discipline applied to
    * the per-row-subquery idiom: top-2 nations by revenue within each
    * region. Catalyst decorrelates the lateral into a ranked join (no
    * per-row re-execution), so the shape stays one shuffle + one window
    * at any scale.
    */
  def q50LateralTopn(s: SparkSession, d: String): DataFrame = {
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val (vr, vn, vc, vo) =
      (s"graft_q50r_$sfx", s"graft_q50n_$sfx", s"graft_q50c_$sfx", s"graft_q50o_$sfx")
    Tables.region(s, d).createOrReplaceTempView(vr)
    Tables.nation(s, d).createOrReplaceTempView(vn)
    Tables.customer(s, d).createOrReplaceTempView(vc)
    Tables.orders(s, d).createOrReplaceTempView(vo)
    try s.sql(
      s"""SELECT r_name, n_name, rev FROM $vr,
         | LATERAL (SELECT n_name, round(sum(o_totalprice), 2) AS rev
         |   FROM $vn, $vc, $vo
         |   WHERE n_regionkey = r_regionkey AND c_nationkey = n_nationkey
         |     AND o_custkey = c_custkey
         |   GROUP BY n_name ORDER BY rev DESC, n_name LIMIT 2)
         |ORDER BY r_name, rev DESC, n_name""".stripMargin
    )
    finally Seq(vr, vn, vc, vo).foreach(s.catalog.dropTempView)
  }

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) over the
    * customer-vs-supplier nation multisets: each nation keeps
    * min(|c|,|s|) copies in the intersection and max(0,|c|-|s|) copies
    * in the difference — semantics DISTINCT set-ops destroy. Catalyst
    * plans both as a single hash aggregate per side plus a generate
    * (replicate) — one shuffle each, no join. The output aggregates the
    * multiplicities so the result is count-verifiable, not a duplicate
    * blob.
    */
  def q49SetopsAll(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    val bag = cn
      .intersectAll(sn)
      .withColumn("tag", lit("both_bag"))
      .unionAll(cn.exceptAll(sn).withColumn("tag", lit("customer_extra")))
    bag
      .groupBy("nk", "tag")
      .agg(count(lit(1)).as("n"))
      .orderBy("tag", "nk")
  }

  /** Quartile banding via NTILE inside each market segment. The window
    * orders on (acctbal, custkey) so tile assignment is total-order
    * deterministic, and the sort is per-segment, not global. At 100 TB
    * prefer the q43 percentile-threshold pattern (no sort at all); NTILE
    * stays in the surface because its "equal-count bands" semantics
    * (earlier tiles absorb remainders) is what BI users actually ask for
    * and is not reproducible from thresholds when duplicates straddle a
    * boundary.
    */
  def q47Ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables
      .customer(s, d)
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("c_mktsegment", "quartile")
      .agg(
        count(lit(1)).as("n"),
        round(min("c_acctbal"), 2).as("lo"),
        round(max("c_acctbal"), 2).as("hi")
      )
      .orderBy("c_mktsegment", "quartile")
  }

  /** Wide→long reshape (UNPIVOT/MELT): the per-flag revenue components
    * land as (flag, measure, amount) rows via `Dataset.unpivot`, which
    * Catalyst expands to a zero-shuffle generator over the 3-row
    * aggregate — all real work is the one map-side-combined groupBy.
    * Amounts quantize per-line to decimal(18,6) before summing (the q3
    * discipline) so totals are associativity-independent at any
    * parallelism.
    */
  def q48Unpivot(s: SparkSession, d: String): DataFrame = {
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(18,6)")).cast("decimal(38,2)").cast("double")
    val wide = Tables
      .lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        dsum(col("l_extendedprice")).as("gross"),
        dsum(col("l_extendedprice") * col("l_discount")).as("discount_amt"),
        dsum(col("l_extendedprice") * col("l_tax")).as("tax_amt")
      )
    wide
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("gross"), col("discount_amt"), col("tax_amt")),
        "measure",
        "amount"
      )
      .orderBy("l_returnflag", "measure")
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE order days per
    * customer via the row_number-delta trick — a day minus its per-key
    * rank is constant exactly within a consecutive run, so islands fall
    * out of one partitioned window pass + one groupBy. No self-join, no
    * iteration, and nothing ever holds more than one customer's day list
    * (both steps partition on o_custkey), so the shape is unchanged at
    * 100 TB.
    */
  def q40GapsIslands(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day")
    Tables
      .orders(s, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(min("day").as("run_start"), max("day").as("run_end"), count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .select("o_custkey", "run_start", "run_end", "n_days")
      .orderBy("o_custkey", "run_start")
  }

  /** q51: RECURSIVE HIERARCHY CLOSURE — the `WITH RECURSIVE` workload
    * (org charts, BOM explosions, referral trees) Spark SQL has no
    * native construct for, expressed as distributed transitive closure
    * by REPEATED SQUARING: each round joins the closure-so-far with
    * itself (`R ∪ R∘R`), so path lengths double per round and a
    * depth-D forest closes in ⌈log₂D⌉ joins — not D sequential steps
    * like the textbook frontier walk. Every round is one equi-join +
    * distinct (both shuffle on ancestor keys), with `localCheckpoint()`
    * truncating the lineage so the plan doesn't grow with iterations —
    * the shape that survives a 1000-executor graph. The forest is
    * data-derived (parent(k) = md5-hash(k) mod k — strictly smaller, so
    * acyclic with root 0) and the closure powers the two canonical
    * hierarchy analytics: node depth (max ancestor distance) and
    * subtree size (descendant count + self). The oracle replays it as a
    * genuine DuckDB recursive CTE, so the log-round plan is value-pinned
    * against the sequential semantics. Full-closure row count is
    * n·avg-depth (≈ n·ln n here); when only root/depth is needed at
    * extreme scale, pointer doubling over the (k, anc, d) triple alone
    * drops that to O(n) per round — same join shape.
    *
    * Round 19 (r18 VERDICT item 8): FRONTIER-ONLY squaring. The parent
    * function is a forest, so each (k, anc) pair lies on k's unique
    * ancestor path at exactly one distance d — after round i the
    * closure is complete for d ≤ 2^i, and every pair at
    * d ∈ (2^i, 2^(i+1)] splits as a first hop of EXACTLY 2^i (a pair in
    * the round-i delta, which covers (2^(i-1), 2^i]) composed with a
    * closure hop of d − 2^i ≤ 2^i. So joining only the DELTA against
    * the closure and keeping d > 2^i yields exactly the next delta:
    * the old `union().distinct()` + checkpoint + count over the ENTIRE
    * closure each round (the dominant shuffle at scale — closure is
    * n·avg-depth rows, the delta a sliver of it) becomes a distinct
    * over the delta alone, and the disjoint deltas concatenate into the
    * closure with no dedup pass at all. Same ⌈log₂D⌉ rounds, same
    * three-way value pin (q79 native recursion + the DuckDB recursive
    * oracle).
    */
  def q51Hierarchy(s: SparkSession, d: String): DataFrame = {
    val custs = Tables.customer(s, d).select(col("c_custkey"))
    val h = conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10).cast("long")
    val par = custs
      .filter(col("c_custkey") > 0)
      .select(col("c_custkey").as("k"), (h % col("c_custkey")).as("anc"), lit(1L).as("d"))
    var delta = par.localCheckpoint()
    var closure = delta
    var reach = 1L // closure is complete for all d <= reach
    var deltaN = delta.count()
    var iter = 0
    while (deltaN > 0 && iter < 40) {
      val right = closure.select(col("k").as("r_k"), col("anc").as("r_anc"), col("d").as("r_d"))
      val next = delta
        .join(right, delta("anc") === right("r_k"))
        .select(col("k"), col("r_anc").as("anc"), (col("d") + col("r_d")).as("d"))
        .filter(col("d") > reach)
        .distinct()
        .localCheckpoint()
      deltaN = next.count()
      if (deltaN > 0) {
        closure = closure.unionByName(next)
        delta = next
        reach *= 2
      }
      iter += 1
    }
    val depths = closure.groupBy("k").agg(max("d").as("depth"))
    val subtree = closure.groupBy(col("anc").as("k2")).agg(countDistinct("k").as("n_desc"))
    custs
      .join(depths, col("c_custkey") === col("k"), "left")
      .join(subtree, col("c_custkey") === col("k2"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("depth"), lit(0L)).as("depth"),
        (coalesce(col("n_desc"), lit(0L)) + 1).as("subtree_size")
      )
      .orderBy("c_custkey")
  }

  /** q79 (round 18): NATIVE RECURSIVE CTE — Spark 4 added `WITH
    * RECURSIVE` (the construct q51's scaladoc long noted Spark lacked),
    * so the same hierarchy closure now runs as the engine's OWN
    * iterative union-loop: anchor = direct parents, recursive step =
    * one equi-join per level, depth/subtree analytics on the
    * materialized walk. Pinned THREE ways to one answer: this native
    * form, q51's log-round repeated-squaring closure (⌈log₂D⌉ joins vs
    * the native loop's D — at a 1000-executor depth-D forest the
    * squaring form wins rounds, the native form wins simplicity), and
    * the DuckDB recursive oracle (q51's SQL verbatim). The parent
    * function is the same data-derived md5 forest, spelled with Spark's
    * `conv(hex,16,10)` against DuckDB's `CAST('0x'||hex)` — the one
    * engine-syntax fork, value-identical.
    */
  def q79RecursiveNative(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("q79_customer")
    s.sql(
      """WITH RECURSIVE
        |par AS (SELECT c_custkey AS k,
        |  CASE WHEN c_custkey = 0 THEN NULL
        |   ELSE CAST(conv(substr(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10) AS BIGINT)
        |        % c_custkey
        |  END AS p
        | FROM q79_customer),
        |walk(k, anc, dist) AS (
        | SELECT k, p, 1 FROM par WHERE p IS NOT NULL
        | UNION ALL
        | SELECT w.k, pp.p, w.dist + 1 FROM walk w JOIN par pp ON pp.k = w.anc
        | WHERE pp.p IS NOT NULL),
        |dep AS (SELECT k, max(dist) AS depth FROM walk GROUP BY 1),
        |st AS (SELECT anc AS k, count(DISTINCT walk.k) AS n_desc FROM walk GROUP BY 1)
        |SELECT p.k AS c_custkey,
        | CAST(COALESCE(dep.depth, 0) AS BIGINT) AS depth,
        | CAST(COALESCE(st.n_desc, 0) + 1 AS BIGINT) AS subtree_size
        |FROM par p LEFT JOIN dep ON dep.k = p.k LEFT JOIN st ON st.k = p.k
        |ORDER BY 1""".stripMargin
    )
  }

  /** q52: MARKET SHARE (TPC-H Q8 shape on the available tables) — per
    * order-year, the share of lineitem revenue supplied by suppliers
    * whose nation sits in one region. The canonical share-of-total over
    * a star: ONE fact-fact shuffle join (lineitem ⋈ orders on orderkey —
    * both sides hash on the key, AQE handles skew), every dimension
    * (supplier→nation→region flag) folded into a broadcast before
    * touching the fact stream, and the share computed by CONDITIONAL
    * aggregation in the same single groupBy pass (`sum(when(asia))` /
    * `sum(all)`) — not a self-join of two filtered aggregates, which
    * would scan and shuffle the facts twice. Revenue terms ride
    * decimal(18,6) before the sums (q3's associativity-free discipline)
    * so the share's numerator/denominator are engine-exact; the final
    * division happens once per year-row on exact decimals.
    */
  def q52MarketShare(s: SparkSession, d: String): DataFrame = {
    val supFlag = Tables
      .supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), (col("r_name") === "ASIA").as("is_asia"))
    val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
    Tables
      .lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supFlag), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(rev).cast("decimal(38,2)").as("total"),
        sum(when(col("is_asia"), rev).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("decimal(38,2)")
          .as("asia")
      )
      .select(
        col("o_year"),
        col("total").cast("double").as("total_revenue"),
        col("asia").cast("double").as("asia_revenue"),
        // divide as DOUBLES (both engines cast the same exact 2dp
        // decimals to identical doubles): decimal-division scale rules
        // differ across engines, IEEE division doesn't
        round(col("asia").cast("double") / col("total").cast("double"), 6).as("asia_share")
      )
      .orderBy("o_year")
  }

  /** q53: INTERVAL CONCURRENCY (sweep-line) — how many order lines are
    * "in fulfillment" (order placed, not yet shipped: the real interval
    * `[o_orderdate, l_shipdate)`) on any given day, reported as the
    * per-month peak and its earliest peak day. The classic interval-
    * overlap question answered WITHOUT an interval join: each line
    * contributes a +1 delta at its start day and a −1 at its end day,
    * deltas collapse to DAY grain in one keyed aggregate riding the
    * single fact-fact equi-join (lineitem ⋈ orders, AQE-skew-handled),
    * and concurrency is a running sum over the day-grain table. The
    * unpartitioned window is over CALENDAR DAYS — a few thousand rows
    * bounded by the date range, not by fact volume, so it is
    * scale-independent (the 100 TB cost is the join + day-grain
    * aggregate, both keyed shuffles). Peak-day tie-break: earliest.
    */
  /** q54: CO-PURCHASE PAIRS (frequent-itemset support at k=2) — the
    * market-basket staple: parts appearing together on the same order,
    * kept at support ≥ minOrders. The pair generation is a per-order
    * self-join of the DISTINCT (order, part) rows with `pa < pb` — its
    * fanout is lines-per-order², bounded by basket size (TPC-H ≤ 7),
    * NOT by table volume, so at 100 TB this is one distinct aggregate +
    * one keyed self-join + one pair count, all equi-shuffles on the
    * order key. The naive all-pairs-of-parts formulation would be
    * |parts|² — never built.
    */
  def q54Copurchase(s: SparkSession, d: String, minOrders: Long = 2L): DataFrame = {
    val op = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("part_b")), "l_orderkey")
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minOrders)
      .orderBy("part_a", "part_b")
  }

  def q53IntervalOverlap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = Tables
      .lineitem(s, d)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_day"))
      .join(
        Tables.orders(s, d).select(col("o_orderkey"), to_date(col("o_orderdate")).as("open_day")),
        col("l_orderkey") === col("o_orderkey")
      )
    val deltas = spans
      .select(col("open_day").as("day"), lit(1L).as("delta"))
      .unionAll(spans.select(col("ship_day").as("day"), lit(-1L).as("delta")))
      .groupBy("day")
      .agg(sum("delta").as("net"))
    val conc = deltas.withColumn(
      "open_lines",
      sum("net").over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    val monthly = conc.withColumn("month", trunc(col("day"), "month"))
    val peaks = monthly.groupBy("month").agg(max("open_lines").as("peak_open"))
    monthly
      .join(peaks, "month")
      .filter(col("open_lines") === col("peak_open"))
      .groupBy("month", "peak_open")
      .agg(min("day").as("peak_day"))
      .select("month", "peak_open", "peak_day")
      .orderBy("month")
  }

  /** q55: WEIGHTED MEDIAN per group — the order statistic where the
    * weight (shipped quantity), not the row count, reaches half its
    * group total: the "typical price per shipped unit" a pricing
    * dashboard wants when line items carry very different volumes.
    * Shape: ONE shuffle on the group key, then two window passes over
    * the SAME partitioning (cumulative weight under a total order;
    * group-total weight over the unbounded frame — Spark reuses the
    * exchange, no second shuffle), a filter at the crossing point, and
    * a min-reduce. Exactness: `l_quantity` is integral, so the
    * cumulative and total weights are exact BIGINT sums — the
    * `2·cum ≥ tot` crossing test never sits on a floating-point ulp —
    * and the (price, orderkey, linenumber) tiebreak makes the
    * cumulative sequence a total order, so both engines cross at the
    * IDENTICAL row. Keyed by supplier (cardinality grows with the
    * data, so partitions stay balanced at 100 TB); for the
    * low-cardinality-group version of this question use the GK/KLL
    * sketch family (q34/c11) instead of an exact window.
    */
  def q55WeightedMedian(s: SparkSession, d: String): DataFrame = {
    val li = Tables
      .lineitem(s, d)
      .select(
        col("l_suppkey"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"),
        col("l_linenumber")
      )
    val ord = Window
      .partitionBy("l_suppkey")
      .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
    val whole = Window.partitionBy("l_suppkey")
    li.withColumn("cum", sum("qty").over(ord))
      .withColumn("tot", sum("qty").over(whole))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_suppkey")
      .agg(
        round(min("price"), 2).as("w_median"),
        max("tot").as("total_qty")
      )
      .orderBy("l_suppkey")
  }

  /** q56: SOLE-BLAME SUPPLIER (TPC-H Q21's shape on the available
    * columns) — suppliers who were the ONLY late shipper in a
    * multi-supplier order. The textbook form is a correlated
    * EXISTS(other supplier) + NOT EXISTS(other LATE supplier) pair —
    * two extra fact self-joins; here both quantifiers collapse into
    * ONE conditional-aggregation pass over the order grain
    * (`countDistinct(supp)`, `countDistinct(late supp)`, and
    * `max(late supp)` which IS the blamed supplier exactly when the
    * late-count is 1), so the plan is a single fact-fact shuffle join
    * (lineitem ⋈ orders on the order key) plus one groupBy — the
    * rewrite every serious optimizer hopes to reach, stated directly.
    * Supplier names arrive by broadcast at the very end, order-grain
    * rows only.
    */
  def q56BlameSupplier(s: SparkSession, d: String, graceDays: Int = 90): DataFrame = {
    val late = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > graceDays
    // two-level aggregation instead of two countDistincts in one pass:
    // distinct-aggregates share an Expand operator (x2 the fact rows
    // through the shuffle); reducing to (order, supplier) grain first
    // shrinks the second shuffle to supplier-grain rows and needs no
    // Expand at all. Hash-identical output, measured ~40% faster (2.4 s -> 1.4 s at sf0.1).
    val g = Tables
      .lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey")
      )
      .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("supp_late"))
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late"),
        max(when(col("supp_late"), col("l_suppkey"))).as("blamed")
      )
    g.filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(s, d)), col("blamed") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(25)
  }

  /** q57: REVENUE DECILE LIFT — the marketing-analytics staple: rank
    * customers by total spend, cut into ntile(10) deciles, and report
    * each decile's revenue share plus the cumulative (lift) curve
    * ("the top decile holds X% of revenue"). Spend totals are
    * decimal(18,2)-quantized (o_totalprice is 2 dp, so the sums are
    * EXACT and the decile cut never moves on a float ulp). The global
    * rank is computed SCALE-SAFELY (the round-11 verdict's fix) by
    * [[ScaleRank.withRank]]: a distributed range sort on (spend desc,
    * custkey), per-partition `row_number` windows (parallel — every
    * WindowExec partitioned by `pid`), offsets stitched from the
    * metadata-sized per-partition count table (no driver collect
    * anywhere). `decile(rank, N)` is then the
    * closed-form ntile: the first N mod 10 tiles take ⌈N/10⌉ rows.
    * Identical output to a global `ntile(10)` window, but no
    * single-task sort — at 1.5 B customers the heavy lifting is an
    * ordinary range-partitioned sort. The cumulative (lift) curve
    * folds over the 10-row tile table with a broadcast triangular
    * self-join, so the whole plan has zero unpartitioned windows.
    */
  def q57DecileLift(s: SparkSession, d: String): DataFrame = {
    val spend = Tables
      .orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice"), 2).cast("decimal(18,2)")).as("spend"))
    val nTot = spend.agg(count(lit(1)).as("n_total"))
    // closed-form ntile(10) from the scale-safe rank: the first
    // n mod 10 tiles take ⌈n/10⌉ rows (all tile math rides a 1-row
    // broadcast, so there is no driver-side count either)
    val qSize = floor(col("n_total") / 10)
    val mBig = col("n_total") % 10
    val bigCut = (qSize + 1) * mBig
    val ranked = ScaleRank
      .withRank(spend, Seq.empty, Seq(desc("spend"), col("o_custkey")), "rank")
      .crossJoin(broadcast(nTot))
      .withColumn(
        "decile",
        when(
          col("rank") <= bigCut,
          floor((col("rank") - 1) / (qSize + 1)) + 1
        ).otherwise( // qSize=0 ⇒ bigCut=n ⇒ branch unreachable; greatest(,1) keeps the expr total
          mBig + floor((col("rank") - 1 - bigCut) / greatest(qSize, lit(1L))) + 1
        )
          .cast("int")
      )
    val tiles = ranked
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_customers"),
        sum("spend").as("rev")
      )
      .localCheckpoint() // 10 rows; reused by the total + triangular fold
    val total = tiles.agg(sum("rev").as("total_rev"))
    val cum = tiles
      .select(col("decile").as("d2"), col("rev").as("rev2"))
      .join(broadcast(tiles), col("d2") <= col("decile"))
      .groupBy("decile", "n_customers", "rev")
      .agg(sum("rev2").as("cum_rev"))
    cum
      .crossJoin(broadcast(total))
      .select(
        col("decile"),
        col("n_customers"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("total_rev").cast("double"), 6).as("share"),
        round(col("cum_rev").cast("double") / col("total_rev").cast("double"), 6).as("cum_share")
      )
      .orderBy("decile")
  }

  /** q58: SKYLINE (Pareto frontier) — the parts no other part beats on
    * BOTH axes (lower price, larger size; one strictly): the classic
    * multi-criteria shortlist ("cheapest part at every capability
    * level"). The definitional form is an O(n²) NOT-EXISTS anti-join;
    * the 2-D structure admits an exact LINEAR plan instead: per-size
    * min price (one keyed aggregate), suffix-min over strictly larger
    * sizes (a window over the SIZE-grain table — bounded by attribute
    * cardinality, never corpus size), broadcast back, one corpus
    * filter. A part survives iff it carries its size's min price AND
    * every larger size costs strictly more (equal price at a larger
    * size dominates; equal price at the SAME size does not — ties all
    * survive, matching strict-dominance semantics). Zero self-joins,
    * zero corpus-sized windows — at 10¹⁰ parts this is two scans and
    * a KB-sized broadcast.
    */
  def q58Skyline(s: SparkSession, d: String): DataFrame = {
    val p = Tables
      .part(s, d)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice").as("price"))
    val mins = p.groupBy("p_size").agg(min("price").as("mn"))
    val w = Window.orderBy(desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = mins.withColumn("above", min("mn").over(w))
    p.join(broadcast(frontier), "p_size")
      .filter(col("price") === col("mn") && (col("above").isNull || col("price") < col("above")))
      .select(col("p_partkey"), col("p_size"), col("price"))
      .orderBy("p_size", "p_partkey")
  }

  /** q60: ABC (PARETO) CLASSIFICATION — parts bucketed by cumulative
    * revenue share under a (revenue desc, partkey) total order: class A
    * holds the first 80% of revenue, B to 95%, C the tail (the
    * inventory-analysis staple, and the warehouse twin of q57's decile
    * lift). Since round 14 the cumulative sum is the PLAIN global
    * window — the decimal GlobalPrefixSum rewrite plans it as a range
    * exchange + BigDecimal partial stitch (no single-task window, no
    * ScaleRank scaffolding needed). Class boundaries compare cum·100 ≤
    * total·80 in DECIMAL (revenue is (18,2)-exact), so the cut can
    * never move on a float ulp; shares go double only in the final
    * report row.
    */
  def q60AbcClass(s: SparkSession, d: String): DataFrame = {
    val rev = Tables
      .lineitem(s, d)
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice"), 2).cast("decimal(18,2)")).as("rev"))
    val tot = rev.agg(sum("rev").as("total_rev"))
    val w = Window
      .orderBy(desc("rev"), col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum_rev", sum("rev").over(w))
      .crossJoin(broadcast(tot))
      .withColumn(
        "abc_class",
        when(col("cum_rev") * 100 <= col("total_rev") * 80, "A")
          .when(col("cum_rev") * 100 <= col("total_rev") * 95, "B")
          .otherwise("C")
      )
      .groupBy("abc_class")
      .agg(
        count(lit(1)).as("n_parts"),
        // r17: decimal internal, DOUBLE at the gate edge (the r16 driver
        // run proved DECIMAL finals hit the harness's trailing-zero
        // canon; a class revenue lands on x.x0 with prob ~1/10)
        sum("rev").cast("decimal(18,2)").cast("double").as("revenue"),
        round(sum("rev").cast("double") / first("total_rev").cast("double"), 6).as("share")
      )
      .orderBy("abc_class")
  }

  /** q59: SEMI-ADDITIVE MEASURE — closing-balance-style aggregation,
    * the warehouse staple a plain SUM gets wrong: each customer's
    * "balance" is the totalprice of their LATEST order in a month,
    * carried forward through inactive months until their next order;
    * the report is per-month total book and account count. Scale
    * discipline: the carry-forward is NOT a customer×months blow-up —
    * per-customer validity intervals [month, next_active_month) are
    * aggregated to (from, to) grain FIRST (balances are additive
    * across customers, so the interval table collapses to ≤ months²
    * rows no matter how many customers), and only that model-sized
    * table meets the month spine in a broadcast range join. Spend is
    * decimal(18,2)-exact; the spine is the DISTINCT active months
    * (tiny, derived not generated — both engines see the same set).
    */
  def q59SemiAdditive(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        col("o_orderdate"),
        col("o_orderkey"),
        // integer-cents discipline: the raw double is quantized to exact
        // long cents (x*100 is within 1e-4 of an integer for 2-dp money,
        // so round() is tie-free and bit-identical in every engine). No
        // double→decimal cast anywhere — the round-12 driver hash-FAIL on
        // this query was unreproducible locally, so the money path is now
        // engine-cast-independent end to end; long sums are exact to
        // ~9·10^16 dollars.
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
    val wLatest = Window
      .partitionBy("o_custkey", "m")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    val balances = o
      .withColumn("_rn", row_number().over(wLatest))
      .filter(col("_rn") === 1)
      .select(col("o_custkey"), col("m"), col("cents").as("balance"))
    val wNext = Window.partitionBy("o_custkey").orderBy("m")
    val intervals = balances
      .withColumn("m_to", lead("m", 1).over(wNext))
      // collapse customers out BEFORE the range join: (from, to) grain
      .groupBy("m", "m_to")
      .agg(sum("balance").as("bal"), count(lit(1)).as("n_accts"))
    val spine = o.select(col("m").as("sm")).distinct()
    intervals
      .join(
        broadcast(spine),
        col("sm") >= col("m") && (col("m_to").isNull || col("sm") < col("m_to"))
      )
      .groupBy(col("sm").as("month"))
      .agg(
        sum("n_accts").as("n_accounts"),
        // exact long cents → double only at the report edge (sums are far
        // below 2^53 cents, so the division is the same IEEE value in any
        // engine; no decimal cast to disagree about)
        (sum("bal") / lit(100.0)).as("book_balance")
      )
      .orderBy("month")
  }

  /** q61: COHORT LTV MATRIX — the subscription-analytics staple: pivot
    * every customer onto (cohort = first-order month, age = months since
    * cohort) and report active accounts + revenue per cell. Scale shape:
    * the first-order table is ONE groupBy on o_custkey, the re-join is
    * custkey↔custkey (both sides shuffle-partitioned on the same key, so
    * AQE plans a co-partitioned join, no broadcast of the big side
    * needed), and the output is model-sized (months × ages). Money rides
    * q59's integer-cents discipline end to end.
    */
  def q61CohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
    val cohorts = o.groupBy("o_custkey").agg(min("m").as("cohort_month"))
    o.join(cohorts, "o_custkey")
      .withColumn(
        "age_months",
        ((year(col("m")) - year(col("cohort_month"))) * 12 +
          (month(col("m")) - month(col("cohort_month")))).cast("int")
      )
      .groupBy("cohort_month", "age_months")
      .agg(
        countDistinct("o_custkey").as("n_active"),
        (sum("cents") / lit(100.0)).as("revenue")
      )
      .orderBy("cohort_month", "age_months")
  }

  /** q62: REPURCHASE-INTERVAL CURVE — the distribution of days between a
    * customer's consecutive orders, bucketed into weeks (capped at 26+),
    * the retention-modeling input every growth team derives. One window
    * per customer (keyed — no global sort), then a model-sized histogram
    * groupBy; share is integer-count division at the report edge.
    */
  def q62RepurchaseCurve(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables
      .orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev_d", lag("o_orderdate", 1).over(w))
      .filter(col("prev_d").isNotNull)
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_d")))
      .withColumn("week_bucket", least(floor(col("gap_days") / 7), lit(26L)).cast("int"))
    val tot = gaps.agg(count(lit(1)).as("n_total"))
    gaps
      .groupBy("week_bucket")
      .agg(
        count(lit(1)).as("n_gaps"),
        min("gap_days").cast("int").as("min_days"),
        max("gap_days").cast("int").as("max_days")
      )
      .crossJoin(broadcast(tot))
      .withColumn("share", round(col("n_gaps").cast("double") / col("n_total"), 6))
      .drop("n_total")
      .orderBy("week_bucket")
  }

  /** q63: BRIDGE-TABLE REVENUE ALLOCATION with exact largest-remainder
    * rounding — the warehouse many-to-many staple: each order's
    * totalprice is allocated to its suppliers proportionally to their
    * line revenue, in EXACT integer cents (floor shares via
    * B·lineᵢ ÷ T, then the leftover cents handed out by descending
    * remainder — Hamilton's method), so allocations per order sum to
    * the order total TO THE CENT, the invariant float proration always
    * breaks. All windows are keyed per order (basket-bounded groups);
    * the report is one supplier-grain aggregate. Money never touches a
    * double until the final /100 report edge.
    */
  def q63SupplierAllocation(s: SparkSession, d: String): DataFrame = {
    val li = Tables
      .lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("lc")
      )
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum("lc").as("ls"))
    val o = Tables
      .orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("b"))
    val wOrder = Window.partitionBy("l_orderkey")
    val wRank = Window
      .partitionBy("l_orderkey")
      .orderBy(desc("frac"), col("l_suppkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("t", sum("ls").over(wOrder))
      // B·ls ≤ ~5e7 · ~5e7 = 2.5e15 ≪ 2^63 — exact long products
      .withColumn("fa", expr("(b * ls) div t")) // integral division: floor
      .withColumn("frac", (col("b") * col("ls")) % col("t"))
      .withColumn("leftover", col("b") - sum("fa").over(wOrder))
      .withColumn("rk", row_number().over(wRank))
      .withColumn("alloc", col("fa") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum("alloc") / lit(100.0)).as("allocated"),
        (sum("ls") / lit(100.0)).as("line_revenue")
      )
      .orderBy("l_suppkey")
  }

  /** q64: ROLLUP WITH SHARE-OF-PARENT — the drill-down report where
    * every (returnflag, linestatus) cell also shows its share of the
    * flag subtotal and each subtotal its share of the grand total (the
    * "% of parent" column OLAP front-ends bolt onto every rollup): ONE
    * rollup pass (partial-aggregated), then the three grains split by
    * `grouping_id` and parents re-attached by broadcast equi-joins —
    * the rollup output is grains-sized, so the share joins are
    * metadata-scale no matter the fact volume. Quantities are exact
    * integer sums (round-then-long); shares are single rounded
    * divisions at the edge.
    */
  def q64RollupShare(s: SparkSession, d: String): DataFrame = {
    val base = Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag"),
        col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("q")
      )
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("q").as("qty"), count(lit(1)).as("n"), grouping_id().as("gid"))
    val leaves = base.filter(col("gid") === 0)
    val flagTot = base
      .filter(col("gid") === 1)
      .select(col("l_returnflag").as("p_flag"), col("qty").as("flag_qty"))
    val grand = base.filter(col("gid") === 3).select(col("qty").as("grand_qty"))
    val leafRows = leaves
      .join(broadcast(flagTot), col("l_returnflag") === col("p_flag"))
      .crossJoin(broadcast(grand))
      .select(
        col("l_returnflag"),
        col("l_linestatus"),
        col("qty"),
        col("n"),
        lit("leaf").as("grain"),
        round(col("qty").cast("double") / col("flag_qty"), 6).as("share_of_parent")
      )
    val flagRows = base
      .filter(col("gid") === 1)
      .crossJoin(broadcast(grand))
      .select(
        col("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"),
        col("qty"),
        col("n"),
        lit("subtotal").as("grain"),
        round(col("qty").cast("double") / col("grand_qty"), 6).as("share_of_parent")
      )
    val grandRow = base
      .filter(col("gid") === 3)
      .select(
        lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"),
        col("qty"),
        col("n"),
        lit("total").as("grain"),
        lit(1.0).as("share_of_parent")
      )
    leafRows
      .unionByName(flagRows)
      .unionByName(grandRow)
      .orderBy(col("grain"), col("l_returnflag"), col("l_linestatus"))
  }

  /** q65 (round 14, rebuilt round 16): GLOBAL CUMULATIVE REVENUE — the
    * running book-total a finance dashboard draws, one row per order
    * under the (date, orderkey) total order. Written as the PLAIN
    * window (`sum OVER (ORDER BY …)` with no PARTITION BY) precisely
    * because the GlobalPrefixSum rewrite fans it out: stock Spark would
    * funnel every order through ONE task. Round 16 moved the money off
    * decimals entirely: rounds 14–15 were driver-hash-red while rows
    * and schema matched, and the only oracle-relevant step unique to
    * q65 was `round(double, 2) → DECIMAL(18,2)` — its exact-cents
    * siblings q70/q72 (same table, same window machinery, same total
    * order) were green both rounds. So q65 now rides the PROVEN path:
    * price as `round(o_totalprice * 100)` exact integer cents, prefix
    * sum on BIGINT, both columns emitted as BIGINT. The rounded-double
    * →decimal primitive moves to the pb* canon-probe battery, and the
    * decimal prefix-sum exec leg stays hash-gated via q73 (decimals
    * born exact from integer cents, never from a rounded double).
    */
  def q65CumRevenue(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents")
      )
    val w = Window
      .orderBy(col("o_date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("cum_cents", sum("price_cents").over(w))
      .orderBy("o_date", "o_orderkey")
  }

  /** q73 (round 16): DECIMAL PREFIX-SUM GATE — the data-grain hash gate
    * for the GlobalPrefixSum DECIMAL leg that q65 used to carry. The
    * input decimals are BORN EXACT FROM INTEGER CENTS
    * (`CAST(round(price*100) AS DECIMAL(18,2))`, an integral-valued
    * decimal both engines construct identically) — never from
    * `round(double, 2)`, the one primitive unique to the old
    * twice-red q65 (see pb07/pb08 probes). Partition partials stitch
    * in unbounded BigDecimal inside GlobalPrefixSumExec; the output is
    * cast back to the portable ≤(18,x) surface with a raise_error
    * guard so overflow is LOUD on either engine (book total in
    * cents-valued decimal at gated SFs ~2.3e11, 4 spare digits).
    *
    * Round 17: the FINAL projection re-emits both decimal columns as
    * BIGINT cents (`CAST(dec AS BIGINT)` — exact: the decimals are
    * integral CENTS-valued by construction). The round-16 driver run
    * proved the hash red was the harness's DECIMAL canonicalization on
    * trailing-zero values (pb10 6.60 / pb11 12345.00 red, pb04/pb05/
    * pb08 green), so DECIMAL never crosses the gate edge; the decimal
    * GlobalPrefixSum leg is still value-gated EXACTLY — the cents are
    * derived FROM the decimal cumulative sum, any decimal-side error
    * changes the BIGINT surface one-for-one. Plan pin unchanged
    * (Round16Spec asserts the decimal exec + (18,2) internal type).
    */
  def q73CentsDecimal(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").cast("decimal(18,2)").as("price_dec")
      )
    val w = Window
      .orderBy(col("o_date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lim = lit(BigDecimal("10000000000000000")) // 1e16 = decimal(18,2) bound
    o.withColumn("cum_wide", sum("price_dec").over(w))
      .withColumn(
        "cum_dec",
        when(abs(col("cum_wide")) < lim, col("cum_wide").cast("decimal(18,2)"))
          .otherwise(
            raise_error(
              concat(lit("q73 cum_dec overflows decimal(18,2): "), col("cum_wide").cast("string"))
            ).cast("decimal(18,2)")
          )
      )
      .drop("cum_wide")
      // portable gate edge: decimal internal, BIGINT cents out. The
      // decimal→long casts TRUNCATE on Spark while DuckDB's
      // decimal→bigint ROUNDS — the engines agree ONLY because both
      // columns are integral cents-valued decimals by construction
      // (price_dec is born from a long; cum_dec is a sum of those), so
      // the integrality guard below makes any future non-integral
      // decimal fail LOUD instead of diverging silently (round-18
      // ADVICE fix — the old comment called the cast "exact", hiding
      // the truncate-vs-round dependence)
      .withColumn(
        "cum_dec",
        when(col("cum_dec") % 1 === 0, col("cum_dec"))
          .otherwise(
            raise_error(
              concat(lit("q73 cum_dec not integral cents: "), col("cum_dec").cast("string"))
            ).cast("decimal(18,2)")
          )
      )
      .select(
        col("o_orderkey"),
        col("o_date"),
        col("price_dec").cast("long").as("price_cents"),
        col("cum_dec").cast("long").as("cum_cents")
      )
      .orderBy("o_date", "o_orderkey")
  }

  /** q74 (round 16): GLOBAL RUNNING AVERAGE ORDER VALUE — "what's the
    * average deal size so far" at every order under the (date,
    * orderkey) total order: `avg(cents) OVER (ORDER BY … ROWS
    * UNBOUNDED PRECEDING)`, the TENTH GlobalRank idiom. The rewrite
    * decomposes it into the exact-long prefix sum + prefix count +
    * one legacy divide — stock Spark both 1-tasks it AND accumulates
    * the running sum in double. The oracle spells avg as
    * `CAST(sum AS DOUBLE)/CAST(count AS DOUBLE)` so both engines
    * compute ONE IEEE division of the same exact integers —
    * bit-identical doubles, no rounding column needed.
    */
  def q74RunningAvg(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
    val w = Window
      .orderBy(col("o_date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("avg_cents", avg("cents").over(w))
      .orderBy("o_date", "o_orderkey")
  }

  /** q75 (round 16): GLOBAL SHARE-OF-TOTAL — `x / sum(x) OVER ()`, the
    * single most common BI window: every order with its share of the
    * whole book, plus the book total, order count, max ticket, and
    * average ticket — ALL `agg OVER ()` constants. Stock Spark plans
    * an AllTuples 1-task window that buffers the entire relation; the
    * TWELFTH GlobalRank idiom computes each as per-partition partials
    * + a constant attach — NO exchange, NO sort, NO buffer (the only
    * shuffle in this query is its own output ORDER BY). Exact integer
    * cents; the average is the exact-sum/exact-count divide both
    * engines write identically.
    */
  def q75ShareGlobal(s: SparkSession, d: String): DataFrame = {
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
      .selectExpr(
        "o_orderkey",
        "cents",
        "CAST(sum(cents) OVER () AS BIGINT) AS total_cents",
        "CAST(count(*) OVER () AS BIGINT) AS n_orders",
        "max(cents) OVER () AS max_cents",
        "CAST(sum(cents) OVER () AS DOUBLE) / CAST(count(cents) OVER () AS DOUBLE) AS avg_cents",
        "round(CAST(cents AS DOUBLE) / CAST(sum(cents) OVER () AS DOUBLE), 9) AS share"
      )
      .orderBy("o_orderkey")
  }

  /** q76 (round 16): FIFTH-LARGEST DEAL — `nth_value` over the global
    * (cents DESC, orderkey) total order in BOTH from-start frames: the
    * full-frame form (the corpus' 5th-largest ticket on every row) and
    * the default-RANGE running form (null until five deals have been
    * seen) — the THIRTEENTH GlobalRank idiom at data grain: the
    * k-th-row constant from O(P·k) head metadata plus the group-end
    * count condition, no 1-task window, no whole-relation buffer.
    */
  def q76FifthLargest(s: SparkSession, d: String): DataFrame = {
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
      .selectExpr(
        "o_orderkey",
        "cents",
        "nth_value(cents, 5) OVER (ORDER BY cents DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fifth_largest",
        "nth_value(cents, 5) OVER (ORDER BY cents DESC, o_orderkey) AS fifth_so_far"
      )
      .orderBy("o_orderkey")
  }

  /** q77 (round 17): FRAME-BOUND EDGE GATE — first/last_value over
    * offset-bounded from-start/to-end frames, the data-grain gate for
    * the round-17 bound checks (GlobalWindowRewrite.boundAtOrAfterCurrent):
    * - `fv_follow`: first_value over UNBOUNDED PRECEDING..2 FOLLOWING —
    *   never-empty (upper ≥ current row), rides the constant exec;
    * - `lv_precede`: last_value over 2 PRECEDING..UNBOUNDED FOLLOWING —
    *   never-empty mirror, constant exec;
    * - `fv_gap`: first_value over UNBOUNDED PRECEDING..1 PRECEDING —
    *   EMPTY for the head row (stock/DuckDB: NULL there), so the
    *   rewrite must NOT fire: stays in the stock-Window remainder via
    *   the split. Before the fix this column read the global constant
    *   at the head row — a silent wrong answer this query now
    *   hash-pins against DuckDB forever.
    */
  def q77FrameBounds(s: SparkSession, d: String): DataFrame = {
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
      .selectExpr(
        "o_orderkey",
        "cents",
        "first_value(cents) OVER (ORDER BY cents DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING) AS fv_follow",
        "last_value(cents) OVER (ORDER BY cents DESC, o_orderkey ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING) AS lv_precede",
        "first_value(cents) OVER (ORDER BY cents DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fv_gap"
      )
      .orderBy("o_orderkey")
  }

  /** q78 (round 17): RUNNING FIRST NON-NULL — `first_value(x) IGNORE
    * NULLS` over the default running frame at data grain, the gate for
    * the round-17 high-severity fix: rows BEFORE the first non-null
    * have an all-null frame where stock/DuckDB yield NULL, so this
    * shape must KEEP the stock plan (the old rewrite attached the
    * relation-wide first non-null everywhere — q78 would have been
    * red). Urgent-priority orders' tickets are nulled out, making the
    * head of the (date, orderkey) order a realistic null-run. The
    * full-frame IGNORE NULLS twin (`first_nonnull_all`) IS a constant
    * and rides the exec — both semantics in one result.
    */
  def q78FirstNonnullRunning(s: SparkSession, d: String): DataFrame = {
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        when(col("o_orderpriority") === "1-URGENT", lit(null))
          .otherwise(round(col("o_totalprice") * 100).cast("long"))
          .as("cents_nn")
      )
      .selectExpr(
        "o_orderkey",
        "o_date",
        "cents_nn",
        "first_value(cents_nn) IGNORE NULLS OVER (ORDER BY o_date, o_orderkey) AS first_nonnull_running",
        "first_value(cents_nn) IGNORE NULLS OVER (ORDER BY o_date, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nonnull_all"
      )
      .orderBy("o_date", "o_orderkey")
  }

  /** q66 (round 14): GLOBAL QUANTITY RANK — every lineitem ranked by
    * quantity across the WHOLE fact table, ties and all (50 distinct
    * quantities ⇒ peer groups thousands of rows wide that span many
    * range partitions — the exact boundary-tie stitch the round-14
    * GlobalRank rank() rewrite exists for; stock Spark plans a 1-task
    * window). Rank cast to long for engine type parity.
    */
  def q66QuantityRank(s: SparkSession, d: String): DataFrame = {
    val li = Tables
      .lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_quantity")).cast("int").as("qty")
      )
    li.withColumn("qty_rank", rank().over(Window.orderBy(desc("qty"))).cast("long"))
      .orderBy(col("qty_rank"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q67 (round 14): GLOBAL SPEND PERCENTILE — every customer's
    * percentile position by lifetime spend, the marketing-segmentation
    * staple. Written as the plain global `percent_rank()` window so the
    * round-14 PercentRankTies rewrite carries it (stock: 1-task
    * window); spend in exact integer cents, the order deliberately
    * cents-only so tied spenders share a percentile (tie-stable — the
    * value never depends on tie order). pct = (rank−1)/(n−1) is the
    * same IEEE double in both engines; rounded to 9 decimals.
    */
  def q67SpendPercentile(s: SparkSession, d: String): DataFrame = {
    val spend = Tables
      .orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    spend
      .withColumn("pct", round(percent_rank().over(Window.orderBy(col("cents"))), 9))
      .select(col("o_custkey"), col("cents"), col("pct"))
      .orderBy("o_custkey")
  }

  /** q68 (round 14): TOP-CUSTOMER REVENUE CONCENTRATION — what share of
    * the book the top 1% / 5% / 10% of customers carry (the whale-risk
    * report next to q60's ABC classes): customers ranked by exact-cents
    * spend under a unique (cents desc, custkey) order — the global
    * row_number rides GlobalRankExec — and each tier's share is a
    * single division of exact longs. Tier sizes are ceil(p·n) computed
    * in integer arithmetic, so the cutoffs can never move on a float.
    */
  def q68TopCustomerShare(s: SparkSession, d: String): DataFrame = {
    val spend = Tables
      .orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val tot = spend.agg(count(lit(1)).as("n"), sum("cents").as("total_cents"))
    val ranked = spend
      .withColumn("rn", row_number().over(Window.orderBy(desc("cents"), col("o_custkey"))))
      .crossJoin(broadcast(tot))
    // all three tiers from ONE pass (conditional sums, rn <= ceil(n*p/100)
    // as 100*rn <= n*p + 99), stacked — not one re-aggregation per tier
    def in(p: Int) = col("rn") * 100 <= col("n") * p + lit(99)
    ranked
      .agg(
        sum(when(in(1), 1L).otherwise(0L)).as("n1"),
        sum(when(in(1), col("cents")).otherwise(0L)).as("c1"),
        sum(when(in(5), 1L).otherwise(0L)).as("n5"),
        sum(when(in(5), col("cents")).otherwise(0L)).as("c5"),
        sum(when(in(10), 1L).otherwise(0L)).as("n10"),
        sum(when(in(10), col("cents")).otherwise(0L)).as("c10"),
        first("total_cents").as("total_cents")
      )
      .selectExpr(
        "stack(3, 1, n1, c1, 5, n5, c5, 10, n10, c10) as (top_pct, n_customers, tier_cents)",
        "total_cents"
      )
      .select(
        col("top_pct"),
        col("n_customers"),
        col("tier_cents"),
        round(col("tier_cents").cast("double") / col("total_cents"), 6).as("revenue_share")
      )
      .orderBy("top_pct")
  }

  /** q69 (round 15): GLOBAL PRICE-BAND CUMULATIVE DISTRIBUTION — every
    * order tagged with the fraction of the whole book priced at or
    * below its $10k band (`cume_dist() OVER (ORDER BY band)`, no
    * PARTITION BY): the "what percentile of deals is this" column an
    * order-entry UI shows. Bands are ~60 distinct values over the whole
    * table, so peer groups span MANY range partitions — exactly the
    * forward head-run stitch the round-15 CumeDistTies mode exists for;
    * stock Spark would funnel every order through one task. Data-grain
    * output (one row per order) hash-gates the exec end-to-end.
    */
  def q69PriceBandCume(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice") / 10000).cast("int").as("band")
      )
    o.withColumn("band_cume", round(cume_dist().over(Window.orderBy(col("band"))), 9))
      .orderBy("o_orderkey")
  }

  /** q70 (round 15): RECORD ORDERS — every order tagged with the
    * largest single order seen SO FAR in book order and whether it set
    * the record ("biggest deal to date", the banner a sales dashboard
    * flashes). `max(cents) OVER (ORDER BY o_date, o_orderkey ROWS
    * UNBOUNDED PRECEDING)` with no PARTITION BY — the round-15
    * GlobalPrefixExtremum idiom: stock Spark funnels the whole book
    * through ONE task; here the range exchange fans out and one
    * extremum per partition stitches the prefix. Money as exact cents
    * (BIGINT) for engine type parity.
    */
  def q70RecordOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
    val w = Window
      .orderBy(col("o_date"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("record_cents", max("cents").over(w))
      .withColumn("is_record", (col("cents") === col("record_cents")).cast("boolean"))
      .orderBy("o_date", "o_orderkey")
  }

  /** q71 (round 15): CUSTOMER RETENTION BY NATION — the year-over-year
    * audience-overlap report (who ordered in 1995, in 1996, in both,
    * per nation): per-customer year flags in one pass over orders, one
    * broadcast join to the nation dim, one keyed aggregate. The flags
    * collapse COUNT(DISTINCT customer)-per-set-expression into plain
    * sums — no distinct shuffle per measure, the
    * many-distinct-counts-one-scan idiom.
    */
  def q71RetentionByNation(s: SparkSession, d: String): DataFrame = {
    val flags = Tables
      .orders(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr").isin(1995, 1996))
      .groupBy("o_custkey")
      .agg(
        max(when(col("yr") === 1995, 1L).otherwise(0L)).as("f95"),
        max(when(col("yr") === 1996, 1L).otherwise(0L)).as("f96")
      )
    val cn = Tables
      .customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    flags
      .join(cn, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        sum("f95").as("n_1995"),
        sum("f96").as("n_1996"),
        sum(col("f95") * col("f96")).as("n_both")
      )
      .withColumn(
        "retention",
        round(col("n_both").cast("double") / greatest(col("n_1995"), lit(1L)), 6)
      )
      .orderBy("nation")
  }

  /** q72 (round 15): DAY-CLOSE CUMULATIVE REVENUE — every order tagged
    * with the book total THROUGH ITS DAY'S CLOSE: `sum(cents) OVER
    * (ORDER BY o_date)` with NO frame clause — SQL's default RANGE
    * frame sums the whole peer group (all same-day orders), the single
    * most common way users write a cumulative total and, until round
    * 15, a silent 1-task cliff. Rides GlobalRangePrefixSumExec: ~2400
    * day-wide peer groups span many range partitions, the last group
    * per partition stitches the forward head-group chain. Exact cents
    * (BIGINT); emitted at order grain so the gate hashes every group's
    * frame end.
    */
  def q72DayCloseCumRevenue(s: SparkSession, d: String): DataFrame = {
    val o = Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("cents")
      )
    val w = Window.orderBy(col("o_date")) // default RANGE frame — deliberate
    o.withColumn("day_close_cents", sum("cents").over(w))
      .orderBy("o_date", "o_orderkey")
  }
}
