package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** §2.2 event / time-series operators over the `events` table.
  *
  * `Tables.events` normalizes the nanosecond parquet timestamps to
  * microsecond TimestampType (see SURVEY.md §3); the DuckDB oracles
  * apply `date_trunc('microseconds', ts)` so both engines do arithmetic
  * on identical microsecond instants.
  */
object Events {

  /** Tumbling time-bucket aggregation (hourly). Bucket emitted as epoch
    * seconds — integer-comparable across engines.
    */
  def e1TimeBucket(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket_s"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("bucket_s", "event_type")

  /** Gap-based sessionization (30-minute inactivity) via lag + running sum.
    * The batch analogue of the streaming session window; at 100 TB this is
    * one shuffle on user_id and two window passes over sorted partitions.
    */
  def e2Sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .select("user_id", "event_id", "ts")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn(
        "nf",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
          .otherwise(0)
      )
      .withColumn("session_id", sum("nf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), expr("unix_micros(min(ts)) div 1000000").as("start_s"))
      .orderBy("user_id", "session_id")
  }

  /** JSON property extraction from the `props` column. */
  def e3JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** Ordered funnel: users whose first purchase follows their first signup. */
  def e4Funnel(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase")
      )
      .select(
        col("user_id"),
        when(
          col("first_signup").isNotNull && col("first_purchase").isNotNull &&
            col("first_purchase") > col("first_signup"),
          1
        ).otherwise(0).as("converted")
      )
      .orderBy("user_id")

  /** Cohort retention: first-seen day × day-offset distinct users. */
  def e5Retention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("ts").cast("date").as("day"))
    val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** As-of join: each purchase matched to the user's most recent click at
    * or before it. Composed Spark-first (SURVEY §2 preference (a)): union
    * the two sides, one shuffle on user_id, and a running `last(click,
    * ignoreNulls)` window — the standard distributed as-of that avoids a
    * per-row range probe. Equal-timestamp ties order the click first
    * (ASOF `<=` semantics).
    */
  def e7AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables
      .events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("tus"),
        (col("event_type") === "click").as("is_click")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("tus"), when(col("is_click"), 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn(
      "lastc",
      last(when(col("is_click"), struct(col("tus").as("cts"), col("event_id").as("cid"))), ignoreNulls = true)
        .over(w)
    ).filter(!col("is_click"))
      .select(
        col("event_id").as("p_event_id"),
        col("user_id"),
        col("lastc.cid").as("click_event_id"),
        (col("tus") - col("lastc.cts")).as("gap_us")
      )
      .orderBy("p_event_id")
  }

  /** e7b: e7's as-of join through the NATIVE [[graft.plans.AsofJoinExec]]
    * operator instead of the union-tag window composition — purchases
    * and clicks each hash-cluster on user and sort (user, time) exactly
    * like a SortMergeJoin's children, then one forward merge per
    * partition attaches the latest click at-or-before each purchase.
    * Same oracle as e7, so the custom physical operator is value-pinned
    * against both the composed form and DuckDB.
    */
  def e7bAsofNative(s: SparkSession, d: String): DataFrame = {
    val e = Tables
      .events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("event_id").as("cid"),
        unix_micros(col("ts")).as("ctus")
      )
    graft.plans.AsofJoin
      .asof(purchases, clicks, "user_id", "tus", "c_user_id", "ctus", "cid")
      .select(
        col("event_id").as("p_event_id"),
        col("user_id"),
        col("cid").as("click_event_id"),
        (col("tus") - col("ctus")).as("gap_us")
      )
      .orderBy("p_event_id")
  }

  /** e36: CHI-SQUARE INDEPENDENCE TEST as a relational plan — the
    * statistical-testing family (is event mix independent of
    * weekend/weekday?) an analytics engine needs beyond point
    * aggregates. Contingency counts are one groupBy; marginals re-join
    * (broadcast — |types|- and 2-row tables); expected counts
    * `rowTot·colTot/N` and the statistic `Σ (obs−exp)²/exp` are
    * per-cell arithmetic with the per-cell terms rounded to 6dp BEFORE
    * the final sum (a types×2-cell table — the quantized-term
    * discipline makes the sum association-proof and the hash
    * engine-independent). Emits the statistic, df, and the per-cell
    * table; the decision threshold (chi² at α) is the caller's — the
    * engine's job is the exact statistic. Scale shape: one scan + KB
    * joins at any event volume.
    */
  def e36ChiSquare(s: SparkSession, d: String): DataFrame = {
    val e = Tables
      .events(s, d)
      .select(col("event_type"), (dayofweek(col("ts")).isin(1, 7)).as("is_weekend"))
    // DENSE cell spine (distinct row domain × distinct column domain):
    // an empty (event_type, is_weekend) combination still contributes
    // its (0−exp)²/exp term — dropping it understated the statistic
    // while df kept counting the full dimensions (r9 ADVICE).
    val observed = e.groupBy("event_type", "is_weekend").agg(count(lit(1)).as("obs"))
    val cells = e
      .select("event_type").distinct()
      .crossJoin(e.select("is_weekend").distinct())
      .join(observed, Seq("event_type", "is_weekend"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
    val rowTot = cells.groupBy("event_type").agg(sum("obs").as("rt"))
    val colTot = cells.groupBy("is_weekend").agg(sum("obs").as("ct"))
    val n = cells.agg(sum("obs").as("n"))
    val terms = cells
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "is_weekend")
      .crossJoin(broadcast(n))
      .withColumn("exp", col("rt").cast("double") * col("ct") / col("n"))
      .withColumn(
        "term",
        round((col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp"), 6)
      )
    val k = terms
      .agg(
        sum(col("term").cast("decimal(18,6)")).cast("double").as("chi2"),
        countDistinct("event_type").as("r"),
        countDistinct("is_weekend").as("c")
      )
      .select(round(col("chi2"), 4).as("chi2"), ((col("r") - 1) * (col("c") - 1)).as("df"))
    terms
      .select(
        col("event_type"),
        col("is_weekend"),
        col("obs"),
        round(col("exp"), 4).as("expected"),
        col("term")
      )
      .crossJoin(broadcast(k))
      .orderBy("event_type", "is_weekend")
  }

  /** Time-series resample / gap-fill: a dense (event_type × hour) spine
    * generated with `sequence`, left-joined to the sparse hourly counts,
    * missing buckets zero-filled. The spine is a broadcast-size cross of
    * distinct keys × time range — never a shuffle of the fact side.
    */
  def e8Resample(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val bounds = e.agg(min("h").as("mn"), max("h").as("mx"))
    val spine = Tables
      .events(s, d)
      .select(col("event_type"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("h"))
    val cnt = e.groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
    spine
      .join(cnt, Seq("event_type", "h"), "left")
      .select(
        unix_timestamp(col("h")).as("bucket_s"),
        col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("n")
      )
      .orderBy("bucket_s", "event_type")
  }

  /** Nested collection: per-user ordered event-type array (the denormalized
    * "user journey" shape). array_sort on (event_id, type) structs gives a
    * deterministic order without a per-group shuffle sort. The array is
    * emitted BOTH as the nested column and as a '|'-joined projection
    * (`types_s`) — the driver's pandas-based compare can't hash an
    * array<string> cell, so the joined form is what the oracle gate
    * checks (round-1 VERDICT item 1).
    */
  def e9CollectNested(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("event_id"), col("event_type")))),
            x => x.getField("event_type")
          ),
          "|"
        ).as("types_s")
      )
      .orderBy("user_id")

  /** Time-constrained funnel: users converting (first purchase) within
    * 24h of their first signup. Broadcast the per-user signup table back
    * onto the purchase stream.
    */
  def e10FunnelWindowed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val su = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("fs"))
      .filter(col("fs").isNotNull)
    val conv = ev
      .filter(col("event_type") === "purchase")
      .join(broadcast(su), "user_id")
      .filter(col("ts") >= col("fs") && col("ts") <= col("fs") + expr("interval 24 hours"))
      .select("user_id")
      .distinct()
      .withColumn("converted_24h", lit(1))
    su.join(conv, Seq("user_id"), "left")
      .select(col("user_id"), coalesce(col("converted_24h"), lit(0)).as("converted_24h"))
      .orderBy("user_id")
  }

  /** Inter-event gap statistics per user (lag diff over the per-user
    * timeline — one shuffle, one window pass).
    */
  def e11EventGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("gap_s", (col("tus") - lag("tus", 1).over(w)) / 1000000.0)
      .filter(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), round(avg("gap_s"), 2).as("avg_gap_s"),
        round(max("gap_s"), 2).as("max_gap_s"))
      .orderBy("user_id")
  }

  /** Statistical outlier detection: events whose value exceeds the
    * per-type mean + 2.5 sigma. Two-pass shape (round-1 VERDICT item 3):
    * a tiny per-type groupBy (map-side partial agg — no single task ever
    * holds a whole type) broadcast-joined back onto the stream. A
    * whole-partition window keyed on ~5 event types would pin ALL rows of
    * a type in one task's buffer — the skew ceiling this avoids.
    */
  def e12Outliers(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select("event_id", "event_type", "value")
    val stats = e
      .groupBy("event_type")
      .agg((avg("value") + lit(2.5) * stddev_samp(col("value"))).as("thr"))
    e.join(broadcast(stats), "event_type")
      .filter(col("value") > col("thr"))
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** Event-transition mining: corpus-wide (prev_type → type) counts over
    * per-user timelines — the Markov-chain view of user journeys. One
    * shuffle on user_id for the lag, one small count shuffle.
    */
  def e13Transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** Sliding event rate per type: events in the trailing 5 minutes at
    * each event. Pre-aggregated shape (round-1 VERDICT item 3): the RANGE
    * frame runs over the per-(type, second) COUNT series — bounded by
    * distinct seconds, not by event volume — and the result equi-joins
    * back onto the (sampled) event stream. The raw-row window variant
    * buffers every event of a type in one task; this one buffers at most
    * one row per second per type.
    */
  def e14SlidingRate(s: SparkSession, d: String): DataFrame = {
    val e = Tables
      .events(s, d)
      .select(col("event_id"), col("event_type"), expr("unix_micros(ts) div 1000000").as("tus_s"))
    val perSec = e.groupBy("event_type", "tus_s").agg(count(lit(1)).as("c"))
    val w = Window
      .partitionBy("event_type")
      .orderBy(col("tus_s"))
      .rangeBetween(-300L, 0L)
    val rates = perSec.withColumn("n_5min", sum("c").over(w))
    e.filter(col("event_id") % 97 === 0) // sample the output, keep the window full
      .join(rates.select("event_type", "tus_s", "n_5min"), Seq("event_type", "tus_s"))
      .select("event_id", "event_type", "n_5min")
      .orderBy("event_id")
  }

  /** Daily/weekly active users: DAU per day plus trailing-7-day WAU.
    * Equi-shuffle shape (round-1 VERDICT item 4): each distinct
    * (day, user) row explodes into the 7 days it covers
    * (`sequence(day, day+6)`) and WAU is a plain groupBy — no
    * BroadcastNestedLoopJoin range probe, cost O(7·|daily|) regardless of
    * history length. The inner join with DAU restricts output to days
    * that actually occur.
    */
  def e15ActiveUsers(s: SparkSession, d: String): DataFrame = {
    val daily = Tables
      .events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
    val dau = daily.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = daily
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"), col("user_id"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day").select("day", "dau", "wau").orderBy("day")
  }

  /** Fixed-range value histogram per event type: 20 buckets of width 5
    * over [0, 100), clamped at the edges — one groupBy with map-side
    * partial aggregation (the scale-safe histogram; never a sort).
    */
  def e16Histogram(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .filter(col("value").isNotNull)
      .select(
        col("event_type"),
        least(greatest(floor(col("value") / 5.0), lit(0.0)), lit(19.0)).cast("int").as("bucket")
      )
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")

  /** Declarative gap sessionization via Spark's built-in `session_window`
    * — the one-line form of [[e2Sessionize]] that also runs unchanged as
    * a streaming aggregation. Session membership is identical to the
    * lag+cumsum form when no inter-event gap equals the 30-min boundary
    * exactly (verified on this data; `session_window` treats == gap as a
    * new session, the manual `>` rule keeps it — at µs resolution exact
    * ties don't occur). Oracle = the manual sessionization SQL.
    */
  def e17SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        expr("unix_micros(sw.start) div 1000000").as("start_s"),
        col("n_events")
      )
      .orderBy("user_id", "start_s")

  /** Three-step ORDERED funnel (signup → later click → later purchase):
    * stage timestamps are resolved iteratively — first signup, first
    * click strictly after it, any purchase strictly after that — so an
    * early purchase can't satisfy a later stage (the correctness trap
    * in naive min-per-type funnels). Per-stage aggregates are keyed
    * shuffles; joins are user-keyed (AQE broadcasts them at small SF).
    */
  def e18SequenceFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val fs = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("fs"))
      .filter(col("fs").isNotNull)
    val fc = ev
      .filter(col("event_type") === "click")
      .join(fs, "user_id")
      .filter(col("ts") > col("fs"))
      .groupBy("user_id")
      .agg(min("ts").as("fc"))
    val done = ev
      .filter(col("event_type") === "purchase")
      .join(fc, "user_id")
      .filter(col("ts") > col("fc"))
      .select("user_id")
      .distinct()
      .withColumn("completed", lit(1))
    fs.join(fc.select(col("user_id"), lit(1).as("reached_click")), Seq("user_id"), "left")
      .join(done, Seq("user_id"), "left")
      .select(
        col("user_id"),
        coalesce(col("reached_click"), lit(0)).as("reached_click"),
        coalesce(col("completed"), lit(0)).as("completed")
      )
      .orderBy("user_id")
  }

  /** Approximate trailing-7-day WAU via DataSketches HLL — the 100 TB
    * form of [[e15ActiveUsers]]: one HLL sketch per day (mergeable,
    * bounded size), exploded over the 7 days it covers and union-merged —
    * so the expensive per-window `countDistinct` shuffle of user ids
    * becomes a shuffle of kilobyte sketches. Same equi-join shape as
    * e15; accuracy vs exact is gated in ScalaTest (rows-only in the
    * driver gate: sketch estimates aren't cross-engine).
    */
  def e19WauSketch(s: SparkSession, d: String): DataFrame = {
    val perDay = Tables
      .events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    perDay
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"), col("sk"))
      .join(perDay.select("day"), "day") // only days that actually occur
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_approx"))
      .orderBy("day")
  }

  /** Churn cohort: each user's last-activity day and whether they've
    * been inactive for ≥ `days` before the stream's end (the
    * end-of-window reference folded in as a broadcast scalar — no
    * driver-side collect). One keyed aggregation.
    */
  def e20Churn(s: SparkSession, d: String, days: Int = 7): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("ts").cast("date").as("day"))
    val bounds = ev.agg(max("day").as("mxd"))
    ev.groupBy("user_id")
      .agg(max("day").as("last_day"))
      .crossJoin(broadcast(bounds))
      .select(
        col("user_id"),
        col("last_day"),
        when(datediff(col("mxd"), col("last_day")) >= days, 1).otherwise(0).as("churned")
      )
      .orderBy("user_id")
  }

  /** Trailing exponentially-weighted moving average + spike flag over the
    * hourly per-type count series — the streaming-telemetry anomaly shape
    * (EWMA adapts to level shifts where e12's global mean+kσ can't).
    *
    * The recurrence is computed CLOSED-FORM over a bounded 48-point
    * trailing window (decay^48 ≈ 3e-8 — numerically the full EWMA) and,
    * crucially, with equi-operators only: each point EXPLODES its ≤48
    * (target-row, weight) contributions and a plain groupBy sums them —
    * never a per-type range join (BNLJ) and never a whole-type window
    * task. The series this runs on is already the hourly rollup: tiny
    * relative to raw events at any scale.
    */
  def e21Ewma(s: SparkSession, d: String, window: Int = 48, decay: Double = 0.7): DataFrame = {
    val series = Tables
      .events(s, d)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket_s"),
        col("event_type")
      )
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("bucket_s")
    val rn = series.withColumn("rn", row_number().over(w))
    val contrib = rn
      .select(
        col("event_type"),
        col("x"),
        col("rn").as("src"),
        explode(sequence(col("rn"), col("rn") + lit(window - 1))).as("tgt")
      )
      .withColumn("wgt", pow(lit(decay), col("tgt") - col("src")))
    val ew = contrib
      .groupBy(col("event_type").as("et"), col("tgt"))
      .agg((sum(col("wgt") * col("x")) / sum(col("wgt"))).as("ewma_raw"))
    rn.join(ew, rn("event_type") === col("et") && rn("rn") === col("tgt"))
      .select(
        col("event_type"),
        col("bucket_s"),
        col("x"),
        round(col("ewma_raw"), 4).as("ewma"),
        // the flag compares against the ROUNDED ewma so both engines
        // decide the boundary on the identical value
        when(col("x") > lit(2) * round(col("ewma_raw"), 4), 1).otherwise(0).as("spike")
      )
      .orderBy("event_type", "bucket_s")
  }

  /** e22: robust outlier detection via median absolute deviation — the
    * companion to e12's mean+σ gate that heavy-tailed metrics need (one
    * fat outlier inflates σ and hides its peers; the median doesn't
    * move). Two grouped exact percentiles (tiny per-type results,
    * broadcast back) — same groupBy-then-broadcast shape as e12, no
    * per-type window task, so no skew ceiling at 100× the data.
    */
  def e22MadOutliers(s: SparkSession, d: String, k: Double = 3.0): DataFrame = {
    val e = Tables.events(s, d).select("event_id", "event_type", "value")
    val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5d)").as("med"))
    val dev = e
      .join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev
      .groupBy("event_type")
      .agg(expr("percentile(adev, 0.5d)").as("mad"), max("med").as("med"))
    e.join(broadcast(mad), "event_type")
      .filter(col("value") > col("med") + lit(k) * col("mad"))
      .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** Latest-event-per-key dedup (the "upsert view" of an append log). */
  def e6DedupLatest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    Tables
      .events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
      .orderBy("user_id")
  }

  /** e30: bot-cadence detection — users whose inter-event gaps are too
    * REGULAR to be human (coefficient of variation of gaps below
    * threshold). One lag window per user partition + one grouped
    * aggregate; the flag compares the ROUNDED cv on both engines so the
    * boundary can't flip on stddev ulps. The traffic-quality gate that
    * keeps scripted clients out of a training corpus.
    */
  def e30BotCadence(s: SparkSession, d: String, maxCv: Double = 0.2, minGaps: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(avg(col("gap_us")) / 1e6, 2).as("avg_gap_s"),
        round(stddev_samp(col("gap_us")) / avg(col("gap_us")), 4).as("gap_cv")
      )
      .filter(col("n_gaps") >= minGaps)
      .withColumn("is_bot", col("gap_cv") < maxCv)
      .orderBy("user_id")
  }

  /** e29: conversion-latency distribution — hours from each user's FIRST
    * signup to their FIRST subsequent purchase, bucketed into a latency
    * histogram. Two per-user min-aggregations (map-side combine) and a
    * tiny histogram groupBy; no window over raw events, no join — the
    * funnel-latency question answered with two shuffles on user_id.
    */
  def e29ConversionLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val firstSignup = ev
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("ts").as("signup_ts"))
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    firstSignup
      .join(purchases, "user_id")
      .filter(col("p_ts") >= col("signup_ts"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("p_ts")) - unix_micros(col("signup_ts"))).as("lat_us"))
      .select(
        least(floor(col("lat_us") / lit(3600000000L)), lit(72L)).cast("int").as("lat_hours")
      )
      .groupBy("lat_hours")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("lat_hours")
  }

  /** e28: event-type co-occurrence PMI over (user, hour) context cells —
    * which behaviors cluster in the same activity window. Distinct
    * (user, hour, type) cells reduce to per-type counts and one
    * cell-keyed equi-self-join for pair counts (both shuffles on the cell
    * key; the pair stage output is T², not event-scaled). PMI =
    * ln(N·c_ab / (c_a·c_b)), computed with identical operation order on
    * both engines and rounded.
    */
  def e28CooccurrencePmi(s: SparkSession, d: String): DataFrame = {
    val cells = Tables
      .events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .distinct()
    val n = broadcast(cells.select("user_id", "h").distinct().agg(count(lit(1)).as("n_cells")))
    val perType = cells.groupBy("event_type").agg(count(lit(1)).as("c"))
    val l = cells.select(col("user_id"), col("h"), col("event_type").as("ta"))
    val r = cells.select(col("user_id"), col("h"), col("event_type").as("tb"))
    l.join(r, Seq("user_id", "h"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("c_ab"))
      .join(broadcast(perType.select(col("event_type").as("ta"), col("c").as("c_a"))), "ta")
      .join(broadcast(perType.select(col("event_type").as("tb"), col("c").as("c_b"))), "tb")
      .crossJoin(n)
      .select(
        col("ta"),
        col("tb"),
        col("c_ab"),
        round(
          log(col("c_ab").cast("double") * col("n_cells") / col("c_a") / col("c_b")),
          4
        ).as("pmi")
      )
      .orderBy("ta", "tb")
  }

  /** e27: audience overlap via THETA sketches — |users(A) ∩ users(B)| for
    * every event-type pair. HLL only unions; theta sketches are the
    * mergeable summary with set INTERSECTION, so per-segment KB sketches
    * (one keyed agg with partial merge) answer all O(T²) overlaps without
    * ever re-touching raw events — at 100 TB the pair stage works on a
    * T-row table. Estimates are exact while the retained set is under the
    * nominal k (ScalaTest pins exactness at test scale and the identity
    * overlap(A,A) = |A|).
    */
  def e27AudienceOverlap(s: SparkSession, d: String): DataFrame = {
    import graft.plans.GraftExpressions
    val sk = Tables
      .events(s, d)
      .groupBy("event_type")
      .agg(GraftExpressions.thetaSketch(col("user_id")).as("sk"))
    val l = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
    val r = sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
    l.join(broadcast(r), col("type_a") <= col("type_b"))
      .select(
        col("type_a"),
        col("type_b"),
        round(GraftExpressions.thetaIntersect(col("sk_a"), col("sk_b")))
          .cast("long")
          .as("overlap_est")
      )
      .orderBy("type_a", "type_b")
  }

  /** e26: carry-forward gap-fill via IGNORE NULLS — every event decorated
    * with the user's most recent 'error' value (NULL until the first
    * error). `last(..., ignoreNulls)` over a running frame is the
    * distributed forward-fill: one shuffle on user_id, one sorted pass,
    * no self-join against the sparse series.
    */
  def e26GapFill(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        round(
          last(when(col("event_type") === "error", col("value")), ignoreNulls = true).over(w),
          2
        ).as("last_error_value")
      )
      .orderBy("event_id")
  }

  /** e25: seasonal (hour-of-day) traffic baseline + anomaly days. The
    * per-(type, day, hour) counts reduce to a per-(type, hour-of-day)
    * baseline — 5×24 rows however large the log — which joins back to the
    * daily cells to flag the days running ≥ 1.5× their slot's baseline.
    * Two keyed aggregations + one broadcast-sized join; no window over
    * raw events, so no per-type task ceiling (the e12 lesson applied to
    * seasonality).
    */
  def e25SeasonalBaseline(s: SparkSession, d: String): DataFrame = {
    val cells = Tables
      .events(s, d)
      .groupBy(
        col("event_type"),
        col("ts").cast("date").as("day"),
        hour(col("ts")).as("hod")
      )
      .agg(count(lit(1)).as("n"))
    val baseline = cells
      .groupBy("event_type", "hod")
      .agg(sum("n").as("tot"), count(lit(1)).as("n_days"))
      .withColumn("base_n", round(col("tot").cast("double") / col("n_days"), 4))
    cells
      .join(broadcast(baseline.select("event_type", "hod", "base_n")), Seq("event_type", "hod"))
      .groupBy("event_type", "hod")
      .agg(
        max(col("base_n")).as("base_n"),
        max("n").as("max_n"),
        sum(when(col("n") >= col("base_n") * 1.5, 1L).otherwise(0L)).as("n_anom_days")
      )
      .orderBy("event_type", "hod")
  }

  /** e32: last-touch attribution — every purchase credits the user's
    * most recent prior click (its props.k, bucketed to a campaign id),
    * via an IGNORE-NULLS carry-forward over the per-user timeline (the
    * e26 gap-fill primitive pointed at marketing attribution). One
    * user-keyed window + one tiny campaign groupBy; no self-join of
    * purchases against clicks, so the shape is immune to the
    * purchases×clicks blowup a naive as-of formulation shuffles.
    */
  def e32Attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables
      .events(s, d)
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .withColumn(
        "last_click_k",
        last(when(col("event_type") === "click", col("k")), ignoreNulls = true).over(w)
      )
      .filter(col("event_type") === "purchase" && col("last_click_k").isNotNull)
      // sign-preserving % (not pmod): matches the DuckDB oracle's `% 10`
      // exactly even if a props.k is ever negative — round-5 ADVICE item 2
      .groupBy((col("last_click_k") % lit(10L)).as("campaign"))
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
      .orderBy("campaign")
  }

  /** e31: behavioral path mining — frequency of every 3-step event-type
    * path a user walks, from two LEADs over the per-user timeline. The
    * window partitions on user_id (millions of small partitions, no
    * per-type task ceiling), the trigram count is one map-side-combined
    * groupBy over ≤ |types|³ keys, and ordering ties break on event_id so
    * both engines walk identical paths.
    */
  def e31PathTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables
      .events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("trigram"))
      .groupBy("trigram")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 10)
      .orderBy(desc("n"), col("trigram"))
  }

  /** e23: NEW vs RETURNING decomposition of each day's active users —
    * the growth-accounting twin of e15's DAU/WAU. A user's first-ever
    * active day comes from one keyed min-aggregate (map-side combined);
    * the day table then splits actives by `day == first_day`. Two
    * hash-shuffles on high-cardinality keys (user, then day) — no
    * windows, no self-joins — so the plan is flat in the day count and
    * partition-parallel in users at any scale.
    */
  def e23NewVsReturning(s: SparkSession, d: String): DataFrame = {
    val daily = Tables
      .events(s, d)
      .select(col("ts").cast("date").as("day"), col("user_id"))
      .distinct()
    val firstDay = daily.groupBy("user_id").agg(min("day").as("first_day"))
    daily
      .join(firstDay, "user_id")
      .groupBy("day")
      .agg(
        count(lit(1)).as("active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L)).as("returning")
      )
      .orderBy("day")
  }

  /** e24: time-decayed engagement score per user: Σ value · 1/(1+age_days),
    * age measured against the corpus max day (broadcast scalar). The
    * RATIONAL decay kernel is deliberate: it is exactly representable in
    * both engines, where an exp(−λ·age) kernel would drift on
    * cross-engine `exp` ulp and fail hash parity. One keyed groupBy with
    * map-side partials — the per-user score at 100 TB is one shuffle of
    * (user, partial-sum) pairs.
    */
  def e24DecayScore(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      .filter(col("value").isNotNull)
    val bounds = ev.agg(max("day").as("mxd"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("w", lit(1.0) / (lit(1.0) + datediff(col("mxd"), col("day"))))
      .groupBy("user_id")
      .agg(round(sum(col("value") * col("w")), 4).as("score"), count(lit(1)).as("n_scored"))
      .orderBy("user_id")
  }

  /** e33 (round 9): CUSUM DRIFT DETECTION on the daily event-rate series
    * — the classic sequential changepoint statistic
    * `S_t = max(0, S_{t−1} + (x_t − μ))`, which looks un-distributable
    * (a per-row recursion) until the closed form
    * `S_t = c_t − min(0, min_{j≤t} c_j)` (c = prefix sums of the
    * centered series; the process resets exactly at the running
    * minimum) turns it into TWO ordinary window functions — running sum
    * + running min per event type, both on the day-grain series.
    * The recursion-to-window reduction is the whole point: at 100 TB
    * the daily series is a T×types-row table and the windows are keyed
    * scans, no sequential state anywhere. All arithmetic rides
    * decimal(18,6) (window aggregation ORDER is engine-internal, so
    * double prefix sums would be association-sensitive; decimals are
    * exact), making the statistic hash-gateable. Alarm when the
    * cumulative excess exceeds one day's mean rate.
    */
  def e33CusumDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(s, d)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val mu = daily
      .groupBy("event_type")
      .agg(round(avg("n"), 6).cast("decimal(18,6)").as("mu"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .join(broadcast(mu), "event_type")
      .withColumn("y", col("n").cast("decimal(18,6)") - col("mu"))
      .withColumn("c", sum("y").over(w))
      .withColumn("cmin", least(lit(0).cast("decimal(18,6)"), min("c").over(w)))
      .select(
        col("day"),
        col("event_type"),
        col("n"),
        (col("c") - col("cmin")).cast("decimal(38,6)").cast("double").as("cusum"),
        ((col("c") - col("cmin")) > col("mu")).as("drift_alarm")
      )
      .orderBy("day", "event_type")
  }

  /** e34: first-order MARKOV next-event model — fit + argmax prediction
    * as one relational plan. Transition counts (e13's lag-window shape)
    * are Laplace-smoothed over the event-type vocabulary,
    * `P(next|prev) = (c+1)/(total_prev + V)`, and the most likely next
    * type per antecedent is selected with probabilities rounded to
    * decimal BEFORE the argmax (t26's engine-exact discipline — the
    * tie-break, lexicographically-lowest next type, never sees a raw
    * float). Unsmoothed-unobserved successors can never win (their
    * smoothed mass is strictly below any observed count's), so the
    * argmax runs over observed transitions only. Scale shape: one
    * per-user sort (the lag window), one keyed count — the model and
    * the prediction table are both |types|²-bounded, broadcast-sized
    * at any corpus scale.
    */
  def e34MarkovNext(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val vocab = Tables.events(s, d).agg(countDistinct("event_type").as("v"))
    val totals = trans.groupBy("prev_type").agg(sum("n").as("tot"))
    val probs = trans
      .join(totals, "prev_type")
      .crossJoin(broadcast(vocab))
      .withColumn("p", round((col("n") + 1).cast("double") / (col("tot") + col("v")), 6))
    val aw = Window.partitionBy("prev_type").orderBy(desc("p"), col("next_type"))
    probs
      .withColumn("rn", row_number().over(aw))
      .filter(col("rn") === 1)
      .select(
        col("prev_type"),
        col("next_type").as("pred_next"),
        col("p").as("prob"),
        col("n").cast("long").as("n_obs")
      )
      .orderBy("prev_type")
  }

  /** e37: BURST DETECTION — the rate-anomaly workload between e14's
    * sliding rate and e33's CUSUM: per event type, hourly counts against
    * the type's own mean hourly rate, with a burst = any maximal run of
    * consecutive hours at ≥ 1.5× the mean (integer-exact: the
    * comparison is cross-multiplied `2·cnt·H ≥ 3·total` so no division
    * ever happens; 1.5× keeps bursts NON-EMPTY at every staged SF —
    * denser corpora concentrate hourly counts near the mean and a 2×
    * gate goes silent at sf0.1). Runs found by the gaps-and-islands delta (hour_index −
    * row_number over burst hours), one window per type. Emits one row
    * per burst: start/end hour, length, peak and total events. Plan
    * shape: one hourly groupBy (keyed shuffle), a 2-row-per-type
    * broadcast of the baselines, and type-keyed windows over the
    * HOURLY table (8760 rows/type/year — model-sized at any event
    * volume).
    */
  def e37BurstWindows(s: SparkSession, d: String): DataFrame =
    burstReport(
      Tables
        .events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
    )

  /** The burst-report half of e37 over an hourly count table
    * (event_type, h, cnt) — ONE definition shared by the batch query
    * and its streaming twin s28 (the d21Halves discipline).
    */
  private[graft] def burstReport(hourly: DataFrame): DataFrame = {
    val base = hourly
      .groupBy("event_type")
      .agg(sum("cnt").as("total"), count(lit(1)).as("n_hours"))
    val bursts = hourly
      .join(broadcast(base), "event_type")
      // burst hour: cnt ≥ 1.5 × (total / n_hours), cross-multiplied exact
      .filter(col("cnt") * col("n_hours") * 2 >= col("total") * 3)
      .withColumn("hi", (unix_micros(col("h")) / lit(3600000000L)).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("hi")
    bursts
      .withColumn("grp", col("hi") - row_number().over(w))
      .groupBy("event_type", "grp")
      .agg(
        min("h").as("start_h"),
        max("h").as("end_h"),
        count(lit(1)).as("n_hours_burst"),
        max("cnt").as("peak"),
        sum("cnt").as("n_events")
      )
      .select("event_type", "start_h", "end_h", "n_hours_burst", "peak", "n_events")
      .orderBy("event_type", "start_h")
  }

  /** e38: AUTOCORRELATION FUNCTION of each type's hourly count series —
    * the seasonality fingerprint (daily cycle ⇒ a lag-24 peak) a
    * time-series engine reports before any model fitting. The series is
    * the DENSE zero-filled hourly spine (e8's discipline — a missing
    * hour is a real 0, not an absent row); r_l = Σ(dev_t·dev_{t+l}) /
    * Σ(dev_t²) with dev = x − x̄. Engine-exact by the t21 quantization
    * discipline: x̄ rounded to 9dp, deviations quantized to
    * decimal(16,8) BEFORE any product (products decimal(33,16), sums
    * exact — no float ever enters an aggregation), the one double
    * division per (type, lag) at the end. One window pass produces all
    * `maxLag` lead columns; the spine is type×hours — model-sized at
    * any event volume.
    */
  def e38Acf(s: SparkSession, d: String, maxLag: Int = 6): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
    val bounds = e.agg(min("h").as("mn"), max("h").as("mx"))
    val spine = e
      .select("event_type")
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(
        col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("h")
      )
    val cnt = e.groupBy("event_type", "h").agg(count(lit(1)).as("x"))
    val series = spine
      .join(cnt, Seq("event_type", "h"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val stats = series
      .groupBy("event_type")
      .agg(sum("x").as("sx"), count(lit(1)).as("nh"))
      .withColumn("xbar", round(col("sx").cast("double") / col("nh"), 9).cast("decimal(20,10)"))
    val w = Window.partitionBy("event_type").orderBy("h")
    var dev = series
      .join(broadcast(stats.select("event_type", "xbar")), "event_type")
      .withColumn("dev", round(col("x") - col("xbar"), 8).cast("decimal(16,8)"))
    (1 to maxLag).foreach(l => dev = dev.withColumn(s"dev_$l", lead("dev", l).over(w)))
    val lagCols = (1 to maxLag).map(l =>
      sum(col("dev") * col(s"dev_$l")).as(s"num_$l")
    )
    val agg = dev
      .groupBy("event_type")
      .agg(sum(col("dev") * col("dev")).as("den"), lagCols: _*)
    val rows = (1 to maxLag).map(l =>
      agg.select(
        col("event_type"),
        lit(l).as("lag"),
        round(col(s"num_$l").cast("double") / col("den").cast("double"), 6).as("acf")
      )
    )
    rows.reduce(_ unionByName _).orderBy("event_type", "lag")
  }

  /** e39: PER-USER SLIDING RATE LIMIT — for every event, the count of
    * that user's events in the trailing 10-minute window (a RANGE frame
    * over epoch seconds, so simultaneous events are in/out of the frame
    * together regardless of row order — deterministic on both engines),
    * reduced to the per-user maximum burst and a breach flag. This is
    * the abuse/quota screen an ingest tier runs per key: the window
    * partitions BY USER, so at 100 TB each user's timeline sorts
    * independently inside an ordinary keyed shuffle — no global sort,
    * no self-join (the naive formulation is events ⋈ events on a time
    * band). Contrast with e14, which rates per TYPE at second grain;
    * this is per-entity enforcement over raw events.
    */
  /** e40: POPULATION STABILITY INDEX — the production distribution-drift
    * monitor (scorecard/feature-drift standard): per event type, compare
    * the `value` distribution of the FIRST half of the date range
    * (expected) against the SECOND half (actual) over integer bins,
    * PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b). Bins are `floor(value)` —
    * bounded by the value range, not the event volume — so the whole
    * statistic is two keyed aggregates over (type, cohort, bin) plus a
    * model-sized join; the date midpoint is a 1-row broadcast aggregate.
    * Shared-bins-only variant (both cohorts observed the bin) — the
    * stated contract, replayed identically by the oracle. Engine-exact:
    * shares divide exact longs in IEEE doubles, each bin's term is
    * rounded and quantized to decimal BEFORE the per-type sum (t21
    * discipline), and PSI is read off the exact decimal total.
    */
  def e40PsiDrift(s: SparkSession, d: String): DataFrame = {
    val e = Tables
      .events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val span = e.agg(min("day").as("d0"), max("day").as("d1"))
    val binned = e
      .crossJoin(broadcast(span))
      .withColumn(
        "cohort",
        when(datediff(col("day"), col("d0")) * 2 <= datediff(col("d1"), col("d0")), "a").otherwise("b")
      )
      .withColumn("bin", floor(col("value")))
      .groupBy("event_type", "cohort", "bin")
      .agg(count(lit(1)).as("n"))
    psiReport(binned)
  }

  /** e40's report tail over a (event_type, cohort, bin, n) count table —
    * SHARED with the streaming twin s30 (the as-of-triad discipline:
    * one report implementation means the online fold can't silently
    * diverge from the batch statistic it mirrors).
    */
  private[graft] def psiReport(binned: DataFrame): DataFrame = {
    val tot = binned.groupBy("event_type", "cohort").agg(sum("n").as("t"))
    val shares = binned.join(tot, Seq("event_type", "cohort"))
    def side(c: String, p: String) =
      shares.filter(col("cohort") === c).select(col("event_type"), col("bin"), (col("n") / col("t")).as(p))
    side("a", "pa")
      .join(side("b", "pb"), Seq("event_type", "bin"))
      .withColumn(
        "term",
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9).cast("decimal(20,10)")
      )
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_bins"), sum("term").as("s"))
      .select(col("event_type"), col("n_bins"), round(col("s").cast("double"), 6).as("psi"))
      .orderBy("event_type")
  }

  def e39RateLimit(s: SparkSession, d: String, windowSec: Long = 600L, limit: Long = 4L): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("sec"))
      .rangeBetween(-(windowSec - 1), 0L)
    Tables
      .events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("sec"))
      .withColumn("in_window", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("in_window").as("max_burst"))
      .withColumn("breach", col("max_burst") >= limit)
      .orderBy("user_id")
  }

  /** e41: RETENTION HALF-LIFE — e5's cohort curve collapsed to the one
    * number a growth dashboard quotes: fit ln(retention rate) against
    * day-offset (exponential-decay model r(d) ≈ r₀·e^{λd}) and report
    * λ plus the implied half-life ln2/(−λ). The rate at offset d is
    * distinct users active d days after their own first day over total
    * users — two keyed aggregates (per-user cohort min, then per-offset
    * distinct counts) and a 1-row broadcast total; the regression
    * reuses t21/t37's decimal-quantized discipline (round(ln,9) →
    * exact decimal sums → scalar double fit), restricted to offsets
    * 1..`maxOffset` so the fit stays in the decaying regime. A
    * non-decaying curve (λ ≥ 0) reports a NULL half-life in both
    * engines.
    */
  def e41RetentionHalflife(s: SparkSession, d: String, maxOffset: Int = 28): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    val total = cohort.agg(count(lit(1)).as("n_users"))
    val rates = e
      .distinct()
      .join(cohort, "user_id")
      .select(datediff(col("day"), col("cohort_day")).as("off"))
      .filter(col("off") >= 1 && col("off") <= maxOffset)
      // one row per (user, offset) survives the distinct upstream (a
      // user's day at offset d is unique), so count(*) IS the distinct
      // active-user count
      .groupBy("off")
      .agg(count(lit(1)).as("users"))
      .crossJoin(broadcast(total))
      .select(col("off"), (col("users").cast("double") / col("n_users")).as("rate"))
    val x = round(col("off").cast("double"), 9).cast("decimal(12,10)")
    val y = round(log(col("rate")), 9).cast("decimal(12,10)")
    rates
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx")
      )
      .withColumn(
        "lambda",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))
      )
      .select(
        col("n").cast("long").as("n_points"),
        round(col("lambda"), 6).as("decay_lambda"),
        when(col("lambda") < 0, round(lit(math.log(2.0)) / -col("lambda"), 4))
          .as("half_life_days")
      )
  }

  /** e42: DAU/MAU STICKINESS — the engagement ratio every consumer
    * dashboard tracks: per month, average daily active users over
    * monthly active users (1.0 = every monthly user shows up daily).
    * Two aggregates off ONE deduplicated (user, day) scan — day-grain
    * counts roll up to the month, the month distinct runs keyed — then
    * a month-grain join. Exact distinct counts keep the oracle a hash
    * gate; at 100 TB swap `approx_count_distinct`/theta sketches into
    * the identical plan (q23/e19's documented trade). The avg-DAU mean
    * is an integer-sum ratio — deterministic to the last bit.
    */
  def e42Stickiness(s: SparkSession, d: String): DataFrame = {
    val ud = Tables
      .events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud
      .groupBy(trunc(col("day"), "month").as("month"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
    val mau = ud
      .groupBy(trunc(col("day"), "month").as("month"))
      .agg(countDistinct("user_id").as("mau"))
    dau
      .join(mau, "month")
      .select(
        col("month"),
        col("n_days"),
        col("mau"),
        round(col("sum_dau").cast("double") / col("n_days"), 4).as("avg_dau"),
        round(
          col("sum_dau").cast("double") / col("n_days") / col("mau"),
          6
        ).as("stickiness")
      )
      .orderBy("month")
  }

  /** e43: BURSTINESS INDEX (Goh & Barabási) — per user,
    * B = (σ−μ)/(σ+μ) over inter-event gaps: −1 = metronome, 0 =
    * Poisson, → 1 = extreme bursts. The behavioral fingerprint that
    * separates humans (bursty) from schedulers/bots (regular) — the
    * distributional complement to e30's top-cadence share. Gaps are
    * floor-divided to whole seconds so Σgap and Σgap² are EXACT longs
    * (one keyed window + one keyed aggregate — e11's shuffle shape);
    * μ/σ/B are scalar doubles from those exact sums, variance clamped
    * at 0 before the sqrt so a constant-gap user can't go NaN on a
    * rounding ulp. A gapless user (n=1 event) drops out with the
    * first lag.
    */
  def e43Burstiness(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val mu = col("sg").cast("double") / col("n_gaps")
    val variance =
      (col("sg2").cast("double") - col("sg").cast("double") * col("sg") / col("n_gaps")) /
        col("n_gaps")
    val sigma = sqrt(greatest(variance, lit(0.0)))
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("diff", col("tus") - lag("tus", 1).over(w))
      .filter(col("diff").isNotNull)
      .select(col("user_id"), expr("diff div 1000000").as("gap"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum("gap").as("sg"),
        sum(col("gap") * col("gap")).as("sg2")
      )
      .select(
        col("user_id"),
        col("n_gaps"),
        round(mu, 4).as("mean_gap_s"),
        when(sigma + mu > 0, round((sigma - mu) / (sigma + mu), 6)).as("burstiness")
      )
      .orderBy("user_id")
  }

  /** e44: ENGAGEMENT GINI — per event type, the Gini coefficient of
    * per-user event counts: 0 = perfectly even engagement, → 1 = a few
    * whales generate everything. The inequality lens product teams put
    * next to DAU (c30 applies the same statistic to FILE sizes; this
    * is the behavioral version, and the rank axis is users, which c30's
    * ≤24-rows-per-day shortcut cannot cover). Two keyed shuffles: user
    * counts, then the within-type rank via [[ScaleRank.withRank]] — a
    * per-type `row_number` would funnel each type through ONE reducer
    * (a handful of types × a billion users each = q57's hazard in
    * group clothing); the stitched rank keeps every window keyed on
    * (pid, type). With counts and ranks both integers, Σi·xᵢ and Σxᵢ
    * are EXACT longs (merge-order-free), so the only double is the
    * final ratio: G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx), ties broken
    * deterministically on (count, user_id).
    */
  def e44EngagementGini(s: SparkSession, d: String): DataFrame = {
    val counts = Tables
      .events(s, d)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
    ScaleRank
      .withRank(counts, Seq("event_type"), Seq(col("cnt"), col("user_id")), "i")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_users"),
        sum("cnt").as("total_events"),
        // Σi·x in DECIMAL: at 10⁹ users the long sum would wrap
        // (~5·10¹⁹ > 2⁶³) — decimal(28,0) is exact to 10²⁸ and the
        // formula goes double afterwards anyway
        sum((col("i") * col("cnt")).cast("decimal(28,0)")).as("swx")
      )
      .select(
        col("event_type"),
        col("n_users"),
        col("total_events"),
        // 2·Σi·x stays an exact long; ONE cast to double per term so the
        // SQL-literal path (2.0 parses as DECIMAL) can't diverge
        round(
          ((col("swx") * 2).cast("double") -
            (col("n_users") + lit(1L)) * col("total_events").cast("double")) /
            (col("n_users") * col("total_events").cast("double")),
          6
        ).as("gini")
      )
      .orderBy("event_type")
  }

  /** e45: SEASONAL-NAIVE FORECAST BACKTEST — the "is a model even worth
    * it" baseline every forecasting effort starts from: predict each
    * (type, day, hour) count with the count one week earlier, score
    * MAE and sMAPE per type over days 8–28 on a DENSE hourly spine
    * (e26's gap-fill discipline — silent hours are real zeros, and
    * both engines see the same spine because it is generated, not
    * derived). The forecast join is a keyed equi-join on
    * (type, day−7, hour) — no window, no self-range-join. |a−f| sums
    * are exact longs; each sMAPE term (0 when both sides are 0, the
    * standard convention) is quantized to decimal before summing
    * (t34's discipline), so both aggregates are merge-order-free.
    */
  def e45ForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val scored = seasonalScored(s, d)
      .withColumn("ae", abs(col("a") - col("f")))
      .withColumn(
        "smape_t",
        when(col("a") + col("f") === 0, lit(BigDecimal(0)).cast("decimal(12,10)"))
          .otherwise(
            round(
              (col("ae") * 2).cast("double") / (col("a") + col("f")),
              9
            ).cast("decimal(12,10)")
          )
      )
    scored
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_points"),
        sum("ae").as("sae"),
        sum("smape_t").as("ssm")
      )
      .select(
        col("event_type"),
        col("n_points"),
        round(col("sae").cast("double") / col("n_points"), 6).as("mae"),
        round(col("ssm").cast("double") / col("n_points"), 6).as("smape")
      )
      .orderBy("event_type")
  }

  /** e45's dense scored spine (type, day, hour, actual, forecast) —
    * shared by the backtest report and e46's anomaly screen.
    */
  private def seasonalScored(s: SparkSession, d: String): DataFrame = {
    val counts = Tables
      .events(s, d)
      .select(col("event_type"), dayofmonth(col("ts")).as("dm"), hour(col("ts")).as("hr"))
      .groupBy("event_type", "dm", "hr")
      .agg(count(lit(1)).as("c"))
    val spine = counts
      .select("event_type")
      .distinct()
      .select(col("event_type"), explode(sequence(lit(8), lit(28))).as("dm"))
      .select(col("event_type"), col("dm"), explode(sequence(lit(0), lit(23))).as("hr"))
    spine
      .join(counts, Seq("event_type", "dm", "hr"), "left")
      .withColumn("a", coalesce(col("c"), lit(0L)))
      .drop("c")
      .join(
        counts.select(col("event_type"), (col("dm") + 7).as("dm"), col("hr"), col("c").as("f0")),
        Seq("event_type", "dm", "hr"),
        "left"
      )
      .withColumn("f", coalesce(col("f0"), lit(0L)))
      .drop("f0")
  }

  /** e46: SEASONAL ANOMALY SCREEN — e45's residuals pushed through
    * e22's robust MAD gate: per type, flag the (day, hour) cells whose
    * seasonal-naive residual sits more than 3 MADs from the median
    * residual — the alerting op a monitoring tier derives from the
    * backtest ("traffic did something last week's shape doesn't
    * explain"). Residuals are exact integers on the dense spine;
    * median/MAD use the interpolated `percentile` (DuckDB
    * quantile_cont parity — e22's proven discipline), whose .0/.5
    * values keep every threshold comparison exact against integer
    * residuals. Two grouped percentile aggregates broadcast back, one
    * filter — no per-type window, no sort.
    */
  def e46SeasonalAnomalies(s: SparkSession, d: String): DataFrame = {
    val scored = seasonalScored(s, d).withColumn("resid", col("a") - col("f"))
    val med = scored.groupBy("event_type").agg(expr("percentile(resid, 0.5d)").as("med"))
    val mad = scored
      .join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("resid") - col("med")))
      .groupBy("event_type")
      .agg(expr("percentile(adev, 0.5d)").as("mad"), max("med").as("med"))
    scored
      .join(broadcast(mad), "event_type")
      .filter(abs(col("resid") - col("med")) > lit(3.0) * col("mad"))
      .select(
        col("event_type"),
        col("dm"),
        col("hr"),
        col("a").as("actual"),
        col("f").as("forecast"),
        col("resid")
      )
      .orderBy("event_type", "dm", "hr")
  }

  /** e47: INTER-EVENT SURVIVAL — the discrete survival function of the
    * per-user inter-event gap, per event type: at each threshold (1 m,
    * 5 m, 15 m, 1 h, 6 h, 24 h), the share of gaps that EXCEED it — the
    * curve capacity planners and churn models read ("how long until the
    * next event, and how heavy is the tail"). One keyed window builds
    * the gaps (µs-exact longs, e11's discipline); the survival curve is
    * a conditional-count aggregate over integer thresholds — no
    * percentile machinery, no second shuffle beyond the model-sized
    * per-type rollup.
    */
  def e47Survival(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("tus"), col("event_id"))
    val gaps = Tables
      .events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("gap_us", col("tus") - lag("tus", 1).over(w))
      .filter(col("gap_us").isNotNull)
    val thresholds = Seq(
      ("s_1m", 60L), ("s_5m", 300L), ("s_15m", 900L),
      ("s_1h", 3600L), ("s_6h", 21600L), ("s_24h", 86400L)
    )
    val survCols = thresholds.map { case (name, secs) =>
      round(
        sum(when(col("gap_us") > secs * 1000000L, 1L).otherwise(0L)).cast("double") /
          count(lit(1)),
        6
      ).as(name)
    }
    gaps
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), survCols: _*)
      .orderBy("event_type")
  }

  /** e48: PEAK DETECTION with prominence — hourly event-rate local
    * maxima per type: a peak hour strictly exceeds both neighbors AND
    * carries ≥ 5/4 of the centered 7-hour mean (28·c > 5·Σ₇ in exact
    * integer cross-multiplication — no float compare to disagree
    * about). The hourly rollup is map-side-combined to a model-sized
    * series, so the window passes run over hours-per-type rows, not
    * events.
    */
  def e48Peaks(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables
      .events(s, d)
      .groupBy(
        col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hr_s")
      )
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("hr_s")
    val w7 = w.rowsBetween(-3, 3)
    hourly
      .withColumn("prev_c", lag("c", 1).over(w))
      .withColumn("next_c", lead("c", 1).over(w))
      .withColumn("sum7", sum("c").over(w7))
      .withColumn("n7", count(lit(1)).over(w7))
      // full 7-hour context only (series edges can't certify prominence)
      .filter(
        col("prev_c").isNotNull && col("next_c").isNotNull && col("n7") === 7 &&
          col("c") > col("prev_c") && col("c") > col("next_c") &&
          col("c") * 28 > col("sum7") * 5
      )
      .select(
        col("event_type"),
        col("hr_s"),
        col("c").as("n_events"),
        round(col("c") * 7.0 / col("sum7"), 4).as("prominence")
      )
      .orderBy("event_type", "hr_s")
  }

  /** e49 (round 14): HOUR-OF-DAY CONCENTRATION — how diurnal each event
    * type is: events bucketed by hour of day, reported as the peak hour
    * (deterministic tiebreak: higher count, then earlier hour), its
    * share, and the Shannon entropy of the 24-bin hour distribution
    * (uniform traffic → ln 24 ≈ 3.178; a cron job → 0). Bots and batch
    * jobs pin to one hour; humans smear — the cheapest cadence
    * fingerprint after e30. Entropy uses s33's decimal-quantized
    * Σ c·ln c fold (integer counts, one rounded log per GRAIN not per
    * row), so the cross-row fold is order-exact and DuckDB-replayable.
    * Scale: two shuffles at (type, hour) grain — at most 24·|types|
    * rows after the first aggregate.
    */
  def e49HourEntropy(s: SparkSession, d: String): DataFrame = {
    val hc = Tables
      .events(s, d)
      .select(col("event_type"), hour(col("ts")).as("h"))
      .groupBy("event_type", "h")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy(desc("cnt"), col("h"))
    val peak = hc
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h").cast("int").as("peak_hour"), col("cnt").as("peak_cnt"))
    hc.groupBy("event_type")
      .agg(
        sum("cnt").as("n"),
        count(lit(1)).as("n_hours"),
        sum(
          col("cnt").cast("decimal(12,0)") * round(log(col("cnt")), 9).cast("decimal(20,10)")
        ).as("sclnc")
      )
      .join(broadcast(peak), Seq("event_type"))
      .select(
        col("event_type"),
        col("n"),
        col("n_hours"),
        col("peak_hour"),
        round(col("peak_cnt").cast("double") / col("n"), 6).as("peak_share"),
        round(
          log(col("n").cast("double")) - col("sclnc").cast("double") / col("n"),
          6
        ).as("hour_entropy")
      )
      .orderBy("event_type")
  }

  /** e50 (round 14): SESSION SHAPE — the corpus-level distribution of
    * session lengths (e2's 30-minute-gap sessions): session count,
    * singleton share (the bounce rate), mean/max length, and a
    * 1 / 2–3 / 4–7 / 8+ length histogram. All folds are exact integer
    * counts; the only division is the final two report ratios. One
    * keyed lag window + two aggregates — no percentile machinery, no
    * global sort.
    */
  def e50SessionShape(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val lens = Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn(
        "nf",
        when(
          lag("ts", 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) > 1800000000L,
          1L
        ).otherwise(0L)
      )
      .withColumn("session_id", sum("nf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("len"))
    lens
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("len") === 1, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("len").between(2, 3), 1L).otherwise(0L)).as("n_2_3"),
        sum(when(col("len").between(4, 7), 1L).otherwise(0L)).as("n_4_7"),
        sum(when(col("len") >= 8, 1L).otherwise(0L)).as("n_8_plus"),
        sum("len").as("n_events"),
        max("len").as("max_len")
      )
      .select(
        col("n_sessions"),
        col("n_singleton"),
        col("n_2_3"),
        col("n_4_7"),
        col("n_8_plus"),
        col("max_len"),
        round(col("n_singleton").cast("double") / col("n_sessions"), 6).as("bounce_rate"),
        round(col("n_events").cast("double") / col("n_sessions"), 6).as("mean_len")
      )
  }

  /** e51 (round 14): AUDIENCE-OVERLAP MATRIX — exact Jaccard of user
    * sets for every event-type PAIR (e27 measures one pair with theta
    * sketches; this is the exact full matrix — types are few, so the
    * matrix is model-sized). One dedup to (type, user) grain, one
    * self-equi-join ON USER (pair space = Σ per-user types², bounded by
    * types²·users), exact integer intersections; union sizes by
    * inclusion-exclusion — no second pass over users.
    */
  def e51TypeOverlap(s: SparkSession, d: String): DataFrame = {
    val tu = Tables
      .events(s, d)
      .select(col("event_type"), col("user_id"))
      .distinct()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("n_users"))
    val inter = tu
      .as("a")
      .join(tu.as("b"), col("a.user_id") === col("b.user_id") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n_users").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n_users").as("n_b"))), "type_b")
      .select(
        col("type_a"),
        col("type_b"),
        col("n_a"),
        col("n_b"),
        col("n_both"),
        round(
          col("n_both").cast("double") / (col("n_a") + col("n_b") - col("n_both")),
          6
        ).as("jaccard")
      )
      .orderBy("type_a", "type_b")
  }

  /** e52 (round 15): VALUE HIGH-WATERMARK — every event tagged with the
    * largest `value` seen up to it in arrival order (`max(value) OVER
    * (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`, no PARTITION
    * BY): the running-record view a fraud/limits desk keeps, and the
    * FLOAT leg of the round-15 GlobalPrefixExtremum idiom — running
    * min/max needs only ORDERING comparisons (stock Min/Max's own), so
    * doubles ride the distributed stitch that the byte-equality rank
    * modes must refuse. Emits the event's share of the record
    * (value/hwm) rounded for engine float parity.
    */
  def e52HighWatermark(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(col("event_id"), col("ts"), col("value").cast("double").as("value"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev.withColumn("hwm", max("value").over(w))
      .select(
        col("event_id"),
        round(col("value"), 6).as("value"),
        round(col("hwm"), 6).as("hwm"),
        round(col("value") / col("hwm"), 6).as("share_of_record")
      )
      .orderBy("event_id")
  }

  /** e53 (round 15): PEAK SESSION CONCURRENCY — the capacity-planning
    * number ("how many sessions were open AT ONCE, per day"): e2's
    * 30-minute-gap sessions become ±1 boundary events, the GLOBAL
    * running sum over (time, starts-before-ends) order is the live
    * concurrency — an interval sweep whose prefix sum rides
    * GlobalPrefixSumExec instead of a 1-task window (boundaries are
    * 2×sessions — data-sized, the exact shape the exec exists for) —
    * and each day reports its peak. Ends tie-break AFTER starts at the
    * same microsecond, so back-to-back sessions overlap at the touch
    * point (the conservative capacity convention).
    */
  def e53PeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables
      .events(s, d)
      .select("user_id", "event_id", "ts")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn(
        "nf",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
          .otherwise(0)
      )
      .withColumn(
        "session_id",
        sum("nf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy("user_id", "session_id")
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us")
      )
    val bounds = sess
      .select(col("start_us").as("t_us"), lit(1L).as("delta"), col("user_id"), col("session_id"))
      .unionByName(
        sess.select(col("end_us").as("t_us"), lit(-1L).as("delta"), col("user_id"), col("session_id"))
      )
    val sweep = Window
      .orderBy(col("t_us"), desc("delta"), col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("conc", sum("delta").over(sweep))
      .groupBy(timestamp_micros(col("t_us")).cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_boundaries"),
        max("conc").as("peak_concurrency")
      )
      .orderBy("day")
  }

  /** e54 (round 15): GLOBAL INTER-ARRIVAL GAPS — every event's distance
    * (µs) to the previous and next event ANYWHERE in the stream (the
    * traffic-grain gap series behind arrival-rate and outage analysis):
    * `lag`/`lead` with NO partition key — the round-15
    * GlobalOffsetWindow idiom. Each partition borrows exactly k=1
    * boundary value from its neighbors (O(P) driver metadata); stock
    * Spark would sort every event into one task. Data-grain output
    * hash-gates both directions end-to-end.
    */
  /** e55 (round 15): DAY-CLOSE RECORD VALUE — every event tagged with
    * the largest `value` seen through ITS DAY'S CLOSE: `max(value)
    * OVER (ORDER BY day)` with NO frame clause — the default RANGE
    * frame runs through the whole day peer group, the extremum twin of
    * q72's cumulative. Rides GlobalRangePrefixSumExec's ExtremumK mode
    * (double INPUT is legal — the stitch compares values by stock
    * Max's interpreted ordering; only ORDER keys must be non-float,
    * and the key is a date). Emits whether the event's own day set the
    * running record.
    */
  def e55DayRecord(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(col("event_id"), col("ts").cast("date").as("day"), col("value").cast("double").as("value"))
    val w = Window.orderBy(col("day")) // default RANGE frame — deliberate
    ev.withColumn("day_close_record", max("value").over(w))
      .select(
        col("event_id"),
        col("day"),
        round(col("value"), 6).as("value"),
        round(col("day_close_record"), 6).as("day_close_record")
      )
      .orderBy("event_id")
  }

  def e54GlobalInterarrival(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.orderBy(col("us"), col("event_id"))
    ev.withColumn("gap_us", col("us") - lag("us", 1).over(w))
      .withColumn("next_gap_us", lead("us", 1).over(w) - col("us"))
      .select("event_id", "gap_us", "next_gap_us")
      .orderBy("event_id")
  }

  /** e57 (round 16): ROLLING EXACT P95 — the sliding service-latency
    * staple: per event type, the 95th percentile of the last 100
    * values (ROWS 99 PRECEDING .. CURRENT), nearest-rank semantics
    * (`sorted[ceil(0.95·n)]`, 1-based). Exact integer cents so the sort
    * and pick are bit-identical on both engines; the oracle builds the
    * SAME explicit sorted-list-index (DuckDB `list(...) OVER` +
    * `list_sort` + 1-based index) rather than an engine quantile
    * function, so no interpolation-convention drift can bite. Per-row
    * cost O(k log k) at k=100 — bounded and keyed (no global window);
    * at large k the scale path is [[e57bRollingP95Wide]]'s two-heap
    * [[graft.plans.RollingQuantileExec]] (round 18 — O(log k)/row,
    * crossover measured 10.8×/27.8× at k=1000 on 2M/10M rows), not a
    * wider sort.
    */
  def e57RollingP95(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents")
      )
    val w = Window
      .partitionBy("event_type")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-99, Window.currentRow)
    ev.withColumn("win", collect_list("cents").over(w))
      .select(
        col("event_id"),
        col("event_type"),
        col("cents"),
        size(col("win")).cast("long").as("n_win"),
        element_at(sort_array(col("win")), ceil(lit(0.95) * size(col("win"))).cast("int"))
          .as("p95_cents")
      )
      .orderBy("event_id")
  }

  /** e56 (round 16): MIXED GLOBAL REPORT — the query shape the round-16
    * SPLIT rewrite exists for: four expressions over ONE global window
    * (the analyzer merges same-spec windows into one Window node) where
    * three are rewritable idioms — running event count (default-RANGE
    * count), running value total in cents (default-RANGE sum), running
    * average (the new avg decomposition) — and one is NOT:
    * `first_value(event_type)`, which keeps a stock Window computing
    * ONLY itself on top of the chain. Pre-split, that one expression
    * silently dragged all four onto the 1-task plan. The (us, event_id)
    * order is total, so first_value is deterministic on both engines.
    */
  def e56MixedReport(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_id"),
        unix_micros(col("ts")).as("us"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents")
      )
    val w = Window.orderBy(col("us"), col("event_id")) // default RANGE frame
    ev.withColumn("cum_n", count(lit(1)).over(w))
      .withColumn("cum_cents", sum("cents").over(w))
      .withColumn("avg_cents", avg("cents").over(w))
      .withColumn("first_type", first("event_type").over(w))
      .select("event_id", "us", "cents", "cum_n", "cum_cents", "avg_cents", "first_type")
      .orderBy("event_id")
  }

  /** e58 (round 17): LOCF — last observation carried forward, THE
    * canonical sensor/sessions gap-repair idiom: per user, a missing
    * reading (here: 'click' events carry no value) takes the user's
    * most recent non-null one. Written as the textbook
    * `last_value(v IGNORE NULLS) OVER (PARTITION BY user ORDER BY ts
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW)` — a PARTITIONED window,
    * so stock Spark hash-distributes it by user (no global-window
    * cliff; scales to any user count), and the rows before a user's
    * first observation stay NULL — the exact running-frame IGNORE
    * NULLS semantics the round-17 rewrite guards pin (q78 gates the
    * global form; e58 gates the partitioned form both engines run
    * stock).
    */
  def e58Locf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "click", lit(null))
          .otherwise(round(col("value") * 100).cast("long"))
          .as("v_obs")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("locf", last("v_obs", ignoreNulls = true).over(w))
      .orderBy("event_id")
  }

  /** e57b (round 18 — the r17 verdict's #2): the LARGE-k scale path for
    * e57's rolling exact quantile. At k=100 the collect_list/sort_array
    * form's O(k log k) per row is the right trade; at k=1000 it is ~10×
    * the comparisons of the incremental structure, so this rides
    * [[graft.plans.RollingQuantileExec]] — two lazy-deletion heaps, O(log
    * k) per row, O(k) state per task — under the SAME sorted-index
    * definition (`element_at(sort_array(win), ceil(0.95·n))`) and the
    * same DuckDB oracle, just with a 1000-row frame. RankScaleBench's
    * `rolling_q` row measures the crossover at 50M.
    */
  def e57bRollingP95Wide(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents")
      )
    graft.plans.RollingQuantile
      .withRollingQuantile(
        ev,
        partCols = Seq("event_type"),
        orderCols = Seq("us", "event_id"),
        valueCol = "cents",
        k = 1000,
        q = 0.95,
        nWinName = "n_win",
        outName = "p95_cents"
      )
      .select("event_id", "event_type", "cents", "n_win", "p95_cents")
      .orderBy("event_id")
  }

  /** e59 (round 18): GLOBAL IGNORE-NULLS OFFSETS — `lag(v, 2) IGNORE
    * NULLS` / `lead(v, 3) IGNORE NULLS` over the corpus-wide (us,
    * event_id) total order, where 'click' events inject the nulls
    * (~21% of rows): the previous-2nd / next-3rd NON-NULL observation
    * at every event, the sensor-gap-skipping read every telemetry
    * pipeline writes. Unpartitioned, so stock Spark funnels the stream
    * through ONE task — the last lint-warned offset shape; since round
    * 18 it rides GlobalOffsetWindowExec's non-null boundary metadata
    * (O(P·k) driver stitch, peek-FIFO lag, need-indexed lead) on the
    * parallel range exchange. DuckDB pins the k-th-non-null semantics
    * independently (`lag(x, 2 IGNORE NULLS)` — measured agreement,
    * round 18).
    */
  def e59OffsetIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val ev = Tables
      .events(s, d)
      .select(
        col("event_id"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "click", lit(null))
          .otherwise(round(col("value") * 100).cast("long"))
          .as("v_obs")
      )
    val w = Window.orderBy(col("us"), col("event_id"))
    ev.withColumn("prev2_nn", lag(col("v_obs"), 2, null, ignoreNulls = true).over(w))
      .withColumn("next3_nn", lead(col("v_obs"), 3, null, ignoreNulls = true).over(w))
      .orderBy("event_id")
  }
}
