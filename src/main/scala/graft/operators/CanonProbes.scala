package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Canon-probe battery (round 16).
  *
  * Two rounds were burned guessing WHICH arithmetic primitive the
  * driver's DuckDB canon disagrees on (round 14 guessed "wide decimal"
  * — wrong; round 15 proved the divergence sits in q65's
  * `round(double, 2) → DECIMAL(18,2)` step but still couldn't name the
  * exact semantic). These probes make the next divergence a TABLE
  * LOOKUP: each is a one-row query isolating ONE portability
  * primitive, written as the SAME SQL text on both engines, chosen so
  * Spark 4.1.2 and DuckDB 1.0.0 agree locally. If the driver's DuckDB
  * computes any primitive differently, that probe — and only that
  * probe — goes red in CORRECTNESS_r*, naming the divergent semantic
  * for free, forever.
  *
  * Background measured locally (Spark 4.1.2 vs DuckDB 1.0.0): DuckDB
  * 1.0.0's `round(DOUBLE, 2)` is multiply-by-100-then-round on the
  * binary value (so round(1.005, 2) = 1.00 because 1.005*100 =
  * 100.4999…, but round(2.675, 2) = 2.68 because 2.675*100 =
  * 267.50000000000006), while Spark's is HALF_UP on the shortest
  * decimal string (round(1.005, 2) = 1.01, round(8.165, 2) = 8.17).
  * Values where the engines already disagree locally (1.005, 8.165 at
  * 2dp) are deliberately EXCLUDED — a probe must be locally green so a
  * driver red means "the driver's canon moved", not "we shipped a
  * known mismatch". pb07/pb08 are the data-grain replays of the old
  * q65 formula over `orders`: if the scalar probes stay green but
  * pb07/pb08 go red, the divergence is data-dependent and pb07's
  * disagreement count says on how many rows.
  */
object CanonProbes {

  /** One row from a literal-only projection; identical text runs on
    * DuckDB. `range(1)` keeps it a real (1-task) Spark job.
    */
  private def probe(s: SparkSession, exprs: String*): DataFrame =
    s.range(1).selectExpr(exprs: _*).drop("id")

  /** pb01: round(DOUBLE) to integer at exact binary halves — the
    * half-up-away-from-zero vs half-even fork. Both engines: 1, 2, 3,
    * -1, -3. A half-even canon would emit 0, 2, 2, 0, -2.
    */
  def pb01RoundHalfInt(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "round(CAST(0.5 AS DOUBLE)) AS r_0_5",
      "round(CAST(1.5 AS DOUBLE)) AS r_1_5",
      "round(CAST(2.5 AS DOUBLE)) AS r_2_5",
      "round(CAST(-0.5 AS DOUBLE)) AS r_m0_5",
      "round(CAST(-2.5 AS DOUBLE)) AS r_m2_5"
    )

  /** pb02: round(DOUBLE, 2) at BINARY-REPRESENTABLE halves (0.125 =
    * 2^-3 exactly) — ties must break away from zero on both engines:
    * 0.13, 0.38, -0.13. Half-even would give 0.12, 0.38, -0.12.
    */
  def pb02RoundReprHalf(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "round(CAST(0.125 AS DOUBLE), 2) AS r_0125",
      "round(CAST(0.375 AS DOUBLE), 2) AS r_0375",
      "round(CAST(-0.125 AS DOUBLE), 2) AS r_m0125"
    )

  /** pb03: round(DOUBLE, 2) at a NON-representable literal where the
    * string-based (Spark) and multiply-based (DuckDB 1.0.0) semantics
    * happen to AGREE: 2.675 → 2.68 on both (Spark: "2.675" HALF_UP;
    * DuckDB: 2.675*100 = 267.50000000000006 → 268). A true-binary
    * canon (round the exact binary 2.67499999999999982…) gives 2.67 —
    * this probe red fingers THAT class, the prime q65 suspect.
    */
  def pb03RoundNonRepr(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "round(CAST(2.675 AS DOUBLE), 2) AS r_2675",
      "round(CAST(2.345 AS DOUBLE), 2) AS r_2345",
      "round(CAST(1.115 AS DOUBLE), 2) AS r_1115"
    )

  /** pb04: CAST(DOUBLE AS DECIMAL(18,2)) — the cast's own rounding,
    * separate from round()'s. Locally both engines emit 0.13, 1.01,
    * 2.68, -0.13 (string-repr HALF_UP shaped).
    */
  def pb04CastDoubleDec(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(18,2)) AS c_0125",
      "CAST(CAST(1.005 AS DOUBLE) AS DECIMAL(18,2)) AS c_1005",
      "CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(18,2)) AS c_2675",
      "CAST(CAST(-0.125 AS DOUBLE) AS DECIMAL(18,2)) AS c_m0125"
    )

  /** pb05: the exact old-q65 scalar composition — round(DOUBLE, 2)
    * THEN cast to DECIMAL(18,2) — on locally-agreeing values.
    */
  def pb05RoundThenCast(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(round(CAST(0.125 AS DOUBLE), 2) AS DECIMAL(18,2)) AS rc_0125",
      "CAST(round(CAST(2.675 AS DOUBLE), 2) AS DECIMAL(18,2)) AS rc_2675"
    )

  /** pb06: the exact-cents derivation q70/q72/q65-new ride —
    * round(DOUBLE * 100) → BIGINT. 100, 268, 13 on both engines.
    */
  def pb06CentsPath(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(round(CAST(1.005 AS DOUBLE) * 100) AS BIGINT) AS cents_1005",
      "CAST(round(CAST(2.675 AS DOUBLE) * 100) AS BIGINT) AS cents_2675",
      "CAST(round(CAST(0.125 AS DOUBLE) * 100) AS BIGINT) AS cents_0125"
    )

  /** pb07: DATA-GRAIN formula-agreement count over `orders` — on how
    * many rows does `round(price, 2)*100` disagree with
    * `round(price*100)`? 0 on both engines locally at every gated SF.
    * If this goes red (or nonzero) under the driver while pb01–pb06
    * stay green, the divergence is data-dependent and this count
    * bounds the blast radius.
    */
  def pb07FormulaAgree(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .selectExpr("o_totalprice")
      .selectExpr(
        "CAST(round(round(o_totalprice, 2) * 100) AS BIGINT) AS round_path",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents_path"
      )
      .selectExpr(
        "count(*) AS n_rows",
        "CAST(sum(CASE WHEN round_path <> cents_path THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree"
      )

  /** pb08: the old q65 book total collapsed to ONE row — sum of
    * `CAST(round(price, 2) AS DECIMAL(18,2))` over all orders, next to
    * the exact-cents total. Red here with green scalars = the rounded
    * sum moved on some row; green here = the driver's old-q65 red was
    * NOT in the per-row rounding at all.
    */
  def pb08BookTotal(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .selectExpr("o_totalprice")
      .selectExpr(
        "CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price_dec",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents"
      )
      .selectExpr(
        "count(*) AS n_orders",
        "CAST(sum(price_dec) AS DECIMAL(18,2)) AS book_total_roundpath",
        "CAST(sum(price_cents) AS BIGINT) AS book_cents"
      )

  /** pb09: transcendental formatting — ln/exp/pow rounded to 10dp (the
    * gate's float compare rounds to 9dp; 10dp leaves one digit of
    * slack so a libm difference in the 10th digit still trips it).
    */
  def pb09Transcendental(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "round(ln(CAST(2 AS DOUBLE)), 10) AS ln2",
      "round(exp(CAST(1 AS DOUBLE)), 10) AS e1",
      "round(power(CAST(2 AS DOUBLE), CAST(0.5 AS DOUBLE)), 10) AS pow_2_05",
      "round(sqrt(CAST(2 AS DOUBLE)), 10) AS sqrt2"
    )

  /** pb10: DECIMAL(18,2) sum width discipline — the sum widens
    * internally (Spark (28,2), DuckDB (38,2)) and must land back at
    * the portable (18,2) surface exactly.
    */
  def pb10DecSumWidth(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(1.10 AS DECIMAL(18,2)) + CAST(2.20 AS DECIMAL(18,2)) + CAST(3.30 AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS sum_dec"
    )

  /** pb11: exact integer→decimal constructions — BIGINT cast to
    * DECIMAL(18,2) (12345 → 12345.00) and the cents→dollars exact
    * multiply ((18,0) × (3,2), exact, no rounding step).
    */
  def pb11IntDecExact(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(12345 AS BIGINT) AS DECIMAL(18,2)) AS int_as_dec",
      "CAST(CAST(123456789 AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS cents_as_dollars"
    )
}
