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
    * 2.68, -0.13 (string-repr HALF_UP shaped). Round 17: re-surfaced
    * as DOUBLE under the portable-surface rule (PortableSurfaceSpec) —
    * the cast-to-decimal primitive is still fully probed (the decimal
    * is constructed, then correctly-rounded back; 1.01 vs 1.0 remain
    * distinguishable doubles), but the gate edge can no longer be hit
    * by the harness's trailing-zero decimal canon.
    */
  def pb04CastDoubleDec(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(18,2)) AS DOUBLE) AS c_0125",
      "CAST(CAST(CAST(1.005 AS DOUBLE) AS DECIMAL(18,2)) AS DOUBLE) AS c_1005",
      "CAST(CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(18,2)) AS DOUBLE) AS c_2675",
      "CAST(CAST(CAST(-0.125 AS DOUBLE) AS DECIMAL(18,2)) AS DOUBLE) AS c_m0125"
    )

  /** pb05: the exact old-q65 scalar composition — round(DOUBLE, 2)
    * THEN cast to DECIMAL(18,2) — on locally-agreeing values. DOUBLE
    * at the edge since round 17 (same rationale as pb04).
    */
  def pb05RoundThenCast(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(round(CAST(0.125 AS DOUBLE), 2) AS DECIMAL(18,2)) AS DOUBLE) AS rc_0125",
      "CAST(CAST(round(CAST(2.675 AS DOUBLE), 2) AS DECIMAL(18,2)) AS DOUBLE) AS rc_2675"
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
    * NOT in the per-row rounding at all. Round 17: the decimal book
    * total re-surfaces as DOUBLE — this one was a LIVE latent red (a
    * data-grain sum lands on a trailing-zero cent value with prob
    * ~1/10 per SF); the decimal sum still happens, only the edge cast
    * changed.
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
        "CAST(CAST(sum(price_dec) AS DECIMAL(18,2)) AS DOUBLE) AS book_total_roundpath",
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
    * the portable (18,2) surface exactly. Round 17: the FINAL surface
    * is DOUBLE — the round-16 driver run proved the red was the
    * harness's DECIMAL value canonicalization on trailing-zero values
    * (6.60 red here while pb04's 0.13/2.68 stayed green), not the sum
    * arithmetic; decimal→double is correctly rounded on both engines
    * so the same exact decimal yields the bit-identical double, the
    * width-discipline primitive stays probed, and the rendering
    * divergence is bypassed (VERDICT r16 "Next round" #1).
    */
  def pb10DecSumWidth(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(CAST(1.10 AS DECIMAL(18,2)) + CAST(2.20 AS DECIMAL(18,2)) + CAST(3.30 AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS DOUBLE) AS sum_dec"
    )

  /** pb11: exact integer→decimal constructions — BIGINT cast to
    * DECIMAL(18,2) (12345 → 12345.00) and the cents→dollars exact
    * multiply ((18,0) × (3,2), exact, no rounding step). Round 17:
    * DOUBLE at the surface for the same reason as pb10 (12345.00 is a
    * trailing-zero decimal, the exact shape the driver canon strips);
    * both output values are small integers, exact in double on both
    * engines, so int→decimal exactness stays fully probed.
    */
  def pb11IntDecExact(s: SparkSession, d: String): DataFrame =
    probe(
      s,
      "CAST(CAST(CAST(12345 AS BIGINT) AS DECIMAL(18,2)) AS DOUBLE) AS int_as_dec",
      "CAST(CAST(CAST(123456789 AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS DOUBLE) AS cents_as_dollars"
    )

  /** pb12/pb13 (round 17): the trailing-zero DISCRIMINATOR PAIR the
    * r16 verdict ordered. Identical construction — a literal cast to
    * DECIMAL(18,2), the simplest possible decimal surface, zero
    * arithmetic — differing ONLY in whether the value carries a
    * trailing zero (1.50 vs 1.51). Theory from rounds 14–16: the
    * driver harness canonicalizes DECIMAL output values through a
    * trailing-zero-stripping / float-round-trip step (`6.60` → `6.6`),
    * so pb12 is EXPECTED RED and pb13 EXPECTED GREEN in the driver
    * run. pb12 red + pb13 green ⇒ rendering divergence CONFIRMED
    * (engine arithmetic exonerated, portable-surface rule justified
    * forever); both green ⇒ the canon was fixed upstream and DECIMAL
    * surfaces are safe again; both red ⇒ theory wrong, investigate.
    * Locally Spark and DuckDB agree exactly on both. These two probes
    * are the ONLY gated queries allowed a DECIMAL final column (see
    * PortableSurfaceSpec).
    */
  def pb12DecTrailingZero(s: SparkSession, d: String): DataFrame =
    probe(s, "CAST(1.50 AS DECIMAL(18,2)) AS v")

  def pb13DecNoTrailingZero(s: SparkSession, d: String): DataFrame =
    probe(s, "CAST(1.51 AS DECIMAL(18,2)) AS v")
}
