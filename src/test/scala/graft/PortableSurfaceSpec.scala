package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.DecimalType

/** The PORTABLE-SURFACE RULE as a committed gate (round-17 VERDICT
  * item 1/2): no driver-gated query may emit a DECIMAL column in its
  * FINAL projection. Rounds 14–16 proved the driver harness
  * canonicalizes DECIMAL output values through a trailing-zero-
  * stripping / float-round-trip step (pb10 `6.60` and pb11 `12345.00`
  * hash-red with rows+schema green, while trailing-zero-free decimal
  * probes pb04/pb05/pb08 stayed green), so ANY decimal final is a
  * latent red that flips the moment the data produces a value like
  * `x.x0`. Decimals remain first-class INTERNALLY (the decimal
  * GlobalPrefixSum leg, t23/t51's decimal quantization, e49's decimal
  * entropy fold are all still plan-pinned); the gate edge re-emits
  * BIGINT cents or DOUBLE (q36's `CAST(CAST(… AS DECIMAL) AS DOUBLE)`
  * pattern).
  *
  * The ONLY exceptions are pb12/pb13 — the discriminator pair whose
  * entire job is to present the same literal-decimal construction with
  * and without a trailing zero to the driver canon (pb12 expected red,
  * pb13 expected green; see CanonProbes.scala).
  */
class PortableSurfaceSpec extends AnyFunSuite {
  import TestSession._

  private val allowedDecimalFinals = Set("pb12_dec_trailing_zero", "pb13_dec_no_trailing_zero")

  test("no driver-gated query emits a DECIMAL final column (except the pb12/pb13 discriminators)") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowedDecimalFinals(name)) None
      else {
        val decCols =
          try fn(spark, sf).schema.fields.collect { case f if f.dataType.isInstanceOf[DecimalType] => f.name }.toSeq
          catch {
            case e: Throwable =>
              failures += s"$name: failed to build: ${e.getMessage}"
              Nil
          }
        if (decCols.isEmpty) None else Some(s"$name: ${decCols.mkString(", ")}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(
      offenders.isEmpty,
      "DECIMAL at the gate edge is a latent driver-canon red — re-emit as BIGINT cents or DOUBLE:\n" +
        offenders.mkString("\n")
    )
  }
}
