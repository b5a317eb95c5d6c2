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
}
