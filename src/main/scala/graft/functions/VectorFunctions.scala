package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level float-vector math over `array<float>` embedding columns.
  *
  * Accumulation is a sequential left fold in DOUBLE (`aggregate` over
  * `zip_with`) — bit-identical to the DuckDB oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`, which matters for
  * threshold comparisons in near-dup operators. All codegen'd built-ins,
  * no UDF boxing.
  */
object VectorFunctions {

  /** Dot product in double precision — the codegen'd [[graft.plans.FloatVecDot]]
    * expression (tight loop, no intermediate array).
    */
  def dot(a: Column, b: Column): Column = graft.plans.GraftExpressions.dotF(a, b)

  /** Composed-built-ins reference implementation of [[dot]] (identical
    * accumulation order; kept for differential testing).
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (|a| * |b|) — same association order as the
    * oracle SQL (`/ (sqrt(..) * sqrt(..))`). For pair joins prefer
    * precomputing per-side squared norms once (see Dedup.d5 / Similarity)
    * instead of recomputing both norms per pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket for a vector given literal random hyperplanes
    * (Seq of plane vectors): bit p is set iff plane_p · v > 0. With P
    * planes this maps each vector to one of 2^P buckets; near vectors
    * (small angle) collide with high probability — the scale path for
    * approximate search (candidates restricted to one bucket instead of
    * a full cross join).
    */
  def lshBucket(v: Column, planes: Seq[Array[Float]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.toIndexedSeq.map(lit): _*).cast("array<float>")
      when(dot(v, planeCol) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed — stable across
    * runs and executors; the planes ship to executors as literals).
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }
}
