package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join for fact-fact shuffles where one key dominates
  * (AQE's skew-join split handles most cases at runtime; explicit salting
  * is the deterministic fallback when a single key exceeds what one task
  * can hold, or when AQE is unavailable — e.g. inside some streaming
  * plans).
  *
  * The build ("right") side is replicated `salts` times — keep it the
  * smaller input; cost is salts× its shuffle size in exchange for
  * splitting each hot key across `salts` reducers.
  */
object SkewJoin {

  /** Inner equi-join on `key` with the left side salted deterministically
    * (hash of the full row — no RNG, replayable) and the right side
    * replicated across all salt values.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val lCols: Seq[Column] = left.columns.map(col).toSeq
    val l = left.withColumn("_salt", pmod(xxhash64(struct(lCols: _*)), lit(salts)).cast("int"))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
