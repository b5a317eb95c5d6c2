package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** p1: the end-to-end training-data curation pipeline — the composition
  * the individual d/t operators exist for:
  *
  *   exact-dedup (keep min-id per content hash)
  *     → quality gate (token count, stopword ratio, distinct-token ratio)
  *     → deterministic hash sampling
  *
  * One shuffle for the dedup groupBy; every later stage is a per-row map
  * or a pushed filter, so the pipeline cost is dedup + scan regardless of
  * how many gates are added. At 100 TB the near-dup stage (d2/d6) slots
  * in between dedup and quality with its bucket-join cost profile.
  */
object Curate {

  def p1Curate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kept = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")

    val tk = filter(split(col("text"), " "), t => t =!= "")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    docs
      .join(kept, "doc_id") // left-semi by construction (kept ⊆ docs)
      .select(
        col("doc_id"),
        col("lang"),
        col("text"),
        size(tk).as("n_tokens"),
        (size(filter(tk, t => t.isin(stops: _*))).cast("double") / greatest(size(tk), lit(1)))
          .as("sr"),
        (size(array_distinct(tk)).cast("double") / greatest(size(tk), lit(1))).as("dr")
      )
      .filter(
        col("n_tokens").between(20, 1000) && col("sr") <= 0.5 && col("dr") >= 0.2 &&
          substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7")
      )
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }

  /** p2: curation with NEAR-dup dedup — the production composition at
    * 100 TB. The drop list comes from the MinHash-LSH → verify → GraphX
    * connected-components chain (d2/d6: bucket-join candidate cost, never
    * all-pairs); everything after the broadcast anti-join is a per-row
    * map or pushed filter, same as [[p1Curate]]. The DuckDB oracle
    * recomputes the full chain independently (exact pair set + recursive
    * CTE clustering + the same gates).
    */
  /** p3: the FULL curation composition under the keep-best policy —
    * near-dup clusters drop everything but their longest member
    * ([[Dedup.dropListKeepBest]]), then the blocklist gate, the quality
    * gates, and the deterministic hash sample. Same cost profile as p2
    * (bucket-join dedup chain + broadcast anti-join + per-row gates);
    * the policy change is a different ranking inside the same plan, which
    * is the point — curation policy is data, not new machinery. Oracle
    * recomputes the chain with the same keep-longest ranking in SQL.
    */
  def p3CurateKeepBest(s: SparkSession, d: String): DataFrame = {
    val dropList = Dedup.dropListKeepBest(s, d)
    val tk = filter(split(col("text"), " "), t => t =!= "")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val block = Seq("slow", "dup", "leak")
    Tables
      .documents(s, d)
      .join(broadcast(dropList), Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"),
        col("lang"),
        col("text"),
        size(tk).as("n_tokens"),
        (size(filter(tk, t => t.isin(stops: _*))).cast("double") / greatest(size(tk), lit(1)))
          .as("sr"),
        (size(array_distinct(tk)).cast("double") / greatest(size(tk), lit(1))).as("dr"),
        size(filter(tk, t => t.isin(block: _*))).as("nb")
      )
      .filter(
        col("n_tokens").between(20, 1000) && col("sr") <= 0.5 && col("dr") >= 0.2 &&
          col("nb") === 0 &&
          substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7")
      )
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }

  def p2CurateNearDup(s: SparkSession, d: String): DataFrame = {
    val dropList = Dedup
      .d6DedupClusters(s, d)
      .filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")

    val tk = filter(split(col("text"), " "), t => t =!= "")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    Tables
      .documents(s, d)
      .join(broadcast(dropList), Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"),
        col("lang"),
        col("text"),
        size(tk).as("n_tokens"),
        (size(filter(tk, t => t.isin(stops: _*))).cast("double") / greatest(size(tk), lit(1)))
          .as("sr"),
        (size(array_distinct(tk)).cast("double") / greatest(size(tk), lit(1))).as("dr")
      )
      .filter(
        col("n_tokens").between(20, 1000) && col("sr") <= 0.5 && col("dr") >= 0.2 &&
          substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7")
      )
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }
}
