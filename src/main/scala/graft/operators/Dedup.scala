package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** §2.4 deduplication operators over the `documents` corpus.
  *
  * Scale design (SURVEY.md §5): the only all-pairs computation is
  * [[d4NgramJaccard]], the *ground-truth* operator, and it is explicitly
  * capped — at 100 TB the production path is [[d2MinhashLsh]] /
  * [[d3Simhash]], whose candidate generation is a bucket equi-join
  * (shuffle keyed on (band, hash)), i.e. O(near-dup pairs), not O(n²).
  */
object Dedup {

  /** Exact dedup: content-hash groupBy. One shuffle on the hash key; at
    * scale this is the canonical "keep one per hash" pass (keep = min id).
    */
  def d1DedupExact(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
      .orderBy("h")

  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), TF.wordShingles(TF.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)

  /** MinHash + LSH banding near-dup detection.
    *
    * signature: 64 min-hashes (salted xxhash64); bands: 32 bands × 2 rows
    * (collision threshold ≈ (1/32)^(1/2) ≈ 0.18 — recall ≥ 1-1e-4 for
    * jaccard ≥ 0.5). Candidates come from an equi-join on
    * (band, hash(band rows)); each candidate pair is then exact-verified
    * with true shingle Jaccard and kept at ≥ 0.5. Deterministic (no RNG at
    * runtime), so the output equals the exact τ=0.5 pair set — the DuckDB
    * oracle computes that exactly.
    *
    * At 100 TB: tune bands/rows to the target threshold, the band join is
    * the only shuffle, and verification joins shingle sets only for
    * candidates.
    */
  def d2MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val nHashes = 64
    val rowsPerBand = 2
    val nBands = nHashes / rowsPerBand

    val sig = shingled(s, d).select(
      col("doc_id"),
      col("sh"),
      TF.minhashSignature(col("sh"), nHashes).as("sig")
    )

    val banded = sig.select(
      col("doc_id"),
      col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(nBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)
        )
      ).as(Seq("band", "bh"))
    )

    val l = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct() // a pair may collide in several bands
      .withColumn("jaccard", round(TF.jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup: 64-bit signature, candidates via 4×16-bit band join
    * (any pair at hamming ≤ 3 must agree on ≥1 of 4 bands), verified by
    * exact hamming distance.
    */
  def d3Simhash(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val sh = Tables
      .documents(s, d)
      .select(col("doc_id"), TF.simhash64(TF.tokens(col("text"))).as("sim"))

    val banded = sh.select(
      col("doc_id"),
      col("sim"),
      posexplode(
        transform(
          sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("sim"), b * lit(16)).bitwiseAND(lit(0xffffL))
        )
      ).as(Seq("band", "bh"))
    )
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b")
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Ground-truth exact n-gram Jaccard pairs. All-pairs — intentionally
    * capped to the first [[cap]] doc_ids; at scale use [[d2MinhashLsh]].
    */
  def d4NgramJaccard(s: SparkSession, d: String, cap: Int = 1000): DataFrame = {
    val sh = shingled(s, d).filter(col("doc_id") < cap)
    val l = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(TF.jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-dup pairs (cos ≥ τ). Brute verification pass —
    * the ANN-bucketed variant is Similarity.v2KnnLsh; double-precision
    * sequential fold matches the oracle bit-for-bit.
    */
  def d5DedupEmbedding(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d)
    val l = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VF.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }
}
