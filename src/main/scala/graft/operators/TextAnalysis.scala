package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.{TextFunctions => TF}
import graft.plans.GraftExpressions

/** §2.6 text analysis over the `documents` corpus. All per-document maps
  * (no shuffle except the final t5 count) built from codegen'd array
  * lambdas — the shapes that stay cheap when `documents` is 100 TB.
  */
object TextAnalysis {

  /** r18 parallelism floor over the documents scan: every operator in
    * this file does per-row text work (tokenize / shingle / md5 / regex
    * / gram explode) that Spark fuses into the scan stage, and the
    * single-row-group sf inputs plan that stage as ONE task — see
    * [[graft.sources.Tables.parallelized]] (no-op on any many-row-group
    * production layout; Catalyst prunes columns below the exchange, so
    * only consumed columns ride it).
    */
  private def docsFloor(s: SparkSession, d: String) =
    // r19: hash-repartition on doc_id instead of round-robin — keyless
    // repartition pays a serial full-row (text included) determinism
    // sort on the 1-task scan (see Tables.parallelized scaladoc)
    Tables.parallelized(Tables.documents(s, d), col("doc_id"))

  /** Heuristic language ID (stopword-profile argmax). */
  def t1LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("lang_meta"), TF.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Quality scoring: char/token counts, mean token length, stopword
    * ratio, distinct-token ratio.
    */
  def t2QualityScore(s: SparkSession, d: String): DataFrame = {
    val tk = TF.tokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(tk).as("n_tokens"),
        round(
          aggregate(tk, lit(0L), (a, x) => a + length(x)).cast("double") /
            greatest(size(tk), lit(1)),
          4
        ).as("avg_tok_len"),
        round(
          size(filter(tk, t => t.isin("the", "a", "of", "and", "to", "in", "is", "it"))).cast("double") /
            greatest(size(tk), lit(1)),
          4
        ).as("stop_ratio"),
        round(size(array_distinct(tk)).cast("double") / greatest(size(tk), lit(1)), 4)
          .as("distinct_ratio")
      )
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def t3TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_ws_tokens"),
        size(TF.regexTokens(col("text"))).as("n_re_tokens")
      )
      .orderBy("doc_id")

  /** Document fingerprinting: cryptographic (md5) for the oracle-checked
    * surface; the order-sensitive rolling hash is exercised in tests
    * (not ANSI-SQL-expressible).
    */
  def t4Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("fp_md5"), length(col("text")).as("n_chars_m"))
      .orderBy("doc_id")

  /** Order-sensitive rolling fingerprint, PORTABLE form (round-7: was
    * rows-only). Fletcher-style modular checksum over per-token hashes:
    * `fp_sum = Σ h(tok) mod M` and `fp_pos = Σ ord·h(tok) mod M` — the
    * position weighting makes it order-sensitive (swapping two distinct
    * tokens changes fp_pos), exactly the Fletcher/Adler checksum
    * algebra. The token hash is the first 8 md5 hex digits as an
    * integer, so BOTH engines compute identical values and the query is
    * hash-gated by the driver; M·maxOrd·nTok stays far under 2^63, so
    * every product/sum is exact BIGINT arithmetic on either engine.
    * The non-portable rotl/XOR variant ([[TF.rollingFingerprint]])
    * remains ScalaTest-covered.
    */
  def t4FingerprintRolling(s: SparkSession, d: String): DataFrame = {
    val M = 34359738337L
    val toks = TF.tokens(col("text"))
    val hashes = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val fpSum = pmod(aggregate(hashes, lit(0L), (a, x) => a + x), lit(M))
    val fpPos = when(
      size(toks) > 0,
      pmod(
        aggregate(
          zip_with(hashes, sequence(lit(1), size(toks)), (h, i) => h * i.cast("long")),
          lit(0L),
          (a, x) => a + x
        ),
        lit(M)
      )
    ).otherwise(lit(0L))
    Tables.documents(s, d)
      .select(col("doc_id"), fpSum.as("fp_sum"), fpPos.as("fp_pos"))
      .orderBy("doc_id")
  }

  /** Corpus-LM quality score: average unigram log-probability per
    * document (fluency proxy — the classic cheap LM filter in
    * training-data pipelines). Two aggregations: corpus token
    * frequencies (broadcast-size vocab), then a broadcast join back to
    * the exploded tokens — the fact side shuffles once for the per-doc
    * sum.
    */
  def t7UnigramLogprob(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum("c").as("s"))
    tok
      .join(broadcast(freq), "t")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(round(sum(log(col("c") / col("s"))) / count(lit(1)), 3).as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** TF-IDF term weighting: tf = term count / doc length, idf = ln(N/df).
    * The document-frequency table is vocabulary-sized (broadcast); the
    * only fact-side shuffle is the per-(doc, term) count.
    */
  def t9Tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // corpus size as a broadcast single-row aggregate — folding N into the
    // plan instead of a driver-side count() avoids an extra full scan job
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tok = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
    val docLen = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tc"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "t")
      .join(broadcast(docLen), "doc_id")
      .crossJoin(broadcast(nDf))
      .select(
        col("doc_id"),
        col("t"),
        round((col("tc").cast("double") / col("len")) * log(col("n_docs") / col("df")), 6).as("tfidf")
      )
      .orderBy("doc_id", "t")
  }

  /** Vocabulary pruning: terms kept within a document-frequency band
    * (min_df ≤ df ≤ max_df·N) — the standard vectorizer preprocessing
    * step; the vocabulary table is broadcast-sized by construction.
    */
  def t10VocabPrune(s: SparkSession, d: String, minDf: Int = 2, maxDfFrac: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    docs
      // plain explode: a zero-token document contributes no vocabulary
      // rows (explode_outer emitted a NULL term per empty doc — a bogus
      // t=NULL vocab entry the oracle's unnest never produces)
      .select(col("doc_id"), explode(array_distinct(TF.tokens(col("text")))).as("t"))
      .groupBy("t")
      .agg(countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(nDf))
      .filter(col("df") >= minDf && col("df") <= floor(lit(maxDfFrac) * col("n_docs")).cast("long"))
      .select("t", "df")
      .orderBy("t")
  }

  /** Deterministic hash-based sampling (training-data pipelines need
    * reproducible subsets — TABLESAMPLE isn't stable across engines or
    * runs). Keeps docs whose md5 leads with one of 2/16 hex digits
    * (≈12.5%); filter pushes to the scan side of any downstream join.
    */
  def t6HashSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(substring(md5(col("text")), 1, 1).isin("0", "1"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Stratified deterministic sampling: per-language hash-bucket quotas
    * (e.g. keep 50% of 'en', 12.5% of everything else) — how pipelines
    * rebalance language mixes reproducibly. Pure per-row filter on the
    * md5 leading hex digit; pushes to the scan side of downstream joins.
    */
  def t14StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("text")), 1, 1)
    Tables.documents(s, d)
      .filter(
        when(col("lang") === "en", h.isin("0", "1", "2", "3", "4", "5", "6", "7"))
          .otherwise(h.isin("0", "1"))
      )
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Text normalization: case-fold + whitespace collapse + trim — the
    * canonical pre-tokenization cleanup pass.
    */
  def t8Normalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        trim(regexp_replace(upper(col("text")), "\\s+", " ")).as("norm"),
        length(trim(regexp_replace(upper(col("text")), "\\s+", " "))).as("norm_len")
      )
      .orderBy("doc_id")

  /** C4-style blocklist gate: keep only documents containing NO
    * blocklisted term — the standard "bad words" filter in training-data
    * curation. Pure per-row map over the token array (zero shuffle); the
    * blocklist is a plan-time literal set (at production size it becomes
    * a broadcast hash set inside a custom predicate).
    */
  def t11Blocklist(
      s: SparkSession,
      d: String,
      blocklist: Seq[String] = Seq("slow", "dup", "leak")
  ): DataFrame = {
    val tk = TF.tokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        size(tk).as("n_tokens"),
        size(filter(tk, t => t.isin(blocklist: _*))).as("n_hits")
      )
      .filter(col("n_hits") === 0)
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }

  /** Exact distributed heavy hitters (terms with frequency > n/k) in the
    * two-pass sketch shape that scales: pass 1 is the Misra-Gries custom
    * aggregate ([[graft.plans.MisraGries]]) — O(k) bytes per partition,
    * no term shuffle — whose candidate set provably contains every true
    * heavy hitter; pass 2 exactly recounts ONLY the ≤ k-1 candidates via
    * a broadcast join and applies the threshold. Deterministic (the
    * sketch's partitioning-dependent estimates never reach the output),
    * so the oracle is the plain exact HAVING query.
    */
  def t12HeavyHitters(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("t"))
    val candidates = tok
      .agg(GraftExpressions.mgCandidates(col("t"), k).as("cands"))
      .select(explode(col("cands")).as("t"))
    val total = tok.agg(count(lit(1)).as("n_tok"))
    tok
      .join(broadcast(candidates), "t")
      .groupBy("t")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") > col("n_tok") / k)
      .select("t", "cnt")
      .orderBy("t")
  }

  /** Bigram-LM fluency score: avg ln P(w_i | w_{i−1}) per document, with
    * P from corpus bigram / prefix counts — the next step up from the
    * unigram filter [[t7UnigramLogprob]] (catches shuffled-word text a
    * unigram model scores as fluent). Counts join on the bigram key
    * (shuffle; AQE broadcasts the count tables at small vocab).
    */
  def t13BigramLogprob(s: SparkSession, d: String): DataFrame = {
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        explode(
          zip_with(
            slice(col("tk"), lit(1), n1),
            slice(col("tk"), lit(2), n1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("bg")
      )
    val cb = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val cu = bg
      .select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    bg.join(cb, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cu, "w1")
      .groupBy("doc_id")
      .agg(round(avg(log(col("c2").cast("double") / col("c1"))), 3).as("avg_bg_logprob"))
      .orderBy("doc_id")
  }

  /** Corpus bigram frequency: per-doc bigram arrays explode into a single
    * count shuffle (map-side partial agg keeps it one small exchange).
    * The token array is materialized once per row (a naive inline form
    * re-evaluates the split per reference), and bigrams come from
    * zip_with over two slices — no per-element element_at chains.
    */
  /** Sequence packing: assign documents to fixed-token-budget training
    * bins (the pretraining batch-assembly step). Deterministic and
    * parallel: docs hash into 16 independent pack streams (first md5
    * nibble of doc_id), each stream fills bins greedily in doc_id order
    * via an exclusive running token sum — `bin = pre_tokens div budget`.
    * The window sorts WITHIN a hash partition only (no global sort, no
    * single-task window); bins are (stream, bin_id)-addressed, so 1000
    * executors pack 1000 streams without coordination.
    */
  def t15Pack(s: SparkSession, d: String, budget: Int = 2048): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(
        col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("tok"),
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("part")
      )
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("pre", coalesce(sum("tok").over(w), lit(0L)))
      .withColumn("bin_id", expr(s"pre div $budget"))
      .groupBy("part", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("total_tokens"))
      .orderBy("part", "bin_id")
  }

  /** Benchmark decontamination: flag corpus documents sharing any 5-gram
    * with the held-out evaluation set (here: the ~1/16 of docs whose
    * doc_id md5 starts with '0' stand in for the benchmark). The scale
    * design exploits that eval sets are TINY next to the corpus: the
    * benchmark's distinct shingle hashes broadcast, and the corpus-side
    * check is a per-partition hash probe on exploded shingle hashes (one
    * pass, no corpus shuffle beyond the per-doc count). 64-bit shingle
    * hashes ride everywhere — shingle STRINGS never leave the scan
    * (d2's trick); the string-vs-hash equivalence is the oracle check.
    */
  def t16Decontaminate(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(
        col("doc_id"),
        GraftExpressions.shingleHashes(split(col("text"), " "), n).as("sh"),
        (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) === "0").as("is_bench")
      )
      .filter(size(col("sh")) > 0)
    val bench = sh.filter(col("is_bench")).select(explode(col("sh")).as("g")).distinct()
    val corp = sh.filter(!col("is_bench")).select(col("doc_id"), explode(col("sh")).as("g"))
    corp
      .join(broadcast(bench), "g")
      // sh is sorted-DISTINCT per doc, so plain count = distinct shared shingles
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  /** t17: PII detection + redaction — the privacy-scrub pass every
    * training-data pipeline runs before text leaves curation. The
    * synthetic corpus carries no PII, so a deterministic contact block
    * (email / phone / IPv4 derived from doc_id) is appended first and
    * the redactor is graded on scrubbing it; patterns are plain-ASCII
    * regexes that mean the same thing to Java's engine and RE2. Pure
    * per-row map — zero shuffle at any scale.
    */
  def t17PiiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9-]{6,}[0-9]"
    val ip    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val id = col("doc_id").cast("string")
    val raw = concat(
      col("text"),
      lit(" reach user"), id, lit("@mail-"), id,
      lit(".example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1")
    )
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(email), lit(0))).as("n_email"),
        size(regexp_extract_all(col("raw"), lit(phone), lit(0))).as("n_phone"),
        size(regexp_extract_all(col("raw"), lit(ip), lit(0))).as("n_ip"),
        regexp_replace(
          regexp_replace(regexp_replace(col("raw"), email, "<EMAIL>"), phone, "<PHONE>"),
          ip,
          "<IP>"
        ).as("redacted")
      )
      .orderBy("doc_id")
  }

  /** t18: Gopher-style repetition signals — the quality gate that drops
    * degenerate machine-generated text: duplicate-word mass, the char
    * fraction claimed by the single most frequent word, and the fraction
    * of bigram slots taken by the top bigram. Word/bigram counts are
    * per-doc groupBys (map-side combine carries (doc, term) partials; no
    * whole-doc state on any reducer), so the shape holds when documents
    * is 100 TB.
    */
  def t18Repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val wordStats = docs
      .select(col("doc_id"), explode(col("tk")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max(col("c") * length(col("w"))).as("top_word_chars"),
        sum(col("c") * length(col("w"))).as("tot_word_chars")
      )
    val n1 = size(col("tk")) - 1
    val bigramStats = docs
      .select(
        col("doc_id"),
        explode(
          zip_with(slice(col("tk"), lit(1), n1), slice(col("tk"), lit(2), n1), (a, b) => concat(a, lit(" "), b))
        ).as("g")
      )
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_bi"), sum("c").as("n_bi"))
    wordStats
      .join(bigramStats, "doc_id")
      .select(
        col("doc_id"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tok"), 4).as("dup_word_ratio"),
        round(col("top_word_chars").cast("double") / col("tot_word_chars"), 4).as("top_word_char_ratio"),
        round(col("top_bi").cast("double") / col("n_bi"), 4).as("top_bigram_ratio")
      )
      .orderBy("doc_id")
  }

  def t5NgramFreq(s: SparkSession, d: String): DataFrame = {
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    Tables.documents(s, d)
      .select(TF.tokens(col("text")).as("tk"))
      .select(
        explode(
          zip_with(
            slice(col("tk"), lit(1), n1),
            slice(col("tk"), lit(2), n1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("bg")
      )
      .groupBy("bg")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bg"))
  }

  /** t20: corpus vocabulary profile per language — token mass, distinct
    * types, and type-token ratio (the Heaps-law observable that flags
    * templated/synthetic corpora). One explode + one two-level aggregate;
    * countDistinct plans as the standard two-phase distinct aggregate, so
    * the per-language reducer holds types, not tokens.
    */
  def t20TypeTokenRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(TF.tokens(col("text"))).as("t"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct("t").as("n_types")
      )
      .withColumn("ttr", round(col("n_types").cast("double") / col("n_tokens"), 6))
      .orderBy("lang")

  /** Cross-document n-gram duplication (the Dolma/C4 "duplicate n-gram
    * fraction" signal): per document, the fraction of its DISTINCT
    * 5-grams that also occur in at least one OTHER document. Grams travel
    * only as 64-bit hashes (one-pass ShingleHashes — gram strings never
    * leave the scan); corpus-wide occurrence counts are one hash-keyed
    * groupBy joined back to the exploded grams, so both shuffles are
    * equi-shuffles on an 8-byte key. The oracle recomputes with literal
    * gram strings — equality holds modulo 64-bit hash collisions, which
    * the hash gate itself certifies absent here.
    */
  def t19CrossdocNgram(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(
        col("doc_id"),
        explode(GraftExpressions.shingleHashes(split(col("text"), " "), n)).as("g")
      )
    // ShingleHashes emits each gram once per doc, so nd = n docs carrying g
    val counts = grams.groupBy("g").agg(count(lit(1)).as("nd"))
    grams
      .join(counts, "g")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared")
      )
      .withColumn("shared_frac", round(col("n_shared").cast("double") / col("n_grams"), 4))
      .orderBy("doc_id")
  }

  /** t21: Zipf rank-frequency fit per language — the corpus-health
    * diagnostic (natural text slopes ≈ −1; templated/synthetic text
    * flattens or steepens). Vocab counts are one equi-shuffle; the
    * per-lang top-1000 rank window runs over the vocab table, not the
    * corpus (and the window-top-k idiom is the shape TopKRewrite turns
    * into the bounded-heap operator). The OLS slope is reproduced
    * exactly on both engines by quantizing ln(f)/ln(rank) to
    * decimal(12,10) before the regression sums (the q3 discipline:
    * decimal sums are associativity-independent), then evaluating the
    * closed form on bit-identical doubles.
    */
  def t21ZipfSlope(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(desc("f"), col("tok"))
    val ranked = Tables.documents(s, d)
      .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("f"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 1000)
    val x = round(log(col("rank").cast("double")), 9).cast("decimal(12,10)")
    val y = round(log(col("f").cast("double")), 9).cast("decimal(12,10)")
    ranked
      .groupBy("lang")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx")
      )
      .select(
        col("lang"),
        col("n").cast("long").as("n_types"),
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")),
          6
        ).as("zipf_slope")
      )
      .orderBy("lang")
  }

  /** t22: TEMPERATURE-REWEIGHTED MIXTURE SAMPLING — the data-mixing
    * step of a pretraining pipeline (XLM/mBERT-style multinomial
    * smoothing): target shares `q_i ∝ s_i^α` flatten the LANGUAGE
    * distribution (the corpus is en-heavy; α=0.5, computed as
    * IEEE-exact `sqrt` so both engines agree bit-for-bit), per-doc
    * acceptance rate
    * `r_i = (q_i/s_i) / max_j(q_j/s_j)` keeps ~all of the rarest source
    * and downsamples common ones, and the accept decision is a
    * deterministic md5-fraction threshold per doc_id — reproducible
    * across runs AND engines, no RNG state.
    *
    * Cross-engine exactness: source counts stay integer until the one
    * double division; the α-share normalizer sums few per-source
    * doubles through decimal(20,15) (the q3 discipline) so its value is
    * association-independent; rates round to 6 decimals BEFORE the
    * integer threshold compare (`hash32 < floor(rate·2^32)`), so the
    * accept set is identical on any engine.
    *
    * Scale shape: two kilobyte-sized aggregates broadcast back; the
    * corpus is scanned ONCE with a per-row filter that pushes into the
    * scan — no shuffle of document data at any width.
    */
  def t22MixtureSample(s: SparkSession, d: String): DataFrame =
    mixtureSampleBy(s, d, lit(1L))

  /** t23: the same temperature mixture computed over TOKEN budgets —
    * the measure a pretraining mix actually allocates. Shares are
    * per-language whitespace-token sums (exact BIGINT on both engines)
    * instead of document counts; everything downstream (sqrt smoothing,
    * decimal-quantized normalizer, rounded rates, md5-fraction accept)
    * is identical, so a language of few long documents is weighted by
    * its true token mass.
    */
  def t23TokenMixture(s: SparkSession, d: String): DataFrame =
    mixtureSampleBy(s, d, TF.tokenCount(col("text")).cast("long"))

  /** t51 (round 16): TOKEN-BUDGET PLANNER — the PLAN-level complement
    * to t22/t23's row-level accept: one row per language with its
    * available tokens, sqrt-temperature mixture share, allocated
    * target out of a 50%-of-corpus budget, the sampling rate that
    * allocation implies, the tokens it can actually expect, and the
    * EPOCHS a deficit language needs (ceil(target/available) — the
    * repeat-factor signal a pretraining mix designer reads before
    * launching sampling). Cross-engine exactness: token counts stay
    * BIGINT; the share normalizer sums through decimal(20,15) (t23's
    * discipline); targets are floor()'d to integers BEFORE rates, and
    * rates round to 6 decimals. Two kilobyte aggregates — one corpus
    * scan, no document shuffle at any width.
    */
  def t51TokenBudget(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("lang").agg(sum(TF.tokenCount(col("text")).cast("long")).as("n_i"))
    val tot = counts.agg(sum("n_i").as("nt"))
    val pw = counts
      .crossJoin(broadcast(tot))
      .select(
        col("lang"),
        col("n_i"),
        col("nt"),
        sqrt(col("n_i").cast("double") / col("nt")).as("p_i")
      )
    val z = pw.agg(sum(col("p_i").cast("decimal(20,15)")).cast("double").as("zp"))
    pw.crossJoin(broadcast(z))
      .select(
        col("lang"),
        col("n_i").as("avail_tokens"),
        round(col("p_i") / col("zp"), 6).as("share"),
        floor((col("nt") / 2).cast("double") * (col("p_i") / col("zp"))).cast("long").as("target_tokens")
      )
      .withColumn(
        "rate",
        round(least(lit(1.0), col("target_tokens").cast("double") / col("avail_tokens")), 6)
      )
      .withColumn("expected_tokens", least(col("avail_tokens"), col("target_tokens")))
      .withColumn(
        "epochs_needed",
        ceil(col("target_tokens").cast("double") / col("avail_tokens")).cast("long")
      )
      .orderBy("lang")
  }

  private def mixtureSampleBy(s: SparkSession, d: String, weight: org.apache.spark.sql.Column): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("lang").agg(sum(weight).as("n_i"))
    val tot = counts.agg(sum("n_i").as("nt"))
    val pw = counts
      .crossJoin(broadcast(tot))
      .select(col("lang"), (col("n_i").cast("double") / col("nt")).as("s_i"))
      .withColumn("p_i", sqrt(col("s_i")))
    val z = pw.agg(sum(col("p_i").cast("decimal(20,15)")).cast("double").as("zp"))
    val rates = pw
      .crossJoin(broadcast(z))
      .select(col("lang"), (col("p_i") / col("zp") / col("s_i")).as("rate"))
    val rmax = rates.agg(max("rate").as("rmax"))
    val fin = rates
      .crossJoin(broadcast(rmax))
      .select(col("lang"), round(col("rate") / col("rmax"), 6).as("rate"))
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    docs
      .join(broadcast(fin), "lang")
      .filter(hv < floor(col("rate") * lit(4294967296.0)).cast("long"))
      .select(col("doc_id"), col("lang"), col("rate"))
      .orderBy("doc_id")
  }

  /** t24: BM25 ranked retrieval — score every document against a fixed
    * query-term set with Okapi BM25 (k1 = 1.2, b = 0.75,
    * idf = ln((N − df + ½)/(df + ½) + 1)) and keep the top k. The plan
    * is pure partial-aggregable relational algebra: the token stream is
    * filtered to QUERY TERMS before any shuffle (tf rows ∝ matching
    * docs, never the corpus), df/N/avgdl are kilobyte broadcast
    * aggregates, and the final per-doc sum is one groupBy on doc_id.
    * Ranking sorts on the ROUNDED score with a doc_id tiebreak so the
    * top-k cutoff is reproducible across engines (fp-noise ties can't
    * flip selection) — the same determinism discipline as t22's accept
    * set. At 100 TB: a TopK (q24-style) replaces the global sort; the
    * tf join to doc lengths is keyed on doc_id and skew-free by
    * construction (one row per doc per query term).
    */
  def t24Bm25(s: SparkSession, d: String, topK: Int = 15): DataFrame = {
    val k1 = 1.2
    val b  = 0.75
    val qterms = Seq("spark", "join", "window")
    val docs = Tables.documents(s, d)
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tok = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
    val docLen = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val avgdl = docLen.agg(avg(col("len")).as("avgdl"))
    val tf = tok.filter(col("t").isin(qterms: _*)).groupBy("doc_id", "t").agg(count(lit(1)).as("tc"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "t")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(nDf))
      .crossJoin(broadcast(avgdl))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn(
        "s_t",
        col("idf") * (col("tc") * (k1 + 1)) /
          (col("tc") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl")))
      )
      .groupBy("doc_id")
      .agg(round(sum("s_t"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** t25: PERPLEXITY-style quality gating (the CCNet recipe, Wenzek et
    * al. 2020): score each document by its mean bigram log-probability
    * under the corpus's OWN bigram LM (t13's algebra), then split each
    * language into head/middle/tail terciles and keep head+middle —
    * the standard LM-based web-corpus filter, with the external KenLM
    * replaced by the self-trained corpus model. Cross-engine-exact by
    * the t21 discipline: per-bigram ln quantized to decimal(20,10)
    * BEFORE the sum (associativity-free), the mean evaluated in double
    * on the exact decimal total, terciles via ntile over (score DESC,
    * doc_id) so rank ties can't flip buckets. Plan shape: the bigram
    * count tables are one shuffle each, the per-doc score one more, and
    * the tercile window partitions by language — at 100 TB the LM
    * tables are the corpus vocabulary (broadcastable head after t10
    * pruning) and nothing else shuffles. Docs with <2 tokens have no
    * bigram evidence and are excluded (stated contract, same rows both
    * engines).
    */
  /** t26: DOMAIN CLASSIFICATION via multinomial naive Bayes trained on
    * the corpus's own source labels — the domain-mixing signal
    * (C4/Dolma-style: route documents to domain buckets so the mixture
    * sampler can rebalance them). Training IS aggregation: class-term
    * counts, class token totals, vocabulary size, and priors are four
    * groupBys — so "fit + predict" is one relational plan with no
    * iterative state. Scoring is SPARSE (the standard NB identity):
    * score(d,c) = Σ_{w∈d, (w,c) observed} cnt·lp(w,c)
    *            + (T_d − Σ_{w∈d, (w,c) observed} cnt) · lp_miss(c),
    * where lp_miss(c) = ln(1/(tkn_c + V)) is the Laplace missing-mass
    * log-prob every word unseen in class c shares. The token stream is
    * joined only against OBSERVED class-conditional rows (inner join on
    * w) — never densified to tokens × classes as a crossJoin would be —
    * and the missing-mass correction rides on the per-doc totals table
    * (docs × classes rows, ≪ tokens × classes). At 100 TB both halves
    * scale as keyed shuffles and the model tables stay vocabulary-sized
    * broadcasts.
    * Engine-exact argmax: every ln is quantized to decimal BEFORE the
    * per-class sum (t21 discipline), counts ride as decimal(8,0) so the
    * product scale is identical in both engines, and the winner is
    * chosen on the EXACT decimal score with a class-name tiebreak —
    * the argmax never sees a float. The missing-mass factoring is
    * decimal-exact too (one multiply replaces a sum of equal decimal
    * terms), so the sparse form is hash-identical to the dense one.
    */
  def t26DomainNb(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    // The model derivation fans out: cc feeds tc, v, AND the obs probe;
    // tc feeds cls which is consumed twice more. Catalyst does NOT reuse
    // arbitrary common subplans (only identical exchanges, which pruning
    // de-canonicalizes), so without a barrier the explode+groupBy token
    // shuffle re-ran for EVERY consumer — round-10's bench showed 26
    // exchanges, 0 reused, ~6 replays of the heaviest stage. The q51
    // localCheckpoint discipline truncates lineage at the two fan-out
    // points: the token table is materialized ONCE (executor-local,
    // MEMORY_AND_DISK — still fully distributed at 100 TB), and the
    // vocabulary-sized cc once more; every model table reads those.
    val tok = docs
      .select(col("doc_id"), col("source"), explode(TF.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "source", "w")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // the vocabulary×classes model table is MODEL-sized by the NB
    // contract (the same broadcastable class as t9's vocab tables) —
    // coalesce(1) before the checkpoint so every downstream model
    // derivation is a 1-task stage, not 32 tasks over 620 rows; with
    // ~8 sequential model jobs that fixed fan-out overhead WAS the
    // round-10 bench cost, not data volume
    val cc = tok
      .groupBy(col("source").as("c"), col("w"))
      .agg(sum("cnt").as("c_wc"))
      .coalesce(1)
      .localCheckpoint()
    val tc = cc.groupBy("c").agg(sum("c_wc").as("tkn_c"))
    val v = cc.agg(countDistinct("w").as("v_size"))
    def lnq(x: org.apache.spark.sql.Column) = round(log(x), 9).cast("decimal(20,10)")
    // class model: one row per class (token total, V, missing-mass lp)
    val cls = tc
      .crossJoin(broadcast(v))
      .withColumn("lp_miss", lnq(lit(1) / (col("tkn_c") + col("v_size"))))
    // class PRIORS: n_docs = Σ n_c, so ONE docs aggregate yields both
    // (an unpartitioned window over the class rows), saving the second
    // docs scan + the separate broadcast round the old
    // crossJoin(broadcast(n)) structure paid; lp_prior carries the
    // identical lnq(n_c/n_docs) decimal the score used to add
    val prior = docs
      .groupBy(col("source").as("c"))
      .agg(count(lit(1)).as("n_c"))
      .withColumn("n_docs", sum("n_c").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("lp_prior", lnq(col("n_c") / col("n_docs")))
      .select("c", "lp_prior")
    // observed half: the per-(w,c) log-prob is FOLDED INTO the model
    // table once (620 rows), so the token stream takes ONE broadcast
    // hash join instead of two — only (w, c) pairs training actually
    // saw, never densified to tokens × classes.
    val ccLp = cc
      .join(broadcast(cls.select("c", "tkn_c", "v_size")), "c")
      .withColumn("lp", lnq((col("c_wc") + 1) / (col("tkn_c") + col("v_size"))))
      .select("w", "c", "lp")
    val obs = tok
      .join(broadcast(ccLp), "w")
      .groupBy("doc_id", "c")
      .agg(
        sum(col("cnt").cast("decimal(8,0)") * col("lp")).as("s_obs"),
        sum(col("cnt").cast("decimal(8,0)")).as("n_obs")
      )
    // doc spine: per-doc totals × classes (docs × C, not tokens × C).
    // The total is Σ_w cnt off the CHECKPOINTED token table — re-sizing
    // the token array from the raw scan would re-split every document's
    // text (the single most expensive stage in the round-10 profile);
    // summing the already-counted tok rows gives the identical value for
    // one cheap keyed aggregate. Docs with zero tokens have no tok rows,
    // exactly matching the old t_d > 0 filter.
    val tot = tok
      .groupBy("doc_id", "source")
      .agg(sum("cnt").cast("decimal(8,0)").as("t_d"))
    val sc = tot
      .crossJoin(broadcast(cls.select("c", "lp_miss")))
      .join(obs, Seq("doc_id", "c"), "left")
      .withColumn(
        "sw",
        // decimal-type discipline: both addends at (27,10) keeps the
        // add's result precision <= 38 WITHOUT a scale reduction, so the
        // sparse sw carries the exact same scale-10 value the dense
        // single-sum did; the final cast restores the dense sum's
        // decimal(38,10) type so the downstream + prior rounds
        // identically in both forms
        (coalesce(col("s_obs"), lit(0).cast("decimal(20,10)")).cast("decimal(27,10)") +
          ((col("t_d") - coalesce(col("n_obs"), lit(0).cast("decimal(18,0)")))
            .cast("decimal(8,0)") * col("lp_miss")).cast("decimal(27,10)"))
          .cast("decimal(38,10)")
      )
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("c"))
    sc.join(broadcast(prior), "c")
      .withColumn("score", col("sw") + col("lp_prior"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("source"),
        col("c").as("pred_source"),
        round(col("score").cast("double"), 6).as("score"),
        (col("c") === col("source")).as("correct")
      )
      .orderBy("doc_id")
  }

  def t25PerplexityFilter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    // no parallelism floor here: standalone it was neutral (−0.05 s) and
    // p5 consumes this gate several times — the re-run floor exchange
    // cost p5 more than the spread map work saved (r18 measurement)
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        col("lang"),
        explode(
          zip_with(
            slice(col("tk"), lit(1), n1),
            slice(col("tk"), lit(2), n1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("bg")
      )
    val cb = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val cu = bg
      .select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    val scored = bg
      .join(cb, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(cu, "w1")
      .withColumn("lp", round(log(col("c2").cast("double") / col("c1")), 9).cast("decimal(20,10)"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("slp"))
      .withColumn("score", round(col("slp").cast("double") / col("n_bigrams"), 6))
    val w = Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("tercile", ntile(3).over(w).cast("long"))
      .withColumn("keep", col("tercile") <= 2)
      .select("doc_id", "lang", "n_bigrams", "score", "tercile", "keep")
      .orderBy("doc_id")
  }

  /** t27: DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") — score
    * every document by how much more likely its hashed-bigram features
    * are under a TARGET domain (here `lang='en'`) than under the raw
    * SOURCE pool, log w(x) = Σ_f cnt_f · (ln p̂_t[f] − ln p̂_s[f]) with
    * Laplace-smoothed bucket models. Everything is partial-aggregable:
    * bigram→bucket counts are one scan + one keyed aggregate, the two
    * bucket models are a 256-row broadcast, and the per-doc score is a
    * second keyed aggregate — no shuffle carries raw text. Engine-exact
    * by the t26 discipline: bucket log-ratios rounded to 9 decimals and
    * carried as decimals, counts as decimal(8,0), and the keep decision
    * taken on the EXACT decimal sum. The md5-derived bucket id is
    * portable to the DuckDB oracle.
    */
  def t27Dsir(s: SparkSession, d: String, nBuckets: Int = 256): DataFrame = {
    val docs = Tables.documents(s, d)
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    val bg = docs
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        col("lang"),
        explode(
          zip_with(
            slice(col("tk"), lit(1), n1),
            slice(col("tk"), lit(2), n1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("bg")
      )
    val f = bg
      .withColumn("b", conv(substring(md5(col("bg").cast("binary")), 1, 8), 16, 10).cast("long") % nBuckets)
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("cnt"))
    val bs = f
      .groupBy("b")
      .agg(
        sum("cnt").as("cs"),
        sum(when(col("lang") === "en", col("cnt")).otherwise(lit(0L))).as("ct")
      )
    val tot = bs.agg(sum("cs").as("stot"), sum("ct").as("ttot"))
    val wtab = bs
      .crossJoin(broadcast(tot))
      .select(
        col("b"),
        (round(log((col("ct") + 1).cast("double") / (col("ttot") + nBuckets)), 9).cast("decimal(20,10)")
          - round(log((col("cs") + 1).cast("double") / (col("stot") + nBuckets)), 9).cast("decimal(20,10)")).as("wb")
      )
    f.join(broadcast(wtab), "b")
      .groupBy("doc_id", "lang")
      .agg(
        sum("cnt").as("n_feats"),
        sum(col("cnt").cast("decimal(8,0)") * col("wb")).as("lw")
      )
      .select(
        col("doc_id"),
        col("lang"),
        col("n_feats").cast("long").as("n_feats"),
        round(col("lw").cast("double"), 6).as("logw"),
        (col("lw") > 0).as("keep")
      )
      .orderBy("doc_id")
  }

  /** t28 (round 9): SEMANTIC DECONTAMINATION — the embedding-space twin
    * of [[t16Decontaminate]]'s n-gram screen, and the modern default for
    * eval-set leakage (paraphrased or reformatted contamination that
    * shares no 5-gram with the benchmark). Benchmark membership reuses
    * t16's md5-prefix convention on the id; every corpus vector is
    * scored by its MAX cosine against the whole benchmark set and
    * flagged at τ. The benchmark side is tiny at ANY corpus scale (a
    * benchmark suite is KB–MB), so the plan is the one you want at
    * 100 TB: one corpus scan against a broadcast benchmark table
    * (v1's join shape — the non-equi guard is vacuously true since the
    * md5 split makes the id sets disjoint), one keyed max — no shuffle
    * of embeddings, no pair materialization. Exact by construction (no
    * ANN shortcut), so the driver hash-gates the values: cosines are
    * identical doubles on both engines (float entries widen exactly,
    * [[VF.dot]] accumulates in double, DuckDB replays with
    * `::DOUBLE[]` + `list_dot_product`), and the argmax benchmark id
    * breaks ties toward the smaller id on both sides. An
    * ANN-accelerated form at extreme scale would prefilter candidates
    * with v7's IVF and exact-verify survivors — same emitted rows.
    */
  def t28SemanticDecontaminate(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val e = Tables
      .embeddings(s, d)
      .select(
        col("vec_id"),
        col("embedding"),
        VF.norm(col("embedding")).as("nrm"),
        (substring(md5(col("vec_id").cast("string").cast("binary")), 1, 1) === "0").as("is_bench")
      )
    val bench = e
      .filter(col("is_bench"))
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val corp = e.filter(!col("is_bench")).select(col("vec_id"), col("embedding"), col("nrm"))
    corp
      .join(broadcast(bench), col("vec_id") =!= col("b_id"))
      .withColumn("cos", VF.dot(col("embedding"), col("b_emb")) / (col("nrm") * col("b_nrm")))
      .groupBy("vec_id")
      .agg(
        max(col("cos")).as("mc"),
        min_by(col("b_id"), struct((-col("cos")).as("nc"), col("b_id"))).as("bench_id")
      )
      .select(
        col("vec_id"),
        round(col("mc"), 4).as("max_cos"),
        col("bench_id"),
        (col("mc") >= tau).as("contaminated")
      )
      .orderBy("vec_id")
  }

  /** t29 (round 9): BPE PAIR STATISTICS — the distributed half of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016). Real
    * trainers (the SentencePiece/fastBPE architecture) split exactly
    * here: the CORPUS-scale work is one word-frequency aggregation
    * (Heaps' law keeps the vocab table KB–MB at any corpus size), and
    * the merge loop then runs over that model-sized table locally —
    * re-scanning 100 TB of text per merge would be absurd when the
    * sufficient statistic fits in memory. This query emits the top-k
    * first-round merge candidates: per-word character pairs weighted by
    * word frequency, ranked with the canonical (count desc, pair lexico)
    * determinism so both engines agree on ties. The pair table is
    * O(symbol alphabet²) — the global rank window runs on a model-sized
    * aggregate, not corpus rows. [[trainBpeMerges]] is the full loop.
    */
  def t29BpePairStats(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val wf = Tables.documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("wf"))
    val chars = transform(sequence(lit(1), length(col("w"))), i => substring(col("w"), i, lit(1)))
    val n1 = greatest(size(col("cs")) - 1, lit(0))
    val pairs = wf
      .select(col("wf"), chars.as("cs"))
      .select(
        col("wf"),
        explode(
          zip_with(
            slice(col("cs"), lit(1), n1),
            slice(col("cs"), lit(2), n1),
            (a, b) => struct(a.as("l"), b.as("r"))
          )
        ).as("p")
      )
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("wf").as("cnt"))
    // global window over the alphabet²-sized aggregate: O(model), like
    // v7's centroid table — not a corpus sort
    val w = Window.orderBy(desc("cnt"), col("l"), col("r"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("rank"), col("l"), col("r"), col("cnt"))
      .orderBy("rank")
  }

  /** The full BPE merge loop over the collected word-frequency table —
    * O(vocab) driver state, the documented model-sized exception (v7
    * centroids / StatsPlanner catalog discipline). Greedy argmax with
    * (count desc, pair lexico) ties, left-to-right non-overlapping
    * apply; returns the merge table (rank, left, right, pair_count).
    * ScalaTest-gated against a hand-computed fixture and pinned
    * consistent with [[t29BpePairStats]]'s oracle-gated first round.
    *
    * DRIVER-SIZE BOUND: Heaps' law keeps word types ≈ K·N^β (β≈0.5) —
    * KB–MB at test SF but 10⁸⁺ types on a 100 TB web corpus, multi-GB
    * if collected raw. So the collect is bounded on BOTH axes before it
    * leaves the cluster, exactly where production trainers
    * (SentencePiece/fastBPE) threshold: `minCount` drops the long tail
    * of hapax types inside the aggregate (they cannot win a merge
    * argmax against any repeated type until vocab-sized counts, and
    * real trainers discard them wholesale), and `maxVocab` is a hard
    * top-N cap (freq desc, word lexico for determinism) planned as
    * TakeOrderedAndProject — O(maxVocab) per partition, no global sort
    * shuffle. The driver table is ≤ maxVocab rows at ANY corpus size.
    */
  def trainBpeMerges(
      s: SparkSession,
      d: String,
      nMerges: Int = 10,
      minCount: Long = 1L,
      maxVocab: Int = 1 << 20
  ): DataFrame = {
    import s.implicits._
    val vocab0: Seq[(Vector[String], Long)] = Tables.documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("wf"))
      .filter(col("wf") >= minCount)
      .orderBy(desc("wf"), col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
      .toSeq
    var vocab = vocab0
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2 // left-to-right non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "l", "r", "cnt").orderBy("rank")
  }

  /** t30 (round 9): the GOPHER QUALITY RULE BATTERY (Rae et al. 2021,
    * §A1.1) — the published heuristic screen most production corpora
    * pass through before model-based filters: word-count bounds, mean
    * word length bounds, alphabetic-word fraction, stop-word presence.
    * (The line-shaped rules — bullet/ellipsis line fractions — are
    * vacuous on this single-line corpus and omitted rather than faked.)
    * Every rule is a per-row codegen'd expression over the token array:
    * zero shuffle at any scale, the same plan at 100 TB. Plain-ASCII
    * character classes keep Java-regex and RE2 semantics identical for
    * the oracle.
    */
  def t30GopherRules(s: SparkSession, d: String): DataFrame = {
    val tk = TF.tokens(col("text"))
    val df = Tables.documents(s, d)
      .select(col("doc_id"), tk.as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).as("n_words"),
        round(
          aggregate(col("tk"), lit(0L), (a, x) => a + length(x)).cast("double") /
            greatest(size(col("tk")), lit(1)),
          4
        ).as("mean_word_len"),
        round(
          size(filter(col("tk"), t => t.rlike("[a-zA-Z]"))).cast("double") /
            greatest(size(col("tk")), lit(1)),
          4
        ).as("alpha_frac"),
        size(filter(col("tk"), t => t.isin("the", "be", "to", "of", "and", "that", "have", "with")))
          .as("n_stop")
      )
    df.select(
        col("doc_id"),
        col("n_words"),
        col("mean_word_len"),
        col("alpha_frac"),
        col("n_stop"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("ok_word_count"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("ok_word_len"),
        (col("alpha_frac") >= 0.8).as("ok_alpha"),
        (col("n_stop") >= 2).as("ok_stop")
      )
      .withColumn(
        "keep",
        col("ok_word_count") && col("ok_word_len") && col("ok_alpha") && col("ok_stop")
      )
      .orderBy("doc_id")
  }

  /** t31: STUPID-BACKOFF bigram LM scoring of held-out documents — the
    * missing piece between t13 (in-corpus bigram logprob, where every
    * bigram is trivially attested) and t25 (unigram perplexity gate).
    * The model trains on the even-id half of the corpus and scores the
    * odd half, so BOTH arms genuinely fire: attested bigrams score
    * c(w₁w₂)/c(w₁); unseen ones back off to 0.4·c(w₂)/N; OOV words to
    * the 0.4²/N floor (Brants et al. 2007 — no normalization, which is
    * exactly what makes it embarrassingly distributable: every position
    * scores independently from three count tables). The plan is two
    * keyed count aggregates (the model), then the scoring side LEFT-
    * joins bigram and unigram tables — shuffle-on-key shapes that scale
    * to any corpus; N rides a 1-row broadcast. Per-doc output: mean log
    * score and how many positions backed off.
    */
  def t31BackoffLm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    def bigrams(df: DataFrame): DataFrame = df.select(
      col("doc_id"),
      explode(
        zip_with(
          slice(col("tk"), lit(1), n1),
          slice(col("tk"), lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2"))
        )
      ).as("p")
    )
    val model = docs.filter(col("doc_id") % 2 === 0)
    val mbg = bigrams(model)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val muni = model
      .select(explode(col("tk")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c1"))
    val tot = muni.agg(sum("c1").cast("double").as("nt"))
    val score = bigrams(docs.filter(col("doc_id") % 2 === 1))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(mbg, Seq("w1", "w2"), "left")
      .join(muni.select(col("w").as("w1"), col("c1").as("c1prev")), Seq("w1"), "left")
      .join(muni.select(col("w").as("w2"), col("c1").as("c1cur")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn(
        "sc",
        when(col("c2").isNotNull, col("c2").cast("double") / col("c1prev"))
          .otherwise(
            lit(0.4) * when(col("c1cur").isNotNull, col("c1cur").cast("double") / col("nt"))
              .otherwise(lit(0.4) / col("nt"))
          )
      )
    score
      .groupBy("doc_id")
      .agg(
        round(avg(log(col("sc"))), 3).as("avg_logscore"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_backoff"),
        count(lit(1)).as("n_pos")
      )
      .orderBy("doc_id")
  }

  /** t32: N-GRAM NOVELTY scoring — the data-freshness signal an
    * incremental pretraining pipeline runs per crawl cycle: for every
    * NEW document (doc_id ≥ midpoint — d21/p8's frontier model), the
    * fraction of its DISTINCT word trigrams never seen in the reference
    * half. High-novelty docs carry new content; near-zero novelty means
    * the doc restates the existing corpus even when no dedup rule fires
    * — the soft complement to d21's hard URL dedup. Trigrams build with
    * the t25 slice+zip_with discipline (empty-safe, no UDF); scoring is
    * two keyed shuffles on the gram string (per-doc distinct grams,
    * reference distinct set) + one left-anti join — at 100 TB the
    * reference set rides a d21-style bloom prefilter in front of the
    * exact anti-join, same answer. Docs with < 3 tokens have no trigram
    * evidence and are excluded (stated contract, same rows both
    * engines).
    */
  def t32NgramNovelty(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cut = docs.agg(floor((max("doc_id") + lit(1)).cast("double") / 2).cast("long").as("cut"))
    val grams = distinctTrigrams(docs.crossJoin(broadcast(cut)), keep = Seq("cut"))
    val ref = grams.filter(col("doc_id") < col("cut")).select("g").distinct()
    noveltyScore(grams.filter(col("doc_id") >= col("cut")).select("doc_id", "g"), ref)
  }

  /** Distinct word trigrams per document (empty-safe slice+zip_with —
    * docs with < 3 tokens emit no rows). ONE definition shared by t32
    * and its streaming twin s27 (the d21Halves discipline: the batch
    * query and the stream can't silently diverge). `keep` carries extra
    * columns through.
    */
  private[graft] def distinctTrigrams(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val m = greatest(size(col("t")) - 2, lit(0))
    val tri = zip_with(
      zip_with(slice(col("t"), lit(1), m), slice(col("t"), lit(2), m), (a, b) => concat(a, lit(" "), b)),
      slice(col("t"), lit(3), m),
      (ab, c) => concat(ab, lit(" "), c)
    )
    docs
      .select((col("doc_id") +: keep.map(col)) :+ TF.tokens(col("text")).as("t"): _*)
      .select((col("doc_id") +: keep.map(col)) :+ explode(tri).as("g"): _*)
      .distinct()
  }

  /** Per-doc novelty of `grams` (doc_id, g — distinct) against the
    * reference gram set `ref` (g): n_grams, n_novel, novelty ∈ [0, 1].
    * Shared by t32 and s27.
    */
  private[graft] def noveltyScore(grams: DataFrame, ref: DataFrame): DataFrame = {
    val novel = grams
      .join(ref, Seq("g"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_novel"))
    grams
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_grams"), 4).as("novelty")
      )
      .orderBy("doc_id")
  }

  /** t33: RAKE KEYWORD EXTRACTION (Rose et al. 2010) — the classic
    * unsupervised keyword extractor: candidate phrases are maximal runs
    * of consecutive NON-stopword tokens (the stopword positions are the
    * delimiters), each word scores deg/freq within its document (deg =
    * Σ length of phrases containing the occurrence — co-occurrence
    * degree; freq = occurrence count), and a phrase scores the sum of
    * its words' scores; top-k phrases per doc. Pure window algebra: one
    * posexplode, phrase runs via the pos − row_number islands delta,
    * phrase length via a partition count, word stats via one keyed
    * groupBy — per-doc work, no corpus-wide stage beyond the scan.
    * Engine-exact: word scores are integer-ratio doubles quantized to
    * decimal(16,6) BEFORE the phrase sum (t21 discipline — the sum is
    * exact decimal), phrase text is built from the position-sorted
    * struct array, and ranks break ties on the phrase string.
    */
  def t33RakeKeywords(s: SparkSession, d: String, topK: Int = 3): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "w")))
      .filter(!col("w").isin(stops: _*))
    val wrun = Window.partitionBy("doc_id").orderBy("pos")
    val tokp = tok
      .withColumn("grp", col("pos") - row_number().over(wrun))
      .withColumn("plen", count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
    val wordScore = tokp
      .groupBy("doc_id", "w")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
      .withColumn("wscore", round(col("deg").cast("double") / col("freq"), 6).cast("decimal(16,6)"))
    val phrases = tokp
      .join(wordScore.select("doc_id", "w", "wscore"), Seq("doc_id", "w"))
      .groupBy("doc_id", "grp")
      .agg(
        concat_ws(
          " ",
          transform(array_sort(collect_list(struct(col("pos"), col("w")))), x => x.getField("w"))
        ).as("phrase"),
        count(lit(1)).as("n_words"),
        sum("wscore").as("ps")
      )
    val wr = Window.partitionBy("doc_id").orderBy(desc("ps"), col("phrase"))
    phrases
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(
        col("doc_id"),
        col("rank"),
        col("phrase"),
        col("n_words"),
        // round the EXACT decimal, then cast: rounding the double instead
        // hits the round-at-5 representation edge (1267.98095 -> .981 vs
        // .9809 across engines)
        round(col("ps"), 4).cast("double").as("score")
      )
      .orderBy("doc_id", "rank")
  }

  /** t34: per-document token SHANNON ENTROPY — the repetitiveness
    * quality signal (low entropy = templated/looped/spam text) the
    * published filtering stacks run next to Gopher's repetition rules:
    * H = ln T − (Σ_w c_w·ln c_w)/T over the doc's token counts, so one
    * explode + two keyed aggregates, both partial-agg mergeable — at
    * 100 TB nothing but (doc, type) count rows ride the shuffle.
    * Engine-exact by the t21 discipline: each type's c·ln(c) term is
    * quantized to decimal BEFORE the per-doc sum (decimal addition is
    * associativity-free, so partial aggregation can't perturb the
    * total), and the final H is evaluated in double on the exact
    * decimal sum, rounded once.
    */
  def t34Entropy(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(8,0)") * round(log(col("c")), 9).cast("decimal(20,10)"))
          .as("sclnc")
      )
      .withColumn(
        "entropy",
        round(log(col("n_tokens").cast("double")) - col("sclnc").cast("double") / col("n_tokens"), 6)
      )
      .select("doc_id", "n_tokens", "n_types", "entropy")
      .orderBy("doc_id")
  }

  /** t35: CROSS-SOURCE SHINGLE OVERLAP MATRIX — the corpus-slice
    * contamination audit a mixture pipeline runs before weighting
    * sources (how much of src_a's distinct 5-gram mass reappears in
    * src_b): per-source distinct gram sets, pairwise intersection
    * counts, Jaccard. Grams travel only as 64-bit [[GraftExpressions
    * .shingleHashes]] (t19's discipline — gram strings never leave the
    * scan; the oracle recomputes on literal strings, so the gate itself
    * certifies no collision perturbed a count). The pair join is an
    * equi-join on the 8-byte hash: only grams present in ≥2 sources
    * produce pairs, and per-gram fanout is bounded by (#sources)², so
    * at 100 TB the shuffles are the per-source distinct and one keyed
    * join — never doc×doc or source-slice×source-slice.
    */
  /** t36: WINNOWING FINGERPRINTS (Schleimer, Wilkerson, Aiken 2003 —
    * the MOSS local fingerprinting algorithm): positioned 5-gram
    * hashes, and from every complete window of 4 consecutive grams
    * select the MINIMUM hash with RIGHTMOST tie-break — the guarantee
    * winnowing buys is that any match of ≥ w+k−1 tokens shares a
    * fingerprint, at ~2/(w+1) selection density. The rightmost-min is
    * computed WITHOUT a dependent window: each gram explodes into the
    * ≤4 windows covering it (bounded fanout) and the selection is
    * `min(h·2²⁰ + (2²⁰−1−pos))` per window — one keyed aggregate whose
    * integer encoding makes "smallest hash, then rightmost position"
    * a single min. Distinct selected (doc, pos, h) are the doc's
    * fingerprints. All shuffles are keyed on (doc, window); gram
    * strings never leave the scan (md5-derived 32-bit hashes — the t7
    * portability discipline).
    */
  def t36Winnowing(s: SparkSession, d: String, k: Int = 5, w: Int = 4): DataFrame = {
    val grams = docsFloor(s, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= k + w - 1)
      // the min-packing below carries gram positions in a 20-bit field;
      // a doc with > 2²⁰−1 grams would silently corrupt its
      // fingerprints, so fail LOUDLY at the boundary instead
      .withColumn(
        "tk",
        when(
          size(col("tk")) - lit(k - 1) > lit(1048575),
          raise_error(
            concat(
              lit("t36 winnowing: doc_id="),
              col("doc_id"),
              lit(" exceeds 2^20-1 k-grams; widen the position field before rerunning")
            )
          ).cast("array<string>")
        ).otherwise(col("tk"))
      )
      .select(
        col("doc_id"),
        (size(col("tk")) - (k - 1) - (w - 1)).as("n_windows"),
        posexplode(expr(s"transform(sequence(1, size(tk) - ${k - 1}), i -> concat_ws(' ', slice(tk, i, $k)))"))
          .as(Seq("pos0", "gram"))
      )
      .select(
        col("doc_id"),
        col("n_windows"),
        (col("pos0") + 1).as("pos"),
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("h")
      )
    val selected = grams
      .select(
        col("doc_id"),
        col("h"),
        col("pos"),
        explode(expr("sequence(greatest(pos - 3, 1), least(pos, n_windows))")).as("wid")
      )
      .groupBy("doc_id", "wid")
      .agg(min(col("h") * lit(1048576L) + (lit(1048575L) - col("pos"))).as("sel"))
      .select(
        col("doc_id"),
        expr("sel div 1048576").as("h"),
        (lit(1048575L) - pmod(col("sel"), lit(1048576L))).as("pos")
      )
      .distinct()
    selected.select("doc_id", "pos", "h").orderBy("doc_id", "pos")
  }

  def t35SrcOverlap(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(
        col("source"),
        explode(GraftExpressions.shingleHashes(split(col("text"), " "), n)).as("g")
      )
      .distinct()
    val sz = grams.groupBy("source").agg(count(lit(1)).as("n"))
    grams
      .select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), "g")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn(
        "jaccard",
        round(col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")), 6)
      )
      .select("src_a", "src_b", "n_a", "n_b", "n_shared", "jaccard")
      .orderBy("src_a", "src_b")
  }

  /** t37: HEAPS' LAW FIT — the vocabulary-growth exponent (V ≈ K·T^β)
    * corpus reports quote next to t21's Zipf slope: it predicts how the
    * token/type ratio moves as a crawl scales, i.e. how much NEW
    * vocabulary another 10× of data buys. Computed without any
    * per-document running state: a word's contribution to the growth
    * curve is fully determined by its FIRST occurrence (min doc_id), so
    * vocabulary size at checkpoint d is just a cumulative count of
    * first-occurrences — two mergeable keyed aggregates (tokens per
    * bucket, new words per bucket) plus one prefix-sum over the
    * BUCKET-grain series (corpus/`bucket` rows, a knob: raise it with
    * corpus size so the only unpartitioned window runs over thousands
    * of checkpoint rows, never documents). The log-log least-squares
    * fit reuses t21's decimal-quantized regression discipline
    * (round(ln,9) → decimal sums are exact and order-free; the final
    * slope/intercept arithmetic is scalar double on identical inputs).
    */
  def t37HeapsLaw(s: SparkSession, d: String, bucket: Int = 16): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
    val toksPerBucket = tok
      .groupBy(expr(s"doc_id div $bucket").as("b"))
      .agg(count(lit(1)).as("toks"))
    val newPerBucket = tok
      .groupBy("tok")
      .agg(min("doc_id").as("fd"))
      .groupBy(expr(s"fd div $bucket").as("b"))
      .agg(count(lit(1)).as("neww"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = toksPerBucket
      .join(newPerBucket, Seq("b"), "full_outer")
      .na
      .fill(0L, Seq("toks", "neww"))
      .withColumn("t_cum", sum("toks").over(w))
      .withColumn("v_cum", sum("neww").over(w))
    val x = round(log(col("t_cum").cast("double")), 9).cast("decimal(12,10)")
    val y = round(log(col("v_cum").cast("double")), 9).cast("decimal(12,10)")
    pts
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        max("t_cum").as("tokens_final"),
        max("v_cum").as("vocab_final")
      )
      .withColumn(
        "beta",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))
      )
      .select(
        col("n").cast("long").as("n_points"),
        col("tokens_final"),
        col("vocab_final"),
        // + 0.0 folds IEEE negative zero (a saturated-vocab corpus fits
        // β ≈ -1e-15, which rounds to -0.0 in one engine and 0.0 in the
        // other) into the canonical positive zero on both sides
        (round(col("beta"), 6) + lit(0.0)).as("heaps_beta"),
        round(exp((col("sy") - col("beta") * col("sx")) / col("n")), 6).as("heaps_k")
      )
  }

  /** t38: PMI COLLOCATIONS — the pointwise-mutual-information bigram
    * miner (Church & Hanks) phrase-detection pipelines run before
    * tokenizer training (word2vec's phrase pass, BERT's whole-word
    * masking lists): ln(p(ab) / (p(a)·p(b))) over corpus bigram and
    * unigram frequencies, thresholded to bigrams seen ≥ `minCount`
    * times so rare-pair noise (PMI's known failure mode) never ranks.
    * Shape: two count shuffles (bigrams via the t13 zip_with slide —
    * no self-join; unigrams via explode), then the unigram table joins
    * only the THRESHOLDED bigram side (post-filter it is
    * vocabulary-sized, not corpus-sized). The PMI arithmetic is pure
    * scalar double on exact counts — identical division/log sequence
    * in both engines — and the top-k orders by the ROUNDED score with
    * the bigram as tiebreak, so ulps can't reorder the report.
    */
  def t38PmiCollocations(s: SparkSession, d: String, minCount: Long = 5L, k: Int = 20): DataFrame = {
    val n1e = greatest(size(col("tk")) - 1, lit(0))
    val toks = Tables.documents(s, d)
      .select(TF.tokens(col("text")).as("tk"))
    val bg = toks.select(
      explode(
        zip_with(
          slice(col("tk"), lit(1), n1e),
          slice(col("tk"), lit(2), n1e),
          (a, b) => concat(a, lit(" "), b)
        )
      ).as("bg")
    )
    val uni = toks.select(explode(col("tk")).as("w")).groupBy("w").agg(count(lit(1)).as("c1"))
    val totals = uni
      .agg(sum("c1").as("n1"))
      .crossJoin(bg.agg(count(lit(1)).as("n2")))
    val cand = bg
      .groupBy("bg")
      .agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    cand
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c1a"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c1b"), "w2")
      .crossJoin(broadcast(totals))
      .withColumn(
        "pmi",
        round(
          log(
            (col("c2").cast("double") / col("n2")) /
              ((col("c1a").cast("double") / col("n1")) * (col("c1b").cast("double") / col("n1")))
          ),
          6
        )
      )
      .orderBy(desc("pmi"), col("bg"))
      .limit(k)
      .select("bg", "c2", "c1a", "c1b", "pmi")
  }

  /** t39: TOKENIZER FERTILITY — subword-per-word ratio per language,
    * the compression metric tokenizer reports quote (fertility ≫ 1
    * means the vocabulary serves that language badly and its documents
    * cost disproportionate sequence length): whitespace words vs the
    * BPE-ish regex segmentation ([[TF.regexTokens]]: letter runs,
    * digit runs, single punctuation — a pattern simple enough that
    * Java's and RE2's leftmost-greedy semantics provably agree, which
    * is what makes the DuckDB replay exact). Two per-row `size()`
    * projections and ONE keyed aggregate; integer sums, one final
    * division.
    */
  def t39TokenizerFertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("lang"),
        TF.tokenCount(col("text")).cast("long").as("words"),
        size(TF.regexTokens(col("text"))).cast("long").as("subwords")
      )
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("words").as("words"),
        sum("subwords").as("subwords")
      )
      .withColumn("fertility", round(col("subwords").cast("double") / col("words"), 6))
      .orderBy("lang")

  /** t40: VOCABULARY COVERAGE CURVE — what share of all token
    * OCCURRENCES the top-N vocabulary types cover, at the budget cut
    * points a tokenizer design sweeps (coverage@N for a sweep of N; the
    * number that decides how large a vocab must be before <unk> rates
    * become negligible). One token-count shuffle, a global
    * frequency-rank window over the VOCABULARY (types, not tokens —
    * the only unpartitioned sort runs over the type table, which is
    * Heaps-sublinear in the corpus; t29's TakeOrderedAndProject trick
    * applies when even that is too big), cumulative integer sums, and
    * one probe row per cut point. Exact integer arithmetic until the
    * final share division.
    */
  def t40VocabCoverage(s: SparkSession, d: String, cuts: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    val freq = Tables.documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("f"))
    val w = Window.orderBy(desc("f"), col("tok"))
    val ranked = freq
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum("f").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = freq.agg(sum("f").as("total_tokens"), count(lit(1)).as("n_types"))
    import s.implicits._
    val cutDf = cuts.toDF("cut_n")
    ranked
      .join(broadcast(cutDf), col("rank") === col("cut_n"))
      .crossJoin(broadcast(tot))
      .select(
        col("cut_n"),
        col("cum").as("covered_tokens"),
        col("total_tokens"),
        col("n_types"),
        round(col("cum").cast("double") / col("total_tokens"), 6).as("coverage")
      )
      .orderBy("cut_n")
  }

  /** t41: DOCUMENT-LENGTH LOG-NORMAL FIT — per language, the (μ, σ) of
    * ln(n_chars): web-corpus length distributions are approximately
    * log-normal, and the fitted curve is how a curation pipeline picks
    * length cutoffs that mean the same thing across languages (a fixed
    * char bound prunes CJK and English very differently; μ±2σ in log
    * space doesn't). One keyed aggregate; each ln(len) is quantized to
    * decimal BEFORE summing (t34's discipline — float addition is not
    * associative, decimal addition is, so Σln and Σln² are exact and
    * order-free, hash-reproducible under any partitioning). μ, σ, and
    * the fitted median exp(μ) are scalar doubles at the very end.
    */
  def t41LengthLognormal(s: SparkSession, d: String): DataFrame = {
    val x = round(log(col("n_chars").cast("double")), 9).cast("decimal(14,9)")
    Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("lang"), x.as("lx"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("lx").as("slx"),
        // lx has exactly 9 dp, so lx² has exactly 18 — the cast is
        // REPRESENTATION-exact (no rounding anywhere before the sum)
        sum((col("lx") * col("lx")).cast("decimal(28,18)")).as("slx2")
      )
      .select(
        col("lang"),
        col("n_docs"),
        round(col("slx").cast("double") / col("n_docs"), 6).as("mu"),
        round(
          sqrt(
            greatest(
              col("slx2").cast("double") / col("n_docs") -
                (col("slx").cast("double") / col("n_docs")) *
                (col("slx").cast("double") / col("n_docs")),
              lit(0.0)
            )
          ),
          6
        ).as("sigma"),
        round(exp(col("slx").cast("double") / col("n_docs")), 2).as("fit_median_chars")
      )
      .orderBy("lang")
  }

  /** t42: KNESER-NEY BIGRAM CROSS-ENTROPY — the standard smoothed
    * n-gram LM (absolute discount D=0.75 with the continuation-count
    * back-off that made KN the n-gram-era default), upgrading t13's
    * raw MLE and t31's stupid backoff: P(w|v) = max(c(vw)−D,0)/c(v) +
    * D·N₁₊(v·)/c(v) · N₁₊(·w)/N₁₊(··), scored as per-document
    * cross-entropy (the data-quality signal: templated/spammy docs sit
    * far below the corpus mean). Model tables are four keyed
    * aggregates over one bigram explode — bigram counts, left
    * fan-outs, right fan-ins, and a 1-row distinct-bigram total
    * (broadcast); scoring is ONE keyed join from the doc's bigram
    * occurrences into the model. Train = score corpus ⇒ the closed
    * world has no zero-probability bigram. Each occurrence's ln P is
    * quantized to decimal before the per-doc sum (t34's discipline).
    */
  def t42KneserNey(s: SparkSession, d: String, discount: Double = 0.75): DataFrame = {
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    // no parallelism floor: marginal in the noisy window it was tried in
    // (1.24->1.18) and behind the inherited canonical (0.67) - reverted
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        explode(
          zip_with(
            slice(col("tk"), lit(1), n1),
            slice(col("tk"), lit(2), n1),
            (a, b) => struct(a.as("v"), b.as("w"))
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.v").as("v"), col("p.w").as("w"))
    val cvw = bg.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
    val cv = cvw.groupBy("v").agg(sum("cvw").as("cv"), count(lit(1)).as("n1v"))
    val n1w = cvw.groupBy("w").agg(count(lit(1)).as("n1w"))
    val nb = cvw.agg(count(lit(1)).as("nb"))
    val model = cvw
      .join(cv, "v")
      .join(n1w, "w")
      .crossJoin(broadcast(nb))
      .select(
        col("v"),
        col("w"),
        // doubles only inside ONE row's closed formula — no cross-row float math
        (greatest(col("cvw") - discount, lit(0.0)) / col("cv") +
          lit(discount) * col("n1v") / col("cv") * col("n1w") / col("nb")).as("p")
      )
    bg.join(model, Seq("v", "w"))
      .select(col("doc_id"), round(log(col("p")), 9).cast("decimal(14,9)").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("slp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(-col("slp").cast("double") / col("n_bigrams"), 6).as("h_kn")
      )
      .orderBy("doc_id")
  }

  /** t43: JENSEN-SHANNON DIVERGENCE BETWEEN SOURCES — the symmetric,
    * bounded [0, ln 2] distributional distance between corpus slices'
    * unigram distributions: the signal a mixture pipeline reads before
    * re-weighting sources (t35 measures shared shingle MASS; this
    * measures how differently the slices USE the shared vocabulary —
    * two sources can overlap 100% in shingles and still diverge in
    * frequency). One corpus count shuffle; everything after runs on
    * the (sources × types) model table (vocabulary-sized — Heaps-
    * sublinear) with a dense zero-filled spine so both engines see the
    * same support; each p·ln(p/m) term is decimal-quantized before the
    * per-pair fold (t34's discipline).
    */
  def t43JsDivergence(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("c"))
    val spine = counts.select("source").distinct().crossJoin(counts.select("tok").distinct())
    val dense = spine
      .join(counts, Seq("source", "tok"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val tot = dense.groupBy("source").agg(sum("c").as("tot"))
    val p = dense
      .join(broadcast(tot), "source")
      .select(col("source"), col("tok"), (col("c").cast("double") / col("tot")).as("p"))
    val pairs = p
      .select(col("source").as("src_a"), col("tok"), col("p").as("pa"))
      .join(
        p.select(col("source").as("src_b"), col("tok"), col("p").as("pb")),
        Seq("tok")
      )
      .filter(col("src_a") < col("src_b"))
    val m = (col("pa") + col("pb")) / 2
    def term(x: org.apache.spark.sql.Column) =
      when(x > 0, round(x * log(x / m), 9).cast("decimal(14,9)"))
        .otherwise(lit(BigDecimal(0)).cast("decimal(14,9)"))
    pairs
      .select(col("src_a"), col("src_b"), term(col("pa")).as("ta"), term(col("pb")).as("tb"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_types"), sum("ta").as("sa"), sum("tb").as("sb"))
      .select(
        col("src_a"),
        col("src_b"),
        col("n_types"),
        round((col("sa") + col("sb")).cast("double") / 2, 6).as("js_divergence")
      )
      .orderBy("src_a", "src_b")
  }

  /** t44: READABILITY SCORING — the Flesch reading-ease screen a text
    * curation pipeline runs alongside Gopher rules (t30): per doc,
    * words (whitespace tokens), sentences (terminal-punctuation runs,
    * floored at 1), and a syllable proxy (vowel-group runs — the
    * standard dictionary-free estimator), then
    * 206.835 − 1.015·(W/S) − 84.6·(Syl/W), rounded at the edge, plus
    * the easy/standard/hard band taken on the ROUNDED score so both
    * engines band identical doubles. Map-only over the corpus — three
    * regex passes per doc, one scalar row out; no shuffle at all until
    * the driver's orderBy.
    */
  /** t45: FILTER-AGREEMENT AUDIT — do two independent quality filters
    * (t2's lexical distinct-token ratio and t25's bigram-LM logprob)
    * agree on which documents to keep? Pearson correlation over the
    * doc-level scores (exact: both scores are pre-rounded, folded as
    * decimals — order-independent sums — with the r formula evaluated
    * in one identical double expression at the edge) plus the 2×2
    * keep/drop confusion at each filter's own corpus MEDIAN (exact
    * interpolated percentile — the e22-proven quantile parity), so the
    * audit is parameter-free. The report every curation team wants
    * before stacking filters: high agreement ⇒ the second filter buys
    * little; low ⇒ they prune different failure modes. Two keyed score
    * scans + a 1-row broadcast stats join — nothing heavier than t25
    * itself.
    */
  /** t46: STAGE-ATTRITION REPORT — what each curation stage costs in
    * documents and tokens, the observability table every pipeline
    * owner keeps next to p1: raw → exact dedup (min-id per content
    * hash) → quality gates (p1's token/stopword/distinct-ratio
    * battery) → deterministic hash sampling, reported as cumulative
    * survivors with share-of-raw. ONE corpus scan computes every
    * per-doc flag (the dedup membership is the only join), then a
    * single conditional-aggregate row stacks into the 4-stage table —
    * adding a stage adds a column, not a pass.
    */
  def t46StageAttrition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val kept = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("k1"))
    val tk = filter(split(col("text"), " "), t => t =!= "")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val flagged = docs
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(tk).cast("long").as("nt"),
        coalesce(col("k1"), lit(false)).as("k1"),
        (size(tk).between(20, 1000) &&
          size(filter(tk, t => t.isin(stops: _*))).cast("double") / greatest(size(tk), lit(1)) <= 0.5 &&
          size(array_distinct(tk)).cast("double") / greatest(size(tk), lit(1)) >= 0.2).as("kq"),
        substring(md5(col("text")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7").as("ks")
      )
    val row = flagged.agg(
      count(lit(1)).as("d0"),
      sum("nt").as("t0"),
      sum(when(col("k1"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("k1"), col("nt")).otherwise(0L)).as("t1"),
      sum(when(col("k1") && col("kq"), 1L).otherwise(0L)).as("d2"),
      sum(when(col("k1") && col("kq"), col("nt")).otherwise(0L)).as("t2"),
      sum(when(col("k1") && col("kq") && col("ks"), 1L).otherwise(0L)).as("d3"),
      sum(when(col("k1") && col("kq") && col("ks"), col("nt")).otherwise(0L)).as("t3")
    )
    row
      .selectExpr(
        "d0",
        "stack(4, 0, 'raw', d0, t0, 1, 'exact_dedup', d1, t1, " +
          "2, 'quality', d2, t2, 3, 'sample', d3, t3) as (stage_id, stage, n_docs, n_tokens)"
      )
      .select(
        col("stage_id"),
        col("stage"),
        col("n_docs"),
        col("n_tokens"),
        round(col("n_docs").cast("double") / col("d0"), 4).as("doc_share_of_raw")
      )
      .orderBy("stage_id")
  }

  def t45FilterAgreement(s: SparkSession, d: String): DataFrame = {
    val q = t2QualityScore(s, d).select(col("doc_id"), col("distinct_ratio").as("q"))
    val p = t25PerplexityFilter(s, d).select(col("doc_id"), col("score").as("p"))
    val j = q
      .join(p, "doc_id")
      .select(
        col("doc_id"),
        col("q").cast("decimal(10,4)").as("qd"),
        col("p").cast("decimal(12,6)").as("pd")
      )
    val stats = j.agg(
      count(lit(1)).as("n"),
      sum("qd").as("sx"),
      sum("pd").as("sy"),
      sum(col("qd") * col("pd")).as("sxy"),
      sum(col("qd") * col("qd")).as("sxx"),
      sum(col("pd") * col("pd")).as("syy"),
      expr("percentile(CAST(qd AS DOUBLE), 0.5)").as("mq"),
      expr("percentile(CAST(pd AS DOUBLE), 0.5)").as("mp")
    )
    j.crossJoin(broadcast(stats))
      .withColumn("kq", col("qd").cast("double") >= col("mq"))
      .withColumn("kp", col("pd").cast("double") >= col("mp"))
      .groupBy()
      .agg(
        first("n").as("n_docs"),
        round(
          (first("n") * first("sxy").cast("double") -
            first("sx").cast("double") * first("sy").cast("double")) /
            sqrt(
              (first("n") * first("sxx").cast("double") -
                first("sx").cast("double") * first("sx").cast("double")) *
                (first("n") * first("syy").cast("double") -
                  first("sy").cast("double") * first("sy").cast("double"))
            ),
          6
        ).as("pearson_r"),
        sum(when(col("kq") && col("kp"), 1L).otherwise(0L)).as("n_both_keep"),
        sum(when(!col("kq") && !col("kp"), 1L).otherwise(0L)).as("n_both_drop"),
        sum(when(col("kq") && !col("kp"), 1L).otherwise(0L)).as("n_q_only"),
        sum(when(!col("kq") && col("kp"), 1L).otherwise(0L)).as("n_p_only")
      )
      .withColumn(
        "agreement",
        round((col("n_both_keep") + col("n_both_drop")).cast("double") / col("n_docs"), 6)
      )
  }

  def t44Readability(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_words"),
        greatest(
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"),
          lit(1L)
        ).as("n_sentences"),
        greatest(
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long"),
          lit(1L)
        ).as("n_syllables")
      )
      .filter(col("n_words") > 0)
    docs
      .withColumn(
        "flesch",
        round(
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") / col("n_sentences")) -
            lit(84.6) * (col("n_syllables").cast("double") / col("n_words")),
          4
        )
      )
      .withColumn(
        "band",
        when(col("flesch") >= 60.0, "easy")
          .when(col("flesch") >= 30.0, "standard")
          .otherwise("hard")
      )
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "band")
      .orderBy("doc_id")
  }

  /** t47 (round 14): WORD BURSTINESS — the variance-to-mean ratio of a
    * word's per-document counts, the classic over-dispersion test that
    * separates CONTENT words (bursty: absent from most docs, repeated
    * hard where they appear — VMR ≫ 1) from FUNCTION words (Poisson-ish,
    * VMR ≈ 1). Church & Gale's burstiness restated as three integer
    * folds: per (word, doc) count c, then per word df = #docs,
    * tot = Σc, ss = Σc² — all exact longs, so the report value
    * VMR = (df·ss − tot²) / (df·tot) is ONE IEEE division of exact
    * integers (deterministic bit-for-bit in both engines; no cross-row
    * double fold anywhere). Top 20 by VMR among words in ≥ 25 docs,
    * tiebreak by word. Scale: one (word, doc) aggregate, one word
    * aggregate, TakeOrdered(20) — no global sort, no driver loop.
    */
  def t47WordBurstiness(s: SparkSession, d: String, minDf: Int = 25): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("w"))
      .groupBy("w", "doc_id")
      .agg(count(lit(1)).as("c"))
    perDoc
      .groupBy("w")
      .agg(
        count(lit(1)).as("df"),
        sum("c").as("tot"),
        sum(col("c") * col("c")).as("ss")
      )
      .filter(col("df") >= minDf)
      .select(
        col("w"),
        col("df"),
        col("tot"),
        round(
          (col("df") * col("ss") - col("tot") * col("tot")).cast("double") /
            (col("df") * col("tot")).cast("double"),
          6
        ).as("vmr")
      )
      .orderBy(desc("vmr"), col("w"))
      .limit(20)
  }

  /** t48 (round 14): LANGUAGE-ID CONFUSION MATRIX — t1's heuristic
    * classifier evaluated against the corpus's ground-truth `lang`
    * column: per (actual, predicted) cell, doc count and share of the
    * actual language (recall on the diagonal, the leakage pattern off
    * it) — the eval table that decides whether the cheap n-gram screen
    * is good enough to shard a 100 TB dedup by language (d24's
    * question, answered from the classifier side). Model-sized output
    * (langs²); one corpus scan.
    */
  def t48LangConfusion(s: SparkSession, d: String): DataFrame = {
    val cells = t1LangId(s, d)
      .groupBy(col("lang_meta").as("actual"), col("lang_pred").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy("actual").agg(sum("n_docs").as("n_actual"))
    cells
      .join(broadcast(totals), "actual")
      .select(
        col("actual"),
        col("predicted"),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("n_actual"), 6).as("share_of_actual"),
        (col("actual") === col("predicted")).as("is_correct")
      )
      .orderBy("actual", "predicted")
  }

  /** t49 (round 14): N-GRAM HEAD COVERAGE — what fraction of all corpus
    * trigram OCCURRENCES the top-k distinct trigrams cover, for k ∈
    * {10, 100, 1000}: the head-heaviness curve that prices n-gram
    * decontamination and winnowing indexes (a heavy head means a small
    * blocklist catches most mass). Rank ties broken by the gram string;
    * coverage is one division of exact longs per report row. One count
    * shuffle; the rank window runs over the TYPE table (Heaps-sublinear),
    * t12/t21's discipline.
    */
  def t49NgramCoverage(s: SparkSession, d: String): DataFrame = {
    // raw OCCURRENCE trigrams (TF.wordShingles dedups per doc — wrong
    // grain for a coverage-of-occurrences curve)
    val tk = TF.tokens(col("text"))
    val tris = when(
      size(tk) >= 3,
      transform(
        sequence(lit(0), size(tk) - 3),
        i => concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3))
      )
    ).otherwise(array().cast("array<string>"))
    // materialize the TYPE table once (vocab³-bounded — model-sized):
    // both the total and the ranked branch read it, so the corpus
    // explode+count shuffle runs exactly once, not once per branch
    // r18: the trigram explode + partial count (≈4.9M gram rows at
    // sf0.1) ran fused into the 1-task scan — parallelism floor first
    // (guide §2.6); column pruning keeps the exchange to the text column
    val grams = docsFloor(s, d)
      .select(explode(tris).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = grams.agg(sum("c").as("total"), count(lit(1)).as("n_types"))
    val ranked = grams
      .withColumn("rn", row_number().over(Window.orderBy(desc("c"), col("g"))))
      .crossJoin(broadcast(tot))
    // all three tiers from ONE pass over the ranked type table
    // (conditional sums + stack — not one re-aggregation per k, which
    // would recompute the corpus gram count three extra times)
    ranked
      .agg(
        sum(when(col("rn") <= 10, 1L).otherwise(0L)).as("g10"),
        sum(when(col("rn") <= 10, col("c")).otherwise(0L)).as("o10"),
        sum(when(col("rn") <= 100, 1L).otherwise(0L)).as("g100"),
        sum(when(col("rn") <= 100, col("c")).otherwise(0L)).as("o100"),
        sum(when(col("rn") <= 1000, 1L).otherwise(0L)).as("g1000"),
        sum(when(col("rn") <= 1000, col("c")).otherwise(0L)).as("o1000"),
        first("total").as("total"),
        first("n_types").as("n_types")
      )
      .selectExpr(
        "stack(3, 10, g10, o10, 100, g100, o100, 1000, g1000, o1000) as (top_k, n_grams, occurrences)",
        "total",
        "n_types"
      )
      .select(
        col("top_k"),
        col("n_grams"),
        col("occurrences"),
        col("n_types"),
        round(col("occurrences").cast("double") / col("total"), 6).as("coverage")
      )
      .orderBy("top_k")
  }

  /** t50 (round 15): PARAGRAPH-LEVEL DEDUP REPORT — the Dolma/C4-style
    * sub-document pass: chunk every document into fixed 10-token
    * "paragraphs" (the corpus has no newline structure, so the chunking
    * is deterministic token windows both engines replay), hash each
    * chunk, and count per document how many of its chunks appear
    * anywhere else in the corpus. Docs over 30% duplicated chunks get
    * flagged — the boilerplate/mirror-page signal paragraph dedup
    * exists for. Shape: explode → one groupBy(hash) count → one join
    * back; both shuffles keyed on the chunk hash, no pairwise compare
    * anywhere.
    */
  def t50ParagraphDedup(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("ts"))
      .filter(size(col("ts")) > 0)
    val chunks = toks
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(0, CAST(ceil(size(ts)/10.0) AS INT) - 1), " +
              "i -> md5(array_join(slice(ts, i*10+1, 10), ' ')))"
          )
        ).as("h")
      )
    val freq = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    chunks
      .join(freq, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_chunks")
      )
      .withColumn(
        "dup_share",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6)
      )
      .withColumn("flagged", (col("dup_share") >= 0.3).cast("boolean"))
      .orderBy("doc_id")
  }

  /** t52 (round 17): TRAIN/VAL/TEST SPLIT + LEAKAGE AUDIT — the
    * reproducible-split stage every training pipeline needs, plus the
    * check pipelines skip at their peril: a DETERMINISTIC doc-id-hash
    * split (md5 leading hex digit: 0–b train 75%, c–d val 12.5%, e–f
    * test 12.5% — rerunnable, shard-order-independent) and the
    * cross-split CONTENT-fingerprint leakage count. Splitting by id
    * while duplicates exist puts copies of the same text in different
    * splits (eval contamination); `leaked_fps`/`leaked_docs` measure
    * exactly that per language, and drop to zero after a dedup pass on
    * the same fingerprint (d7's contract) — the audit that proves
    * dedup ran BEFORE the split. The fingerprint is the NORMALIZED
    * content signature (sorted distinct token set — the
    * bag-of-words collapse near-dup audits use), not the raw bytes:
    * reordered/repeated-word copies are exactly the leaks an id-hash
    * split lets through. Scale: two keyed aggregations (fp grain, then
    * lang grain), no all-pairs anything, no skew (md5 keys).
    */
  def t52SplitLeakage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        md5(expr(
          "array_join(array_sort(array_distinct(filter(split(text, ' '), x -> x != ''))), ' ')"
        )).as("fp"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("hx")
      )
      .withColumn(
        "split",
        when(col("hx").isin("c", "d"), "val")
          .when(col("hx").isin("e", "f"), "test")
          .otherwise("train")
      )
    // fp grain: does this content land in >1 split?
    val leaks = docs
      .groupBy("lang", "fp")
      .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n_docs"))
      .filter(col("n_splits") >= 2)
      .groupBy("lang")
      .agg(count(lit(1)).as("leaked_fps"), sum("n_docs").as("leaked_docs"))
    docs
      .groupBy("lang")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test")
      )
      .join(leaks, Seq("lang"), "left")
      .na
      .fill(0L, Seq("leaked_fps", "leaked_docs"))
      .orderBy("lang")
  }

  /** t53 (round 17): WEIGHTED SAMPLE-BUDGET APPORTIONMENT — give each
    * language a share of a fixed 100-doc sample budget proportional to
    * its TOKEN MASS (not its doc count — the upweighting every mixture
    * designer actually wants), then draw that many docs per language
    * deterministically. Two exactness disciplines make it
    * engine-identical at any scale:
    * - the allocation is Hamilton/largest-remainder in PURE INTEGER
    *   arithmetic — base_i = (B·w_i) div W, and the +1 leftovers go to
    *   the largest (B·w_i mod W) remainders (ties by lang) — no float
    *   quota ever exists, so no engine can round it differently;
    * - the within-language draw is the smallest md5(doc_id) hex
    *   strings — a uniform, reproducible, shard-order-independent
    *   permutation both engines sort identically.
    * Scale: one KB-sized stratum aggregate broadcast back, one
    * per-language top-k (TopKPerKey-shaped window) — no global sort of
    * the corpus, no skew (md5 keys).
    */
  def t53BudgetSample(s: SparkSession, d: String): DataFrame = {
    val budget = 100L
    val docs = Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("lang"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("hx")
      )
    val strata = docs.groupBy("lang").agg(sum("n_tokens").as("w"))
    val tot = strata.agg(sum("w").as("big_w"))
    val alloc = strata
      .crossJoin(broadcast(tot))
      // `div`, not `/`: Spark's `/` on longs is TRUE division (double)
      // — inexact past 2^53, exactly the width w·B reaches at corpus
      // scale. The w·B product is computed in DECIMAL(38,0) (round-18
      // ADVICE fix): a LONG multiply wraps silently at |w·B| > 2^63
      // under LEGACY (and throws under ANSI) while DuckDB errors —
      // the decimal product is exact to 38 digits in every eval mode,
      // and `div`/`%` accept decimal operands (IntegralDivide → LONG
      // quotient, Remainder → decimal) so the quotient/remainder stay
      // exact integers the whole way
      .withColumn("base", expr(s"(cast(w as decimal(38,0)) * $budget) div big_w"))
      .withColumn("rem", expr(s"(cast(w as decimal(38,0)) * $budget) % big_w"))
      .withColumn(
        "extra_rank",
        row_number().over(Window.orderBy(desc("rem"), col("lang")))
      )
    // leftover L = B - sum(base): +1 to the L largest remainders
    val leftover = alloc.agg((lit(budget) - sum("base")).as("l"))
    val quota = alloc
      .crossJoin(broadcast(leftover))
      .withColumn(
        "quota",
        (col("base") + when(col("extra_rank") <= col("l"), 1L).otherwise(0L)).cast("long")
      )
      .select("lang", "w", "quota")
    val ranked = docs.withColumn(
      "pick_rank",
      row_number().over(Window.partitionBy("lang").orderBy(col("hx"), col("doc_id"))).cast("long")
    )
    ranked
      .join(quota, "lang")
      .filter(col("pick_rank") <= col("quota"))
      .select("lang", "doc_id", "n_tokens", "pick_rank", "quota")
      .orderBy("lang", "pick_rank")
  }
}
