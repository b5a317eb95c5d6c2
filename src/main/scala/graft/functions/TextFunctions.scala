package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text building blocks. Everything here is composed from
  * codegen'd built-ins (`split`/`filter`/`transform`/`aggregate`/
  * `xxhash64`) — no Scala UDFs — so whole-stage codegen stays intact and
  * the expressions survive Catalyst pushdown/pruning untouched.
  */
object TextFunctions {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex tokens: letter runs, digit runs, single punctuation. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))

  /** Distinct word k-shingles ("a b c" for k=3), the unit of MinHash /
    * Jaccard near-dup detection.
    */
  def wordShingles(toks: Column, k: Int): Column = {
    val joined = transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)
    )
    when(size(toks) >= k, array_distinct(joined)).otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash signature: n independent hash functions simulated by salting
    * xxhash64 with the function index; signature element i is the min hash
    * over the shingle set. One pass over the array per element, all
    * codegen'd array lambdas.
    */
  def minhashSignature(shingles: Column, n: Int): Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => array_min(transform(shingles, sh => xxhash64(concat(i.cast("string"), lit("#"), sh))))
    )

  /** 64-bit SimHash over the token multiset: per token, xxhash64 bits
    * vote +1/-1 per position; the sign vector packs into one long.
    */
  def simhash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, t) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            b => when(call_function("shiftright", xxhash64(t), b).bitwiseAND(lit(1L)) === 1L, lit(1L))
              .otherwise(lit(-1L))
          ),
          (a, v) => a + v
        )
    )
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)
    )
  }

  /** Rolling fingerprint of the token stream (order-sensitive, unlike a
    * bag-of-words hash): h = rotl(h, 5) XOR xxhash64(token). Rotation +
    * XOR instead of multiply-add keeps it overflow-free under ANSI mode.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) =>
        call_function("shiftleft", acc, lit(5))
          .bitwiseOR(call_function("shiftrightunsigned", acc, lit(59)))
          .bitwiseXOR(xxhash64(t))
    )

  private val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /** Stopword-hit count for one language's list. */
  private def stopHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwordsByLang(lang): _*)))

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val tk = tokens(text)
    when(size(tk) > 0, stopHits(tk, lang).cast("double") / size(tk)).otherwise(lit(0.0))
  }

  /** Heuristic language ID: argmax of per-language stopword hits, 'und'
    * when nothing matches. Deterministic tie-break by language code.
    */
  def langId(text: Column): Column = {
    val tk = tokens(text)
    val scored = stopwordsByLang.keys.toSeq.sorted.map(l => struct(stopHits(tk, l).as("hits"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
