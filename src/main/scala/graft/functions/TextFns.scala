package graft.functions

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY §2 B.7): tokenization, shingling, MinHash, SimHash, rolling
  * fingerprints, stopword scoring.
  *
  * Everything is expressed as Spark SQL expression strings over
  * higher-order functions (`transform`/`aggregate`/`filter`) — no Scala
  * UDFs — so the whole pipeline stays inside Catalyst/whole-stage
  * codegen and distributes like any other columnar expression.
  *
  * Portability: hashes are built from `md5` hex strings (identical
  * output in Spark and DuckDB), so every operator here is
  * oracle-checkable; the shared constants below are interpolated into
  * both the Spark expressions and the DuckDB oracle SQL — one source of
  * truth, no drift.
  */
object TextFns {

  /** Non-empty whitespace tokens. */
  def tokensExpr(text: String): String =
    s"filter(split($text, ' '), t -> t <> '')"

  /** Overlapping n-token shingles joined by single spaces; empty array
    * when the doc is shorter than n (sequence() would count backwards). */
  def shinglesExpr(toks: String, n: Int = 3): String = {
    val parts = (0 until n).map(k => s"$toks[i+$k]").mkString(", ")
    s"CASE WHEN size($toks) >= $n THEN transform(sequence(0, size($toks)-$n), i -> concat_ws(' ', $parts)) ELSE CAST(array() AS ARRAY<STRING>) END"
  }

  /** MinHash for one seed: lexicographic min of seeded md5 over the
    * element multiset (min over multiset == min over set, so no
    * distinct needed). */
  def minhashExpr(arr: String, seed: Int): String =
    s"array_min(transform($arr, t -> md5(concat('${seed}_', t))))"

  /** 16-bit SimHash as a '0'/'1' string: bit j is the sign of the sum
    * of ±1 votes from md5 nibble j of each element. */
  def simhashExpr(arr: String): String =
    s"""array_join(transform(sequence(1, 16), j -> CASE WHEN aggregate($arr, 0, (a, t) -> a + (CASE WHEN substring(md5(t), j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END), '')"""

  /** Order-sensitive polynomial rolling hash over the token stream
    * (document fingerprint): acc*131 + ascii(t)*31 + len(t), mod 1e9+7. */
  def rollingHashExpr(arr: String): String =
    s"aggregate($arr, CAST(0 AS BIGINT), (a, t) -> (a*131 + ascii(t)*31 + length(t)) % 1000000007)"

  /** Occurrence count of tokens from a fixed word list. */
  def wordListCountExpr(arr: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    s"aggregate($arr, 0, (a, t) -> a + (CASE WHEN t IN ($lst) THEN 1 ELSE 0 END))"
  }

  /** Sum of token lengths (for mean-token-length quality features). */
  def tokenLenSumExpr(arr: String): String =
    s"aggregate($arr, 0, (a, t) -> a + length(t))"

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * heuristic. Ordered map: iteration order == CASE tiebreak order. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "fr" -> Seq("le", "les", "de", "et", "un", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在"))
}
