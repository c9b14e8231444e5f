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

  /** MinHash base hash: md5 computed ONCE per element, folded to a
    * 60-bit int (15 hex chars) mod p. The k per-seed hashes are then
    * cheap affine transforms over this array ([[minhashExpr]]) instead
    * of k full md5 passes — the classic (a*h+b) mod p family. p =
    * 2^31-1 keeps a*h inside int64. */
  val minhashP: Long = 2147483647L

  def md5IntsExpr(arr: String): String =
    s"transform($arr, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % $minhashP)"

  /** Scalar form of [[md5IntsExpr]] for exploded (one-shingle-per-row)
    * pipelines — identical math, codegen-friendly. */
  def md5IntScalarExpr(c: String): String =
    s"CAST(conv(substring(md5($c), 1, 15), 16, 10) AS BIGINT) % $minhashP"

  /** DuckDB rendering of [[md5IntsExpr]] (hex literal cast). */
  def md5IntsSqlDuck(arr: String): String =
    s"list_transform($arr, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % $minhashP)"

  /** Seed-k multiplier/offset for the affine MinHash family. */
  def minhashA(k: Int): Long = ((k + 1) * 2654435761L % minhashP) | 1L
  def minhashB(k: Int): Long = (k.toLong * 40503L * 65537L) % minhashP

  /** MinHash for seed k over a pre-hashed int array ([[md5IntsExpr]]):
    * min over the multiset == min over the set, so no distinct needed.
    * Same string renders in Spark and DuckDB (min vs list_min differ —
    * pass the engine's min function name). */
  def minhashExpr(intsArr: String, k: Int, minFn: String = "array_min"): String =
    s"$minFn(transform($intsArr, h -> (${minhashA(k)} * h + ${minhashB(k)}) % $minhashP))"

  def minhashSqlDuck(intsArr: String, k: Int): String =
    s"list_aggregate(list_transform($intsArr, h -> (${minhashA(k)} * h + ${minhashB(k)}) % $minhashP), 'min')"

  /** 16-bit SimHash as a '0'/'1' string: one md5 per element and ONE
    * pass over the array with a 16-wide vote accumulator. (A
    * per-bit-aggregate formulation looks natural but Catalyst's
    * CollapseProject inlines the md5 array into all 16 aggregates —
    * 16× the hashing.) Bit j is the sign of the summed ±1 votes from
    * hex nibble j. */
  def simhashExpr(arr: String): String =
    s"""array_join(transform(aggregate(transform($arr, t -> md5(t)), array_repeat(0, 16), (acc, h) -> transform(sequence(1, 16), j -> element_at(acc, j) + (CASE WHEN substring(h, j, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END))), v -> CASE WHEN v >= 0 THEN '1' ELSE '0' END), '')"""

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
