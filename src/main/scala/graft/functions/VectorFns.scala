package graft.functions

/** Vector similarity building blocks (SURVEY §2 B.7): dot product,
  * norm, cosine, and random-hyperplane LSH bucketing over
  * `array<float>` embedding columns.
  *
  * Same design stance as [[TextFns]]: higher-order-function expression
  * strings (codegen-friendly, no UDFs), float math promoted to double
  * before any reduction, deterministic sequential summation (Spark's
  * `aggregate` folds left-to-right over the array).
  *
  * The LSH hyperplanes are pseudo-random but integer-deterministic:
  * coefficient(p, j) = (((p*2654435761 + j*40503) mod 1000) - 500)/500
  * — pure int64 arithmetic + one exact division, so Spark and DuckDB
  * compute bit-identical planes without sharing any RNG.
  */
object VectorFns {

  /** Reference HOF formulation — correct but interpreted
    * (CodegenFallback); kept for parity testing against the native
    * expression. Prefer [[fastDotExpr]] in hot paths. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  /** Codegen'd native dot product — bit-identical math to [[dotExpr]];
    * requires graft.expressions.VectorExpressions.register(spark). */
  def fastDotExpr(a: String, b: String): String = s"float_dot($a, $b)"

  def fastNormExpr(a: String): String = s"sqrt(float_dot($a, $a))"

  /** Sign-bucket string over `nPlanes` deterministic hyperplanes.
    * j is the 0-based element index ($emb[j] is 0-based in Spark SQL). */
  def lshBucketExpr(emb: String, nPlanes: Int, dim: Int): String =
    s"""array_join(transform(sequence(0, ${nPlanes - 1}), p -> CASE WHEN aggregate(sequence(0, ${dim - 1}), 0D, (a, j) -> a + CAST($emb[j] AS DOUBLE) * ((CAST((p*2654435761 + j*40503) % 1000 AS DOUBLE) - 500.0) / 500.0)) >= 0 THEN '1' ELSE '0' END), '')"""

  /** DuckDB rendering of the identical bucket (1-based list access). */
  def lshBucketSqlDuck(emb: String, nPlanes: Int, dim: Int): String =
    s"""array_to_string(list_transform(range(0, $nPlanes), p -> CASE WHEN list_sum(list_transform(range(0, $dim), j -> CAST($emb[j+1] AS DOUBLE) * ((CAST((p*2654435761 + j*40503) % 1000 AS DOUBLE) - 500.0) / 500.0))) >= 0 THEN '1' ELSE '0' END), '')"""
}
