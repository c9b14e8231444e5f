package graft

import org.apache.spark.sql.functions._

/** B.8 UDF surface. The engine prefers built-ins / native Expressions
  * (codegen) for everything hot — see `expressions/VectorExpressions`
  * and `functions/VecCentroid` — but the plain scalar `udf()` path is
  * declared surface (the reference's `Transformer` registry,
  * `/root/reference/src/mapping/customMapper.ts:9`) and must work from
  * both the DataFrame DSL and the SQL front door.
  */
class UdfSpec extends SparkSuite {
  import spark.implicits._

  test("scalar udf works from DSL and SQL and matches the built-in formulation") {
    val initials = udf((first: String, last: String) =>
      if (first.isEmpty || last.isEmpty) null
      else s"${first.head}${last.head}".toUpperCase)
    spark.udf.register("initials", initials)

    val df = Seq(("ada", "lovelace"), ("grace", "hopper"), ("", "x"))
      .toDF("f", "l")
    df.createOrReplaceTempView("t_people")

    val viaUdf = df.select(initials(col("f"), col("l")).as("i"))
    val viaSql = spark.sql("SELECT initials(f, l) AS i FROM t_people")
    val viaBuiltins = df.select(
      when(length(col("f")) === 0 || length(col("l")) === 0, lit(null))
        .otherwise(upper(concat(substring(col("f"), 1, 1), substring(col("l"), 1, 1))))
        .as("i"))

    assert(viaUdf.collect().map(_.getString(0)).toSeq ===
      Seq("AL", "GH", null))
    assert(viaSql.exceptAll(viaUdf).isEmpty && viaUdf.exceptAll(viaSql).isEmpty)
    assert(viaBuiltins.exceptAll(viaUdf).isEmpty && viaUdf.exceptAll(viaBuiltins).isEmpty)
  }

  test("array-returning udf + explode acts as a generator (UDTF surface)") {
    val bigrams = udf((s: String) => s.split("\\s+").sliding(2).map(_.mkString(" ")).toSeq)
    val df = Seq("the quick brown fox").toDF("text")
      .select(explode(bigrams(col("text"))).as("bigram"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("the quick", "quick brown", "brown fox"))
  }
}
