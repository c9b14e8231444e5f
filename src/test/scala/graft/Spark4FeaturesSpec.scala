package graft

import org.apache.spark.sql.functions._

/** Spark 4 surface (B.2/A7 additions; no DuckDB oracle — these are
  * engine-native features, so each is cross-checked against the
  * equivalent classic formulation on the same data):
  *  - VARIANT: semi-structured values kept binary-encoded with typed
  *    extraction — the schema-on-read path for `props`-like columns
  *    that avoids per-query from_json string reparsing at scale;
  *  - SQL pipe syntax (`|>`): the front door accepts the new
  *    composition form and plans identically to the classic query;
  *  - collations: locale/case-aware comparison semantics as a TYPE
  *    property instead of scattered lower() calls;
  *  - SQL-defined UDFs: CREATE FUNCTION ... RETURN bodies inline as
  *    expressions (stay inside codegen, unlike black-box UDFs);
  *  - parameterized SQL + IDENTIFIER(): literal/identifier binding
  *    without string splicing — the injection-safe front door.
  */
class Spark4FeaturesSpec extends SparkSuite {

  test("variant round-trip: parse_json + variant_get equals the from_json path") {
    graft.sources.Tables.registerAll(spark, sf)
    val viaVariant = spark.sql(
      """SELECT event_id, variant_get(parse_json(props), '$.k', 'bigint') AS k
        |FROM events""".stripMargin)
    val viaStruct = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
    assert(viaVariant.exceptAll(viaStruct).isEmpty && viaStruct.exceptAll(viaVariant).isEmpty)
    // typed extraction enforces the requested type
    val s = spark.sql("SELECT variant_get(parse_json('{\"k\": 5}'), '$.k', 'string') AS s").first()
    assert(s.getString(0) == "5")
  }

  test("SQL pipe syntax composes to the same result as the classic aggregation") {
    graft.sources.Tables.registerAll(spark, sf)
    val piped = spark.sql(
      """FROM orders
        ||> WHERE o_totalprice > 100000.0
        ||> AGGREGATE COUNT(*) AS n GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)
    val classic = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
    assert(piped.collect().toSeq == classic.collect().toSeq)
  }

  test("SQL-defined scalar UDF (CREATE FUNCTION ... RETURN) inlines into the plan") {
    graft.sources.Tables.registerAll(spark, sf)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(price DOUBLE, disc DOUBLE)
        |RETURNS DOUBLE RETURN price * (1.0 - disc)""".stripMargin)
    val viaUdf = spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |       disc_price(CAST(l_extendedprice AS DOUBLE), CAST(l_discount AS DOUBLE)) AS p
        |FROM lineitem""".stripMargin)
    val classic = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("double") * (lit(1.0) - col("l_discount").cast("double"))).as("p"))
    assert(viaUdf.exceptAll(classic).isEmpty && classic.exceptAll(viaUdf).isEmpty)
    // the SQL body is expression-inlined at analysis, not kept as a
    // black-box call: the function name dissolves into plain arithmetic
    // (a ScalaUDF/black-box node would carry "disc_price" in the plan)
    val plan = viaUdf.queryExecution.executedPlan.toString
    assert(!plan.contains("disc_price"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("parameterized sql: named markers bind literals without string splicing") {
    graft.sources.Tables.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :lo AND o_orderpriority = :prio",
      Map("lo" -> 100000.0, "prio" -> "1-URGENT")).first().getLong(0)
    val classic = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000.0 && col("o_orderpriority") === "1-URGENT").count()
    assert(n == classic)
  }

  test("IDENTIFIER clause resolves a dynamic table name as an identifier, not SQL text") {
    graft.sources.Tables.registerAll(spark, sf)
    val viaIdent = spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)", Map("t" -> "nation"))
      .first().getLong(0)
    assert(viaIdent == graft.sources.Tables.nation(spark, sf).count())
    // a malicious "name" is rejected at parse time instead of being executed
    intercept[Exception] {
      spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
        Map("t" -> "nation WHERE 1=0")).first()
    }
  }

  test("collated comparison groups case-insensitively without lower() rewrites") {
    graft.sources.Tables.registerAll(spark, sf)
    val collated = spark.sql(
      """SELECT COUNT(DISTINCT o_orderpriority COLLATE UTF8_LCASE) AS n FROM orders""")
      .first().getLong(0)
    val lowered = graft.sources.Tables.orders(spark, sf)
      .select(lower(col("o_orderpriority"))).distinct().count()
    assert(collated == lowered)
    val eq = spark.sql("SELECT 'URGENT' COLLATE UTF8_LCASE = 'urgent' AS e").first()
    assert(eq.getBoolean(0))
  }

  test("GROUP BY ALL / ORDER BY ALL resolve the non-aggregate columns and plan like the explicit form") {
    graft.sources.Tables.registerAll(spark, sf)
    val viaAll = spark.sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)
    val explicit = spark.sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus, n""".stripMargin)
    assert(viaAll.collect().toSeq == explicit.collect().toSeq,
      "GROUP BY ALL must expand to every non-aggregate select column, in order")
  }

  test("SQL session variables: DECLARE / SET VAR / reference without string splicing") {
    graft.sources.Tables.registerAll(spark, sf)
    spark.sql("DECLARE OR REPLACE VARIABLE seg STRING DEFAULT 'BUILDING'")
    try {
      val viaVar = spark.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = seg").first().getLong(0)
      val literal = spark.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'BUILDING'").first().getLong(0)
      assert(viaVar == literal && literal > 0)
      // SET VAR re-binds; the same query text now sees the new value
      spark.sql("SET VAR seg = 'AUTOMOBILE'")
      val rebound = spark.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = seg").first().getLong(0)
      val expected = spark.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'AUTOMOBILE'").first().getLong(0)
      assert(rebound == expected && rebound != viaVar)
    } finally spark.sql("DROP TEMPORARY VARIABLE IF EXISTS seg")
  }
}
