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
  *    property instead of scattered lower() calls.
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
}
