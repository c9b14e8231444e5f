package graft

import org.apache.spark.sql.functions._

/** B.1 source coverage beyond the parquet loaders: CSV and JSON batch
  * scans with explicit schemas (SURVEY §2 B.1 — the reference's
  * envelope is JSON, `customMapper.ts:9`; CSV is charter surface).
  */
class SourcesSpec extends SparkSuite {

  test("CSV batch scan with explicit schema round-trips the orders table") {
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val orig = graft.sources.Tables.orders(spark, sf)
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(orig.schema).option("header", "true").csv(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("JSON batch scan with explicit schema round-trips the nation table") {
    val out = java.nio.file.Files.createTempDirectory("graft_json").toString
    val orig = graft.sources.Tables.nation(spark, sf)
    orig.write.mode("overwrite").json(out)
    val back = spark.read.schema(orig.schema).json(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("ORC batch scan round-trips with predicate pushdown available") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val orig = graft.sources.Tables.customer(spark, sf)
    orig.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    val filtered = back.filter(col("c_custkey") < 10)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("c_custkey"),
      s"ORC scan should carry pushed filters:\n$scan")
  }

  test("observe() surfaces per-query metrics without a second pass") {
    val observed = graft.sources.Tables.orders(spark, sf)
      .observe("m", count(lit(1)).as("rows"), max(col("o_totalprice")).as("max_price"))
    observed.collect() // metrics attach to THIS QueryExecution's run
    val m = observed.queryExecution.observedMetrics("m")
    assert(m.getAs[Long]("rows") == graft.sources.Tables.orders(spark, sf).count())
    assert(m.getAs[Double]("max_price") > 0.0)
  }

  test("schema_of_json infers the events.props envelope shape") {
    val inferred = spark.sql("""SELECT schema_of_json('{"k": 42}') AS s""").first().getString(0)
    assert(inferred.toLowerCase.contains("k") && inferred.toUpperCase.contains("BIGINT"), inferred)
  }

  test("csv/json scans prune columns at the source") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val orig = graft.sources.Tables.orders(spark, sf)
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val two = spark.read.schema(orig.schema).option("header", "true").csv(out)
      .select(col("o_orderkey"), col("o_totalprice"))
    val scan = two.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("o_orderkey") && !scan.contains("o_comment"),
      s"scan should read only projected columns:\n$scan")
    assert(two.count() == orig.count())
  }
}
