package graft

/** t1 smoke (SURVEY §5.1): every contract query runs at sf0.001 and the
  * known-non-empty ones return rows. Pair-finding queries may be empty
  * at tiny SF by nature; they are asserted separately in PipelineSpec.
  */
class ContractSmokeSpec extends SparkSuite {

  private val mayBeEmpty = Set("p6_minhash_lsh_pairs", "p7_ngram_jaccard", "p9_embedding_neardup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q9 frames survive a missing calendar year (ADVICE r2: helper rows follow the next PRESENT year)") {
    // 1992 and 1994 populated, 1993 absent: the old part_yr = yr + 1 rule
    // would orphan 1992's helper rows in an empty 1993 partition and the
    // first 6 rows of 1994 would silently diverge from the global frame
    val dir = java.nio.file.Files.createTempDirectory("graft_q9gap").toString
    import spark.implicits._
    val rows = ((1 to 10).map(i => (s"1992-03-", i)) ++ (1 to 10).map(i => (s"1994-07-", i)))
      .map { case (m, i) => (java.sql.Date.valueOf(f"$m${i}%02d"), (100.0 + 7 * i)) }
    rows.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q9_window_frames")(spark, dir).collect().toSeq
    // reference: the oracle's single global frame, computed directly
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_gap")
    val exp = spark.sql(
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |                      SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
        |               FROM orders_gap GROUP BY 1)
        |SELECT d, CAST(total AS DOUBLE) AS day_total,
        |       CAST(SUM(total) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |       CAST(SUM(total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         / COUNT(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg
        |FROM daily ORDER BY d""".stripMargin).collect().toSeq
    assert(got == exp, "two-phase q9 must match the global frame across the year gap")
  }

  test("q9 returns an empty frame on empty input (r19 ADVICE: zero-arg map() fails analysis)") {
    // zero-entry map() types as map<string,string>, so an unguarded
    // element_at(_, int yr) fails ANALYSIS on an empty orders table —
    // the guard mirrors succCol's: both driver literals null out
    val dir = java.nio.file.Files.createTempDirectory("graft_q9empty").toString
    import spark.implicits._
    Seq.empty[(java.sql.Date, Double)].toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(SparkEntry.queries("q9_window_frames")(spark, dir).collect().isEmpty,
      "empty input must yield an empty frame, not an analysis error")
  }
}
