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
}
