package graft

import org.apache.spark.sql.functions._

/** Sketch operators beyond HLL/t-digest (q16/q26b): frequent items,
  * Bloom filters, and count-min sketches via `DataFrameStatFunctions`.
  * At 100 TB these are the shapes that replace exact global state:
  * a Bloom filter built on the small side of a join prunes the big
  * side's shuffle (semi-join pushdown); count-min bounds per-key
  * frequency state for heavy-hitter detection.
  */
class SketchSpec extends SparkSuite {

  private def events = graft.sources.Tables.events(spark, sf)

  test("freqItems includes every truly frequent value (no false negatives)") {
    val support = 0.1
    val total = events.count()
    val trulyFrequent = events.groupBy(col("event_type")).count()
      .filter(col("count") > total * support)
      .collect().map(_.getString(0)).toSet
    val sketch = events.stat.freqItems(Array("event_type"), support)
      .collect()(0).getSeq[String](0).toSet
    assert(trulyFrequent.subsetOf(sketch),
      s"freqItems guarantee violated: $trulyFrequent vs $sketch")
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val keys = graft.sources.Tables.customer(spark, sf).select(col("c_custkey"))
    val n = keys.count()
    val bf = keys.stat.bloomFilter("c_custkey", n, 0.03)
    val present = keys.collect().map(_.getLong(0))
    assert(present.forall(bf.mightContain), "bloom filters never false-negative")
    val absent = (1000000L until 1002000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp <= 0.1, s"false-positive rate far above configured 3%: $fp")
  }

  test("count-min sketch overestimates but never underestimates frequencies") {
    val cms = events.stat.countMinSketch(col("event_type"), eps = 0.01,
      confidence = 0.95, seed = 42)
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"count-min must never underestimate: $k $est < $cnt")
      assert(est <= cnt + (0.01 * events.count()).toLong + 1,
        s"estimate outside eps bound: $k $est vs $cnt")
    }
  }
}
