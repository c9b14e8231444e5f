package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataSource V2 generator (B.1): schema, determinism, filter pushdown
  * shrinking the planned partitions, and column pruning reaching the
  * reader. */
class DocGenSourceSpec extends SparkSuite {

  private def docs(rows: Long, parts: Int = 8): DataFrame =
    spark.read.format("graft-docs")
      .option("rows", rows).option("numPartitions", parts).load()

  test("generates the declared schema, row count, and deterministic content") {
    val d = docs(1000)
    assert(d.schema.fieldNames.toSeq == Seq("doc_id", "lang", "text"))
    assert(d.count() == 1000)
    val a = d.orderBy("doc_id").collect()
    val b = docs(1000, parts = 3).orderBy("doc_id").collect() // different partitioning
    assert(a.sameElements(b), "content must be a pure function of doc_id")
    assert(a.forall(r => r.getString(2).split(" ").length >= 20))
  }

  test("doc_id range filter pushes down and prunes input partitions") {
    val filtered = docs(1000, parts = 8).filter(col("doc_id") >= 750 && col("doc_id") < 1000)
    assert(filtered.count() == 250)
    // narrow plan: scan partitions == RDD partitions; [750,1000) of 8
    // × 125-id chunks is 2 partitions, not 8
    assert(filtered.rdd.getNumPartitions == 2,
      s"pushdown should have narrowed the generator range, got ${filtered.rdd.getNumPartitions}")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GraftDocGen range=[750,1000)"), scan)
  }

  test("column pruning reaches the reader; residual filters stay with Spark") {
    val q = docs(500).filter(col("doc_id") < 100 && col("lang") === "en").select(col("lang"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("range=[0,100)"), scan)
    // lang filter is NOT handled by the source — Spark keeps it; the
    // text column is never materialized
    assert(!scan.contains("text"), s"text must be pruned from the read schema:\n$scan")
    val brute = docs(500).collect().count(r => r.getLong(0) < 100 && r.getString(1) == "en")
    assert(q.count() == brute)
  }

  test("equality pushdown plans a single one-row partition") {
    val one = docs(100000, parts = 32).filter(col("doc_id") === 4242)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1)
    assert(one.first().getLong(0) == 4242)
  }

  test("invalid options fail at table resolution, not deep in planning (ADVICE r2)") {
    val e1 = intercept[IllegalArgumentException](docs(1000, parts = 0).count())
    assert(e1.getMessage.contains("numPartitions"))
    val e2 = intercept[IllegalArgumentException](docs(-5).count())
    assert(e2.getMessage.contains("rows"))
  }

  test("doc_id = Long.MaxValue clamps instead of overflowing the pushed range") {
    assert(docs(1000).filter(col("doc_id") === Long.MaxValue).count() == 0)
    assert(docs(1000).filter(col("doc_id") > Long.MaxValue - 1).count() == 0)
    assert(docs(1000).filter(col("doc_id") <= Long.MaxValue).count() == 1000)
  }
}
