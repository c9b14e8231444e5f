package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.cdc.Fixture

/** Property-based checks (SURVEY §5.4) via raw ScalaCheck generators
  * (no scalatestplus bridge in the offline cache). Spark-touching
  * properties keep the case count small; pure-Scala generator
  * properties run wide.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("fixture LSNs are unique, monotone, fixed-width") {
    val lsns = Fixture.rowEvents.map(_.lsn)
    assert(lsns.distinct.size == lsns.size)
    assert(lsns == lsns.sorted)
    assert(lsns.forall(_.matches("0/[0-9A-F]{8}")))
  }

  test("union-all length equals sum of lengths; dedup is idempotent") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 20)), 10).foreach { xs =>
      val df = xs.toDF("x")
      assert(df.union(df).count() == 2L * xs.size)
      val once = df.distinct()
      assert(once.count() == once.distinct().count())
      assert(once.count() == xs.distinct.size)
    }
  }

  test("filter-then-project equals project-then-filter on disjoint columns") {
    val df = graft.sources.Tables.orders(spark, sf)
    val a = df.filter(col("o_totalprice") > 100000).select(col("o_orderkey"), col("o_totalprice"))
    val b = df.select(col("o_orderkey"), col("o_totalprice")).filter(col("o_totalprice") > 100000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("windowed counts sum to total count (q20 invariant)") {
    val total = graft.sources.Tables.events(spark, sf).count()
    val windowed = graft.queries.Advanced.q20.fn(spark, sf)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(windowed == total)
  }
}
