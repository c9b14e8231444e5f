package graft

import org.apache.spark.sql.functions._

/** Stat-function surface (B.4): corr / covar / stddev / variance /
  * approxQuantile / sampleBy. These use streaming one-pass algorithms
  * whose accumulation order is engine-specific, so they are checked
  * against decimal-exact references computed from the same rows (not
  * the DuckDB hash gate — same policy as HLL and approx_percentile).
  */
class StatSpec extends SparkSuite {

  private lazy val o = graft.sources.Tables.orders(spark, sf)
    .select(col("o_totalprice").as("x"), (col("o_orderkey") % 1000).cast("double").as("y"))

  // decimal-exact moments: sums are exact, the closed-form combination
  // is one deterministic double expression at the edge
  private lazy val m = o.agg(
    count(lit(1)).as("n"),
    sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"),
    sum(col("y").cast("decimal(28,6)")).cast("double").as("sy"),
    sum((col("x") * col("x")).cast("decimal(38,6)")).cast("double").as("sxx"),
    sum((col("y") * col("y")).cast("decimal(38,6)")).cast("double").as("syy"),
    sum((col("x") * col("y")).cast("decimal(38,6)")).cast("double").as("sxy")).first()

  private def n = m.getAs[Long]("n").toDouble

  test("corr matches the decimal-exact closed form") {
    val expected = (n * m.getAs[Double]("sxy") - m.getAs[Double]("sx") * m.getAs[Double]("sy")) /
      math.sqrt((n * m.getAs[Double]("sxx") - math.pow(m.getAs[Double]("sx"), 2)) *
        (n * m.getAs[Double]("syy") - math.pow(m.getAs[Double]("sy"), 2)))
    val got = o.stat.corr("x", "y")
    assert(math.abs(got - expected) < 1e-9, s"corr $got vs $expected")
  }

  test("covar_samp and covar_pop match the decimal-exact closed forms") {
    val sxy = m.getAs[Double]("sxy"); val sx = m.getAs[Double]("sx"); val sy = m.getAs[Double]("sy")
    val pop = (sxy - sx * sy / n) / n
    val samp = (sxy - sx * sy / n) / (n - 1)
    val r = o.agg(covar_pop(col("x"), col("y")), covar_samp(col("x"), col("y"))).first()
    assert(math.abs(r.getDouble(0) - pop) / math.abs(pop) < 1e-10)
    assert(math.abs(r.getDouble(1) - samp) / math.abs(samp) < 1e-10)
  }

  test("stddev/variance match the decimal-exact closed forms") {
    val sx = m.getAs[Double]("sx"); val sxx = m.getAs[Double]("sxx")
    val varPop = (sxx - sx * sx / n) / n
    val varSamp = (sxx - sx * sx / n) / (n - 1)
    val r = o.agg(var_pop(col("x")), var_samp(col("x")),
      stddev_pop(col("x")), stddev_samp(col("x"))).first()
    assert(math.abs(r.getDouble(0) - varPop) / varPop < 1e-10)
    assert(math.abs(r.getDouble(1) - varSamp) / varSamp < 1e-10)
    assert(math.abs(r.getDouble(2) - math.sqrt(varPop)) / math.sqrt(varPop) < 1e-10)
    assert(math.abs(r.getDouble(3) - math.sqrt(varSamp)) / math.sqrt(varSamp) < 1e-10)
  }

  test("approxQuantile brackets the exact median") {
    val exact = o.stat.approxQuantile("x", Array(0.5), 0.0).head // rel=0 → exact
    val approx = o.stat.approxQuantile("x", Array(0.5), 0.05).head
    val sorted = o.select(col("x")).collect().map(_.getDouble(0)).sorted
    assert(math.abs(approx - exact) / exact < 0.2)
    assert(exact >= sorted.head && exact <= sorted.last)
  }

  test("sampleBy with a seed is reproducible and stratum-bounded") {
    val byStatus = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("s"), col("o_orderkey"))
    val fractions = Map("F" -> 0.3, "O" -> 0.1, "P" -> 1.0)
    val a = byStatus.stat.sampleBy("s", fractions, seed = 7L).collect().toSet
    val b = byStatus.stat.sampleBy("s", fractions, seed = 7L).collect().toSet
    assert(a == b, "same seed must reproduce the same sample")
    val counts = a.groupBy(_.getString(0)).view.mapValues(_.size).toMap
    val totals = byStatus.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    fractions.foreach { case (k, f) =>
      val got = counts.getOrElse(k, 0).toDouble / totals(k)
      assert(math.abs(got - f) < 0.15, s"stratum $k: got $got want ~$f")
    }
  }
}
