package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects float_dot at session build time") {
    val orig = spark // force shared-session init; its SparkContext is reused
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      assert(s2 ne orig, "builder should create a fresh session with extensions")
      val r = s2.sql(
        """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .collect()
      assert(r.head.getDouble(0) == 11.0)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
