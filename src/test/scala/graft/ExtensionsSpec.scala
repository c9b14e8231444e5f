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

  test("DimensionBroadcast rule auto-broadcasts a dimension scan with no hint in the query") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // kill size-based broadcast
      import org.apache.spark.sql.functions.col
      def plan(s: SparkSession) = {
        val j = graft.sources.Tables.customer(s, sf)
          .join(graft.sources.Tables.nation(s, sf), col("c_nationkey") === col("n_nationkey"))
        j.collect()
        j.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case p => p.toString
        }
      }
      assert(plan(s2).contains("BroadcastHashJoin"),
        "rule session should broadcast the nation scan without an explicit hint")
      // control: same join, same conf, session without the rule
      val prev = orig.conf.get("spark.sql.autoBroadcastJoinThreshold")
      orig.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try assert(!plan(orig).contains("BroadcastHashJoin"),
        "control session must not broadcast, or the assertion above proves nothing")
      finally orig.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("CartesianGuard rejects unhinted cartesians at planning, allows hinted/escaped ones") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      import org.apache.spark.sql.functions.broadcast
      val a = s2.range(10).toDF("x")
      val b = s2.range(10).toDF("y")
      // planner-time, not analysis-time: building the Dataset is legal
      // (the guard fires when a plan is actually chosen for execution)
      val cross = a.crossJoin(b)
      val e = intercept[Exception](cross.count())
      assert(e.getMessage.contains("cartesian product"), e.getMessage)
      // the deliberate pattern — broadcast-hinted scalar side — passes
      assert(a.crossJoin(broadcast(b)).count() == 100)
      // a hint below row-reducing unary ops (distinct = Aggregate,
      // limit) is still propagated to this join by Spark's own hint
      // extraction, so the guard must accept it too
      assert(a.crossJoin(broadcast(b).distinct()).count() == 100)
      assert(a.crossJoin(broadcast(b).limit(5)).count() == 50)
      // escape hatch
      s2.conf.set(graft.plans.CartesianGuard.allowKey, "true")
      try assert(cross.count() == 100)
      finally s2.conf.unset(graft.plans.CartesianGuard.allowKey)
      // equi-joins unaffected
      assert(a.join(b, a("x") === b("y")).count() == 10)
      // ADVICE r3: the comma-join forms whose equi-predicate arrives via
      // a Filter ABOVE the join must NOT trip the guard — pushdown turns
      // them into equi-joins before the planner sees them
      assert(a.join(b).where(a("x") === b("y")).count() == 10)
      a.createOrReplaceTempView("guard_a")
      b.createOrReplaceTempView("guard_b")
      assert(s2.sql(
        "SELECT * FROM guard_a, guard_b WHERE guard_a.x = guard_b.y").count() == 10)
      // ...but a join whose only "condition" is side-local predicates is
      // still a cartesian after pushdown strips them, and must trip
      val e3 = intercept[Exception](
        a.join(b).where(a("x") > 3 && b("y") < 5).count())
      assert(e3.getMessage.contains("cartesian product"), e3.getMessage)
      // ADVICE r4: only product-authorizing hints waive the guard. A
      // merge/shuffle-hash hint carries no size signal — Spark ignores
      // it without equi-keys and plans a cartesian anyway — so a
      // condition-less join wearing one must still trip
      for (h <- Seq("merge", "shuffle_hash")) {
        val eh = intercept[Exception](a.join(b.hint(h)).count())
        assert(eh.getMessage.contains("cartesian product"),
          s"a '$h' hint must not waive the guard: ${eh.getMessage}")
      }
      // ...while shuffle_replicate_nl is the explicit cartesian opt-in
      assert(a.join(b.hint("shuffle_replicate_nl")).count() == 100)
      // a hint buried in a NESTED join must not waive the guard for an
      // outer cartesian — the hint speaks for the inner join only
      val dim = s2.range(10).toDF("k")
      val inner = a.join(broadcast(dim), a("x") === dim("k"))
      val e2 = intercept[Exception](inner.crossJoin(b).count())
      assert(e2.getMessage.contains("cartesian product"),
        "nested broadcast hint must not waive the outer cartesian guard")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("DimensionBroadcast hint is size-gated (ADVICE r2: basename alone is unsafe)") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // shrink the gate below any real file: the rule must now stay silent
      // even though nation.parquet is on the basename allowlist
      s2.conf.set(graft.plans.DimensionBroadcast.maxBytesKey, "1")
      import org.apache.spark.sql.functions.col
      try {
        val j = graft.sources.Tables.customer(s2, sf)
          .join(graft.sources.Tables.nation(s2, sf), col("c_nationkey") === col("n_nationkey"))
        j.collect()
        val plan = j.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case p => p.toString
        }
        assert(!plan.contains("BroadcastHashJoin"),
          "a dimension scan above graft.broadcast.maxBytes must not be force-broadcast")
      } finally s2.conf.unset(graft.plans.DimensionBroadcast.maxBytesKey)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
