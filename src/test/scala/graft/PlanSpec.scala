package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.queries.{Advanced, Curation, Extra, Relational}

/** Plan-shape regressions (the 100 TB review items from the charter):
  * filters/projections must reach the scan, small sides must broadcast,
  * top-k must plan as TakeOrdered, the as-of join must not expand into
  * a nested-loop range join. Asserted on the FINAL adaptive plan (after
  * an action), since AQE rewrites joins at runtime.
  */
class PlanSpec extends SparkSuite {

  private def finalPlan(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q1: date/discount/quantity filters push to the parquet scan; only needed columns read") {
    val plan = finalPlan(Relational.q1.fn(spark, sf))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("l_shipdate"), "shipdate filter should be pushed")
    assert(!plan.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q3: all four joins resolve to broadcast joins, no sort-merge shuffle") {
    val plan = finalPlan(Relational.q3.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "dims/orders should broadcast at this scale")
  }

  test("q11: global top-k plans as TakeOrderedAndProject, not a total sort") {
    val plan = finalPlan(Relational.q11.fn(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("q14: as-of join stays union+window — no nested-loop join in the plan") {
    val plan = finalPlan(Advanced.q14.fn(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "as-of must not plan as a range/cross join")
    assert(plan.contains("Window"), plan.take(400))
  }

  test("q18: query vectors broadcast against candidates; float_dot is codegen'd") {
    val df = Advanced.q18.fn(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "5 query vectors must broadcast")
    assert(plan.contains("float_dot"), plan.take(400))
    // codegen: the expression must not fall back to interpreted eval
    val codegen = df.queryExecution.executedPlan.toString
    assert(!codegen.contains("CodegenFallback"), "float_dot should participate in codegen")
  }

  test("q22: tiny band table broadcasts for the non-equi join") {
    val plan = finalPlan(Extra.q22.fn(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("p16: the benchmark shingle side broadcasts — the corpus side never shuffles for the join") {
    val plan = finalPlan(graft.queries.Pipeline.p16.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"decontamination must broadcast the benchmark side:\n${plan.take(800)}")
  }

  test("q8: per-group top-k shuffles at most k rows per group per task (partial WindowGroupLimit)") {
    // Filter(row_number <= k) over a partitioned window plans a
    // Partial WindowGroupLimit BEFORE the exchange — each map task
    // forwards only its own top-k per group, the same shuffle-volume
    // bound a hand-built heap operator would give. Custom-strategy
    // work here would duplicate what the planner already does; this
    // test pins that the contract shape keeps qualifying.
    val plan = finalPlan(Relational.q8.fn(spark, sf))
    // tree text prints children below parents, so the map-side node
    // ("Partial") must appear and sit deeper than the "Final" one
    val partial = plan.indexOf("row_number(), 3, Partial")
    val fin = plan.indexOf("row_number(), 3, Final")
    assert(fin >= 0 && partial > fin,
      s"expected Final above Partial WindowGroupLimit:\n${plan.take(900)}")
  }

  test("q2: aggregation runs partial+final (map-side combine before the shuffle)") {
    val plan = finalPlan(Relational.q2.fn(spark, sf))
    assert(plan.contains("partial_"),
      s"expected map-side partial aggregation before the exchange:\n$plan")
  }

  test("q9: every window frame is partitioned — no single-task global window") {
    // an empty partitionSpec funnels the whole relation through ONE task
    // (the driver-log "No Partition Defined" warning); q9 runs two-phase
    // per-year windows instead. Static plan: AQE stage wrappers hide
    // inner operators from collect().
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Relational.q9.fn(spark, sf)
      val wins = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "q9 should still plan window frames")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned WindowExec serializes on one task:\n$w"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q13: scalar battery executes inside whole-stage codegen") {
    // AQE wraps the plan and reports 0 subtrees before execution —
    // inspect the static plan for this check only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val codegen = Relational.q13.fn(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(!codegen.startsWith("Found 0"),
        s"scalar pipeline should be codegen'd end-to-end:\n${codegen.take(500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q33: correlated subqueries decorrelate to semi/anti joins, no nested loops") {
    val plan = finalPlan(Extra.q33.fn(spark, sf))
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS should decorrelate to semi/anti joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"decorrelation must not fall back to a nested loop:\n$plan")
  }

  test("q40: LATERAL-with-LIMIT decorrelates to WindowGroupLimit, never per-row re-execution") {
    val plan = finalPlan(Curation.q40.fn(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"correlated ORDER BY+LIMIT should plan the partial per-group limit:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral must not fall back to a product:\n$plan")
  }

  test("q41: MERGE change set broadcasts; the base snapshot is never shuffled for the join") {
    val plan = finalPlan(Curation.q41.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny change set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"every merge join must be broadcast-side — a shuffled join here repartitions the base snapshot:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q46: versioned CAS merge keeps q41's shape — change side broadcasts, base never shuffles") {
    val plan = finalPlan(Curation.q46.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the change set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"a shuffled join here repartitions the base state table per batch:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q47: the variant parse runs ONCE per row — the k-predicate must not duplicate parse_json into the scan filter") {
    // the filter-on-derived-column form got the predicate pushed
    // through the projection, substituting the variant expression into
    // the scan filter: two parses per row, and at 100 TB the parse IS
    // the query. The conditional-agg form keeps a single Project parse.
    val plan = finalPlan(Curation.q47.fn(spark, sf))
    val parses = "parseJson".r.findAllIn(plan).length
    assert(parses == 1, s"expected exactly one variant parse, found $parses:\n$plan")
    assert(plan.contains("partial_"), s"variant agg should combine map-side:\n$plan")
  }

  test("q48: pipe-SQL program plans like the classic query — dimension side broadcasts, agg is partial+final") {
    val plan = finalPlan(Curation.q48.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered customer side must broadcast:\n$plan")
    assert(plan.contains("partial_"), s"revenue agg should combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q42: the generated spine joins without a cartesian; daily agg is partial+final") {
    val plan = finalPlan(Curation.q42.fn(spark, sf))
    assert(plan.contains("partial_"),
      s"daily counts should combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // one hot key carries ~all probe rows; with the skew thresholds
    // scaled to test data, AQE must mark the sort-merge join skewed and
    // split the hot partition instead of serializing it on one task —
    // the runtime half of the salting strategy (ops/Layout.saltedJoin
    // covers the shapes AQE can't reach)
    import org.apache.spark.sql.functions.{broadcast => _, _}
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val probe = spark.range(0, 200000)
        .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(0L)).as("k"),
          col("id").as("payload"))
      val build = spark.range(0, 7).select(col("id").as("k"), (col("id") * 10).as("dim"))
      val j = probe.join(build, "k")
      j.collect() // execute THIS QueryExecution — a noop write plans a separate one
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot key's partition:\n${plan.take(1500)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("SQL /*+ BROADCAST */ hint reaches the physical plan through the front door") {
    graft.sources.Tables.registerAll(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(spark.sql(
        """SELECT /*+ BROADCAST(nation) */ n_name, COUNT(*) AS n
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin))
      assert(plan.contains("BroadcastHashJoin"),
        s"SQL hint should force the broadcast with size-based selection off:\n${plan.take(600)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ANALYZE TABLE statistics feed the planner's size estimates under CBO") {
    val wh = java.nio.file.Files.createTempDirectory("graft_stats").toString
    graft.sources.Tables.customer(spark, sf).write.mode("overwrite")
      .option("path", s"$wh/cust_stats").saveAsTable("cust_stats")
    spark.conf.set("spark.sql.cbo.enabled", "true") // row counts flow only with CBO
    try {
      spark.sql("ANALYZE TABLE cust_stats COMPUTE STATISTICS")
      val stats = spark.table("cust_stats").queryExecution.optimizedPlan.stats
      val actual = spark.table("cust_stats").count()
      assert(stats.rowCount.exists(_.longValue == actual),
        s"row-count statistic should match: ${stats.rowCount} vs $actual")
      assert(stats.sizeInBytes > 0)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS cust_stats")
    }
  }

  test("AQE coalesces post-shuffle partitions at runtime") {
    // coalesce by advisory size, not local parallelism, so tiny test
    // data exhibits the same re-plan a production shuffle would
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    try {
      val df = graft.sources.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      df.collect() // execute THIS QueryExecution: the adaptive plan finalizes in place
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("AQEShuffleRead"),
        s"adaptive runtime re-plan should be active:\n$plan")
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
  }

  test("approx percentiles track exact percentiles within 10% (q26b band; tiny per-group samples make interpolated-vs-element gaps visible)") {
    val exact = Extra.q26.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    Extra.q26b.fn(spark, sf).collect().foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) / p50 <= 0.10)
      assert(math.abs(r.getDouble(2) - p90) / p90 <= 0.10)
    }
  }

  test("p27: BM25 plans with broadcast stats/df, map-side partials, and top-k as TakeOrdered") {
    val plan = finalPlan(graft.queries.Pipeline.p27.fn(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), "top-15 must never be a global sort")
    assert(plan.contains("BroadcastHashJoin"),
      s"df (<=|terms| rows) must broadcast:\n${plan.take(800)}")
    assert(plan.contains("partial_"), "tf counts need map-side combine before the shuffle")
    assert(!plan.contains("CartesianProduct"), "the 1-row stats join must broadcast, not cartesian")
  }

  test("p29: PMI joins the vocabulary-sized unigram table by broadcast on BOTH sides") {
    val plan = finalPlan(graft.queries.Pipeline.p29.fn(spark, sf))
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected both unigram joins broadcast, saw $bhj:\n${plan.take(800)}")
    assert(plan.contains("TakeOrderedAndProject"), "top-20 must never be a global sort")
    assert(!plan.contains("CartesianProduct"))
  }

  test("p28: the SemDeDup pair scan is an equi-join on cluster_id — never a cartesian") {
    val plan = finalPlan(graft.queries.Pipeline.p28.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "within-cluster pairs must come from the cluster_id equi-join")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("cluster_id")),
      s"pair join must key on cluster_id:\n${plan.take(1200)}")
  }

  test("p30: incremental dedup candidates come from the band equi-join — no all-pairs shape") {
    val plan = finalPlan(graft.queries.Pipeline.p30.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "increment x corpus candidates must join on band keys, never cross")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("band_val")),
      s"candidate join must key on band values:\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "shingle-intersection counts need map-side combine")
  }

  test("p31: classifier inference reads only the columns it scores; agg is partial+final") {
    val plan = finalPlan(graft.queries.Pipeline.p31.fn(spark, sf))
    assert(!plan.contains("n_chars") && !plan.contains("source"),
      "unused document columns must be pruned from the scan")
    assert(plan.contains("partial_"), "per-language rollup needs map-side combine")
    assert(!plan.contains("Exchange") || plan.linesIterator.count(_.contains("Exchange")) <= 2,
      s"map-only scoring should shuffle only the 5-row rollup:\n${plan.take(800)}")
  }

  test("p32: span scrub joins the span dictionary by equi-join, no cartesian") {
    val plan = finalPlan(graft.queries.Pipeline.p32.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "covered positions must come from the span-keyed dictionary join")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("span")),
      s"dictionary join must key on the span:\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "span reach counts need map-side combine")
  }

  test("p33: hashed-BoW retrieval broadcasts the query side into the bucket join") {
    val plan = finalPlan(graft.queries.Pipeline.p33.fn(spark, sf))
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("bucket")),
      s"the 5-query side must broadcast on the bucket key:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("p34: the unigram LM broadcasts into a map-side score join") {
    val plan = finalPlan(graft.queries.Pipeline.p34.fn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the vocabulary-sized LM table must broadcast:\n${plan.take(1000)}")
    assert(plan.contains("partial_"), "doc score sums need map-side combine")
    assert(!plan.contains("CartesianProduct"), "the 1-row stats join must broadcast")
  }

  test("p35: the reputation rollup composes without a cartesian; dup ids join by doc_id") {
    val plan = finalPlan(graft.queries.Pipeline.p35.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "the dup-id set must left-join on doc_id, never cross")
    assert(plan.contains("partial_"), "the source rollup needs map-side combine")
  }

  test("p36: full ANN stack routes candidates by list equi-join with broadcast probes — no all-pairs scan") {
    val plan = finalPlan(graft.queries.Pipeline.p36.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "candidates must come from the trained-list equi-join, never a cross product")
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("list_id")),
      s"the per-query probe set must broadcast into the list join:\n${plan.take(1200)}")
    assert(plan.contains("pq_encode"),
      s"the corpus side must be scanned as PQ codes via the kernel expression:\n${plan.take(1200)}")
  }

  test("p48: the allow-list pre-filters INSIDE the probed lists — broadcast semi join below the ADC pool cut") {
    val plan = finalPlan(graft.queries.Pipeline.p48.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "filtered candidates must still come from the trained-list equi-join, never a cross product")
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi") && l.contains("vec_id")),
      s"the attribute allow-list must land as a broadcast LEFT SEMI join on vec_id:\n${plan.take(1500)}")
    assert(plan.contains("pq_encode"),
      "the corpus side must still be scanned as PQ codes via the kernel expression")
    // the lang predicate reaches the documents parquet scan
    assert(plan.contains("EqualTo(lang,en)"),
      s"the metadata filter must push to the documents scan:\n${plan.take(1500)}")
    // PRE-filter placement: in the executed-plan tree children print
    // below their parents, so the semi join (candidate generation)
    // must appear AFTER the pool cut's window/sort on the ADC score —
    // i.e. the allow screen feeds the ADC scan, it doesn't trim its
    // output
    val lines = plan.linesIterator.toVector
    val poolIdx = lines.indexWhere(l => l.contains("acos_"))
    val semiIdx = lines.indexWhere(l => l.contains("LeftSemi"))
    assert(poolIdx >= 0 && semiIdx > poolIdx,
      s"the semi join must sit BELOW the ADC pool cut (pre-filter), " +
        s"found pool@$poolIdx semi@$semiIdx:\n${plan.take(2000)}")
  }

  test("p51: the whitened routed stack keeps p48's shape — pre-filter semi join, routed candidates, no corpus-wide window") {
    val df = graft.queries.Pipeline.p51.fn(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      "whitened candidates must come from the trained-list equi-join, never a cross product")
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi") && l.contains("vec_id")),
      s"the attribute allow-list must land as a broadcast LEFT SEMI join on vec_id:\n${plan.take(1500)}")
    assert(plan.contains("pq_encode"),
      "the whitened corpus must be scanned as PQ codes via the kernel expression")
    assert(plan.contains("EqualTo(lang,en)"),
      s"the metadata filter must push to the documents scan:\n${plan.take(1500)}")
    // pre-filter placement, as in p48: the semi join feeds the ADC
    // scan (below the pool cut), it doesn't trim its output — this is
    // what retires p50's corpus-wide pool window: every window here
    // ranks ROUTED candidates only
    val lines = plan.linesIterator.toVector
    val poolIdx = lines.indexWhere(l => l.contains("acos_"))
    val semiIdx = lines.indexWhere(l => l.contains("LeftSemi"))
    assert(poolIdx >= 0 && semiIdx > poolIdx,
      s"the semi join must sit BELOW the ADC pool cut (pre-filter), " +
        s"found pool@$poolIdx semi@$semiIdx:\n${plan.take(2000)}")
    // every WindowExec partitions by qid (PlanAuditSpec bans the empty
    // spec globally; this pins the positive shape for the new gate)
    val winLines = lines.filter(_.contains("Window"))
    assert(winLines.nonEmpty && winLines.forall(_.contains("qid")),
      s"p51 windows must partition by qid:\n${winLines.mkString("\n")}")
  }

  test("p37: one GD gradient pass is a map-only scan + partial-aggregated 5-number reduce") {
    import org.apache.spark.sql.functions.{round => rnd, sum, exp}
    val feats = graft.queries.Pipeline.lrFeatures(graft.sources.Tables.documents(spark, sf))
    // the iteration body's shape: sigmoid projection under literal
    // weights, e6-integer gradient sums (what lrFit runs ×iters)
    val z = rnd(lit(0.1) + lit(0.2) * col("x1") + lit(0.3) * col("x2") +
      lit(0.4) * col("x3") + lit(0.5) * col("x4"), 6)
    val p = rnd(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    val grad = feats.agg(
      count(lit(1)).as("n"),
      sum(rnd((p - col("y")) * lit(1e6)).cast("long")).as("g0"),
      sum(rnd((p - col("y")) * col("x1") * lit(1e6)).cast("long")).as("g1"))
    val plan = finalPlan(grad)
    assert(plan.contains("partial_"), "gradient sums need map-side combine")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"one scan + one single-partition reduce — no wider shuffle:\n${plan.take(1000)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("p38: paragraph near-dup candidates come from the band equi-join — never all paragraph pairs") {
    val plan = finalPlan(graft.queries.Pipeline.p38.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "paragraph candidates must join on band values, never cross")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("band_val")),
      s"candidate join must key on band values:\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "shingle-intersection counts need map-side combine")
  }

  test("p39: one BPE iteration is a dictionary-sized pair agg + TakeOrdered argmax") {
    import org.apache.spark.sql.functions.{explode, expr, sum, concat, regexp_replace, lit => l}
    import graft.functions.TextFns
    val dict = graft.sources.Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(explode(expr(TextFns.tokensExpr("text"))).as("w"))
      .groupBy(col("w")).agg(count(l(1)).as("c"))
      .withColumn("r", concat(l(" "), regexp_replace(col("w"), "(.)", "$1 ")))
    val top = dict.withColumn("sy", expr("filter(split(trim(r), ' '), x -> x <> '')"))
      .select(col("c"), explode(expr(TextFns.shinglesExpr("sy", 2))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("c")).as("total"))
      .orderBy(col("total").desc, col("pair")).limit(1)
    val plan = finalPlan(top)
    assert(plan.contains("TakeOrderedAndProject"),
      s"the argmax must plan as top-k, not a global sort:\n${plan.take(800)}")
    assert(plan.contains("partial_"), "pair counts need map-side combine")
    assert(!plan.contains("CartesianProduct"))
  }

  test("p40: one power-iteration pass is a map-only centered scan + 64-key partial agg") {
    import org.apache.spark.sql.functions.{round => rnd, sum, posexplode, aggregate, zip_with, array, lit => l}
    // the iteration body's shape: literal direction rides the plan,
    // per-row dot is an integer fold, ONE dim-keyed agg (what pcaFit
    // runs ×iters after the same-shaped mean pass)
    val vLit = array((0 until 64).map(_ => l(0.125)): _*)
    val g = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        zip_with(col("embedding"), vLit, (x, mu) => rnd(x.cast("double") - mu, 6)).as("ce"))
      .withColumn("ds",
        aggregate(zip_with(col("ce"), vLit,
          (x, y) => rnd(x * y * 1e6).cast("long")), l(0L), (a, x) => a + x))
      .select(posexplode(col("ce")).as(Seq("i", "cv")), col("ds"))
      .groupBy(col("i"))
      .agg(sum(rnd(col("cv") * (col("ds") / 1e6) * 1e6).cast("long")).as("g"))
    val plan = finalPlan(g)
    assert(plan.contains("partial_"), "gradient sums need map-side combine")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"one scan + one dim-keyed reduce — no wider shuffle:\n${plan.take(1000)}")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Generate"), "per-dim fan-out happens in-scan, post-dot")
  }

  test("p39b: tokenizer inference broadcasts the trained vocabulary — the corpus never shuffles for lookup") {
    val plan = finalPlan(graft.queries.Pipeline.p39b.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("w#")),
      s"token instances must probe the broadcast vocab, not shuffle-join it:\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "per-doc symbol sums need map-side combine")
  }

  test("p41: CMS estimates broadcast the 1024-row sketch; the candidate cut is top-k") {
    val plan = finalPlan(graft.queries.Pipeline.p41.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "depth fan-out is a Generate over a literal array, never a cross join")
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("bucket")),
      s"the sketch (≤1024 cells) must broadcast into the estimate join:\n${plan.take(1200)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the candidate cut must plan as top-k, not a global sort:\n${plan.take(800)}")
    assert(plan.contains("partial_"), "sketch cell counts need map-side combine")
  }

  test("p42: bloom probes join the broadcast bit table; exact verify starts from the pruned side") {
    val plan = finalPlan(graft.queries.Pipeline.p42.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      "bit fan-out is a Generate over a literal array, never a cross join")
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("bit")),
      s"probes must join the broadcast (≤4096-row) bit table:\n${plan.take(1200)}")
    assert(plan.linesIterator.exists(l =>
      l.contains("LeftOuter") && l.contains("sh#")),
      s"the exact lookup must probe the dictionary FROM the bloom-pruned candidates (left join, one pass counts maybe+exact):\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "per-doc counts need map-side combine")
  }

  test("p43: HLL registers build as a groups×256-key partial-max agg over the folded vocab") {
    // r22 shape: ONE corpus pass folds instances to the distinct
    // (lang, bigram) set (a map-side partial-distinct agg — the same
    // shuffle class the exact count always paid), then the register
    // max AND the exact count read the vocab-sized cache. The old pin
    // (`partial_count(distinct`) encoded the pre-fold plan where the
    // exact side re-deduplicated the instance cache on its own.
    val plan = finalPlan(graft.queries.Pipeline.p43.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_max"),
      s"register maxima need map-side combine (the merge law):\n${plan.take(1000)}")
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate(keys=[lang") && l.contains("big") && l.contains("functions=[]")),
      s"the vocab fold must be a map-side partial distinct on (lang, big):\n${plan.take(1200)}")
    assert(!plan.contains("partial_count(distinct"),
      "the exact count must ride the folded vocab, not re-deduplicate instances")
  }

  test("p34b: bigram LM joins are dictionary equi-joins; doc sums are partial+final") {
    val plan = finalPlan(graft.queries.Pipeline.p34b.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"), "only the 1-row stats frame may cross (broadcast)")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("big")),
      s"bigram instances must equi-join their dictionary entry:\n${plan.take(1200)}")
    assert(plan.contains("partial_"), "per-doc log-prob sums need map-side combine")
  }
}
