package graft

import org.apache.spark.sql.DataFrame

/** Pins for [[graft.ops.KMeans]] (the p20 IVF trainer) that the oracle
  * gate can't express:
  *
  *  - the spherical-k-means convergence witness (objective
  *    non-decreasing across iterations),
  *  - the tie rule (equal cosine → SMALLEST cluster id, matching the
  *    oracle's `ROW_NUMBER ... ORDER BY cos DESC, cent_id`),
  *  - an expression-size budget on the argmax projection. Round 13
  *    shipped a `when`-chain argmax that was O(K²·dim) nodes — it blew
  *    the 64 KB JVM codegen limit at K=8×dim=64 (interpreted fallback,
  *    30–59 MiB task binaries, 440 s at sf0.1). The array_max-over-
  *    structs rewrite is O(K·dim); this spec fails if anyone
  *    reintroduces quadratic duplication.
  */
class KMeansSpec extends SparkSuite {
  import graft.ops.KMeans

  /** Deterministic fake corpus: no RNG, so the spec is replayable. */
  private def corpus(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (math.sin(i * 31 + j) * 0.5 + 0.5).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("objective is non-decreasing across iterations (convergence witness)") {
    graft.expressions.VectorExpressions.register(spark)
    val m = KMeans.fit(corpus(200, 16), "vec_id", "embedding", k = 8, iters = 4)
    m.objective.toSeq.sliding(2).foreach { case Seq(a, b) =>
      // 6-dp rounding of per-row cosines bounds any apparent dip at
      // n·5e-7; anything past that is a real argmax/update bug
      assert(b >= a - 1e-3, s"objective decreased: ${m.objective.mkString(", ")}")
    }
  }

  test("cosine ties assign to the smallest cluster id") {
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    // four identical vectors, k=2 → both seeds identical → every row
    // ties on cosine; all must land in cluster 0, cluster 1 stays
    // empty and RETAINS its seed centroid
    val same = (0L until 4L).map(i => (i, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val m = KMeans.fit(same, "vec_id", "embedding", k = 2, iters = 2)
    assert(m.sizes.toSeq == Seq(4L, 0L), s"tie must favor cluster 0: ${m.sizes.mkString(",")}")
    assert(m.centroids(1).toSeq == Seq(0.6, 0.8), "empty cluster must keep its seed centroid")
  }

  test("kernel argmax (BestCentroid expression) is bit-identical to the expanded form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    val df = corpus(150, 16)
    val m = KMeans.fit(df, "vec_id", "embedding", k = 6, iters = 2) // K·dim=96 → expanded path
    val withNrm = df.withColumn("__nrm",
      expr(graft.functions.VectorFns.fastNormExpr("embedding")))
    val (cE, sE) = KMeans.bestClusterExpanded("embedding", "__nrm", m.centroids)
    val (cK, sK) = KMeans.bestClusterKernel(spark, "embedding", m.centroids)
    val diff = withNrm.select(
        col("vec_id"), cE.as("clE"), sE.as("coE"), cK.as("clK"), sK.as("coK"))
      .filter(col("clE") =!= col("clK") || col("coE") =!= col("coK"))
    assert(diff.isEmpty, s"strategies disagree:\n${diff.limit(5).collect().mkString("\n")}")

    // degenerate zero-norm vectors must fail LOUDLY in BOTH strategies
    // (ANSI division throws in the expanded plan; the kernel pins an
    // explicit refusal), never silently land in a cluster
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val zero = Seq((9999L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding")
      .withColumn("__nrm", expr(graft.functions.VectorFns.fastNormExpr("embedding")))
    val (cE2, sE2) = KMeans.bestClusterExpanded("embedding", "__nrm", m.centroids)
    val eExp = intercept[Throwable] { zero.select(cE2.as("c"), sE2.as("s")).collect() }
    assert(chain(eExp).exists(_.contains("DIVIDE_BY_ZERO")),
      s"expanded path should raise ANSI DIVIDE_BY_ZERO, got: ${chain(eExp).headOption}")
    val (cK2, sK2) = KMeans.bestClusterKernel(spark, "embedding", m.centroids)
    val eKer = intercept[Throwable] { zero.select(cK2.as("c"), sK2.as("s")).collect() }
    assert(chain(eKer).exists(_.contains("zero-norm")),
      s"kernel should refuse zero-norm input, got: ${chain(eKer).headOption}")
  }

  test("large K·dim switches to the kernel: plan stays O(1) nodes") {
    graft.expressions.VectorExpressions.register(spark)
    // 128 centroids × 64 dims = 8192 cells > threshold → kernel path
    val cents = Array.tabulate(128, 64)((j, i) => math.sin(j * 7 + i) * 0.5 + 0.5)
    val assigned = KMeans.assign(corpus(10, 64), "embedding", KMeans.Model(
      cents, Array.fill(128)(0L), Array.fill(128)(0L), Array(0.0)))
    val nodes = assigned.queryExecution.analyzed.expressions
      .map(e => e.collect { case x => x }.size).sum
    assert(nodes < 200,
      s"kernel path should be O(1) plan nodes regardless of K, got $nodes")
    assert(assigned.groupBy("cluster").count().count() > 1,
      "kernel assignment should spread rows over multiple clusters")
  }

  test("small K·dim expanded argmax stays inside whole-stage codegen (the 100 TB one-shot-scan witness)") {
    // r22: the trainer gates (p20/p20b) now run the BestCentroid kernel
    // — the expanded plan re-paid a fresh janino compile of a K·dim-wide
    // projection EVERY iteration (~2.5 s of p20's bench cost). The
    // expanded strategy's 100 TB rationale — fused whole-stage-codegen
    // arithmetic for ONE-SHOT scans big enough to amortize one compile —
    // is witnessed here instead: below the cell threshold, assign()
    // still picks the expanded form and its scoring projection compiles
    // into a WholeStageCodegen span (no kernel function, no interpreted
    // fallback). Parity with the kernel is pinned by the bit-identical
    // tests above/below, so gating through the kernel loses nothing.
    graft.expressions.VectorExpressions.register(spark)
    // 8 centroids × 64 dims = 512 cells < kernelCellThreshold → expanded.
    // repartition breaks ConvertToLocalRelation, which would otherwise
    // constant-fold the whole projection into a LocalTableScan and hide
    // the codegen question this test exists to answer.
    val cents = Array.tabulate(8, 64)((j, i) => math.sin(j * 7 + i) * 0.5 + 0.5)
    val assigned = KMeans.assign(corpus(10, 64).repartition(2), "embedding", KMeans.Model(
      cents, Array.fill(8)(0L), Array.fill(8)(0L), Array(0.0)))
    assigned.collect() // finalize THIS dataset's AQE plan (write() builds its own QE)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_best_centroid"),
      "below the cell threshold assign() must pick the expanded strategy")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"expanded argmax projection must sit inside a WholeStageCodegen span (the r13 " +
        s"O(K²·dim) regression printed an unstarred Project):\n$plan")
    assert(assigned.groupBy("cluster").count().count() > 1,
      "expanded assignment should spread rows over multiple clusters")
  }

  test("trained IVF end-to-end: probe 4/16 trained lists, recall vs brute force") {
    // The full train → index → search story on the REAL testdata
    // embeddings (deterministic, seed 42): KMeans.fit trains the
    // coarse quantizer, KMeans.assign builds the inverted lists, a
    // query probes its nprobe nearest centroids and scores only those
    // lists. Deterministic input ⇒ deterministic recall; the floor is
    // pinned just below the measured value so a scoring/assignment
    // regression (wrong argmax, wrong list routing) fails loudly,
    // while the uniform-random floor for probe/K=4/16 would be ~0.25.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).persist()
    val model = KMeans.fit(e, "vec_id", "embedding", k = 16, iters = 2)
    val lists = KMeans.assign(e, "embedding", model)
      .select(col("vec_id"), col("cluster").as("list_id"))
    assert(lists.count() == e.count(), "every vector must land in a list")

    val cents = model.centroids.zipWithIndex
      .map { case (c, j) => (j, c.map(_.toFloat)) }.toSeq.toDF("cent_id", "ce")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // rank centroids per query by dot/|c| (query norm is rank-invariant)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("score",
        expr("float_dot(qe, ce)") / sqrt(expr("float_dot(ce, ce)")))
      .withColumn("prn", row_number().over(wProbe)).filter(col("prn") <= 4)
      .select(col("qid"), col("cent_id").as("list_id"))

    def topk(cand: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val scored = cand.join(e, "vec_id")
        .join(q.select(col("qid"), col("qe")), "qid")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(expr("float_dot(embedding, qe)") /
          (sqrt(expr("float_dot(embedding, embedding)")) * sqrt(expr("float_dot(qe, qe)"))), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val bruteCand = q.select(col("qid")).crossJoin(e.select(col("vec_id")))
    val ivfCand = lists.join(broadcast(probes), "list_id")
      .select(col("qid"), col("vec_id")).distinct()
    val bf = topk(bruteCand)
    val ivf = topk(ivfCand)
    val recall = bf.keys.map { k =>
      bf(k).intersect(ivf.getOrElse(k, Set.empty)).size.toDouble / bf(k).size
    }.sum / bf.size
    info(f"trained-IVF recall@10 (probe 4/16): $recall%.3f")
    // measured 0.480 on the seed-42 fixture (synthetic embeddings have
    // weak cluster structure); floor sits between that and the 0.25 a
    // broken router would average
    assert(recall >= 0.4, f"trained IVF recall collapsed: $recall%.3f")
    e.unpersist()
  }

  test("IVF lists as a partitioned layout: probing is a partition-pruned scan") {
    // The Spark-first realization of a vector index at 100 TB: the
    // inverted lists ARE the storage layout (partitionBy cluster), so
    // probing nprobe lists is partition pruning at the scan — no
    // custom SparkStrategy, no index service; the planner reads
    // nprobe/K of the files and the rest never leave object storage.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions._
    graft.expressions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val model = KMeans.fit(e, "vec_id", "embedding", k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_layout").toString
    KMeans.assign(e, "embedding", model)
      .select(col("vec_id"), col("embedding"), col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)

    val lists = spark.read.parquet(dir)
    val probes = Seq(1, 3)
    val probed = lists.filter(col("cluster").isin(probes: _*))
    val rows = probed.collect()
    val plan = probed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no file scan in plan:\n$plan"))
    assert(scan.toString.contains("PartitionFilters") && scan.toString.contains("cluster"),
      s"probe filter should prune partitions at the scan:\n$scan")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < lists.inputFiles.length,
      s"probe read $filesRead of ${lists.inputFiles.length} files — no pruning happened")
    // and the pruned read is exactly the probed lists' content
    val expected = KMeans.assign(e, "embedding", model)
      .filter(col("cluster").isin(probes: _*)).count()
    assert(rows.length.toLong == expected)
  }

  test("argmax projection stays O(K·dim) expression nodes (codegen budget)") {
    graft.expressions.VectorExpressions.register(spark)
    val df = corpus(16, 64) // p20's real shape: K=8, dim=64
    val m = KMeans.fit(df, "vec_id", "embedding", k = 8, iters = 1)
    val assigned = KMeans.assign(df, "embedding", m)
    val nodes = assigned.queryExecution.analyzed.expressions
      .map(e => e.collect { case x => x }.size).sum
    // array_max form measures ~8k nodes here; the r13 when-chain was
    // ~50k and interpreted. Budget sits between the two regimes.
    assert(nodes < 20000,
      s"argmax expression bloat: $nodes nodes — quadratic duplication reintroduced?")
  }

  test("fit(forceKernel) walks the identical trajectory as the expanded strategy") {
    // p22 trains through the kernel below the cell threshold (compile
    // cost, not math, motivates the switch) — the MODELS must be
    // bit-identical, not just the per-row argmax (KMeansSpec already
    // fuzz-pins that): centroid trajectories, sizes, objective.
    graft.expressions.VectorExpressions.register(spark)
    val df = corpus(150, 16)
    val a = KMeans.fit(df, "vec_id", "embedding", k = 6, iters = 3)
    val b = KMeans.fit(df, "vec_id", "embedding", k = 6, iters = 3, forceKernel = true)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq,
      "kernel-trained centroids diverged from the expanded trajectory")
    assert(a.sizes.toSeq == b.sizes.toSeq && a.objective.toSeq == b.objective.toSeq)
    val la = KMeans.assign(df, "embedding", a).select("vec_id", "cluster", "cosine")
    val lb = KMeans.assign(df, "embedding", b, forceKernel = true)
      .select("vec_id", "cluster", "cosine")
    assert(la.exceptAll(lb).isEmpty && lb.exceptAll(la).isEmpty,
      "kernel assignment diverged from the expanded assignment")
  }

  test("degenerate vectors: default fit excludes them with a surfaced count; strict stays loud") {
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    val good = corpus(60, 8)
    val zeros = Seq(
      (9990L, Array.fill(8)(0.0f)),
      (9991L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val mixed = good.union(zeros)
    // default policy: training SURVIVES the zero vectors, surfaces the count,
    // and walks the exact trajectory the clean corpus alone would walk
    val m = KMeans.fit(mixed, "vec_id", "embedding", k = 4, iters = 2)
    assert(m.degenerate == 2L, s"expected 2 excluded vectors, got ${m.degenerate}")
    assert(m.sizes.sum == 60L, s"zero-norm rows must not be assigned: ${m.sizes.mkString(",")}")
    val clean = KMeans.fit(good, "vec_id", "embedding", k = 4, iters = 2)
    assert(clean.degenerate == 0L)
    assert(m.centroids.map(_.toSeq).toSeq == clean.centroids.map(_.toSeq).toSeq,
      "excluding degenerates must not perturb the clean trajectory")
    // opt-in strict mode keeps the loud refusal (ANSI divide or kernel throw)
    val e = intercept[Throwable] {
      KMeans.fit(mixed, "vec_id", "embedding", k = 4, iters = 2, dropDegenerate = false)
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(s => s.contains("DIVIDE_BY_ZERO") || s.contains("zero-norm")),
      s"strict mode should fail loudly on zero-norm input, got: ${chain(e).headOption}")
  }

  test("kernel refuses dimension-mismatched vectors loudly (parity with ANSI getItem)") {
    import spark.implicits._
    graft.expressions.VectorExpressions.register(spark)
    val cents = Array.tabulate(4, 8)((j, i) => math.sin(j * 3 + i) * 0.5 + 0.6)
    val (cK, sK) = KMeans.bestClusterKernel(spark, "embedding", cents)
    val bad = Seq((1L, Array.fill(6)(0.5f))).toDF("vec_id", "embedding") // 6 ≠ 8
    val e = intercept[Throwable] { bad.select(cK.as("c"), sK.as("s")).collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("dimension mismatch")),
      s"kernel must refuse wrong-dimension vectors, got: ${msgs.headOption}")
  }

  test("kernel temp registrations are dropped once fit/assign plans are resolved") {
    graft.expressions.VectorExpressions.register(spark)
    def kernelFns: Int = spark.sessionState.functionRegistry.listFunction()
      .count(_.funcName.startsWith("graft_best_centroid"))
    val before = kernelFns
    // K=80 × dim=64 = 5120 cells > threshold → every iteration and the
    // assign below go through the kernel (one registration each)
    val df = corpus(100, 64)
    val m = KMeans.fit(df, "vec_id", "embedding", k = 80, iters = 2)
    val assigned = KMeans.assign(df, "embedding", m)
    // execution AFTER deregistration must still work: the analyzed plan
    // carries the resolved BestCentroid, not a registry lookup
    assert(assigned.groupBy("cluster").count().count() > 1)
    assert(kernelFns == before,
      s"kernel temp functions leaked: $kernelFns registered (was $before)")
  }

  test("double-input corpus (p51 whitened path) walks the identical trajectory as its float twin") {
    import org.apache.spark.sql.functions._
    graft.expressions.VectorExpressions.register(spark)
    // float32 widens to double EXACTLY, so every stage of the
    // type-generic path — float_dot norms, seed collection, the
    // VecCentroidDouble partial agg, both argmax strategies — must
    // reproduce the float trajectory bit-for-bit on a widened corpus
    val df = corpus(150, 16)
    val dd = df.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val mF = KMeans.fit(df, "vec_id", "embedding", k = 6, iters = 3)
    val mD = KMeans.fit(dd, "vec_id", "embedding", k = 6, iters = 3)
    assert(mF.centroids.map(_.toSeq).toSeq == mD.centroids.map(_.toSeq).toSeq,
      "double-input centroids diverged from the float trajectory")
    assert(mF.sizes.toSeq == mD.sizes.toSeq && mF.objective.toSeq == mD.objective.toSeq)
    // kernel strategy on doubles = expanded strategy on doubles
    val mDk = KMeans.fit(dd, "vec_id", "embedding", k = 6, iters = 3, forceKernel = true)
    assert(mDk.centroids.map(_.toSeq).toSeq == mD.centroids.map(_.toSeq).toSeq,
      "double-input kernel strategy diverged from the expanded strategy")
    // assignment parity across element widths and strategies
    val aF = KMeans.assign(df, "embedding", mF).select("vec_id", "cluster", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    val aD = KMeans.assign(dd, "embedding", mD, forceKernel = true)
      .select("vec_id", "cluster", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(aF == aD, "double-input assignment diverged from the float assignment")
  }

  test("float_dot accepts array<double> and mixed widths, bit-identical to the HOF form") {
    import org.apache.spark.sql.functions._
    graft.expressions.VectorExpressions.register(spark)
    val df = corpus(80, 16)
      .withColumn("d", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val bad = df.select(
        expr("float_dot(embedding, embedding)").as("ff"),
        expr("float_dot(d, d)").as("dd"),
        expr("float_dot(embedding, d)").as("fd"),
        expr("float_dot(d, embedding)").as("df"),
        expr("aggregate(zip_with(d, d, (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
      .filter(col("ff") =!= col("dd") || col("dd") =!= col("fd") ||
        col("fd") =!= col("df") || col("dd") =!= col("hof"))
    assert(bad.isEmpty,
      s"float_dot element-width paths disagree:\n${bad.limit(3).collect().mkString("\n")}")
  }
}
