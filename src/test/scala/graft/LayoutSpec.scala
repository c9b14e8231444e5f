package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

class LayoutSpec extends SparkSuite {

  test("bucketed tables equi-join with no exchange on either side") {
    val o = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"))
    val c = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    Layout.bucketWrite(o, "b_orders", 4, Seq("o_custkey"))
    Layout.bucketWrite(c, "b_cust", 4, Seq("o_custkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(j.count() == o.join(c, "o_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("MERGE upsert over bucketed base+changes plans no exchange (100 TB incremental apply)") {
    // the materializeCdc scale path: when the state table and the
    // reduced change set are bucketed on the merge key, the full-outer
    // MERGE is a co-located sort-merge join — no shuffle of the base
    val base = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"))
    val changes = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), (col("c_acctbal") * 2).as("c_acctbal"),
        when(col("c_custkey") % 9 === 0, "D").otherwise("U").as("op"))
    Layout.bucketWrite(base, "b_merge_base", 4, Seq("c_custkey"))
    Layout.bucketWrite(changes, "b_merge_chg", 4, Seq("c_custkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.ops.Merge.upsert(
        spark.table("b_merge_base"), spark.table("b_merge_chg"), "c_custkey", "op")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed MERGE must not shuffle either side:\n$plan")
      val expected = base.count() - changes.filter(col("op") === "D").count()
      assert(merged.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write prunes partitions under a partition-column filter") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val o = graft.sources.Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
    Layout.partitionedWrite(o, out, Seq("status"))
    val one = spark.read.parquet(out).filter(col("status") === "F")
    val scanned = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("status"), s"scan should carry partition filter:\n$scanned")
    assert(one.count() == o.filter(col("o_orderstatus") === "F").count())
  }

  test("clustered write produces disjoint per-file key ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_clust").toString
    val o = graft.sources.Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    Layout.clusteredWrite(o, out, Seq("o_orderkey"), numFiles = 4)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("o_orderkey")), max(col("o_orderkey"))).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"file key ranges must be disjoint: ${ranges.toSeq}")
    }
    assert(spark.read.parquet(out).count() == o.count())
  }

  test("bloom-pruned join equals the plain join (false positives filtered by the exact join)") {
    val big = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"))
    val small = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") < 8).select(col("c_custkey").as("user_id"), col("c_acctbal"))
    val plain = big.join(small, "user_id")
    val pruned = Layout.bloomPrunedJoin(big, small, "user_id")
      .select(plain.columns.map(col).toSeq: _*)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("z-order write: predicates on EITHER key column skip files via footer ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val o = graft.sources.Tables.orders(spark, sf)
      .select((col("o_orderkey") % 256).cast("int").as("ka"),
        (col("o_custkey") % 256).cast("int").as("kb"),
        col("o_totalprice"))
    Layout.zorderWrite(o, out, "ka", "kb", numFiles = 16)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 16)
    // a narrow predicate on each dimension must leave some files with
    // a provably non-matching min/max range (i.e., skippable)
    def skippable(colName: String, v: Int): Int = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(colName)), max(col(colName))).first()
      v < r.getInt(0) || v > r.getInt(1)
    }
    assert(skippable("ka", 3) > 0, "some files must exclude ka=3 by range")
    assert(skippable("kb", 3) > 0, "some files must exclude kb=3 by range")
    // and the data round-trips unchanged
    assert(spark.read.parquet(out).count() == o.count())
  }

  test("zorderCol interleaves bits (locality sanity)") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0x7FFFFFFF, 0x7FFFFFFF))
      .toDF("a", "b")
      .select(Layout.zorderCol(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 0x3FFFFFFFFFFFFFFFL))
  }

  test("compactSmallFiles merges a many-small-files directory to the target count") {
    val smallDir = java.nio.file.Files.createTempDirectory("graft_small").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/out"
    val o = graft.sources.Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    o.repartition(40).write.mode("overwrite").parquet(smallDir) // streaming-sink residue
    val small = new java.io.File(smallDir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(small.length == 40)
    val total = small.map(_.length()).sum
    Layout.compactSmallFiles(spark, smallDir, outDir, targetFileBytes = (total + 1) / 2)
    val compacted = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(compacted.length == 2, s"expected 2 files, got ${compacted.length}")
    assert(spark.read.parquet(outDir).exceptAll(o).isEmpty)
    assert(o.exceptAll(spark.read.parquet(outDir)).isEmpty)
  }

  test("bloomPrunedJoin with expectedNumItems runs one fewer job than the count fallback") {
    val big = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"))
    val small = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") < 8).select(col("c_custkey").as("user_id"), col("c_acctbal"))
    def jobsFor(group: String)(f: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try f finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val withHint = jobsFor("bf-hint") {
      Layout.bloomPrunedJoin(big, small, "user_id", expectedNumItems = 8)
        .write.format("noop").mode("overwrite").save()
    }
    val withFallback = jobsFor("bf-fallback") {
      Layout.bloomPrunedJoin(big, small, "user_id")
        .write.format("noop").mode("overwrite").save()
    }
    // the fallback count() costs MORE jobs (under AQE an aggregate is
    // itself >1 job, so the delta isn't pinned to exactly one)
    assert(withHint < withFallback,
      s"sizing hint should remove the count() pass: hint=$withHint fallback=$withFallback")
  }

  test("salted join returns exactly the unsalted join's rows") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"))
    val dim = graft.sources.Tables.customer(spark, sf)
      .select((col("c_custkey") % 20).as("user_id"), col("c_mktsegment"))
      .distinct()
    val plain = ev.join(dim, Seq("user_id"))
    val salted = Layout.saltedJoin(ev, dim, Seq("user_id"), 8, col("event_id"))
      .select(plain.columns.map(col).toSeq: _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bloomPrunedJoin on a STRING key equals the plain join (probe must hash what the build put)") {
    import spark.implicits._
    // the old Long-typed probe UDF cast string keys to bigint: numeric
    // strings hashed as longs against a string-built filter (mismatch),
    // non-numeric cast to null and vanished — silently (near-)empty
    // results where the doc promised 'never wrong'
    val big = Seq(("doc-1", 10), ("doc-2", 20), ("123", 30), ("doc-4", 40))
      .toDF("k", "v")
    val small = Seq(("doc-1", "x"), ("123", "y")).toDF("k", "tag")
    val plain = big.join(small, "k")
    val pruned = Layout.bloomPrunedJoin(big, small, "k")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "string-keyed bloom prune must not drop matching rows")
    // an unsupported key type is refused by name, not silently wrong
    val binBig = Seq((Array[Byte](1), 1)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      Layout.bloomPrunedJoin(binBig, binBig.select("k"), "k"))
    assert(e.getMessage.contains("bloomPrunedJoin"), e.getMessage)
  }

  test("zorderCol fails loudly on keys outside the non-negative 31-bit domain") {
    import spark.implicits._
    // the old & 0x7FFFFFFF mask aliased -1 onto the LARGEST key and
    // wrapped wide domains onto small ones — footer ranges went
    // maximally wide and file skipping silently died
    val bad = Seq((-1L, 3L)).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(Layout.zorderCol(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(e).contains("31-bit"), msgs(e))
    // null keys pass through as a null z-value (range partitioner handles them)
    val withNull = Seq((Option.empty[Long], Option(3L))).toDF("a", "b")
    assert(withNull.select(Layout.zorderCol(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("compactSmallFiles refuses a partitioned directory instead of flattening it through one task") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("v", "p")
      .write.partitionBy("p").parquet(dir)
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out").toString
    val e = intercept[IllegalArgumentException](
      Layout.compactSmallFiles(spark, dir, s"$out/c"))
    assert(e.getMessage.contains("partition subdirectories"), e.getMessage)
  }
}
