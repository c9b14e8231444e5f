package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every contract query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Queries are forced through the noop sink — a bare `count()` lets
  * Catalyst prune the expensive projections (hashes, HOF reductions)
  * and would overstate throughput. One tiny warmup query first so JIT/
  * codegen compilation isn't billed to the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // harness files are single small parquets; default 128MB split =
      // one scan task. 1MB splits let local[N] parallelize the scans
      // (a real cluster gets this from many files/row groups instead).
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      finally spark.catalog.clearCache() // queries may persist() intermediates;
                                         // don't bill cache memory to the next one
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: touch every table + exercise codegen/shuffle machinery once
    run(queries.Relational.q2.fn)

    // SPARK_GRAFT_ONLY=q1_filter_agg,q22_range_join : isolate queries
    // when profiling a regression (dev aid; driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    // min of two runs per query: one-off JIT compilation or a stray GC
    // pause otherwise lands on an arbitrary query and dominates its number
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).map { case (name, fn) =>
      val a = run(fn)
      val b = run(fn)
      val best = if (a < 0 || b < 0) math.max(a, b) else math.min(a, b)
      // two wildly disagreeing samples mean an external spike (GC,
      // co-tenant load) hit one — or both; a third sample arbitrates
      val v = if (a > 0 && b > 0 && math.abs(a - b) / math.min(a, b) > 0.5) {
        val c = run(fn)
        if (c >= 0) math.min(best, c) else best
      } else best
      name -> v
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
