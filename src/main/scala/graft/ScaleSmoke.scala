package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale curve for the near-dup dedup path (p13's shape):
  * runs MinHash-LSH pair generation + connected-components cluster
  * resolution on the harness `documents` table at 1× and on a
  * replicated ~5× copy, and prints one JSON line per scale point with
  * doc/pair counts, CC round count, and wall-clock split by stage.
  *
  * Purpose: turn SCALE.md's 100 TB design argument into data — the
  * claim is (a) CC rounds stay O(log diameter) as the corpus grows,
  * and (b) pair-stage wall-clock tracks the candidate volume, not the
  * all-pairs square. The 5× corpus replicates every doc with fresh
  * doc_ids, so each original near-dup pair becomes a 5×5 clique-cross
  * and every doc gains 4 exact copies — pair volume grows ~25× while
  * docs grow 5×, a deliberately adversarial densification (components
  * get BIGGER, not just more numerous).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleSmoke
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = sources.Tables.documents(spark, sfDir)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L

    def scaledDir(factor: Int): String = {
      if (factor == 1) return sfDir
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scale_${factor}x")
      val copies = (0 until factor).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * maxId))
      }.reduce(_ unionByName _)
      copies.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir.toString
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // unmeasured warmup: JIT/codegen/shuffle machinery bills to nobody,
    // or the 1x point pays the whole JVM cold start and the curve lies
    {
      val w = queries.Pipeline.minhashPairs(spark, sfDir)
        .select(col("da"), col("db")).persist()
      ops.Dedup.connectedComponents(w, "da", "db").count()
      w.unpersist()
      spark.catalog.clearCache()
    }

    for (factor <- Seq(1, 5)) {
      val dir = scaledDir(factor)
      val nDocs = sources.Tables.documents(spark, dir).count()
      val (pairs, pairSec) = timed {
        val p = queries.Pipeline.minhashPairs(spark, dir)
          .select(col("da"), col("db")).persist()
        p.count() // materialize: bill pair generation to this stage only
        p
      }
      val nPairs = pairs.count()
      val ((comps, rounds), ccSec) = timed {
        val (c, r) = ops.Dedup.connectedComponentsWithRounds(pairs, "da", "db")
        c.count() // checkpoint-backed: already materialized, count is cheap
        (c, r)
      }
      val nClusters = comps.select(col("cluster_rep")).distinct().count()
      val largest = comps.groupBy(col("cluster_rep")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head.getLong(0)
      pairs.unpersist()
      println(s"""{"metric":"dedup_scale","factor":$factor,"docs":$nDocs,"pairs":$nPairs,""" +
        s""""cc_rounds":$rounds,"clusters":$nClusters,"largest_cluster":$largest,""" +
        s""""pair_stage_sec":${f"$pairSec%.2f"},"cc_stage_sec":${f"$ccSec%.2f"}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
