package graft

import org.apache.spark.sql.functions._
import graft.ops.{IndexStore, KMeans}
import graft.queries.Pipeline
import graft.sources.Tables

/** Persistent index store (r19 verdict #3): trained artifacts save as
  * versioned parquet and LOAD-EQUALS-TRAIN — the p22 routed search and
  * the p30 incremental dedup produce bit-identical output from a
  * loaded index and from their own training run. Plus the refusal
  * surface: torn saves (no commit marker), kind mismatches, and
  * format-version drift all fail loudly. */
class IndexStoreSpec extends SparkSuite {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/idx"

  test("kmeans model round-trips bit-for-bit (centroids, sizes, seeds, objective, degenerate)") {
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val m = KMeans.fit(e, "vec_id", "embedding", Pipeline.kmK, Pipeline.kmIters,
      forceKernel = true)
    val path = tmp("graft_idx_km")
    IndexStore.saveKMeans(spark, m, path)
    val l = IndexStore.loadKMeans(spark, path)
    assert(l.centroids.map(_.toSeq).toSeq == m.centroids.map(_.toSeq).toSeq)
    assert(l.sizes.toSeq == m.sizes.toSeq && l.seedIds.toSeq == m.seedIds.toSeq)
    assert(l.objective.toSeq == m.objective.toSeq && l.degenerate == m.degenerate)
  }

  test("p22 search from a LOADED index equals the training gate's output; membership reads prune by list") {
    graft.expressions.VectorExpressions.register(spark)
    val trained = Pipeline.p22.fn(spark, sf).collect().map(_.toSeq).toSeq
    assert(trained.nonEmpty)
    // the offline index build: the same trainer the gate runs
    val e0 = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).persist()
    val model = KMeans.fit(e0, "vec_id", "embedding", Pipeline.kmK, Pipeline.kmIters,
      forceKernel = true)
    val lists = KMeans.assign(e0, "embedding", model, forceKernel = true)
      .select(col("vec_id"), col("cluster").as("list_id"))
    val mPath = tmp("graft_idx_p22m")
    val lPath = tmp("graft_idx_p22l")
    IndexStore.saveKMeans(spark, model, mPath)
    IndexStore.saveMembership(lists, lPath, Pipeline.kmK)
    // the serving run: LOAD instead of training, same search plan
    val lm = IndexStore.loadKMeans(spark, mPath)
    val (ll, k) = IndexStore.loadMembership(spark, lPath)
    assert(k == Pipeline.kmK)
    val loaded = Pipeline.trainedIvfSearch(e0, lm, ll).collect().map(_.toSeq).toSeq
    assert(loaded == trained,
      "search from the loaded index must equal the self-trained gate's output")
    // the membership layout is partitioned BY list_id: a probe-time
    // read of one list is a partition-pruned scan, never O(corpus)
    val plan = ll.filter(col("list_id") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"probing a list must prune membership partitions:\n${plan.take(1200)}")
    e0.unpersist()
  }

  test("p30 incremental dedup from a LOADED corpus index equals the self-trained gate") {
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)) // -1.0: NaN breaks tuple ==
    }.toSeq
    val want = canon(Pipeline.p30.fn(spark, sf).collect())
    assert(want.nonEmpty)
    // offline: build + persist the standing corpus's band and
    // shingle-set tables; bands partition by band_id
    val (bands, shingles) = Pipeline.dedupCorpusIndex(spark, sf)
    val bPath = tmp("graft_idx_bands")
    val sPath = tmp("graft_idx_shingles")
    IndexStore.save(bands, bPath, "minhash_bands",
      Map("bands" -> "2", "rows_per_band" -> "4"), partitionCols = Seq("band_id"))
    IndexStore.save(shingles, sPath, "shingle_sets")
    // per-ingest: load the index, dedup the increment against it
    val (lb, bParams) = IndexStore.load(spark, bPath, "minhash_bands")
    assert(bParams("bands") == "2")
    val (ls, _) = IndexStore.load(spark, sPath, "shingle_sets")
    val got = canon(Pipeline.incrementalDedupAgainst(spark, sf,
      lb.select(col("db"), col("band_id").cast("int").as("band_id"), col("band_val")),
      ls).collect())
    assert(got == want,
      "incremental dedup against the loaded index must equal the self-trained p30 gate")
  }

  test("whitening transform round-trips; apply-from-loaded equals the self-trained whitening bit-for-bit") {
    val w = Pipeline.whiteningFit(spark, sf)
    val path = tmp("graft_idx_whiten")
    IndexStore.saveWhitening(spark, w, path)
    val lw = IndexStore.loadWhitening(spark, path)
    assert(lw.mu.toSeq == w.mu.toSeq && lw.v1.toSeq == w.v1.toSeq &&
      lw.v2.toSeq == w.v2.toSeq && lw.g1 == w.g1 && lw.g2 == w.g2)
    // the serving contract: conditioning under the LOADED transform is
    // bit-identical to the training run's own whitening — queries and
    // corpus must live in one metric
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).sortBy(_._1).toSeq
    val trained = canon(Pipeline.whitenedEmbeddings(spark, sf))
    val raw = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val loaded = canon(Pipeline.whitenApply(raw, lw))
    assert(loaded == trained,
      "whitening under the loaded transform must equal the self-trained run")
  }

  test("pq codebook round-trips; torn saves, kind mismatches, and version drift refuse loudly") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))").as("embedding"))
    val cb = Pipeline.pqCodebook(e)
    val path = tmp("graft_idx_pq")
    IndexStore.savePqCodebook(spark, cb, path)
    val l = IndexStore.loadPqCodebook(spark, path)
    assert(l.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    // kind mismatch: a pq codebook is not a kmeans model
    val e1 = intercept[IllegalArgumentException] { IndexStore.loadKMeans(spark, path) }
    assert(e1.getMessage.contains("pq_codebook") && e1.getMessage.contains("kmeans_model"))
    // torn save: data without the meta commit marker refuses
    val torn = tmp("graft_idx_torn")
    spark.range(3).write.parquet(s"$torn/data")
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.load(spark, torn, "pq_codebook")
    }
    assert(e2.getMessage.contains("no index meta"), e2.getMessage)
    // format-version drift refuses (doctor the marker to a future
    // version; rows are literals, so the self-overwrite is safe)
    val vPath = tmp("graft_idx_ver")
    IndexStore.save(spark.range(3).toDF(), vPath, "whatever")
    val metaSchema = spark.read.parquet(s"$vPath/meta").schema
    val old = spark.read.parquet(s"$vPath/meta").collect()(0)
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(99, old.getString(1),
        old.getMap[String, String](2))), metaSchema)
      .write.mode("overwrite").parquet(s"$vPath/meta")
    val e3 = intercept[IllegalArgumentException] {
      IndexStore.load(spark, vPath, "whatever")
    }
    assert(e3.getMessage.contains("format version 99"), e3.getMessage)
  }

  test("maintainData swaps the commit marker around in-place writes: a crash mid-write leaves a load-refusing index") {
    val path = tmp("graft_idx_maint")
    IndexStore.save(spark.range(5).toDF("vec_id"), path, "some_kind", Map("p" -> "1"))
    // maintenance on an uncommitted tree refuses
    val e0 = intercept[IllegalArgumentException] {
      IndexStore.maintainData(spark, tmp("graft_idx_none"), "some_kind") {}
    }
    assert(e0.getMessage.contains("no committed index"), e0.getMessage)
    // kind mismatch refuses BEFORE touching the marker
    val eK = intercept[IllegalArgumentException] {
      IndexStore.maintainData(spark, path, "other_kind") {}
    }
    assert(eK.getMessage.contains("some_kind") && eK.getMessage.contains("other_kind"))
    assert(IndexStore.load(spark, path, "some_kind")._2 == Map("p" -> "1"),
      "a refused maintenance call must leave the artifact committed")
    // crash mid-write: the marker is already gone, so the torn tree refuses
    val boom = intercept[RuntimeException] {
      IndexStore.maintainData(spark, path, "some_kind") {
        spark.range(1).write.mode("overwrite").parquet(s"$path/data")
        throw new RuntimeException("simulated crash between data and marker")
      }
    }
    assert(boom.getMessage.contains("simulated crash"))
    val torn = intercept[IllegalArgumentException] {
      IndexStore.load(spark, path, "some_kind")
    }
    assert(torn.getMessage.contains("no index meta"), torn.getMessage)
    // the repair (what a replayed batch does FIRST): recoverMaintenance
    // restores the marker from its maintenance-aside copy, the load
    // works again, and the replayed maintenance write completes —
    // no manual re-seed, no replay deadlock
    IndexStore.recoverMaintenance(spark, path)
    assert(IndexStore.load(spark, path, "some_kind")._2 == Map("p" -> "1"),
      "recovery must restore the marker verbatim")
    IndexStore.maintainData(spark, path, "some_kind") {
      spark.range(7).toDF("vec_id").write.mode("overwrite").parquet(s"$path/data")
    }
    val (df, params) = IndexStore.load(spark, path, "some_kind")
    assert(params == Map("p" -> "1"), "maintenance must restore the marker verbatim")
    assert(df.count() == 7, "the maintained data tree is the one served")
    // recoverMaintenance is a no-op on a committed artifact
    IndexStore.recoverMaintenance(spark, path)
    assert(IndexStore.load(spark, path, "some_kind")._2 == Map("p" -> "1"))
    // torn MARKER REWRITE: meta dir exists but is unreadable while the
    // aside still holds the good copy — recovery must restore from the
    // aside, not discard it because "meta exists"
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/meta"),
      new org.apache.hadoop.fs.Path(s"$path/meta.maintenance"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/meta"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/meta/part-torn.parquet"),
      "not parquet".getBytes)
    IndexStore.recoverMaintenance(spark, path)
    assert(IndexStore.load(spark, path, "some_kind")._2 == Map("p" -> "1"),
      "recovery must restore the readable marker over a torn rewrite")
  }
}
