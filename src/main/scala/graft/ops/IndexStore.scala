package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deflation-trained two-axis whitening transform (the p50/p51
  * conditioner): per-dim means, the two dominant unit directions, and
  * their rescale gains g_i = round(1/round(√λ_i, 6) − 1, 6). A
  * production retrieval service trains this once at index build and
  * whitens every stored vector AND every query with the SAME stored
  * transform — mixing two transforms silently corrupts the serving
  * metric, which is why it is a first-class [[IndexStore]] artifact. */
final case class Whitening(mu: Array[Double], v1: Array[Double],
    v2: Array[Double], g1: Double, g2: Double) {
  require(mu.length == v1.length && v1.length == v2.length,
    "[graft] whitening arrays disagree on dimension")
}

/** Persistent store for TRAINED retrieval/dedup artifacts — the
  * "train once, serve many" half of the index story the ANN/dedup
  * gates (p22/p24/p30/p36/p48/p51) leave implicit by retraining per
  * run. A 100 TB pipeline builds its coarse quantizer, PQ codebook,
  * IVF membership lists, and MinHash band tables in an OFFLINE job and
  * every query/ingest run LOADS them; this object is that boundary,
  * kept deliberately parquet-native so the artifacts are themselves
  * queryable tables (the p30 claim: "the corpus band table IS the
  * persistent index").
  *
  * Layout per artifact: `<path>/data` (the parquet payload, optionally
  * partitioned — membership lists partition by `list_id` so a probe
  * read prunes to the probed lists) and `<path>/meta` (a one-row
  * parquet: format version, artifact kind, free-form string params).
  * The meta is written LAST and required on load: its presence is the
  * COMMIT MARKER, so a crash mid-save leaves an index that loudly
  * refuses to load instead of serving a torn artifact. Loads validate
  * kind and format version and refuse loudly on mismatch — an index
  * written by a newer layout must never be silently misread.
  *
  * IndexStoreSpec pins load-equals-train end-to-end: the p22 routed
  * search and the p30 incremental dedup produce bit-identical output
  * from a loaded index and from their own training run.
  */
object IndexStore {

  /** Bump when the on-disk layout changes shape. */
  val formatVersion = 1

  private def metaSchema = StructType(Seq(
    StructField("format_version", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("params", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** Save any index table under the commit-marker protocol. */
  def save(df: DataFrame, path: String, kind: String,
      params: Map[String, String] = Map.empty,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // RE-saves must first INVALIDATE the previous commit marker: the
    // data overwrite below deletes the old payload before the new one
    // lands, and a crash mid-write would otherwise leave the STALE
    // meta validating torn data — the exact silent read the marker
    // protocol exists to refuse.
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) fs.delete(metaPath, true)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$path/data")
    // meta LAST — the commit marker
    spark.createDataFrame(
      java.util.List.of(Row(formatVersion, kind, params)), metaSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Invalidate-then-recommit wrapper for IN-PLACE maintenance writes
    * to an existing artifact's `data` tree (the streaming index
    * maintainers append/overwrite partitions without rewriting the
    * whole artifact): the commit marker is renamed ASIDE (to
    * `meta.maintenance`) before the write and rewritten verbatim after
    * it, mirroring [[save]]'s marker-swap discipline — a crash
    * mid-write leaves an index that loudly refuses to [[load]] instead
    * of a stale marker validating torn data for a concurrent serving
    * reader. The aside copy is what makes the refusal RECOVERABLE by
    * the maintainer itself: the stream's replayed batch calls
    * [[recoverMaintenance]] before its loads, restores the marker, and
    * rewrites the same partitions idempotently (delete-instead-of-
    * rename would deadlock the replay — the replaying batch loads the
    * artifact it just un-committed). Requires a committed artifact of
    * the given kind at `path`. */
  def maintainData(spark: SparkSession, path: String, kind: String)(write: => Unit): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val asidePath = new org.apache.hadoop.fs.Path(s"$path/meta.maintenance")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"[graft] maintenance write to $path, but no committed index there (missing meta) — " +
        "seed the artifact with save() first, or run recoverMaintenance if a " +
        "maintenance write crashed here")
    val m = spark.read.parquet(s"$path/meta").collect()
    require(m.length == 1, s"[graft] corrupt index meta at $path/meta: ${m.length} rows")
    require(m(0).getString(1) == kind,
      s"[graft] index at $path holds a '${m(0).getString(1)}' artifact, maintenance expected '$kind'")
    if (fs.exists(asidePath)) fs.delete(asidePath, true) // stale aside from a recovered crash
    require(fs.rename(metaPath, asidePath),
      s"[graft] could not move the commit marker aside at $path — refusing to write over a committed index")
    write
    spark.createDataFrame(java.util.List.of(m(0)), metaSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    fs.delete(asidePath, true)
  }

  /** Crash recovery for [[maintainData]]: when the marker is missing
    * but its maintenance-aside copy exists, a maintenance write died
    * between un-commit and re-commit — restore the marker so the
    * replayed batch can load the artifact and rewrite the same
    * partitions (idempotent by the maintainers' contract). Call this
    * at the TOP of a maintenance batch body, before any [[load]].
    * No-op when the artifact is committed (a leftover aside is
    * deleted) or when neither marker exists. */
  def recoverMaintenance(spark: SparkSession, path: String): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val asidePath = new org.apache.hadoop.fs.Path(s"$path/meta.maintenance")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(asidePath)) return // nothing in flight — committed or never saved
    // only discard the aside when the marker it backs up is READABLE:
    // a crash DURING the marker rewrite can leave a torn meta dir next
    // to the aside, and deleting the aside then would destroy the only
    // good copy
    val metaValid = fs.exists(metaPath) &&
      (try spark.read.parquet(s"$path/meta").collect().length == 1
       catch { case scala.util.control.NonFatal(_) => false })
    if (metaValid) fs.delete(asidePath, true)
    else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[graft] recovering a crashed maintenance write at $path — restoring the " +
          "commit marker; the replayed batch rewrites the touched partitions")
      if (fs.exists(metaPath)) fs.delete(metaPath, true) // torn rewrite
      require(fs.rename(asidePath, metaPath),
        s"[graft] could not restore the commit marker at $path")
    }
  }

  /** Load an index table, validating kind + format version against the
    * commit marker. Returns (data, params). */
  def load(spark: SparkSession, path: String, kind: String): (DataFrame, Map[String, String]) = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"[graft] no index meta at $path/meta — either nothing was saved here or a " +
        "save crashed before its commit marker; rebuild the index")
    val m = spark.read.parquet(s"$path/meta").collect()
    require(m.length == 1, s"[graft] corrupt index meta at $path/meta: ${m.length} rows")
    val ver = m(0).getInt(0)
    val k = m(0).getString(1)
    require(ver == formatVersion,
      s"[graft] index at $path has format version $ver, this engine reads $formatVersion — rebuild or migrate")
    require(k == kind,
      s"[graft] index at $path holds a '$k' artifact, caller asked for '$kind'")
    (spark.read.parquet(s"$path/data"), m(0).getMap[String, String](2).toMap)
  }

  // ---- k-means / IVF coarse quantizer ----------------------------------

  /** One row per cluster: (cluster, centroid, size, seed_id); the
    * training trajectory's objective and the degenerate count ride the
    * params map, so a loaded model is indistinguishable from its
    * training run. */
  def saveKMeans(spark: SparkSession, model: KMeans.Model, path: String): Unit = {
    val schema = StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("seed_id", LongType, nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    model.centroids.indices.foreach { j =>
      rows.add(Row(j, model.centroids(j).toSeq, model.sizes(j), model.seedIds(j)))
    }
    save(spark.createDataFrame(rows, schema), path, "kmeans_model", Map(
      "k" -> model.centroids.length.toString,
      "dim" -> model.centroids.head.length.toString,
      "objective" -> model.objective.mkString(","),
      "degenerate" -> model.degenerate.toString))
  }

  def loadKMeans(spark: SparkSession, path: String): KMeans.Model = {
    val (df, params) = load(spark, path, "kmeans_model")
    val rows = df.orderBy(col("cluster")).collect() // K rows — bounded driver state
    val k = params("k").toInt
    require(rows.length == k,
      s"[graft] kmeans index at $path: meta says k=$k but data has ${rows.length} clusters")
    val dim = params("dim").toInt
    val cents = rows.map(_.getSeq[Double](1).toArray)
    require(cents.forall(_.length == dim),
      s"[graft] kmeans index at $path: centroid dimension disagrees with meta dim=$dim")
    KMeans.Model(
      cents,
      rows.map(_.getLong(2)),
      rows.map(_.getLong(3)),
      if (params("objective").isEmpty) Array.empty[Double]
      else params("objective").split(",").map(_.toDouble),
      params("degenerate").toLong)
  }

  // ---- IVF membership lists --------------------------------------------

  /** The corpus→list assignment `(vec_id, list_id)`, partitioned BY
    * `list_id`: a probe-time read of the probed lists is a
    * partition-pruned scan, never O(corpus). */
  def saveMembership(lists: DataFrame, path: String, k: Int): Unit = {
    require(lists.columns.map(_.toLowerCase).toSet == Set("vec_id", "list_id"),
      s"[graft] membership index expects (vec_id, list_id), got ${lists.columns.mkString(",")}")
    save(lists, path, "ivf_membership", Map("k" -> k.toString),
      partitionCols = Seq("list_id"))
  }

  def loadMembership(spark: SparkSession, path: String): (DataFrame, Int) = {
    val (df, params) = load(spark, path, "ivf_membership")
    // partition columns come back last and typed by the directory
    // names — normalize to the saved shape
    (df.select(col("vec_id"), col("list_id").cast("int").as("list_id")),
      params("k").toInt)
  }

  // ---- whitening transform ----------------------------------------------

  /** One row per dimension: (i, mu, v1, v2); the scalar gains ride the
    * params map. */
  def saveWhitening(spark: SparkSession, w: Whitening, path: String): Unit = {
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("mu", DoubleType, nullable = false),
      StructField("v1", DoubleType, nullable = false),
      StructField("v2", DoubleType, nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    w.mu.indices.foreach(i => rows.add(Row(i, w.mu(i), w.v1(i), w.v2(i))))
    save(spark.createDataFrame(rows, schema), path, "whitening", Map(
      "dim" -> w.mu.length.toString,
      "g1" -> w.g1.toString, "g2" -> w.g2.toString))
  }

  def loadWhitening(spark: SparkSession, path: String): Whitening = {
    val (df, params) = load(spark, path, "whitening")
    val dim = params("dim").toInt
    val rows = df.orderBy(col("i")).collect() // dim rows — bounded driver state
    require(rows.length == dim,
      s"[graft] whitening index at $path: meta says dim=$dim, data has ${rows.length} rows")
    Whitening(
      rows.map(_.getDouble(1)), rows.map(_.getDouble(2)), rows.map(_.getDouble(3)),
      params("g1").toDouble, params("g2").toDouble)
  }

  // ---- PQ codebook -------------------------------------------------------

  /** M×K'×(d/M) codebook as (m, j, sub) rows. */
  def savePqCodebook(spark: SparkSession, cb: Array[Array[Array[Double]]], path: String): Unit = {
    val schema = StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sub", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    cb.indices.foreach(m => cb(m).indices.foreach(j => rows.add(Row(m, j, cb(m)(j).toSeq))))
    save(spark.createDataFrame(rows, schema), path, "pq_codebook", Map(
      "m" -> cb.length.toString,
      "kprime" -> cb.head.length.toString,
      "sub" -> cb.head.head.length.toString))
  }

  def loadPqCodebook(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val (df, params) = load(spark, path, "pq_codebook")
    val (m, kp, sub) = (params("m").toInt, params("kprime").toInt, params("sub").toInt)
    val rows = df.collect() // M×K' rows — bounded driver state
    require(rows.length == m * kp,
      s"[graft] pq codebook at $path: meta says ${m}x$kp entries, data has ${rows.length}")
    val cb = Array.ofDim[Array[Double]](m, kp)
    rows.foreach { r =>
      val arr = r.getSeq[Double](2).toArray
      require(arr.length == sub,
        s"[graft] pq codebook at $path: subvector length ${arr.length} != meta sub=$sub")
      cb(r.getInt(0))(r.getInt(1)) = arr
    }
    require(cb.forall(_.forall(_ != null)),
      s"[graft] pq codebook at $path: missing (m, j) entries")
    cb.map(_.toArray)
  }
}
