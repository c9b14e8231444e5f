package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC batch snapshot source/sink — the reference's initial-load path
  * (`/root/reference/src/database/postgresql/PostgresOperation.ts:69-86`:
  * a full-table `SELECT * FROM students` pulled through an async row
  * iterator and materialized to a driver-side array) re-expressed as
  * Spark's JDBC relation, which it explicitly is not:
  *
  *  - the scan is an executor-side relation, never a driver array —
  *    a 100 TB snapshot streams through the cluster, not the driver;
  *  - [[snapshotPartitioned]] splits the pull into range predicates
  *    (`WHERE col >= lo AND col < hi`), one connection per partition —
  *    the parallel-ingest shape; a single-connection read (the
  *    reference's, and [[snapshot]] without partitioning options) is
  *    bottlenecked on one socket no matter the cluster size;
  *  - filters and column pruning push into the remote SQL (asserted in
  *    JdbcSpec): the database ships matching rows of selected columns,
  *    not the table.
  *
  * Exercised in-harness against EMBEDDED Derby (in-JVM, zero network,
  * ships with Spark for the Hive metastore — JdbcSpec); against
  * Postgres the wiring is the same API with `url = "jdbc:postgresql:…"`
  * and the pg driver on the classpath.
  */
object Jdbc {

  /** Whole-table snapshot over one connection (the reference's shape,
    * minus the driver materialization). Fine for dimension-sized
    * tables; use [[snapshotPartitioned]] for anything big. */
  def snapshot(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(props).load()

  /** Range-partitioned parallel snapshot: `numPartitions` concurrent
    * range scans on `partitionColumn` (numeric/date/timestamp). Bounds
    * only shape the split points — rows OUTSIDE [lower, upper) still
    * arrive, in the two edge partitions — so a stale bound estimate
    * skews parallelism, never correctness. */
  def snapshotPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(props).load()

  /** JDBC sink: each partition writes over its own connection in
    * batched inserts (`batchsize`, default 1000). `Overwrite` drops and
    * recreates (or truncates, with `truncate=true`) — schema authority
    * stays with the DataFrame; `Append` trusts the existing table. */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
      props: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(props).mode(mode).save()
}
