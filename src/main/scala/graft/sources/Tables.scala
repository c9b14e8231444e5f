package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch table loaders over the harness parquet layout (TESTDATA.md).
  *
  * Mirrors the reference's batch snapshot scan
  * (`/root/reference/src/database/postgresql/PostgresOperation.ts:69-86`,
  * a full-table `SELECT * FROM students`) re-expressed as a parquet
  * `spark.read` so Catalyst column pruning / predicate pushdown apply —
  * the reference ships every column and filters in-process; we let the
  * scan do it.
  *
  * Scale note: all loaders return a lazy DataFrame over the parquet
  * footer schema — no driver-side materialization. On a real cluster the
  * same call reads a partitioned directory; nothing here assumes
  * single-file input.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The small dimension tables worth a broadcast hint at any scale. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and truncate to µs —
    * the same truncation DuckDB applies (its TIMESTAMP is µs), keeping
    * oracle parity (SURVEY §7.4 trap 2). Integer `div` (not `/`): epoch
    * nanos ≈ 1.7e18 exceeds double's 53-bit mantissa. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works as the
    * generic query front door (reference's `query` passthrough,
    * `/root/reference/src/database/postgresql/PostgresPg.ts:5-14`).
    * `events` goes through its ns-handling loader. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
