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

  /** The one loader dispatch: routes tables that need adaptive
    * handling (`events`) through their dedicated loader, everything
    * else through the plain scan. Every generic by-name load path
    * (SQL view registration, bench warmup, schema pins) goes through
    * here so the next table that grows a vintage can't be missed in a
    * hand-rolled `if` at some call site. */
  def loadAny(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else load(spark, dir, name)

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet vintages, so this loader is
    * schema-adaptive (the r14 harness regen flipped the encoding under
    * us and killed 21/75 oracle queries — never assume one vintage):
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it at schema inference
    *    (PARQUET_TYPE_ILLEGAL) unless `legacy.parquet.nanosAsLong`
    *    reads it as raw INT64; we then truncate to µs with integer
    *    `div` (epoch nanos ≈ 1.7e18 exceeds double's 53-bit mantissa)
    *    — the same truncation DuckDB applies (its TIMESTAMP is µs),
    *    keeping oracle parity (SURVEY §7.4 trap 2).
    *  - TIMESTAMP_MICROS isAdjustedToUTC=false: Spark 4 loads it
    *    natively as TIMESTAMP_NTZ; cast to session-TZ `timestamp`
    *    (all graft sessions pin UTC) so downstream schemas stay
    *    TimestampType and the instants match DuckDB's naive reading.
    *
    * The nanos conf is only set on the fallback path — and must stay
    * set for that session: parquet scans consult the SQL conf at
    * execution, not DataFrame construction, so a save/restore here
    * would break the lazy read. The native path never touches it. */
  def events(s: SparkSession, d: String): DataFrame =
    adaptEventsTs(loadEventsRaw(s, s"$d/events.parquet"))

  /** Vintage-aware raw read of an events parquet path (batch). Sets the
    * legacy nanos conf ONLY when the footer demands it. */
  def loadEventsRaw(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(path)
    catch {
      case e: Exception if parquetTypeCondition(e).isDefined =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }

  /** The condition (Spark's stable error-class API, `SparkThrowable
    * .getCondition`) that marks a footer type Spark refuses to infer —
    * TIMESTAMP(NANOS) surfaces as PARQUET_TYPE_ILLEGAL. Keyed on the
    * condition name, NOT the rendered message: message text is
    * localized/reworded across releases, the condition is the contract
    * (SourcesSpec pins the name against the nanos fixture). Walks the
    * cause chain because the reader may wrap the typed error. */
  private[graft] def parquetTypeCondition(t: Throwable): Option[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).collectFirst {
      case st: org.apache.spark.SparkThrowable
          if st.getCondition != null && st.getCondition.startsWith("PARQUET_TYPE") =>
        st.getCondition
    }

  /** Vintage-adaptive events FILE STREAM over a directory of events
    * parquet files. Streaming sources need an explicit schema, so the
    * raw (pre-adapt) schema is probed batch-side from the same files —
    * hard-coding either vintage here is exactly the r14 break, just on
    * the streaming path (the parity suites used to do it inline). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val raw = loadEventsRaw(s, dir)
    adaptEventsTs(s.readStream.schema(raw.schema).parquet(dir))
  }

  /** Normalize a raw `ts` column of EITHER vintage to session-TZ
    * `timestamp`. Works on batch AND streaming frames (the streaming
    * parity suites feed it a `readStream` over the same files), so the
    * two paths can never disagree on what an event timestamp means. */
  def adaptEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other => throw new IllegalStateException(
        s"[graft] events.ts loaded as unsupported type $other — " +
          "expected TIMESTAMP, TIMESTAMP_NTZ (micros vintage) or INT64 (nanos vintage)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works as the
    * generic query front door (reference's `query` passthrough,
    * `/root/reference/src/database/postgresql/PostgresPg.ts:5-14`).
    * `events` goes through its ns-handling loader. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => loadAny(spark, dir, n).createOrReplaceTempView(n))
}
