package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.cdc.{Envelope, Fixture}
import graft.queries.Advanced
import graft.sources.Tables
import graft.streaming.Streams

/** Batch/stream parity (SURVEY §5.1/§5.2 Q19-Q20 strategy): every
  * streaming transform, replayed under Trigger.AvailableNow, must equal
  * the batch run of the same DataFrame program. Wall-clock never enters
  * the assertions (§7.4.5).
  */
class StreamingSpec extends SparkSuite {

  /** events.parquet copied into its own dir (a file stream would
    * otherwise pick up every table in the sf dir), read with the raw
    * nanos schema + the same µs truncation as Tables.events. */
  private lazy val eventsStreamDir: String = {
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Vintage-adaptive file stream (Tables.eventsStream probes the
    * on-disk schema batch-side). Hard-coding the INT64-nanos vintage
    * here broke 5 parity tests when the r14 regen flipped events.ts
    * to TIMESTAMP_MICROS NTZ (int64 micros silently read as "nanos"
    * → 1970 windows). */
  private def eventStream: DataFrame = Tables.eventsStream(spark, eventsStreamDir)

  private def rowsOf(name: String): Set[Seq[Any]] =
    spark.table(name).collect().toSet[Row].map(_.toSeq)

  private def batchRows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[Row].map(_.toSeq)

  test("tumbling-window counts: stream equals batch (q20 parity)") {
    Streams.runToMemory(Streams.tumblingCounts(eventStream), "t_tumble", OutputMode.Complete())
      .awaitTermination()
    assert(rowsOf("t_tumble") == batchRows(Advanced.q20.fn(spark, sf)))
  }

  test("session-window counts: stream equals batch (q21 parity)") {
    Streams.runToMemory(Streams.sessionCounts(eventStream), "t_session", OutputMode.Complete())
      .awaitTermination()
    assert(rowsOf("t_session") == batchRows(Advanced.q21.fn(spark, sf)))
  }

  test("sliding-window counts: stream equals batch") {
    Streams.runToMemory(Streams.slidingCounts(eventStream), "t_slide", OutputMode.Complete())
      .awaitTermination()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
    assert(rowsOf("t_slide") == batchRows(batch))
  }

  test("streaming dedup within watermark removes duplicated input") {
    val dir = Files.createTempDirectory("graft_dedup_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("b.parquet"))
    val stream = Tables.eventsStream(spark, dir.toString)
    Streams.runToMemory(
      Streams.dedupWithinWatermark(stream).select(col("event_id")),
      "t_dedup", OutputMode.Append()).awaitTermination()
    val expected = Tables.events(spark, sf).select(col("event_id")).distinct().count()
    assert(spark.table("t_dedup").count() == expected)
  }

  test("mapGroupsWithState: per-user running state equals batch aggregation") {
    Streams.runToMemory(Streams.userStateMachine(eventStream).toDF(),
      "t_state", OutputMode.Update()).awaitTermination()
    val got = spark.table("t_state")
      // Update mode may emit one row per micro-batch per user; the last
      // state per user is the final answer.
      .groupBy(col("userId"))
      .agg(max(col("nEvents")).as("nEvents"), max(col("nErrors")).as("nErrors"))
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id").as("userId"))
      .agg(count(lit(1)).as("nEvents"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("nErrors"))
    assert(batchRows(got) == batchRows(expected))
  }

  test("CDC chunked foreachBatch replay with a duplicated chunk converges to q19 state") {
    val chunkDir = Fixture.materializeChunks(nChunks = 8, duplicateChunk = Some(3))
    val checkpoint = Files.createTempDirectory("graft_cdc_ckpt").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Array[Row]]()
    val q = Streams.runForeachBatch(
      Envelope.project(Streams.envelopeStream(spark, chunkDir)),
      checkpoint,
      (batch, _) => { sink.add(batch.collect()) })
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val replayed = spark.createDataFrame(
      sink.asScala.flatten.toSeq.asJava,
      Envelope.project(spark.read.schema(Envelope.schema).json(Fixture.materialize())).schema)
    val got = batchRows(Envelope.lastImageByKey(replayed).orderBy(col("id")))
    val expected = batchRows(Advanced.q19.fn(spark, sf))
    assert(got == expected)
  }
}
