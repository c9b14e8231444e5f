package graft

import org.apache.spark.sql.functions._
import graft.cdc.{Envelope, Fixture}
import graft.streaming.Streams
import java.nio.file.Files

/** Pins for the BUCKET-PARTITIONED CDC state layout
  * (`Streams.materializeCdc(statePartitions = n)`):
  *
  *  - content equivalence with the unpartitioned layout in both
  *    transport modes (the layout is an optimization, never semantics),
  *  - the scale property itself: a batch must NOT rewrite buckets it
  *    does not touch (file names + mtimes pinned byte-stable),
  *  - the sink binding refuses a bucket-count flip on an existing
  *    checkpoint (a flip would re-route keys across dirs),
  *  - one-shot migration of a pre-partitioned state dir.
  */
class PartitionedStateSpec extends SparkSuite {

  private def quiesce(): Unit = {
    var waited = 0
    while (spark.streams.active.nonEmpty && waited < 10000) {
      Thread.sleep(100); waited += 100
    }
  }

  /** Layout-independent canonical rows: bucket col dropped, columns
    * sorted by name (partition columns list last on read), full sort. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.filterNot(_ == "graft_bucket").sorted.map(col)
    df.select(cols: _*).orderBy(cols: _*).collect().map(_.toString).toSeq
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned state equals unpartitioned state (ordered chunk replay)") {
    val in = Fixture.materializeChunks(6)
    val stA = tmp("graft_ps_a") + "/students"
    Streams.materializeCdc(Streams.envelopeStream(spark, in),
      tmp("graft_ps_cka"), stA).awaitTermination()
    quiesce()
    val stB = tmp("graft_ps_b") + "/students"
    Streams.materializeCdc(Streams.envelopeStream(spark, in),
      tmp("graft_ps_ckb"), stB, statePartitions = 8).awaitTermination()
    quiesce()
    assert(new java.io.File(stB).list().exists(_.startsWith("graft_bucket=")),
      "partitioned run must lay out bucket dirs")
    assert(canon(spark.read.parquet(stB)) == canon(spark.read.parquet(stA)),
      "partitioning must not change state content")
    // the reader-facing surface hides the layout detail
    assert(!Streams.cdcLiveState(spark, stB).columns.contains("graft_bucket"))
  }

  test("partitioned CAS state converges like unpartitioned under reversed delivery") {
    // reversed per-chunk delivery: the CAS (LSN compare-and-swap) merge
    // must converge to the same live rows in both layouts
    def reversedChunks(): String = {
      val dir = Files.createTempDirectory("graft_ps_rev")
      val lines = Fixture.jsonLines.reverse
      val per = math.max(1, lines.size / 5)
      val t0 = System.currentTimeMillis() - 60000L
      lines.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
        val f = dir.resolve(f"chunk_$i%04d.jsonl")
        Files.write(f, chunk.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        f.toFile.setLastModified(t0 + i * 2000L)
      }
      dir.toString
    }
    val stA = tmp("graft_ps_casa") + "/students"
    Streams.materializeCdc(Streams.envelopeStream(spark, reversedChunks()),
      tmp("graft_ps_ckca"), stA, orderedTransport = false).awaitTermination()
    quiesce()
    val stB = tmp("graft_ps_casb") + "/students"
    Streams.materializeCdc(Streams.envelopeStream(spark, reversedChunks()),
      tmp("graft_ps_ckcb"), stB, orderedTransport = false, statePartitions = 5)
      .awaitTermination()
    quiesce()
    assert(canon(Streams.cdcLiveState(spark, stB)) == canon(Streams.cdcLiveState(spark, stA)),
      "CAS live rows must match across layouts")
  }

  test("a batch rewrites ONLY the buckets it touches") {
    val dir = Files.createTempDirectory("graft_ps_inc")
    var mtime = System.currentTimeMillis() - 120000L
    var chunkNo = 0
    def deliver(lines: String*): Unit = {
      val f = dir.resolve(f"chunk_$chunkNo%04d.jsonl")
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
      mtime += 2000L; chunkNo += 1
    }
    def ins(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "fn$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def upd(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "update", "table": "students", "new": {"id": $id, "first_name": "UPD$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 2}}"""
    val ckpt = tmp("graft_ps_ckinc")
    val state = tmp("graft_ps_stinc") + "/students"
    deliver((1L to 24L).map(i => ins(f"0/${i * 16}%08X", i)): _*)
    Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    // per-bucket file inventory (name -> length, mtime) before batch 2
    def inventory(): Map[String, Map[String, (Long, Long)]] =
      new java.io.File(state).listFiles().filter(_.getName.startsWith("graft_bucket="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> (f.length(), f.lastModified())).toMap).toMap
    val before = inventory()
    assert(before.size > 1, s"24 keys over 8 buckets should occupy >1 bucket, got ${before.size}")
    val touchedBucket = "graft_bucket=" + spark.read.parquet(state)
      .filter(col("id") === 1L).select(col("graft_bucket")).head().get(0)
    deliver(upd(f"0/${25L * 16}%08X", 1L))
    Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    val after = inventory()
    assert(after(touchedBucket) != before(touchedBucket),
      s"the touched bucket $touchedBucket must be rewritten")
    for ((bucket, files) <- before if bucket != touchedBucket)
      assert(after(bucket) == files,
        s"untouched bucket $bucket was rewritten — the partitioned layout lost its point")
    // and the update actually landed (A5 projection renames to camelCase)
    assert(spark.read.parquet(state).filter(col("id") === 1L)
      .select(col("firstName")).head().getString(0) == "UPD1")
  }

  test("sink binding refuses a bucket-count flip on an existing checkpoint") {
    val dir = Files.createTempDirectory("graft_ps_flip")
    var mtime = System.currentTimeMillis() - 120000L
    var chunkNo = 0
    def deliver(lines: String*): Unit = {
      val f = dir.resolve(f"chunk_$chunkNo%04d.jsonl")
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
      mtime += 2000L; chunkNo += 1
    }
    def ins(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "fn$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    val ckpt = tmp("graft_ps_ckflip")
    val state = tmp("graft_ps_stflip") + "/students"
    deliver(ins("0/00000010", 1L))
    Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    deliver(ins("0/00000020", 2L)) // a new batch must exist for the binding probe to run
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
        statePartitions = 16).awaitTermination()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("bound to sink"),
      s"count flip must hit the sink-binding refusal, got: ${msgs(failed).take(300)}")
    quiesce()
    // the rightful count continues where it left off
    Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    assert(spark.read.parquet(state).count() == 2L)
  }

  test("partitioned CAS tombstone GC is lazy-per-bucket: compaction waits for the bucket's next touch, never sooner") {
    val dir = Files.createTempDirectory("graft_ps_gc")
    val ckpt = tmp("graft_ps_ckgc")
    val state = tmp("graft_ps_stgc") + "/students"
    var mtime = System.currentTimeMillis() - 120000L
    var chunkNo = 0
    def ins(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "fn$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def upd(lsn: String, id: Long, fn: String) =
      s"""{"lsn": "$lsn", "tag": "update", "table": "students", "new": {"id": $id, "first_name": "$fn", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def del(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "delete", "table": "students", "old": {"id": $id}}"""
    def deliver(lines: String*): Unit = {
      val f = dir.resolve(f"chunk_$chunkNo%04d.jsonl")
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
      mtime += 2000L; chunkNo += 1
      Streams.materializeCdc(Streams.envelopeStream(spark, dir.toString), ckpt, state,
        orderedTransport = false, casTombstoneRetention = 1L, statePartitions = 4)
        .awaitTermination()
      quiesce()
    }
    var lsn = 16L
    def nextLsn(): String = { val s = f"0/$lsn%08X"; lsn += 16L; s }
    // batch 0: keys 1..10 so every bucket is populated
    deliver((1L to 10L).map(i => ins(nextLsn(), i)): _*)
    val bucketOf = spark.read.parquet(state)
      .select(col("id"), col("graft_bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = 1L
    val other = (2L to 10L).find(bucketOf(_) != bucketOf(a)).get  // different bucket
    val sibling = (2L to 10L).find(bucketOf(_) == bucketOf(a)).get // same bucket as a
    def tombstones() = spark.read.parquet(state).filter(col("op") === "D").count()
    // batch 1: delete key a — tombstone stamped arrival batch 1 in bucket(a)
    deliver(del(nextLsn(), a))
    assert(tombstones() == 1L)
    // batches 2 and 3 touch ONLY the other bucket; by batch 3 the
    // tombstone is past the horizon (3 - 1 > 1) but its bucket is
    // never read or rewritten — it must SURVIVE (GC is lazy, the
    // retention bound is a minimum, never an eager sweep)
    deliver(upd(nextLsn(), other, "touch2"))
    deliver(upd(nextLsn(), other, "touch3"))
    assert(tombstones() == 1L,
      "a tombstone in an untouched bucket must survive past the horizon")
    // batch 4 touches bucket(a) via the sibling key — NOW the aged
    // tombstone compacts and the state shrinks by one row
    deliver(upd(nextLsn(), sibling, "touch4"))
    assert(tombstones() == 0L, "first touch after the horizon must compact the tombstone")
    assert(!Streams.cdcLiveState(spark, state).select("id").collect()
      .map(_.getLong(0)).contains(a), "compaction must not resurrect the deleted key")
  }

  test("a pre-partitioned state dir migrates in one full-rewrite batch, then stays partitioned") {
    val in = Fixture.materializeChunks(4)
    val state = tmp("graft_ps_stmig") + "/students"
    // phase 1: legacy unpartitioned layout
    Streams.materializeCdc(Streams.envelopeStream(spark, in),
      tmp("graft_ps_ckm1"), state).awaitTermination()
    quiesce()
    assert(!new java.io.File(state).list().exists(_.startsWith("graft_bucket=")))
    val legacy = canon(spark.read.parquet(state))
    // phase 2: same state dir, partitioned mode (fresh checkpoint —
    // the binding tag correctly treats it as a different sink). The
    // replay re-merges the same images into the existing state: the
    // first applied batch migrates the layout, the rest run incremental.
    Streams.materializeCdc(Streams.envelopeStream(spark, in),
      tmp("graft_ps_ckm2"), state, statePartitions = 8).awaitTermination()
    quiesce()
    assert(new java.io.File(state).list().exists(_.startsWith("graft_bucket=")),
      "migration must leave a bucket-partitioned layout")
    assert(canon(spark.read.parquet(state)) == legacy,
      "migration + idempotent re-merge must preserve state content")
  }

  test("partitioned SCD2 history equals the unpartitioned layout and the batch fold") {
    val in = Fixture.materializeChunks(6)
    val stA = tmp("graft_ps_scd_a") + "/history"
    Streams.materializeScd2(Streams.envelopeStream(spark, in),
      tmp("graft_ps_scd_cka"), stA).awaitTermination()
    quiesce()
    val stB = tmp("graft_ps_scd_b") + "/history"
    Streams.materializeScd2(Streams.envelopeStream(spark, in),
      tmp("graft_ps_scd_ckb"), stB, statePartitions = 8).awaitTermination()
    quiesce()
    assert(new java.io.File(stB).list().exists(_.startsWith("graft_bucket=")),
      "partitioned SCD2 run must lay out bucket dirs")
    assert(canon(spark.read.parquet(stB)) == canon(spark.read.parquet(stA)),
      "partitioning must not change the history content")
    // and both equal the q50-style batch fold of the whole log
    val expected = Envelope.scd2Fold(
      Envelope.project(spark.read.schema(Envelope.schema).json(in))
        .filter(col("tag").isin("insert", "update", "delete"))
        .withColumn("valid_from", Envelope.lsnNumeric(col("lsn")))
        .drop("lsn"))
    assert(canon(spark.read.parquet(stB)) == canon(expected),
      "partitioned incremental history must equal the batch SCD2 replay")
  }

  test("an SCD2 batch rewrites ONLY the buckets it touches") {
    val dir = Files.createTempDirectory("graft_ps_scd_inc")
    var mtime = System.currentTimeMillis() - 120000L
    var chunkNo = 0
    def deliver(lines: String*): Unit = {
      val f = dir.resolve(f"chunk_$chunkNo%04d.jsonl")
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
      mtime += 2000L; chunkNo += 1
    }
    def ins(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "fn$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def upd(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "update", "table": "students", "new": {"id": $id, "first_name": "UPD$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 2}}"""
    val ckpt = tmp("graft_ps_scd_ckinc")
    val state = tmp("graft_ps_scd_stinc") + "/history"
    deliver((1L to 24L).map(i => ins(f"0/${i * 16}%08X", i)): _*)
    Streams.materializeScd2(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    def inventory(): Map[String, Map[String, (Long, Long)]] =
      new java.io.File(state).listFiles().filter(_.getName.startsWith("graft_bucket="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> (f.length(), f.lastModified())).toMap).toMap
    val before = inventory()
    assert(before.size > 1, s"24 keys over 8 buckets should occupy >1 bucket, got ${before.size}")
    val touchedBucket = "graft_bucket=" + spark.read.parquet(state)
      .filter(col("id") === 1L).select(col("graft_bucket")).head().get(0)
    deliver(upd(f"0/${25L * 16}%08X", 1L))
    Streams.materializeScd2(Streams.envelopeStream(spark, dir.toString), ckpt, state,
      statePartitions = 8).awaitTermination()
    quiesce()
    val after = inventory()
    assert(after(touchedBucket) != before(touchedBucket),
      "the touched bucket must be rewritten")
    (before.keySet - touchedBucket).foreach(bucket =>
      assert(after(bucket) == before(bucket),
        s"untouched bucket $bucket was rewritten — the partitioned layout lost its point"))
    // the update SUPERSEDED the open interval: key 1 now has a closed
    // row ending at the update's LSN and a new open row with the image
    val k1 = spark.read.parquet(state).filter(col("id") === 1L)
      .select(col("valid_from"), col("valid_to"), col("firstName"), col("is_current"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2), r.getInt(3))).sortBy(_._1)
    assert(k1.length == 2 && k1(0)._2.contains(k1(1)._1) && k1(0)._4 == 0,
      s"the superseded interval must close where the update opens: ${k1.toSeq}")
    assert(k1(1)._3 == "UPD1" && k1(1)._4 == 1, s"open row must carry the new image: ${k1.toSeq}")
  }
}
