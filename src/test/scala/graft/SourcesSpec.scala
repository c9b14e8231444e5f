package graft

import org.apache.spark.sql.functions._

/** B.1 source coverage beyond the parquet loaders: CSV and JSON batch
  * scans with explicit schemas (SURVEY §2 B.1 — the reference's
  * envelope is JSON, `customMapper.ts:9`; CSV is charter surface).
  */
class SourcesSpec extends SparkSuite {

  test("CSV batch scan with explicit schema round-trips the orders table") {
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val orig = graft.sources.Tables.orders(spark, sf)
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(orig.schema).option("header", "true").csv(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("JSON batch scan with explicit schema round-trips the nation table") {
    val out = java.nio.file.Files.createTempDirectory("graft_json").toString
    val orig = graft.sources.Tables.nation(spark, sf)
    orig.write.mode("overwrite").json(out)
    val back = spark.read.schema(orig.schema).json(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("ORC batch scan round-trips with predicate pushdown available") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val orig = graft.sources.Tables.customer(spark, sf)
    orig.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    val filtered = back.filter(col("c_custkey") < 10)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("c_custkey"),
      s"ORC scan should carry pushed filters:\n$scan")
  }

  test("PERMISSIVE json scan captures malformed lines in _corrupt_record, keeps good rows") {
    // a 100 TB ingest WILL contain broken lines; the contract is: never
    // fail the job, never silently drop — quarantine with the payload
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      java.util.Arrays.asList(
        """{"id": 1, "name": "ok"}""",
        """{"id": 2, "name": "also ok"}""",
        """{"id": oops not json""",
        """{"id": "3", "name": "wrong type id"}"""))
    val schema = "id LONG, name STRING, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column requires the same scan to serve both filters
    try {
      assert(df.filter(col("_corrupt_record").isNull).count() == 2)
      val bad = df.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 2)
      assert(bad.forall(r => r.getString(2).nonEmpty), "quarantined rows keep the raw payload")
    } finally df.unpersist()
  }

  test("DROPMALFORMED csv scan drops broken rows, FAILFAST raises") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    java.nio.file.Files.write(dir.resolve("part-0.csv"),
      java.util.Arrays.asList("1,alpha", "2,beta", "not-a-long,gamma"))
    val schema = "id LONG, name STRING"
    // collect(), not count(): CSV column pruning means count() parses
    // ZERO columns, so no conversion ever fails and nothing is dropped
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(dir.toString)
    assert(dropped.collect().length == 2)
    val failing = spark.read.schema(schema).option("mode", "FAILFAST").csv(dir.toString)
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }

  test("observe() surfaces per-query metrics without a second pass") {
    val observed = graft.sources.Tables.orders(spark, sf)
      .observe("m", count(lit(1)).as("rows"), max(col("o_totalprice")).as("max_price"))
    observed.collect() // metrics attach to THIS QueryExecution's run
    val m = observed.queryExecution.observedMetrics("m")
    assert(m.getAs[Long]("rows") == graft.sources.Tables.orders(spark, sf).count())
    assert(m.getAs[Double]("max_price") > 0.0)
  }

  test("schema_of_json infers the events.props envelope shape") {
    val inferred = spark.sql("""SELECT schema_of_json('{"k": 42}') AS s""").first().getString(0)
    assert(inferred.toLowerCase.contains("k") && inferred.toUpperCase.contains("BIGINT"), inferred)
  }

  test("csv/json scans prune columns at the source") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val orig = graft.sources.Tables.orders(spark, sf)
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val two = spark.read.schema(orig.schema).option("header", "true").csv(out)
      .select(col("o_orderkey"), col("o_totalprice"))
    val scan = two.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("o_orderkey") && !scan.contains("o_comment"),
      s"scan should read only projected columns:\n$scan")
    assert(two.count() == orig.count())
  }

  test("loaded schemas of all 10 harness tables match the audited signature") {
    // TESTDATA.md §Schema audit (round 15): the r14 regen silently
    // changed events.ts and cost a red round. This pins what the
    // LOADERS hand downstream for every table, so the next regen that
    // moves any dtype fails here first with a readable diff instead
    // of 21 queries deep in analysis errors. events.ts is TimestampType
    // BY CONTRACT (the loader normalizes whichever vintage is on disk).
    val expected = Map(
      "region" -> "r_regionkey:int,r_name:string",
      "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
      "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
      "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
      "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
      "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string",
      "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz"),
      "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
      "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
      "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")
    val got = graft.sources.Tables.all.map { t =>
      t -> graft.sources.Tables.loadAny(spark, sf, t).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    }.toMap
    val diffs = expected.keys.filter(t => got(t) != expected(t))
      .map(t => s"$t:\n  expected ${expected(t)}\n  got      ${got(t)}")
    assert(diffs.isEmpty,
      s"testdata regen moved loader-visible schemas:\n${diffs.mkString("\n")}")
  }

  test("events loader handles BOTH parquet vintages of ts (INT64-nanos and MICROS-NTZ)") {
    // The r14 harness regen flipped events.ts from TIMESTAMP(NANOS) —
    // which Spark 4 only reads via legacy nanosAsLong as raw INT64 —
    // to TIMESTAMP_MICROS isAdjustedToUTC=false (TIMESTAMP_NTZ), and a
    // vintage-assuming loader killed 21/75 oracle queries. Pin that
    // Tables.events loads BOTH encodings to the identical µs-truncated
    // UTC instant with TimestampType schema, so the next regen can't
    // silently break the loader again.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.spark.sql.types.TimestampType

    val epochSec = java.time.Instant.parse("2026-01-02T03:04:05Z").getEpochSecond
    val expected = java.time.Instant.ofEpochSecond(epochSec, 123456000L) // µs truncation of .123456789

    // vintage A: TIMESTAMP(NANOS) — Spark can't write it, so use parquet-mr directly
    val dirA = java.nio.file.Files.createTempDirectory("graft_ev_nanos").toString
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val w = ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(s"$dirA/events.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema).build()
    w.write(new SimpleGroupFactory(schema).newGroup()
      .append("event_id", 1L).append("ts", epochSec * 1000000000L + 123456789L))
    w.close()

    // vintage B: TIMESTAMP_MICROS isAdjustedToUTC=false — Spark writes
    // TimestampNTZType exactly so (the current harness encoding)
    val dirB = java.nio.file.Files.createTempDirectory("graft_ev_ntz").toString
    spark.sql("SELECT 1L AS event_id, TIMESTAMP_NTZ'2026-01-02 03:04:05.123456' AS ts")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    // Pin the CONDITION the fallback keys on (stable error-class API,
    // not message text): a Spark upgrade that renames it must fail HERE,
    // not silently stop adapting the nanos vintage in production reads.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val refusal = intercept[Exception] {
      spark.read.parquet(s"$dirA/events.parquet").schema
    }
    assert(graft.sources.Tables.parquetTypeCondition(refusal)
        .contains("PARQUET_TYPE_ILLEGAL"),
      s"nanos refusal condition moved: ${graft.sources.Tables.parquetTypeCondition(refusal)}" +
        s" (message: ${refusal.getMessage})")

    for ((dir, vintage) <- Seq(dirA -> "nanos", dirB -> "ntz")) {
      val df = graft.sources.Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$vintage vintage should load ts as TimestampType, got ${df.schema("ts").dataType}")
      val got = df.select(col("ts")).first().getTimestamp(0).toInstant
      assert(got == expected, s"$vintage vintage: got $got, expected $expected")

      // STREAMING path, same vintages: eventsStream probes the raw
      // schema batch-side and must honor the nanos conf at execution —
      // the claim was previously only exercised batch-side. The stream
      // reads a directory of parquet FILES: parquet-mr wrote vintage A
      // as a bare file in dirA, Spark wrote vintage B as an
      // events.parquet/ subdirectory of part files.
      val streamDir = if (vintage == "ntz") s"$dir/events.parquet" else dir
      val qn = s"ev_vintage_stream_$vintage"
      val q = graft.sources.Tables.eventsStream(spark, streamDir)
        .writeStream.format("memory").queryName(qn)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sgot = spark.table(qn).select(col("ts")).first().getTimestamp(0).toInstant
      assert(sgot == expected, s"$vintage vintage (stream): got $sgot, expected $expected")
    }
  }
}
