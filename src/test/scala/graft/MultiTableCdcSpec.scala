package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{Envelope, Fixture}
import graft.streaming.Streams

/** Multi-table CDC demux (round 10's lead item): the reference's
  * publication is `FOR ALL TABLES` (`/root/reference/src/utilities/
  * query.ts:12`), so ONE slot interleaves `students` and `status`
  * events. These specs pin (a) the registry surface — union envelope
  * schema, per-relation projection, (b) both materializer modes
  * demuxing into per-relation state that equals an independent
  * sequential fold of each relation's events alone, and (c) the loud
  * failures: a single-table materializer fed the mixed stream, and a
  * demux missing a registration. Expected values are folded directly
  * from the fixture case classes — never through the code under test.
  */
class MultiTableCdcSpec extends SparkSuite {

  private val relations = Seq(Envelope.studentsRelation, Envelope.statusRelation)
  private val union = Envelope.unionSchema(relations)

  /** Independent oracle: sequential last-image fold of students events. */
  private def studentsFinal: Map[Long, (String, String, String, Int)] = {
    val m = scala.collection.mutable.LinkedHashMap[Long, (String, String, String, Int)]()
    Fixture.rowEvents.foreach { e =>
      if (e.tag == "delete") m -= e.id
      else m(e.id) = (e.firstName, e.lastName, e.dateOfBirth, e.statusId)
    }
    m.toMap
  }

  /** Independent oracle: sequential last-image fold of status events. */
  private def statusFinal: Map[Long, String] = {
    val m = scala.collection.mutable.LinkedHashMap[Long, String]()
    Fixture.statusEvents.foreach { e =>
      if (e.tag == "delete") m -= e.id
      else m(e.id) = e.value
    }
    m.toMap
  }

  private def quiesce(): Unit = {
    var waited = 0
    while (spark.streams.active.nonEmpty && waited < 10000) {
      Thread.sleep(100); waited += 100
    }
  }

  private def collectStudents(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      ((r.getString(r.fieldIndex("firstName")), r.getString(r.fieldIndex("lastName")),
        r.getDate(r.fieldIndex("dateOfBirth")).toString, r.getInt(r.fieldIndex("status"))))).toMap

  private def collectStatus(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      r.getString(r.fieldIndex("value"))).toMap

  test("fixture precondition: relations interleave and their key spaces overlap") {
    // the un-demuxed failure mode is cross-table key merging — it only
    // bites if ids collide across relations, so the fixture must collide
    assert(statusFinal.keySet.intersect(studentsFinal.keySet).nonEmpty)
    val lsns = Fixture.multiTableJsonLines.filter(_.contains("\"table\": \"status\""))
    assert(lsns.size == Fixture.statusEvents.size + 1, "10 row events + 1 relation line")
    // strict LSN interleave, no collisions with students' ≡0 (mod 16) LSNs
    assert(Fixture.statusEvents.map(_.lsn).toSet
      .intersect(Fixture.rowEvents.map(_.lsn).toSet).isEmpty)
  }

  test("unionSchema merges images, widens numerics within a family, and refuses incompatible clashes") {
    val newStruct = union("new").dataType.asInstanceOf[StructType]
    assert(newStruct.fieldNames.toSet ==
      Set("id", "first_name", "last_name", "date_of_birth", "status_id", "value"))
    // same-named key unifies (both long here); a numeric clash widens
    val widened = Envelope.unionSchema(Seq(
      Envelope.statusRelation,
      Envelope.Relation("counters", StructType(Seq(
        StructField("id", IntegerType), StructField("n", LongType))))))
    assert(widened("new").dataType.asInstanceOf[StructType]("id").dataType == LongType)
    // an incompatible clash (string vs long id) fails at registry build
    val e = intercept[IllegalArgumentException] {
      Envelope.unionSchema(Seq(
        Envelope.statusRelation,
        Envelope.Relation("tags", StructType(Seq(
          StructField("id", StringType), StructField("label", StringType))))))
    }
    assert(e.getMessage.contains("incompatible types"), e.getMessage)
  }

  test("projectRelation refuses a narrowing cast from the union-widened read type") {
    // when two relations share a field name and one declares the
    // narrower numeric type, the union READ schema widens (pinned
    // above) — but projecting the narrow relation would cast back
    // down, wrapping out-of-range values silently with ANSI off.
    // Refuse at plan build; the fix is declaring the unified type.
    val counters = Envelope.Relation("counters", StructType(Seq(
      StructField("id", IntegerType), StructField("n", LongType))))
    val widened = Envelope.unionSchema(Seq(Envelope.statusRelation, counters))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
    // the relation declaring the unified type still projects fine
    Envelope.projectRelation(df.filter(col("table") === "status"), Envelope.statusRelation)
    val e = intercept[IllegalArgumentException] {
      Envelope.projectRelation(df.filter(col("table") === "counters"), counters)
    }
    assert(e.getMessage.contains("narrowing") && e.getMessage.contains("unified type"),
      e.getMessage)
  }

  test("a relation rename to engine bookkeeping ('__rn') is refused, not silently clobbered by the fold") {
    // lastImageByKey injects a '__rn' row-number column; a Relation
    // rename mapping a payload field onto that name would pass the
    // lsn/tag guard and then be silently REPLACED by the fold — the
    // field's data vanishing from final state with no error.
    val rel = Envelope.Relation("students", Envelope.studentsRelation.image,
      renames = Map("first_name" -> "__rn"))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], union)
    val e = intercept[IllegalArgumentException](Envelope.projectRelation(df, rel))
    assert(e.getMessage.contains("__rn"), e.getMessage)
    // and lastImageByKey itself refuses a pre-existing '__rn' input
    import spark.implicits._
    val clash = Seq((1L, "0/10", "insert", "x")).toDF("id", "lsn", "tag", "__rn")
    val e2 = intercept[IllegalArgumentException](Envelope.lastImageByKey(clash))
    assert(e2.getMessage.contains("__rn"), e2.getMessage)
  }

  test("projectRelation(students) under the union schema equals the authoritative single-table projection") {
    val mixed = spark.read.schema(union).json(
      writeLines(Fixture.multiTableJsonLines))
    val viaRelation = Envelope.projectRelation(
      mixed.filter(col("table") === "students"), Envelope.studentsRelation)
    val viaProject = Envelope.project(
      spark.read.schema(Envelope.schema).json(Fixture.materialize()))
    assert(viaRelation.columns.toSeq == viaProject.columns.toSeq)
    assert(viaRelation.exceptAll(viaProject).isEmpty &&
      viaProject.exceptAll(viaRelation).isEmpty,
      "registry projection must reproduce the hand-written students mapping")
  }

  test("materializeCdcTables (ordered): one mixed stream lands one consistent state table per relation") {
    val in = Fixture.materializeMultiTableChunks(5)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mt_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft_mt_state").toString
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    val students = spark.read.parquet(s"$root/students")
    val status = spark.read.parquet(s"$root/status")
    assert(collectStudents(students) == studentsFinal.map { case (k, (f, l, d, s)) =>
      k -> ((f, l, d, s)) },
      "students state must equal the students-only sequential fold")
    assert(collectStatus(status) == statusFinal,
      "status state must equal the status-only sequential fold")
    // no cross-contamination: status state has exactly its own columns
    assert(status.columns.toSet == Set("id", "value"))
    assert(students.columns.toSet ==
      Set("id", "firstName", "lastName", "dateOfBirth", "status"))
    // restart on the same checkpoint: no new data, both states unchanged
    val before = (students.orderBy("id").collect().toSeq,
      status.orderBy("id").collect().toSeq)
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    assert((spark.read.parquet(s"$root/students").orderBy("id").collect().toSeq,
      spark.read.parquet(s"$root/status").orderBy("id").collect().toSeq) == before)
  }

  test("materializeCdcTables (CAS): reverse-order delivery of the mixed stream still converges per relation") {
    import java.nio.file.Files
    val lines = Fixture.multiTableJsonLines
    val chunks = lines.grouped(math.max(1, lines.size / 5)).toVector
    val dir = Files.createTempDirectory("graft_mtcas_in")
    val t0 = System.currentTimeMillis() - 2000L * (chunks.size + 1)
    chunks.indices.reverse.zipWithIndex.foreach { case (ci, pos) =>
      val f = dir.resolve(f"chunk_$ci%04d.jsonl")
      Files.write(f, chunks(ci).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(t0 + pos * 2000L)
    }
    val ckpt = Files.createTempDirectory("graft_mtcas_ckpt").toString
    val root = Files.createTempDirectory("graft_mtcas_state").toString
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, dir.toString, schema = union), ckpt, root, relations,
      orderedTransport = false).awaitTermination()
    quiesce()
    assert(collectStudents(Streams.cdcLiveState(spark, s"$root/students")) ==
      studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) })
    assert(collectStatus(Streams.cdcLiveState(spark, s"$root/status")) == statusFinal,
      "per-relation LSN CAS must converge under reversed mixed delivery")
  }

  test("negative pin: a single-table materializer fed the mixed stream fails loudly, it does not merge keys across relations") {
    val in = Fixture.materializeMultiTableChunks(3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtneg_ckpt").toString
    val state = java.nio.file.Files.createTempDirectory("graft_mtneg_state").toString + "/students"
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdc(
        Streams.envelopeStream(spark, in, schema = union), ckpt, state)
        .awaitTermination()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("materializes ONE relation") &&
      msgs(failed).contains("status") && msgs(failed).contains("students") &&
      msgs(failed).contains("materializeCdcTables"), msgs(failed))
  }

  test("negative pin: the JDBC single-table materializer also refuses the mixed stream") {
    val in = Fixture.materializeMultiTableChunks(3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtnegj_ckpt").toString
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdcJdbc(
        Streams.envelopeStream(spark, in, schema = union), ckpt,
        "jdbc:derby:memory:graft_mtnegj;create=true", "students_live")
        .awaitTermination()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("materializes ONE relation") &&
      msgs(failed).contains("materializeCdcJdbcTables"), msgs(failed))
  }

  test("negative pin: an unregistered relation in the stream fails the demux loudly instead of dropping its events") {
    val in = Fixture.materializeMultiTableChunks(3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtstray_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft_mtstray_state").toString
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdcTables(
        Streams.envelopeStream(spark, in, schema = union), ckpt, root,
        Seq(Envelope.studentsRelation)) // status NOT registered
        .awaitTermination()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("unregistered table") &&
      msgs(failed).contains("status"), msgs(failed))
  }

  test("materializeCdcJdbcTables (ordered): the mixed stream lands one queryable Derby table per relation") {
    val sinkUrl = "jdbc:derby:memory:graft_mtjdbc;create=true"
    val in = Fixture.materializeMultiTableChunks(4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtjdbc_ckpt").toString
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, sinkUrl, relations,
      tableNames = n => s"live_$n").awaitTermination()
    quiesce()
    val students = graft.sources.Jdbc.snapshot(spark, sinkUrl, "live_students")
    val status = graft.sources.Jdbc.snapshot(spark, sinkUrl, "live_status")
    assert(collectStudents(students) == studentsFinal.map { case (k, (f, l, d, s)) =>
      k -> ((f, l, d, s)) })
    assert(collectStatus(status) == statusFinal)
    // lost-commit replay is a per-relation no-op (idempotent applies)
    val commitsDir = new java.io.File(ckpt, "commits")
    val newest = commitsDir.listFiles().filterNot(_.getName.startsWith("."))
      .maxBy(_.getName.toLong)
    assert(newest.delete())
    new java.io.File(commitsDir, s".${newest.getName}.crc").delete()
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, sinkUrl, relations,
      tableNames = n => s"live_$n").awaitTermination()
    quiesce()
    assert(collectStudents(
      graft.sources.Jdbc.snapshot(spark, sinkUrl, "live_students")) ==
      studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) })
    assert(collectStatus(
      graft.sources.Jdbc.snapshot(spark, sinkUrl, "live_status")) == statusFinal,
      "replaying the lost batch must be a no-op on every relation's table")
  }

  test("materializeCdcJdbcTables (CAS): reversed mixed delivery converges per relation in SQL state") {
    import java.nio.file.Files
    val sinkUrl = "jdbc:derby:memory:graft_mtjdbccas;create=true"
    val lines = Fixture.multiTableJsonLines
    val chunks = lines.grouped(math.max(1, lines.size / 4)).toVector
    val dir = Files.createTempDirectory("graft_mtjcas_in")
    val t0 = System.currentTimeMillis() - 2000L * (chunks.size + 1)
    chunks.indices.reverse.zipWithIndex.foreach { case (ci, pos) =>
      val f = dir.resolve(f"chunk_$ci%04d.jsonl")
      Files.write(f, chunks(ci).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(t0 + pos * 2000L)
    }
    val ckpt = Files.createTempDirectory("graft_mtjcas_ckpt").toString
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, dir.toString, schema = union), ckpt, sinkUrl, relations,
      tableNames = n => s"cas_$n", orderedTransport = false).awaitTermination()
    quiesce()
    assert(collectStudents(
      Streams.cdcLiveStateJdbc(spark, sinkUrl, "cas_students")) ==
      studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) })
    assert(collectStatus(
      Streams.cdcLiveStateJdbc(spark, sinkUrl, "cas_status")) == statusFinal)
  }

  test("multi-table snapshot-then-stream: per-table JDBC snapshots seed per-relation states, stream wins on overlap, deletes drop snapshot keys") {
    // the initial-load shape of a FOR ALL TABLES subscription: one
    // JDBC snapshot per relation unioned ahead of the demuxed stream
    val murl = "jdbc:derby:memory:graft_ms_seed;create=true"
    val c = java.sql.DriverManager.getConnection(murl)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        """CREATE TABLE students_ms (id BIGINT PRIMARY KEY, first_name VARCHAR(64),
          |  last_name VARCHAR(64), date_of_birth DATE, status_id INT)""".stripMargin)
      st.executeUpdate("INSERT INTO students_ms VALUES (0, 'Snap', 'Zero', '1970-01-01', 1)")
      st.executeUpdate("INSERT INTO students_ms VALUES (1000, 'Snap', 'Only', '1970-01-01', 1)")
      st.executeUpdate("CREATE TABLE status_ms (id BIGINT PRIMARY KEY, value VARCHAR(64))")
      st.executeUpdate("INSERT INTO status_ms VALUES (1, 'seed-active')")   // stream updates
      st.executeUpdate("INSERT INTO status_ms VALUES (3, 'seed-pending')")  // stream DELETES
      st.executeUpdate("INSERT INTO status_ms VALUES (1000, 'seed-only')")  // untouched
      st.close()
    } finally c.close()
    val env = spark.read.schema(union).json(writeLines(Fixture.multiTableJsonLines))
    val snaps = Map(
      "students" -> graft.sources.Jdbc.snapshot(spark, murl, "students_ms")
        .select(col("ID").as("id"), col("FIRST_NAME").as("firstName"),
          col("LAST_NAME").as("lastName"),
          col("DATE_OF_BIRTH").cast("date").as("dateOfBirth"),
          col("STATUS_ID").as("status")),
      "status" -> graft.sources.Jdbc.snapshot(spark, murl, "status_ms")
        .select(col("ID").as("id"), col("VALUE").as("value")))
    val states = Streams.snapshotThenStreamTables(env, relations, snaps)
    // students: stream-final images win; snapshot-only id 1000 survives
    val students = collectStudents(states("students"))
    val expectStudents = studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) } +
      (1000L -> (("Snap", "Only", "1970-01-01", 1)))
    assert(studentsFinal.contains(0L) || !students.contains(0L),
      "fixture precondition: id 0 is stream-touched")
    assert(students == expectStudents,
      "stream images must win for touched keys; snapshot-only keys keep the JDBC image")
    // status: updates win (1 -> 'enabled', not 'seed-active'), the
    // stream's delete of id 3 drops the snapshot row, 1000 survives
    val status = collectStatus(states("status"))
    assert(status == statusFinal + (1000L -> "seed-only"), status.toString)
    assert(!status.contains(3L),
      "a stream delete must drop the snapshot image, not resurrect it")
    assert(status(1L) == "enabled" && statusFinal(1L) == "enabled",
      "overlap keys take the stream's final image over the seed value")
  }

  test("q49 oracle query matches the per-relation folds and broadcasts the status side") {
    val df = graft.queries.Curation.q49.fn(spark, sf)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent expectation: join the two folds directly
    val expected = studentsFinal.values.map(_._4.toLong)
      .groupBy(identity).view
      .flatMap { case (sid, xs) => statusFinal.get(sid).map(_ -> xs.size.toLong) }
      .toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.sum > 0, "fixture precondition: live students reference live statuses")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the handful-of-rows status side must broadcast, not shuffle the students side:\n$plan")
  }

  test("a crash BETWEEN relation applies aborts the batch; replay re-lands the applied relation as a no-op and completes the rest") {
    import java.nio.file.Files
    import org.apache.hadoop.fs.Path
    // The demux applies relations sequentially inside one foreachBatch:
    // students swaps first, then status. Fail status's swap rename —
    // students has ALREADY swapped for this batch. The claim under
    // test: the batch aborts before its checkpoint commit, and the
    // replay merges students' identical change set idempotently while
    // completing status — per-relation exactly-once-equivalence from
    // one shared checkpoint.
    spark.sparkContext.hadoopConfiguration
      .set("fs.failfs.impl", classOf[FailOnceFs].getName)
    val src = Files.createTempDirectory("graft_mtcrash_in")
    val lines = Fixture.multiTableJsonLines
    val (phase1, phase2) = lines.splitAt(lines.size / 2)
    val now = System.currentTimeMillis()
    def writeChunk(name: String, ls: Seq[String], mtime: Long): Unit = {
      val f = src.resolve(name)
      Files.write(f, ls.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    writeChunk("chunk_0000.jsonl", phase1, now - 60000L)
    val ckpt = Files.createTempDirectory("graft_mtcrash_ckpt").toString
    val rootDir = Files.createTempDirectory("graft_mtcrash_state").toString
    val root = s"failfs://$rootDir"
    def commits: Seq[String] =
      Option(new java.io.File(ckpt, "commits").list()).map(_.toSeq).getOrElse(Seq.empty)
        .filterNot(_.startsWith(".")).sorted
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    assert(commits == Seq("0"))
    writeChunk("chunk_0001.jsonl", phase2, now - 30000L)
    FailOnceFs.armedDstName.set("status") // second relation's swap fails
    try {
      val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        Streams.materializeCdcTables(
          Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
          .awaitTermination()
      }
      def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
      assert(msgs(failed).contains("returned false"), msgs(failed))
    } finally FailOnceFs.armedDstName.set(null)
    quiesce()
    assert(commits == Seq("0"), "the half-applied batch must NOT reach its checkpoint commit")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/students")),
      "crash point: the first relation's swap already landed")
    assert(!fs.exists(new Path(s"$root/status")),
      "crash point: the second relation's state is renamed aside mid-swap")
    // restart, fault cleared: students replays as a no-op, status completes
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    assert(commits == Seq("0", "1"))
    assert(collectStudents(spark.read.parquet(s"$root/students")) ==
      studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) },
      "replay onto the already-swapped students state must be idempotent")
    assert(collectStatus(spark.read.parquet(s"$root/status")) == statusFinal,
      "the failed relation must complete on replay")
    assert(new java.io.File(rootDir).list().toSeq.sorted == Seq("status", "students"),
      "recovery must sweep swap/prev artifacts for both relations")
  }

  test("a relation keyed on a non-'id' column demuxes and merges on ITS key end-to-end") {
    import java.nio.file.Files
    // the key parameter threads projectRelation -> reduceBatch ->
    // Merge; every shipped relation keys on 'id', so pin the
    // parameterization with a string-keyed 'tags' relation
    val tags = Envelope.Relation("tags", StructType(Seq(
      StructField("code", StringType),
      StructField("label", StringType))), key = "code")
    val rels = Seq(tags)
    val schema = Envelope.unionSchema(rels)
    val src = Files.createTempDirectory("graft_key_in")
    val lines = Seq(
      """{"lsn": "0/10", "tag": "insert", "table": "tags", "new": {"code": "a", "label": "alpha"}}""",
      """{"lsn": "0/20", "tag": "insert", "table": "tags", "new": {"code": "b", "label": "beta"}}""",
      """{"lsn": "0/30", "tag": "update", "table": "tags", "new": {"code": "a", "label": "alef"}}""",
      """{"lsn": "0/40", "tag": "delete", "table": "tags", "old": {"code": "b"}}""",
      """{"lsn": "0/50", "tag": "insert", "table": "tags", "new": {"code": "c", "label": "gamma"}}""")
    Files.write(src.resolve("chunk_0000.jsonl"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val ckpt = Files.createTempDirectory("graft_key_ckpt").toString
    val root = Files.createTempDirectory("graft_key_state").toString
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = schema), ckpt, root, rels)
      .awaitTermination()
    quiesce()
    val got = spark.read.parquet(s"$root/tags").collect()
      .map(r => r.getString(r.fieldIndex("code")) -> r.getString(r.fieldIndex("label"))).toMap
    assert(got == Map("a" -> "alef", "c" -> "gamma"),
      s"update wins by LSN on the string key, delete drops by old.code: $got")
    // JDBC twin: same relation, same key, queryable table
    val url = "jdbc:derby:memory:graft_key_jdbc;create=true"
    val ckpt2 = Files.createTempDirectory("graft_key_ckpt2").toString
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, src.toString, schema = schema), ckpt2, url, rels)
      .awaitTermination()
    quiesce()
    val jgot = graft.sources.Jdbc.snapshot(spark, url, "tags").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(jgot == Map("a" -> "alef", "c" -> "gamma"), jgot.toString)
  }

  test("additive-drift restart (parquet): the widened relation's state gains the column with null-filled history, the sibling is untouched") {
    import java.nio.file.Files
    // the reference's 'relation' message carries schema changes
    // (customMapper.ts:12-13 filters it); our declared consumer
    // reaction is a restart with the ONE affected relation's image
    // widened. The composition under test: registry-driven projection
    // of the new field + per-relation state widening, while the
    // sibling relation's state and schema stay byte-identical.
    val src = Files.createTempDirectory("graft_mtdrift_in")
    val ckpt = Files.createTempDirectory("graft_mtdrift_ckpt").toString
    val root = Files.createTempDirectory("graft_mtdrift_state").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    def student(lsn: String, id: Long, fn: String, email: Option[String] = None) = {
      val extra = email.map(e => s""", "email": "$e"""").getOrElse("")
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "$fn", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1$extra}}"""
    }
    def status(lsn: String, id: Long, v: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "status", "new": {"id": $id, "value": "$v"}}"""
    // batch 0, pre-drift: two students, one status
    writeChunk("chunk_0000.jsonl", now - 60000L,
      student("0/00000010", 1L, "one"), student("0/00000020", 2L, "two"),
      status("0/00000018", 1L, "active"))
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    val statusFilesBefore = new java.io.File(s"$root/status").listFiles()
      .map(f => f.getName -> f.lastModified()).toSeq.sorted
    // producer ALTER TABLE students ADD email -> restart with ONE
    // relation's image widened; the sibling registration is unchanged
    val widenedStudents = Envelope.studentsRelation.copy(
      image = Envelope.studentsRelation.image.add("email", StringType))
    val widenedRels = Seq(widenedStudents, Envelope.statusRelation)
    val widenedUnion = Envelope.unionSchema(widenedRels)
    writeChunk("chunk_0001.jsonl", now - 30000L,
      student("0/00000030", 1L, "one2", Some("one@x")), // pre-drift key takes the new column
      student("0/00000040", 3L, "three", Some("three@x")),
      status("0/00000038", 2L, "disabled"))             // sibling keeps applying normally
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = widenedUnion), ckpt, root, widenedRels)
      .awaitTermination()
    quiesce()
    val students = spark.read.parquet(s"$root/students")
    assert(students.columns.toSet ==
      Set("id", "firstName", "lastName", "dateOfBirth", "status", "email"),
      "the widened relation's state must gain the drifted column")
    val byId = students.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      (r.getString(r.fieldIndex("firstName")),
        Option(r.getString(r.fieldIndex("email"))))).toMap
    assert(byId == Map(
      1L -> (("one2", Some("one@x"))),   // post-drift update carries it
      2L -> (("two", None)),             // untouched pre-drift history null-fills
      3L -> (("three", Some("three@x")))), byId.toString)
    val statusState = spark.read.parquet(s"$root/status")
    assert(statusState.columns.toSet == Set("id", "value"),
      "the sibling relation's schema must NOT widen")
    assert(collectStatus(statusState) == Map(1L -> "active", 2L -> "disabled"))
    // and the sibling's batch-0 parquet was appended to, never
    // rewritten under a drifted schema: its state dir still holds a
    // consistent two-column table (checked above) with batch-1 work
    // limited to its own events
    assert(statusFilesBefore.nonEmpty)
  }

  test("additive-drift restart (JDBC): the widened relation's table gains the column, pre-drift rows read back NULL, the sibling is untouched") {
    import java.nio.file.Files
    val sinkUrl = "jdbc:derby:memory:graft_mtdrift_jdbc;create=true"
    val src = Files.createTempDirectory("graft_mtdriftj_in")
    val ckpt = Files.createTempDirectory("graft_mtdriftj_ckpt").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    def student(lsn: String, id: Long, fn: String, email: Option[String] = None) = {
      val extra = email.map(e => s""", "email": "$e"""").getOrElse("")
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "$fn", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1$extra}}"""
    }
    def status(lsn: String, id: Long, v: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "status", "new": {"id": $id, "value": "$v"}}"""
    writeChunk("chunk_0000.jsonl", now - 60000L,
      student("0/00000010", 1L, "one"), student("0/00000020", 2L, "two"),
      status("0/00000018", 1L, "active"))
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, sinkUrl, relations,
      tableNames = n => s"drift_$n").awaitTermination()
    quiesce()
    val widenedStudents = Envelope.studentsRelation.copy(
      image = Envelope.studentsRelation.image.add("email", StringType))
    val widenedRels = Seq(widenedStudents, Envelope.statusRelation)
    val widenedUnion = Envelope.unionSchema(widenedRels)
    writeChunk("chunk_0001.jsonl", now - 30000L,
      student("0/00000030", 3L, "three", Some("three@x")),
      status("0/00000038", 2L, "disabled"))
    Streams.materializeCdcJdbcTables(
      Streams.envelopeStream(spark, src.toString, schema = widenedUnion), ckpt, sinkUrl, widenedRels,
      tableNames = n => s"drift_$n").awaitTermination()
    quiesce()
    val students = graft.sources.Jdbc.snapshot(spark, sinkUrl, "drift_students")
    assert(students.columns.map(_.toLowerCase).toSet ==
      Set("id", "firstname", "lastname", "dateofbirth", "status", "email"),
      "ensureTable must ALTER the widened relation's table additively")
    val byId = students.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      Option(r.getString(r.fieldIndex("email")))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some("three@x")),
      s"pre-drift rows must read back NULL in the widened column: $byId")
    val statusTbl = graft.sources.Jdbc.snapshot(spark, sinkUrl, "drift_status")
    assert(statusTbl.columns.map(_.toLowerCase).toSet == Set("id", "value"),
      "the sibling relation's table must NOT gain the column")
    assert(collectStatus(statusTbl) == Map(1L -> "active", 2L -> "disabled"))
  }

  test("concurrent relation applies (maxConcurrentRelations=2) converge to the same per-relation states") {
    // the scale path for FOR ALL TABLES catalogs: per-relation applies
    // are independent (disjoint state dirs, each idempotent), so they
    // may overlap — same folds must come out
    val in = Fixture.materializeMultiTableChunks(4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtpar_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft_mtpar_state").toString
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, root, relations,
      maxConcurrentRelations = 2).awaitTermination()
    quiesce()
    assert(collectStudents(spark.read.parquet(s"$root/students")) ==
      studentsFinal.map { case (k, (f, l, d, s)) => k -> ((f, l, d, s)) })
    assert(collectStatus(spark.read.parquet(s"$root/status")) == statusFinal)
  }

  test("the stray guard rides the census job: a quiet micro-batch runs one aggregation, zero per-relation probe jobs") {
    import java.nio.file.Files
    // r10 nit: the guard was a SECOND per-batch job
    // (distinct().limit(5).collect()) on top of a per-relation
    // isEmpty probe each. Now one census aggregation materializes the
    // cache, answers the stray question, and tells the demux which
    // relations to skip — a batch touching nothing runs ONE action.
    val src = Files.createTempDirectory("graft_mtjobs_in")
    val ckpt = Files.createTempDirectory("graft_mtjobs_ckpt").toString
    val root = Files.createTempDirectory("graft_mtjobs_state").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    writeChunk("chunk_0000.jsonl", now - 60000L,
      """{"lsn": "0/00000010", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "a", "last_name": "b", "date_of_birth": "1990-01-01", "status_id": 1}}""",
      """{"lsn": "0/00000018", "tag": "insert", "table": "status", "new": {"id": 1, "value": "active"}}""")
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    // second run processes ONLY the control-tag chunk: both relations
    // quiet, so the whole batch must cost exactly the census action
    writeChunk("chunk_0001.jsonl", now - 30000L,
      """{"lsn": "0/00000020", "tag": "begin", "table": null}""",
      """{"lsn": "0/00000028", "tag": "commit", "table": null}""")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Streams.materializeCdcTables(
        Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
        .awaitTermination()
      quiesce()
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() <= 2,
      s"a control-only micro-batch must cost only the census aggregation " +
        s"(got ${jobs.get()} jobs — per-relation probes or a dedicated stray job are back)")
    // and the states are untouched by the quiet batch
    assert(spark.read.parquet(s"$root/students").count() == 1L)
    assert(spark.read.parquet(s"$root/status").count() == 1L)
  }

  test("a batch with no events for a relation skips that relation's state rewrite entirely") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_mtskip_in")
    val ckpt = Files.createTempDirectory("graft_mtskip_ckpt").toString
    val root = Files.createTempDirectory("graft_mtskip_state").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    def student(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "fn$id", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def status(lsn: String, id: Long, v: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "status", "new": {"id": $id, "value": "$v"}}"""
    // batch 0 touches both relations
    writeChunk("chunk_0000.jsonl", now - 60000L,
      student("0/00000010", 1L), status("0/00000018", 1L, "active"))
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    def listing(rel: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$root/$rel")
      d.listFiles().map(f => f.getName -> f.lastModified()).toSeq.sorted
    }
    val statusBefore = listing("status")
    // batch 1 carries ONLY students events: the status state parquet
    // must not be rewritten (same files, same mtimes — quiet relations
    // must not pay the busy relation's write amplification)
    writeChunk("chunk_0001.jsonl", now - 30000L, student("0/00000020", 2L))
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    assert(listing("status") == statusBefore,
      "an untouched relation's state files must be byte-identical, not rewritten")
    assert(collectStudents(spark.read.parquet(s"$root/students")).keySet == Set(1L, 2L),
      "the touched relation still advances")
  }

  test("a quiet relation's tombstones still age out: the periodic GC sweep reaches relations the census skips") {
    // The census-driven demux skips quiet relations entirely — which
    // also skips applyBatchJdbc's per-apply tombstone GC. Without the
    // sweep, a relation that takes deletes and then goes silent keeps
    // its tombstones past the retention horizon forever while its
    // siblings stay busy.
    import java.nio.file.Files
    val sinkUrl = "jdbc:derby:memory:graft_mt_quietgc;create=true"
    val src = Files.createTempDirectory("graft_mtqgc_in")
    val ckpt = Files.createTempDirectory("graft_mtqgc_ckpt").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    def student(lsn: String, id: Long, fn: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "$fn", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def studentDelete(lsn: String, id: Long) =
      s"""{"lsn": "$lsn", "tag": "delete", "table": "students", "old": {"id": $id}}"""
    def status(lsn: String, id: Long, v: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "status", "new": {"id": $id, "value": "$v"}}"""
    def run(): Unit = {
      Streams.materializeCdcJdbcTables(
        Streams.envelopeStream(spark, src.toString, schema = union), ckpt, sinkUrl,
        relations, tableNames = n => s"qgc_$n", orderedTransport = false,
        casTombstoneRetention = 1L, casQuietGcEvery = 1L).awaitTermination()
      quiesce()
    }
    def studentTombstones(): Seq[Long] =
      graft.sources.Jdbc.snapshot(spark, sinkUrl, "qgc_students")
        .filter(col("op") === "D").collect()
        .map(r => r.getLong(r.fieldIndex("id"))).toSeq.sorted
    // batch 0: students takes an insert and a delete (tombstone stamped
    // 0), status an insert — then students goes permanently quiet
    writeChunk("chunk_0000.jsonl", now - 60000L,
      student("0/00000010", 1L, "one"), student("0/00000014", 2L, "two"),
      studentDelete("0/00000018", 1L), status("0/00000020", 1L, "active"))
    run()
    assert(studentTombstones() == Seq(1L),
      "the delete must land as a tombstone before the horizon passes")
    // batch 1 is a restart's FIRST batch (applies every relation; its
    // per-apply GC horizon 1-1=0 keeps stamp-0 tombstones). Batch 2 is
    // the steady state: students is quiet, the census skips it, and
    // ONLY the sweep (horizon 2-1=1 > stamp 0) can collect the
    // tombstone.
    writeChunk("chunk_0001.jsonl", now - 40000L, status("0/00000030", 2L, "pending"))
    writeChunk("chunk_0002.jsonl", now - 20000L, status("0/00000040", 3L, "closed"))
    run()
    assert(studentTombstones() == Seq.empty,
      "the periodic sweep must age out a quiet relation's expired tombstones")
    // the sweep deletes ONLY expired tombstones — live rows survive it
    val live = Streams.cdcLiveStateJdbc(spark, sinkUrl, "qgc_students")
      .collect().map(r => r.getLong(r.fieldIndex("id"))).toSeq.sorted
    assert(live == Seq(2L), s"live rows must survive the sweep: $live")
    assert(collectStatus(Streams.cdcLiveStateJdbc(spark, sinkUrl, "qgc_status")) ==
      Map(1L -> "active", 2L -> "pending", 3L -> "closed"))
  }

  test("relation names colliding with state-swap bookkeeping are refused at build") {
    // each relation's state dir sits next to its siblings, and crash
    // recovery sweeps `<state>__prev` / `<state>__swap_<batchId>`
    // siblings — a relation NAMED like another's bookkeeping would
    // have its entire state deleted by that sweep
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_collide_in").toString
    val ckpt = Files.createTempDirectory("graft_collide_ckpt").toString
    val root = Files.createTempDirectory("graft_collide_root").toString
    def rel(n: String) = Envelope.Relation(n, Envelope.statusRelation.image)
    for (bad <- Seq("t__prev", "t__swap_42")) {
      val e = intercept[IllegalArgumentException] {
        Streams.materializeCdcTables(
          Streams.envelopeStream(spark, src, schema = union), ckpt, root,
          Seq(rel("t"), rel(bad)))
      }
      assert(e.getMessage.contains(bad) && e.getMessage.contains("bookkeeping"), e.getMessage)
    }
    // a benign double-underscore name that is NOT another's bookkeeping passes the guard
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src, schema = union), ckpt, root,
      Seq(rel("t"), rel("t__swap_backup"))).stop()
    quiesce()
  }

  test("a stream alternating ONE table per micro-batch is refused by the cross-batch table binding") {
    // per-table chunk files + maxFilesPerTrigger=1: every batch is
    // single-table, so the per-batch guard passes — but the stream as
    // a whole interleaves relations, and the single-table materializer
    // would merge keys across them. The checkpoint binds the first
    // observed table and refuses the switch.
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_altbind_in")
    val ckpt = Files.createTempDirectory("graft_altbind_ckpt").toString
    val state = Files.createTempDirectory("graft_altbind_state").toString + "/state"
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    writeChunk("chunk_0000.jsonl", now - 60000L,
      s"""{"lsn": "0/00000010", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "a", "last_name": "b", "date_of_birth": "1990-01-01", "status_id": 1}}""")
    writeChunk("chunk_0001.jsonl", now - 30000L,
      s"""{"lsn": "0/00000020", "tag": "insert", "table": "status", "new": {"id": 1, "value": "active"}}""")
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdc(
        Streams.envelopeStream(spark, src.toString, schema = union), ckpt, state)
        .awaitTermination()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("materializes relation 'students'") &&
      msgs(failed).contains("'status'"), msgs(failed))
    quiesce()
  }

  test("late-arriving relation: the failed batch is NOT lost — stop, register, restart replays it completely") {
    // The operational path for a table appearing in the slot AFTER the
    // consumer started (a producer CREATE TABLE under FOR ALL TABLES):
    // the census fails the batch loudly BEFORE any relation applies,
    // checkpoint-after-sink leaves that batch uncommitted, so the
    // runbook — stop, extend the registry, restart with the widened
    // union schema — replays the failed batch whole. The witness: the
    // new relation's events AND the sibling events interleaved in the
    // same failed batch all land; nothing is dropped, nothing doubles.
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft_mtlate_in")
    val ckpt = Files.createTempDirectory("graft_mtlate_ckpt").toString
    val root = Files.createTempDirectory("graft_mtlate_state").toString
    val now = System.currentTimeMillis()
    def writeChunk(name: String, mtime: Long, lines: String*): Unit = {
      val f = src.resolve(name)
      Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      f.toFile.setLastModified(mtime)
    }
    def student(lsn: String, id: Long, fn: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "students", "new": {"id": $id, "first_name": "$fn", "last_name": "ln$id", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    def status(lsn: String, id: Long, v: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "status", "new": {"id": $id, "value": "$v"}}"""
    def course(lsn: String, id: Long, title: String) =
      s"""{"lsn": "$lsn", "tag": "insert", "table": "courses", "new": {"id": $id, "title": "$title"}}"""

    // batch 0: registered relations only — applies clean
    writeChunk("chunk_0000.jsonl", now - 60000L,
      student("0/00000010", 1L, "one"), status("0/00000018", 1L, "active"))
    // batch 1: the late relation appears, interleaved with sibling events
    writeChunk("chunk_0001.jsonl", now - 30000L,
      student("0/00000020", 2L, "two"),
      course("0/00000028", 10L, "algorithms"),
      status("0/00000030", 2L, "inactive"))
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.materializeCdcTables(
        Streams.envelopeStream(spark, src.toString, schema = union), ckpt, root, relations)
        .awaitTermination()
    }
    quiesce()
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(failed).contains("unregistered table") && msgs(failed).contains("courses"),
      msgs(failed))
    // batch 0 committed, batch 1 did not touch ANY state (census runs
    // before the first relation apply — the batch fails atomically)
    assert(collectStudents(spark.read.parquet(s"$root/students")) ==
      Map(1L -> (("one", "ln1", "1990-01-01", 1))))
    assert(collectStatus(spark.read.parquet(s"$root/status")) == Map(1L -> "active"))
    assert(!new java.io.File(s"$root/courses").exists())

    // the runbook: extend the registry, restart on the SAME checkpoint
    // with the widened union schema
    val coursesRelation = Envelope.Relation("courses", StructType(Seq(
      StructField("id", LongType), StructField("title", StringType))))
    val extendedRels = relations :+ coursesRelation
    val extendedUnion = Envelope.unionSchema(extendedRels)
    Streams.materializeCdcTables(
      Streams.envelopeStream(spark, src.toString, schema = extendedUnion),
      ckpt, root, extendedRels).awaitTermination()
    quiesce()
    assert(collectStudents(spark.read.parquet(s"$root/students")) ==
      Map(1L -> (("one", "ln1", "1990-01-01", 1)), 2L -> (("two", "ln2", "1990-01-01", 1))),
      "the sibling events from the failed batch must land exactly once after restart")
    assert(collectStatus(spark.read.parquet(s"$root/status")) ==
      Map(1L -> "active", 2L -> "inactive"))
    val courses = spark.read.parquet(s"$root/courses")
    assert(courses.columns.toSet == Set("id", "title"))
    assert(courses.collect().map(r => r.getLong(r.fieldIndex("id")) ->
      r.getString(r.fieldIndex("title"))).toMap == Map(10L -> "algorithms"),
      "the late relation's events from the failed batch must land after registration")
  }

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mt_lines")
    val f = dir.resolve("all.jsonl")
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toString
  }

  test("materializeScd2Tables: one mixed stream lands one consistent SCD2 history per relation") {
    val in = Fixture.materializeMultiTableChunks(5)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mtscd_ckpt").toString
    val root = java.nio.file.Files.createTempDirectory("graft_mtscd_state").toString
    Streams.materializeScd2Tables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, root, relations)
      .awaitTermination()
    quiesce()
    // each relation's streamed history == the batch SCD2 fold of ITS
    // events alone (the q50 parity convention, per relation)
    val mixed = spark.read.schema(union).json(in)
    def expected(rel: Envelope.Relation) = Envelope.scd2Fold(
      Envelope.projectRelation(mixed.filter(col("table") === rel.name), rel)
        .filter(col("tag").isin("insert", "update", "delete"))
        .withColumn("valid_from", Envelope.lsnNumeric(col("lsn")))
        .drop("lsn"),
      rel.outName(rel.key))
    relations.foreach { rel =>
      val got = spark.read.parquet(s"$root/${rel.name}")
      val want = expected(rel)
      val cols = got.columns.sorted.map(col)
      assert(got.count() == want.count(), s"${rel.name} history row count")
      assert(got.select(cols: _*).exceptAll(want.select(cols: _*)).isEmpty &&
        want.select(cols: _*).exceptAll(got.select(cols: _*)).isEmpty,
        s"${rel.name} streamed history must equal its single-relation batch fold")
    }
    // no cross-contamination: each history carries exactly its own
    // image columns + the interval bookkeeping
    assert(spark.read.parquet(s"$root/status").columns.toSet ==
      Set("id", "value", "valid_from", "valid_to", "is_current"))
    assert(spark.read.parquet(s"$root/students").columns.toSet ==
      Set("id", "firstName", "lastName", "dateOfBirth", "status",
        "valid_from", "valid_to", "is_current"))
    // the open intervals are each relation's last-image fold
    assert(collectStudents(spark.read.parquet(s"$root/students")
        .filter(col("is_current") === 1)) == studentsFinal,
      "students open intervals must equal the students-only sequential fold")
    assert(collectStatus(spark.read.parquet(s"$root/status")
        .filter(col("is_current") === 1)) == statusFinal,
      "status open intervals must equal the status-only sequential fold")
  }

  test("target naming refuses a collision with another target's compaction-horizon sidecar (r21, ADVICE)") {
    // 'status' mapped onto students' '<table>_graft_horizon' sidecar
    // would let compactScd2Table read status rows as a horizon marker
    // and clobber them — refuse at BUILD, like the duplicate-target
    // guard (requireDistinctTargets runs before the stream starts)
    val e = intercept[IllegalArgumentException] {
      Streams.materializeScd2JdbcTables(
        Streams.envelopeStream(spark, Fixture.materializeMultiTableChunks(2), schema = union),
        java.nio.file.Files.createTempDirectory("graft_sidecar_ckpt").toString,
        "jdbc:derby:memory:graft_sidecar;create=true", relations,
        tableNames = n => if (n == "status") "students_hist_graft_horizon" else s"${n}_hist")
    }
    assert(e.getMessage.contains("compaction-horizon sidecar"), e.getMessage)
    // the plain duplicate-target guard still fires first when two
    // relations share one table outright
    val e2 = intercept[IllegalArgumentException] {
      Streams.materializeScd2JdbcTables(
        Streams.envelopeStream(spark, Fixture.materializeMultiTableChunks(2), schema = union),
        java.nio.file.Files.createTempDirectory("graft_dup_ckpt").toString,
        "jdbc:derby:memory:graft_dup;create=true", relations,
        tableNames = _ => "one_table")
    }
    assert(e2.getMessage.contains("same table"), e2.getMessage)
  }

  test("materializeScd2JdbcTables: one mixed stream lands one JDBC SCD2 history per relation; lost-commit replay is a no-op; both transport modes") {
    import graft.sources.Jdbc
    for (ordered <- Seq(true, false)) {
    val modeTag = if (ordered) "ord" else "ooo"
    val sinkUrl = s"jdbc:derby:memory:graft_mtscd2_jdbc_$modeTag;create=true"
    // ordered mode streams the LSN-ordered chunks; unordered mode
    // streams them fully REVERSED — deletes out-run their inserts
    // across relations, and the per-relation folds must still converge
    val in =
      if (ordered) Fixture.materializeMultiTableChunks(5)
      else {
        val dir = java.nio.file.Files.createTempDirectory("graft_mtscd2j_ooo_in")
        val lines = Fixture.multiTableJsonLines.reverse
        val chunks = lines.grouped(math.max(1, lines.size / 5)).toVector
        val t0 = System.currentTimeMillis() - 2000L * (chunks.size + 1)
        chunks.zipWithIndex.foreach { case (chunk, i) =>
          val f = dir.resolve(f"chunk_$i%04d.jsonl")
          java.nio.file.Files.write(f,
            chunk.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
          f.toFile.setLastModified(t0 + i * 2000L)
        }
        dir.toString
      }
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_mtscd2j_ckpt_$modeTag").toString
    def run() = Streams.materializeScd2JdbcTables(
      Streams.envelopeStream(spark, in, schema = union), ckpt, sinkUrl, relations,
      tableNames = n => s"${n}_history", orderedTransport = ordered).awaitTermination()
    run()
    quiesce()
    // each relation's landed history == the batch SCD2 fold of ITS
    // events alone (the q50 parity convention, per relation)
    val mixed = spark.read.schema(union).json(in)
    def expected(rel: Envelope.Relation) = Envelope.scd2Fold(
      Envelope.projectRelation(mixed.filter(col("table") === rel.name), rel)
        .filter(col("tag").isin("insert", "update", "delete"))
        .withColumn("valid_from", Envelope.lsnNumeric(col("lsn")))
        .drop("lsn"),
      rel.outName(rel.key))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
      val cols = df.columns.map(_.toLowerCase).sorted
      val lowered = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c.toLowerCase))
      lowered.select(cols.map(c => col(c).cast("string")): _*).collect()
        .map(_.toSeq.map(v => if (v == null) "<null>" else v.toString)).toSeq
        .sortBy(_.mkString("|"))
    }
    def landed(rel: Envelope.Relation) = canon(
      Jdbc.snapshot(spark, sinkUrl, s"${rel.name}_history"))
    relations.foreach { rel =>
      // fully delivered → no zero-width orphan tombstones may remain
      assert(Jdbc.snapshot(spark, sinkUrl, s"${rel.name}_history")
        .filter(col("valid_to").isNotNull && col("valid_to") === col("valid_from")).isEmpty,
        s"${rel.name}_history must carry no zero-width tombstones after full delivery (ordered=$ordered)")
      val want = canon(expected(rel))
      assert(want.nonEmpty && landed(rel) == want,
        s"${rel.name}_history must equal its single-relation batch fold (ordered=$ordered)")
    }
    // column isolation: each table carries exactly its own image
    // columns + the interval bookkeeping (no cross-relation bleed)
    assert(Jdbc.snapshot(spark, sinkUrl, "status_history").columns.toSet ==
      Set("id", "value", "valid_from", "valid_to", "is_current"))
    assert(Jdbc.snapshot(spark, sinkUrl, "students_history").columns.toSet ==
      Set("id", "firstName", "lastName", "dateOfBirth", "status",
        "valid_from", "valid_to", "is_current"))
    // scd2AsOf works per table: as-of(max) == each relation's
    // sequential last-image fold
    assert(collectStudents(Envelope.scd2AsOf(
      Jdbc.snapshot(spark, sinkUrl, "students_history"), Long.MaxValue)) == studentsFinal)
    assert(collectStatus(Envelope.scd2AsOf(
      Jdbc.snapshot(spark, sinkUrl, "status_history"), Long.MaxValue)) == statusFinal)
    // crash after the applies, before the checkpoint commit: the
    // replayed batch is screened by each table's own high-water marks
    val before = relations.map(landed)
    val commitsDir = new java.io.File(ckpt, "commits")
    val newest = commitsDir.listFiles().filterNot(_.getName.startsWith("."))
      .maxBy(_.getName.toLong)
    assert(newest.delete())
    new java.io.File(commitsDir, s".${newest.getName}.crc").delete()
    run()
    quiesce()
    assert(relations.map(landed) == before,
      s"replaying a batch whose commit was lost must be a no-op on every relation's history (ordered=$ordered)")
    }
  }
}
