package graft

import org.apache.spark.sql.functions._
import graft.cdc.{Envelope, Fixture}

/** CDC semantics mirrored from the reference (SURVEY §5.3): tag filter
  * (A4), null-safe projection (A5), last-image-wins replay (A9/Q19),
  * idempotence under duplicated batches (§7.4.7).
  */
class CdcSpec extends SparkSuite {

  private def raw = spark.read.schema(Envelope.schema).json(Fixture.materialize())

  test("tag filter drops begin/relation/commit control events") {
    val projected = Envelope.project(raw)
    assert(projected.count() == Fixture.rowEvents.size)
    assert(projected.filter(col("tag").isin("begin", "commit", "relation")).count() == 0)
  }

  test("delete events take their key from old.id (null-safe extraction)") {
    val deletes = Envelope.project(raw).filter(col("tag") === "delete")
    assert(deletes.count() == Fixture.rowEvents.count(_.tag == "delete"))
    assert(deletes.filter(col("id").isNull).count() == 0)
    assert(deletes.filter(col("firstName").isNotNull).count() == 0)
  }

  test("last-image-wins replay matches a sequential fold of the event log") {
    // Reference model: apply events in LSN order into a map.
    val expected = Fixture.rowEvents.foldLeft(Map.empty[Long, Fixture.Ev]) {
      case (m, e) => if (e.tag == "delete") m - e.id else m + (e.id -> e)
    }
    val got = Envelope.lastImageByKey(Envelope.project(raw))
      .select(col("id"), col("firstName"), col("lastName"), col("status"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == ((e.firstName, e.lastName, e.statusId)), s"id=$id")
    }
  }

  test("replaying a duplicated batch is idempotent (ack-after-sink upgrade)") {
    val once = Envelope.lastImageByKey(Envelope.project(raw))
    val twice = Envelope.lastImageByKey(Envelope.project(raw.union(raw)))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("transformer registry: chain composes, fanOut concatenates (A3)") {
    import graft.ops.Transforms
    val projected = Envelope.project(raw)
    // chain: filter then narrow — same as inline composition
    val chained = Transforms.chain(Seq(
      df => df.filter(col("tag") =!= "delete"),
      df => df.select(col("id"), col("firstName"))))(projected)
    assert(chained.columns.toSeq == Seq("id", "firstName"))
    assert(chained.count() == projected.filter(col("tag") =!= "delete").count())
    // fanOut: each transformer sees the same input; outputs concat
    val fanned = Transforms.fanOut(Seq(
      df => df.filter(col("tag") === "insert").select(col("id")),
      df => df.filter(col("tag") === "update").select(col("id"))))(projected)
    assert(fanned.count() ==
      projected.filter(col("tag").isin("insert", "update")).count())
  }

  test("typed Dataset[Student] boundary round-trips the final state") {
    val finalState = Envelope.lastImageByKey(Envelope.project(raw))
    val students = Envelope.typed(finalState).collect()
    assert(students.length == finalState.count())
    val byId = students.map(s => s.id -> s).toMap
    finalState.collect().foreach { r =>
      val s = byId(r.getLong(r.fieldIndex("id")))
      assert(s.firstName == r.getString(r.fieldIndex("firstName")))
      assert(s.status == r.getInt(r.fieldIndex("status")))
      assert(s.dateOfBirth != null) // DateType survived the Encoder
    }
  }

  test("fixture is deterministic and LSN-ordered") {
    val lsns = Fixture.rowEvents.map(_.lsn)
    assert(lsns == lsns.sorted, "fixed-width hex LSNs must sort lexicographically")
    assert(Fixture.rowEvents.nonEmpty && Fixture.rowEvents.exists(_.tag == "delete")
      && Fixture.rowEvents.exists(_.tag == "update"))
    // delete-then-reinsert coverage (FIXTURES.md §3)
    val byId = Fixture.rowEvents.groupBy(_.id)
    assert(byId.values.exists(evs =>
      evs.map(_.tag).containsSlice(Seq("delete", "insert"))))
  }

  test("a drifted image field whose camelCase shadows a projected column is refused loudly") {
    import org.apache.spark.sql.types._
    // new.status would camelCase onto the projection's own 'status'
    // (the status_id rename target) — silently shadowing it is the
    // failure mode the r9 drift pass-through must not introduce
    val widened = StructType(Envelope.schema.fields.map {
      case f if f.name == "new" =>
        f.copy(dataType = f.dataType.asInstanceOf[StructType].add("status", StringType))
      case f => f
    })
    val df = spark.read.schema(widened).json(Fixture.materialize())
    val e = intercept[IllegalArgumentException](Envelope.project(df))
    assert(e.getMessage.contains("would shadow") && e.getMessage.contains("status"),
      e.getMessage)
    // sanity: a non-colliding drifted field passes through camelCased
    val ok = StructType(Envelope.schema.fields.map {
      case f if f.name == "new" =>
        f.copy(dataType = f.dataType.asInstanceOf[StructType].add("email_address", StringType))
      case f => f
    })
    val projected = Envelope.project(spark.read.schema(ok).json(Fixture.materialize()))
    assert(projected.columns.contains("emailAddress"))
  }

  test("two drifted image fields folding to the same camelCase are refused, not emitted as duplicate columns") {
    import org.apache.spark.sql.types._
    // email_x and emailX both fold to 'emailX': each passes the
    // fixed-name shadow check, so without the injectivity guard the
    // projection emits two columns named emailX and every downstream
    // resolution dies on ambiguity instead of failing here
    val widened = StructType(Envelope.schema.fields.map {
      case f if f.name == "new" =>
        f.copy(dataType = f.dataType.asInstanceOf[StructType]
          .add("email_x", StringType).add("emailX", StringType))
      case f => f
    })
    val df = spark.read.schema(widened).json(Fixture.materialize())
    val e = intercept[IllegalArgumentException](Envelope.project(df))
    assert(e.getMessage.contains("fold to output name") &&
      e.getMessage.contains("email_x") && e.getMessage.contains("emailX"), e.getMessage)
    // two distinct extras still pass together
    val ok = StructType(Envelope.schema.fields.map {
      case f if f.name == "new" =>
        f.copy(dataType = f.dataType.asInstanceOf[StructType]
          .add("email_x", StringType).add("email_y", StringType))
      case f => f
    })
    val projected = Envelope.project(spark.read.schema(ok).json(Fixture.materialize()))
    assert(projected.columns.count(_.startsWith("email")) == 2)
  }

  test("variable-width wire LSNs order numerically after canonicalization, not lexicographically") {
    import java.nio.file.Files
    // pg prints LSN halves WITHOUT leading zeros (the reference logs
    // '0/16B2D80'): '0/9' > '0/10' lexicographically, and the hi half
    // crosses its own width boundary at '1/0'. The projection
    // canonicalizes to %08X/%08X so every downstream string compare
    // (windows, CAS, JDBC '<') is numerically correct.
    def img(fn: String) =
      s""""new": {"id": 1, "first_name": "$fn", "last_name": "x", "date_of_birth": "1990-01-01", "status_id": 1}"""
    val lines = Seq(
      s"""{"lsn": "0/9", "tag": "insert", "table": "students", ${img("first")}}""",
      s"""{"lsn": "0/10", "tag": "update", "table": "students", ${img("second")}}""",
      s"""{"lsn": "0/16b2d80", "tag": "update", "table": "students", ${img("third")}}""",
      s"""{"lsn": "0/FFFFFFFF", "tag": "update", "table": "students", ${img("fourth")}}""",
      s"""{"lsn": "1/0", "tag": "update", "table": "students", ${img("final")}}""")
    val dir = Files.createTempDirectory("graft_varlsn")
    val f = dir.resolve("events.jsonl")
    Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val projected = Envelope.project(
      spark.read.schema(Envelope.schema).json(f.toString))
    // canonical output format, lowercase input included
    val lsns = projected.select("lsn").collect().map(_.getString(0)).toSet
    assert(lsns == Set("00000000/00000009", "00000000/00000010", "00000000/016B2D80",
      "00000000/FFFFFFFF", "00000001/00000000"), lsns.toString)
    // last-image winner must be the numerically-latest event, which is
    // lexicographically SMALLEST in raw wire form ('1/0')
    val winner = Envelope.lastImageByKey(projected).collect()
    assert(winner.length == 1 &&
      winner.head.getString(winner.head.fieldIndex("firstName")) == "final",
      winner.mkString(","))
  }

  test("a malformed LSN fails the projection loudly instead of sorting as garbage") {
    import java.nio.file.Files
    // slash-less / non-hex LSNs would conv() to null halves and format
    // as arbitrary-sorting strings — silent mis-ordering, the opposite
    // of the engine's fail-loudly guards
    val line =
      s"""{"lsn": "LSN:0/16B2D80", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "a", "last_name": "b", "date_of_birth": "1990-01-01", "status_id": 1}}"""
    val dir = Files.createTempDirectory("graft_badlsn")
    val f = dir.resolve("events.jsonl")
    Files.write(f, line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[Exception] {
      Envelope.project(spark.read.schema(Envelope.schema).json(f.toString)).collect()
    }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs(e).contains("malformed LSN") && msgs(e).contains("LSN:0/16B2D80"), msgs(e))
  }

  private def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")

  private def projectLines(lines: String*): org.apache.spark.sql.DataFrame = {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_cdcline")
    val f = dir.resolve("events.jsonl")
    Files.write(f, lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Envelope.project(spark.read.schema(Envelope.schema).json(f.toString))
  }

  test("a truncate event fails the projection loudly — it cannot be applied incrementally") {
    // a FOR ALL TABLES publication replicates TRUNCATE by default; the
    // reference's mapper silently drops imageless events
    // (customMapper.ts:16-24), which for a truncate means state keeps
    // every row the source just removed. The engine refuses instead:
    // the operator must re-snapshot and restart.
    val e = intercept[Exception] {
      projectLines(
        s"""{"lsn": "0/10", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "a", "last_name": "b", "date_of_birth": "1990-01-01", "status_id": 1}}""",
        s"""{"lsn": "0/20", "tag": "truncate", "table": "students"}""").collect()
    }
    assert(msgs(e).contains("unsupported CDC tag") && msgs(e).contains("truncate"), msgs(e))
  }

  test("a corrupt envelope line fails loudly instead of being silently dropped") {
    // PERMISSIVE JSON parsing turns a garbled line into an all-null
    // envelope; the old null-unaware tag filter dropped it — a lost
    // change event silently diverging the state. The null tag now
    // reaches the projection's tag gate and raises.
    // whichever guard fires first (the all-null row trips the LSN gate
    // before the tag gate), the batch fails loudly — silence is the bug
    def loud(m: String): Boolean =
      m.contains("unsupported CDC tag") || m.contains("malformed LSN")
    val e = intercept[Exception] {
      projectLines("""{"lsn": "0/10", "tag": "ins""").collect()
    }
    assert(loud(msgs(e)), msgs(e))
    // same through the kafka-style from_json edge
    import spark.implicits._
    val e2 = intercept[Exception] {
      Envelope.project(Envelope.parse(
        Seq("""{"half an envel""").toDF("value"))).collect()
    }
    assert(loud(msgs(e2)), msgs(e2))
  }

  test("an event with a NULL key fails the projection loudly instead of silently duplicating downstream") {
    // a null key matches no null-unsafe join: the row would re-insert
    // a duplicate on every at-least-once redelivery
    val e = intercept[Exception] {
      projectLines("""{"lsn": "0/10", "tag": "delete", "table": "students", "old": {}}""").collect()
    }
    assert(msgs(e).contains("NULL key"), msgs(e))
  }

  test("materializeChunks stamps every chunk strictly in the past, even at max chunk count") {
    // one line per chunk is the worst case for the stamp budget: the
    // most chunks, the widest stride span (incl. duplicate-chunk +1s)
    val dir = Fixture.materializeChunks(Fixture.jsonLines.size,
      duplicateChunk = Some(Fixture.jsonLines.size - 1))
    val now = System.currentTimeMillis()
    val files = new java.io.File(dir).listFiles().toSeq
    assert(files.size == Fixture.jsonLines.size + 1, "precondition: per=1 chunking + dup")
    val future = files.filter(_.lastModified() >= now)
    assert(future.isEmpty,
      s"chunk mod times must be strictly past, got future stamps: ${future.map(_.getName)}")
    // and still strictly increasing in replay order (mod-time ordering
    // is what FileStreamSource sorts pending files by)
    val ordered = files.sortBy(_.getName).map(_.lastModified())
    assert(ordered == ordered.sorted && ordered.distinct == ordered)
  }

  test("A5 full-old-image (REPLICA IDENTITY FULL): updates/deletes carry the pre-change row as oldXxx") {
    import spark.implicits._
    val lines = Seq(
      """{"lsn": "0/00000010", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "Ada", "last_name": "Lovelace", "date_of_birth": "1815-12-10", "status_id": 1}}""",
      """{"lsn": "0/00000020", "tag": "update", "table": "students", "new": {"id": 1, "first_name": "Ada", "last_name": "Byron", "date_of_birth": "1815-12-10", "status_id": 2}, "old": {"id": 1, "first_name": "Ada", "last_name": "Lovelace", "date_of_birth": "1815-12-10", "status_id": 1}}""",
      """{"lsn": "0/00000030", "tag": "delete", "table": "students", "old": {"id": 1, "first_name": "Ada", "last_name": "Byron", "date_of_birth": "1815-12-10", "status_id": 2}}""")
    val out = Envelope.project(
        spark.read.schema(Envelope.schemaFullOld).json(lines.toDS))
      .orderBy(col("lsn")).collect()
    // insert: no pre-change image
    assert(out(0).getAs[String]("oldLastName") == null && out(0).getAs[String]("lastName") == "Lovelace")
    // update: before/after side by side, old side under the NEW side's
    // rename/cast conventions (oldStatus, oldDateOfBirth as DATE)
    assert(out(1).getAs[String]("lastName") == "Byron")
    assert(out(1).getAs[String]("oldLastName") == "Lovelace")
    assert(out(1).getAs[Int]("status") == 2 && out(1).getAs[Int]("oldStatus") == 1)
    assert(out(1).getAs[java.sql.Date]("oldDateOfBirth") == java.sql.Date.valueOf("1815-12-10"))
    // delete: the full final image of the removed row rides in old
    assert(out(2).getAs[String]("oldLastName") == "Byron" && out(2).getAs[String]("lastName") == null)
    assert(out(2).getAs[Long]("id") == 1L)
    // a default-identity (key-only old) stream is byte-for-byte unchanged:
    // the old image contributes NO columns
    val keyOnly = Envelope.project(spark.read.schema(Envelope.schema).json(lines.toDS))
    assert(!keyOnly.columns.exists(_.toLowerCase.startsWith("old")), keyOnly.columns.mkString(","))
  }

  test("full-old projection refuses a drifted new field that shadows an old-image output") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val driftedNew = StructType(Envelope.rowImage.fields :+ StructField("old_first_name", StringType))
    val sch = StructType(Envelope.schemaFullOld.fields.map {
      case f if f.name == "new" => StructField("new", driftedNew)
      case f => f
    })
    val line = """{"lsn": "0/00000010", "tag": "insert", "table": "students", "new": {"id": 1, "first_name": "A", "last_name": "B", "date_of_birth": "2000-01-01", "status_id": 1, "old_first_name": "X"}}"""
    val e = intercept[IllegalArgumentException] {
      Envelope.project(spark.read.schema(sch).json(Seq(line).toDS))
    }
    assert(e.getMessage.contains("oldFirstName"), e.getMessage)
  }

  test("q50 SCD2 intervals are non-overlapping and its current rows equal q19's fold") {
    val hist = graft.queries.Advanced.q50.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        (r.getString(3), r.getString(4), String.valueOf(r.getDate(5)), r.getInt(6)),
        r.getInt(7)))
    // interval laws per key: strictly advancing, non-overlapping; a
    // gap is legal only across a delete (close-then-reinsert)
    hist.groupBy(_._1).values.foreach { rows0 =>
      val rows = rows0.sortBy(_._2).toSeq
      rows.sliding(2).foreach {
        case Seq((_, _, to, _, _), (_, from2, _, _, _)) =>
          assert(to.nonEmpty && to.get <= from2,
            "every non-final image must be closed at or before its successor opens")
        case _ =>
      }
      assert(rows.init.forall(_._3.nonEmpty), "only the final image may be open")
      assert(rows.count(_._5 == 1) <= 1, "at most one current row per key")
      rows.foreach { case (_, from, to, _, cur) =>
        assert(to.forall(_ > from), "intervals are non-empty")
        assert((cur == 1) == to.isEmpty, "is_current marks exactly the open interval")
      }
    }
    // train of record: the open intervals ARE q19's last-image fold
    val current = hist.filter(_._5 == 1).map(t => t._1 -> t._4).toMap
    val fold = graft.queries.Advanced.q19.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), String.valueOf(r.getDate(3)), r.getInt(4))).toMap
    assert(current == fold,
      "SCD2's open intervals must equal the last-image materialization")
  }

  test("scd2AsOf time-travel: asOf(max) equals the q19 fold, asOf(mid) equals the prefix replay, asOf(pre-history) is empty") {
    import org.apache.spark.sql.functions.col
    val hist = graft.queries.Advanced.q50.fn(spark, sf)
    def imageMap(df: org.apache.spark.sql.DataFrame): Map[Long, (String, String, String, Int)] =
      df.select(col("id"), col("firstName"), col("lastName"),
          col("dateOfBirth"), col("status")).collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2), String.valueOf(r.getDate(3)), r.getInt(4))).toMap
    // the raw numeric-LSN event log, for picking cut points and the
    // prefix-replay reference
    val ev = Envelope.project(
        spark.read.schema(Envelope.schema).json(Fixture.materialize()))
      .filter(col("tag").isin("insert", "update", "delete"))
      .withColumn("lsn_n", Envelope.lsnNumeric(col("lsn")))
      .persist()
    val lsns = ev.select(col("lsn_n")).collect().map(_.getLong(0)).sorted
    // asOf at (and past) the last event == the last-image fold
    assert(imageMap(Envelope.scd2AsOf(hist, lsns.last)) ==
      imageMap(Envelope.lastImageByKey(ev.drop("lsn_n"))),
      "asOf(max LSN) must equal the full last-image fold")
    // asOf at a mid-log cut == the fold of exactly the prefix
    val mid = lsns(lsns.length / 2)
    assert(imageMap(Envelope.scd2AsOf(hist, mid)) ==
      imageMap(Envelope.lastImageByKey(ev.filter(col("lsn_n") <= mid).drop("lsn_n"))),
      "asOf(mid LSN) must replay exactly the event prefix")
    // before the first event there is no table
    assert(Envelope.scd2AsOf(hist, lsns.head - 1).isEmpty,
      "asOf before history begins must be empty")
    ev.unpersist()
  }
}
