package graft

import org.apache.spark.sql.functions._
import graft.cdc.Envelope
import graft.streaming.Kafka

/** Kafka wiring (SURVEY §2 B.1 — the reference's Event Hub transport,
  * `main.ts:54-90`), tested to the boundary the environment allows:
  * the wire-record shape round-trips offline, and the connector-gated
  * builders refuse LOUDLY (naming the missing artifact) instead of
  * surfacing Spark's generic lookup failure at `.load()`. On a
  * cluster that ships spark-sql-kafka-0-10 the same suite exercises
  * the builder path instead — the gate is [[Kafka.connectorAvailable]],
  * not a hardcoded assumption about this sandbox. */
class KafkaSpec extends SparkSuite {

  test("toKafkaRecords: key/value shape round-trips through Envelope.parse") {
    import spark.implicits._
    val events = Seq(
      ("00000000/016B2D80", "insert", "students", 1L, "ada"),
      ("00000000/016B2D90", "update", "students", 2L, "grace"))
      .toDF("lsn", "tag", "table", "id", "first_name")
      .select(col("lsn"), col("tag"), col("table"),
        struct(col("id"), col("first_name")).as("new"))
    val records = Kafka.toKafkaRecords(events.select(col("lsn"), col("tag"),
      col("table"), col("new"), col("new.id").as("id")), "id")

    assert(records.columns.toSeq == Seq("key", "value"))
    val rows = records.orderBy("key").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2"))

    // the value is the full row as JSON — the consumer edge
    // (Envelope.parse) must read back exactly what went in
    val schema = org.apache.spark.sql.types.StructType(
      Envelope.schema.fields.filterNot(_.name == "old"))
    val back = Envelope.parse(records, "value", schema)
      .select("lsn", "tag", "table", "new.id", "new.first_name")
      .orderBy("id").collect()
    assert(back.map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getString(4))).toSeq ==
      Seq(("00000000/016B2D80", "insert", 1L, "ada"),
          ("00000000/016B2D90", "update", 2L, "grace")))
  }

  test("toKafkaRecords: missing key column refused at build, NULL key refused per-row") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val e = intercept[IllegalArgumentException](Kafka.toKafkaRecords(df, "nope"))
    assert(e.getMessage.contains("key column 'nope'"))

    val withNull = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("id", "v")
    val err = intercept[Exception](Kafka.toKafkaRecords(withNull, "id").collect())
    assert(err.getMessage.contains("NULL kafka record key"),
      s"expected the per-row null-key refusal, got: ${err.getMessage}")
  }

  test("connectorAvailable: null context classloader does not change the answer") {
    // A null TCCL sends Class.forName to the bootstrap loader, which
    // cannot see the application classpath — the probe must fall back
    // to its own loader, or a cluster that DOES ship the connector
    // would be falsely refused (round-12 advice item).
    val expected = Kafka.connectorAvailable
    var observed: Option[Boolean] = None
    val t = new Thread(() => observed = Some(Kafka.connectorAvailable))
    t.setContextClassLoader(null)
    t.start(); t.join(30000)
    assert(observed.contains(expected),
      s"null-TCCL probe answered $observed, main-thread answer was $expected")
  }

  test("connector-gated builders: loud refusal without the jar, buildable with it") {
    if (!Kafka.connectorAvailable) {
      val src = intercept[IllegalStateException](
        Kafka.envelopeSource(spark, "broker:9092", "cdc.students"))
      assert(src.getMessage.contains("spark-sql-kafka-0-10"),
        s"refusal must name the missing artifact, got: ${src.getMessage}")
      assert(src.getMessage.contains("kafka source"))

      val snk = intercept[IllegalStateException] {
        import spark.implicits._
        Kafka.envelopeSink(Seq((1L, "a")).toDF("id", "v"),
          "broker:9092", "cdc.students", "/tmp/unused-ckpt")
      }
      assert(snk.getMessage.contains("spark-sql-kafka-0-10"))
      assert(snk.getMessage.contains("kafka sink"))
    } else {
      // with the connector present the builders must construct without
      // touching the network (connection happens at query start)
      import spark.implicits._
      val src = Kafka.envelopeSource(spark, "broker:9092", "cdc.students")
      assert(src.isStreaming && src.columns.contains("tag"))
      Kafka.envelopeSink(Seq((1L, "a")).toDF("id", "v"),
        "broker:9092", "cdc.students", "/tmp/unused-ckpt")
    }
  }
}
