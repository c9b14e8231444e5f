package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  private val left = Seq(
    (1L, ts(100), "L100"), (1L, ts(200), "L200"), (2L, ts(50), "L50"))
    .toDF("k", "ts", "lval")
  private val right = Seq(
    (1L, ts(100), 10L), (1L, ts(150), 11L), (1L, ts(150), 12L), (3L, ts(10), 99L))
    .toDF("k", "ts", "rid")

  test("inclusive as-of picks latest right at-or-before left ts; ties -> max tiebreak") {
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("rid"), "rid")
      .select($"lval", $"asof_rid").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("L100") == Some(10L)) // equal ts visible when inclusive
    assert(out("L200") == Some(12L)) // tie at 150 -> max rid wins
    assert(out("L50") == None)       // no right rows for k=2
  }

  test("strict as-of excludes equal-ts right rows") {
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("rid"), "rid", inclusive = false)
      .select($"lval", $"asof_rid").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("L100") == None)      // 100 == 100 no longer matches
    assert(out("L200") == Some(12L))
  }

  test("all left rows and columns are preserved") {
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("rid"), "rid")
    assert(out.count() == left.count())
    assert(out.columns.toSet == Set("k", "ts", "lval", "asof_rid"))
  }
}
