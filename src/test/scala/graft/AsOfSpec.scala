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

  test("as-of equals the brute-force definition on randomized inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val ls = (1 to 120).map(i =>
        (rnd.nextInt(6).toLong, ts(rnd.nextInt(500)), s"l$i"))
      val rs = (1 to 150).map(i =>
        (rnd.nextInt(6).toLong, ts(rnd.nextInt(500)), i.toLong))
      val l = ls.toDF("k", "ts", "lval")
      val r = rs.toDF("k", "ts", "rid")
      val got = AsOf.join(l, r, Seq("k"), "ts", "ts", Seq("rid"), "rid")
        .select($"lval", $"asof_rid").collect()
        .map(x => x.getString(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
      ls.foreach { case (k, t, lv) =>
        val cand = rs.filter(x => x._1 == k && !x._2.after(t))
        val expect =
          if (cand.isEmpty) None
          else Some(cand.maxBy(x => (x._2.getTime, x._3))._3)
        assert(got(lv) == expect, s"trial=$trial key=$k ts=$t")
      }
    }
  }

  test("all left rows and columns are preserved") {
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("rid"), "rid")
    assert(out.count() == left.count())
    assert(out.columns.toSet == Set("k", "ts", "lval", "asof_rid"))
  }

  test("a right row with NULL event time matches NO left row (nulls-first sort must not leak it everywhere)") {
    // ascending sort puts nulls FIRST: an unguarded null-ts right row
    // sorts to the partition start and last(ignoreNulls) would carry
    // its payload into every left row — the window-emulation oracle
    // (`right.ts <= left.ts` is false for null) matches none
    val r = Seq(
      (1L, Option.empty[java.sql.Timestamp], 99L),
      (1L, Option(ts(150)), 11L))
      .toDF("k", "ts", "rid")
    val out = AsOf.join(left, r, Seq("k"), "ts", "ts", Seq("rid"), "rid")
      .select($"lval", $"asof_rid").collect().map(x => x.getString(0) -> Option(x.get(1))).toMap
    assert(out("L100") == None, "no right row at-or-before 100 — the null-ts row must not match")
    assert(out("L200") == Some(11L))
  }

  test("a string tiebreak resolves ties in its native collation, not via a nulling bigint cast") {
    // the old cast-to-bigint nulled string tiebreaks: both tie rows
    // landed in the nulls group and the winner was arbitrary
    val r = Seq(
      (1L, ts(150), "evt-a", 1L), (1L, ts(150), "evt-b", 2L))
      .toDF("k", "ts", "tb", "rid")
    val out = AsOf.join(left, r, Seq("k"), "ts", "ts", Seq("rid"), "tb")
      .select($"lval", $"asof_rid").collect().map(x => x.getString(0) -> Option(x.get(1))).toMap
    assert(out("L200") == Some(2L), "'evt-b' > 'evt-a' must win the tie")
  }
}
