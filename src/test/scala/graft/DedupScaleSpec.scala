package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Pins the O(log diameter) convergence claim of
  * Dedup.connectedComponents with DETERMINISTIC round counts (graph
  * shape fixes the round count exactly — no timing, no flake). The
  * wall-clock side of the scale argument lives in graft.ScaleSmoke
  * (a main, recorded in SCALE.md) because elapsed time on a shared
  * box is not an assertable quantity.
  */
class DedupScaleSpec extends SparkSuite {
  import spark.implicits._

  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")

  test("a 16x longer chain costs only ~log2(16)=4 extra rounds (pointer doubling)") {
    // plain min-propagation needs O(diameter) rounds: 255 for the long
    // chain below (the round-4 pre-fix implementation measured exactly
    // that). Pointer doubling halves remaining depth per round, so the
    // diameter-16x step must cost ~log2(16)=4 extra rounds, not 240.
    val (cShort, rShort) = Dedup.connectedComponentsWithRounds(chain(15), "a", "b")
    val (cLong, rLong) = Dedup.connectedComponentsWithRounds(chain(255), "a", "b")
    assert(cShort.select("cluster_rep").distinct().count() == 1)
    assert(cLong.select("cluster_rep").distinct().count() == 1)
    assert(cLong.filter(col("cluster_rep") =!= 0L).count() == 0,
      "every vertex of the chain must resolve to min id 0")
    assert(rLong <= 12, s"chain-256 must converge in O(log d) rounds, took $rLong")
    assert(rLong - rShort <= 6,
      s"16x diameter must cost ~4 extra rounds, went $rShort -> $rLong")
  }

  test("a star graph (diameter 2) converges in a constant handful of rounds at any width") {
    for (width <- Seq(10, 1000)) {
      val star = (1 to width).map(i => (0L, i.toLong)).toDF("a", "b")
      val (comps, rounds) = Dedup.connectedComponentsWithRounds(star, "a", "b")
      assert(comps.count() == width + 1)
      assert(comps.filter(col("cluster_rep") =!= 0L).count() == 0)
      assert(rounds <= 4,
        s"star($width) has diameter 2; rounds must not grow with width, took $rounds")
    }
  }

  test("many disjoint components resolve in parallel without extra rounds") {
    // 50 disjoint 8-chains: rounds are governed by the LARGEST
    // diameter, not the component count — the property that lets a
    // 100 TB corpus with millions of small dup-clusters converge in
    // single-digit rounds.
    val edges = (0 until 50).flatMap { c =>
      val base = c * 100L
      (0 until 7).map(i => (base + i, base + i + 1))
    }.toDF("a", "b")
    val (comps, rounds) = Dedup.connectedComponentsWithRounds(edges, "a", "b")
    assert(comps.select("cluster_rep").distinct().count() == 50)
    val (_, roundsOne) = Dedup.connectedComponentsWithRounds(chain(7), "a", "b")
    assert(rounds <= roundsOne + 1,
      s"50 disjoint 8-chains must take the same rounds as one ($roundsOne), took $rounds")
  }

  test("string vertex ids converge to correct components (witness must be type-agnostic)") {
    // the old convergence witness was sum(cast(lbl as decimal)): for
    // string/UUID ids the cast nulled out, the 'empty graph' exit fired
    // after round 1, and a chain came back split into several clusters
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
      .toDF("a", "b")
    val (comps, _) = Dedup.connectedComponentsWithRounds(edges, "a", "b")
    val byMember = comps.collect()
      .map(r => r.getString(r.fieldIndex("member")) -> r.getString(r.fieldIndex("cluster_rep")))
      .toMap
    assert(Set("a", "b", "c", "d").map(byMember) == Set("a"),
      s"the 4-chain must collapse to one representative: $byMember")
    assert(Set("x", "y").map(byMember) == Set("x"), byMember.toString)
  }
}
