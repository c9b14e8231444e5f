package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.cdc.Fixture

/** Property-based checks (SURVEY §5.4) via raw ScalaCheck generators
  * (no scalatestplus bridge in the offline cache). Spark-touching
  * properties keep the case count small; pure-Scala generator
  * properties run wide.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("fixture LSNs are unique, monotone, fixed-width") {
    val lsns = Fixture.rowEvents.map(_.lsn)
    assert(lsns.distinct.size == lsns.size)
    assert(lsns == lsns.sorted)
    assert(lsns.forall(_.matches("0/[0-9A-F]{8}")))
  }

  test("union-all length equals sum of lengths; dedup is idempotent") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 20)), 10).foreach { xs =>
      val df = xs.toDF("x")
      assert(df.union(df).count() == 2L * xs.size)
      val once = df.distinct()
      assert(once.count() == once.distinct().count())
      assert(once.count() == xs.distinct.size)
    }
  }

  test("filter-then-project equals project-then-filter on disjoint columns") {
    val df = graft.sources.Tables.orders(spark, sf)
    val a = df.filter(col("o_totalprice") > 100000).select(col("o_orderkey"), col("o_totalprice"))
    val b = df.select(col("o_orderkey"), col("o_totalprice")).filter(col("o_totalprice") > 100000)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("salted join is factor-invariant (factor 1 == factor 7 == plain join)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id")).limit(500)
    val dim = (0L until 20L).map(i => (i, s"seg_$i")).toDF("user_id", "seg")
    val plain = ev.join(dim, Seq("user_id")).select(col("event_id"), col("seg"))
    Seq(1, 7).foreach { f =>
      val s = graft.ops.Layout.saltedJoin(ev, dim, Seq("user_id"), f, col("event_id"))
        .select(col("event_id"), col("seg"))
      assert(s.exceptAll(plain).isEmpty && plain.exceptAll(s).isEmpty, s"factor=$f")
    }
  }

  test("rolling-hash fingerprint is order-sensitive; content md5 is not") {
    samples(Gen.listOfN(6, Gen.alphaLowerStr.suchThat(_.nonEmpty)), 8)
      .filter(ws => ws.distinct.size > 1).foreach { ws =>
        val fwd = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
        val rev = Seq((1L, ws.reverse.mkString(" "))).toDF("doc_id", "text")
        def fp(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("toks", expr(graft.functions.TextFns.tokensExpr("text")))
          .select(expr(graft.functions.TextFns.rollingHashExpr("toks")))
          .first().getLong(0)
        assert(fp(fwd) != fp(rev), s"hash should depend on order: $ws")
      }
  }

  test("minhash is invariant under duplication and permutation of the hash multiset") {
    // min over a multiset ignores order and duplicates — the property
    // the p5/p6 dictionary rewrites rely on
    val t = graft.functions.TextFns
    def sig(hs: Seq[Long]): Seq[Long] = {
      val r = Seq(Tuple1(hs)).toDF("hs")
        .select((0 until 4).map(k => expr(t.minhashExpr("hs", k))): _*)
        .first()
      (0 until 4).map(r.getLong)
    }
    samples(Gen.nonEmptyListOf(Gen.choose(0L, t.minhashP - 1)), 10).foreach { hs =>
      val base = sig(hs)
      assert(sig(hs.reverse) == base, s"permutation changed signature: $hs")
      assert(sig(hs ++ hs.take(2)) == base, s"duplication changed signature: $hs")
    }
  }

  test("windowed counts sum to total count (q20 invariant)") {
    val total = graft.sources.Tables.events(spark, sf).count()
    val windowed = graft.queries.Advanced.q20.fn(spark, sf)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(windowed == total)
  }

  test("connectedComponents equals union-find on random graphs") {
    // reference: in-test weighted-less union-find over the same edges
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // min-id representative per component
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = verts.groupBy(find)
      byRoot.flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }.toMap
    }
    val edgeGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 29L); b <- Gen.choose(0L, 29L) if a != b
    } yield (a, b))
    samples(edgeGen, 6).foreach { edges =>
      val got = graft.ops.Dedup.connectedComponents(
          edges.toDF("da", "db"), "da", "db")
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      assert(got == unionFind(edges), s"edges=$edges")
    }
  }

  test("zorderCol matches a reference bit-interleave on random pairs") {
    def ref(a: Int, b: Int): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((a.toLong >> i) & 1L) << (2 * i)
        z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val pairs = samples(Gen.zip(Gen.choose(0, Int.MaxValue), Gen.choose(0, Int.MaxValue)), 50)
    val got = pairs.toDF("a", "b")
      .select(graft.ops.Layout.zorderCol(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == ref(a, b), s"($a,$b)")
    }
  }

  test("kernel and expanded k-means argmax agree on arbitrary vectors and centroids") {
    // Fuzz the strategy-parity contract (KMeansSpec pins it on one
    // fixture): random non-zero float vectors vs random non-zero
    // centroid matrices, including tiny/huge magnitudes — cluster AND
    // rounded cosine must match bit-for-bit, or the K·dim threshold
    // switch would silently change fit trajectories.
    graft.expressions.VectorExpressions.register(spark)
    val dim = 8
    val vecGen = Gen.listOfN(dim, Gen.oneOf(
      Gen.choose(-1f, 1f), Gen.choose(-1e6f, 1e6f), Gen.choose(-1e-6f, 1e-6f)))
      .map(_.toArray).suchThat(v => v.exists(_ != 0f))
    for (round <- 0 until 5) {
      val k = 2 + round
      val cents = samples(vecGen, k).map(_.map(_.toDouble))
      if (cents.size == k && cents.forall(c => c.exists(_ != 0.0))) {
        val vecs = samples(vecGen, 40).zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val df = vecs.toDF("vec_id", "embedding").withColumn("__nrm",
          expr(graft.functions.VectorFns.fastNormExpr("embedding")))
        val (cE, sE) = graft.ops.KMeans.bestClusterExpanded("embedding", "__nrm", cents.toArray)
        val (cK, sK) = graft.ops.KMeans.bestClusterKernel(spark, "embedding", cents.toArray)
        val diff = df.select(col("vec_id"), cE.as("clE"), sE.as("coE"), cK.as("clK"), sK.as("coK"))
          .filter(col("clE") =!= col("clK") || col("coE") =!= col("coK"))
        assert(diff.isEmpty,
          s"round $round (k=$k): strategies disagree:\n${diff.limit(5).collect().mkString("\n")}")
      }
    }
  }
}
