package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.queries.{Advanced, Pipeline}
import graft.sources.Tables

class PipelineSpec extends SparkSuite {

  test("exact n-gram Jaccard finds the planted near-duplicates") {
    val pairs = Pipeline.p7.fn(spark, sf).collect()
    assert(pairs.nonEmpty, "generator plants >=1 near-dup pair per corpus")
    assert(pairs.forall(_.getDouble(2) >= 0.8))
  }

  test("minhash-LSH candidates are a subset of exact pairs, with high recall here") {
    val exact = Pipeline.p7.fn(spark, sf).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Pipeline.p6.fn(spark, sf).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty)
  }

  test("connected components: chain + triangle + pair resolve to min-id clusters") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, exercises pointer doubling), triangle
    // 10-11-12 with a redundant edge, isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("da", "db")
    val cc = graft.ops.Dedup.connectedComponents(pairs, "da", "db")
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    val surv = graft.ops.Dedup.survivors(
      graft.ops.Dedup.connectedComponents(pairs, "da", "db"))
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 10L, 20L))
  }

  test("p13 clusters are consistent with p6 pairs: every pair co-clusters") {
    val pairs = Pipeline.p6.fn(spark, sf).select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cluster = Pipeline.p13.fn(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(pairs.nonEmpty && cluster.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // every representative is a member of its own cluster
    cluster.values.foreach(rep => assert(cluster(rep) == rep))
  }

  test("p15 banding finds EXACTLY the brute-force hamming<=1 simhash pairs") {
    // the 2-bands-for-distance-1 pigeonhole guarantee, checked against
    // an all-pairs scan of the collected 32-bit hashes
    val hashes = Pipeline.p8.fn(spark, sf).collect() // 16-bit report ≠ p15's width
    assert(hashes.length == 500)
    val sh32 = Pipeline.p15.fn(spark, sf) // exercise the query first
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sh32.forall(_._3 <= 1))
    // brute force over the same 32-bit hashes the query uses
    val h = graft.queries.Pipeline.simhash32ForTest(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val brute = for {
      i <- h.indices; j <- (i + 1) until h.length
      ham = h(i)._2.zip(h(j)._2).count { case (x, y) => x != y }
      if ham <= 1
    } yield (h(i)._1, h(j)._1, ham)
    assert(sh32.toSet == brute.toSet,
      s"banded=${sh32.length} brute=${brute.length}")
  }

  test("p14 survivors reconcile with p13 components per corpus") {
    val comps = Pipeline.p13.fn(spark, sf).collect()
    val nRemoved = comps.count(r => r.getLong(0) != r.getLong(1))
    val sums = Pipeline.p14.fn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val (total, surv) = sums.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(total - surv == nRemoved,
      s"total=$total survivors=$surv removed-by-components=$nRemoved")
  }

  test("simhash is 16 bits of 0/1 and identical for identical token streams") {
    val rows = Pipeline.p8.fn(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getString(1).matches("[01]{16}")))
  }

  test("HLL approx distinct within 5% of exact (q16h tolerance band)") {
    Advanced.q16h.fn(spark, sf).collect().foreach { r =>
      val (exactU, approxU) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approxU - exactU).toDouble / exactU <= 0.05,
        s"approx=$approxU exact=$exactU")
    }
  }

  test("multimodal: stub feature extraction is deterministic with fixed shape") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    assert(f1.length == 500)
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(m => m.features.forall(v => v >= 0.0f && v < 1.0f)))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.n_bytes == b.n_bytes && a.features.sameElements(b.features) })
  }

  test("IVF ANN candidates come only from probed lists and recall the exact top-1") {
    val exact = graft.queries.Advanced.q18.fn(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("rn")),
        r.getLong(r.fieldIndex("cid"))))
    val ivf = graft.queries.Pipeline.p12.fn(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("rn")),
        r.getLong(r.fieldIndex("cid"))))
    assert(ivf.nonEmpty && ivf.map(_._1).distinct.length == 5)
    // recall@3 vs brute force: on this corpus the probed lists must
    // recover at least half of each query's exact top-3
    val exactByQ = exact.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val ivfByQ = ivf.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    exactByQ.foreach { case (qid, ex) =>
      val hit = ivfByQ.getOrElse(qid, Set.empty).intersect(ex).size
      assert(hit * 2 >= ex.size, s"qid=$qid recall@3 too low: $hit of ${ex.size}")
    }
  }

  test("LSH recall knob: fewer hyperplanes -> bigger buckets -> more candidates and no worse recall") {
    // The parameter trade SCALE.md's ANN table points at: plane count
    // buys candidate-volume reduction at the price of recall. Computed
    // with the SAME bucket expression p10 uses, at 4 planes (p10's
    // setting, 16 buckets) vs 2 planes (4 buckets), against the exact
    // top-3 (q18).
    import org.apache.spark.sql.expressions.Window
    graft.expressions.VectorExpressions.register(spark)
    val exact = graft.queries.Advanced.q18.fn(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("cid")))).toSet
    def lshRun(nPlanes: Int): (Long, Set[(Long, Long)]) = {
      val bkt = graft.functions.VectorFns.lshBucketExpr("embedding", nPlanes, 64)
      val e = graft.sources.Tables.embeddings(spark, sf).select(
        col("vec_id"), col("embedding"), expr(bkt).as("bkt"),
        expr(graft.functions.VectorFns.fastNormExpr("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("bkt").as("qbkt"), col("nrm").as("qn"))
      val cand = e.join(broadcast(q), col("bkt") === col("qbkt") && col("vec_id") =!= col("qid"))
      val n = cand.count()
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val top = cand
        .withColumn("cos", round(expr(graft.functions.VectorFns.fastDotExpr("embedding", "qe")) / (col("nrm") * col("qn")), 6))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (n, top)
    }
    val (cand4, top4) = lshRun(4)
    val (cand2, top2) = lshRun(2)
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    assert(cand2 > cand4,
      s"halving the planes must grow the scored candidate set: $cand2 vs $cand4")
    assert(recall(top2) >= recall(top4),
      s"recall must not degrade with bigger buckets: ${recall(top2)} vs ${recall(top4)}")
    assert(recall(top2) > 0.0 && cand4 > 0)
  }

  test("multimodal: resize caps payload size, passes small payloads through, stays deterministic") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf).limit(50))
    val sizes = media.select(col("doc_id"), octet_length(col("media")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val resized = Multimodal.resize(media, targetBytes = 100)
    val out = resized.select(col("doc_id"), col("media")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    out.foreach { case (id, bytes) =>
      if (sizes(id) <= 100) assert(bytes.length == sizes(id), s"doc $id must pass through")
      else assert(bytes.length == 100, s"doc $id must cap at target")
    }
    val again = Multimodal.resize(media, targetBytes = 100)
      .select(col("doc_id"), col("media")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.keySet == again.keySet &&
      out.forall { case (id, b) => java.util.Arrays.equals(b, again(id)) })
  }

  test("multimodal: frame sampling emits every k-th fixed-size chunk") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf).limit(10))
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyK = 4)
    val counts = frames.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
    val sizes = media.select(col("doc_id"), octet_length(col("media")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { r =>
      val expected = (math.ceil(sizes(r.getLong(0)) / 64.0).toInt + 3) / 4
      assert(r.getLong(1) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("sequence packing surfaces overflow: oversize docs counted, boundary spill visible") {
    import spark.implicits._
    // budget 10: doc 1 (4 tok) + doc 2 (5 tok) fill pack 0 to 9; doc 3
    // (3 tok) STARTS at cum 9 < 10 so it spills pack 0 to 12 tokens —
    // the documented cum-binning approximation. doc 4 (12 tok) alone
    // exceeds the budget: it can never fit and must be flagged.
    val docs = Seq(
      (1L, "en", "a b c d"),
      (2L, "en", "e f g h i"),
      (3L, "en", "j k l"),
      (4L, "en", "m n o p q r s t u v w x")).toDF("doc_id", "lang", "text")
    val m = graft.queries.Pipeline.packManifest(docs, budget = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    // pack 0: docs 1–3, 12 tokens (boundary spill), no oversize member
    assert(m(0L).getAs[Long]("n_docs") == 3L)
    assert(m(0L).getAs[Long]("pack_tokens") == 12L, "boundary spill must stay visible")
    assert(m(0L).getAs[Long]("n_oversize") == 0L)
    // pack 1: doc 4 starts at cum-n_tok=12 → pack 1; 12 > 10 tokens on
    // its own → n_oversize flags it for downstream split/truncate
    assert(m(1L).getAs[Long]("n_docs") == 1L)
    assert(m(1L).getAs[Long]("n_oversize") == 1L,
      "a doc longer than the budget must be flagged, not silently overflowed")
  }

  test("p21b sharded packing bounds every window partition and conserves the corpus") {
    val docs = Tables.documents(spark, sf)
    val span = 100L
    val m = graft.queries.Pipeline.packManifestSharded(docs, budget = 512, span = span).collect()
    // every (lang, shard) window partition is bounded by the id-range
    // span — the whole point of the sharded layout: no single-language
    // partition can exceed `span` docs no matter how skewed the corpus
    val perShard = m.groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum)
    perShard.foreach { case (k, n) => assert(n <= span, s"window partition $k has $n docs > $span") }
    // nothing dropped, nothing duplicated: doc and token totals match p21
    val p21m = graft.queries.Pipeline.packManifest(docs, budget = 512).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == p21m.map(_.getAs[Long]("n_docs")).sum)
    assert(m.map(_.getAs[Long]("pack_tokens")).sum == p21m.map(_.getAs[Long]("pack_tokens")).sum)
    // shard ids cover the id range deterministically
    assert(m.map(_.getLong(1)).distinct.sorted.toSeq == (0L to 4L))
  }

  test("p21b with one giant span degenerates to exactly p21 (shard 0)") {
    val docs = Tables.documents(spark, sf)
    val sharded = graft.queries.Pipeline.packManifestSharded(docs, budget = 2048, span = 1000000L)
      .drop("shard_id").collect().map(_.toSeq)
    val flat = graft.queries.Pipeline.packManifest(docs, budget = 2048).collect().map(_.toSeq)
    assert(sharded.toSeq == flat.toSeq)
  }

  test("p24 PQ-ADC: rescored cosines are exact and the coarse scan recalls the true top-1") {
    val out = graft.queries.Pipeline.p24.fn(spark, sf).collect()
    assert(out.length == 15, "5 queries x top-3")
    // the rescore stage is EXACT: every returned cosine must equal the
    // brute-force cosine for that (qid, cid) pair — PQ only prunes
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * a(i)))
      val nb = math.sqrt(b.indices.foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
      dot / (na * nb)
    }
    out.foreach { r =>
      val exact = cos(e(r.getLong(0)), e(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - exact) < 1e-6,
        s"qid=${r.getLong(0)} cid=${r.getLong(2)}: rescored ${r.getDouble(3)} vs exact $exact")
    }
    // coarse ADC recall: for each query the TRUE nearest neighbor must
    // survive the reconstructed-space rescore-pool cut (dim 64 -> 16
    // bytes is lossy; measured worst coarse rank on this corpus is 18
    // vs the pool of 32 — rank-1 survival is the useful guarantee for
    // a rescored pipeline)
    val got = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    (0L until 5L).foreach { qid =>
      val truth = e.keys.filter(_ != qid)
        .maxBy(cid => cos(e(qid), e(cid)))
      assert(got(qid).contains(truth), s"query $qid lost its true top-1 $truth")
    }
  }

  test("p24 PqEncode kernel is bit-identical to the literal-expanded strategy") {
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cb = graft.queries.Pipeline.pqCodebook(e)
    val fn = graft.expressions.VectorExpressions.registerPqEncode(spark, cb)
    val both = try {
      e.withColumn("kc", expr(s"$fn(embedding)"))
        .withColumn("xc", graft.queries.Pipeline.pqCodesExpanded(cb))
    } finally graft.expressions.VectorExpressions.dropTempFunction(spark, fn)
    val rows = both.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Int](2) == r.getSeq[Int](3),
        s"vec ${r.getLong(0)}: kernel ${r.getSeq[Int](2)} != expanded ${r.getSeq[Int](3)}")
    }
    // registration hygiene: the unique temp function is gone
    assert(!spark.catalog.functionExists(fn))
  }

  test("p24 PqEncode refuses dimension-mismatched vectors loudly") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cb = graft.queries.Pipeline.pqCodebook(e)
    val fn = graft.expressions.VectorExpressions.registerPqEncode(spark, cb)
    val ex = try {
      intercept[Exception] {
        Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
          .withColumn("c", expr(s"$fn(embedding)")).collect()
      }
    } finally graft.expressions.VectorExpressions.dropTempFunction(spark, fn)
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("dimension mismatch"), msgs)
  }

  test("p50 PqEncode kernel matches the expanded strategy on array<double> input too") {
    // the whitened-space path (p50) feeds 6-dp doubles to the kernel;
    // pin the double branch against the type-agnostic expanded plan
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> round(CAST(x AS DOUBLE), 6))").as("embedding"))
    val cb = graft.queries.Pipeline.pqCodebook(e)
    val fn = graft.expressions.VectorExpressions.registerPqEncode(spark, cb)
    val rows = try {
      e.withColumn("kc", expr(s"$fn(embedding)"))
        .withColumn("xc", graft.queries.Pipeline.pqCodesExpanded(cb))
        .collect()
    } finally graft.expressions.VectorExpressions.dropTempFunction(spark, fn)
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Int](2) == r.getSeq[Int](3),
        s"vec ${r.getLong(0)}: double-input kernel ${r.getSeq[Int](2)} != expanded ${r.getSeq[Int](3)}")
    }
  }

  test("p50 whitened-PQ self-metric recall is >= raw-PQ's (p24) on the fixture") {
    // the OPQ/variance-balancing claim the gate exists to check: each
    // stack serves a metric (p50 whitened cosine, p24 raw cosine) and
    // approximates it with the same 16-seed codebook + pool budget —
    // conditioning must make the quantizer a BETTER approximation of
    // its own metric, measured against each stack's brute-force truth
    def hits(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val p50Hits = hits(graft.queries.Pipeline.p50.fn(spark, sf).collect())
    val p24Hits = hits(graft.queries.Pipeline.p24.fn(spark, sf).collect())
    assert(p50Hits.values.map(_.size).sum == 15, "5 queries x top-3")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def truthOf(vecs: Map[Long, Array[Double]]): Map[Long, Set[Long]] =
      (0L until 5L).map { qid =>
        val q = vecs(qid)
        qid -> vecs.keys.toSeq.filter(_ != qid)
          .map(cid => (r6(cos(q, vecs(cid))), cid))
          .sortBy { case (s, cid) => (-s, cid) }.take(3).map(_._2).toSet
      }.toMap
    val rawVecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // the SHARED whitening (same helper the gate runs) is the serving
    // space — its brute force is p50's truth
    val whtVecs = graft.queries.Pipeline.whitenedEmbeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def recall(h: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
      (0L until 5L).map(q => h.getOrElse(q, Set.empty).intersect(truth(q)).size).sum / 15.0
    val r50 = recall(p50Hits, truthOf(whtVecs))
    val r24 = recall(p24Hits, truthOf(rawVecs))
    assert(r50 >= r24,
      s"whitened-PQ must approximate its own metric at least as well as raw-PQ does (p50=$r50 p24=$r24)")
    assert(r50 >= 0.8, s"whitened-PQ self-metric recall collapsed: $r50")
  }

  test("p26 domain mix hits its target weights deterministically and conserves tokens") {
    val out = graft.queries.Pipeline.p26.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val weights = Map("de" -> 2.5, "en" -> 0.25, "es" -> 1.0, "fr" -> 2.0, "zh" -> 1.5)
    weights.foreach { case (lang, w) =>
      val r = out(lang)
      val achieved = r.getAs[Double]("achieved_weight")
      // E[copies] = w exactly; with ~60-220 docs per lang and 1000
      // md5 buckets the realized rate sits within a few percent
      assert(math.abs(achieved - w) <= 0.15, s"$lang achieved $achieved vs target $w")
      // floor(w) copies are unconditional, frac(w) adds at most one
      assert(r.getAs[Long]("max_epoch") <= math.ceil(w).toLong, lang)
      // every emitted copy carries the doc's full token count: the
      // mix conserves tokens per copy (tokens_out = Σ copies·n_tok,
      // bounded by docs·⌈w⌉·max — spot-check the es identity case)
      if (w == 1.0) {
        assert(r.getAs[Long]("rows_out") == r.getAs[Long]("docs_in"), "es is the identity mix")
        assert(r.getAs[Long]("tokens_out") == r.getAs[Long]("tokens_in"))
        assert(r.getAs[Long]("docs_kept") == r.getAs[Long]("docs_in"))
      }
    }
    // downsample drops docs; upsample replicates all of them
    assert(out("en").getAs[Long]("docs_kept") < out("en").getAs[Long]("docs_in"))
    assert(out("de").getAs[Long]("docs_kept") == out("de").getAs[Long]("docs_in"))
    assert(out("de").getAs[Long]("rows_out") >= 2 * out("de").getAs[Long]("docs_in"))
    // deterministic: a second evaluation is bit-identical
    val again = graft.queries.Pipeline.p26.fn(spark, sf).collect().map(_.toSeq)
    assert(again.toSeq == graft.queries.Pipeline.p26.fn(spark, sf).collect().map(_.toSeq).toSeq)
  }

  test("p25 duplicated spans really recur across distinct docs (brute-force recount)") {
    val out = graft.queries.Pipeline.p25.fn(spark, sf).collect()
    assert(out.length == 25)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    def spansOf(t: Array[String]): Iterator[String] =
      if (t.length < 5) Iterator.empty else t.sliding(5).map(_.mkString(" "))
    out.foreach { r =>
      val span = r.getString(0)
      val inDocs = docs.count { case (_, t) => spansOf(t).contains(span) }
      val occ = docs.valuesIterator.map(t => spansOf(t).count(_ == span)).sum
      assert(inDocs.toLong == r.getLong(1), s"'$span' doc reach")
      assert(occ.toLong == r.getLong(2), s"'$span' occurrence count")
      assert(inDocs >= 2, "every reported span must cross documents")
    }
    // ranking: document reach dominates, occurrence count breaks ties
    val pairs = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, -p._2))))
  }

  test("p27 BM25 matches a brute-force single-node recount") {
    val out = Pipeline.p27.fn(spark, sf).collect()
    assert(out.length == 15)
    val terms = Seq("dup", "spark", "stream")
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      val hits = terms.count(t => toks.contains(t))
      if (hits > 0) Some((id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, hits.toLong))
      else None
    }.sortBy { case (id, s, _) => (-s, id) }.take(15)
    out.zip(expected).foreach { case (r, (id, s, hits)) =>
      assert(r.getLong(0) == id, s"rank order: got ${r.getLong(0)} want $id")
      assert(math.abs(r.getDouble(1) - s) <= 2e-6, s"doc $id score")
      assert(r.getLong(2) == hits, s"doc $id n_terms_hit")
    }
    // the rare term dominates: every doc containing 'dup' must outrank
    // every doc that only hits the two common terms (idf ~ln(20) vs ~ln(1.3))
    val dupDocs = docs.filter(_._2.contains("dup")).map(_._1).toSet
    val ranks = out.map(_.getLong(0)).zipWithIndex.toMap
    if (dupDocs.size <= 15) {
      assert(dupDocs.forall(ranks.contains), "every rare-term doc must make the top 15")
      val worstDup = dupDocs.flatMap(ranks.get).maxOption
      val bestNonDup = out.map(_.getLong(0)).filterNot(dupDocs).headOption.flatMap(ranks.get)
      for (w <- worstDup; bnd <- bestNonDup)
        assert(w < bnd, "rare-term docs rank first")
    }
  }

  test("p28 semdedup: manifest is consistent and the removal rule recounts brute-force") {
    val out = Pipeline.p28.fn(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_members")).sum == nVec, "clusters partition the corpus")
    assert(out.forall(r => r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") == r.getAs[Long]("n_members")))
    assert(out.map(_.getAs[Long]("n_removed")).sum > 0, "threshold must bite on this fixture")
    // brute-force: refit the same model, assign, and recount removals per
    // cluster with plain Scala cosine + the lowest-id-dominates rule
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val model = graft.ops.KMeans.fit(e, "vec_id", "embedding",
      Pipeline.kmK, Pipeline.kmIters, forceKernel = true)
    val asg = graft.ops.KMeans.assign(e, "embedding", model, forceKernel = true)
      .select(col("vec_id"), col("embedding"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, model.seedIds(r.getInt(2))))
    def cos(a: Array[Float], bb: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * bb(i); na += a(i).toDouble * a(i); nb += bb(i).toDouble * bb(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = asg.groupBy(_._3).map { case (cid, ms) =>
      val sortedMs = ms.sortBy(_._1)
      val removed = sortedMs.count { case (v, ev, _) =>
        sortedMs.exists { case (u, eu, _) => u < v && cos(eu, ev) >= 0.35 }
      }
      cid -> (ms.length.toLong, removed.toLong)
    }
    out.foreach { r =>
      val (mem, rem) = expect(r.getAs[Long]("cluster_id"))
      assert(r.getAs[Long]("n_members") == mem, s"cluster ${r.get(0)} members")
      assert(r.getAs[Long]("n_removed") == rem, s"cluster ${r.get(0)} removals")
    }
  }

  test("p29 PMI bigrams match a brute-force recount") {
    val out = Pipeline.p29.fn(spark, sf).collect()
    assert(out.length == 20)
    val docs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("text")).collect().map(_.getString(0).split(" ").filter(_.nonEmpty))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nu = uni.values.sum.toDouble
    val bigrams = docs.flatMap(t => t.dropRight(1).zip(t.drop(1)))
    val big = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nb = bigrams.length.toDouble
    out.foreach { r =>
      val (w1, w2, cxy, pmi) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(big((w1, w2)) == cxy, s"($w1,$w2) count")
      assert(cxy >= 5, "min-pair filter")
      val want = math.log((cxy * nu * nu) / (nb * uni(w1) * uni(w2)))
      assert(math.abs(pmi - want) <= 2e-6, s"($w1,$w2) pmi $pmi vs $want")
    }
    // descending by pmi with (w1, w2) tiebreak
    val ranked = out.map(r => (r.getDouble(3), r.getString(0), r.getString(1)))
    assert(ranked.sameElements(ranked.sortBy { case (p, a, bb) => (-p, a, bb) }))
  }

  test("p30 incremental dedup: decisions agree with the exact cross-split Jaccard (p7 ground truth)") {
    val out = Pipeline.p30.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // every doc_id % 5 == 0 gets exactly one decision row
    val nInc = Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0).count()
    assert(out.size.toLong == nInc)
    assert(out.values.exists(_.getString(1) == "reject"), "fixture plants cross-split near-dups")
    assert(out.values.exists(_.getString(1) == "admit"))
    // ground truth: p7's exact all-pairs >=0.8 report, filtered to pairs
    // that straddle the split. p30 may reject a SUBSET (LSH recall), and
    // every reject's best_match must be a true >=0.8 partner.
    val exact = Pipeline.p7.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val truth = exact.flatMap { case (a, b, j) =>
      Seq(a, b).filter(_ % 5 == 0).flatMap { i =>
        val other = if (i == a) b else a
        if (other % 5 != 0) Some(i -> (other, j)) else None
      }
    }.groupBy(_._1)
    out.values.filter(_.getString(1) == "reject").foreach { r =>
      val partners = truth.getOrElse(r.getLong(0), Array.empty).map(_._2).toMap
      assert(partners.contains(r.getLong(3)),
        s"inc ${r.getLong(0)}: best_match ${r.getLong(3)} not a true near-dup")
      assert(math.abs(partners(r.getLong(3)) - r.getDouble(4)) < 1e-5)
      assert(r.getLong(2) <= partners.size, "n_matches bounded by true partner count")
    }
    // admits must have NO true partner that LSH banding would also catch
    // at band level — weaker check: none of the rejects are admitted twice
    assert(out.values.count(_.getString(1) == "reject") <= truth.size)
  }

  test("p31 quality classifier: scores recount brute-force and the boundary splits the corpus") {
    val out = Pipeline.p31.fn(spark, sf).collect()
    val stop = graft.functions.TextFns.stopwords.toMap.apply("en").toSet
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getString(1), r.getString(2).split(" ").filter(_.nonEmpty)))
    val scored = docs.map { case (lang, toks) =>
      val n = toks.length.toDouble
      val z = -3.05 + 0.35 * (toks.map(_.length).sum / n) +
        2.0 * (toks.distinct.length / n) +
        -3.0 * (toks.count(stop) / n) +
        0.18 * math.log(n)
      val s = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      lang -> s
    }
    val byLang = scored.groupBy(_._1)
    out.foreach { r =>
      val ss = byLang(r.getString(0)).map(_._2)
      assert(r.getAs[Long]("n_docs") == ss.length)
      assert(r.getAs[Long]("n_keep") == ss.count(_ >= 0.5), s"${r.getString(0)} keep count")
      assert(math.abs(r.getAs[Double]("min_score") - ss.min) <= 1e-6)
      assert(math.abs(r.getAs[Double]("max_score") - ss.max) <= 1e-6)
      val mean = BigDecimal(ss.map(s => math.round(s * 1e6)).sum.toDouble / (ss.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("mean_score") - mean) <= 1e-6)
    }
    // the 0.5 boundary must actually split the corpus — an all-keep or
    // all-drop classifier gates nothing
    val keeps = out.map(_.getAs[Long]("n_keep")).sum
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(keeps > 0 && keeps < total, s"boundary must bite: $keeps of $total kept")
  }

  test("p32 span scrub matches a brute-force single-node mask") {
    val out = Pipeline.p32.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    def spansOf(t: Array[String]): Seq[(Int, String)] =
      if (t.length < 5) Seq.empty
      else (0 to t.length - 5).map(i => i -> t.slice(i, i + 5).mkString(" "))
    val reach = docs.toSeq.flatMap { case (id, t) => spansOf(t).map(_._2 -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val dup = reach.filter(_._2 >= 2).keySet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var maskedDocs = 0
    docs.foreach { case (id, t) =>
      val cov = spansOf(t).filter(p => dup(p._2))
        .flatMap(p => p._1 until p._1 + 5).toSet
      val kept = t.zipWithIndex.collect { case (tok, i) if !cov(i) => tok }
      val (nTok, nMasked, h) = out(id)
      assert(nTok == t.length, s"doc $id n_tok")
      assert(nMasked == cov.size, s"doc $id n_masked")
      assert(h == md5hex(kept.mkString(" ")), s"doc $id scrub md5")
      if (cov.nonEmpty) maskedDocs += 1
    }
    assert(maskedDocs > 0, "fixture plants cross-doc spans; the scrub must bite")
    assert(out.keySet == docs.keySet, "every document gets a manifest row")
  }

  test("p33 feature-hash retrieval matches a brute-force hashed-BoW cosine") {
    val out = Pipeline.p33.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 15)
    val p = 2147483647L
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % p % 64
    }
    val vecs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val counts = r.getString(1).split(" ").filter(_.nonEmpty)
          .groupBy(bucket).view.mapValues(_.length.toLong).toMap
        r.getLong(0) -> counts
      }.toMap
    def cos(a: Map[Long, Long], b: Map[Long, Long]): Double = {
      val dot = a.keysIterator.filter(b.contains).map(k => a(k) * b(k)).sum.toDouble
      val c = dot / (math.sqrt(a.values.map(v => v * v).sum.toDouble) *
        math.sqrt(b.values.map(v => v * v).sum.toDouble))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (qid <- 0L until 5L) {
      val ranked = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(vecs(qid), v)) }
        .filter(_._2 > 0.0)
        .sortBy { case (id, c) => (-c, id) }.take(3)
      val got = out.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4))
      got.zip(ranked).zipWithIndex.foreach { case (((gc, gcos), (ec, ecos)), i) =>
        assert(gc == ec, s"q$qid rank ${i + 1}: got $gc want $ec")
        assert(math.abs(gcos - ecos) <= 1e-6, s"q$qid rank ${i + 1} cosine")
      }
    }
  }

  test("p34 perplexity matches a brute-force unigram-LM recount") {
    val out = Pipeline.p34.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    assert(out.keySet == docs.keySet, "every en doc gets a score")
    val lm = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nu = lm.values.sum.toDouble
    val v = lm.size.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, toks) =>
      val sumE6 = toks.map(t => math.round(math.log((lm(t) + 1.0) / (nu + v)) * 1e6)).sum
      val xent = r6(-(sumE6.toDouble / 1e6) / toks.length)
      val (nTok, gXent, gPpl) = out(id)
      assert(nTok == toks.length, s"doc $id n_tok")
      assert(math.abs(gXent - xent) <= 1e-6, s"doc $id xent $gXent vs $xent")
      assert(math.abs(gPpl -
        BigDecimal(math.exp(xent)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-2)
    }
    // the model must discriminate: rare-token docs carry higher
    // cross-entropy than the corpus floor (not a constant score)
    val xs = out.values.map(_._2)
    assert(xs.max - xs.min > 0.05, "perplexity must spread across the corpus")
  }

  test("p35 source reputation: rollup recounts from its own ingredients and both decisions appear") {
    val out = Pipeline.p35.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5)))).toMap
    // ingredients: p31's per-doc scores + p6's verified pair list
    val scores = Pipeline.qualityScored(Tables.documents(spark, sf))
      .select(col("doc_id"), col("source"), col("score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val dup = Pipeline.p6.fn(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    scores.groupBy(_._2).foreach { case (src, docs) =>
      val (nDocs, dupDocs, mean, rate, dec) = out(src)
      assert(nDocs == docs.length, s"$src n_docs")
      assert(dupDocs == docs.count(d => dup(d._1)), s"$src dup_docs")
      val m = r6(docs.map(d => math.round(d._3 * 1e6)).sum.toDouble / (docs.length * 1e6))
      assert(math.abs(mean - m) <= 1e-6, s"$src mean")
      val rr = r6(dupDocs.toDouble / nDocs)
      assert(math.abs(rate - rr) <= 1e-6, s"$src dup_rate")
      val want = if (rr >= 0.08 || m < 0.505) "blocklist" else "keep"
      assert(dec == want, s"$src decision")
    }
    val decs = out.values.map(_._5).toSet
    assert(decs == Set("keep", "blocklist"), "thresholds must split the sources")
  }

  test("p36 full ANN stack: results honor list routing and the exact-rescore discipline") {
    val out = Pipeline.p36.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 5 * 3, "5 queries x top-3")
    // composition: every returned candidate must live in a list its
    // query probed (re-derive lists + probes with the same trainer)
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val model = graft.ops.KMeans.fit(e, "vec_id", "embedding",
      Pipeline.kmK, Pipeline.kmIters, forceKernel = true)
    val lists = graft.ops.KMeans.assign(e, "embedding", model, forceKernel = true)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probed: Map[Long, Set[Int]] = (0L until 5L).map { qid =>
      val q = vecs(qid)
      val ranked = model.centroids.zipWithIndex
        .map { case (c, j) =>
          (BigDecimal(cos(q, c)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, j) }
        .sortBy { case (s, j) => (-s, j) }.take(Pipeline.ivfProbe).map(_._2).toSet
      qid -> ranked
    }.toMap
    out.foreach { case (qid, _, cid, gCos) =>
      assert(probed(qid).contains(lists(cid)),
        s"candidate $cid of query $qid must come from a probed list")
      // exact rescore: the reported cosine is the true float cosine,
      // not the ADC approximation
      assert(math.abs(gCos - cos(vecs(qid), vecs(cid))) <= 2e-6,
        s"pair ($qid,$cid) cosine must be exact, not reconstructed")
    }
    // per-query ranks are 1..3 ordered by cosine desc
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3), s"query $q ranks")
      val sorted = rows.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
  }

  test("p48 filtered ANN: hits are allowed; PRE-filter recall >= POST-filter recall against the exact filtered truth") {
    val allowDf = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val allowed = allowDf.collect().map(_.getLong(0)).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val pre = hits(Pipeline.p48.fn(spark, sf))
    assert(pre.values.map(_.size).sum == 15, "pre-filter must fill all 5 x top-3")
    assert(pre.values.flatten.forall(allowed), "every pre-filter hit must satisfy the attribute predicate")
    val post = hits(Pipeline.annFullStack(spark, sf,
      allow = Some(allowDf), postFilter = true))
    assert(post.values.flatten.forall(allowed), "every post-filter hit must satisfy the attribute predicate")
    // exact filtered truth: top-3 cosine among the ALLOWED members of
    // each query's probed lists (re-derive lists/probes with the same
    // trainer — the p36 spec's discipline)
    graft.expressions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val model = graft.ops.KMeans.fit(e, "vec_id", "embedding",
      Pipeline.kmK, Pipeline.kmIters, forceKernel = true)
    val lists = graft.ops.KMeans.assign(e, "embedding", model, forceKernel = true)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val truth: Map[Long, Set[Long]] = (0L until 5L).map { qid =>
      val q = vecs(qid)
      val probed = model.centroids.zipWithIndex
        .map { case (c, j) => (r6(cos(q, c)), j) }
        .sortBy { case (s, j) => (-s, j) }.take(Pipeline.ivfProbe).map(_._2).toSet
      val top = vecs.keys.toSeq
        .filter(cid => cid != qid && allowed(cid) && probed(lists(cid)))
        .map(cid => (r6(cos(q, vecs(cid))), cid))
        .sortBy { case (s, cid) => (-s, cid) }.take(3).map(_._2).toSet
      qid -> top
    }.toMap
    def recall(h: Map[Long, Set[Long]]): Double =
      (0L until 5L).map(q => h.getOrElse(q, Set.empty).intersect(truth(q)).size).sum / 15.0
    val (rPre, rPost) = (recall(pre), recall(post))
    assert(rPre >= rPost,
      s"pre-filtering must not lose recall vs post-filtering (pre=$rPre post=$rPost)")
    assert(rPre >= 0.8, s"pre-filter recall vs the exact filtered truth collapsed: $rPre")
  }

  test("p51 whitened filtered ANN: hits are allowed; self-metric filtered recall >= p48's") {
    // the p50-vs-p24 law extended to the ROUTED + FILTERED stack: each
    // stack serves a metric (p51 whitened cosine, p48 raw cosine) and
    // approximates it with the same codebook/pool budget inside its own
    // probed-and-allowed candidate set — conditioning must not make the
    // quantizer a worse approximation of its own serving metric
    val allowDf = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val allowed = allowDf.collect().map(_.getLong(0)).toSet
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val h51 = hits(Pipeline.p51.fn(spark, sf))
    assert(h51.values.map(_.size).sum == 15, "p51 must fill all 5 x top-3")
    assert(h51.values.flatten.forall(allowed),
      "every p51 hit must satisfy the attribute predicate")
    val h48 = hits(Pipeline.p48.fn(spark, sf))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // exact filtered truth in a given space: per query, top-3 cosine
    // among the ALLOWED members of its probed lists, lists/probes
    // re-derived with the same trainer (the p48 spec's discipline)
    def truthIn(vecs: Map[Long, Array[Double]], e: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val model = graft.ops.KMeans.fit(e, "vec_id", "embedding",
        Pipeline.kmK, Pipeline.kmIters, forceKernel = true)
      val lists = graft.ops.KMeans.assign(e, "embedding", model, forceKernel = true)
        .select(col("vec_id"), col("cluster")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      (0L until 5L).map { qid =>
        val q = vecs(qid)
        val probed = model.centroids.zipWithIndex
          .map { case (c, j) => (r6(cos(q, c)), j) }
          .sortBy { case (s, j) => (-s, j) }.take(Pipeline.ivfProbe).map(_._2).toSet
        qid -> vecs.keys.toSeq
          .filter(cid => cid != qid && allowed(cid) && probed(lists(cid)))
          .map(cid => (r6(cos(q, vecs(cid))), cid))
          .sortBy { case (s, cid) => (-s, cid) }.take(3).map(_._2).toSet
      }.toMap
    }
    graft.expressions.VectorExpressions.register(spark)
    val wht = Pipeline.whitenedEmbeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val whtVecs = wht.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val raw = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val rawVecs = raw.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def recall(h: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
      (0L until 5L).map(q => h.getOrElse(q, Set.empty).intersect(truth(q)).size).sum / 15.0
    val r51 = recall(h51, truthIn(whtVecs, wht))
    val r48 = recall(h48, truthIn(rawVecs, raw))
    assert(r51 >= r48,
      s"whitened routed stack must approximate its own metric at least as well as the raw one (p51=$r51 p48=$r48)")
    assert(r51 >= 0.8, s"p51 self-metric filtered recall collapsed: $r51")
  }

  test("p34c backoff laws: every i>=2 position hits exactly one level; held-out docs back off, train docs never do; held-out xent is worse") {
    val out = Pipeline.p34c.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.foreach { case (id, nTok, tri, bi, uni, _) =>
      assert(tri + bi + uni == math.max(nTok - 2, 0L),
        s"doc $id: positions i>=2 must each hit exactly one scoring level")
    }
    val (train, held) = out.partition(_._1 % 2 == 0)
    assert(train.forall(d => d._4 == 0 && d._5 == 0),
      "train docs' own n-grams are all in-dictionary — backoff must never fire")
    assert(held.map(d => d._4 + d._5).sum > 0,
      "held-out docs must exercise the backoff levels (else the CASE is dead code)")
    def meanXent(ds: Array[(Long, Long, Long, Long, Long, Double)]): Double =
      ds.map(_._6).sum / ds.length
    assert(meanXent(held) > meanXent(train),
      "held-out cross-entropy must exceed train cross-entropy under a train-half LM")
  }

  test("p40d whitening: raw variance tracks lambda and whitened variance pins near 1") {
    val out = Pipeline.p40d.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == Seq(1, 2), "one row per component")
    out.foreach { case (comp, lam, sigma, varRaw, varWhite) =>
      assert(math.abs(sigma - math.sqrt(lam)) < 1e-5, s"comp $comp sigma must be sqrt(lambda)")
      // the power iteration's growth estimate IS v'Cv (the variance
      // along v) up to rounding and the deflated-frame approximation
      assert(math.abs(varRaw - lam) / lam < 0.1,
        s"comp $comp raw variance $varRaw must track lambda $lam")
      assert(math.abs(varWhite - 1.0) < 0.1,
        s"comp $comp whitened variance must pin near 1, got $varWhite")
    }
    val Seq(l1, l2) = out.map(_._2).toSeq
    assert(l1 > l2, "component order: lambda1 > lambda2")
  }

  test("p49 hybrid RRF: fused scores recompute from the ranks and order the cut") {
    val out = Pipeline.p49.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 10, "fusion must fill the top-10 cut")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (id, rl, rv, rrf) =>
      assert(rl > 0 || rv > 0, s"doc $id must be ranked by at least one arm")
      val want = r6((if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0))
      assert(math.abs(rrf - want) <= 1e-9, s"doc $id rrf must recompute from its ranks")
    }
    val scores = out.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "the cut must be ordered by fused score")
    // the fusion law itself (arm overlap beats either single arm at the
    // same ranks) on the formula, since the synthetic corpus's arms
    // happen to be disjoint: rank r in BOTH arms > rank r in one
    assert(1.0 / 61 + 1.0 / 61 > 1.0 / 61 && 1.0 / 61 + 1.0 / 80 > 1.0 / 61)
  }

  test("p37 training converges: the distilled model agrees with the rule labels") {
    val traj = Pipeline.p37.fn(spark, sf).collect()
      .map(r => r.getInt(0) -> (1 to 5).map(r.getDouble).toArray).toMap
    assert(traj.keySet == Set(1, 2, 3), "one row per iteration")
    assert(traj.values.flatten.forall(w => !w.isNaN && math.abs(w) < 10),
      "weights must stay finite and bounded (no divergence)")
    // the trajectory must MOVE monotonically away from zero overall
    // (a stalled or oscillating-divergent run fails the distillation)
    val norms = (1 to 3).map(t => math.sqrt(traj(t).map(w => w * w).sum))
    assert(norms.zip(norms.tail).forall { case (a, b) => b > a },
      s"weight norm must grow while converging: $norms")
    // label agreement of the final model (measured 94% on this fixture)
    val w = traj(3)
    val featr = Pipeline.lrFeatures(Tables.documents(spark, sf)).persist()
    val (std, _, _) = Pipeline.lrStandardize(featr)
    val rows = std.select(col("y"), col("x1"), col("x2"), col("x3"), col("x4")).collect()
    featr.unpersist()
    val agree = rows.count { r =>
      val z = w(0) + w(1) * r.getDouble(1) + w(2) * r.getDouble(2) +
        w(3) * r.getDouble(3) + w(4) * r.getDouble(4)
      val keep = 1.0 / (1.0 + math.exp(-z)) >= 0.5
      keep == (r.getDouble(0) == 1.0)
    }
    assert(agree.toDouble / rows.length >= 0.85,
      s"distilled model must track the rule: $agree/${rows.length}")
  }

  test("p37b trained inference recounts from the standardized scores and is non-degenerate") {
    val out = Pipeline.p37b.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val featr = Pipeline.lrFeatures(Tables.documents(spark, sf)).persist()
    val (std, _, _) = Pipeline.lrStandardize(featr)
    val feats = std.persist()
    val w = Pipeline.lrFit(feats, 1.0, 3).last
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scores = feats.collect().map { r =>
      val z = r6(w(0) + w(1) * r.getDouble(3) + w(2) * r.getDouble(4) +
        w(3) * r.getDouble(5) + w(4) * r.getDouble(6))
      (r.getString(1), r6(1.0 / (1.0 + math.exp(-z))))
    }
    feats.unpersist(); featr.unpersist()
    scores.groupBy(_._1).foreach { case (lang, ds) =>
      val (nDocs, nKeep, mean, mn, mx) = out(lang)
      assert(nDocs == ds.length, s"$lang n_docs")
      assert(nKeep == ds.count(_._2 >= 0.5), s"$lang n_keep")
      assert(math.abs(mean -
        r6(ds.map(d => math.round(d._2 * 1e6)).sum.toDouble / (ds.length * 1e6))) <= 1e-6)
      assert(math.abs(mn - ds.map(_._2).min) <= 1e-6 && math.abs(mx - ds.map(_._2).max) <= 1e-6)
    }
    val keeps = out.values.map(_._2).sum
    val total = out.values.map(_._1).sum
    assert(keeps > 0 && keeps < total, "trained decision must split the corpus")
  }

  test("p38 paragraph pairs are true near-dups and LSH recall stays high vs brute force") {
    val got = Pipeline.p38.fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)), r.getDouble(4))).toMap
    // brute force: all paragraph pairs by exact 3-shingle Jaccard
    val paras = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        toks.grouped(32).zipWithIndex.map { case (p, k) =>
          ((r.getLong(0), k), p.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
        }
      }.filter(_._2.nonEmpty)
    val brute = (for {
      (ka, sa) <- paras; (kb, sb) <- paras
      if ka._1 < kb._1 || (ka._1 == kb._1 && ka._2 < kb._2)
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa.size + sb.size - inter) >= 0.8
    } yield ((ka._1, ka._2, kb._1, kb._2),
      inter.toDouble / (sa.size + sb.size - inter))).toMap
    assert(got.nonEmpty, "the fixture's near-dup docs must yield paragraph pairs")
    got.foreach { case (k, j) =>
      assert(brute.contains(k), s"reported pair $k must be a true near-dup")
      assert(math.abs(j - BigDecimal(brute(k)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) <= 1e-6, s"pair $k jaccard")
    }
    assert(got.size.toDouble / brute.size >= 0.8,
      s"2-band LSH recall collapsed: ${got.size}/${brute.size}")
  }

  test("p34b bigram perplexity matches a brute-force bigram-LM recount") {
    val out = Pipeline.p34b.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
      .filter(_._2.nonEmpty)
    assert(out.keySet == docs.keySet, "every non-empty en doc gets a score")
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toDouble
    val nu = uni.values.sum.toDouble
    val big = docs.values.flatMap(_.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, toks) =>
      val lp1 = math.round(math.log((uni(toks.head) + 1.0) / (nu + v)) * 1e6)
      val lp2 = toks.sliding(2).filter(_.length == 2).map { p =>
        math.round(math.log((big(p.mkString(" ")) + 1.0) / (uni(p.head) + v)) * 1e6)
      }.sum
      val xent = r6(-((lp1 + lp2).toDouble / 1e6) / toks.length)
      val (nTok, gXent, gPpl) = out(id)
      assert(nTok == toks.length, s"doc $id n_tok")
      assert(math.abs(gXent - xent) <= 1e-6, s"doc $id xent $gXent vs $xent")
      assert(math.abs(gPpl -
        BigDecimal(math.exp(xent)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-2)
    }
    // bigram context must sharpen the model vs p34's unigram: mean
    // cross-entropy strictly drops (repeated phrases are predictable)
    val uniXent = Pipeline.p34.fn(spark, sf).collect().map(_.getDouble(2))
    val biXent = out.values.map(_._2)
    assert(biXent.sum / biXent.size < uniXent.sum / uniXent.length,
      "bigram LM must beat unigram cross-entropy on average")
  }

  test("p39 BPE merges match a brute-force single-node trainer") {
    val out = Pipeline.p39.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val words = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val dict: Map[String, Long] =
      words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // same repr/apply conventions: leading+trailing-space symbol string,
    // ONE left-to-right java replace pass per merge (identical
    // continue-after-replacement semantics as Spark/DuckDB replace)
    var reprs: Map[String, String] =
      dict.keys.map(w => w -> ("" + ' ' + w.toCharArray.map(c => s"$c ").mkString)).toMap
    val expected = (1 to 4).map { t =>
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for {
        (w, r) <- reprs
        syms = r.trim.split(" ").filter(_.nonEmpty)
        i <- 0 until syms.length - 1
      } counts(syms(i) + " " + syms(i + 1)) += dict(w)
      val (pair, total) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
      val merged = pair.replace(" ", "")
      reprs = reprs.map { case (w, r) => w -> r.replace(s" $pair ", s" $merged ") }
      (t, pair, merged, total)
    }
    assert(out == expected, s"merge tables diverge:\n got $out\nwant $expected")
    // merge frequency is non-increasing: a later merge's count is
    // bounded by the fused symbol's own occurrence count
    assert(out.map(_._4) == out.map(_._4).sortBy(-_), "totals must be non-increasing")
  }

  test("p39b tokenize-under-trained-merges recounts from the brute-force dictionary") {
    val out = Pipeline.p39b.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val docs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val dict: Map[String, Long] = docs.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var reprs: Map[String, String] =
      dict.keys.map(w => w -> ("" + ' ' + w.toCharArray.map(c => s"$c ").mkString)).toMap
    for (_ <- 1 to 4) {
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for {
        (w, r) <- reprs
        syms = r.trim.split(" ").filter(_.nonEmpty)
        i <- 0 until syms.length - 1
      } counts(syms(i) + " " + syms(i + 1)) += dict(w)
      val (pair, _) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
      val merged = pair.replace(" ", "")
      reprs = reprs.map { case (w, r) => w -> r.replace(s" $pair ", s" $merged ") }
    }
    val nsym: Map[String, Long] =
      reprs.map { case (w, r) => w -> r.trim.split(" ").count(_.nonEmpty).toLong }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.filter(_._2.nonEmpty).sortBy(_._1).map { case (id, ws) =>
      val chars = ws.map(_.length.toLong).sum
      val syms = ws.map(nsym).sum
      (id, ws.length.toLong, chars, syms, r6(chars.toDouble / syms))
    }.toSeq
    assert(out == expected, "per-doc tokenization must equal the single-node replay")
    // merges only ever fuse: symbols never exceed chars, so the
    // learned tokenizer compresses (ratio ≥ 1) on every doc
    assert(out.forall { case (_, _, ch, sy, ratio) => sy <= ch && ratio >= 1.0 })
    assert(out.exists { case (_, _, ch, sy, _) => sy < ch },
      "the 4 learned merges must fire somewhere in the corpus")
  }

  test("p40 power-iteration trajectory matches a brute-force single-node PCA") {
    val out = Pipeline.p40.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val embs = Tables.embeddings(spark, sf).orderBy(col("vec_id")).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = embs.length
    val dim = 64
    // replay pcaFit's quantization naively: e6-integer mean, 6-dp
    // centering, per-row integer dot, per-dim integer gradient sums
    val m = Array.tabulate(dim)(i => r6(embs.map(e => rL(e(i) * 1e6)).sum / (n * 1e6)))
    val cen = embs.map(e => Array.tabulate(dim)(i => r6(e(i) - m(i))))
    var v = Array.fill(dim)(0.125)
    val expected = (1 to 3).flatMap { t =>
      val ds = cen.map(c => (0 until dim).map(i => rL(c(i) * v(i) * 1e6)).sum)
      val g = Array.tabulate(dim)(i =>
        cen.zip(ds).map { case (c, d) => rL(c(i) * (d / 1e6) * 1e6) }.sum)
      val u = g.map(gi => r6(gi / (n * 1e6)))
      val lam = r6(math.sqrt(u.map(ui => rL(ui * ui * 1e12)).sum / 1e12))
      v = u.map(ui => r6(ui / lam))
      v.zipWithIndex.map { case (vi, i) => (t, i, vi, lam) }.toSeq
    }
    assert(out == expected, "distributed trajectory must equal the single-node replay")
    // spectral sanity: growth estimate climbs toward the dominant
    // eigenvalue, directions are unit and progressively aligned
    val lams = out.map(_._4).distinct
    assert(lams == lams.sorted && lams.toSet.size == 3 && lams.head > 0,
      s"growth estimates must strictly increase: $lams")
    val vecs = out.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray)
    vecs.foreach { w =>
      assert(math.abs(w.map(x => x * x).sum - 1.0) <= 1e-3, "direction must be unit") }
    val aligns = vecs.sliding(2).map { case Seq(a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }.toSeq
    assert(aligns.forall(_ >= 0.9) && aligns == aligns.sorted,
      s"successive directions must converge: $aligns")
  }

  test("p40b projection rollup recounts from the trained direction") {
    val out = Pipeline.p40b.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val n = rows.length
    val dim = 64
    val m = Array.tabulate(dim)(i => r6(rows.map(_._1(i)).map(x => rL(x * 1e6)).sum / (n * 1e6)))
    val cen = rows.map { case (e, lab) => (Array.tabulate(dim)(i => r6(e(i) - m(i))), lab) }
    var v = Array.fill(dim)(0.125)
    for (_ <- 1 to 3) {
      val ds = cen.map { case (c, _) => (0 until dim).map(i => rL(c(i) * v(i) * 1e6)).sum }
      val g = Array.tabulate(dim)(i =>
        cen.zip(ds).map { case ((c, _), d) => rL(c(i) * (d / 1e6) * 1e6) }.sum)
      val u = g.map(gi => r6(gi / (n * 1e6)))
      val lam = r6(math.sqrt(u.map(ui => rL(ui * ui * 1e12)).sum / 1e12))
      v = u.map(ui => r6(ui / lam))
    }
    val expected = cen
      .map { case (c, lab) => (lab, (0 until dim).map(i => rL(c(i) * v(i) * 1e6)).sum) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (lab, xs) =>
        val ds = xs.map(_._2)
        (lab, ds.length.toLong, r6(ds.sum.toDouble / (ds.length * 1e6)),
          r6(ds.min / 1e6), r6(ds.max / 1e6))
      }
    assert(out == expected, "per-label projection rollup must equal the single-node replay")
    assert(out.map(_._2).sum == n, "every vector lands in exactly one label bucket")
    assert(out.forall { case (_, _, mean, lo, hi) => lo <= mean && mean <= hi },
      "mean must sit inside the [min, max] projection band")
  }

  test("p42 bloom screen matches a brute-force replay; pruned exact equals unpruned exact") {
    val out = Pipeline.p42.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSeq
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def bit(j: Int, sh: String): Long =
      java.lang.Long.parseLong(md5hex(s"b$j:$sh").take(15), 16) % 2147483647L % 4096L
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
      }
    val corpus = docs.filter(_._1 % 5 != 0).flatMap(_._2).toSet
    val bloomBits = corpus.flatMap(sh => (0 until 3).map(bit(_, sh)))
    val expected = docs.filter(_._1 % 5 == 0).filter(_._2.nonEmpty).sortBy(_._1)
      .map { case (id, shs) =>
        val maybe = shs.filter(sh => (0 until 3).forall(j => bloomBits(bit(j, sh))))
        val exactPruned = maybe.count(corpus)          // the gate's path
        val exactUnpruned = shs.count(corpus)          // the reference path
        assert(exactPruned == exactUnpruned,
          s"doc $id: bloom pruning must never drop a true member (no false negatives)")
        (id, shs.size.toLong, maybe.size.toLong, exactPruned.toLong,
          if (maybe.size * 2 >= shs.size) 1 else 0)
      }.toSeq
    assert(out == expected, "bloom screen must equal the single-node replay")
    assert(out.forall { case (_, nSh, nMaybe, nExact, _) =>
      nExact <= nMaybe && nMaybe <= nSh },
      "membership laws: exact ⊆ maybe ⊆ all (overestimates only)")
  }

  test("p43 HLL registers match a brute-force replay; registers merge by elementwise max") {
    val out = Pipeline.p43.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def h60(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(15), 16)
    def rank(h: Long): Int = { val rest = h >> 8; if (rest == 0) 53 else 53 - java.lang.Long.toBinaryString(rest).length }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byLang = Tables.documents(spark, sf).select(col("lang"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getString(0), t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }.toSeq)
      }.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    def registers(bigs: Seq[String]): Array[Int] = {
      val m = Array.fill(256)(0)
      bigs.foreach { b => val h = h60(b); val i = (h % 256).toInt
        m(i) = math.max(m(i), rank(h)) }
      m
    }
    val cConst = 0.7213 / (1 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
    val expected = byLang.toSeq.sortBy(_._1).map { case (lang, bigs) =>
      val regs = registers(bigs)
      val v = regs.count(_ == 0).toLong
      val sS = regs.map(m0 => 1L << (53 - m0)).sum
      val raw6 = r6(cConst / sS)
      val est = if (raw6 <= 640.0 && v > 0) r6(256.0 * math.log(256.0 / v)) else raw6
      val exact = bigs.distinct.size.toLong
      (lang, exact, v, sS, est, r4(math.abs(est - exact) / exact))
    }
    assert(out == expected, "HLL sketch must equal the single-node replay")
    // the distributed/streaming law: registers of a union are the
    // elementwise max of the parts' registers (why the 256-key agg
    // merges across batches/executors like CMS addition)
    for ((lang, bigs) <- byLang) {
      val (a, b) = bigs.splitAt(bigs.size / 2)
      val merged = registers(a).zip(registers(b)).map { case (x, y) => math.max(x, y) }
      assert(merged.toSeq == registers(bigs).toSeq,
        s"$lang: split-then-max-merge must equal the whole-corpus registers")
    }
    // m=256 ⇒ σ ≈ 1.04/√256 = 6.5%; assert a loose 3σ band
    assert(out.forall(_._6 <= 0.195), s"HLL error out of band: ${out.map(_._6)}")
  }

  test("p43b HLL set algebra matches a brute-force replay; union never exceeds the sum of parts") {
    val out = Pipeline.p43b.fn(spark, sf).head()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def h60(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(15), 16)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cConst = 0.7213 / (1 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
    def regs(bigs: Seq[String]): Array[Int] = {
      val m = Array.fill(256)(0)
      bigs.foreach { b =>
        val h = h60(b); val rest = h >> 8
        val rk = if (rest == 0) 53 else 53 - java.lang.Long.toBinaryString(rest).length
        val i = (h % 256).toInt; m(i) = math.max(m(i), rk)
      }
      m
    }
    def est(m: Array[Int]): Double = {
      val v = m.count(_ == 0)
      val sS = m.map(m0 => 1L << (53 - m0)).sum
      val raw6 = r6(cConst / sS)
      if (raw6 <= 640.0 && v > 0) r6(256.0 * math.log(256.0 / v)) else raw6
    }
    val sides = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0) % 2, t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }.toSeq)
      }
    val a = sides.filter(_._1 == 0).flatMap(_._2).toSeq
    val b = sides.filter(_._1 == 1).flatMap(_._2).toSeq
    val (ra, rb) = (regs(a), regs(b))
    val merged = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    val (estA, estB, estU) = (est(ra), est(rb), est(merged))
    assert(out.getDouble(0) == estA && out.getDouble(1) == estB &&
      out.getDouble(2) == estU && out.getDouble(3) == r6(estA + estB - estU),
      s"estimates must equal the single-node replay: $out")
    assert(out.getLong(4) == a.distinct.size && out.getLong(5) == b.distinct.size &&
      out.getLong(6) == (a ++ b).distinct.size,
      "exact distincts must recount")
    assert(out.getLong(7) == out.getLong(4) + out.getLong(5) - out.getLong(6))
    // sketch-algebra sanity: union dominated by sum of parts, and at
    // least as large as each part (register max can only grow)
    assert(estU <= estA + estB && estU >= math.max(estA, estB) - 1e-9)
  }

  test("p40c deflation matches a brute-force replay; second component is orthogonal and smaller") {
    val out = Pipeline.p40c.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val embs = Tables.embeddings(spark, sf).orderBy(col("vec_id")).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = embs.length
    val dim = 64
    val m = Array.tabulate(dim)(i => r6(embs.map(e => rL(e(i) * 1e6)).sum / (n * 1e6)))
    def iterate(cen: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.fill(dim)(0.125)
      var lamOut = 0.0
      for (_ <- 1 to 3) {
        val ds = cen.map(c => (0 until dim).map(i => rL(c(i) * v(i) * 1e6)).sum)
        val g = Array.tabulate(dim)(i =>
          cen.zip(ds).map { case (c, d) => rL(c(i) * (d / 1e6) * 1e6) }.sum)
        val u = g.map(gi => r6(gi / (n * 1e6)))
        val lam = r6(math.sqrt(u.map(ui => rL(ui * ui * 1e12)).sum / 1e12))
        v = u.map(ui => r6(ui / lam)); lamOut = lam
      }
      (v, lamOut)
    }
    val cen = embs.map(e => Array.tabulate(dim)(i => r6(e(i) - m(i))))
    val (v1, lam1) = iterate(cen)
    val cen2 = cen.map { c =>
      val ds = (0 until dim).map(i => rL(c(i) * v1(i) * 1e6)).sum
      Array.tabulate(dim)(i => r6(c(i) - (ds / 1e6) * v1(i)))
    }
    val (v2, lam2) = iterate(cen2)
    val ortho = v1.zip(v2).map { case (a, b) => rL(a * b * 1e6) }.sum
    val expected =
      (v1.zipWithIndex.map { case (x, i) => (1, i, x, lam1, ortho) } ++
        v2.zipWithIndex.map { case (x, i) => (2, i, x, lam2, ortho) }).toSeq
    assert(out == expected, "deflated trajectory must equal the single-node replay")
    // spectral laws: the second component explains no more variance
    // than the first, and deflation leaves it (near-)orthogonal
    assert(lam2 < lam1, s"second growth estimate must be smaller: $lam2 vs $lam1")
    assert(math.abs(ortho) <= 1000, s"v1·v2 must be ~0 (got ${ortho / 1e6})")
  }

  test("p44 cluster-keyed split matches a union-find replay and never leaks a near-dup pair") {
    val out = Pipeline.p44.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val pairs = Pipeline.minhashPairs(spark, sf).select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSeq
    // union-find with min-id representatives (what connectedComponents yields)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def bucket(x: Long): Long =
      java.lang.Long.parseLong(md5hex(x.toString).take(15), 16) % 2147483647L % 10L
    def splitOf(key: Long) = if (bucket(key) < 8) "train" else "val"
    val asg = docs.map(id => (id, find(id))).toMap
    val stats = docs.groupBy(id => splitOf(asg(id))).toSeq.sortBy(_._1)
      .map { case (sp, ids) =>
        (sp, ids.size.toLong, ids.map(asg).distinct.size.toLong) }
    val leakCluster = pairs.count { case (a, b) => splitOf(asg(a)) != splitOf(asg(b)) }.toLong
    val leakNaive = pairs.count { case (a, b) => splitOf(a) != splitOf(b) }.toLong
    val expected = stats.map { case (sp, nd, nc) => (sp, nd, nc, leakCluster, leakNaive) }
    assert(out == expected, s"split must equal the union-find replay:\n got $out\nwant $expected")
    assert(leakCluster == 0, "cluster-keyed split can never separate a near-dup pair")
    assert(out.map(_._2).sum == docs.size, "every doc lands in exactly one split")
    // docs sharing a cluster share a split — the invariant behind the zero
    docs.groupBy(asg).values.foreach { ids =>
      assert(ids.map(id => splitOf(asg(id))).distinct.size == 1) }
  }

  test("p45 corpus report recounts from its ingredient operators") {
    val out = Pipeline.p45.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // dup ids from the p6 gate itself — the report must agree with the
    // operator it summarizes
    val dupIds = Pipeline.p6.fn(spark, sf).select(col("da"), col("db")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val en = Seq("the", "a", "of", "and", "to", "is")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("text"))
      .collect().map { r =>
        val t = r.getString(2).split(" ").filter(_.nonEmpty)
        val quality = t.length >= 30 &&
          t.distinct.length.toDouble / t.length >= 0.2 &&
          t.count(en.contains).toDouble / t.length <= 0.5
        (r.getString(1), r.getLong(0), t.length.toLong, quality)
      }
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val n = xs.length.toLong
      val dup = xs.count(x => dupIds(x._2)).toLong
      (lang, n, xs.count(_._4).toLong, dup,
        r6(dup.toDouble / n), r6(xs.map(_._3).sum.toDouble / n))
    }
    assert(out == expected, s"report must recount from ingredients:\n got $out\nwant $expected")
    assert(out.forall { case (_, n, q, d2, _, _) => q <= n && d2 <= n })
    assert(out.map(_._2).sum == docs.length, "every doc reports in exactly one lang row")
  }

  test("p46 sampled quantiles match a sorted-array replay; the sample is the declared 1/16") {
    val r = Pipeline.p46.fn(spark, sf).head()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def inSample(k: Long): Boolean =
      java.lang.Long.parseLong(md5hex(k.toString).take(15), 16) % 2147483647L % 16L == 0
    val rows = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    def pct(vs: Array[Double], q: Double): Double = {
      val v = vs.sorted
      val pos = q * (v.length - 1)
      val lo = pos.toInt
      if (lo + 1 >= v.length) v(lo) else v(lo) + (pos - lo) * (v(lo + 1) - v(lo))
    }
    val all = rows.map(_._2)
    val smp = rows.filter(t => inSample(t._1)).map(_._2)
    assert(r.getLong(0) == all.length && r.getLong(1) == smp.length,
      "sample membership must replay the md5 bucket filter")
    // ±30% band on the 1/16 rate: deterministic, but the md5 buckets
    // of a finite keyset aren't perfectly uniform
    assert(math.abs(r.getLong(1).toDouble / all.length - 1.0 / 16) <= 0.3 / 16)
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b))
    for ((qi, si, xi) <- Seq((0.5, 2, 3), (0.9, 5, 6), (0.99, 8, 9))) {
      assert(close(r.getDouble(si), pct(smp, qi)), s"sample p$qi must replay")
      assert(close(r.getDouble(xi), pct(all, qi)), s"exact p$qi must replay")
    }
    // the audited-error law: reported errors are |sample − exact|
    assert(r.getDouble(4) ==
      BigDecimal(math.abs(r.getDouble(2) - r.getDouble(3)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("p47 curation pipeline matches a three-stage replay: survivors → quality → packs") {
    val out = Pipeline.p47.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // stage 1: union-find survivors (cluster reps survive)
    val pairs = Pipeline.minhashPairs(spark, sf).select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // stage 2: the rule label on survivors; stage 3: cumulative packs
    val en = Seq("the", "a", "of", "and", "to", "is")
    val kept = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val t = r.getString(2).split(" ").filter(_.nonEmpty)
        (r.getLong(0), r.getString(1), t.length.toLong,
          t.length >= 30 && t.distinct.length.toDouble / t.length >= 0.2 &&
            t.count(en.contains).toDouble / t.length <= 0.5)
      }
      .filter { case (id, _, _, q) => find(id) == id && q }
    val expected = kept.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n, _) =>
        val packId = cum / 2048; cum += n; (lang, packId, id, n)
      }.groupBy(t => (t._1, t._2)).toSeq.sortBy(t => (t._1._1, t._1._2))
        .map { case ((lg, pk), xs) =>
          (lg, pk, xs.size.toLong, xs.map(_._4).sum,
            xs.count(_._4 > 2048).toLong, xs.map(_._3).min, xs.map(_._3).max)
        }
    }
    assert(out == expected, s"pipeline must equal the replay:\n got ${out.take(4)}…\nwant ${expected.take(4)}…")
    // composition laws: nothing packed that a stage rejected
    val keptIds = kept.map(_._1).toSet
    assert(out.map(_._3).sum == keptIds.size, "every kept doc packs exactly once")
    assert(pairs.forall { case (a, b) => !(keptIds(a) && keptIds(b)) },
      "no verified near-dup pair survives with both endpoints packed")
  }

  test("p41 CMS heavy hitters match a brute-force single-node sketch replay") {
    val out = Pipeline.p41.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // full replay: same md5-bucket family, depth 4 × width 256
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def bucket(k: Int, big: String): Long =
      java.lang.Long.parseLong(md5hex(s"$k:$big").take(15), 16) % 2147483647L % 256L
    val bigs = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(col("text")).collect()
      .flatMap { r =>
        val t = r.getString(0).split(" ").filter(_.nonEmpty)
        t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
      }.toSeq
    val exact = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = (for { big <- bigs; k <- 0 until 4 } yield (k, bucket(k, big)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = exact.keys.map(big =>
      big -> (0 until 4).map(k => cells((k, bucket(k, big)))).min).toMap
    val expected = est.toSeq.sortBy { case (b, e) => (-e, b) }.take(25)
      .map { case (b, e) => (b, e, exact(b)) }
    assert(out == expected, s"sketch replay diverges:\n got ${out.take(5)}…\nwant ${expected.take(5)}…")
    // the CMS law: estimates never undercount
    assert(out.forall { case (_, e, x) => e >= x }, "CMS must only overestimate")
    assert(out.map(_._2) == out.map(_._2).sortBy(-_), "candidates ranked by estimate")
  }
}
