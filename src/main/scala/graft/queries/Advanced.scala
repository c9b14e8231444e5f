package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._
import graft.ops.AsOf
import graft.cdc.{Envelope, Fixture}

/** SURVEY §2C Q14–Q21: as-of join, JSON/array functions, dedup + HLL,
  * tf-idf, vector top-k, CDC replay, time/session windows. Same
  * determinism discipline as [[Relational]].
  */
object Advanced {

  // Q14 — as-of join: each purchase event matched to the latest click by
  // the same user at-or-before it. (SURVEY Q14's order↔event phrasing is
  // degenerate on the generated data — events live in 2024, orders in
  // 1995-2001 — so the as-of semantics are exercised within `events`.)
  // Spark side: scalable union+window (graft.ops.AsOf); oracle: the
  // explicit range-join + row_number emulation with identical tiebreak.
  val q14 = QuerySpec(
    "q14_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      AsOf.join(purchases, clicks,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payloadCols = Seq("click_id"), rightTiebreak = "click_id")
        .filter(col("asof_click_id").isNotNull)
        .select(col("purchase_id"), col("user_id"), col("asof_click_id").as("click_id"))
        .orderBy(col("purchase_id"))
    },
    Some("""WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |     c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
           |     j AS (SELECT p.purchase_id, p.user_id, c.click_id,
           |                  ROW_NUMBER() OVER (PARTITION BY p.purchase_id
           |                                     ORDER BY c.ts DESC, c.click_id DESC) AS rn
           |           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
           |SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1
           |ORDER BY purchase_id""".stripMargin))

  // Q15 — JSON parsing (from_json on the reference's envelope pattern,
  // customMapper.ts:9 consumes parsed JSON) + integer-exact aggregation.
  val q15 = QuerySpec(
    "q15_json_props",
    (s, d) =>
      events(s, d)
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k,
           |       MIN(k) AS min_k, MAX(k) AS max_k
           |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  // Q15b — array/higher-order-function battery over embeddings. All
  // lambda arithmetic forced to double before any reduction; group sums
  // of arbitrary floats via high-scale decimal (see Relational scaladoc).
  val q15b = QuerySpec(
    "q15b_array_fns",
    (s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"), col("label"),
          col("embedding")(0).cast("double").as("first_el"),
          size(col("embedding")).as("dim"),
          array_min(col("embedding")).cast("double").as("min_el"),
          round(expr("aggregate(slice(embedding, 1, 8), 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 6).as("head8_sum"),
          expr("array_contains(transform(embedding, x -> x > CAST(0.0 AS FLOAT)), true)").as("has_pos"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("has_pos"), 1).otherwise(0)).as("n_has_pos"),
          (sum(col("first_el").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("avg_first"),
          max(col("dim")).as("max_dim"),
          min(col("min_el")).as("min_min"),
          round(sum(col("head8_sum").cast("decimal(28,6)")).cast("double"), 4).as("sum_head8"))
        .orderBy(col("label")),
    Some("""WITH per AS (
           |  SELECT vec_id, label,
           |         CAST(embedding[1] AS DOUBLE) AS first_el,
           |         len(embedding) AS dim,
           |         CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_el,
           |         ROUND(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head8_sum,
           |         list_contains(list_transform(embedding, x -> x > 0), true) AS has_pos
           |  FROM embeddings)
           |SELECT label, COUNT(*) AS n,
           |       CAST(SUM(CASE WHEN has_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_has_pos,
           |       CAST(SUM(CAST(first_el AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS avg_first,
           |       MAX(dim) AS max_dim, MIN(min_el) AS min_min,
           |       ROUND(CAST(SUM(CAST(head8_sum AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_head8
           |FROM per GROUP BY label ORDER BY label""".stripMargin))

  // Q16 — exact dedup by content hash (sha2/sha256 agree byte-for-byte).
  val q16 = QuerySpec(
    "q16_dedup_exact",
    (s, d) =>
      documents(s, d)
        .withColumn("h", sha2(col("text"), 256))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_distinct_hash"),
          countDistinct(col("text")).as("n_distinct_text")),
    Some("""SELECT COUNT(*) AS n_docs,
           |       COUNT(DISTINCT sha256(text)) AS n_distinct_hash,
           |       COUNT(DISTINCT text) AS n_distinct_text
           |FROM documents""".stripMargin))

  // Q16h — HLL approx distinct vs exact. No oracle by design: estimator
  // internals differ across engines (SURVEY §7.4.4); the ScalaTest side
  // asserts the ±5% band instead, the driver records rows-only.
  val q16h = QuerySpec(
    "q16_hll",
    (s, d) => {
      // two countDistinct columns in one groupBy force an Expand ×3 of
      // every input row before the shuffle; splitting into per-column
      // dedup-then-count aggregations shuffles each column once at its
      // deduplicated size instead (~2× at sf0.1, more as rows/distinct
      // grows). The HLL sketches stay in one pass — fixed-size buffers.
      val base = events(s, d).select(col("event_type"), col("user_id"), col("event_id"))
      val approx = base.groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_events"))
      // isNotNull keeps COUNT(DISTINCT col) null semantics exactly
      val eu = base.select(col("event_type"), col("user_id"))
        .where(col("user_id").isNotNull).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
      val ee = base.select(col("event_type"), col("event_id"))
        .where(col("event_id").isNotNull).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_events"))
      approx.join(eu, "event_type").join(ee, "event_type")
        .select(col("event_type"), col("exact_users"), col("approx_users"),
          col("exact_events"), col("approx_events"))
        .orderBy(col("event_type"))
    },
    None)

  // Q17 — tf-idf over the en corpus; corpus-size scalar joined in via
  // broadcast cross-join (never collect()).
  val q17 = QuerySpec(
    "q17_tfidf",
    (s, d) => {
      val toks = documents(s, d)
        .filter(col("lang") === "en")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val n = toks.agg(countDistinct(col("doc_id")).as("n_docs"))
      val tf = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      val df = toks.distinct().groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(df, "token")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .orderBy(col("score").desc, col("token"))
        .limit(5)
        .select(col("token"), col("tf"), col("df"), round(col("score"), 6).as("tfidf"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           |             FROM documents WHERE lang = 'en'),
           |     tok2 AS (SELECT * FROM tok WHERE token <> ''),
           |     n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok2),
           |     tf AS (SELECT token, COUNT(*) AS tf FROM tok2 GROUP BY token),
           |     df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY token)
           |SELECT tf.token, tf.tf, df.df,
           |       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
           |FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
           |ORDER BY tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.token
           |LIMIT 5""".stripMargin))

  // Q18 — brute-force cosine top-k: norms computed once per vector
  // (shared subplan), 5 query vectors broadcast against all candidates,
  // per-query top-3 via ranking window over the tiny pair set. Dot
  // product stays inside codegen via zip_with+aggregate HOFs — no UDF.
  val q18 = QuerySpec(
    "q18_vector_topk",
    (s, d) => {
      graft.expressions.VectorExpressions.register(s)
      val e = embeddings(s, d).select(
        col("vec_id"), col("embedding"),
        expr("sqrt(float_dot(embedding, embedding))").as("nrm"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      // rank by the ROUNDED cosine (cid tiebreak): the oracle's SUM dot
      // accumulates in unspecified order, so raw doubles can differ by
      // an ulp and flip near-tied top-k ranks — 6dp pins both engines
      val pairs = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", expr("float_dot(embedding, qe)"))
        .withColumn("cos", round(col("dot") / (col("nrm") * col("qn")), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("vec_id").as("cid"), col("cos").as("cosine"))
        .orderBy(col("qid"), col("rn"))
    },
    Some("""WITH f AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
           |                  CAST(unnest(embedding) AS DOUBLE) AS v
           |           FROM embeddings),
           |     n AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM f GROUP BY vec_id),
           |     p AS (SELECT a.vec_id AS qid, b.vec_id AS cid, SUM(a.v * b.v) AS dot
           |           FROM f a JOIN f b ON a.i = b.i AND a.vec_id < 5 AND b.vec_id <> a.vec_id
           |           GROUP BY 1, 2),
           |     c AS (SELECT qid, cid, dot / (na.nrm * nb.nrm) AS cos
           |           FROM p JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = cid),
           |     r AS (SELECT qid, cid, cos,
           |                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(cos, 6) DESC, cid) AS rn
           |           FROM c)
           |SELECT qid, CAST(rn AS INTEGER) AS rn, cid, ROUND(cos, 6) AS cosine
           |FROM r WHERE rn <= 3 ORDER BY qid, rn""".stripMargin))

  // Q19 — CDC replay to final state: filter(A4) → null-safe typed
  // projection(A5) → last-image-per-key by LSN(A9). The oracle applies
  // the identical DML log (same generator) as a VALUES relation.
  val q19 = QuerySpec(
    "q19_cdc_replay",
    (s, _) => {
      val raw = s.read.schema(Envelope.schema).json(Fixture.materialize())
      Envelope.lastImageByKey(Envelope.project(raw)).orderBy(col("id"))
    },
    Some(s"""WITH ev(lsn, tag, id, first_name, last_name, date_of_birth, status_id) AS (VALUES
            |${Fixture.valuesSql}),
            |last AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn
            |         FROM ev WHERE tag IN ('insert', 'update', 'delete'))
            |SELECT CAST(id AS BIGINT) AS id,
            |       first_name AS "firstName", last_name AS "lastName",
            |       CAST(date_of_birth AS DATE) AS "dateOfBirth",
            |       CAST(status_id AS INTEGER) AS status
            |FROM last WHERE rn = 1 AND tag <> 'delete' ORDER BY id""".stripMargin))

  // Q20 — tumbling 5-minute windows, batch form; epoch-aligned buckets
  // equal DuckDB time_bucket. Stream/batch parity is asserted in
  // StreamingSpec (the streaming run with watermark must equal this).
  val q20 = QuerySpec(
    "q20_tumbling_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           |       event_type, COUNT(*) AS cnt
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // Q21 — session windows (30-minute gap), batch form via
  // session_window; oracle = gaps-and-islands with the same
  // split-at->=30min semantics. Streaming parity in StreamingSpec.
  val q21 = QuerySpec(
    "q21_session_window",
    (s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"), col("last_ts"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH g AS (
           |  SELECT user_id, ts,
           |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |                   >= INTERVAL 30 MINUTE
           |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM events),
           |     sess AS (SELECT user_id, ts,
           |                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
           |                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           |              FROM g)
           |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, MAX(ts) AS last_ts
           |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin))

  // Q50 — SCD2 (type-2 dimension) HISTORY from the CDC replay: the
  // warehouse-side complement to q19's last-image materialization —
  // instead of folding to current state, every insert/update image
  // becomes a history row with an LSN validity interval
  // [valid_from, valid_to), valid_to = the NEXT event's LSN for that
  // key (an update supersedes, a delete closes — deletes contribute
  // their LSN via the lead window but emit no row), is_current = open
  // interval. One key-partitioned window over the event log — the
  // same partitioning q19's fold uses, so at scale the history build
  // costs exactly one extra pass over the already-key-clustered
  // stream. Oracle replays the identical DML log as a VALUES relation
  // (the q19 convention — one generator, two renders, no drift).
  val q50 = QuerySpec(
    "q50_scd2_history",
    (s, _) => {
      val raw = s.read.schema(Envelope.schema).json(Fixture.materialize())
      // pg LSN "hi/lo" → the true 64-bit position (Envelope.lsnNumeric),
      // so the validity bounds are numeric in both engines regardless
      // of the source's hex-string padding; the fold itself is the
      // SHARED Envelope.scd2Fold — the streaming materializer
      // (Streams.materializeScd2) re-folds the same function per batch,
      // so batch replay and incremental history cannot drift
      val proj = Envelope.project(raw)
        .filter(col("tag").isin("insert", "update", "delete"))
        .select(Envelope.lsnNumeric(col("lsn")).as("valid_from"), col("tag"),
          col("id"), col("firstName"), col("lastName"), col("dateOfBirth"), col("status"))
      Envelope.scd2Fold(proj)
        .select(col("id"), col("valid_from"), col("valid_to"),
          col("firstName"), col("lastName"), col("dateOfBirth"), col("status"),
          col("is_current"))
        .orderBy(col("id"), col("valid_from"))
    },
    Some(s"""WITH ev(lsn, tag, id, first_name, last_name, date_of_birth, status_id) AS (VALUES
            |${Fixture.valuesSql}),
            |en AS (SELECT CAST('0x' || lpad(split_part(lsn, '/', 1), 8, '0')
            |                    || lpad(split_part(lsn, '/', 2), 8, '0') AS BIGINT) AS lsn_n,
            |              tag, id, first_name, last_name, date_of_birth, status_id
            |       FROM ev WHERE tag IN ('insert', 'update', 'delete')),
            |h AS (SELECT *, LEAD(lsn_n) OVER (PARTITION BY id ORDER BY lsn_n) AS valid_to
            |      FROM en)
            |SELECT CAST(id AS BIGINT) AS id, lsn_n AS valid_from, valid_to,
            |       first_name AS "firstName", last_name AS "lastName",
            |       CAST(date_of_birth AS DATE) AS "dateOfBirth",
            |       CAST(status_id AS INTEGER) AS status,
            |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
            |FROM h WHERE tag <> 'delete' ORDER BY id, valid_from""".stripMargin))

  val all: Seq[QuerySpec] = Seq(q14, q15, q15b, q16, q16h, q17, q18, q19, q20, q21, q50)
}
