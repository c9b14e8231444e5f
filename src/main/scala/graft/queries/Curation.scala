package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables._

/** Round-3 additions: deeper training-data curation signals (Gopher-
  * style repetition, normalization/redaction, frame sampling) and the
  * relational surface around them (LATERAL joins, MERGE upsert,
  * date-spine gap fill).
  *
  * Same oracle discipline as [[Pipeline]]: every hash is md5/sha-based,
  * every float is a single IEEE division of exact integers or a
  * decimal-interior sum cast to double at the edge, and the DuckDB SQL
  * is rendered alongside the Spark program so the two can't drift.
  */
object Curation {

  private val toks = TextFns.tokensExpr("text")
  private val duckToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  // p18 — repetition signals (Gopher-style quality rules): fraction of
  // duplicated 2-grams and the most-frequent-token share, the two
  // cheapest detectors of degenerate (looping / boilerplate) text. The
  // bigram stats are per-row array ops (no shuffle); the top-token
  // share is two partial-aggregated shuffles keyed by doc_id — linear,
  // skew-free (a doc's token instances all land in one group but a doc
  // is bounded, not corpus-sized). Output stays per-doc so a curation
  // run can threshold it; `is_repetitive` shows the decision column
  // (int, not boolean, for cross-engine hashing).
  val p18 = QuerySpec(
    "p18_repetition_signals",
    (s, d) => {
      // tokenize ONCE and persist: both branches below consume the token
      // arrays, and a fused single-pass form is a trap — sibling array
      // expressions next to an explode get inlined past the Generate by
      // CollapseProject and recomputed per token INSTANCE (A/B'd: 2x
      // slower). Two branches over a cached tokenization is the shape
      // that scales: one scan, one tokenize, array stats shuffle-free.
      val tokd = documents(s, d)
        .withColumn("toks", expr(toks))
        .select(col("doc_id"), col("toks"))
        .persist()
      val base = tokd
        .withColumn("bigs", expr(TextFns.shinglesExpr("toks", 2)))
        .select(col("doc_id"),
          size(col("toks")).as("n_tok"),
          size(col("bigs")).as("n_big"),
          size(array_distinct(col("bigs"))).as("n_big_dist"))
      val topTok = tokd
        .select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
      base.join(topTok, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_tok"),
          when(col("n_big") > 0,
            (col("n_big") - col("n_big_dist")).cast("double") / col("n_big"))
            .otherwise(lit(0.0)).as("dup_bigram_frac"),
          when(col("n_tok") > 0,
            coalesce(col("top_c"), lit(0L)).cast("double") / col("n_tok"))
            .otherwise(lit(0.0)).as("top_token_frac"))
        // single-division doubles are bit-identical cross-engine, so a
        // strict threshold compare is deterministic too
        .withColumn("is_repetitive",
          (col("dup_bigram_frac") > 0.1 || col("top_token_frac") > 0.2).cast("int"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH base AS (SELECT doc_id, $duckToks AS toks FROM documents),
            |st AS (SELECT doc_id, len(toks) AS n_tok,
            |         list_transform(range(greatest(len(toks)-1, 0)),
            |                        i -> toks[i+1] || ' ' || toks[i+2]) AS bigs,
            |         toks FROM base),
            |stats AS (SELECT doc_id, n_tok, len(bigs) AS n_big,
            |                 len(list_distinct(bigs)) AS n_big_dist FROM st),
            |inst AS (SELECT doc_id, unnest(toks) AS t FROM base),
            |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM inst GROUP BY 1, 2),
            |top AS (SELECT doc_id, MAX(c) AS top_c FROM tc GROUP BY 1),
            |fr AS (SELECT s.doc_id, s.n_tok,
            |         CASE WHEN n_big > 0
            |              THEN CAST(n_big - n_big_dist AS DOUBLE) / n_big
            |              ELSE 0.0 END AS dup_bigram_frac,
            |         CASE WHEN s.n_tok > 0
            |              THEN CAST(COALESCE(top_c, 0) AS DOUBLE) / s.n_tok
            |              ELSE 0.0 END AS top_token_frac
            |       FROM stats s LEFT JOIN top ON s.doc_id = top.doc_id)
            |SELECT doc_id, n_tok, dup_bigram_frac, top_token_frac,
            |       CAST(CASE WHEN dup_bigram_frac > 0.1 OR top_token_frac > 0.2
            |                 THEN 1 ELSE 0 END AS INTEGER) AS is_repetitive
            |FROM fr ORDER BY doc_id""".stripMargin))

  // p19 — normalization + PII/URL redaction: the scrub pass a crawl
  // corpus goes through before training (lowercase, redact URLs and
  // emails, collapse whitespace). The harness text is clean, so
  // deterministic "dirt" (a URL and an email derived from doc_id) is
  // appended first — the redaction patterns then have real work to do
  // and the oracle verifies byte-identical output via md5. Regexes stay
  // in the Java∩RE2 common subset; DuckDB's regexp_replace needs the
  // 'g' flag to match Spark's replace-all default (q39 note). Linear
  // scan, no shuffle — at 100 TB this is a map-only pass.
  val p19 = QuerySpec(
    "p19_normalize_redact",
    (s, d) => {
      val urlPat = "https?://[^ ]+"
      val emailPat = "[a-z0-9.]+@[a-z0-9.]+"
      documents(s, d)
        .withColumn("dirty",
          concat(col("text"), lit("  Visit HTTPS://EXAMPLE.COM/p/"), col("doc_id"),
            lit(" or mail Doc"), col("doc_id"), lit("@Crawl.NET now")))
        .withColumn("low", lower(col("dirty")))
        .withColumn("clean",
          trim(regexp_replace(
            regexp_replace(
              regexp_replace(col("low"), emailPat, "<email>"),
              urlPat, "<url>"),
            " +", " ")))
        .select(col("doc_id"),
          length(col("dirty")).as("n_raw"),
          length(col("clean")).as("n_clean"),
          size(regexp_extract_all(col("low"), lit(urlPat), lit(0))).as("n_urls"),
          size(regexp_extract_all(col("low"), lit(emailPat), lit(0))).as("n_emails"),
          md5(col("clean")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dirt AS (SELECT doc_id,
           |         text || '  Visit HTTPS://EXAMPLE.COM/p/' || CAST(doc_id AS VARCHAR)
           |              || ' or mail Doc' || CAST(doc_id AS VARCHAR) || '@Crawl.NET now' AS dirty
           |       FROM documents),
           |low AS (SELECT doc_id, dirty, lower(dirty) AS low FROM dirt),
           |cl AS (SELECT doc_id, dirty, low,
           |         trim(regexp_replace(
           |           regexp_replace(
           |             regexp_replace(low, '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g'),
           |             'https?://[^ ]+', '<url>', 'g'),
           |           ' +', ' ', 'g')) AS clean
           |       FROM low)
           |SELECT doc_id,
           |       length(dirty) AS n_raw,
           |       length(clean) AS n_clean,
           |       len(regexp_extract_all(low, 'https?://[^ ]+')) AS n_urls,
           |       len(regexp_extract_all(low, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
           |       md5(clean) AS clean_md5
           |FROM cl ORDER BY doc_id""".stripMargin))

  // m2 — multimodal frame sampling: the video/audio analog of m1's
  // decode plumbing. The payload is an opaque binary column; frames are
  // fixed-stride slices (offset grid 32, frame 16 bytes) hashed for
  // verification — at 100 TB the slicing is a map-only generator with
  // no shuffle, and the payload bytes never leave the scan task. A real
  // codec replaces the slice with a decode call (Multimodal.stubDecode);
  // the harness text is ASCII so DuckDB's VARCHAR sha256 hashes the
  // identical bytes and the plumbing is hash-verifiable end to end.
  val m2 = QuerySpec(
    "m2_frame_sample",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          // empty payload guard: sequence(1, 0) throws (it would count
          // backwards — same trap as TextFns.shinglesExpr); an empty
          // doc contributes zero frames, matching the oracle's range()
          explode(expr(
            "CASE WHEN octet_length(payload) >= 1 THEN sequence(1, octet_length(payload), 32) ELSE CAST(array() AS ARRAY<INT>) END")).as("off"),
          col("payload"))
        .select(col("doc_id"), col("n_bytes"), col("off"),
          sha2(expr("substring(payload, off, 16)"), 256).as("frame_sha"))
        .orderBy(col("doc_id"), col("off")),
    Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes, off,
           |       sha256(substr(text, CAST(off AS INTEGER), 16)) AS frame_sha
           |FROM documents,
           |     UNNEST(range(1, octet_length(encode(text)) + 1, 32)) AS u(off)
           |ORDER BY doc_id, off""".stripMargin))

  // q40 — LATERAL join (B.3 addendum): a correlated derived table per
  // outer row — the SQL-standard form of "top-N per key" that q8 does
  // with a window. Spark decorrelates the LIMIT subquery into a ranked
  // join (no per-row re-execution), so the plan is the same shape as
  // q8's: one shuffle on the correlation key, then a per-group limit.
  val q40 = QuerySpec(
    "q40_lateral_join",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM customer c,
              |     LATERAL (SELECT o_orderkey, o_totalprice FROM orders
              |              WHERE o_custkey = c.c_custkey
              |              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
              |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM customer c,
           |     LATERAL (SELECT o_orderkey, o_totalprice FROM orders
           |              WHERE o_custkey = c.c_custkey
           |              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin))

  // q41 — MERGE upsert (ops.Merge): CDC apply as a batch operator. The
  // change set is derived deterministically from orders (per-customer
  // decimal balance; every 10th key a delete, every 7th≡3 key re-keyed
  // as an insert), then folded into the customer snapshot via the
  // small-changes MERGE path (change set broadcasts, the base snapshot
  // is scanned, never shuffled — the full-outer form can't broadcast).
  // Decimal interior, double at the edge.
  // Insert keys are NEGATED (-(k+1)): custkeys are non-negative at
  // every scale factor, so the insert namespace can never collide with
  // a real key — an additive offset would collide once the corpus
  // outgrows it, producing duplicate change keys and a nondeterministic
  // merge.
  val q41 = QuerySpec(
    "q41_merge_upsert",
    (s, d) => {
      val dec4 = "decimal(18,4)"
      val base = customer(s, d)
        .select(col("c_custkey"), col("c_acctbal").cast(dec4).as("bal"))
      val agg = orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(dec4)).as("bal"))
        .select(col("o_custkey").as("c_custkey"), col("bal"))
        .persist() // consumed by BOTH change branches (upd + ins) — without
                   // this the orders scan+agg runs once per union branch
      val upd = agg.withColumn("op",
        when(col("c_custkey") % 10 === 0, lit("D")).otherwise(lit("U")))
      val ins = agg.filter(col("c_custkey") % 7 === 3)
        .select((-(col("c_custkey") + 1)).as("c_custkey"), col("bal"), lit("I").as("op"))
      graft.ops.Merge.upsertSmallChanges(base, upd.unionByName(ins), "c_custkey", "op")
        .select(col("c_custkey"), col("bal").cast("double").as("bal"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH agg AS (SELECT o_custkey AS c_custkey,
           |                    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS bal
           |             FROM orders GROUP BY 1),
           |upd AS (SELECT c_custkey, bal,
           |               CASE WHEN c_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
           |        FROM agg),
           |ins AS (SELECT -(c_custkey + 1) AS c_custkey, bal, 'I' AS op
           |        FROM agg WHERE c_custkey % 7 = 3),
           |chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
           |base AS (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,4)) AS bal
           |         FROM customer)
           |SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
           |       CAST(COALESCE(c.bal, b.bal) AS DOUBLE) AS bal
           |FROM base b FULL OUTER JOIN chg c ON b.c_custkey = c.c_custkey
           |WHERE c.op IS NULL OR c.op <> 'D'
           |ORDER BY c_custkey""".stripMargin))

  // q42 — date-spine gap fill: a generated calendar (sequence /
  // generate_series TVF) left-joined to daily counts so missing days
  // report 0 — the densification step every time-series report needs
  // and a bare GROUP BY can't provide. The spine is 91 rows: Spark
  // broadcasts the aggregated side or the spine, never shuffles the
  // fact table beyond the one groupBy.
  val q42 = QuerySpec(
    "q42_date_spine",
    (s, d) => {
      val spine = s.range(1).select(
        explode(expr("sequence(to_date('1996-01-01'), to_date('1996-03-31'), interval 1 day)"))
          .as("day"))
      val daily = orders(s, d)
        .select(col("o_orderdate").cast("date").as("day"))
        .filter(col("day").between("1996-01-01", "1996-03-31"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("day"), "left_outer")
        .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("day"))
    },
    Some("""WITH spine AS (SELECT CAST(unnest(generate_series(
           |         DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY)) AS DATE) AS day),
           |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
           |          FROM orders
           |          WHERE CAST(o_orderdate AS DATE)
           |                BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
           |          GROUP BY 1)
           |SELECT s.day, COALESCE(n_orders, 0) AS n_orders
           |FROM spine s LEFT JOIN daily USING (day)
           |ORDER BY day""".stripMargin))

  // q43 — ordered-set aggregates (B.4 addendum): median plus the
  // SQL-standard PERCENTILE_DISC / PERCENTILE_CONT ... WITHIN GROUP
  // (ORDER BY ...) syntax, complementing q26's function-form
  // percentiles. DISC returns an actual element (no float risk); CONT
  // and median interpolate over RAW DOUBLES on both sides — q26's
  // proven parity shape. Decimal interiors are WRONG here, unlike
  // everywhere else: DuckDB interpolates DECIMAL exactly while Spark
  // converts to double first, so a decimal ORDER BY diverges in the
  // last float digits (found by the oracle gate). Exact percentiles
  // sort within each group and a group is ONE task — orders/
  // o_orderpriority (tens of k rows per group) is the right harness
  // shape; a huge-group or global exact percentile at 100 TB uses
  // approx_percentile (q26b) or a pre-bucketed histogram.
  val q43 = QuerySpec(
    "q43_ordered_set_aggs",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority,
              |  median(o_totalprice) AS med_price,
              |  PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1_disc,
              |  PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3_cont
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },
    Some("""SELECT o_orderpriority,
           |  median(o_totalprice) AS med_price,
           |  PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1_disc,
           |  PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3_cont
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q44 — generator battery (B.2 addendum beyond bare explode):
  // posexplode's ordinal output and LATERAL VIEW OUTER's null-row
  // preservation (a doc with no matching elements still appears once,
  // with NULL — the outer-join of generators). DuckDB has neither
  // posexplode nor OUTER generators; the oracle emulates them with
  // range(len(arr)) subscripts and a CASE-wrapped [NULL] list, pinning
  // the exact semantics rather than approximating them.
  val q44 = QuerySpec(
    "q44_generator_battery",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(s"""WITH base AS (SELECT doc_id, $toks AS toks
              |             FROM documents)
              |SELECT doc_id, 'pos' AS src, i, x
              |FROM base LATERAL VIEW posexplode(slice(toks, 1, 3)) t AS i, x
              |UNION ALL
              |SELECT doc_id, 'outer' AS src, CAST(NULL AS INT) AS i, x
              |FROM base LATERAL VIEW OUTER explode(filter(toks, t -> length(t) > 8)) t AS x
              |ORDER BY doc_id, src, i NULLS FIRST, x NULLS FIRST""".stripMargin)
    },
    Some(s"""WITH base AS (SELECT doc_id, $duckToks AS toks
           |              FROM documents),
           |pos AS (SELECT doc_id, 'pos' AS src, CAST(u.i AS INTEGER) AS i, arr[u.i+1] AS x
           |        FROM (SELECT doc_id, toks[1:3] AS arr FROM base) t,
           |             UNNEST(range(len(arr))) AS u(i)),
           |outr AS (SELECT doc_id, 'outer' AS src, CAST(NULL AS INTEGER) AS i, u.x AS x
           |         FROM (SELECT doc_id,
           |                 CASE WHEN len(list_filter(toks, t -> length(t) > 8)) = 0
           |                      THEN [CAST(NULL AS VARCHAR)]
           |                      ELSE list_filter(toks, t -> length(t) > 8) END AS arr
           |               FROM base) t,
           |              UNNEST(arr) AS u(x))
           |SELECT * FROM (SELECT * FROM pos UNION ALL SELECT * FROM outr)
           |ORDER BY doc_id, src, i NULLS FIRST, x NULLS FIRST""".stripMargin))

  // q45 — ordered string aggregation (B.4 addendum): listagg (Spark 4)
  // vs string_agg (DuckDB), DISTINCT + WITHIN GROUP ordering, plus an
  // md5 over a fully-ordered large concatenation — proving the element
  // ORDER inside the aggregate, not just the membership, matches.
  val q45 = QuerySpec(
    "q45_listagg",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT o_orderpriority,
              |  listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
              |  md5(listagg(CAST(o_orderkey AS STRING), '|') WITHIN GROUP (ORDER BY o_orderkey)) AS keys_md5,
              |  count(*) AS n
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },
    Some("""SELECT o_orderpriority,
           |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           |  md5(string_agg(CAST(o_orderkey AS VARCHAR), '|' ORDER BY o_orderkey)) AS keys_md5,
           |  count(*) AS n
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q46 — versioned MERGE (ops.Merge.upsertVersioned): the
  // compare-and-swap apply for OUT-OF-ORDER transports as a batch
  // operator — higher version wins whole-row, equal/lower keeps the
  // base, unseen keys insert (q41 covers the in-order op-column form).
  // Change set derived deterministically from orders: every even key is
  // a change whose version is the base's shifted by (k % 11) - 5, so
  // matched keys (divisible by 6) exercise newer/equal/older CAS
  // outcomes and even keys NOT divisible by 3 (absent from the base)
  // are pure inserts. The plan shape is the CDC one: the change
  // side broadcasts, the base is scanned, never shuffled.
  val q46 = QuerySpec(
    "q46_merge_versioned",
    (s, d) => {
      val base = orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("ver"),
          col("o_orderstatus").as("st"))
      val changes = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_custkey") + col("o_orderkey") % 11 - 5).as("ver"),
          col("o_orderpriority").as("st"))
      graft.ops.Merge.upsertVersioned(base, changes, "k", "ver")
        .orderBy(col("k"))
    },
    Some("""WITH base AS (SELECT o_orderkey AS k, o_custkey AS ver, o_orderstatus AS st
           |              FROM orders WHERE o_orderkey % 3 = 0),
           |chg AS (SELECT o_orderkey AS k, o_custkey + o_orderkey % 11 - 5 AS ver,
           |               o_orderpriority AS st
           |        FROM orders WHERE o_orderkey % 2 = 0)
           |SELECT COALESCE(b.k, c.k) AS k,
           |       CASE WHEN c.k IS NOT NULL AND (b.k IS NULL OR c.ver > b.ver)
           |            THEN c.ver ELSE b.ver END AS ver,
           |       CASE WHEN c.k IS NOT NULL AND (b.k IS NULL OR c.ver > b.ver)
           |            THEN c.st ELSE b.st END AS st
           |FROM base b FULL OUTER JOIN chg c ON b.k = c.k
           |ORDER BY k""".stripMargin))

  // q47 — VARIANT in the ORACLE GATE (Spark 4 §2C surface; VERDICT r8
  // stretch item): the binary-encoded semi-structured type end-to-end —
  // parse_json → variant_get with a typed path — cross-checked against
  // DuckDB's JSON extraction on the same rows. Spark4FeaturesSpec pins
  // variant parity against the from_json path in-engine; this promotes
  // the surface to the DuckDB hash compare. Typed-extraction notes:
  // variant_get(…, 'bigint') and CAST(json_extract_string AS BIGINT)
  // both yield exact int64 (no float detour), and the per-type sums
  // stay in BIGINT (cast in DuckDB, whose SUM widens to HUGEINT).
  //
  // The k%7 predicate is applied as CONDITIONAL AGGREGATION, not a
  // filter: a filter on the derived column gets pushed through the
  // projection, substituting the variant expression into the scan
  // filter — parse_json then runs TWICE per row (plan-verified), and
  // at scale the parse is the query. The when()-guarded aggs consume
  // the projected attribute, so the parse stays single; the trailing
  // n>0 filter keeps group-presence semantics identical to the
  // row-filter form (and to the oracle's WHERE).
  val q47 = QuerySpec(
    "q47_variant_agg",
    (s, d) => {
      val keep = col("k") % 7 =!= 0
      events(s, d)
        .withColumn("k",
          expr("variant_get(parse_json(props), '$.k', 'bigint')"))
        .groupBy(col("event_type"))
        .agg(count(when(keep, 1)).as("n"),
          sum(when(keep, col("k"))).as("sum_k"),
          max(when(keep, col("k"))).as("max_k"))
        .filter(col("n") > 0)
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
           |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |      FROM events)
           |WHERE k % 7 <> 0
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  // q48 — SQL PIPE SYNTAX in the oracle gate (Spark 4 §2C; companion
  // to q47's VARIANT promotion): a multi-stage |> program — join,
  // filter, aggregate, order — through Spark's front door, hash-
  // compared against the classic-SQL DuckDB rendering of the same
  // query. Same float discipline as q1: the revenue sum runs in
  // DECIMAL(18,6) in both engines and casts to DOUBLE only at the
  // edge. Spark4FeaturesSpec pins pipe-vs-classic parity in-engine;
  // this pins the RESULT against the independent engine.
  val q48 = QuerySpec(
    "q48_pipe_sql",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(
        """FROM orders
          ||> JOIN customer ON o_custkey = c_custkey
          ||> WHERE c_mktsegment = 'BUILDING'
          ||> AGGREGATE COUNT(*) AS n,
          |     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          |   GROUP BY o_orderpriority
          ||> ORDER BY o_orderpriority""".stripMargin)
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q49 — MULTI-TABLE CDC DEMUX in the oracle gate (round 10's lead
  // item; A1×A5×A9): the reference's FOR ALL TABLES slot
  // (`/root/reference/src/utilities/query.ts:12`) interleaves
  // `students` and `status` on one stream. Batch replay of the mixed
  // fixture, demuxed per relation through the registry projection,
  // last-image folded per relation, then the FK join the reference
  // implies but never runs (students.status_id → status.id,
  // `terraform/setup_database.sql:14`): live students counted per
  // LIVE status value. The status side is a handful of rows —
  // broadcast, never a shuffle of the students side. The oracle folds
  // both event logs independently as VALUES relations (same
  // generators, no drift).
  val q49 = QuerySpec(
    "q49_multitable_demux",
    (s, _) => {
      import graft.cdc.{Envelope, Fixture}
      val rels = Seq(Envelope.studentsRelation, Envelope.statusRelation)
      val env = s.read.schema(Envelope.unionSchema(rels))
        .json(Fixture.materializeMultiTable())
      def liveState(rel: Envelope.Relation) =
        Envelope.lastImageByKey(
          Envelope.projectRelation(env.filter(col("table") === rel.name), rel))
      val students = liveState(Envelope.studentsRelation)
      val status = liveState(Envelope.statusRelation)
        .select(col("id").as("st_id"), col("value"))
      students.select(col("status"))
        .join(broadcast(status), col("status") === col("st_id"))
        .groupBy(col("value"))
        .agg(count(lit(1)).as("n_students"))
        .select(col("value").as("status_value"), col("n_students"))
        .orderBy(col("status_value"))
    },
    Some(s"""WITH sev(lsn, tag, id, first_name, last_name, date_of_birth, status_id) AS (VALUES
            |${graft.cdc.Fixture.valuesSql}),
            |stv(lsn, tag, id, value) AS (VALUES
            |${graft.cdc.Fixture.statusValuesSql}),
            |sl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM sev),
            |stl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY lsn DESC) AS rn FROM stv),
            |students AS (SELECT id, status_id FROM sl WHERE rn = 1 AND tag <> 'delete'),
            |status AS (SELECT id, value FROM stl WHERE rn = 1 AND tag <> 'delete')
            |SELECT st.value AS status_value, COUNT(*) AS n_students
            |FROM students s JOIN status st ON s.status_id = st.id
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QuerySpec] = Seq(p18, p19, m2, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49)
}
