package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._
import graft.functions.VecCentroid

/** Coverage queries for the remaining SURVEY §2 rows: non-equi range
  * join, interval-overlap join, full ranking battery, map functions,
  * typed-Aggregator UDAF.
  */
object Extra {

  // q22 — theta/range join (B.3): classify lineitems into inline
  // quantity bands via a non-equi join. The band table is 3 rows →
  // broadcast nested-loop, the sane physical plan for tiny × huge.
  private val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 60.0))

  val q22 = QuerySpec(
    "q22_range_join",
    (s, d) => {
      val b = s.createDataFrame(bands).toDF("band", "lo", "hi")
      lineitem(s, d)
        .join(broadcast(b), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy(col("band"))
    },
    Some {
      val vals = bands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")
      s"""WITH bands(band, lo, hi) AS (VALUES $vals)
         |SELECT band, COUNT(*) AS n,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
         |GROUP BY band ORDER BY band""".stripMargin
    })

  // q23 — interval-overlap join (B.3): user session intervals (30-min
  // gap sessions, q21 semantics) overlapping fixed maintenance windows:
  // s.start <= w.end AND w.start <= s.end.
  private val windows = Seq(
    ("w1", "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
    ("w2", "2024-01-15 12:00:00", "2024-01-16 00:00:00"),
    ("w3", "2024-01-25 06:00:00", "2024-01-26 18:00:00"))

  val q23 = QuerySpec(
    "q23_interval_join",
    (s, d) => {
      val sessions = events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("ss"),
          col("session_window.end").as("se"), col("n_events"))
      val w = s.createDataFrame(windows).toDF("wname", "ws", "we")
        .select(col("wname"), col("ws").cast("timestamp"), col("we").cast("timestamp"))
      sessions
        .join(broadcast(w), col("ss") <= col("we") && col("ws") <= col("se"))
        .groupBy(col("wname"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy(col("wname"))
    },
    Some {
      val vals = windows.map { case (n, a, b) => s"('$n', TIMESTAMP '$a', TIMESTAMP '$b')" }.mkString(", ")
      // Session intervals via gaps-and-islands (same 30-min split
      // semantics as q21); Spark's session_window end = last ts + gap.
      s"""WITH g AS (
         |  SELECT user_id, ts,
         |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |                   >= INTERVAL 30 MINUTE
         |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events),
         |sess0 AS (SELECT user_id, ts,
         |                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |          FROM g),
         |sess AS (SELECT user_id, MIN(ts) AS ss, MAX(ts) + INTERVAL 30 MINUTE AS se,
         |                COUNT(*) AS n_events
         |         FROM sess0 GROUP BY user_id, sid),
         |w(wname, ws, we) AS (VALUES $vals)
         |SELECT wname, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events
         |FROM sess JOIN w ON ss <= we AND ws <= se
         |GROUP BY wname ORDER BY wname""".stripMargin
    })

  // q24 — ranking battery (B.5): rank / dense_rank / percent_rank /
  // ntile / cume_dist per order priority; top-5 rows per group by
  // row_number keeps the output bounded.
  val q24 = QuerySpec(
    "q24_ranking_battery",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("tile", ntile(4).over(w))
        .withColumn("cume", cume_dist().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
           |       CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
           |       CAST(drnk AS INTEGER) AS drnk, prnk, CAST(tile AS INTEGER) AS tile, cume
           |FROM (
           |  SELECT o_orderpriority, o_orderkey, o_totalprice,
           |         ROW_NUMBER()   OVER w AS rn,
           |         RANK()         OVER w AS rnk,
           |         DENSE_RANK()   OVER w AS drnk,
           |         PERCENT_RANK() OVER w AS prnk,
           |         NTILE(4)       OVER w AS tile,
           |         CUME_DIST()    OVER w AS cume
           |  FROM orders
           |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
           |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin))

  // q25 — map functions (B.2): build a string map per event, extract /
  // enumerate keys / cardinality. (DuckDB map[key] yields a list —
  // [1] unwraps; Spark element_at yields the scalar directly.)
  val q25 = QuerySpec(
    "q25_map_fns",
    (s, d) =>
      events(s, d)
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
        .withColumn("m", map(lit("k"), col("k").cast("string"), lit("type"), col("event_type")))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          element_at(col("m"), "type").as("type_val"),
          array_join(map_keys(col("m")), ",").as("keys"),
          size(col("m")).as("m_size"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |       m['k'][1] AS k_val,
           |       m['type'][1] AS type_val,
           |       array_to_string(map_keys(m), ',') AS keys,
           |       CAST(cardinality(m) AS INTEGER) AS m_size
           |FROM (SELECT event_id,
           |             MAP(['k', 'type'],
           |                 [CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR), event_type]) AS m
           |      FROM events)
           |ORDER BY event_id""".stripMargin))

  // p11 — typed Aggregator UDAF (B.8): per-label embedding centroid,
  // first 4 dimensions. Same sum-then-divide order as the oracle;
  // round(4) absorbs float addition-order drift.
  val p11 = QuerySpec(
    "p11_centroid_udaf",
    (s, d) => {
      import s.implicits._
      val centroid = udaf(new VecCentroid(4))
      embeddings(s, d)
        .groupBy(col("label"))
        .agg(centroid(col("embedding")).as("c"))
        .select(col("label"), posexplode(col("c")))
        .select(col("label"), col("pos").as("dim"), round(col("col"), 4).as("c"))
        .orderBy(col("label"), col("dim"))
    },
    Some("""WITH f AS (SELECT label, generate_subscripts(embedding, 1) AS i,
           |                  CAST(unnest(embedding) AS DOUBLE) AS v
           |           FROM embeddings)
           |SELECT label, i - 1 AS dim, ROUND(SUM(v) / COUNT(*), 4) AS c
           |FROM f WHERE i <= 4 GROUP BY label, i
           |ORDER BY label, dim""".stripMargin))

  // q26 — exact percentiles (B.4): Spark `percentile` and DuckDB
  // `quantile_cont` both linearly interpolate over the sorted values —
  // same arithmetic on the same doubles. The approx variant is q26b.
  val q26 = QuerySpec(
    "q26_percentile_exact",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |       quantile_cont(o_totalprice, 0.5) AS p50,
           |       quantile_cont(o_totalprice, 0.9) AS p90,
           |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q26b — approx_percentile (t-digest-style sketch): estimator
  // internals are engine-specific, so no hash oracle (driver records
  // rows-only); the ScalaTest side bounds it against q26's exact values.
  val q26b = QuerySpec(
    "q26b_percentile_approx",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap90"))
        .orderBy(col("o_orderpriority")),
    None)

  // q27 — multiset set ops (B.5 `_all` variants): INTERSECT ALL keeps
  // min(multiplicity), EXCEPT ALL subtracts multiplicities.
  val q27 = QuerySpec(
    "q27_setops_all",
    (s, d) => {
      val ev = events(s, d)
      val a = ev.filter(col("event_type") === "click").select(col("user_id"))
      val b = ev.filter(col("event_type") === "purchase").select(col("user_id"))
      val ia = a.intersectAll(b).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("tag"), col("user_id"), col("n"))
      val ea = a.exceptAll(b).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("tag"), col("user_id"), col("n"))
      ia.unionByName(ea).orderBy(col("tag"), col("user_id"))
    },
    Some("""WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
           |     b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
           |     ia AS (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b),
           |     ea AS (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)
           |SELECT 'intersect_all' AS tag, user_id, COUNT(*) AS n FROM ia GROUP BY 1, 2
           |UNION ALL
           |SELECT 'except_all' AS tag, user_id, COUNT(*) AS n FROM ea GROUP BY 1, 2
           |ORDER BY tag, user_id""".stripMargin))

  // q28 — spark.sql front door (A7): the same engine surface through
  // SQL text over registered temp views, proving the catalog path.
  val q28 = QuerySpec(
    "q28_sql_front_door",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT n_name, COUNT(*) AS n_cust,
              |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },
    Some("""SELECT n_name, COUNT(*) AS n_cust,
           |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  // q29 — collect aggregates (B.4): collect_set/collect_list are
  // shuffle-order-nondeterministic, so contract outputs always wrap
  // them in sort_array (SURVEY §7.4.6).
  val q29 = QuerySpec(
    "q29_collect_aggs",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          size(collect_list(col("o_orderkey"))).as("n_collected"),
          sort_array(collect_set(year(col("o_orderdate"))))(0).as("first_year"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           |       CAST(len(list(o_orderkey)) AS INTEGER) AS n_collected,
           |       list_sort(list(DISTINCT YEAR(o_orderdate)))[1] AS first_year
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q30 — cube + grouping id (B.4): all four grouping-set combinations
  // of (status, order-year) in one pass. gid is computed from per-column
  // GROUPING flags on the DuckDB side (2*g_a + g_b) so the bit order is
  // pinned rather than relying on dialect GROUPING_ID conventions.
  val q30 = QuerySpec(
    "q30_cube_grouping",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderstatus"),
          year(col("o_orderdate").cast("date")).as("yr"),
          col("o_totalprice"))
        .cube(col("o_orderstatus"), col("yr"))
        .agg(
          grouping_id().cast("int").as("gid"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("yr").asc_nulls_first),
    Some("""SELECT o_orderstatus, yr,
           |       CAST(2*GROUPING(o_orderstatus) + GROUPING(yr) AS INTEGER) AS gid,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           |       COUNT(*) AS n
           |FROM (SELECT o_orderstatus, CAST(YEAR(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
           |             o_totalprice FROM orders)
           |GROUP BY CUBE(o_orderstatus, yr)
           |ORDER BY gid, o_orderstatus NULLS FIRST, yr NULLS FIRST""".stripMargin))

  // q30b — GROUPING SETS (B.4): only reachable through the SQL front
  // door (the DataFrame API exposes rollup/cube but not arbitrary sets).
  val q30b = QuerySpec(
    "q30b_grouping_sets",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |       CAST(2*GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS INT) AS gid,
              |       COUNT(*) AS n
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
           |       CAST(2*GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS INTEGER) AS gid,
           |       COUNT(*) AS n
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  // q31 — JSON function battery (B.2): get_json_object / json_tuple
  // extraction and to_json serialization of a struct. Field order in
  // to_json follows struct construction order in both engines.
  val q31 = QuerySpec(
    "q31_json_battery",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          json_tuple(col("props"), "k").as("k_jt"),
          to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("j"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |       json_extract_string(props, '$.k') AS k_str,
           |       json_extract_string(props, '$.k') AS k_jt,
           |       CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR) AS j
           |FROM events ORDER BY event_id""".stripMargin))

  // q32 — pivot (B.4 adjacent): groupBy().pivot() with EXPLICIT value
  // list — the implicit form collects distinct pivot values to the
  // driver (an extra job and a scale hazard); with declared values the
  // pivot is a single pass of conditional aggregation, which is also
  // exactly how the oracle expresses it.
  val q32 = QuerySpec(
    "q32_pivot",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
           |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
           |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
           |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // q33 — correlated subqueries through the SQL front door: EXISTS /
  // NOT EXISTS / scalar subquery. Catalyst decorrelates these into the
  // same semi/anti/aggregate-join plans q5 builds with the DSL
  // (SURVEY §4's "subquery decorrelation" row) — the point is that the
  // SQL spelling reaches the identical scalable shape.
  val q33 = QuerySpec(
    "q33_subqueries",
    (s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, c_mktsegment,
              |       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
              |FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              |              AND o_totalprice > 200000.0)
              |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              |                  AND o_orderstatus = 'P')
              |ORDER BY c_custkey""".stripMargin)
    },
    Some("""SELECT c_custkey, c_mktsegment,
           |       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |              AND o_totalprice > 200000.0)
           |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |                  AND o_orderstatus = 'P')
           |ORDER BY c_custkey""".stripMargin))

  // q34 — sliding windows (B.6): 10-minute windows advancing every 5
  // minutes, so each event lands in exactly two windows. Spark's
  // window() generator expands each row to its overlapping windows
  // before the grouped count; the oracle enumerates the same two
  // epoch-aligned starts per event (floor5(ts) and floor5(ts)−5min)
  // and groups. Closes the one window shape without a hash gate
  // (tumbling = q20, session = q21; streaming parity in StreamingSpec).
  val q34 = QuerySpec(
    "q34_sliding_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""WITH w AS (
           |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
           |                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS window_start,
           |         event_type
           |  FROM events)
           |SELECT window_start, event_type, COUNT(*) AS cnt
           |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q35 — UNPIVOT/melt (B.4's pivot inverse): three measure columns
  // fold into (metric, val) rows via the stack() generator — a single
  // narrow pass, no shuffle until the contract ORDER BY. The oracle
  // spells it as the equivalent UNION ALL (the portable form; values
  // pass through untouched, so doubles stay bit-identical).
  val q35 = QuerySpec(
    "q35_unpivot",
    (s, d) =>
      lineitem(s, d)
        .selectExpr("l_orderkey", "l_linenumber",
          "stack(3, 'discount', l_discount, 'price', l_extendedprice, 'tax', l_tax) AS (metric, val)")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
    Some("""SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val FROM lineitem
           |UNION ALL
           |SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
           |UNION ALL
           |SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
           |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin))

  // q36 — window extras (B.5): IGNORE NULLS first/last, nth_value,
  // lag with default, and a RANGE frame (value-based — unlike q9's
  // ROWS frames it contracts over gaps in the day sequence). Values
  // pass through without arithmetic, so no rounding is needed.
  val q36 = QuerySpec(
    "q36_window_extras",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dn", datediff(col("d"), lit("2024-01-01").cast("date")))
        .withColumn("v", when(col("cnt") % 3 === 0, col("cnt").cast("double")))
      val wo = Window.partitionBy(col("user_id")).orderBy(col("dn"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wr = wo.rangeBetween(-6, 0)
      daily.select(
          col("user_id"), col("d"), col("cnt"),
          first(col("v"), ignoreNulls = true).over(wf).as("first_nn"),
          last(col("v"), ignoreNulls = true).over(wf).as("last_nn"),
          nth_value(col("v"), 2).over(wf).as("nth2"),
          lag(col("v"), 1, -1.0).over(wo).as("prev_v"),
          sum(col("cnt")).over(wr).as("range_sum"),
          count(lit(1)).over(wr).as("range_cnt"))
        .orderBy(col("user_id"), col("d"))
    },
    Some("""WITH daily AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |base AS (SELECT *, DATE_DIFF('day', DATE '2024-01-01', d) AS dn,
           |                CASE WHEN cnt % 3 = 0 THEN CAST(cnt AS DOUBLE) END AS v
           |         FROM daily)
           |SELECT user_id, d, cnt,
           |       FIRST_VALUE(v IGNORE NULLS) OVER wf AS first_nn,
           |       LAST_VALUE(v IGNORE NULLS) OVER wf AS last_nn,
           |       NTH_VALUE(v, 2) OVER wf AS nth2,
           |       LAG(v, 1, -1.0) OVER wo AS prev_v,
           |       CAST(SUM(cnt) OVER wr AS BIGINT) AS range_sum,
           |       COUNT(*) OVER wr AS range_cnt
           |FROM base
           |WINDOW wf AS (PARTITION BY user_id ORDER BY dn
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           |       wo AS (PARTITION BY user_id ORDER BY dn),
           |       wr AS (PARTITION BY user_id ORDER BY dn
           |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY user_id, d""".stripMargin))

  // q37 — DataFrameNaFunctions battery (B.2): nulls injected
  // deterministically, then na.fill (per-column defaults), na.drop
  // (subset), na.replace (value mapping) — the standard
  // missing-data-cleanup surface, all integer/string so the oracle is
  // trivially exact.
  val q37 = QuerySpec(
    "q37_na_fns",
    (s, d) => {
      val base = orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status"),
        when(col("o_orderkey") % 7 =!= 0, col("o_custkey")).as("cust"))
      val filled = base.na.fill(Map("status" -> "unknown", "cust" -> -1L))
        .na.replace("status", Map("F" -> "finished"))
      val dropped = base.na.drop(Seq("cust"))
      filled.select(col("o_orderkey"), col("status"), col("cust"))
        .join(
          dropped.select(col("o_orderkey"), lit(1).as("kept")),
          Seq("o_orderkey"), "left_outer")
        .select(col("o_orderkey"), col("status"), col("cust"),
          coalesce(col("kept"), lit(0)).as("kept"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey,
           |         NULLIF(o_orderstatus, 'P') AS status,
           |         CASE WHEN o_orderkey % 7 <> 0 THEN o_custkey END AS cust
           |  FROM orders)
           |SELECT o_orderkey,
           |       CASE COALESCE(status, 'unknown')
           |            WHEN 'F' THEN 'finished' ELSE COALESCE(status, 'unknown') END AS status,
           |       COALESCE(cust, -1) AS cust,
           |       CASE WHEN cust IS NULL THEN 0 ELSE 1 END AS kept
           |FROM base ORDER BY o_orderkey""".stripMargin))

  // q38 — datetime battery (B.2, beyond q13's year/month/datediff):
  // calendar navigation fns with cross-engine traps pinned — DuckDB's
  // dayofweek is 0-based (Sunday=0) vs Spark's 1-based, and DuckDB's
  // `+ INTERVAL 1 MONTH` clamps end-of-month exactly like add_months
  // (verified on Jan-31/leap-Feb edges). weekofyear/months_between are
  // deliberately excluded: their conventions genuinely diverge across
  // engines and a contract query must not depend on them.
  val q38 = QuerySpec(
    "q38_datetime",
    (s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
        .select(
          col("o_orderkey"),
          dayofweek(col("d")).as("dow"),
          dayofmonth(col("d")).as("dom"),
          dayofyear(col("d")).as("doy"),
          quarter(col("d")).as("qtr"),
          last_day(col("d")).as("month_end"),
          add_months(col("d"), 1).as("plus_1m"),
          date_trunc("quarter", col("d")).cast("date").as("qtr_start"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |       CAST(dayofweek(d) + 1 AS INTEGER) AS dow,
           |       CAST(day(d) AS INTEGER) AS dom,
           |       CAST(dayofyear(d) AS INTEGER) AS doy,
           |       CAST(quarter(d) AS INTEGER) AS qtr,
           |       last_day(d) AS month_end,
           |       CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_1m,
           |       CAST(date_trunc('quarter', d) AS DATE) AS qtr_start
           |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  // q39 — extended string battery (B.2, beyond q13's basics): padding,
  // repetition, reversal, translate, edit distance, token addressing,
  // substring addressing, global regex replace, printf-style
  // formatting. Portability notes: DuckDB regexp_replace needs the 'g'
  // flag to match Spark's replace-all default; format_string ≙ printf;
  // initcap is excluded (absent in DuckDB 1.0).
  val q39 = QuerySpec(
    "q39_string_battery2",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          lpad(col("o_orderstatus"), 5, "*").as("padded_l"),
          rpad(col("o_orderstatus"), 5, "*").as("padded_r"),
          repeat(col("o_orderstatus"), 3).as("repeated"),
          reverse(col("o_orderpriority")).as("reversed"),
          translate(col("o_orderpriority"), "AEIOU", "aeiou").as("translated"),
          levenshtein(col("o_orderpriority"), lit("1-URGENT")).as("edit_dist"),
          expr("split_part(o_orderpriority, '-', 2)").as("pri_word"),
          instr(col("o_orderpriority"), "R").as("r_pos"),
          expr("left(o_orderpriority, 3)").as("head3"),
          expr("right(o_orderpriority, 3)").as("tail3"),
          regexp_replace(col("o_orderpriority"), "[0-9]", "#").as("masked"),
          format_string("%s/%s", col("o_orderstatus"), col("o_orderpriority")).as("formatted"),
          ascii(col("o_orderstatus")).as("status_ascii"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |       LPAD(o_orderstatus, 5, '*') AS padded_l,
           |       RPAD(o_orderstatus, 5, '*') AS padded_r,
           |       REPEAT(o_orderstatus, 3) AS repeated,
           |       REVERSE(o_orderpriority) AS reversed,
           |       TRANSLATE(o_orderpriority, 'AEIOU', 'aeiou') AS translated,
           |       CAST(LEVENSHTEIN(o_orderpriority, '1-URGENT') AS INTEGER) AS edit_dist,
           |       SPLIT_PART(o_orderpriority, '-', 2) AS pri_word,
           |       CAST(INSTR(o_orderpriority, 'R') AS INTEGER) AS r_pos,
           |       LEFT(o_orderpriority, 3) AS head3,
           |       RIGHT(o_orderpriority, 3) AS tail3,
           |       REGEXP_REPLACE(o_orderpriority, '[0-9]', '#', 'g') AS masked,
           |       PRINTF('%s/%s', o_orderstatus, o_orderpriority) AS formatted,
           |       CAST(ASCII(o_orderstatus) AS INTEGER) AS status_ascii
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  val all: Seq[QuerySpec] =
    Seq(q22, q23, q24, q25, p11, q26, q26b, q27, q28, q29, q30, q30b, q31, q32, q33, q34,
      q35, q36, q37, q38, q39)
}
