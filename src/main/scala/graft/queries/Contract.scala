package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** One contract query: a Spark program plus (optionally) the equivalent
  * DuckDB SQL the driver runs as oracle. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** SURVEY.md §2 Part C contract queries Q1–Q21 (batch relational core).
  *
  * Determinism discipline (SURVEY §7.4 traps 1–2):
  *  - never SUM raw doubles (addition order differs between engines):
  *    cast to decimal first — scale = data precision + 2 — then cast the
  *    exact decimal result back to double for a schema both engines agree
  *    on. Money columns carry 2dp → sums use decimal(18,4); products of
  *    two 2dp columns carry 4dp → decimal(18,6).
  *  - AVG = decimal-sum / count (single deterministic IEEE division),
  *    never the engine's avg (intermediate types differ).
  *  - every window ORDER BY carries a unique tiebreak key.
  *  - final ORDER BY on non-null keys only (Spark default NULLS FIRST vs
  *    DuckDB NULLS LAST), or explicit NULLS FIRST on both sides.
  */
object Relational {
  import Tables._

  private val dec4 = "decimal(18,4)"
  private val dec6 = "decimal(18,6)"

  /** Exact money sum: decimal-cast inside, double outside. */
  private def dsum(c: Column, dt: String = dec4): Column =
    sum(c.cast(dt)).cast("double")

  // Q1 — scan + filter + project + agg (TPC-H Q6 shape; dates shifted to
  // the generated 1995-2001 range, FIXTURES.md). Reference grounding:
  // filter A4 + projection A5 (customMapper.ts:12-24) generalized.
  val q1 = QuerySpec(
    "q1_filter_agg",
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount"), dec6).as("revenue"),
          count(lit(1)).as("n_rows")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           |       COUNT(*) AS n_rows
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin))

  // Q2 — inner equi join + grouped agg. Shuffle-hash/broadcast picked by
  // Catalyst/AQE; customer grows with SF so no forced broadcast.
  val q2 = QuerySpec(
    "q2_join_agg",
    (s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // Q3 — multi-join chain (TPC-H Q5 shape). nation/region are tiny at any
  // SF → broadcast; lineitem⋈orders⋈customer shuffle on keys.
  val q3 = QuerySpec(
    "q3_join_chain",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec6).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
    Some("""SELECT n_name,
           |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  // Q4 — left outer join preserving zero-order customers; count(col)
  // skips nulls in both engines.
  val q4 = QuerySpec(
    "q4_outer_join",
    (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin))

  // Q5 — left semi + left anti, tagged union.
  val q5 = QuerySpec(
    "q5_semi_anti",
    (s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      semi.unionByName(anti).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, 'has_orders' AS tag FROM customer
           |WHERE c_custkey IN (SELECT o_custkey FROM orders)
           |UNION ALL
           |SELECT c_custkey, 'no_orders' AS tag FROM customer
           |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           |ORDER BY c_custkey""".stripMargin))

  // Q6 — grouped agg + having + count-distinct; avg via exact-sum/count.
  val q6 = QuerySpec(
    "q6_having_distinct",
    (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 10)
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           |       COUNT(*) AS n_orders
           |FROM orders GROUP BY o_orderpriority
           |HAVING COUNT(*) > 10 ORDER BY o_orderpriority""".stripMargin))

  // Q7 — rollup + grouping flags (cast to int: Spark emits tinyint).
  val q7 = QuerySpec(
    "q7_rollup",
    (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(
          col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
           |       COUNT(*) AS n_rows
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  // Q8 — per-group top-k via ranking window (physical: shuffle on
  // c_mktsegment only; the filter on rn prunes before the final sort).
  val q8 = QuerySpec(
    "q8_topk_per_group",
    (s, d) => {
      val oc = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      oc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
           |FROM (
           |  SELECT c_mktsegment, o_orderkey, o_totalprice,
           |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
           |  FROM orders JOIN customer ON o_custkey = c_custkey)
           |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin))

  // Q9 — window frames: running total + 7-row moving average over daily
  // order totals. All frame sums stay decimal (exact) until the edge.
  //
  // Scale shape (VERDICT r1 #3): a bare `Window.orderBy` serializes the
  // whole relation through ONE task, so both frames run two-phase with
  // every window PARTITIONED by year:
  //  - running total = per-year cumulative sum + a per-year cumulative
  //    OFFSET of all prior years (#years values, bounded driver state —
  //    the p20/p39 trainer discipline; no global window anywhere);
  //  - 7-row moving frame = each year's partition is augmented with the
  //    last 6 rows of the previous year (the frame's maximum reach-back),
  //    so the windowed sum/count see exactly the rows the global frame
  //    would; the helper rows are dropped after the window. Correct
  //    whenever each partition holds >= 6 rows — true by construction for
  //    year partitions of daily rows; a sparser dataset would pick a
  //    coarser partition key the same way.
  // The offsets and the next-present-year successor map both derive from
  // ONE #years-row collect (originally two theta-join branches + a final
  // broadcast join — correct, but 6 extra jobs on a latency-bound chain;
  // the r19 re-measure found the job count, not the data, dominating).
  // They re-enter the plan as foldable map literals, so the whole query
  // is: daily agg → helper-tail window → union → ONE WindowExec → sort.
  // Decimal exactness is preserved: every interior sum is decimal, the
  // driver accumulates offsets in exact BigDecimal addition (order-free),
  // the one double cast stays at the edge, so the result is bit-identical
  // to the single-window form (and the oracle keeps the global-window
  // SQL).
  val q9 = QuerySpec(
    "q9_window_frames",
    (s, d) => {
      // two consumers below (helper tails, frame input) — persist or the
      // orders scan+agg reruns per branch
      val daily = orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(col("o_totalprice").cast(dec4)).as("total"))
        .withColumn("yr", year(col("d")))
        .persist()
      // #years driver rows: per-year totals in year order
      val yt = daily.groupBy(col("yr")).agg(sum(col("total")).as("yr_total"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
      // cumulative offset of strictly-prior years (exact decimal adds)
      var acc = java.math.BigDecimal.ZERO
      val offsetOf: Seq[(Int, java.math.BigDecimal)] = yt.toSeq.map { case (y, t) =>
        val o = acc; acc = acc.add(t); y -> o
      }
      // empty input: zero-arg map() types as map<string,string>, so
      // element_at(_, int) would fail analysis — guard like succCol
      // (the theta-join form this replaced returned an empty frame)
      val offsetCol =
        if (offsetOf.isEmpty) lit(null).cast("decimal(28,4)")
        else element_at(
          map(offsetOf.flatMap { case (y, o) =>
            Seq(lit(y), lit(o).cast("decimal(28,4)")) }: _*), col("yr"))
      // next PRESENT year per year — not yr+1: a year absent from the
      // data (sparse datasets, tiny SFs) would otherwise orphan the
      // helpers in an empty partition while the year that actually
      // follows starts its frames 6 rows short of the oracle's global
      // frame. The last year has no successor and contributes no
      // helpers — exactly right, nothing reaches back into it.
      val succOf: Seq[(Int, Int)] =
        yt.map(_._1).sliding(2).collect { case Array(p, n) => p -> n }.toSeq
      val succCol =
        if (succOf.isEmpty) lit(null).cast("int")
        else element_at(
          map(succOf.flatMap { case (p, n) => Seq(lit(p), lit(n)) }: _*), col("yr"))
      // replicate each year's last 6 rows into the successor year's
      // partition as frame-only helper rows (the 7-row frame's maximum
      // reach-back). Helpers sort before all real rows of their
      // partition (their dates are smaller), so one windowed cumsum
      // over the augmented partition serves BOTH outputs:
      //   running_in_year = cum - (cumulative helper sum, which at any
      //                            real row equals the full helper sum)
      //   moving frame    = plain -6..0 frame over augmented rows
      // — all four aggregates share one (partition, order) spec, i.e.
      // ONE WindowExec and one exchange.
      val wYearDesc = Window.partitionBy(col("yr")).orderBy(col("d").desc)
      val helpers = daily.withColumn("rdesc", row_number().over(wYearDesc))
        .filter(col("rdesc") <= 6).drop("rdesc")
        .withColumn("part_yr", succCol).filter(col("part_yr").isNotNull)
        .withColumn("helper", lit(true))
      val aug = daily.withColumn("part_yr", col("yr")).withColumn("helper", lit(false))
        .unionByName(helpers)
      val wPart = Window.partitionBy(col("part_yr")).orderBy(col("d"))
      val w7 = wPart.rowsBetween(-6, 0)
      val wCum = wPart.rowsBetween(Window.unboundedPreceding, 0)
      aug
        .withColumn("mv_sum", sum(col("total")).over(w7))
        .withColumn("mv_cnt", count(lit(1)).over(w7))
        .withColumn("cum_aug", sum(col("total")).over(wCum))
        .withColumn("helper_sum", sum(when(col("helper"), col("total"))).over(wCum))
        .filter(!col("helper"))
        .select(
          col("d"),
          col("total").cast("double").as("day_total"),
          (col("cum_aug") - coalesce(col("helper_sum"), lit(0).cast(dec4))
            + coalesce(offsetCol, lit(0).cast(dec4))).cast("double").as("running_total"),
          (col("mv_sum").cast("double") / col("mv_cnt")).as("moving_avg"))
        .orderBy(col("d"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS d,
           |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
           |  FROM orders GROUP BY 1)
           |SELECT d, CAST(total AS DOUBLE) AS day_total,
           |       CAST(SUM(total) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           |       CAST(SUM(total) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           |         / COUNT(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg
           |FROM daily ORDER BY d""".stripMargin))

  // Q10 — lag/lead day-over-day deltas of per-user daily event counts.
  val q10 = QuerySpec(
    "q10_lag_lead",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      daily
        .select(
          col("user_id"), col("d"), col("cnt"),
          (col("cnt") - lag(col("cnt"), 1).over(w)).as("delta"),
          (lead(col("cnt"), 1).over(w) - col("cnt")).as("next_delta"),
          first(col("cnt")).over(w).as("first_cnt"),
          last(col("cnt")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("last_cnt"))
        .orderBy(col("user_id"), col("d"))
    },
    Some("""WITH daily AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
           |  FROM events GROUP BY 1, 2)
           |SELECT user_id, d, cnt,
           |       cnt - LAG(cnt) OVER (PARTITION BY user_id ORDER BY d) AS delta,
           |       LEAD(cnt) OVER (PARTITION BY user_id ORDER BY d) - cnt AS next_delta,
           |       FIRST_VALUE(cnt) OVER (PARTITION BY user_id ORDER BY d) AS first_cnt,
           |       LAST_VALUE(cnt) OVER (PARTITION BY user_id ORDER BY d
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_cnt
           |FROM daily ORDER BY user_id, d""".stripMargin))

  // Q11 — global top-k: orderBy+limit plans as TakeOrderedAndProject
  // (per-partition top-k, then k-merge on the driver — no total sort).
  val q11 = QuerySpec(
    "q11_global_topk",
    (s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
           |FROM lineitem
           |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
           |LIMIT 10""".stripMargin))

  // Q12 — set ops: INTERSECT / UNION distinct / EXCEPT, tagged.
  val q12 = QuerySpec(
    "q12_set_ops",
    (s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey").as("key"))
      val posBal = c.filter(col("c_acctbal") > 0).select(col("c_custkey").as("key"))
      val supp = supplier(s, d).select(col("s_suppkey").as("key"))
      val both = withOrders.intersect(posBal)
      val u = both.union(supp).distinct()
      val ex = posBal.except(withOrders)
      u.select(lit("in_both_or_supp").as("tag"), col("key"))
        .unionByName(ex.select(lit("bal_no_orders").as("tag"), col("key")))
        .orderBy(col("tag"), col("key"))
    },
    Some("""WITH a AS (SELECT c_custkey AS key FROM customer
           |           WHERE c_custkey IN (SELECT o_custkey FROM orders)),
           |     b AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0),
           |     sup AS (SELECT s_suppkey AS key FROM supplier),
           |     ab AS (SELECT key FROM a INTERSECT SELECT key FROM b),
           |     u AS (SELECT key FROM ab UNION SELECT key FROM sup),
           |     ex AS (SELECT key FROM b EXCEPT SELECT key FROM a)
           |SELECT 'in_both_or_supp' AS tag, key FROM u
           |UNION ALL
           |SELECT 'bal_no_orders' AS tag, key FROM ex
           |ORDER BY tag, key""".stripMargin))

  // Q13 — scalar function battery: string / date / math / conditional.
  // round() kept at integer precision only (fractional double rounding is
  // implementation-divergent across engines — SURVEY §7.4.1).
  val q13 = QuerySpec(
    "q13_scalar_battery",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("pri_upper"),
          substring(col("o_orderpriority"), 1, 1).as("pri_first"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("st_pri"),
          regexp_extract(col("o_orderpriority"), "([0-9]+)", 1).as("pri_num"),
          length(col("o_orderpriority")).as("pri_len"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          round(col("o_totalprice")).as("price_round"),
          floor(col("o_totalprice")).cast("double").as("price_floor"),
          abs(col("o_totalprice") - 150000.0).as("price_dist"),
          (col("o_orderkey") % 7).as("key_mod"),
          when(col("o_totalprice") > 150000.0, "big")
            .when(col("o_totalprice") > 50000.0, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(100000.0)).as("at_least_100k"),
          least(col("o_totalprice"), lit(100000.0)).as("at_most_100k"),
          col("o_orderpriority").like("%URGENT%").as("is_urgent"),
          trim(concat(lit("  "), col("o_orderstatus"), lit("  "))).as("trimmed"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          ceil(col("o_totalprice")).as("price_ceil"),
          pow(lit(2), col("o_orderkey") % 10).cast("long").as("pow2"),
          sqrt(col("o_totalprice")).as("price_sqrt"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
           |       UPPER(o_orderpriority) AS pri_upper,
           |       SUBSTRING(o_orderpriority, 1, 1) AS pri_first,
           |       CONCAT_WS('-', o_orderstatus, o_orderpriority) AS st_pri,
           |       REGEXP_EXTRACT(o_orderpriority, '([0-9]+)', 1) AS pri_num,
           |       LENGTH(o_orderpriority) AS pri_len,
           |       YEAR(o_orderdate) AS yr,
           |       MONTH(o_orderdate) AS mo,
           |       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon_start,
           |       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           |       ROUND(o_totalprice) AS price_round,
           |       CAST(FLOOR(o_totalprice) AS DOUBLE) AS price_floor,
           |       ABS(o_totalprice - 150000.0) AS price_dist,
           |       o_orderkey % 7 AS key_mod,
           |       CASE WHEN o_totalprice > 150000.0 THEN 'big'
           |            WHEN o_totalprice > 50000.0 THEN 'mid'
           |            ELSE 'small' END AS bucket,
           |       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           |       GREATEST(o_totalprice, 100000.0) AS at_least_100k,
           |       LEAST(o_totalprice, 100000.0) AS at_most_100k,
           |       o_orderpriority LIKE '%URGENT%' AS is_urgent,
           |       TRIM(CONCAT('  ', o_orderstatus, '  ')) AS trimmed,
           |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
           |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           |       CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           |       CAST(POWER(2, o_orderkey % 10) AS BIGINT) AS pow2,
           |       SQRT(o_totalprice) AS price_sqrt
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  val all: Seq[QuerySpec] =
    Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13)
}
