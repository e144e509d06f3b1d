package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational query surface (SURVEY.md §2.D): scans, projection,
  * filters, equi/semi/anti joins, broadcast star joins, grouped and
  * windowed aggregation, rollup/cube, set ops, top-k, sessionization,
  * as-of alignment, JSON access, time bucketing.
  *
  * Determinism vs the DuckDB oracle: every floating-point SUM is cast to
  * an exact DECIMAL before aggregation (identical cast in the oracle SQL)
  * so the result is independent of partition/summation order; every query
  * ends in a total-order sort present on both sides.
  */
object CoreQueries {

  /** Exact decimal sum of a double column, surfaced back as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q01: scan → filter → group-agg (TPC-H Q1 shape). Partial aggregation
    // (map-side combine) is automatic in HashAggregateExec; the shipdate
    // predicate is pushed to the parquet scan.
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .filter($"l_shipdate" <= to_timestamp(lit("1999-09-02 00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "scan+filter+group agg; pushdown + partial agg"),

    // ------------------------------------------------------------------
    // q02: global top-k → Spark plans TakeOrderedAndProject (no full sort).
    QueryDef(
      "q02_top_parts",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "part")
          .select($"p_partkey", $"p_name", $"p_brand", $"p_retailprice")
          .orderBy($"p_retailprice".desc, $"p_partkey".asc)
          .limit(10)
      },
      Some("""
        SELECT p_partkey, p_name, p_brand, p_retailprice
        FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10"""),
      doc = "top-k via TakeOrderedAndProject"),

    // ------------------------------------------------------------------
    // q03: 3-way join + group + top-k (TPC-H Q3 shape). customer is the
    // small side → broadcast hash join, no shuffle of lineitem for it.
    QueryDef(
      "q03_shipping_priority",
      (s, dir) => {
        import s.implicits._
        val cust = T(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = T(s, dir, "orders").filter($"o_orderdate" < to_timestamp(lit("1999-01-01 00:00:00")))
        val li = T(s, dir, "lineitem").filter($"l_shipdate" > to_timestamp(lit("1999-01-01 00:00:00")))
        // orders is fact-scale: no broadcast hint — Catalyst/AQE picks
        // broadcast at small SF and shuffle join beyond the threshold.
        // customer (dim) is always safe to broadcast.
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey".asc)
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""),
      doc = "multi-join + agg + top-k; broadcast dims"),

    // ------------------------------------------------------------------
    // q04: EXISTS → left-semi join with a non-equi conjunct.
    QueryDef(
      "q04_order_priority",
      (s, dir) => {
        import s.implicits._
        val ord = T(s, dir, "orders")
        val li = T(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
        ord.join(li,
            ord("o_orderkey") === li("l_orderkey") &&
              li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL '90' DAY"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      doc = "EXISTS / left-semi join"),

    // ------------------------------------------------------------------
    // q05: full star join (TPC-H Q5 shape) — lineitem ⋈ orders ⋈ customer
    // ⋈ supplier ⋈ nation ⋈ region; all dims broadcast, the fact table is
    // never shuffled for the joins.
    QueryDef(
      "q05_local_supplier_volume",
      (s, dir) => {
        import s.implicits._
        val region = T(s, dir, "region").filter($"r_name" === "ASIA")
        val nation = T(s, dir, "nation")
        val cust = T(s, dir, "customer")
        val supp = T(s, dir, "supplier")
        val ord = T(s, dir, "orders")
          .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            $"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
        // orders is fact-scale (second-largest table): joined without a
        // broadcast hint; true dimensions broadcast unconditionally.
        T(s, dir, "lineitem")
          .join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(cust),
            $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
          .orderBy($"revenue".desc, $"n_name".asc)
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC"""),
      doc = "star-schema join, broadcast dims"),

    // ------------------------------------------------------------------
    // q06: selective filter → single-row agg (TPC-H Q6 shape).
    QueryDef(
      "q06_revenue_forecast",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .filter(
            $"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")) &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
          .agg(dsum($"l_extendedprice" * $"l_discount", 6).as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0"""),
      doc = "filter-only aggregation; predicate pushdown"),

    // ------------------------------------------------------------------
    // q07: NOT EXISTS → left-anti join.
    QueryDef(
      "q07_customers_without_urgent",
      (s, dir) => {
        import s.implicits._
        val urgent = T(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
        T(s, dir, "customer")
          .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_nationkey")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey"""),
      doc = "NOT EXISTS / left-anti join"),

    // ------------------------------------------------------------------
    // q08: semi join + dim join + agg: customers with an open order, per nation.
    QueryDef(
      "q08_active_customers_per_nation",
      (s, dir) => {
        import s.implicits._
        val open = T(s, dir, "orders").filter($"o_orderstatus" === "O")
        T(s, dir, "customer")
          .join(open, $"c_custkey" === $"o_custkey", "left_semi")
          .join(broadcast(T(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_customers"),
            dsum($"c_acctbal", 2).as("sum_acctbal"))
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        GROUP BY n_name
        ORDER BY n_name"""),
      doc = "semi join + broadcast dim + agg"),

    // ------------------------------------------------------------------
    // q09: exact distinct aggregation.
    QueryDef(
      "q09_distinct_customers",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(countDistinct($"o_custkey").as("n_custs"),
            count(lit(1)).as("n_orders"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "exact COUNT DISTINCT (expand+two-phase agg)"),

    // ------------------------------------------------------------------
    // q10: ROLLUP with explicit NULLS FIRST ordering on both sides.
    QueryDef(
      "q10_rollup",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      doc = "ROLLUP grouping"),

    // ------------------------------------------------------------------
    // q11: CUBE.
    QueryDef(
      "q11_cube",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""),
      doc = "CUBE grouping"),

    // ------------------------------------------------------------------
    // q12: ranking window — top-3 parts per brand.
    QueryDef(
      "q12_top3_per_brand",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand")
          .orderBy($"p_retailprice".desc, $"p_partkey".asc)
        T(s, dir, "part")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter($"rk" <= 3)
          .select($"p_brand", $"rk", $"p_partkey", $"p_retailprice")
          .orderBy($"p_brand", $"rk")
      },
      Some("""
        SELECT p_brand, rk, p_partkey, p_retailprice FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
          FROM part) t
        WHERE rk <= 3 ORDER BY p_brand, rk"""),
      doc = "row_number ranking window"),

    // ------------------------------------------------------------------
    // q13: running total window (rows frame). Exact decimal running sum.
    QueryDef(
      "q13_running_total",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T(s, dir, "orders")
          .filter($"o_custkey" <= 20)
          .withColumn("running_spend",
            sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast("double"))
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"running_spend")
          .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders WHERE o_custkey <= 20
        ORDER BY o_custkey, o_orderdate, o_orderkey"""),
      doc = "running-sum window, rows frame"),

    // ------------------------------------------------------------------
    // q14: left join + two-level aggregation (TPC-H Q13 shape).
    QueryDef(
      "q14_order_count_distribution",
      (s, dir) => {
        import s.implicits._
        val ord = T(s, dir, "orders").select($"o_custkey", $"o_orderkey")
        T(s, dir, "customer")
          .join(ord, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""),
      doc = "left outer join + re-aggregation"),

    // ------------------------------------------------------------------
    // q15: set operations — INTERSECT ∪ EXCEPT.
    QueryDef(
      "q15_setops",
      (s, dir) => {
        import s.implicits._
        val ord = T(s, dir, "orders")
        val f = ord.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
        val o = ord.filter($"o_orderstatus" === "O").select($"o_custkey".as("custkey"))
        val p = ord.filter($"o_orderstatus" === "P").select($"o_custkey".as("custkey"))
        f.intersect(o).union(p.except(f)).distinct()
          .orderBy($"custkey")
      },
      Some("""
        SELECT custkey FROM (
          (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
          UNION
          (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')) t
        ORDER BY custkey"""),
      doc = "INTERSECT / EXCEPT / UNION"),

    // ------------------------------------------------------------------
    // q16: event-time bucketing (the DOCSIS dashboard time-bucket shape,
    // SURVEY.md §2.D) over the events stream table, batch mode.
    QueryDef(
      "q16_events_hourly",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
      doc = "time-bucketed aggregation (dashboard shape)"),

    // ------------------------------------------------------------------
    // q17: JSON access over events.props (SURVEY.md §2.D JSON fns).
    QueryDef(
      "q17_events_json",
      (s, dir) => {
        import s.implicits._
        T(s, dir, "events")
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), max($"k").as("max_k"), count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "JSON field extraction + agg"),

    // ------------------------------------------------------------------
    // q18: counter-rate with negative-delta guard — the DOCSIS
    // corrected_errors rate query shape (SURVEY.md §2.D; tables.sql:19
    // signed-counter semantics: negative deltas are overflow → NULL them).
    QueryDef(
      "q18_counter_rate",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        T(s, dir, "events")
          .withColumn("delta", $"value" - lag($"value", 1).over(w))
          .withColumn("delta", when($"delta" < 0.0, lit(null)).otherwise($"delta"))
          .groupBy($"user_id")
          .agg(dsum($"delta", 6).as("sum_increase"),
            count($"delta").as("n_increases"),
            count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id,
               CAST(SUM(CAST(delta AS DECIMAL(18,6))) AS DOUBLE) AS sum_increase,
               COUNT(delta) AS n_increases,
               COUNT(*) AS n_events
        FROM (
          SELECT user_id, CASE WHEN d < 0.0 THEN NULL ELSE d END AS delta FROM (
            SELECT user_id, value - LAG(value, 1) OVER
                   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS d
            FROM events) t1) t2
        GROUP BY user_id ORDER BY user_id"""),
      doc = "lag window + negative-delta guard (counter rates)"),

    // ------------------------------------------------------------------
    // q19: sessionization — 30-minute inactivity gap, pure window algebra
    // (no stateful shuffle beyond one partition-by-user exchange).
    QueryDef(
      "q19_sessionize",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        T(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_session",
            when($"prev_ts".isNull ||
              $"ts" > $"prev_ts" + expr("INTERVAL '30' MINUTE"), 1L).otherwise(0L))
          .groupBy($"user_id")
          .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, ts, LAG(ts, 1) OVER
                       (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
                FROM events) t1) t2
        GROUP BY user_id ORDER BY user_id"""),
      doc = "gap-based sessionization via windows"),

    // ------------------------------------------------------------------
    // q20: latest-snapshot-per-key (row_number desc = the "current modem
    // state" dashboard query, SURVEY.md §2.D).
    QueryDef(
      "q20_latest_event_per_user",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
        T(s, dir, "events")
          .withColumn("rk", row_number().over(w))
          .filter($"rk" === 1)
          .select($"user_id", $"event_id", $"event_type", $"value")
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, event_id, event_type, value FROM (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rk
          FROM events) t
        WHERE rk = 1 ORDER BY user_id"""),
      doc = "latest-per-key via ranking"),

    // ------------------------------------------------------------------
    // q21: as-of join — for every purchase, the most recent prior (or
    // simultaneous) signup of the same user. Implemented scalably as a
    // single union + one partition-by-user sort window (no range
    // cross-join); the oracle uses DuckDB's native ASOF JOIN.
    QueryDef(
      "q21_asof_signup",
      (s, dir) => AsOf.purchaseToSignup(T(s, dir, "events")),
      Some("""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.event_id"""),
      doc = "as-of join via union+last-ignore-nulls window"),

    // ------------------------------------------------------------------
    // q22: SQL entry point (spark.sql over registered views) + grouping
    // by computed month.
    QueryDef(
      "q22_monthly_order_volume",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT date_trunc('month', o_orderdate) AS month,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          FROM orders
          GROUP BY 1 ORDER BY month""")
      },
      Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1 ORDER BY month"""),
      doc = "spark.sql entry point; month bucketing")
  )
}
