package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.WeightedAvgAggregator
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Remaining SURVEY.md §2.D inventory rows: custom typed Aggregator,
  * moving-average window frames, GROUPING SETS, map functions over JSON
  * props, and approximate NDV (HLL — rows-only check, sketch values are
  * engine-specific by nature).
  */
object ExtendedQueries {

  /** q62's greedy non-overlapping view→click→purchase counter as a fold
    * over a sorted event-type array column: state = n·4 + stage packed
    * in one long. Shared by the QueryDef and the property test that
    * replays random sequences against a Scala reference machine.
    */
  def sequenceCountCol(typesCol: String): org.apache.spark.sql.Column =
    expr(s"""aggregate($typesCol, 0L,
         (acc, t) -> CASE
           WHEN t = 'view' AND acc % 4 = 0 THEN acc + 1
           WHEN t = 'click' AND acc % 4 = 1 THEN acc + 1
           WHEN t = 'purchase' AND acc % 4 = 2 THEN acc + 2
           ELSE acc END) div 4""")

  /** q86's gap-constrained sequence-match DP as a fold over a SORTED
    * array of struct(ts, event_id, event_type): state = the LATEST
    * timestamp (unix micros, −1 = unset) completing stages 1..k, each
    * adjacent gap ≤ `gapMicros`. Monotone-optimal: l_k only grows
    * during the scan, so extending from the current l_k dominates every
    * earlier choice. Shared by the QueryDef and the property test that
    * replays random sequences against a brute-force all-subsequences
    * reference (OperatorSpec).
    */
  def gapDpCol(evsCol: String, gapMicros: Long): org.apache.spark.sql.Column =
    expr(s"""aggregate($evsCol,
         named_struct('l1', -1L, 'l2', -1L, 'l3', -1L),
         (acc, e) -> named_struct(
           'l1', IF(e.event_type = 'view', unix_micros(e.ts), acc.l1),
           'l2', IF(e.event_type = 'click' AND acc.l1 >= 0
                    AND unix_micros(e.ts) - acc.l1 <= ${gapMicros}L,
                    unix_micros(e.ts), acc.l2),
           'l3', IF(e.event_type = 'purchase' AND acc.l2 >= 0
                    AND unix_micros(e.ts) - acc.l2 <= ${gapMicros}L,
                    unix_micros(e.ts), acc.l3)))""")

  /** q87's EMA recurrence e_n = 0.25·x_n + 0.75·e_{n−1} (e_1 = x_1) as a
    * fold over a SORTED array of struct(ts, event_id, value), surfaced
    * as floor(e·1e6). The multiply-add order is pinned — the property
    * test (OperatorSpec) replays the identical Scala fold and the
    * DuckDB oracle spells the identical recursive walk, so all three
    * run the same IEEE op sequence.
    */
  def emaMicrosCol(evsCol: String): org.apache.spark.sql.Column =
    expr(s"""CAST(floor(aggregate($evsCol,
         named_struct('started', false, 'e', CAST(0.0 AS DOUBLE)),
         (acc, p) -> named_struct(
           'started', true,
           'e', IF(acc.started, 0.25D * p.value + 0.75D * acc.e, p.value)),
         acc -> acc.e) * 1000000D) AS BIGINT)""")

  /** q88's Welch formulas as ONE dialect-neutral SQL string each,
    * spliced verbatim into the Spark projection AND the DuckDB oracle —
    * the strongest form of the cross-engine float-determinism argument:
    * not "the same algorithm", the same expression tree. Inputs are the
    * BIGINT columns (n_a, s1_a, s2_a, n_b, s1_b, s2_b); sample variance
    * uses the n−1 denominator; se² = var/n.
    */
  private[graft] def welchSe2(side: String): String =
    s"""((CAST(s2_$side AS DOUBLE)
         - CAST(s1_$side AS DOUBLE) * CAST(s1_$side AS DOUBLE)
           / CAST(n_$side AS DOUBLE))
        / CAST(n_$side - 1 AS DOUBLE) / CAST(n_$side AS DOUBLE))"""
  private[graft] val welchTx1e6: String =
    s"""CAST(floor((CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / sqrt(${welchSe2("a")} + ${welchSe2("b")})
                   * 1000000) AS BIGINT)"""
  private[graft] val welchDfx1e3: String =
    s"""CAST(floor((${welchSe2("a")} + ${welchSe2("b")})
                   * (${welchSe2("a")} + ${welchSe2("b")})
                   / (${welchSe2("a")} * ${welchSe2("a")}
                        / CAST(n_a - 1 AS DOUBLE)
                      + ${welchSe2("b")} * ${welchSe2("b")}
                        / CAST(n_b - 1 AS DOUBLE))
                   * 1000) AS BIGINT)"""

  /** q83's day-decomposed sweep-line core, shared with the property test
    * that replays random interval sets (including multi-day spans)
    * against a naive single-pass reference. Input: ±1 boundary points
    * with columns (event_type, event_id, t, d) — t in epoch micros, d =
    * +1 open / -1 close. Output: (event_type, n_intervals,
    * max_concurrent), exactly the naive global running-sum max.
    */
  def maxIntersectionsDecomposed(pts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val day = expr("t div 86400000000")
    val w1 = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t").asc, col("d").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = pts.withColumn("day", day)
      .withColumn("run", sum(col("d")).over(w1))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("run")).as("day_max"), sum(col("d")).as("day_sum"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("day_starts"))
    val w2 = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("carry", coalesce(sum(col("day_sum")).over(w2), lit(0L)))
      .groupBy(col("event_type"))
      .agg(sum(col("day_starts")).as("n_intervals"),
        max(col("carry") + col("day_max")).as("max_concurrent"))
      .orderBy(col("event_type"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q23: custom Aggregator (typed, decimal-exact weighted mean) exposed
    // through functions.udaf — quantity-weighted average price per flag.
    QueryDef(
      "q23_weighted_avg_price",
      (s, dir) => {
        import s.implicits._
        val wavg = udaf(WeightedAvgAggregator)
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "custom typed Aggregator via udaf (exact weighted mean)"),

    // ------------------------------------------------------------------
    // q24: moving average over daily revenue — 7-row frame; the daily
    // totals stay decimal until after the moving sum, so the frame math
    // is exact on both engines.
    QueryDef(
      "q24_moving_avg_revenue",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.load(s, dir, "orders")
          .groupBy(to_date($"o_orderdate").as("day"))
          .agg(sum($"o_totalprice".cast(DecimalType(18, 2))).as("daily"),
            count(lit(1)).as("n_orders"))
        val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
        // range frame keyed on day number: unlike the rows frame it spans
        // calendar days, so gaps in the series shrink the window
        val wr = Window.orderBy($"day_num").rangeBetween(-6, Window.currentRow)
        daily
          .withColumn("day_num", datediff($"day", lit("1995-01-01")))
          .withColumn("ma7",
            (sum($"daily").over(w).cast("double") / count(lit(1)).over(w)))
          .withColumn("ma7_range",
            (sum($"daily").over(wr).cast("double") / count(lit(1)).over(wr)))
          .select($"day".cast("timestamp").as("day"), $"n_orders",
            $"daily".cast("double").as("daily_revenue"), $"ma7", $"ma7_range")
          .orderBy($"day")
      },
      Some("""
        SELECT CAST(day AS TIMESTAMP) AS day, n_orders,
               CAST(daily AS DOUBLE) AS daily_revenue,
               CAST(SUM(daily) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7,
               CAST(SUM(daily) OVER wr AS DOUBLE) / COUNT(*) OVER wr AS ma7_range
        FROM (SELECT date_trunc('day', o_orderdate) AS day,
                     date_diff('day', DATE '1995-01-01', o_orderdate) AS day_num,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS daily,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY 1, 2) t
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
               wr AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day"""),
      doc = "moving-average: rows frame + gap-aware range frame"),

    // ------------------------------------------------------------------
    // q25: GROUPING SETS through the SQL entry point.
    QueryDef(
      "q25_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      doc = "GROUPING SETS"),

    // ------------------------------------------------------------------
    // q26: JSON props as a typed map — from_json to MapType + explode.
    QueryDef(
      "q26_props_map",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events")
          .select(explode(from_json($"props",
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
            .as(Seq("key", "val")))
          .groupBy($"key")
          .agg(count(lit(1)).as("n"), sum($"val").as("sum_val"),
            min($"val").as("min_val"), max($"val").as("max_val"))
          .orderBy($"key")
      },
      Some("""
        SELECT key, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS BIGINT) AS sum_val,
               MIN(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS min_val,
               MAX(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS max_val
        FROM (SELECT props, unnest(json_keys(props)) AS key FROM events) t
        GROUP BY key ORDER BY key"""),
      doc = "map functions: from_json MapType + explode"),

    // ------------------------------------------------------------------
    // q27: approximate NDV (HyperLogLog++). The raw sketch estimate is
    // engine-specific, so the CHECKED output is the exact NDV plus a
    // within-tolerance verdict on the estimate: the oracle asserts
    // `TRUE`, so the row only hashes green if Spark's HLL++ really is
    // within 5% of exact (rsd=0.02 ⇒ typical error ~2%). This upgrades
    // q27 from the old rows-only check to a full value check; the spec
    // additionally asserts the numeric bound.
    QueryDef(
      "q27_approx_ndv",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
            countDistinct($"l_orderkey").as("exact_orders"))
          .select($"l_returnflag", $"exact_orders",
            (abs($"approx_orders" - $"exact_orders").cast("double")
              <= $"exact_orders" * 0.05).as("approx_within_5pct"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS approx_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "approx_count_distinct (HLL++) vs exact, tolerance-checked oracle"),

    // ------------------------------------------------------------------
    // q28: salted shuffle join — the skew-mitigation pattern: fact rows
    // get a deterministic per-row salt, the dim side is replicated
    // SALT-fold, and the join key becomes (key, salt) so one hot key
    // spreads over SALT reducers. Result set is IDENTICAL to the plain
    // join, which is exactly what the oracle checks.
    QueryDef(
      "q28_salted_join",
      (s, dir) => {
        import s.implicits._
        val SALT = 8
        val li = Tables.load(s, dir, "lineitem")
          .withColumn("salt", pmod(xxhash64($"l_partkey", $"l_linenumber"), lit(SALT)))
        val ord = Tables.load(s, dir, "orders")
          .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
          .withColumn("salt", $"salt".cast("long"))
        li.join(ord, $"l_orderkey" === $"o_orderkey" && li("salt") === ord("salt"))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_items"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      doc = "salted join for skewed keys (same semantics as plain join)"),

    // ------------------------------------------------------------------
    // q29: range join — events matched into per-user activity windows
    // ([first_ts, first_ts + 24h]); equi on user + range on ts, which
    // Spark plans as an equi join with a post-filter (no cartesian).
    QueryDef(
      "q29_range_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val windows = ev.groupBy($"user_id".as("w_user"))
          .agg(min($"ts").as("w_start"))
          .withColumn("w_end", $"w_start" + expr("INTERVAL '24' HOUR"))
        ev.join(broadcast(windows),
            $"user_id" === $"w_user" && $"ts" >= $"w_start" && $"ts" <= $"w_end")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_in_window"),
            sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT e.user_id, COUNT(*) AS n_in_window,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events e
        JOIN (SELECT user_id AS w_user, MIN(ts) AS w_start,
                     MIN(ts) + INTERVAL 24 HOUR AS w_end
              FROM events GROUP BY user_id) w
          ON e.user_id = w.w_user AND e.ts >= w.w_start AND e.ts <= w.w_end
        GROUP BY e.user_id ORDER BY e.user_id"""),
      doc = "range join (equi + interval predicate) into activity windows"),

    // ------------------------------------------------------------------
    // q30: exact interpolated percentiles (both engines use the same
    // linear-interpolation definition).
    QueryDef(
      "q30_percentiles",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
            round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact interpolated percentiles"),

    // ------------------------------------------------------------------
    // q31: remaining window-function shapes — ntile buckets, first/nth
    // value over a frame. Surface-coverage query: ntile over the 3-value
    // o_orderstatus deliberately exercises the operator itself; the
    // at-scale form of a low-cardinality-partition ntile is c10's
    // banded-rank rewrite (rank within (key, band-of-sort-key) windows +
    // closed-form ntile from broadcast band offsets).
    QueryDef(
      "q31_window_shapes",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        Tables.load(s, dir, "orders")
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("top_price", first($"o_totalprice").over(w))
          .withColumn("second_key",
            nth_value($"o_orderkey", 2).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter($"o_orderkey" % 100 === 0)
          .select($"o_orderkey", $"o_orderstatus", $"quartile",
            $"top_price", $"second_key")
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, quartile, top_price, second_key
        FROM (
          SELECT o_orderkey, o_orderstatus,
                 NTILE(4) OVER w AS quartile,
                 FIRST_VALUE(o_totalprice) OVER w AS top_price,
                 NTH_VALUE(o_orderkey, 2) OVER
                   (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey ASC)) t
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey"""),
      doc = "ntile / first_value / nth_value window shapes"),

    // ------------------------------------------------------------------
    // q32: pivot — one column per event type (fixed value list so the
    // output schema is static and matches the oracle's CASE aggregation).
    QueryDef(
      "q32_pivot_event_types",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events")
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .count()
          // fill only the pivoted counts — never the grouping key
          .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY user_id ORDER BY user_id"""),
      doc = "pivot to per-category columns"),

    // ------------------------------------------------------------------
    // q33: time-series gap fill — every hour between min and max event
    // time gets a row, zero-filled where no events landed (the dashboard
    // continuity requirement). The hour spine is generated with
    // sequence+explode, never collected to the driver.
    QueryDef(
      "q33_gapfill_hours",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val hourly = ev.groupBy(date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("n"))
        val spine = ev
          .agg(min(date_trunc("hour", $"ts")).as("h0"),
            max(date_trunc("hour", $"ts")).as("h1"))
          .select(explode(expr(
            "sequence(h0, h1, INTERVAL '1' HOUR)")).as("hour"))
        spine.join(hourly, Seq("hour"), "left")
          .select($"hour", coalesce($"n", lit(0L)).as("n"))
          .orderBy($"hour")
      },
      Some("""
        WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                               date_trunc('hour', MAX(ts)) AS h1 FROM events),
        spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
                  FROM bounds),
        hourly AS (SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
                   FROM events GROUP BY 1)
        SELECT s.hour, COALESCE(h.n, 0) AS n
        FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
        ORDER BY s.hour"""),
      doc = "zero-filled hourly time series (sequence spine + left join)"),

    // ------------------------------------------------------------------
    // q34: sliding windows in batch form — Spark's window(ts, 30m, 10m)
    // assigns each event to 3 overlapping windows; the oracle enumerates
    // the same 3 starts per event (bucket10(ts) - k*10min, k=0..2).
    QueryDef(
      "q34_sliding_batch",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "events")
          .groupBy(window($"ts", "30 minutes", "10 minutes")
            .getField("start").as("w_start"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy($"w_start", $"event_type")
      },
      Some("""
        SELECT w_start, event_type, COUNT(*) AS n
        FROM (SELECT time_bucket(INTERVAL 10 MINUTE, ts)
                       - k.k * INTERVAL 10 MINUTE AS w_start, event_type
              FROM events
              CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k) t
        GROUP BY w_start, event_type
        ORDER BY w_start, event_type"""),
      doc = "sliding (overlapping) windows, batch-checkable form"),

    // ------------------------------------------------------------------
    // q41: PURE band join — no equi key at all: every event matched into
    // every 1-hour inspection window it falls in (windows start every 2
    // hours from the first event). Stock Spark plans this as an O(n·m)
    // BroadcastNestedLoopJoin; the injected RangeBucketJoin rule
    // (plans/RangeBucketJoin.scala) rewrites it to a bucketized hash
    // join. Same rows either way — which is what the oracle checks; the
    // plan shape is asserted in PlanSpec.
    QueryDef(
      "q41_band_join_windows",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val wins = ev.agg(date_trunc("hour", min($"ts")).as("t0"))
          .select(explode(sequence(lit(0), lit(359))).as("k"), $"t0")
          .select(expr("timestampadd(HOUR, 2 * k, t0)").as("w_start"))
          .withColumn("w_end", $"w_start" + expr("INTERVAL '1' HOUR"))
        ev.join(wins, $"ts" >= $"w_start" && $"ts" < $"w_end")
          .groupBy($"w_start")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .orderBy($"w_start")
      },
      Some("""
        WITH t0 AS (SELECT date_trunc('hour', MIN(ts)) AS t0 FROM events),
        wins AS (SELECT t0 + (2 * k.k) * INTERVAL 1 HOUR AS w_start,
                        t0 + (2 * k.k) * INTERVAL 1 HOUR + INTERVAL 1 HOUR AS w_end
                 FROM t0 CROSS JOIN (SELECT unnest(range(0, 360)) AS k) k)
        SELECT w_start, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN wins w ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w_start ORDER BY w_start"""),
      doc = "pure range join (no equi key) — rewritten to bucketed hash join by RangeBucketJoin"),

    // ------------------------------------------------------------------
    // q42: unpivot/melt — wide per-flag aggregates to long (metric, val)
    // form, the Dataset.unpivot API (the oracle uses the equivalent
    // UNION ALL, which is also exactly what Spark's Expand does here).
    QueryDef(
      "q42_unpivot_metrics",
      (s, dir) => {
        import s.implicits._
        val wide = Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double").as("sum_price"),
            count(lit(1)).cast("double").as("n_items"))
        wide.unpivot(
          ids = Array($"l_returnflag"),
          values = Array($"sum_qty", $"sum_price", $"n_items"),
          variableColumnName = "metric",
          valueColumnName = "val")
          .orderBy($"l_returnflag", $"metric")
      },
      Some("""
        WITH wide AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_items
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, val FROM (
          SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM wide
          UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
          UNION ALL SELECT l_returnflag, 'n_items', n_items FROM wide) t
        ORDER BY l_returnflag, metric"""),
      doc = "unpivot/melt wide aggregates to long form"),

    // ------------------------------------------------------------------
    // q43: rank-ratio window functions — percent_rank / cume_dist (both
    // count-ratio definitions, so doubles match exactly across engines)
    // and lead (lag's mirror, q18 covers lag).
    QueryDef(
      "q43_rank_ratios",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
        Tables.load(s, dir, "orders")
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .withColumn("next_price", lead($"o_totalprice", 1).over(w))
          .filter($"o_orderkey" % 97 === 0)
          .select($"o_orderkey", $"o_orderstatus", $"pr", $"cd", $"next_price")
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderstatus, pr, cd, next_price FROM (
          SELECT o_orderkey, o_orderstatus,
                 percent_rank() OVER w AS pr,
                 cume_dist() OVER w AS cd,
                 lead(o_totalprice, 1) OVER w AS next_price
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice ASC, o_orderkey ASC)) t
        WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey"""),
      doc = "percent_rank / cume_dist / lead window shapes"),

    // ------------------------------------------------------------------
    // q44: array set algebra over grouped collections — per nation, the
    // sorted set of market segments present, its intersection with a
    // fixed segment list, and the set size. Arrays are sorted on both
    // sides so the value hash is order-stable.
    QueryDef(
      "q44_array_set_ops",
      (s, dir) => {
        import s.implicits._
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(sort_array(collect_set($"c_mktsegment")).as("seg_arr"))
          // arrays serialize engine-specifically — emit sorted joined
          // strings so the differential hash sees plain varchars
          .select($"n_name",
            array_join($"seg_arr", ",").as("segments"),
            size($"seg_arr").cast("long").as("n_segments"),
            array_join(sort_array(array_intersect($"seg_arr",
              array(lit("BUILDING"), lit("MACHINERY"), lit("AUTOMOBILE")))), ",")
              .as("industrial"))
          .orderBy($"n_name")
      },
      Some("""
        WITH segs AS (
          SELECT n_name, list_sort(list_distinct(list(c_mktsegment))) AS seg_arr
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT n_name,
               array_to_string(seg_arr, ',') AS segments,
               len(seg_arr) AS n_segments,
               array_to_string(list_sort(list_intersect(seg_arr,
                 ['BUILDING', 'MACHINERY', 'AUTOMOBILE'])), ',') AS industrial
        FROM segs ORDER BY n_name"""),
      doc = "array set algebra: collect_set, sort, intersect, size"),

    // ------------------------------------------------------------------
    // q45: deterministic hash sampling — the reproducible-pipeline
    // alternative to TABLESAMPLE (whose RNG never matches across
    // engines): a row is in the ~1/8 sample iff the first hex digit of
    // md5(key) is '0' or '1'. The same predicate selects the same rows
    // on any engine, any partitioning, any run — which is what a 100 TB
    // pipeline needs for debuggable subsets.
    QueryDef(
      "q45_deterministic_sample",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .withColumn("hd", substring(
            md5(concat($"l_orderkey", lit(":"), $"l_linenumber")), 1, 1))
          .filter($"hd" <= "1")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_sampled"),
            sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double")
              .as("sum_price"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_sampled,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE substr(md5(l_orderkey || ':' || l_linenumber), 1, 1) <= '1'
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "deterministic md5-based sampling (reproducible across engines/runs)"),

    // ------------------------------------------------------------------
    // q46: FILTER-clause aggregation — several differently-filtered
    // aggregates in one pass over the fact table (one scan, one shuffle,
    // no self-joins), standard SQL in both engines.
    QueryDef(
      "q46_filtered_agg",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o_orderpriority,
                 COUNT(*) AS n_orders,
                 COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_orderdate >= DATE '1997-01-01') AS DOUBLE)
                   AS recent_revenue
          FROM orders
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderdate >= DATE '1997-01-01') AS DOUBLE)
                 AS recent_revenue
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      doc = "FILTER-clause aggregation (multiple conditional aggs, one scan)"),

    // ------------------------------------------------------------------
    // q48: last-observation-carried-forward (LOCF) — the telemetry
    // gap-fill: each event carries the most recent purchase value of its
    // user via last(..., ignoreNulls) over an unbounded-preceding frame.
    // Values pass through unmodified (no float arithmetic), so both
    // engines emit identical doubles.
    QueryDef(
      "q48_locf_carry_forward",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .withColumn("last_purchase_value",
            last(when($"event_type" === "purchase", $"value"),
              ignoreNulls = true).over(w))
          .filter($"event_id" % 37 === 0)
          .select($"event_id", $"user_id", $"event_type",
            $"last_purchase_value")
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, user_id, event_type, last_purchase_value FROM (
          SELECT event_id, user_id, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_value
          FROM events) t
        WHERE event_id % 37 = 0 ORDER BY event_id"""),
      doc = "LOCF gap-fill via last(ignoreNulls) over unbounded-preceding frame"),

    // ------------------------------------------------------------------
    // q49: statistical aggregates — stddev/variance/correlation/
    // covariance per flag. Engines accumulate in different orders, so
    // both sides round to 6 digits (differences live at ~1e-12 relative;
    // the same tactic as the cosine queries).
    QueryDef(
      "q49_stats_aggs",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_samp($"l_extendedprice"), 6).as("sd_price"),
            round(var_samp($"l_quantity"), 6).as("var_qty"),
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
            round(covar_samp($"l_quantity", $"l_extendedprice"), 6).as("covar_qty_price"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 6) AS sd_price,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "stddev / variance / correlation / covariance aggregates"),

    // ------------------------------------------------------------------
    // q51: date/time function battery — calendar extraction, interval
    // arithmetic, month deltas, and boundary snapping over order dates
    // (functions chosen for identical cross-engine definitions; e.g.
    // dayofweek is deliberately absent — the engines number weekdays
    // differently).
    QueryDef(
      "q51_datetime_functions",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "orders")
          .filter($"o_orderkey" % 199 === 0)
          .select($"o_orderkey",
            year($"o_orderdate").cast("long").as("y"),
            quarter($"o_orderdate").cast("long").as("q"),
            month($"o_orderdate").cast("long").as("m"),
            dayofmonth($"o_orderdate").cast("long").as("d"),
            // DATE results go out as TIMESTAMP — the driver gate's
            // date-column handling is unproven, timestamps are (q16/q24)
            last_day($"o_orderdate").cast("timestamp").as("month_end"),
            date_add($"o_orderdate", 30).cast("timestamp").as("plus30"),
            datediff(lit("1998-01-01").cast("date"), $"o_orderdate")
              .cast("long").as("days_to_98"),
            add_months($"o_orderdate", 3).cast("timestamp").as("plus_q"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS d,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                 AS days_to_98,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_q
        FROM orders WHERE o_orderkey % 199 = 0 ORDER BY o_orderkey"""),
      doc = "date/time battery: extract, last_day, interval add, datediff, add_months"),

    // ------------------------------------------------------------------
    // q52: FULL OUTER join — customer vs supplier account-balance
    // histograms joined on the (coarse) balance bucket; each side has
    // buckets the other lacks, so null-extended rows surface from BOTH
    // sides. Explicit NULLS FIRST keeps the total order engine-identical.
    QueryDef(
      "q52_full_outer_histogram",
      (s, dir) => {
        import s.implicits._
        val cb = Tables.load(s, dir, "customer")
          .groupBy(floor($"c_acctbal" / 2000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_customers"))
        val sb = Tables.load(s, dir, "supplier")
          .groupBy(floor($"s_acctbal" / 2000).cast("long").as("sbucket"))
          .agg(count(lit(1)).as("n_suppliers"))
        cb.join(sb, $"bucket" === $"sbucket", "full_outer")
          .select(coalesce($"bucket", $"sbucket").as("bal_bucket"),
            coalesce($"n_customers", lit(0L)).as("n_customers"),
            coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
          .orderBy($"bal_bucket".asc_nulls_first)
      },
      Some("""
        WITH cb AS (SELECT CAST(floor(c_acctbal / 2000) AS BIGINT) AS bucket,
                           COUNT(*) AS n_customers
                    FROM customer GROUP BY 1),
        sb AS (SELECT CAST(floor(s_acctbal / 2000) AS BIGINT) AS sbucket,
                      COUNT(*) AS n_suppliers
               FROM supplier GROUP BY 1)
        SELECT COALESCE(bucket, sbucket) AS bal_bucket,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM cb FULL OUTER JOIN sb ON bucket = sbucket
        ORDER BY bal_bucket ASC NULLS FIRST"""),
      doc = "FULL OUTER join with null-extended rows from both sides"),

    // ------------------------------------------------------------------
    // q53: approximate percentiles (GK-style sketch) vs exact. The raw
    // sketch values are engine-specific, so the CHECKED output is the
    // exact interpolated percentiles (q30 precedent: round(.,6) agrees
    // across engines) plus rank-tolerance verdicts: the sketch value must
    // lie between the exact percentiles at p ± 0.01 — 10× the sketch's
    // guaranteed rank error of 1/accuracy = 0.001. The oracle asserts
    // TRUE, so the row hashes green only if the sketch honors its bound.
    QueryDef(
      "q53_approx_percentiles",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
            expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("ap99"),
            expr("percentile(l_extendedprice, 0.5)").as("e50"),
            expr("percentile(l_extendedprice, 0.99)").as("e99"),
            expr("percentile(l_extendedprice, 0.49)").as("lo50"),
            expr("percentile(l_extendedprice, 0.51)").as("hi50"),
            expr("percentile(l_extendedprice, 0.98)").as("lo99"),
            max($"l_extendedprice").as("hi99"))
          .select($"l_returnflag",
            round($"e50", 6).as("exact50"), round($"e99", 6).as("exact99"),
            ($"ap50" >= $"lo50" && $"ap50" <= $"hi50").as("ap50_in_rank_tol"),
            ($"ap99" >= $"lo99" && $"ap99" <= $"hi99").as("ap99_in_rank_tol"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS exact50,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS exact99,
               TRUE AS ap50_in_rank_tol,
               TRUE AS ap99_in_rank_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "approx_percentile sketch vs exact, rank-tolerance-checked oracle"),

    // ------------------------------------------------------------------
    // q54: ordered event funnel (ClickHouse windowFunnel analog):
    // earliest-anchor greedy matching of view → click → purchase per
    // user, completion window 7 days from the anchor. Steps are stacked
    // conditional-min window passes over ONE user-partitioned exchange
    // (no self-joins — at 100 TB a 3-step self-join of events against
    // itself would shuffle the table three times; this shuffles once).
    QueryDef(
      "q54_event_funnel",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id")
        val lvl = Tables.events(s, dir)
          .withColumn("t1",
            min(when($"event_type" === "view", $"ts")).over(w))
          .withColumn("t2",
            min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
          .withColumn("t3",
            min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
          .groupBy($"user_id")
          .agg(first($"t1").as("t1"), first($"t2").as("t2"), first($"t3").as("t3"))
        lvl.select($"user_id",
          when($"t3".isNotNull && $"t3" <= $"t1" + expr("INTERVAL 7 DAYS"), 3)
            .when($"t2".isNotNull && $"t2" <= $"t1" + expr("INTERVAL 7 DAYS"), 2)
            .when($"t1".isNotNull, 1)
            .otherwise(0).as("funnel_level"),
          $"t1", $"t2", $"t3")
          .orderBy($"user_id")
      },
      Some("""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        s1 AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t2
               FROM events e JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t1
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t3
               FROM events e JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               GROUP BY e.user_id)
        SELECT u.user_id,
               CASE WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 7 DAY THEN 3
                    WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 7 DAY THEN 2
                    WHEN t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_level,
               t1, t2, t3
        FROM u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
        ORDER BY u.user_id"""),
      doc = "ordered event funnel via stacked conditional-min windows"),

    // ------------------------------------------------------------------
    // q55: higher-moment statistics + mode — skewness and excess
    // kurtosis from EXACT decimal raw-moment sums (l_quantity powers
    // stay decimal end-to-end: (9,2)→(19,4)→(15,4) recast →(31,8), so
    // DuckDB's strict precision rules hold and both engines feed
    // bit-identical doubles into the same closed-form expressions);
    // mode via count + deterministic (freq DESC, value ASC) ranking
    // rather than engine-specific mode() tie-breaking.
    // Scale: one partial-aggregated pass for the moments; the mode adds
    // one narrow (flag, qty) pre-aggregation — both map-side combined.
    QueryDef(
      "q55_moment_stats",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
          .select($"l_returnflag",
            $"l_quantity".cast("decimal(9,2)").as("q"))
          .withColumn("q2", ($"q" * $"q").cast("decimal(15,4)"))
          .withColumn("q3", ($"q2" * $"q").cast("decimal(25,6)"))
          .withColumn("q4", ($"q2" * $"q2").cast("decimal(31,8)"))
        val moments = li.groupBy($"l_returnflag").agg(
          count(lit(1)).as("n"),
          sum($"q").as("s1"), sum($"q2").as("s2"),
          sum($"q3").as("s3"), sum($"q4").as("s4"))
          .select($"l_returnflag", $"n",
            ($"s1".cast("double") / $"n").as("mean"),
            ($"s2".cast("double") / $"n").as("r2"),
            ($"s3".cast("double") / $"n").as("r3"),
            ($"s4".cast("double") / $"n").as("r4"))
          .select($"l_returnflag", $"n", $"mean", $"r2", $"r3", $"r4",
            ($"r2" - $"mean" * $"mean").as("m2"))
          .select($"l_returnflag", $"n",
            round($"mean", 6).as("mean_qty"),
            round(($"r3" - lit(3.0) * $"mean" * $"r2" +
              lit(2.0) * $"mean" * $"mean" * $"mean") / pow($"m2", 1.5), 6)
              .as("skewness"),
            round(($"r4" - lit(4.0) * $"mean" * $"r3" +
              lit(6.0) * $"mean" * $"mean" * $"r2" -
              lit(3.0) * $"mean" * $"mean" * $"mean" * $"mean") /
              ($"m2" * $"m2") - lit(3.0), 6).as("kurtosis"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l_returnflag").orderBy($"cnt".desc, $"qv".asc)
        val mode = Tables.load(s, dir, "lineitem")
          .select($"l_returnflag",
            $"l_quantity".cast("decimal(9,2)").cast("double").as("qv"))
          .groupBy($"l_returnflag", $"qv").agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
          .select($"l_returnflag", $"qv".as("mode_qty"), $"cnt".as("mode_n"))
        moments.join(mode, "l_returnflag")
          .select($"l_returnflag", $"n", $"mean_qty", $"skewness",
            $"kurtosis", $"mode_qty", $"mode_n")
          .orderBy($"l_returnflag")
      },
      Some("""
        WITH q AS (
          SELECT l_returnflag, CAST(l_quantity AS DECIMAL(9,2)) AS q
          FROM lineitem),
        p AS (
          SELECT l_returnflag, q,
                 CAST(q * q AS DECIMAL(15,4)) AS q2
          FROM q),
        p2 AS (
          SELECT l_returnflag, q, q2,
                 CAST(q2 * q AS DECIMAL(25,6)) AS q3,
                 CAST(q2 * q2 AS DECIMAL(31,8)) AS q4
          FROM p),
        s AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean,
                 CAST(SUM(q2) AS DOUBLE) / COUNT(*) AS r2,
                 CAST(SUM(q3) AS DOUBLE) / COUNT(*) AS r3,
                 CAST(SUM(q4) AS DOUBLE) / COUNT(*) AS r4
          FROM p2 GROUP BY l_returnflag),
        m AS (SELECT *, r2 - mean * mean AS m2 FROM s),
        stats AS (
          SELECT l_returnflag, n,
                 round(mean, 6) AS mean_qty,
                 round((r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean)
                       / power(m2, 1.5), 6) AS skewness,
                 round((r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                        - 3.0 * mean * mean * mean * mean)
                       / (m2 * m2) - 3.0, 6) AS kurtosis
          FROM m),
        freq AS (
          SELECT l_returnflag,
                 CAST(CAST(l_quantity AS DECIMAL(9,2)) AS DOUBLE) AS qv,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        md AS (
          SELECT l_returnflag, qv AS mode_qty, cnt AS mode_n,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                    ORDER BY cnt DESC, qv ASC) AS rk
          FROM freq)
        SELECT st.l_returnflag, st.n, st.mean_qty, st.skewness, st.kurtosis,
               md.mode_qty, md.mode_n
        FROM stats st JOIN md ON st.l_returnflag = md.l_returnflag
        WHERE md.rk = 1 ORDER BY st.l_returnflag"""),
      doc = "exact-moment skewness/kurtosis + deterministic mode"),

    // ------------------------------------------------------------------
    // q56: argMax/argMin aggregates (ClickHouse argMax/argMin, Spark
    // max_by/min_by) — latest/first order per customer. The ordering
    // value is made UNIQUE (epoch-day * 1e10 + orderkey) so the argmax is
    // deterministic in both engines despite date ties. The 1e10
    // multiplier keeps (day, orderkey) collision-free while
    // o_orderkey < 1e10 — TPC-H orderkeys reach 6M×SF, so unique through
    // SF ≈ 1600 (a 1e7 multiplier collided from SF 2; DuckDB's max_by
    // can't take a struct ordering value, so a packed long it is).
    QueryDef(
      "q56_argmax_orders",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "orders")
          .filter($"o_custkey" <= 200)
          .withColumn("ordval",
            datediff($"o_orderdate", lit("1970-01-01")).cast("long") * 10000000000L
              + $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(
            max_by($"o_orderkey", $"ordval").as("latest_orderkey"),
            min_by($"o_orderkey", $"ordval").as("first_orderkey"),
            max($"o_orderdate").as("latest_date"),
            count(lit(1)).as("n_orders"))
          .orderBy($"o_custkey")
      },
      Some("""
        SELECT o_custkey,
               max_by(o_orderkey, ordval) AS latest_orderkey,
               min_by(o_orderkey, ordval) AS first_orderkey,
               MAX(o_orderdate) AS latest_date,
               COUNT(*) AS n_orders
        FROM (SELECT *, CAST(datediff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE)) AS BIGINT)
                          * 10000000000 + o_orderkey AS ordval
              FROM orders WHERE o_custkey <= 200) t
        GROUP BY o_custkey ORDER BY o_custkey"""),
      doc = "argMax/argMin aggregates with a deterministic unique ordering value"),

    // ------------------------------------------------------------------
    // q57: cohort retention (ClickHouse retention() analog) — users
    // cohorted by first-signup day; per cohort, how many were seen again
    // in (signup, +1d], (+1d, +7d], (+7d, +14d]. One join of events to
    // the (small) per-user signup table, conditional flags max'd per
    // user, then counted per cohort day — the standard product-analytics
    // rollup, all partial-aggregated.
    QueryDef(
      "q57_retention",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
        val signups = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("s_ts"))
        val flags = ev.join(signups, "user_id")
          .groupBy($"user_id", $"s_ts")
          .agg(
            max(when($"ts" > $"s_ts" &&
              $"ts" <= $"s_ts" + expr("INTERVAL 1 DAY"), 1).otherwise(0)).as("d1"),
            max(when($"ts" > $"s_ts" + expr("INTERVAL 1 DAY") &&
              $"ts" <= $"s_ts" + expr("INTERVAL 7 DAY"), 1).otherwise(0)).as("d7"),
            max(when($"ts" > $"s_ts" + expr("INTERVAL 7 DAY") &&
              $"ts" <= $"s_ts" + expr("INTERVAL 14 DAY"), 1).otherwise(0)).as("d14"))
        flags.groupBy(to_date($"s_ts").as("cohort_day"))
          .agg(count(lit(1)).as("n_users"),
            sum($"d1").as("retained_1d"),
            sum($"d7").as("retained_7d"),
            sum($"d14").as("retained_14d"))
          .orderBy($"cohort_day")
      },
      Some("""
        WITH signups AS (
          SELECT user_id, MIN(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        flags AS (
          SELECT e.user_id, s.s_ts,
                 MAX(CASE WHEN e.ts > s.s_ts
                           AND e.ts <= s.s_ts + INTERVAL 1 DAY
                          THEN 1 ELSE 0 END) AS d1,
                 MAX(CASE WHEN e.ts > s.s_ts + INTERVAL 1 DAY
                           AND e.ts <= s.s_ts + INTERVAL 7 DAY
                          THEN 1 ELSE 0 END) AS d7,
                 MAX(CASE WHEN e.ts > s.s_ts + INTERVAL 7 DAY
                           AND e.ts <= s.s_ts + INTERVAL 14 DAY
                          THEN 1 ELSE 0 END) AS d14
          FROM events e JOIN signups s ON e.user_id = s.user_id
          GROUP BY e.user_id, s.s_ts)
        SELECT CAST(s_ts AS DATE) AS cohort_day,
               COUNT(*) AS n_users,
               CAST(SUM(d1) AS BIGINT) AS retained_1d,
               CAST(SUM(d7) AS BIGINT) AS retained_7d,
               CAST(SUM(d14) AS BIGINT) AS retained_14d
        FROM flags GROUP BY 1 ORDER BY cohort_day"""),
      doc = "cohort retention rollup (ClickHouse retention analog)"),

    // ------------------------------------------------------------------
    // q58: batch shadow of the STREAMING session_window operator
    // (EventsStream.sessions uses the identical groupBy(session_window)
    // primitive) — this puts a DuckDB CORRECTNESS row behind the
    // streaming semantics, which are otherwise spec-only. Spark's
    // session window is [first_ts, last_ts + gap); the oracle rebuilds
    // the same islands with the standard lag/cumsum gap SQL (q19's
    // pattern, but emitting the window bounds). One shuffle on user_id;
    // session assembly is per-key local — the same cost shape streaming
    // state keeps incrementally.
    QueryDef(
      "q58_session_windows",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .select($"user_id",
            $"session_window.start".as("session_start"),
            $"session_window.end".as("session_end"),
            $"n_events", $"sum_value")
          .orderBy($"user_id", $"session_start")
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events),
        sess AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start"""),
      doc = "batch shadow of streaming session_window (gap-island oracle)"),

    // ------------------------------------------------------------------
    // q59: batch shadow of the streaming TUMBLING window aggregation
    // (EventsStream.windowedCounts: window(ts, "15 minutes")). Spark
    // aligns windows to the epoch under UTC, so the oracle floors
    // microseconds to the 15-minute grid. Partial aggregation applies —
    // one shuffle on (window, event_type) regardless of input size.
    QueryDef(
      "q59_tumbling_windows",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "15 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .select($"window.start".as("w_start"), $"window.end".as("w_end"),
            $"event_type", $"n", $"sum_value")
          .orderBy($"w_start", $"event_type")
      },
      Some("""
        SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS w_start,
               make_timestamp((epoch_us(ts) // 900000000) * 900000000
                              + 900000000) AS w_end,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2, 3 ORDER BY w_start, event_type"""),
      doc = "batch shadow of streaming tumbling windows (epoch-grid oracle)"),

    // ------------------------------------------------------------------
    // q60: batch shadow of the streaming SLIDING window aggregation
    // (EventsStream.slidingCounts: 30-minute span, 10-minute slide — each
    // event belongs to exactly 3 windows whose starts are the 3 nearest
    // 10-minute grid points at or before it). The oracle replicates each
    // event across its 3 windows with an unnested offset list.
    QueryDef(
      "q60_sliding_windows",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "30 minutes", "10 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("w_start"), $"window.end".as("w_end"),
            $"event_type", $"n")
          .orderBy($"w_start", $"event_type")
      },
      Some("""
        WITH w AS (
          SELECT make_timestamp((epoch_us(ts) // 600000000 - k) * 600000000)
                   AS w_start,
                 event_type
          FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) off)
        SELECT w_start, w_start + INTERVAL 30 MINUTE AS w_end,
               event_type, COUNT(*) AS n
        FROM w GROUP BY 1, 2, 3 ORDER BY w_start, event_type"""),
      doc = "batch shadow of streaming sliding windows (offset-replication oracle)"),

    // ------------------------------------------------------------------
    // q61: approximate heavy hitters (ClickHouse topK analog) via Spark
    // 4.1's approx_top_k (DataSketches frequent-items). Like q27/q53, the
    // raw sketch output is engine-specific, so the CHECKED output is the
    // exact top-10 tokens (count desc, token asc — a total order) plus two
    // verdicts the oracle asserts TRUE: the token appears in the sketch's
    // top-25, and the sketch estimate is within 1% of the exact count.
    // Both aggregations partial-combine map-side; the 1-row sketch is
    // broadcast against the exact top-10, so the only wide exchange is the
    // token groupBy. maxItemsTracked=65536 means any corpus whose
    // vocabulary fits the map is in the sketch's exact regime — the
    // verdicts stay deterministic, and beyond it the 1% bound is still the
    // published frequent-items guarantee for heavy hitters.
    QueryDef(
      "q61_approx_topk",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.load(s, dir, "documents")
          .select(explode(graft.functions.TextFunctions.tokens($"text"))
            .as("token"))
        val sketch = broadcast(toks.agg(
          expr("approx_top_k(token, 25, 65536)").as("sk"),
          count(lit(1)).as("n_total")))
        toks.groupBy($"token").agg(count(lit(1)).as("exact_cnt"))
          .orderBy($"exact_cnt".desc, $"token".asc)
          .limit(10)
          .crossJoin(sketch)
          .withColumn("est",
            // get() (0-based) is NULL out-of-bounds even under ANSI,
            // unlike element_at which throws on an empty filter result
            expr("get(filter(sk, e -> e.item = token), 0).count"))
          .select($"token", $"exact_cnt",
            $"est".isNotNull.as("in_sketch"),
            (abs(coalesce($"est", lit(0L)) - $"exact_cnt")
              <= greatest(lit(1L), ($"n_total" / 100).cast("long")))
              .as("within_tol"))
          .orderBy($"exact_cnt".desc, $"token".asc)
      },
      Some("""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
          FROM documents)
        SELECT token, COUNT(*) AS exact_cnt,
               TRUE AS in_sketch, TRUE AS within_tol
        FROM tok GROUP BY token
        ORDER BY exact_cnt DESC, token ASC LIMIT 10"""),
      doc = "approximate heavy hitters (topK): sketch vs exact with tolerance verdicts"),

    // ------------------------------------------------------------------
    // q62: SEQUENCE COUNT (ClickHouse sequenceCount('(?1)(?2)(?3)')
    // analog): per user, count GREEDY NON-OVERLAPPING occurrences of
    // the ordered pattern view → click → purchase (other events may
    // interleave; each completed match consumes its three events).
    // Distinct from q54's funnel, which only finds the FIRST chain.
    //
    // Non-overlapping counting is inherently a left-to-right fold, so
    // the engine shape is: one groupBy(user) collecting the time-sorted
    // event-type array, then a single map-side `aggregate()` lambda
    // running the 3-state machine, state packed into one long
    // (n·4 + stage) so the fold stays a primitive accumulator. State
    // per user is bounded by that user's event count — the same bound
    // any sessionization carries; skewed users split via AQE. The
    // oracle replays the identical machine with a recursive CTE
    // (depth = max events/user), which is DuckDB's native fold.
    QueryDef(
      "q62_sequence_count",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(sort_array(collect_list(
            struct($"ts", $"event_id", $"event_type"))).as("evs"))
          .withColumn("types", expr("transform(evs, e -> e.event_type)"))
          .select($"user_id", sequenceCountCol("types").as("n_matches"))
          .orderBy($"user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        hi AS (SELECT user_id, MAX(i) AS m FROM ev GROUP BY user_id),
        walk(user_id, i, stage, cnt) AS (
          SELECT user_id, 0, 0, 0 FROM hi
          UNION ALL
          SELECT w.user_id, w.i + 1,
                 CASE WHEN e.event_type = 'view' AND w.stage = 0 THEN 1
                      WHEN e.event_type = 'click' AND w.stage = 1 THEN 2
                      WHEN e.event_type = 'purchase' AND w.stage = 2 THEN 0
                      ELSE w.stage END,
                 w.cnt + CASE WHEN e.event_type = 'purchase' AND w.stage = 2
                              THEN 1 ELSE 0 END
          FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1)
        SELECT w.user_id, CAST(w.cnt AS BIGINT) AS n_matches
        FROM walk w JOIN hi ON w.user_id = hi.user_id AND w.i = hi.m
        ORDER BY w.user_id"""),
      doc = "sequenceCount analog: greedy non-overlapping ordered pattern matches per user"),

    // ------------------------------------------------------------------
    // q63: TIME-INTERVAL RANGE window frame — every event annotated with
    // its user's trailing-1-hour activity (event count + purchase
    // count). The frame is VALUE-based (all rows within 1h of the
    // current row's timestamp), not row-count-based like q24/q31 — the
    // missing frame shape in the window battery. Spark's rangeBetween
    // needs a numeric ordering column, so the frame runs on
    // unix_micros(ts) with microsecond-exact bounds — identical
    // membership to the oracle's INTERVAL arithmetic because the data
    // is µs-resolution (verified: no sub-µs components) and both ends
    // are inclusive in both engines. One shuffle on user_id; the frame
    // scan is the standard sliding two-pointer inside each partition.
    QueryDef(
      "q63_interval_range_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"tsm")
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.events(s, dir)
          .withColumn("tsm", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"ts",
            count(lit(1)).over(w).as("n_1h"),
            count(when($"event_type" === "purchase", 1)).over(w).as("n_purch_1h"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_1h,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w
                 AS n_purch_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id"""),
      doc = "interval RANGE window frame: trailing-1h per-user activity"),

    // ------------------------------------------------------------------
    // q64: ARRAY ANALYTICS battery (the ClickHouse arrayCumSum /
    // arrayDifference / arrayCompact / arrayEnumerate family): per-order
    // line quantities as a position-ordered array, transformed entirely
    // with higher-order functions — no explode, no shuffle beyond the
    // one groupBy that builds the array. This is the array-first query
    // style ClickHouse users write daily; Spark expresses every member
    // with transform/filter/aggregate lambdas (all codegen-friendly).
    // Quantities are integer-valued, kept as longs → exact in both
    // engines. Lambda index bases differ (Spark 0-based, DuckDB
    // 1-based) — each side is spelled in its own convention. The array
    // order is (l_linenumber, qty) — linenumber ALONE is not a total
    // order in this synthetic data (duplicates exist), and a non-total
    // ORDER BY inside list() is nondeterministic.
    QueryDef(
      "q64_array_battery",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "lineitem")
          .filter($"l_orderkey" % 100 === 0)
          .groupBy($"l_orderkey".as("o_orderkey"))
          .agg(expr(
            "transform(sort_array(collect_list(struct(l_linenumber, CAST(l_quantity AS BIGINT)))), p -> p.col2)")
            .as("qty"))
          .select($"o_orderkey", $"qty",
            expr("""transform(sequence(1, size(qty)),
                      i -> aggregate(slice(qty, 1, i), 0L, (a, x) -> a + x))""")
              .as("cum"),
            expr("""transform(sequence(1, size(qty)),
                      i -> IF(i = 1, 0L, element_at(qty, i) - element_at(qty, i - 1)))""")
              .as("diff"),
            expr("filter(qty, (x, i) -> i = 0 OR x != element_at(qty, i))")
              .as("compacted"),
            expr("transform(sequence(1, size(qty)), i -> CAST(i AS BIGINT))")
              .as("enumerated"),
            expr("aggregate(qty, 0L, (a, x) -> a + x)").as("total"))
          // The driver's comparator sorts every column in pandas; raw
          // array columns are unhashable there. Serialize each array to
          // its canonical CSV string (bit-identical to DuckDB's
          // array_to_string) so the battery gets a real hash check
          // instead of a harness crash.
          .select($"o_orderkey",
            expr("concat_ws(',', cast(qty as array<string>))").as("qty"),
            expr("concat_ws(',', cast(cum as array<string>))").as("cum"),
            expr("concat_ws(',', cast(diff as array<string>))").as("diff"),
            expr("concat_ws(',', cast(compacted as array<string>))")
              .as("compacted"),
            expr("concat_ws(',', cast(enumerated as array<string>))")
              .as("enumerated"),
            $"total")
          .orderBy($"o_orderkey")
      },
      Some("""
        WITH arr AS (
          SELECT l_orderkey AS o_orderkey,
                 list(CAST(l_quantity AS BIGINT)
                      ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS qty
          FROM lineitem WHERE l_orderkey % 100 = 0
          GROUP BY l_orderkey),
        battery AS (
        SELECT o_orderkey, qty,
               list_transform(range(1, len(qty) + 1),
                 i -> list_sum(qty[1:i])) AS cum,
               list_transform(range(1, len(qty) + 1),
                 i -> CASE WHEN i = 1 THEN 0 ELSE qty[i] - qty[i-1] END) AS diff,
               list_filter(qty, (x, i) -> i = 1 OR x <> qty[i-1]) AS compacted,
               range(1, len(qty) + 1) AS enumerated,
               CAST(list_sum(qty) AS BIGINT) AS total
        FROM arr)
        SELECT o_orderkey,
               array_to_string(qty, ',') AS qty,
               array_to_string(cum, ',') AS cum,
               array_to_string(diff, ',') AS diff,
               array_to_string(compacted, ',') AS compacted,
               array_to_string(enumerated, ',') AS enumerated,
               total
        FROM battery ORDER BY o_orderkey"""),
      doc = "array analytics battery: cumsum/difference/compact/enumerate via lambdas"),

    // ------------------------------------------------------------------
    // q65: RECURSIVE CTE (Spark 4's UnionLoop): transitive closure over
    // a synthetic binary referral tree (parent = custkey div 2, root 1),
    // aggregated per depth. This is the ITERATION-IN-SQL capability —
    // the same fixpoint clusterLabels drives from Scala, but planned
    // and executed entirely by the engine; each recursion step is one
    // self-join against the previous frontier, so the work per level is
    // a keyed shuffle join and the level count is the tree depth
    // (log₂ n here, ~14 at sf0.01). Integer division is `div` in Spark
    // SQL and `//` in DuckDB — each side in its own dialect.
    QueryDef(
      "q65_recursive_cte",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .createOrReplaceTempView("customer_q65")
        s.sql("""
          WITH RECURSIVE tree(custkey, depth) AS (
            SELECT CAST(1 AS BIGINT), 0
            UNION ALL
            SELECT c.c_custkey, t.depth + 1
            FROM customer_q65 c JOIN tree t ON c.c_custkey div 2 = t.custkey
            WHERE c.c_custkey > 1
          )
          SELECT depth, COUNT(*) AS n_nodes,
                 MIN(custkey) AS min_key, MAX(custkey) AS max_key
          FROM tree GROUP BY depth ORDER BY depth""")
      },
      Some("""
        WITH RECURSIVE tree(custkey, depth) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION ALL
          SELECT c.c_custkey, t.depth + 1
          FROM customer c JOIN tree t ON c.c_custkey // 2 = t.custkey
          WHERE c.c_custkey > 1
        )
        SELECT depth, COUNT(*) AS n_nodes,
               MIN(custkey) AS min_key, MAX(custkey) AS max_key
        FROM tree GROUP BY depth ORDER BY depth"""),
      doc = "recursive CTE (UnionLoop): engine-planned transitive closure per depth"),

    // ------------------------------------------------------------------
    // q66: FORMAT-AGNOSTIC storage roundtrip — the engine's sink/source
    // surface beyond parquet: one summary is written to ORC and to CSV,
    // read back through each format's own reader, and the two read-backs
    // are inner-joined on EVERY column — a row survives only if both
    // formats preserved it bit-for-bit (timestamps via the session-UTC
    // writers, doubles via Java's round-trippable shortest
    // representation, which Spark's CSV writer/parser use). The oracle
    // recomputes the summary from the original parquet in DuckDB, so a
    // silent corruption in EITHER format drops rows and fails the gate.
    // At scale both writers are executor-parallel (one file per
    // partition) like every other sink here.
    QueryDef(
      "q66_format_roundtrip",
      (s, dir) => {
        import s.implicits._
        val summary = Tables.load(s, dir, "orders")
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            sum($"o_totalprice".cast(DecimalType(18, 2)))
              .cast("double").as("sum_total"))
        val base = graft.TempDirs.scratch("q66_fmt")
        summary.write.mode("overwrite").orc(s"$base/orc")
        summary.write.mode("overwrite").option("header", true)
          .csv(s"$base/csv")
        val orc = s.read.orc(s"$base/orc")
        val csv = s.read.schema(orc.schema).option("header", true)
          .csv(s"$base/csv")
        orc.join(csv, Seq("month", "n_orders", "sum_total"), "inner")
          .orderBy($"month")
      },
      Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        FROM orders GROUP BY 1 ORDER BY month"""),
      doc = "format-agnostic roundtrip: ORC + CSV sinks/sources, join-verified fidelity"),

    // ------------------------------------------------------------------
    // q67: ONLINE ANOMALY detection, batch shadow — the oracle-checkable
    // twin of streaming/AnomalyDetector.detect (the transformWithState /
    // Spark-4 arbitrary-state API; StreamingSpec proves the streaming
    // path emits these exact rows). Per user, an event is anomalous when
    // it deviates > 4 running σ from the running mean with ≥ 10 prior
    // events. All moments are EXACT integer sums of the 2-dp-quantized
    // value (cents, cents²), and the 4σ test is an integer inequality —
    // (n·x − S₁)² > 16·(n·S₂ − S₁²) — so streaming state, this window
    // shadow, and DuckDB agree bit-for-bit; a double-typed z-score
    // would drift across the three. Scale: one keyed shuffle for the
    // prefix window (user_id partitions — wide, shallow); the streaming
    // form is O(users) RocksDB rows of three longs.
    QueryDef(
      "q67_anomaly_shadow",
      (s, dir) => {
        import s.implicits._
        graft.streaming.AnomalyDetector.batch(Tables.events(s, dir))
          .select($"user_id", $"event_id", $"ts", $"cents", $"n_prior")
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        WITH pre AS (
          SELECT user_id, event_id, ts,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        w AS (
          SELECT user_id, event_id, ts, cents,
                 COUNT(*) OVER win AS n,
                 CAST(COALESCE(SUM(cents) OVER win, 0) AS BIGINT) AS s1,
                 CAST(COALESCE(SUM(cents * cents) OVER win, 0) AS BIGINT) AS s2
          FROM pre
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT user_id, event_id, ts, cents, n AS n_prior
        FROM w
        WHERE n >= 10
          AND (n * s2 - s1 * s1) > 0
          AND (n * cents - s1) * (n * cents - s1) > 16 * (n * s2 - s1 * s1)
        ORDER BY user_id, event_id"""),
      doc = "online 4-sigma anomaly flags (transformWithState batch shadow): exact integer moments"),

    // ------------------------------------------------------------------
    // q68: unpivot (melt) — the inverse surface of q32: the per-type
    // pivoted count columns fold back into (user_id, event_type, n)
    // rows via the engine's native Unpivot node (wide→long reshape, a
    // Grafana/feature-store staple). Zero-filled cells survive the
    // round trip, so the output is the dense user×type grid, not the
    // sparse groupBy — that distinction is what the operator is FOR.
    // Scale: one hash shuffle for the pivot agg; the unpivot itself is
    // a map-only row expansion (×5) with no exchange.
    QueryDef(
      "q68_unpivot",
      (s, dir) => {
        import s.implicits._
        val types = Seq("click", "view", "purchase", "signup", "error")
        Tables.load(s, dir, "events")
          .groupBy($"user_id")
          .pivot("event_type", types)
          .count()
          .na.fill(0L, types)
          .unpivot(Array($"user_id"), types.map(col).toArray,
            "event_type", "n")
          .orderBy($"user_id", $"event_type")
      },
      Some("""
        WITH pivoted AS (
          SELECT user_id,
                 COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                 COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                 COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                 COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
          FROM events GROUP BY user_id)
        SELECT user_id, event_type, n
        FROM (
          SELECT user_id, 'click' AS event_type, click AS n FROM pivoted
          UNION ALL
          SELECT user_id, 'view', view FROM pivoted
          UNION ALL
          SELECT user_id, 'purchase', purchase FROM pivoted
          UNION ALL
          SELECT user_id, 'signup', signup FROM pivoted
          UNION ALL
          SELECT user_id, 'error', error FROM pivoted)
        ORDER BY user_id, event_type"""),
      doc = "unpivot/melt: wide per-type count columns back to long rows, zero cells preserved"),

    // ------------------------------------------------------------------
    // q69: EXACT WEIGHTED QUANTILES (ClickHouse quantileExactWeighted):
    // the quantile of l_extendedprice where each row counts l_quantity
    // times — the price point below which 50/90/99% of shipped UNITS
    // (not line rows) fall. The standard exact recipe: collapse to
    // distinct (group, value) with summed integer weights (partial-agg
    // shuffle), ONE value-ordered window pass for cumulative weight,
    // then min(value | 100·cum ≥ pct·total) per group. All rank math is
    // integer (weights are integer-valued quantities; ×100 cross-
    // multiply instead of a double threshold), and the value itself is
    // never summed — the selected double is bit-identical to DuckDB's.
    // Scale: window input is DISTINCT values per group, not rows — at
    // 100 TB the pre-agg collapses ~1e12 rows to ~1e6 distinct prices
    // per flag; beyond that, dx24's fixed-bin mergeable histogram is
    // the bounded-state fallback.
    QueryDef(
      "q69_weighted_quantiles",
      (s, dir) => {
        import s.implicits._
        val vw = Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_extendedprice")
          .agg(sum($"l_quantity".cast("long")).as("w"))
        val cumW = Window.partitionBy($"l_returnflag")
          .orderBy($"l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totW = Window.partitionBy($"l_returnflag")
        val cum = vw
          .withColumn("c", sum($"w").over(cumW))
          .withColumn("t", sum($"w").over(totW))
        def wq(pct: Int) =
          min(when($"c" * 100 >= $"t" * pct, $"l_extendedprice"))
            .as(s"wq$pct")
        cum.groupBy($"l_returnflag")
          .agg(sum($"w").as("total_units"), wq(50), wq(90), wq(99))
          .orderBy($"l_returnflag")
      },
      Some("""
        WITH vw AS (
          SELECT l_returnflag, l_extendedprice AS v,
                 SUM(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem GROUP BY 1, 2),
        cum AS (
          SELECT l_returnflag, v, w,
                 SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS c,
                 SUM(w) OVER (PARTITION BY l_returnflag) AS t
          FROM vw)
        SELECT l_returnflag,
               CAST(SUM(w) AS BIGINT) AS total_units,
               MIN(CASE WHEN c*100 >= t*50 THEN v END) AS wq50,
               MIN(CASE WHEN c*100 >= t*90 THEN v END) AS wq90,
               MIN(CASE WHEN c*100 >= t*99 THEN v END) AS wq99
        FROM cum GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "exact weighted quantiles (quantileExactWeighted): integer rank math over distinct-value window"),

    // ------------------------------------------------------------------
    // q70: NEAREST AS-OF JOIN (pandas merge_asof direction='nearest',
    // the sensor/trade alignment shape AsOf.scala's backward join can't
    // express): each view event pairs with its temporally NEAREST
    // purchase by the same user — before or after. One user-partitioned
    // sort carries BOTH sides; two window passes over that single
    // exchange compute the latest-prior candidate (inclusive: same-µs
    // purchases sort ahead of views) and the earliest-later candidate,
    // and a row-local comparison picks the nearer (ties → the earlier,
    // matching the oracle's abs/ts/id ordering; the (us, -id) backward
    // struct makes same-timestamp ties resolve to the SMALLEST id on
    // both sides). No self-join: at 100 TB a nearest-join-by-key via
    // join would shuffle events twice and explode on hot users — this
    // is the single-shuffle sorted-merge formulation. All time math is
    // integer microseconds (the corpus has no sub-µs components, so
    // Spark's µs and DuckDB's ns views of the data agree exactly).
    QueryDef(
      "q70_asof_nearest",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .filter($"event_type".isin("view", "purchase"))
          .select($"user_id", $"event_id",
            when($"event_type" === "purchase", 0).otherwise(1).as("k"),
            unix_micros($"ts").as("us"))
        val ord = Window.partitionBy($"user_id")
          .orderBy($"us".asc, $"k".asc, $"event_id".asc)
        val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = ord.rowsBetween(1, Window.unboundedFollowing)
        ev
          .withColumn("back",
            max(when($"k" === 0, struct($"us", (-$"event_id").as("nid"))))
              .over(wB))
          .withColumn("fwd",
            min(when($"k" === 0, struct($"us", $"event_id".as("pid"))))
              .over(wF))
          .filter($"k" === 1)
          .withColumn("useBack", $"back".isNotNull &&
            ($"fwd".isNull || ($"us" - $"back.us") <= ($"fwd.us" - $"us")))
          .select($"event_id",
            when($"useBack", -$"back.nid").otherwise($"fwd.pid")
              .as("np_event_id"),
            when($"useBack", $"us" - $"back.us").otherwise($"fwd.us" - $"us")
              .as("gap_us"))
          .orderBy($"event_id")
      },
      Some("""
        WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS us
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id, user_id, epoch_us(ts) AS us
              FROM events WHERE event_type = 'purchase')
        SELECT v.event_id,
               (SELECT p.event_id FROM p WHERE p.user_id = v.user_id
                ORDER BY abs(p.us - v.us) ASC, p.us ASC, p.event_id ASC
                LIMIT 1) AS np_event_id,
               (SELECT abs(p.us - v.us) FROM p WHERE p.user_id = v.user_id
                ORDER BY abs(p.us - v.us) ASC, p.us ASC, p.event_id ASC
                LIMIT 1) AS gap_us
        FROM v ORDER BY v.event_id"""),
      doc = "nearest as-of join: single-shuffle sorted-merge, backward/forward candidates, tie to earlier"),

    // ------------------------------------------------------------------
    // q71: GAP FILL + LINEAR INTERPOLATION (ClickHouse ORDER BY ... WITH
    // FILL INTERPOLATE / the time-series densification every monitoring
    // dashboard needs): each user's daily value series is densified to
    // a contiguous day spine (sequence() explode between the user's own
    // first and last active day — no global spine, so a long-lived user
    // doesn't pad a short-lived one), missing days get n_events = 0,
    // and the value is linearly interpolated between the surrounding
    // observed days. The interpolation fraction is a ratio of integer
    // day differences, and prev/next lookups are two IGNORE NULLS
    // window passes over ONE user-partitioned exchange (the spine join
    // reuses the same key). Edge days are observed by construction, so
    // every gap is interior and the interpolant is total. Scale: spine
    // size is O(user lifetime), the explode is map-side, and the whole
    // query is one shuffle for the daily agg + one for the window.
    QueryDef(
      "q71_gap_fill_interpolate",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(sum($"value".cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(25, 6))).cast("double").as("day_value"),
            count(lit(1)).as("n_events"))
        val spine = daily.groupBy($"user_id")
          .agg(min($"day").as("d0"), max($"day").as("d1"))
          .select($"user_id",
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val wB = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        spine.join(daily, Seq("user_id", "day"), "left")
          .withColumn("prev_val", last($"day_value", ignoreNulls = true).over(wB))
          .withColumn("prev_day",
            last(when($"day_value".isNotNull, $"day"), ignoreNulls = true).over(wB))
          .withColumn("next_val", first($"day_value", ignoreNulls = true).over(wF))
          .withColumn("next_day",
            first(when($"day_value".isNotNull, $"day"), ignoreNulls = true).over(wF))
          .select($"user_id", $"day",
            coalesce($"n_events", lit(0L)).as("n_events"),
            round(coalesce($"day_value",
              $"prev_val" + ($"next_val" - $"prev_val")
                * (datediff($"day", $"prev_day").cast("double")
                   / datediff($"next_day", $"prev_day").cast("double"))), 6)
              .as("filled_value"))
          .orderBy($"user_id", $"day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS day_value,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                FROM daily GROUP BY 1)),
        j AS (
          SELECT s.user_id, s.day, d.day_value,
                 COALESCE(d.n_events, 0) AS n_events
          FROM spine s LEFT JOIN daily d
            ON d.user_id = s.user_id AND d.day = s.day),
        w AS (
          SELECT user_id, day, n_events, day_value,
                 last_value(day_value IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS prev_val,
                 last_value(CASE WHEN day_value IS NOT NULL THEN day END
                            IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS prev_day,
                 first_value(day_value IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
                 first_value(CASE WHEN day_value IS NOT NULL THEN day END
                             IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
          FROM j)
        SELECT user_id, day, n_events,
               round(COALESCE(day_value,
                 prev_val + (next_val - prev_val)
                   * (CAST(day - prev_day AS DOUBLE)
                      / CAST(next_day - prev_day AS DOUBLE))), 6)
                 AS filled_value
        FROM w ORDER BY user_id, day"""),
      doc = "gap fill + interpolation (WITH FILL): per-user day spine, IGNORE NULLS bracket windows"),

    // ------------------------------------------------------------------
    // q72: quantile-sketch accuracy audit (quantile / quantileExact +
    // quantileTiming families): per-group approx_percentile sketches
    // checked against the exact interpolated quantiles with RANK-bound
    // verdicts — the q61 pattern for quantiles. approx_percentile
    // returns an actual element of the group; its sorted position
    // r ∈ [count(<v)+1, count(<=v)] must straddle the continuous
    // target rank t = 1 + p·(n−1) within the sketch's rank tolerance
    // (ε·n + slack). Shape: both quantile legs are ONE grouped pass
    // (the sketch is partial-aggregable — the production path at
    // 100 TB, mergeable across executors); the exact leg needs the full
    // per-group value multiset and exists to certify the sketch at
    // audit time — on a sampled slice at production scale. The rank
    // check re-scans events against the broadcast 5-row stats table
    // (map-side), then one more keyed agg. Oracle emits the exact leg
    // + literal-TRUE verdicts: a sketch outside tolerance hash-fails.
    QueryDef(
      "q72_quantile_sketch_audit",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir).select($"event_type", $"value")
        val stats = ev.groupBy($"event_type").agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5D)"), 6).as("p50_exact"),
          round(expr("percentile(value, 0.9D)"), 6).as("p90_exact"),
          expr("approx_percentile(value, array(0.5D, 0.9D), 10000)").as("ap"))
          .select($"event_type", $"n", $"p50_exact", $"p90_exact",
            $"ap".getItem(0).as("av50"), $"ap".getItem(1).as("av90"))
        val ranks = ev.join(broadcast(stats), Seq("event_type"))
          .groupBy($"event_type").agg(
            sum(when($"value" < $"av50", 1L).otherwise(0L)).as("lo50"),
            sum(when($"value" <= $"av50", 1L).otherwise(0L)).as("hi50"),
            sum(when($"value" < $"av90", 1L).otherwise(0L)).as("lo90"),
            sum(when($"value" <= $"av90", 1L).otherwise(0L)).as("hi90"))
        def ok(p: Double, lo: Column, hi: Column): Column = {
          val t = lit(1.0) + lit(p) * ($"n" - 1).cast("double")
          val tol = lit(2.0) + $"n".cast("double") / 1000.0
          ((lo + 1).cast("double") <= t + tol) && (hi.cast("double") >= t - tol)
        }
        stats.join(ranks, Seq("event_type"))
          .select($"event_type", $"n", $"p50_exact", $"p90_exact",
            ok(0.5, $"lo50", $"hi50").as("p50_ok"),
            ok(0.9, $"lo90", $"hi90").as("p90_ok"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               round(quantile_cont(value, 0.5), 6) AS p50_exact,
               round(quantile_cont(value, 0.9), 6) AS p90_exact,
               TRUE AS p50_ok, TRUE AS p90_ok
        FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "quantile-sketch accuracy audit: mergeable approx_percentile vs exact interpolated quantiles, rank-bound verdicts"),

    // ------------------------------------------------------------------
    // q73: VARIANT shredding of heterogeneous semi-structured events —
    // Spark 4's open-format answer to ClickHouse's JSON/Object column:
    // each event type carries a DIFFERENT payload shape (clicks nest a
    // pos struct, purchases carry amount + currency, the rest only the
    // base key), synthesized deterministically from row values. The
    // payloads parse ONCE into the binary VARIANT encoding and typed
    // paths shred out via variant_get — absent paths are typed NULLs,
    // not errors, which is the whole point: schema drift across a
    // 100 TB event stream becomes per-row nullability instead of a
    // pipeline stoppage. Everything downstream is an ordinary grouped
    // aggregation (null-skipping counts/sums make per-shape stats fall
    // out of one pass). Money stays integral (floor to cents, both
    // engines' double floor) so no float ever enters a JSON literal.
    QueryDef(
      "q73_variant_shred",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_id", $"user_id", $"event_type", $"value")
          .withColumn("jdoc", expr("""
            CASE event_type
              WHEN 'click' THEN concat('{"k": ', event_id % 97,
                ', "pos": {"x": ', user_id % 100,
                ', "y": ', event_id % 100, '}}')
              WHEN 'purchase' THEN concat('{"k": ', event_id % 97,
                ', "amount_cents": ', CAST(floor(value * 100) AS BIGINT),
                ', "cur": "usd"}')
              ELSE concat('{"k": ', event_id % 97, '}')
            END"""))
          .withColumn("v", expr("parse_json(jdoc)"))
        ev.select($"event_type",
            expr("variant_get(v, '$.k', 'bigint')").as("k"),
            expr("variant_get(v, '$.pos.x', 'bigint')").as("x"),
            expr("variant_get(v, '$.amount_cents', 'bigint')").as("cents"),
            expr("variant_get(v, '$.cur', 'string')").as("cur"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            count($"x").as("n_pos"),
            coalesce(sum($"cents"), lit(0L)).as("sum_cents"),
            count(when($"cur" === "usd", 1)).as("n_usd"))
          .orderBy($"event_type")
      },
      Some("""
        WITH e AS (
          SELECT event_type, event_id % 97 AS k, user_id % 100 AS x,
                 event_id % 100 AS y,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events),
        j AS (
          SELECT event_type,
                 CASE event_type
                   WHEN 'click' THEN '{"k": ' || k || ', "pos": {"x": ' || x
                     || ', "y": ' || y || '}}'
                   WHEN 'purchase' THEN '{"k": ' || k || ', "amount_cents": '
                     || cents || ', "cur": "usd"}'
                   ELSE '{"k": ' || k || '}'
                 END AS jdoc
          FROM e)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(jdoc, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(json_extract_string(jdoc, '$.pos.x')) AS BIGINT)
                 AS n_pos,
               CAST(COALESCE(SUM(CAST(json_extract_string(jdoc,
                    '$.amount_cents') AS BIGINT)), 0) AS BIGINT) AS sum_cents,
               CAST(COUNT(CASE WHEN json_extract_string(jdoc, '$.cur') = 'usd'
                               THEN 1 END) AS BIGINT) AS n_usd
        FROM j GROUP BY event_type ORDER BY event_type"""),
      doc = "VARIANT shredding: heterogeneous per-type JSON parsed once into the binary variant encoding, typed-path extraction with NULL-on-absent schema drift, one grouped pass"),

    // ------------------------------------------------------------------
    // q74: sumMap-style keyed-map rollup (ClickHouse sumMap /
    // SummingMergeTree map columns): per day, the event-type→metric
    // maps summed key-wise, emitted ClickHouse-style as the aligned
    // (keys[], values[]) arrays of the sorted map. Two shuffles, both
    // partial-aggregable — the (day, type) pre-aggregate does the heavy
    // lifting map-side, and the per-day map assembly only ever sees
    // ≤ |event types| rows per day, so the collect_list is bounded by
    // key cardinality (the sumMap contract), never by row count. Money
    // stays integral (floor-to-cents, the q73 convention); the map type
    // itself flows through the plan via map_from_entries/map_keys/
    // map_values rather than being faked with parallel arrays.
    QueryDef(
      "q74_summap_rollup",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select(to_date($"ts").as("day"), $"event_type",
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .groupBy($"day", $"event_type")
          .agg(count(lit(1)).as("cnt"), sum($"cents").as("scents"))
          .groupBy($"day")
          .agg(
            map_from_entries(sort_array(collect_list(
              struct($"event_type", $"cnt")))).as("mn"),
            map_from_entries(sort_array(collect_list(
              struct($"event_type", $"scents")))).as("mc"))
          // The map type flows through the aggregation plan; only the
          // FINAL projection serializes the aligned (keys, values)
          // arrays to canonical CSV strings — raw ARRAY output is
          // unhashable in the driver's pandas comparator (q64 lesson).
          .select($"day",
            expr("concat_ws(',', cast(map_keys(mn) as array<string>))")
              .as("types"),
            expr("concat_ws(',', cast(map_values(mn) as array<string>))")
              .as("n"),
            expr("concat_ws(',', cast(map_values(mc) as array<string>))")
              .as("sum_cents"))
          .orderBy($"day")
      },
      Some("""
        WITH pre AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 COUNT(*) AS cnt,
                 SUM(CAST(floor(value * 100) AS BIGINT)) AS scents
          FROM events GROUP BY 1, 2)
        SELECT day,
               array_to_string(list(event_type ORDER BY event_type), ',')
                 AS types,
               array_to_string(list(cnt ORDER BY event_type), ',') AS n,
               array_to_string(list(scents ORDER BY event_type), ',')
                 AS sum_cents
        FROM pre GROUP BY day ORDER BY day"""),
      doc = "sumMap keyed-map rollup: per-day event-type maps summed key-wise, sorted (keys, values) array emission, map type through the plan"),

    // ------------------------------------------------------------------
    // q75: PIVOT reshape (the wide dual of q68's unpivot) — per-day
    // event counts and purchase revenue spread into one column per
    // event type via the DataFrame pivot API with an EXPLICIT value
    // list. The explicit list matters at scale: without it Spark runs
    // an extra distinct-values collect JOB over the fact table before
    // it can even plan. With it the pivot compiles to the
    // (day, type) pre-aggregate + a `pivotfirst` re-aggregate on day —
    // both phases partial-aggregable (the first shuffle carries one
    // row per (day, type), the second one row per day), semantically
    // identical to the conditional-aggregation SQL the oracle spells
    // out. Missing (day, type) cells surface as typed zeros. PlanSpec
    // locks the no-Expand / bounded-exchange shape.
    QueryDef(
      "q75_pivot_event_matrix",
      (s, dir) => {
        import s.implicits._
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = Tables.events(s, dir)
          .select(to_date($"ts").as("day"), $"event_type",
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .groupBy($"day")
          .pivot("event_type", types)
          .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
        wide.select($"day" +:
            types.map(t => coalesce(col(s"${t}_n"), lit(0L)).as(s"n_$t")) :+
            coalesce(col("purchase_cents"), lit(0L)).as("purchase_cents"): _*)
          .orderBy($"day")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) FILTER (event_type = 'click')    AS n_click,
               COUNT(*) FILTER (event_type = 'error')    AS n_error,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (event_type = 'view')     AS n_view,
               CAST(COALESCE(SUM(CAST(floor(value * 100) AS BIGINT))
                 FILTER (event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents
        FROM events GROUP BY 1 ORDER BY day"""),
      doc = "PIVOT reshape: explicit-value-list pivot compiling to one conditional-aggregation pass, typed zero fill"),

    // ------------------------------------------------------------------
    // q76: exact equi-depth histogram (ClickHouse histogram() made
    // deterministic): k=8 buckets over l_extendedprice where a value's
    // bucket is floor(strict_lower_rank · k / N) — pure integer math,
    // so both engines agree bit-for-bit with no interpolated-boundary
    // ties (the q72 sketch audit is the approximate path; this is the
    // exact one). Shape is the q69 distinct-value idiom: a grouped
    // pre-aggregate collapses rows to (value, cnt) BEFORE the global
    // window, so the sort window sees distinct prices only, and the
    // strict-lower cumulative rank comes from one running sum. Ties
    // (equal prices) land in one bucket whole — bucket populations
    // deviate from N/k only by tie mass, the standard equi-depth
    // contract.
    QueryDef(
      "q76_equidepth_histogram",
      (s, dir) => {
        import s.implicits._
        val k = 8
        val vals = Tables.load(s, dir, "lineitem")
          .groupBy($"l_extendedprice".as("v"))
          .agg(count(lit(1)).as("cnt"),
            sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).as("dsum"))
        val total = vals.agg(sum($"cnt").as("total_n"))
        val w = Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        vals
          .withColumn("lower", sum($"cnt").over(w) - $"cnt")
          .crossJoin(broadcast(total))
          .withColumn("bucket", expr(s"(lower * $k) div total_n"))
          .groupBy($"bucket")
          .agg(sum($"cnt").as("n_rows"), count(lit(1)).as("n_values"),
            min($"v").as("lo"), max($"v").as("hi"),
            sum($"dsum").cast("double").as("sum_price"))
          .orderBy($"bucket")
      },
      Some("""
        WITH vals AS (
          SELECT l_extendedprice AS v, COUNT(*) AS cnt,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dsum
          FROM lineitem GROUP BY 1),
        ranked AS (
          SELECT v, cnt, dsum,
                 SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
                   AS lower_rank
          FROM vals)
        SELECT CAST((lower_rank * 8) // (SELECT COUNT(*) FROM lineitem)
                 AS BIGINT) AS bucket,
               CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_values,
               MIN(v) AS lo, MAX(v) AS hi,
               CAST(SUM(dsum) AS DOUBLE) AS sum_price
        FROM ranked GROUP BY 1 ORDER BY bucket"""),
      doc = "exact equi-depth histogram: integer strict-lower-rank buckets over the distinct-value pre-aggregate, tie mass whole-bucketed"),

    // ------------------------------------------------------------------
    // q77: NDV-SKETCH ACCURACY AUDIT (uniq vs uniqExact) — completes
    // the sketch-audit family (q61 topK, q72 quantiles, d32 MinHash):
    // per event type, the mergeable HLL++ estimate is checked against
    // the exact distinct count with the standard-error bound promoted
    // to a verdict (|approx − exact| ≤ 5%·exact + 5, generous vs the
    // 2% rsd the sketch is configured for). The sketch VALUE never
    // reaches the output — it is engine-specific by nature — only the
    // exact count and the boolean the audit exists to produce, which
    // is how all sketch rows stay hash-checkable. Both aggregates are
    // partial-aggregable, so the audit costs one map-side-combined
    // pass at any scale; the exact side's shuffle carries (type, user)
    // pairs only.
    QueryDef(
      "q77_ndv_sketch_audit",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct($"user_id").as("exact_ndv"),
            approx_count_distinct($"user_id", 0.02).as("approx"))
          .select($"event_type", $"n", $"exact_ndv",
            (abs($"approx" - $"exact_ndv")
              <= $"exact_ndv" / lit(20L) + lit(5L)).as("ndv_ok"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS exact_ndv,
               TRUE AS ndv_ok
        FROM events GROUP BY event_type ORDER BY event_type"""),
      doc = "NDV-sketch accuracy audit: mergeable HLL++ estimate vs exact distinct count, error-bound verdict, sketch value never surfaced"),

    // ------------------------------------------------------------------
    // q78: CORRELATION / COVARIANCE aggregates (ClickHouse corr /
    // covarSamp / covarPop) — q55's exact-moment discipline applied to
    // the bivariate statistics: both engines' built-in corr() accumulate
    // in floating point with engine-specific merge orders, so instead
    // the five decimal power sums (Σx, Σy, Σxy, Σx², Σy²) are computed
    // exactly (partial-aggregable, one shuffle) and the textbook
    // formulas assemble them from bit-identical doubles — corr =
    // (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²)), covar_samp =
    // (nΣxy − ΣxΣy) / (n(n−1)). Values stay decimal until the final
    // assembly: quantity has 2 decimals, price 2, so DECIMAL(38,8)
    // sums are exact at any corpus size.
    QueryDef(
      "q78_corr_covar",
      (s, dir) => {
        import s.implicits._
        val li = Tables.load(s, dir, "lineitem")
          .select($"l_returnflag",
            expr("CAST(l_quantity AS DECIMAL(18,2))").as("x"),
            expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("y"))
        li.groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum($"x").cast("double").as("sx"),
            sum($"y").cast("double").as("sy"),
            sum(expr("CAST(x * y AS DECIMAL(38,8))")).cast("double").as("sxy"),
            sum(expr("CAST(x * x AS DECIMAL(38,8))")).cast("double").as("sxx"),
            sum(expr("CAST(y * y AS DECIMAL(38,8))")).cast("double").as("syy"))
          .select($"l_returnflag", $"n",
            round(($"n" * $"sxy" - $"sx" * $"sy") /
              sqrt(($"n" * $"sxx" - $"sx" * $"sx")
                * ($"n" * $"syy" - $"sy" * $"sy")), 6).as("corr_qty_price"),
            round(($"n" * $"sxy" - $"sx" * $"sy") /
              ($"n" * ($"n" - 1)).cast("double"), 4).as("covar_samp"))
          .orderBy($"l_returnflag")
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,8)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,8)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,8)))
                   AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 AS corr_qty_price,
               round((n * sxy - sx * sy) / CAST(n * (n - 1) AS DOUBLE), 4)
                 AS covar_samp
        FROM m ORDER BY l_returnflag"""),
      doc = "correlation/covariance aggregates from five exact decimal power sums (partial-aggregable), textbook assembly from bit-identical doubles"),

    // ------------------------------------------------------------------
    // q79: AUDIENCE-OVERLAP via sketch set algebra — the uniqTheta /
    // Druid-theta-sketch workload: how many distinct users did event
    // types A and B share? HLL sketches cannot intersect directly, so
    // production systems use inclusion–exclusion over the mergeable
    // union: |A∩B| ≈ est(A) + est(B) − est(A∪B). Per type-pair this
    // query emits the EXACT overlap (from per-user type sets — one
    // user-keyed shuffle, ≤ |types| per user, partial-aggregable pair
    // counts) plus a tolerance VERDICT on the sketch estimate — the
    // q27/q61/q77 recipe: the estimate itself never surfaces (it is
    // engine-specific), but the row only hashes green if inclusion–
    // exclusion really lands within the bound, so the oracle checks the
    // sketch pipeline end to end. lgK=14 keeps per-type sketch error
    // ≈0.8%; the bound 0.05·(na+nb)+100 absorbs the 3-term compounding
    // on small overlaps. Scale: sketches and counts are mergeable
    // partial aggregates; the pair join is |types|² tiny rows.
    QueryDef(
      "q79_overlap_sketch",
      (s, dir) => {
        import s.implicits._
        val ut = Tables.events(s, dir)
          .select($"event_type".as("t"), $"user_id").distinct()
        val perType = ut.groupBy($"t")
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
            count(lit(1)).as("n"))
        val pairs = perType.as("a")
          .join(broadcast(perType.as("b")), $"a.t" < $"b.t")
          .select($"a.t".as("etype_a"), $"b.t".as("etype_b"),
            $"a.n".as("na"), $"b.n".as("nb"),
            (expr("hll_sketch_estimate(a.sk)")
              + expr("hll_sketch_estimate(b.sk)")
              - expr("hll_sketch_estimate(hll_union(a.sk, b.sk))"))
              .as("est_overlap"))
        val exact = ut.groupBy($"user_id")
          .agg(sort_array(collect_set($"t")).as("ts"))
          .select(explode(expr(
            """flatten(transform(ts, x ->
                 transform(filter(ts, y -> y > x),
                   y -> struct(x AS etype_a, y AS etype_b))))""")).as("p"))
          .groupBy($"p.etype_a".as("etype_a"), $"p.etype_b".as("etype_b"))
          .agg(count(lit(1)).as("exact_overlap"))
        pairs.join(exact, Seq("etype_a", "etype_b"), "left")
          .select($"etype_a", $"etype_b", $"na", $"nb",
            coalesce($"exact_overlap", lit(0L)).as("exact_overlap"),
            (abs($"est_overlap" - coalesce($"exact_overlap", lit(0L)))
              <= lit(0.05) * ($"na" + $"nb") + lit(100.0)).as("est_ok"))
          .orderBy($"etype_a", $"etype_b")
      },
      Some("""
        WITH ut AS (SELECT DISTINCT event_type AS t, user_id FROM events),
        n AS (SELECT t, COUNT(*) AS n FROM ut GROUP BY t),
        ov AS (SELECT a.t AS etype_a, b.t AS etype_b,
                      COUNT(*) AS exact_overlap
               FROM ut a JOIN ut b
                 ON a.user_id = b.user_id AND a.t < b.t
               GROUP BY a.t, b.t)
        SELECT na.t AS etype_a, nb.t AS etype_b,
               na.n AS na, nb.n AS nb,
               COALESCE(ov.exact_overlap, 0) AS exact_overlap,
               TRUE AS est_ok
        FROM n na JOIN n nb ON na.t < nb.t
        LEFT JOIN ov ON ov.etype_a = na.t AND ov.etype_b = nb.t
        ORDER BY etype_a, etype_b"""),
      doc = "audience overlap via sketch set algebra: HLL inclusion-exclusion per event-type pair, exact overlap + tolerance verdict (estimate never surfaced, the q77 recipe); mergeable sketches, tiny pair join"),

    // ------------------------------------------------------------------
    // q80: CAPPED DISTINCT COUNT — the ClickHouse uniqUpTo(N) aggregate:
    // exact NDV while ≤ N, saturating at N+1, with O(N) state per group
    // REGARDLESS of group size. This is the missing point on the
    // distinct-count spectrum the registry already spans — exact
    // count(distinct) (q10) pays O(NDV) state, approx_count_distinct
    // (q27/q77) pays fixed state for a probabilistic answer — while the
    // extremely common "does this key have more than N variants" gate
    // needs neither: uniqUpTo is EXACT below the cap and its buffer
    // can never exceed N+1 values (the bounded-state test pushes 10k
    // distinct values through one buffer). Implemented as a typed
    // Aggregator (SURVEY §2.D UDF surface, q23's seam) registered via
    // functions.udaf — Spark plans it as two-phase ObjectHashAggregate,
    // partial states merging by sorted-set union + truncate. Three
    // lanes prove the semantics: cap-4 over l_suppkey SATURATES (NDV 10+
    // per group → always 5), cap-4 over l_orderkey%3 stays BELOW cap
    // (exact 3), cap-1000 over l_suppkey is exact at gate scale —
    // LEAST(COUNT(DISTINCT x), N+1) on the oracle side reproduces all
    // three from first principles.
    QueryDef(
      "q80_uniq_upto",
      (s, dir) => {
        import s.implicits._
        val upto4 = udaf(new graft.functions.UniqUpToAggregator(4))
        val upto1000 = udaf(new graft.functions.UniqUpToAggregator(1000))
        Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linenumber")
          .agg(count(lit(1)).as("n_rows"),
            upto4($"l_suppkey").as("uniq_supp_upto4"),
            upto4($"l_orderkey" % 3).as("uniq_mod3_upto4"),
            upto1000($"l_suppkey").as("uniq_supp_upto1000"))
          .withColumn("hit_cap", $"uniq_supp_upto1000" > 4)
          .orderBy($"l_returnflag", $"l_linenumber")
      },
      Some("""
        SELECT l_returnflag, l_linenumber,
               COUNT(*) AS n_rows,
               LEAST(COUNT(DISTINCT l_suppkey), 5) AS uniq_supp_upto4,
               LEAST(COUNT(DISTINCT l_orderkey % 3), 5) AS uniq_mod3_upto4,
               LEAST(COUNT(DISTINCT l_suppkey), 1001) AS uniq_supp_upto1000,
               COUNT(DISTINCT l_suppkey) > 4 AS hit_cap
        FROM lineitem
        GROUP BY l_returnflag, l_linenumber
        ORDER BY l_returnflag, l_linenumber"""),
      doc = "uniqUpTo(N) capped distinct: exact below the cap, saturates at N+1, O(N) state per group via a typed Aggregator (two-phase ObjectHashAggregate); saturated, below-cap, and wide-cap lanes all oracle-checked"),

    // ------------------------------------------------------------------
    // q81: COUNT-MIN SKETCH frequency estimation — the third sketch
    // family after HLL (q27/q77/q79: distinct counts) and KLL/GK
    // (q72: quantiles): point-frequency queries with O(d·w) state
    // (4×64 = 256 cells here) regardless of key cardinality. The cell
    // grid is one partial-aggregable groupBy (map-side combine collapses
    // every partition to ≤256 rows before the exchange — at 100 TB the
    // shuffle moves KB, not data), probe keys come from the data
    // (user_id % 10 = 7), and the estimate is the min over the d=4
    // hash rows of the probe's cell counts via a broadcast join of the
    // 256-cell grid. Hash rows use md5 (`j:key`), so the DuckDB oracle
    // reproduces the sketch BIT-IDENTICALLY (OracleFragments.oHexInt is
    // the conv(hex,16,10) analog) — est_cm itself hash-checks, not just
    // a tolerance verdict. The structural CM guarantees still surface:
    // overcount = est − true is ≥ 0 by construction (every cell counts a
    // superset of its probe's occurrences), and within_eps audits the
    // e·N/w error bound (all 15 probes inside it at the gate SF).
    QueryDef(
      "q81_countmin_frequency",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir).select($"user_id")
        val depths = (0 to 3).map(lit(_))
        // bucket_j(key) = first 4 md5 nibbles of "j:key", mod the width;
        // the hash-row index travels as the column named `jc`
        val bucket: Column =
          expr("CAST(conv(substring(md5(concat(CAST(jc AS STRING), ':', CAST(user_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 64")
        val cells = ev
          .select($"user_id", explode(array(depths: _*)).as("jc"))
          .withColumn("bucket", bucket)
          .groupBy($"jc".as("j"), $"bucket".as("b"))
          .agg(count(lit(1)).as("c"))
        val total = ev.agg(count(lit(1)).as("total"))
        val probes = ev.filter($"user_id" % 10 === 7)
          .groupBy($"user_id").agg(count(lit(1)).as("true_n"))
        probes
          .select($"user_id", $"true_n", explode(array(depths: _*)).as("jc"))
          .withColumn("bucket", bucket)
          .join(broadcast(cells), $"jc" === $"j" && $"bucket" === $"b")
          .groupBy($"user_id", $"true_n")
          .agg(min($"c").as("est_cm"))
          .crossJoin(broadcast(total))
          .select($"user_id", $"true_n", $"est_cm",
            ($"est_cm" - $"true_n").as("overcount"),
            ($"est_cm" - $"true_n" <=
              ceil(lit(2.718281828459045) * $"total" / 64).cast("long"))
              .as("within_eps"))
          .orderBy($"user_id")
      },
      Some(s"""
        WITH ev AS (SELECT user_id FROM events),
        n AS (SELECT COUNT(*) AS total FROM ev),
        cells AS (
          SELECT js.j,
                 ${OracleFragments.oHexInt("substr(md5(js.j || ':' || user_id), 1, 4)", 4)} % 64 AS bucket,
                 COUNT(*) AS c
          FROM ev, (SELECT unnest([0,1,2,3]) AS j) js
          GROUP BY 1, 2),
        probes AS (SELECT user_id, COUNT(*) AS true_n FROM ev
                   WHERE user_id % 10 = 7 GROUP BY 1),
        pe AS (
          SELECT p.user_id, p.true_n, MIN(c.c) AS est_cm
          FROM probes p CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) js
          JOIN cells c ON c.j = js.j
            AND c.bucket = ${OracleFragments.oHexInt("substr(md5(js.j || ':' || p.user_id), 1, 4)", 4)} % 64
          GROUP BY 1, 2)
        SELECT pe.user_id, pe.true_n, pe.est_cm,
               pe.est_cm - pe.true_n AS overcount,
               pe.est_cm - pe.true_n <=
                 CAST(ceil(2.718281828459045 * n.total / 64) AS BIGINT) AS within_eps
        FROM pe, n ORDER BY pe.user_id"""),
      doc = "count-min sketch point-frequency estimation: 4x64 cell grid as one partial-aggregable groupBy, min-over-rows probe via broadcast of the 256-cell sketch; md5 hash rows make the estimate itself cross-engine hash-checkable, with the >=true and e*N/w bounds audited"),

    // ------------------------------------------------------------------
    // q82: WEIGHTED SAMPLING WITHOUT REPLACEMENT — Efraimidis–Spirakis
    // A-ES: each row gets rank key u^(1/w) (u uniform, w the weight) and
    // the top-k keys per group are EXACTLY a weight-proportional sample
    // without replacement — in ONE pass with O(k) state per group, the
    // only sampling design that both respects weights and never needs a
    // second "how many did I get" pass at 100 TB. u derives from
    // md5(doc_id) (the q45 determinism recipe: reproducible across
    // engines AND across cluster re-runs — a rand()-based sample changes
    // under retry, poisoning dedup/provenance downstream), and the
    // monotone transform ln(u)/w replaces u^(1/w) so the DuckDB oracle
    // computes the identical ordering. The rank filter sits directly on
    // row_number, so Spark plans a WindowGroupLimit: each partition
    // keeps only its local top-10 per source BEFORE the shuffle — the
    // two-phase top-k shape, not a global per-group sort.
    QueryDef(
      "q82_weighted_sample",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          // u ∈ (0, 1]: (v+1)/2^32 over the first 8 md5 nibbles — +1
          // dodges ln(0); every step exact in double on both engines
          .withColumn("akey", expr(
            """ln((CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) + 1)
                  / 4294967296.0) / n_chars"""))
        docs
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"source").orderBy($"akey".desc, $"doc_id".asc)))
          .filter($"rnk" <= 10)
          .select($"source", $"rnk".cast("long").as("rnk"), $"doc_id", $"n_chars")
          .orderBy($"source", $"rnk")
      },
      Some(s"""
        WITH d AS (
          SELECT source, doc_id, n_chars,
                 ln((${OracleFragments.oHexInt("md5(CAST(doc_id AS VARCHAR))", 8)} + 1)
                    / 4294967296.0) / n_chars AS akey
          FROM documents),
        r AS (SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY akey DESC, doc_id) AS rnk
              FROM d)
        SELECT source, rnk, doc_id, n_chars FROM r
        WHERE rnk <= 10 ORDER BY source, rnk"""),
      doc = "Efraimidis-Spirakis weighted sampling without replacement: deterministic md5-derived uniforms, rank key ln(u)/w, per-source top-k via group-limited window (one pass, O(k) state); inclusion probability proportional to n_chars, reproducible across engines and retries"),

    // ------------------------------------------------------------------
    // q83: MAX CONCURRENT INTERVALS (ClickHouse maxIntersections) — the
    // sweep-line workload: each event opens an interval [ts, ts +
    // floor(value·10) s] and the answer is the peak number of
    // simultaneously open intervals per type. The classic formulation is
    // ONE running sum over all ±1 boundary points per key — a
    // single-task sort per key, the 100-TB window killer when keys are
    // few (5 types here). So the engine side computes it DECOMPOSED:
    // level 1 windows over (type, day) partitions — bounded, parallel —
    // yielding each day's internal running max and net delta; level 2
    // prefix-sums the net deltas over the tiny (type, day) table to get
    // each day's carry-in count, and max(carry + day_max) is EXACTLY the
    // global running max (every prefix of the global sweep belongs to
    // one day; its value = that day's carry + a within-day prefix). The
    // oracle computes the naive single window — the decomposition must
    // reproduce it bit-for-bit. Ordering puts starts before ends at
    // equal timestamps (d DESC), so touching intervals count as
    // concurrent on both sides.
    QueryDef(
      "q83_max_intersections",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_type", $"event_id",
            expr("unix_micros(ts)").as("st"),
            (expr("unix_micros(ts)") +
              expr("CAST(floor(value * 10) AS BIGINT)") * 1000000L).as("en"))
        val pts = ev.select($"event_type", $"event_id", explode(array(
            struct($"st".as("t"), lit(1).as("d")),
            struct($"en".as("t"), lit(-1).as("d")))).as("p"))
          .select($"event_type", $"event_id", $"p.t".as("t"), $"p.d".as("d"))
        maxIntersectionsDecomposed(pts)
      },
      Some("""
        WITH pts AS (
          SELECT event_type, event_id, epoch_us(ts) AS t, 1 AS d FROM events
          UNION ALL
          SELECT event_type, event_id,
                 epoch_us(ts) + CAST(floor(value * 10) AS BIGINT) * 1000000,
                 -1 FROM events),
        r AS (SELECT event_type, d,
                     SUM(d) OVER (PARTITION BY event_type
                                  ORDER BY t, d DESC, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run
              FROM pts)
        SELECT event_type,
               COUNT(*) FILTER (WHERE d = 1) AS n_intervals,
               CAST(MAX(run) AS BIGINT) AS max_concurrent
        FROM r GROUP BY event_type ORDER BY event_type"""),
      doc = "max concurrent intervals (maxIntersections) via day-decomposed sweep-line: per-(type,day) bounded windows + carry-in prefix over the tiny day table reproduce the single global running sum bit-for-bit -- no single-task per-key sort at scale; oracle computes the naive global window"),

    // ------------------------------------------------------------------
    // q84: BUCKETED CO-LOCATED JOIN — the storage-layout join the brief
    // names alongside broadcast: when BOTH sides of a recurring
    // fact-to-fact join are written bucketed on the join key (same
    // bucket count, hash-partitioned at write time), the join's
    // Exchange disappears ENTIRELY — each task merge-joins bucket i of
    // lineitem against bucket i of orders straight off disk. Broadcast
    // (q03/q05) covers small dims; this covers the case where neither
    // side fits in memory — at 100 TB, shuffling either fact table for
    // every join is the dominant cost, and bucketing amortizes ONE
    // layout write across every subsequent join/agg on that key. The
    // write repartitions to exactly one file per bucket, so the
    // bucket-sorted order is also trusted at read time. The merge hint
    // pins SortMergeJoin (broadcast would hide the co-location proof);
    // PlanSpec asserts the join runs over bucketed scans with zero
    // exchanges below it. Materialization is idempotent per session
    // (catalog check) and lands in a corpus-keyed scratch dir.
    QueryDef(
      "q84_bucketed_colocated_join",
      (s, dir) => {
        import s.implicits._
        val tag = java.lang.Integer.toHexString(dir.hashCode)
        val liTbl = s"graft_bkt_${tag}_lineitem"
        val ordTbl = s"graft_bkt_${tag}_orders"
        if (!s.catalog.tableExists(liTbl) || !s.catalog.tableExists(ordTbl)) {
          // Bucket count derived from the BIG side (~2M rows/bucket,
          // floor 8): a fixed count is a hidden parallelism cap — with 8
          // buckets the ×100 sweep's 60M-row write ran 8-wide on 32
          // cores (111 s); deriving it restores linear write scaling.
          // Both sides MUST share the count or co-location breaks.
          val buckets = math.min(256,
            math.max(8L, (Tables.load(s, dir, "lineitem").count()
              + 1999999L) / 2000000L)).toInt
          def bucketize(name: String, key: String, tbl: String): Unit =
            Tables.load(s, dir, name)
              .repartition(buckets, col(key))
              .write
              .bucketBy(buckets, key).sortBy(key)
              .option("path", s"/tmp/graft_bucketed/$tag/$name")
              .mode("overwrite")
              .format("parquet")
              .saveAsTable(tbl)
          bucketize("lineitem", "l_orderkey", liTbl)
          bucketize("orders", "o_orderkey", ordTbl)
        }
        val li = s.table(liTbl)
        val ord = s.table(ordTbl)
        li.hint("merge").join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum($"l_quantity".cast(DecimalType(18, 2))).cast("double")
              .as("sum_qty"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "bucketed co-located fact-to-fact join: both sides written bucketBy(derived count, join key) with one file per bucket, merge-join runs with ZERO exchanges below it -- the storage layout that amortizes one write across every subsequent join on the key; oracle joins the raw parquet"),

    // ------------------------------------------------------------------
    // q85: M4 TIME-SERIES DOWNSAMPLING — the dashboard-serving
    // aggregation (Jugel et al., VLDB'14; what Grafana/Timescale/
    // ClickHouse GROUP BY toStartOfInterval serve): per (series, pixel
    // bucket), keep first/last/min/max of the value — the four points
    // that make the downsampled line VISUALLY identical to the raw
    // series at that pixel width. Chosen over LTTB because M4 is fully
    // PARTIAL-AGGREGABLE (min/max/min_by/max_by all combine map-side):
    // 100 TB of raw points reduce to series×pixels rows with the
    // shuffle carrying only combined partials, while LTTB's
    // previous-selected-point recurrence is inherently sequential and
    // cannot distribute. first/last need a TOTAL order to be
    // deterministic: the order key is lpad(t)||':'||lpad(event_id)
    // (fixed-width decimal strings compare like the numbers; (t, id) is
    // unique) because DuckDB's arg_min cannot take a composite — the
    // same string computes on both sides. Values surface RAW (selected,
    // not summed — no float-accumulation order to pin).
    QueryDef(
      "q85_m4_downsample",
      (s, dir) => {
        import s.implicits._
        val ord = expr(
          "lpad(CAST(t AS STRING), 20, '0') || ':' || lpad(CAST(event_id AS STRING), 20, '0')")
        Tables.events(s, dir)
          .select($"event_type", $"event_id", $"value",
            expr("unix_micros(ts)").as("t"))
          .withColumn("bucket", expr("t div 3600000000"))
          .withColumn("ord", ord)
          .groupBy($"event_type", $"bucket")
          .agg(count(lit(1)).as("n"),
            min_by($"value", $"ord").as("first_v"),
            max_by($"value", $"ord").as("last_v"),
            min($"value").as("min_v"), max($"value").as("max_v"))
          .orderBy($"event_type", $"bucket")
      },
      Some("""
        WITH p AS (
          SELECT event_type, epoch_us(ts) AS t, event_id, value,
                 epoch_us(ts) // 3600000000 AS bucket
          FROM events)
        SELECT event_type, bucket, COUNT(*) AS n,
               arg_min(value, lpad(CAST(t AS VARCHAR), 20, '0') || ':'
                 || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS first_v,
               arg_max(value, lpad(CAST(t AS VARCHAR), 20, '0') || ':'
                 || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS last_v,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM p GROUP BY 1, 2 ORDER BY event_type, bucket"""),
      doc = "M4 time-series downsampling (dashboard serving): per (series, pixel bucket) first/last/min/max -- fully partial-aggregable (unlike sequential LTTB), raw points reduce map-side to series*pixels rows; first/last pinned by a total (t,id) order key identical on both engines"),

    // ------------------------------------------------------------------
    // q86: GAP-CONSTRAINED SEQUENCE MATCH — the ClickHouse
    // sequenceMatch('(?1)(?t<=3600)(?2)(?t<=3600)(?3)') signature: did
    // this user do view → click → purchase where EACH adjacent gap is
    // ≤ 1 hour? This is the missing member of the ordered-pattern
    // battery: q54's windowFunnel bounds the WHOLE chain from its
    // anchor, q62 counts unconstrained chains — neither constrains the
    // per-step gap, and gap-constrained matching is NOT expressible as
    // either (a late view can enable a match the earliest view misses).
    //
    // Semantics: the monotone latest-completion DP. Scanning the user's
    // events in (ts, event_id) order, keep l_k = the LATEST timestamp
    // completing stages 1..k; an event of type k+1 at time t extends
    // iff t − l_k ≤ gap, and taking the CURRENT l_k is optimal because
    // l_k only grows during the scan (a larger anchor is always at
    // least as permissive for the next gap). l_3 set ⟺ a match exists;
    // the reached stage is the largest set l_k. A property test replays
    // random event sequences against a brute-force all-subsequences
    // reference (OperatorSpec "q86 gap DP").
    //
    // Shape: identical to q62 — ONE user-partitioned shuffle building
    // the sorted per-user array (bounded by per-user event count, the
    // same contract every sessionization query carries), then the DP is
    // an in-row aggregate() fold; at 100 TB nothing but (user, bounded
    // event list) ever crosses the wire, vs the 3-way self-join
    // spelling that shuffles the event table once per stage. The
    // oracle spells the SAME DP as a recursive-CTE walk, so both
    // engines execute one fold, not two different algorithms.
    QueryDef(
      "q86_sequence_match_gap",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(sort_array(collect_list(
            struct($"ts", $"event_id", $"event_type"))).as("evs"))
          .withColumn("st", gapDpCol("evs", 3600000000L))
          .select($"user_id",
            expr("""CAST(CASE WHEN st.l3 >= 0 THEN 3
                              WHEN st.l2 >= 0 THEN 2
                              WHEN st.l1 >= 0 THEN 1
                              ELSE 0 END AS INT)""").as("gap_stage"),
            ($"st.l3" >= 0).as("matched"))
          .orderBy($"user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS tu,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        hi AS (SELECT user_id, MAX(i) AS m FROM ev GROUP BY user_id),
        walk(user_id, i, l1, l2, l3) AS (
          SELECT user_id, 0, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                 CAST(-1 AS BIGINT) FROM hi
          UNION ALL
          SELECT w.user_id, w.i + 1,
                 CASE WHEN e.event_type = 'view' THEN e.tu ELSE w.l1 END,
                 CASE WHEN e.event_type = 'click' AND w.l1 >= 0
                           AND e.tu - w.l1 <= 3600000000
                      THEN e.tu ELSE w.l2 END,
                 CASE WHEN e.event_type = 'purchase' AND w.l2 >= 0
                           AND e.tu - w.l2 <= 3600000000
                      THEN e.tu ELSE w.l3 END
          FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1)
        SELECT w.user_id,
               CAST(CASE WHEN l3 >= 0 THEN 3 WHEN l2 >= 0 THEN 2
                         WHEN l1 >= 0 THEN 1 ELSE 0 END AS INT) AS gap_stage,
               l3 >= 0 AS matched
        FROM walk w JOIN hi ON w.user_id = hi.user_id AND w.i = hi.m
        ORDER BY w.user_id"""),
      doc = "sequenceMatch with per-step time-gap constraints ((?t<=1h) between adjacent steps): monotone latest-completion DP as one in-row fold after a single user-partitioned shuffle — the pattern shape neither windowFunnel (anchor-window) nor sequenceCount (unconstrained) covers"),

    // ------------------------------------------------------------------
    // q87: EXPONENTIAL MOVING AVERAGE (ClickHouse
    // exponentialMovingAverage / Prometheus-style smoothing): per-user
    // EMA over the event values in (ts, event_id) order, α = 0.25.
    // The recurrence e_n = 0.25·x_n + 0.75·e_{n−1} is inherently
    // sequential — no window frame expresses it and the closed-form
    // Σ α(1−α)^{n−i}x_i overflows pow() at production row counts — so
    // it runs as an in-row fold over the per-user sorted array (the
    // q62/q86 shape: one user-partitioned shuffle, DP never crosses the
    // wire). Cross-engine float determinism: both engines execute the
    // IDENTICAL multiply-add sequence on IEEE doubles (0.25 and 0.75
    // are exact binary fractions; same inputs + same op order = same
    // bits), and the surfaced value is floor(e·1e6) (the q73
    // floor-to-integer convention) so no rounding-mode difference can
    // leak. A property test replays random sequences against a plain
    // Scala fold (OperatorSpec "q87 EMA fold").
    QueryDef(
      "q87_exp_moving_avg",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(sort_array(collect_list(
            struct($"ts", $"event_id", $"value"))).as("evs"))
          .select($"user_id", size($"evs").cast("long").as("n_events"),
            emaMicrosCol("evs").as("ema_micros"))
          .orderBy($"user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS i
          FROM events),
        hi AS (SELECT user_id, MAX(i) AS m FROM ev GROUP BY user_id),
        walk(user_id, i, e) AS (
          SELECT ev.user_id, 1, ev.value FROM ev WHERE ev.i = 1
          UNION ALL
          SELECT w.user_id, w.i + 1, 0.25 * e2.value + 0.75 * w.e
          FROM walk w JOIN ev e2 ON e2.user_id = w.user_id AND e2.i = w.i + 1)
        SELECT w.user_id, CAST(hi.m AS BIGINT) AS n_events,
               CAST(floor(w.e * 1000000) AS BIGINT) AS ema_micros
        FROM walk w JOIN hi ON w.user_id = hi.user_id AND w.i = hi.m
        ORDER BY w.user_id"""),
      doc = "exponentialMovingAverage: per-user sequential smoothing recurrence as one in-row fold after a single user-partitioned shuffle; identical IEEE multiply-add order on both engines, floor-to-integer surfaced value"),

    // ------------------------------------------------------------------
    // q88: WELCH'S t-TEST (ClickHouse welchTTest / the A/B-experiment
    // readout): for every pair of event types, the unequal-variance
    // t statistic and Welch–Satterthwaite degrees of freedom over the
    // value distributions. The scale story is the textbook one: the
    // WHOLE test reduces to three exact integer moments per arm
    // (n, Σcents, Σcents²) — fully partial-aggregable, so 100 TB of
    // observations combine map-side into |arms| rows and the float
    // stage runs on a handful of scalars. Cross-engine float
    // determinism by construction: the moment sums are exact integers
    // — floor-to-cents (the q73 convention) accumulated in
    // DECIMAL(38,0) on Spark and HUGEINT in DuckDB, so no row count
    // reachable at 100 TB can wrap them — and the t/df formulas are
    // spliced from ONE shared SQL string into both engines — identical
    // expression tree ⟹ identical IEEE op order ⟹ identical doubles
    // (sqrt is correctly rounded per IEEE 754) — surfaced floored
    // (t·1e6, df·1e3), with the significance verdict compared on the
    // floored integer so no float boundary can flip it.
    QueryDef(
      "q88_welch_ttest",
      (s, dir) => {
        import s.implicits._
        val stats = Tables.events(s, dir)
          .select($"event_type",
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .groupBy($"event_type")
          // moments accumulate in DECIMAL(38,0) — the per-row cents²
          // product is an exact long (requires |value| < ~3e7 so
          // cents² < 2⁶³), but the SUM over 100 TB of rows would wrap
          // a long silently in non-ANSI Spark; decimal accumulation is
          // exact to ~1e38, matching the oracle's HUGEINT accumulation
          .agg(count(lit(1)).as("n"),
            sum($"cents".cast("decimal(38,0)")).as("s1"),
            sum(($"cents" * $"cents").cast("decimal(38,0)")).as("s2"))
        val a = stats.select($"event_type".as("arm_a"), $"n".as("n_a"),
          $"s1".as("s1_a"), $"s2".as("s2_a"))
        val b = stats.select($"event_type".as("arm_b"), $"n".as("n_b"),
          $"s1".as("s1_b"), $"s2".as("s2_b"))
        a.join(broadcast(b), $"arm_a" < $"arm_b")
          .selectExpr("arm_a", "arm_b", "n_a", "n_b",
            s"$welchTx1e6 AS t_x1e6", s"$welchDfx1e3 AS df_x1e3")
          .withColumn("significant", abs($"t_x1e6") > 1960000L)
          .orderBy($"arm_a", $"arm_b")
      },
      Some(s"""
        WITH stats AS (
          -- moment sums stay in DuckDB's HUGEINT accumulator (exact),
          -- mirroring the Spark side's DECIMAL(38,0) accumulation; both
          -- engines only narrow to DOUBLE inside the shared formula
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(floor(value * 100) AS BIGINT)) AS s1,
                 SUM(CAST(floor(value * 100) AS BIGINT)
                     * CAST(floor(value * 100) AS BIGINT)) AS s2
          FROM events GROUP BY event_type),
        pairs AS (
          SELECT a.event_type AS arm_a, b.event_type AS arm_b,
                 a.n AS n_a, a.s1 AS s1_a, a.s2 AS s2_a,
                 b.n AS n_b, b.s1 AS s1_b, b.s2 AS s2_b
          FROM stats a JOIN stats b ON a.event_type < b.event_type),
        t AS (
          SELECT arm_a, arm_b, n_a, n_b,
                 $welchTx1e6 AS t_x1e6, $welchDfx1e3 AS df_x1e3
          FROM pairs)
        SELECT arm_a, arm_b, n_a, n_b, t_x1e6, df_x1e3,
               abs(t_x1e6) > 1960000 AS significant
        FROM t ORDER BY arm_a, arm_b"""),
      doc = "Welch's t-test between every event-type pair: three exact integer moments per arm (fully partial-aggregable — 100 TB reduces map-side to |arms| rows), t and Welch-Satterthwaite df from ONE SQL string spliced into both engines (identical IEEE op order), floored-integer significance verdict"),

    // ------------------------------------------------------------------
    // q89: deltaSum COUNTER RATE AS AN AGGREGATE (ClickHouse
    // deltaSumTimestamp): q18's answer — Σ of non-negative consecutive
    // per-user deltas — WITHOUT the per-read lag window. The window
    // formulation shuffles every row to rebuild each user's sorted
    // timeline on every dashboard read; the typed Aggregator reduces
    // each time-range partition map-side into per-user sorted SEGMENTS
    // (first/last sample + exact inner sum) and folds segment
    // boundaries at finish, so only O(users × partitions) fixed-size
    // summaries ever shuffle. The range-partition + within-partition
    // sort pre-shape below stands in for the fact table's native
    // time-clustered layout (parts sorted, date-partitioned) — on the
    // stored table the scan is ALREADY in this shape and the aggregate
    // runs shuffle-free before the final per-user merge. Oracle =
    // q18's lag-window SQL verbatim: incremental-aggregate ≡ window is
    // the row-hash gate itself.
    QueryDef(
      "q89_delta_sum_aggregate",
      (s, dir) => {
        import s.implicits._
        val ds = udaf(new graft.functions.DeltaSumAggregator,
          org.apache.spark.sql.Encoders.product[graft.functions.DeltaSumIn])
        Tables.events(s, dir)
          .select($"user_id", unix_micros($"ts").as("tsm"),
            $"event_id", $"value")
          .repartitionByRange($"tsm", $"event_id")
          .sortWithinPartitions($"tsm", $"event_id")
          .groupBy($"user_id")
          .agg(ds($"tsm", $"event_id", $"value").as("d"))
          .select($"user_id",
            $"d.sum_increase".as("sum_increase"),
            $"d.n_increases".as("n_increases"),
            $"d.n_events".as("n_events"))
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
      doc = "deltaSumTimestamp counter rate as a partial-aggregable typed Aggregator: per-partition sorted segments with boundary-aware merge replace q18's per-read lag-window sort; oracle is q18's window SQL verbatim"),

    // ------------------------------------------------------------------
    // q90: WATERMARK-DROP DIFFERENTIAL — the one streaming semantic the
    // q58-q60/q67/q86/q87 shadows did not oracle-check: which rows a
    // watermarked operator DROPS as too late. The model is exactly
    // Spark's: arrival order = event_id, triggers of 100 rows, and the
    // watermark in effect during trigger t is the high-water mark of
    // everything seen in triggers < t minus the 30-minute delay (Spark
    // advances the watermark between batches, never within one); a row
    // is late iff its event time <= that watermark — the boundary row
    // AT the watermark drops (WatermarkSupport's <= eviction predicate;
    // the StreamingSpec replay pins this boundary against a real
    // stream). Lateness is planted
    // (event_id % 17 == 3 → event time − 5 days) on top of the corpus's
    // natural id/ts disorder, so drops occur at every SF. Output is the
    // per-trigger drop ledger (watermark, arrived/dropped/kept, kept
    // value mass) — the numbers an operator reads off
    // StreamingQueryProgress in production. Scale shape: one partial-agg
    // pass to the per-trigger maxima (rows-per-trigger is bounded, so
    // this table is ~rows/100), a single-partition prefix-max window
    // over THAT bounded table only, broadcast back to the row-level
    // pass. StreamingSpec replays the same arrival schedule through a
    // real watermarked stream and asserts stream ≡ this model.
    QueryDef(
      "q90_watermark_drop_shadow",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .withColumn("tsa", when($"event_id" % 17 === 3,
            $"ts" - expr("INTERVAL 5 DAYS")).otherwise($"ts"))
          .withColumn("trig", expr("event_id div 100"))
        val wmPerTrig = ev.groupBy($"trig").agg(max($"tsa").as("tmax"))
          .withColumn("wm",
            max($"tmax").over(Window.orderBy($"trig")
              .rowsBetween(Window.unboundedPreceding, -1))
              - expr("INTERVAL 30 MINUTES"))
          .select($"trig", $"wm")
        val dropped = ($"wm".isNotNull && $"tsa" <= $"wm")
        val out = ev.join(broadcast(wmPerTrig), "trig")
          .groupBy($"trig", $"wm")
          .agg(count(lit(1)).as("n_arrived"),
            sum(when(dropped, 1L).otherwise(0L)).as("n_dropped"),
            sum(when(!dropped, 1L).otherwise(0L)).as("n_kept"),
            sum(when(!dropped,
              expr("CAST(floor(value * 100) AS BIGINT)")).otherwise(0L))
              .as("kept_cents"))
          .select($"trig", coalesce(unix_micros($"wm"), lit(-1L)).as("wm_micros"),
            $"n_arrived", $"n_dropped", $"n_kept", $"kept_cents")
          .orderBy($"trig")
        require(out.agg(sum($"n_dropped")).head.getLong(0) > 0L,
          "watermark model dropped nothing — the differential is vacuous")
        out
      },
      Some("""
        WITH ev AS (
          SELECT event_id,
                 CASE WHEN event_id % 17 = 3 THEN ts - INTERVAL 5 DAY
                      ELSE ts END AS tsa,
                 value, event_id // 100 AS trig
          FROM events),
        wm AS (
          SELECT trig,
                 MAX(tmax) OVER (ORDER BY trig ROWS BETWEEN UNBOUNDED
                   PRECEDING AND 1 PRECEDING) - INTERVAL 30 MINUTE AS wm
          FROM (SELECT trig, MAX(tsa) AS tmax FROM ev GROUP BY 1) t)
        SELECT e.trig,
               COALESCE(epoch_us(w.wm), -1) AS wm_micros,
               COUNT(*) AS n_arrived,
               CAST(SUM(CASE WHEN w.wm IS NOT NULL AND e.tsa <= w.wm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(SUM(CASE WHEN w.wm IS NULL OR e.tsa > w.wm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN w.wm IS NULL OR e.tsa > w.wm
                    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS kept_cents
        FROM ev e JOIN wm w USING (trig)
        GROUP BY e.trig, w.wm
        ORDER BY trig"""),
      doc = "watermark-drop differential: per-trigger high-watermark model (prefix max event time minus delay, advanced between triggers) with planted late arrivals; the drop ledger an operator reads off StreamingQueryProgress, oracle-checked; StreamingSpec replays the schedule through a real watermarked stream"),

    // ------------------------------------------------------------------
    // q91: SKYLINE (Pareto-dominance) operator — "Integration of
    // Skyline Queries into Spark SQL" (EDBT 2023, PAPERS.md): the
    // multi-criteria shortlist (here: cheapest price, largest
    // quantity, deepest discount — minimize ep, maximize q and d) that
    // no relational form expresses without a quadratic self-join. The
    // distributed shape is the paper's two-phase: a LOCAL dominance
    // filter per partition (sound because dominance is transitive — a
    // globally non-dominated point is non-dominated in its partition),
    // then one GLOBAL filter over the union of local skylines, whose
    // input is bounded by Σ local skyline sizes (~tens of points per
    // partition on anti-correlated dims), not the corpus. Points
    // dedupe to distinct dimension triples first (one partial-agg
    // shuffle); equal triples tie and both survive by definition. The
    // dominance test is pure comparisons on raw values — no float
    // arithmetic — so the NOT EXISTS oracle matches bit-exactly.
    // mapPartitions is the documented last resort here: the dominance
    // fold is inherently imperative (the kept-candidate list mutates).
    QueryDef(
      "q91_skyline",
      (s, dir) => {
        import s.implicits._
        // q dominates p (minimize ep, maximize qty/d) iff <= / >= on
        // every dim and strict on at least one
        def dom(a: (Double, Double, Double, Long),
            b: (Double, Double, Double, Long)): Boolean =
          a._1 <= b._1 && a._2 >= b._2 && a._3 >= b._3 &&
            (a._1 < b._1 || a._2 > b._2 || a._3 > b._3)
        def skylineOf(it: Iterator[(Double, Double, Double, Long)])
            : Iterator[(Double, Double, Double, Long)] = {
          val kept = scala.collection.mutable.ArrayBuffer
            .empty[(Double, Double, Double, Long)]
          it.foreach { p =>
            if (!kept.exists(k => dom(k, p))) {
              val surviving = kept.filterNot(k => dom(p, k))
              kept.clear(); kept ++= surviving; kept += p
            }
          }
          kept.iterator
        }
        val dims = Tables.load(s, dir, "lineitem")
          .groupBy($"l_extendedprice".as("ep"), $"l_quantity".as("q"),
            $"l_discount".as("d"))
          .agg(count(lit(1)).as("n"))
          .as[(Double, Double, Double, Long)]
        dims.mapPartitions(skylineOf)     // local: corpus-sized, parallel
          .repartition(1)
          .mapPartitions(skylineOf)       // global: candidate-sized merge
          .toDF("ep", "q", "d", "n")
          .orderBy($"ep", $"q", $"d")
      },
      Some("""
        WITH dims AS (
          SELECT l_extendedprice AS ep, l_quantity AS q, l_discount AS d,
                 COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2, 3)
        SELECT ep, q, d, CAST(n AS BIGINT) AS n
        FROM dims p
        WHERE NOT EXISTS (
          SELECT 1 FROM dims o
          WHERE o.ep <= p.ep AND o.q >= p.q AND o.d >= p.d
            AND (o.ep < p.ep OR o.q > p.q OR o.d > p.d))
        ORDER BY ep, q, d"""),
      doc = "skyline / Pareto-dominance shortlist (EDBT 2023 Spark-SQL skyline shape): per-partition local dominance filter + bounded global merge — never the quadratic self-join; comparisons only, no float arithmetic, NOT EXISTS oracle"),

    // ------------------------------------------------------------------
    // q92: topK HEAVY HITTERS via SpaceSaving (ClickHouse `topK(N)` /
    // `approx_top_k`) — the sketch-family trio's missing member after
    // HLL (distinct counts, q77/q79) and count-min (point frequencies,
    // q81): the top keys of a stream with O(capacity) state regardless
    // of key cardinality. The fixture plants 3 hot keys (20% of events
    // each) in a tail of thousands of singleton keys; capacity 16 makes
    // the summary a few hundred bytes while the exact groupBy holds
    // thousands of rows — at 100 TB the difference between "shuffle 16
    // counters per partition" and "shuffle every distinct URL". The
    // summary's CONTENT is merge-order-dependent (inherent to the
    // sketch), so — the q77/q81 audit discipline — the row surface is
    // the three ORDER-INDEPENDENT SpaceSaving theorems, asserted
    // against exact counts on keys chosen FROM the exact side (every
    // key with exact > 2N/capacity, integer cross-multiplied): the key
    // IS in the summary (guarantee holds for true > N/cap; 2× is the
    // merged-summary margin), its counter OVERestimates, and the
    // (c − e ≤ true ≤ c) bracket holds. OperatorSpec drives the
    // order-independence and bounded-state claims directly.
    QueryDef(
      "q92_topk_spacesaving",
      (s, dir) => {
        import s.implicits._
        val topk = udaf(new graft.functions.TopKAggregator(16))
        val keyed = Tables.events(s, dir)
          .select(when($"event_id" % 5 < 3,
              concat(lit("hot"), ($"event_id" % 3).cast("string")))
            .otherwise(concat(lit("cold"), $"event_id".cast("string")))
            .as("k"))
        val summary = keyed.agg(topk($"k").as("summary"))
          .select(explode($"summary").as("e"))
          .select($"e.k".as("k"), $"e.c".as("c"), $"e.e".as("err"))
        val exact = keyed.groupBy($"k")
          .agg(count(lit(1)).as("exact_cnt"))
        val total = keyed.agg(count(lit(1)).as("n"))
        exact.crossJoin(broadcast(total))
          .filter($"exact_cnt" * 16 > $"n" * 2) // exact > 2N/cap, integer
          .join(broadcast(summary), Seq("k"), "left")
          .select($"k", $"exact_cnt",
            $"c".isNotNull.as("in_sketch"),
            (coalesce($"c", lit(-1L)) >= $"exact_cnt").as("overestimate_ok"),
            (coalesce($"c", lit(0L)) - coalesce($"err", lit(0L))
              <= $"exact_cnt").as("bracket_ok"))
          .orderBy($"k")
      },
      Some("""
        WITH keyed AS (
          SELECT CASE WHEN event_id % 5 < 3
                      THEN 'hot' || CAST(event_id % 3 AS VARCHAR)
                      ELSE 'cold' || CAST(event_id AS VARCHAR) END AS k
          FROM events),
        exact AS (SELECT k, COUNT(*) AS exact_cnt FROM keyed GROUP BY k),
        tot AS (SELECT COUNT(*) AS n FROM keyed)
        SELECT k, exact_cnt,
               TRUE AS in_sketch, TRUE AS overestimate_ok,
               TRUE AS bracket_ok
        FROM exact, tot WHERE exact_cnt * 16 > n * 2
        ORDER BY k"""),
      doc = "topK heavy hitters via SpaceSaving (ClickHouse topK): O(capacity) state per group at any key cardinality, mergeable-summaries merge charging absent keys each side's minimum; surfaced as the three order-independent theorems (guaranteed presence above 2N/cap, overestimate, c-e<=true bracket) against exact counts, the q77/q81 audit discipline"),

    // ------------------------------------------------------------------
    // q93: GRID-BUCKETED RADIUS SELF-JOIN — the spatial-join kernel
    // (ClickHouse geoDistance / PostGIS ST_DWithin class) and a new
    // operator FAMILY for the engine: "all pairs of points within
    // distance R" over an integer coordinate grid. The naive form is a
    // quadratic cross join; the scalable form buckets points into cells
    // of side R and equijoins each point's cell against its 3×3
    // neighborhood (a bounded 9-way explode on ONE side) — every
    // qualifying pair provably lands in some (cell, neighbor) bucket
    // (|dx|,|dy| ≤ R ⇒ cell coordinates differ by ≤ 1), so the
    // candidate set shrinks from n² to Σ|cell|·9·avg-cell — the same
    // never-all-pairs discipline as d03's LSH banding, applied to
    // geometry. Distances are exact integer squares (micro-degree
    // grid, no trig, no floats — the planar small-area regime);
    // dedup by (a < b). The in-body require pins the point: candidates
    // examined are a small fraction of all pairs. At 100 TB the cell
    // equijoin shuffles on cell keys and AQE handles dense-city skew
    // like any hot key join.
    QueryDef(
      "q93_grid_radius_join",
      (s, dir) => {
        import s.implicits._
        val pts = Tables.events(s, dir)
          .filter($"event_id" % 20 === 0)
          .select($"event_id".as("id"),
            (($"user_id" * 7919) % 20000).as("x"),
            (($"event_id" * 104729) % 20000).as("y"))
        val r = 1500L
        val cells = pts
          .withColumn("cx", expr(s"x div $r")).withColumn("cy", expr(s"y div $r"))
        val probe = cells.select($"id".as("id_b"), $"x".as("xb"),
          $"y".as("yb"), $"cx".as("cxb"), $"cy".as("cyb"))
        val expanded = cells
          .withColumn("dxy", explode(expr(
            "array(-1, 0, 1)")))
          .withColumn("dy2", explode(expr("array(-1, 0, 1)")))
          .select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"),
            ($"cx" + $"dxy").as("ncx"), ($"cy" + $"dy2").as("ncy"))
        val cand = expanded.join(probe,
          $"ncx" === $"cxb" && $"ncy" === $"cyb" && $"id_a" < $"id_b")
        val out = cand
          .select($"id_a", $"id_b",
            (($"xa" - $"xb") * ($"xa" - $"xb")
              + ($"ya" - $"yb") * ($"ya" - $"yb")).as("dist2"))
          .filter($"dist2" <= r * r)
          .orderBy($"id_a", $"id_b")
        // the scale claim: the bucketed candidate set is a small
        // fraction of the quadratic pair space. Asserted via an ANALYTIC
        // upper bound from the tiny per-cell histogram (Σ_c cnt(c) ·
        // Σ_{n∈N(c)} cnt(n) ≥ 2 × candidates — ordered + self pairs
        // included) so the require never re-executes the expanded join
        // the query exists to bound (counting cand directly ran the
        // heavy join twice per invocation).
        val n = pts.count()
        val cc = cells.groupBy($"cx", $"cy").count()
        val nb = cc.select($"cx".as("nx"), $"cy".as("ny"),
          $"count".as("ncnt"))
        val candUB = cc.join(nb,
            abs($"cx" - $"nx") <= 1 && abs($"cy" - $"ny") <= 1)
          .agg(sum($"count" * $"ncnt")).head().getLong(0)
        require(candUB * 4 < n * (n - 1),
          s"grid join candidate bound $candUB of ${n * (n - 1) / 2} pairs")
        out
      },
      Some("""
        WITH pts AS (
          SELECT event_id AS id,
                 (user_id * 7919) % 20000 AS x,
                 (event_id * 104729) % 20000 AS y
          FROM events WHERE event_id % 20 = 0)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
        FROM pts a JOIN pts b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= 1500 * 1500
        ORDER BY id_a, id_b"""),
      doc = "grid-bucketed radius self-join (ST_DWithin / geoDistance class — the spatial-join kernel): points bucketed into R-side cells, 3x3 neighbor equijoin bounds candidates (every <=R pair shares a cell neighborhood), exact integer squared distances, never the quadratic cross join (candidate fraction required in-body); oracle is the brute-force all-pairs join"),

    // ------------------------------------------------------------------
    // q94: PAGERANK, 5 SYNCHRONOUS ITERATIONS — the iterative-graph
    // family's ranking member next to d08's connected components: the
    // canonical "repeat (join ranks to edges → aggregate contributions)
    // until done" shape every distributed graph engine optimizes. The
    // driver loop only BUILDS the plan (5 join+aggregate rounds, no
    // collect between iterations — at 100 TB each round is one shuffle
    // keyed by node, and the rank/degree sides are broadcastable);
    // damping runs in EXACT integer micro-units ((r·17) div (20·deg) —
    // 0.85 as the 17/20 rational, floor division) so every engine,
    // partitioning, and merge order produces the identical lattice of
    // values — float PageRank would diverge across engines in the last
    // bits. The oracle states the SAME five rounds as unrolled CTE
    // pairs (contribution → re-rank), generated from one Scala template
    // so the Spark loop and the SQL text cannot drift. Dangling nodes
    // keep the base rank (in-edge-less) or leak mass (out-edge-less) —
    // the standard simplification, identical both sides.
    QueryDef(
      "q94_pagerank",
      (s, dir) => {
        import s.implicits._
        val edges = Tables.events(s, dir)
          .filter($"event_id" % 7 === 0)
          .select(($"user_id" % 200).as("src"),
            (($"event_id" * 31) % 200).as("dst"))
          .filter($"src" =!= $"dst").distinct()
        pageRank(edges, iters = 5).orderBy($"node")
      },
      Some {
        val iters = (1 to 5).map { k =>
          s"""contrib$k AS (
          SELECT e.dst, SUM((p.r * 17) // (20 * d.deg)) AS c
          FROM edges e JOIN pr${k - 1} p ON p.node = e.src
          JOIN deg d ON d.src = e.src
          GROUP BY e.dst),
        pr$k AS (
          SELECT n.node, 150000 + COALESCE(c.c, 0) AS r
          FROM nodes n LEFT JOIN contrib$k c ON c.dst = n.node)"""
        }.mkString(",\n        ")
        s"""
        WITH edges AS (
          SELECT DISTINCT user_id % 200 AS src, (event_id * 31) % 200 AS dst
          FROM events
          WHERE event_id % 7 = 0
            AND user_id % 200 <> (event_id * 31) % 200),
        nodes AS (SELECT DISTINCT src AS node FROM edges
                  UNION SELECT DISTINCT dst FROM edges),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        $iters
        SELECT node, CAST(r AS BIGINT) AS r FROM pr5 ORDER BY node"""
      },
      doc = "PageRank over 5 synchronous iterations (the iterative-graph ranking kernel next to d08's connected components): driver loop builds 5 join+aggregate rounds — one node-keyed shuffle each, no mid-iteration collect — with damping in exact integer micro-units (17/20 rational, floor division) so any partitioning yields the identical value lattice; oracle = the same rounds as template-generated unrolled CTEs, so the loop and the SQL cannot drift"),

    // ------------------------------------------------------------------
    // q95: MAX INTERSECTIONS — peak interval concurrency per group
    // (ClickHouse `maxIntersections` / `maxIntersectionsPosition`): the
    // ops question "how many sessions were open at once, and when?".
    // Each event opens a half-open interval [ts, ts + 10 s + ⌊value·50⌋ s);
    // the kernel is the sweep line: every interval contributes (+1 at
    // start, −1 at end), deltas are PRE-AGGREGATED per (group, instant)
    // — a partial-aggregable shuffle that collapses ties so the running
    // sum is ORDER-INDEPENDENT at equal instants (ends and starts at the
    // same t net out, exactly the half-open contract) — then one
    // per-group cumulative sum finds the peak and row_number picks its
    // FIRST instant. Scale shape: the only per-row work is two
    // projections (no interval explosion — an interval of any length is
    // still 2 points); the window partitions by event_type, so each
    // group sorts independently — the ClickHouse aggregate's
    // sort-inside-group, never a global order. Instants are exact
    // integer epoch-micros (unix_micros ≡ DuckDB epoch_us), durations
    // exact integer seconds from one shared ⌊value·50⌋ — no float
    // arithmetic reaches the comparison lattice.
    QueryDef(
      "q95_max_intersections",
      (s, dir) => {
        import s.implicits._
        val iv = Tables.events(s, dir)
          .select($"event_type", unix_micros($"ts").as("st"),
            (unix_micros($"ts") +
              (lit(10L) + expr("CAST(floor(value * 50) AS BIGINT)"))
                * 1000000L).as("en"))
        val pts = iv.select($"event_type", $"st".as("t"), lit(1L).as("d"))
          .unionByName(iv.select($"event_type", $"en".as("t"),
            lit(-1L).as("d")))
          .groupBy($"event_type", $"t").agg(sum($"d").as("delta"))
        val wRun = Window.partitionBy($"event_type").orderBy($"t".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPeak = Window.partitionBy($"event_type")
          .orderBy($"open".desc, $"t".asc)
        pts.withColumn("open", sum($"delta").over(wRun))
          .withColumn("rk", row_number().over(wPeak))
          .filter($"rk" === 1)
          .select($"event_type", $"open".as("max_concurrent"),
            $"t".as("peak_t_us"))
          .orderBy($"event_type")
      },
      Some("""
        WITH iv AS (
          SELECT event_type, epoch_us(ts) AS st,
                 epoch_us(ts)
                   + (10 + CAST(floor(value * 50) AS BIGINT)) * 1000000 AS en
          FROM events),
        pts AS (
          SELECT event_type, t, SUM(d) AS delta FROM (
            SELECT event_type, st AS t, 1 AS d FROM iv
            UNION ALL
            SELECT event_type, en AS t, -1 AS d FROM iv) u
          GROUP BY event_type, t),
        run AS (
          SELECT event_type, t,
                 SUM(delta) OVER (PARTITION BY event_type ORDER BY t ASC
                                  ROWS UNBOUNDED PRECEDING) AS open
          FROM pts)
        SELECT event_type, CAST(open AS BIGINT) AS max_concurrent,
               t AS peak_t_us
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY open DESC, t ASC) AS rk
              FROM run) x
        WHERE rk = 1
        ORDER BY event_type"""),
      doc = "max interval intersections (ClickHouse maxIntersections/maxIntersectionsPosition): sweep-line peak concurrency — ±1 deltas pre-aggregated per (group, instant) so equal-instant ties collapse order-independently, one per-group cumulative window, first-peak instant via row_number; intervals never explode (any length = 2 points), groups sort independently, all arithmetic exact integer micros"),

    // ------------------------------------------------------------------
    // q96: RETENTION cohort analysis (the ClickHouse `retention(cond1,
    // …, condN)` aggregate): of the users active in week 0 (the cohort
    // anchor), how many came back in weeks 1/2/3? ClickHouse semantics
    // exactly: r_i = cond_0 AND cond_i — a user retained in week 2 but
    // absent in week 0 counts nowhere. Shape: the week index is one
    // map-side integer division off a broadcast corpus-min timestamp,
    // per-user flags are ONE partial-aggregable groupBy(user) of
    // max(when) bits (the retention array), and the report is a second
    // tiny aggregate over 150 flag rows — at 100 TB the heavy shuffle
    // is the user groupBy, which partial-aggregates to one bit-vector
    // per user per partition before exchanging. Rates are
    // integer-over-integer divisions rounded to 6, identical in both
    // engines.
    QueryDef(
      "q96_retention",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val t0 = ev.agg(min(unix_micros($"ts")).as("t0"))
        val flags = ev.crossJoin(broadcast(t0))
          .select($"user_id",
            expr("(unix_micros(ts) - t0) div 604800000000").as("wk"))
          .groupBy($"user_id")
          .agg(max(when($"wk" === 0, 1L).otherwise(0L)).as("w0"),
            max(when($"wk" === 1, 1L).otherwise(0L)).as("w1"),
            max(when($"wk" === 2, 1L).otherwise(0L)).as("w2"),
            max(when($"wk" === 3, 1L).otherwise(0L)).as("w3"))
        flags.agg(
          sum($"w0").as("cohort"),
          sum($"w0" * $"w1").as("ret_w1"),
          sum($"w0" * $"w2").as("ret_w2"),
          sum($"w0" * $"w3").as("ret_w3"))
          .select($"cohort", $"ret_w1", $"ret_w2", $"ret_w3",
            round($"ret_w1".cast("double") / $"cohort", 6).as("rate_w1"),
            round($"ret_w2".cast("double") / $"cohort", 6).as("rate_w2"),
            round($"ret_w3".cast("double") / $"cohort", 6).as("rate_w3"))
      },
      Some("""
        WITH t0 AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
        flags AS (
          SELECT user_id,
                 MAX(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS w0,
                 MAX(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS w1,
                 MAX(CASE WHEN wk = 2 THEN 1 ELSE 0 END) AS w2,
                 MAX(CASE WHEN wk = 3 THEN 1 ELSE 0 END) AS w3
          FROM (SELECT user_id,
                       (epoch_us(ts) - t0.t0) // 604800000000 AS wk
                FROM events CROSS JOIN t0) e
          GROUP BY user_id)
        SELECT CAST(SUM(w0) AS BIGINT) AS cohort,
               CAST(SUM(w0 * w1) AS BIGINT) AS ret_w1,
               CAST(SUM(w0 * w2) AS BIGINT) AS ret_w2,
               CAST(SUM(w0 * w3) AS BIGINT) AS ret_w3,
               round(CAST(SUM(w0 * w1) AS DOUBLE) / SUM(w0), 6) AS rate_w1,
               round(CAST(SUM(w0 * w2) AS DOUBLE) / SUM(w0), 6) AS rate_w2,
               round(CAST(SUM(w0 * w3) AS DOUBLE) / SUM(w0), 6) AS rate_w3
        FROM flags"""),
      doc = "retention cohort analysis (ClickHouse retention aggregate): r_i = week-0 activity AND week-i activity per user — week index from a broadcast corpus-min anchor, per-user flag bits in one partial-aggregable groupBy, cohort/return counts and 6-digit rates from a second tiny aggregate; the only corpus-sized shuffle partial-aggregates to one bit-vector per user per partition"),

    // ------------------------------------------------------------------
    // q97: LOG-BUCKET QUANTILE SKETCH (the DDSketch family, Masson et
    // al. VLDB 2019, at γ=2) — the QUANTILE member of the mergeable-
    // sketch suite after HLL distinct counts (q77/q79), count-min point
    // frequencies (q81), and SpaceSaving heavy hitters (q92): per
    // group, a histogram over buckets ⌊log₂(v)⌋ answers any quantile
    // with RELATIVE-error bracket [2^b, 2^(b+1)) in O(64) state —
    // mergeable by plain addition (bucket counts sum), so ANY partition
    // or merge order gives the identical sketch, unlike q92's
    // order-dependent summaries. The bucket index is computed WITHOUT
    // libm — length(bin(v)) − 1, the bit length of the positive
    // integer, identical in both engines — so the whole query is
    // integer/string exact. The audit follows the q92 discipline:
    // targets p50/p90/p99 at exact rank ⌈p·n/100⌉, the sketch's answer
    // bucket = first bucket whose cumulative count reaches the rank,
    // and the EXACT rank-r value (the expensive full-sort answer the
    // sketch replaces) must fall inside the bucket's bracket —
    // required per row in both engines. At 100 TB the sketch side is
    // one partial-aggregable ≤64-counter histogram per group; the
    // exact side exists only as this audit.
    QueryDef(
      "q97_log_bucket_quantiles",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir).select($"event_type",
          expr("CAST(floor(value * 100) AS BIGINT) + 1").as("cents"))
        val hist = ev
          .withColumn("bucket", (length(expr("bin(cents)")) - 1).cast("long"))
          .groupBy($"event_type", $"bucket").agg(count(lit(1)).as("cnt"))
        val tot = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
        val targets = tot.select($"event_type", $"n",
            explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
          .withColumn("r", expr("(p * n + 99) div 100"))
        val wCum = Window.partitionBy($"event_type").orderBy($"bucket".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum($"cnt").over(wCum))
        val wPick = Window.partitionBy($"event_type", $"p")
          .orderBy($"bucket".asc)
        val picked = cum.join(broadcast(targets), Seq("event_type"))
          .filter($"cum" >= $"r")
          .withColumn("rk", row_number().over(wPick)).filter($"rk" === 1)
          .select($"event_type", $"p", $"r", $"bucket",
            expr("shiftleft(1L, CAST(bucket AS INT))").as("lo"),
            expr("shiftleft(1L, CAST(bucket AS INT) + 1)").as("hi"))
        val wRank = Window.partitionBy($"event_type").orderBy($"cents".asc)
        val exact = ev.withColumn("rnk", row_number().over(wRank))
          .join(broadcast(targets.select($"event_type", $"p", $"r")),
            Seq("event_type"))
          .filter($"rnk" === $"r")
          .select($"event_type", $"p", $"cents".as("exact_q"))
        val out = picked.join(exact, Seq("event_type", "p"))
          .select($"event_type", $"p", $"r", $"bucket", $"lo", $"hi",
            $"exact_q", ($"lo" <= $"exact_q" && $"exact_q" < $"hi")
              .as("bracket_ok"))
          .orderBy($"event_type", $"p")
          // cached so the require's execution (which includes the
          // corpus-linear exact-rank audit leg) is not paid twice —
          // the q93/d40 double-execution lesson; persist keeps the
          // lineage visible to the PlanSpec locks
          .persist()
        require(out.filter(!$"bracket_ok").isEmpty,
          "log-bucket sketch bracket violated — the γ=2 guarantee broke")
        out
      },
      Some("""
        WITH ev AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) + 1 AS cents
          FROM events),
        hist AS (
          SELECT event_type, CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket,
                 COUNT(*) AS cnt
          FROM ev GROUP BY 1, 2),
        tot AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY 1),
        targets AS (
          SELECT event_type, n, p, (p * n + 99) // 100 AS r
          FROM tot, (SELECT unnest([50, 90, 99]) AS p)),
        cum AS (
          SELECT event_type, bucket,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket ASC
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM hist),
        picked AS (
          SELECT event_type, p, r, bucket,
                 CAST(1 << bucket AS BIGINT) AS lo,
                 CAST(1 << (bucket + 1) AS BIGINT) AS hi
          FROM (SELECT c.event_type, t.p, t.r, c.bucket,
                       ROW_NUMBER() OVER (PARTITION BY c.event_type, t.p
                                          ORDER BY c.bucket ASC) AS rk
                FROM cum c JOIN targets t ON t.event_type = c.event_type
                WHERE c.cum >= t.r) x
          WHERE rk = 1),
        ranked AS (
          SELECT event_type, cents,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents ASC) AS rnk
          FROM ev),
        exact AS (
          SELECT rk.event_type, t.p, rk.cents AS exact_q
          FROM ranked rk JOIN targets t
            ON t.event_type = rk.event_type AND rk.rnk = t.r)
        SELECT pk.event_type, CAST(pk.p AS BIGINT) AS p, pk.r, pk.bucket,
               pk.lo, pk.hi, e.exact_q,
               pk.lo <= e.exact_q AND e.exact_q < pk.hi AS bracket_ok
        FROM picked pk JOIN exact e
          ON e.event_type = pk.event_type AND e.p = pk.p
        ORDER BY pk.event_type, p"""),
      doc = "log-bucket quantile sketch (DDSketch family at γ=2): per-group ⌊log₂⌋ histogram answers any quantile with a [2^b, 2^(b+1)) relative-error bracket in O(64) mergeable-by-addition state (order-independent, unlike SpaceSaving) — bucket index via integer bit length, no libm; audited q92-style against the exact rank-⌈p·n/100⌉ value, the bracket required per row in both engines"),

    // ------------------------------------------------------------------
    // q98: TRIANGLE COUNTING with DEGREE ORIENTATION (Ortmann/Brandes;
    // the MapReduce form is Suri & Vassilvitskii WWW 2011) — the third
    // graph kernel after connected components (d08) and PageRank (q94),
    // and the one whose naive form explodes: counting wedges from every
    // node costs Σ deg² — a single celebrity hub with 10⁷ followers
    // yields 10¹⁴ wedges. The fix IS the operator: orient every edge
    // from lower to higher (degree, id), enumerate wedges only at each
    // edge's LOW endpoint, and close them with a semi join against the
    // oriented edge set. Orientation bounds out-degree by O(√m), so
    // Σ outdeg² is minimized over all orientations — hubs become SINKS
    // that generate no wedges, the d03 hot-bucket discipline applied to
    // graphs. Every count is exact integer; the output row carries BOTH
    // the oriented count and the brute-force 3-way self-join count
    // (cheap on this 100-node demo graph), their equality being the
    // correctness theorem — required in-body and mirrored in the
    // oracle. Shape at 100 TB: degree = one node-keyed aggregate,
    // orientation a broadcast-join projection, wedges one shuffle on
    // the low endpoint, closure one semi-join shuffle on (x, y) — no
    // node ever enumerates its full neighborhood².
    QueryDef(
      "q98_triangle_count",
      (s, dir) => {
        import s.implicits._
        val raw = Tables.events(s, dir)
          .filter($"event_id" % 7 === 0)
          .select(least($"user_id" % 100, ($"event_id" * 31) % 100).as("a"),
            greatest($"user_id" % 100, ($"event_id" * 31) % 100).as("b"))
          .filter($"a" =!= $"b").distinct()
        // cached: the require executes the full count (including the
        // brute-force audit join); the caller's run then hits the 1-row
        // cache instead of re-joining — the q93/d40 lesson
        val out = triangleCount(raw).persist()
        require(out.filter(!$"counts_match").isEmpty,
          "degree-oriented triangle count diverged from brute force")
        out
      },
      Some("""
        WITH raw AS (
          SELECT DISTINCT
                 LEAST(user_id % 100, (event_id * 31) % 100) AS a,
                 GREATEST(user_id % 100, (event_id * 31) % 100) AS b
          FROM events
          WHERE event_id % 7 = 0
            AND user_id % 100 <> (event_id * 31) % 100),
        deg AS (SELECT n, COUNT(*) AS d FROM (
                  SELECT a AS n FROM raw UNION ALL SELECT b FROM raw)
                GROUP BY n),
        ori AS (SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
                       CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v,
                       CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d
                         END AS dv
                FROM raw JOIN deg da ON da.n = a JOIN deg db ON db.n = b),
        wedges AS (SELECT e1.u, e1.v AS x, e2.v AS y
                   FROM ori e1 JOIN ori e2 ON e1.u = e2.u
                   WHERE (e1.dv, e1.v) < (e2.dv, e2.v)),
        tri AS (SELECT COUNT(*) AS t FROM wedges w
                WHERE EXISTS (SELECT 1 FROM ori e
                              WHERE e.u = w.x AND e.v = w.y)),
        brute AS (SELECT COUNT(*) AS t
                  FROM raw e1 JOIN raw e2 ON e2.a = e1.b
                  WHERE EXISTS (SELECT 1 FROM raw e3
                                WHERE e3.a = e1.a AND e3.b = e2.b))
        SELECT (SELECT COUNT(*) FROM raw) AS n_edges,
               (SELECT COUNT(*) FROM wedges) AS n_wedges,
               (SELECT t FROM tri) AS n_triangles,
               (SELECT t FROM brute) AS n_triangles_brute,
               (SELECT t FROM tri) = (SELECT t FROM brute) AS counts_match"""),
      doc = "triangle counting with degree orientation (Ortmann/Brandes; Suri-Vassilvitskii MapReduce form): edges oriented low→high (degree, id) so wedges enumerate only at low endpoints — Σ outdeg² minimized, out-degree O(√m), hubs become sinks generating no wedges (the hot-bucket discipline for graphs); wedges one low-endpoint shuffle, closure one (x,y) semi join, exact integers; oriented count ≡ brute-force 3-way join required in-body and mirrored in the oracle"),

    // ------------------------------------------------------------------
    // q99: TIME-SERIES GAP FILLING (ClickHouse `ORDER BY ts WITH FILL
    // STEP 1 DAY INTERPOLATE` / PostgreSQL generate_series + LOCF) —
    // the dashboard contract every time-series UI assumes: a dense axis
    // with explicit zeros where nothing happened and carried-forward
    // values between observations. A raw groupBy emits only days WITH
    // data; this operator builds the dense day SPINE per group
    // (sequence over the group's [min, max] — an in-row array explode
    // of a BOUNDED range, never a cross join against a calendar
    // table), left-joins the sparse aggregate back, fills counts with
    // ZERO (additive metric) and interpolates the daily mean-cents
    // gauge by LOCF (the q48 idiom riding the same per-group order).
    // The filled-day flag makes the synthetic rows auditable. Shape at
    // 100 TB: the sparse aggregate is the only corpus-sized shuffle
    // (partial-aggregable); the spine is O(groups × days); the join is
    // spine-sized on (group, day).
    QueryDef(
      "q99_gap_fill_series",
      (s, dir) => {
        import s.implicits._
        // the outage plant: drop every (type, day) cell where
        // (day-of-month + |type|) ≡ 0 mod 3 — structural holes that
        // survive ANY data density or replication factor (an organic
        // gap fixture fills in as SF grows); the spine bounds come from
        // the UNFILTERED feed, so leading/trailing holes exist too
        val raw = Tables.events(s, dir)
          .select($"event_type", to_date($"ts").as("d"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        val ev = raw
          .filter((dayofmonth($"d") + length($"event_type")) % 3 =!= 0)
        val sparse = ev.groupBy($"event_type", $"d")
          .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
        val spine = raw.groupBy($"event_type")
          .agg(min($"d").as("d0"), max($"d").as("d1"))
          .select($"event_type",
            explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
        val w = Window.partitionBy($"event_type").orderBy($"d".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val out = spine.join(sparse, Seq("event_type", "d"), "left")
          .select($"event_type", $"d",
            coalesce($"n", lit(0L)).as("n"),
            $"n".isNull.as("filled"),
            coalesce($"cents", lit(0L)).as("cents"),
            last(
              when($"n".isNotNull, expr("cents div n")), ignoreNulls = true)
              .over(w).as("locf_mean_cents"))
          .orderBy($"event_type", $"d")
          // cached so the vacuousness probe does not re-run the sparse
          // aggregate for the caller — the q93/d40 lesson
          .persist()
        require(out.filter($"filled").limit(1).count() > 0,
          "gap-fill fixture vacuous: no hole to fill")
        out
      },
      Some("""
        WITH raw AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events),
        ev AS (
          SELECT * FROM raw
          WHERE (day(d) + length(event_type)) % 3 <> 0),
        sparse AS (
          SELECT event_type, d, COUNT(*) AS n,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM ev GROUP BY 1, 2),
        spine AS (
          SELECT event_type, CAST(gs.g AS DATE) AS d
          FROM (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
                FROM raw GROUP BY 1) b,
               UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS gs(g))
        SELECT sp.event_type, sp.d,
               COALESCE(s.n, 0) AS n,
               s.n IS NULL AS filled,
               COALESCE(s.cents, 0) AS cents,
               LAST_VALUE(CASE WHEN s.n IS NOT NULL THEN s.cents // s.n END
                          IGNORE NULLS)
                 OVER (PARTITION BY sp.event_type ORDER BY sp.d ASC
                       ROWS UNBOUNDED PRECEDING) AS locf_mean_cents
        FROM spine sp LEFT JOIN sparse s
          ON s.event_type = sp.event_type AND s.d = sp.d
        ORDER BY sp.event_type, sp.d"""),
      doc = "time-series gap filling (ClickHouse WITH FILL ... INTERPOLATE): dense per-group day spine from an in-row bounded sequence explode (never a calendar cross join), sparse aggregate left-joined back, additive counts filled ZERO and the mean-cents gauge carried forward by LOCF on the same per-group order, filled rows flagged for audit; the only corpus-sized shuffle is the partial-aggregable sparse aggregate"),

    // ------------------------------------------------------------------
    // q100: sequenceNextNode — the last member of ClickHouse's ordered-
    // pattern battery after windowFunnel (q54), sequenceCount (q62) and
    // gap-constrained sequenceMatch (q86): for each user, find the FIRST
    // place the chain view→click occurs as ADJACENT events in the
    // (ts, event_id)-ordered timeline (sequenceNextNode's events must be
    // consecutive — the semantic that separates it from sequenceMatch's
    // subsequence scan) and return the event-type of the NEXT event
    // after the matched chain ('(none)' when the chain ends the timeline
    // or never occurs). This is the funnel-exploration primitive ("what
    // do users do right after view→click?") — ClickHouse's
    // sequenceNextNode('forward', 'first_match').
    //
    // Shape: q86's exactly — ONE user-partitioned shuffle building the
    // sorted per-user event-type array (bounded by per-user event count,
    // the sessionization contract), then the match is an in-row scan:
    // filter(sequence(...)) finds every adjacent-chain position,
    // array_min takes the FIRST, element_at captures the successor. No
    // join, no window, nothing but (user, bounded type list) crosses
    // the wire. The oracle spells the IDENTICAL list scan in DuckDB
    // (1-based on both sides; range(1, len) exclusive end == sequence(1,
    // size-1) inclusive), so both engines run one fold, not two
    // different algorithms.
    QueryDef(
      "q100_sequence_next_node",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(expr(
            """transform(sort_array(collect_list(
                 struct(ts, event_id, event_type))), e -> e.event_type)""")
            .as("types"))
          // size >= 2 guard: Spark's sequence(1, 0) DESCENDS (yielding
          // index 0, which element_at rejects) where DuckDB's
          // range(1, 1) is empty — the guard makes both sides scan
          // nothing on sub-2-event users
          .withColumn("idx", expr(
            """CASE WHEN size(types) >= 2 THEN
                 array_min(filter(sequence(1, size(types) - 1),
                   i -> element_at(types, i) = 'view'
                        AND element_at(types, CAST(i + 1 AS INT)) = 'click'))
               END"""))
          .select($"user_id",
            $"idx".isNotNull.as("matched"),
            expr("""coalesce(CASE WHEN idx IS NOT NULL
                                   AND idx + 2 <= size(types)
                              THEN element_at(types, CAST(idx + 2 AS INT))
                              END, '(none)')""").as("next_node"))
          .orderBy($"user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id,
                 list(event_type ORDER BY ts, event_id) AS types
          FROM events GROUP BY user_id),
        m AS (
          SELECT user_id, types,
                 list_min(list_filter(range(1, len(types)), i ->
                   types[i] = 'view' AND types[i + 1] = 'click')) AS idx
          FROM ev)
        SELECT user_id, idx IS NOT NULL AS matched,
               COALESCE(CASE WHEN idx IS NOT NULL AND idx + 2 <= len(types)
                             THEN types[idx + 2] END, '(none)') AS next_node
        FROM m ORDER BY user_id"""),
      doc = "sequenceNextNode('forward','first_match'): the event AFTER the first adjacent view->click chain per user — one user-partitioned shuffle, in-row first-match scan + successor capture, no join/window; completes the ordered-pattern battery (windowFunnel q54, sequenceCount q62, gap sequenceMatch q86)"),

    // ------------------------------------------------------------------
    // q101: DICTIONARY FUNCTIONS — ClickHouse's external-dictionary
    // lookup surface (dictGet / dictGetOrDefault / dictGetHierarchy /
    // dictIsIn, docs/sql-reference/functions/ext-dict-functions), the
    // one commonly-hit ClickHouse lookup family the battery lacked
    // (VERDICT r12 next #3). The dictionary is nation ∪ synthetic
    // region nodes (key 100+r_regionkey, parent 0 = ClickHouse's
    // hierarchy terminator) — a parent-keyed dimension exactly like a
    // CH `hierarchical` dict.
    //   Spark mapping, per lookup class:
    //   - dictGet / dictGetOrDefault → a broadcast MAP LITERAL probed
    //     with element_at (absent key → NULL here, so coalesce IS the
    //     OrDefault semantics). The dict is driver-loaded once like
    //     ClickHouse loads it into every server's RAM — a bounded
    //     dimension read, not a corpus collect.
    //   - dictGetHierarchy / dictIsIn → BOUNDED ITERATIVE SELF-JOIN
    //     against the broadcast dimension (the q65 fixpoint shape,
    //     driver-composed like q94): each level joins the ≤|keys| chain
    //     frontier to the dict and stops at parent 0; maxDepth caps the
    //     loop the way CH caps hierarchy depth. dictIsIn(child, anc) =
    //     membership of anc in the child's chain.
    //   Scale: fact side shuffles ONCE (the groupBy on c_nationkey);
    //   every dict probe is a broadcast join or a literal-map
    //   element_at — nothing dictionary-sized ever shuffles. Oracle:
    //   recursive CTE over the same parent-keyed dict.
    QueryDef(
      "q101_dict_functions",
      (s, dir) => {
        import s.implicits._
        val dict = Tables.load(s, dir, "nation")
          .select($"n_nationkey".as("k"), $"n_name".as("name"),
            ($"n_regionkey" + 100L).as("parent"))
          .unionByName(Tables.load(s, dir, "region")
            .select(($"r_regionkey" + 100L).as("k"), $"r_name".as("name"),
              lit(0L).as("parent")))
        // flat/hashed dict → broadcast map literal (bounded dimension;
        // the 30-row collect is the CH dictionary-load analog)
        val entries = dict.select($"k", $"name")
          .as[(Long, String)].collect().toMap
        val nameMap = typedLit(entries)
        val facts = Tables.load(s, dir, "customer")
          .groupBy($"c_nationkey".as("k"))
          .agg(count(lit(1)).as("n_customers"))
        // dictGetHierarchy: bounded iterative self-join, parent links
        // followed until the 0 terminator (depth ≤ 4 — CH's own
        // hierarchies are shallow by doc'd convention)
        var chain = facts.select($"k", $"k".as("node"), lit(0).as("depth"))
        for (d <- 1 to 4) {
          val step = chain.filter($"depth" === d - 1)
            .join(broadcast(dict.select($"k".as("node"), $"parent")), "node")
            .filter($"parent" =!= 0L)
            .select($"k", $"parent".as("node"), lit(d).as("depth"))
          chain = chain.unionByName(step)
        }
        val hier = chain.groupBy($"k")
          .agg(expr("""array_join(transform(
                 array_sort(collect_list(struct(depth, node))),
                 s -> CAST(s.node AS STRING)), ',')""").as("hier"),
            expr("exists(collect_list(node), n -> n = 102)").as("in_asia"))
        facts
          .withColumn("dict_name", element_at(nameMap, $"k"))
          // dictGetOrDefault: the +11 probe misses for k >= 14 (keys
          // 25..35 are absent) — both hit and miss paths exercised
          .withColumn("shifted_name",
            coalesce(element_at(nameMap, $"k" + 11L), lit("N/A")))
          .join(broadcast(hier), "k")
          .select($"k", $"dict_name", $"shifted_name", $"hier",
            $"in_asia", $"n_customers")
          .orderBy($"k")
      },
      Some("""
        WITH RECURSIVE dict AS (
          SELECT n_nationkey AS k, n_name AS name,
                 n_regionkey + 100 AS parent
          FROM nation
          UNION ALL
          SELECT r_regionkey + 100, r_name, 0 FROM region),
        facts AS (SELECT c_nationkey AS k, COUNT(*) AS n_customers
                  FROM customer GROUP BY 1),
        chain(k, node, depth) AS (
          SELECT k, k, 0 FROM facts
          UNION ALL
          SELECT ch.k, d.parent, ch.depth + 1
          FROM chain ch JOIN dict d ON d.k = ch.node
          WHERE d.parent <> 0 AND ch.depth < 4),
        hier AS (
          SELECT k,
                 string_agg(CAST(node AS VARCHAR), ','
                   ORDER BY depth, node) AS hier,
                 bool_or(node = 102) AS in_asia
          FROM chain GROUP BY k)
        SELECT f.k, d.name AS dict_name,
               COALESCE(d2.name, 'N/A') AS shifted_name,
               h.hier, h.in_asia, f.n_customers
        FROM facts f
        JOIN dict d ON d.k = f.k
        LEFT JOIN dict d2 ON d2.k = f.k + 11
        JOIN hier h ON h.k = f.k
        ORDER BY f.k"""),
      doc = "ClickHouse dictionary functions (dictGet/dictGetOrDefault/dictGetHierarchy/dictIsIn): flat lookups as a broadcast map literal probed by element_at (NULL-on-absent = the OrDefault semantics), hierarchy walk as a bounded iterative self-join over the parent-keyed dimension with the parent=0 terminator, dictIsIn as chain membership; the fact side shuffles once, dictionary probes never shuffle"),

    // ------------------------------------------------------------------
    // q103: BITMAP AGGREGATE FAMILY — ClickHouse's roaring-bitmap
    // surface (groupBitmap / bitmapCardinality / bitmapAnd/Or/Xor/
    // AndnotCardinality / bitmapContains, docs/sql-reference/functions/
    // bitmap-functions; VERDICT r13 next #8). Spark-first mapping: a
    // bitmap is a SORTED DISTINCT INT ARRAY built by collect_set —
    // partial-aggregable (ObjectHashAggregate combines map-side, only
    // per-group distinct sets cross the wire), with the value domain
    // BUCKETED to id % 1024 so every in-row bitmap is provably bounded
    // (the NDV-cap discipline: CH compresses unbounded UInt32 sets
    // with roaring; an in-row array analog must cap its domain
    // instead — same reason d05 caps hot shingles). Set algebra runs
    // IN-ROW on the 5-row grouped result (array_intersect/union —
    // zero shuffles beyond the one groupBy), pairs via a broadcast
    // self-join of the 5-row bitmap table; xor/andnot derive from
    // |A∪B| and |A∩B| by inclusion-exclusion in exact integers.
    QueryDef(
      "q103_bitmap_aggregates",
      (s, dir) => {
        import s.implicits._
        val bm = Tables.load(s, dir, "orders")
          .groupBy($"o_orderpriority".as("prio"))
          .agg(array_sort(collect_set(($"o_custkey" % 1024L).cast("int")))
            .as("bm"))
        val a = bm.select($"prio".as("prio_a"), $"bm".as("bma"))
        val b = bm.select($"prio".as("prio_b"), $"bm".as("bmb"))
        a.join(broadcast(b), $"prio_a" < $"prio_b")
          .select($"prio_a", $"prio_b",
            size($"bma").cast("long").as("card_a"),
            size($"bmb").cast("long").as("card_b"),
            size(array_intersect($"bma", $"bmb")).cast("long")
              .as("and_card"),
            size(array_union($"bma", $"bmb")).cast("long").as("or_card"),
            (size(array_union($"bma", $"bmb"))
              - size(array_intersect($"bma", $"bmb"))).cast("long")
              .as("xor_card"),
            (size($"bma") - size(array_intersect($"bma", $"bmb")))
              .cast("long").as("andnot_card"),
            array_contains($"bma", 42).as("contains_42"))
          .orderBy($"prio_a", $"prio_b")
      },
      Some("""
        WITH bm AS (
          SELECT o_orderpriority AS prio,
                 list_sort(list_distinct(
                   list(CAST(o_custkey % 1024 AS INTEGER)))) AS bm
          FROM orders GROUP BY 1)
        SELECT a.prio AS prio_a, b.prio AS prio_b,
               CAST(len(a.bm) AS BIGINT) AS card_a,
               CAST(len(b.bm) AS BIGINT) AS card_b,
               CAST(len(list_intersect(a.bm, b.bm)) AS BIGINT) AS and_card,
               CAST(len(list_distinct(a.bm || b.bm)) AS BIGINT) AS or_card,
               CAST(len(list_distinct(a.bm || b.bm))
                    - len(list_intersect(a.bm, b.bm)) AS BIGINT) AS xor_card,
               CAST(len(a.bm) - len(list_intersect(a.bm, b.bm)) AS BIGINT)
                 AS andnot_card,
               list_contains(a.bm, 42) AS contains_42
        FROM bm a JOIN bm b ON a.prio < b.prio
        ORDER BY prio_a, prio_b"""),
      doc = "ClickHouse bitmap aggregate family (groupBitmap, bitmapAnd/Or/Xor/AndnotCardinality, bitmapContains): bitmaps as sorted distinct int arrays built by partial-aggregable collect_set over a 1024-bucketed id domain (the NDV-cap discipline — in-row arrays must bound their domain where roaring compresses), set algebra in-row on the 5-row grouped result with pairs via a broadcast self-join, xor/andnot by inclusion-exclusion in exact integers")
  )

  /** q98's degree-oriented triangle counter over a canonical undirected
    * edge set (columns `a < b`, distinct): orient low→high (degree, id),
    * enumerate wedges at low endpoints, close with a semi join; the
    * output row carries the oriented count next to the brute-force
    * 3-way-join count (their equality is the correctness theorem).
    * Exposed for the OperatorSpec hand-computed graph check.
    */
  def triangleCount(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val deg = raw.select(col("a").as("n"))
      .unionAll(raw.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val low = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val ori = raw
      .join(broadcast(deg.select(col("n").as("a"), col("d").as("da"))), "a")
      .join(broadcast(deg.select(col("n").as("b"), col("d").as("db"))), "b")
      .select(when(low, col("a")).otherwise(col("b")).as("u"),
        when(low, col("b")).otherwise(col("a")).as("v"),
        when(low, col("db")).otherwise(col("da")).as("dv"))
    val e1 = ori.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = ori.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .filter((col("dx") < col("dy")) ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("u"), col("x"), col("y"))
    val nE = raw.agg(count(lit(1)).as("n_edges"))
    val nW = wedges.agg(count(lit(1)).as("n_wedges"))
    val nT = wedges
      .join(ori.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val b1 = raw.select(col("a").as("p"), col("b").as("q"))
    val b2 = raw.select(col("a").as("q"), col("b").as("r"))
    val b3 = raw.select(col("a").as("p"), col("b").as("r"))
    val nB = b1.join(b2, Seq("q")).join(b3, Seq("p", "r"), "left_semi")
      .agg(count(lit(1)).as("n_triangles_brute"))
    nE.crossJoin(broadcast(nW)).crossJoin(broadcast(nT))
      .crossJoin(broadcast(nB))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        col("n_triangles_brute"),
        (col("n_triangles") === col("n_triangles_brute")).as("counts_match"))
  }

  /** q94's synchronous integer PageRank: rank in micro-units, damping
    * 17/20 with floor division, base 150 000, start 1 000 000; node set
    * = edge endpoints. Exposed for the OperatorSpec hand-computed check.
    */
  def pageRank(edges: org.apache.spark.sql.DataFrame,
      iters: Int): org.apache.spark.sql.DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("(r * 17) div (20 * deg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("cin"), lit(0L))).as("r"))
    }
    ranks
  }
}
