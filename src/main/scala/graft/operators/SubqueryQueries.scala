package graft.operators

import graft.{QueryDef, Tables}

/** Subquery shapes (SURVEY.md §2.D joins/aggregations rows, widened to
  * the TPC-H-style decision-support surface the star schema implies):
  * correlated scalar subqueries, uncorrelated scalar subqueries in
  * HAVING-style predicates, EXISTS / NOT EXISTS correlation, and
  * correlated LATERAL joins.
  *
  * These run through `spark.sql` on purpose — the point is exercising
  * Catalyst's subquery machinery (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery → left-semi/anti joins, DecorrelateInnerQuery
  * for LATERAL) rather than hand-decorrelating into joins ourselves. At
  * scale each decorrelated form is a shuffle-partitioned aggregate +
  * join, which is exactly the plan a hand-written version would produce.
  *
  * Determinism: all threshold comparisons are exact — quantities and
  * prices go through DECIMAL casts and the avg comparison is cross-
  * multiplied (qty·2·count < sum) so no float rounding can flip a
  * boundary row in either engine (see QueryDef determinism contract).
  */
object SubqueryQueries {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String,
      text: String) = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q35: TPC-H Q17 shape — small-quantity revenue per brand, where
    // "small" is relative to the part's own average quantity (correlated
    // scalar subqueries; the avg comparison is cross-multiplied so it is
    // exact decimal math on both engines).
    QueryDef(
      "q35_small_qty_revenue",
      (s, dir) => sql(s, dir, """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS small_qty_revenue,
               COUNT(*) AS n
        FROM lineitem l JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 *
                (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                 FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand"""),
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS small_qty_revenue,
               COUNT(*) AS n
        FROM lineitem l JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 *
                (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                 FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand"""),
      doc = "correlated scalar subqueries (Q17 shape, exact cross-multiplied avg)"),

    // ------------------------------------------------------------------
    // q36: TPC-H Q11 shape — nations whose supplier-side revenue exceeds
    // 5% of global revenue (uncorrelated scalar subquery as a HAVING
    // threshold; rev*20 > total is exact decimal).
    QueryDef(
      "q36_nation_revenue_share",
      (s, dir) => sql(s, dir, """
        WITH nrev AS (
          SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          GROUP BY n_name)
        SELECT n_name, CAST(rev AS DOUBLE) AS revenue
        FROM nrev
        WHERE rev * 20 > (SELECT SUM(rev) FROM nrev)
        ORDER BY n_name"""),
      Some("""
        WITH nrev AS (
          SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          GROUP BY n_name)
        SELECT n_name, CAST(rev AS DOUBLE) AS revenue
        FROM nrev
        WHERE rev * 20 > (SELECT SUM(rev) FROM nrev)
        ORDER BY n_name"""),
      doc = "uncorrelated scalar subquery threshold (Q11 shape)"),

    // ------------------------------------------------------------------
    // q37: TPC-H Q20 flavor — (part, supplier) pairs where one supplier
    // ships >10% of the part's total quantity: correlated scalar
    // subquery against a derived (grouped) outer table.
    QueryDef(
      "q37_dominant_supplier_parts",
      (s, dir) => sql(s, dir, """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
                 COUNT(*) AS n
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT l_partkey, l_suppkey, CAST(qty AS DOUBLE) AS qty, n
        FROM ps
        WHERE qty * 10 > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                          FROM lineitem l2 WHERE l2.l_partkey = ps.l_partkey)
        ORDER BY l_partkey, l_suppkey"""),
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
                 COUNT(*) AS n
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT l_partkey, l_suppkey, CAST(qty AS DOUBLE) AS qty, n
        FROM ps
        WHERE qty * 10 > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                          FROM lineitem l2 WHERE l2.l_partkey = ps.l_partkey)
        ORDER BY l_partkey, l_suppkey"""),
      doc = "correlated scalar subquery over a derived grouped table (Q20 flavor)"),

    // ------------------------------------------------------------------
    // q38: correlated LATERAL join — top-2 customers by balance per
    // nation (the per-group-top-k shape as a lateral subquery; ties on
    // balance broken by name for a total order).
    QueryDef(
      "q38_lateral_top_customers",
      (s, dir) => sql(s, dir, """
        SELECT n_name, c_name, c_acctbal
        FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) top2
        ORDER BY n_name, c_acctbal DESC, c_name"""),
      Some("""
        SELECT n_name, c_name, c_acctbal
        FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) top2
        ORDER BY n_name, c_acctbal DESC, c_name"""),
      doc = "correlated LATERAL join with per-group ORDER BY/LIMIT"),

    // ------------------------------------------------------------------
    // q39: EXISTS + NOT EXISTS correlation — active customers none of
    // whose orders exceed 400k, counted per market segment (plans as a
    // left-semi join stacked on a left-anti join).
    QueryDef(
      "q39_quiet_active_customers",
      (s, dir) => sql(s, dir, """
        SELECT c_mktsegment, COUNT(*) AS n_quiet
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_quiet
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      doc = "EXISTS / NOT EXISTS correlation → semi + anti join"),

    // ------------------------------------------------------------------
    // q40: correlated scalar subquery in the SELECT list — richest
    // BUILDING-segment customer balance per nation; nations without such
    // customers surface NULL (MAX of an empty correlated group).
    QueryDef(
      "q40_nation_max_building_bal",
      (s, dir) => sql(s, dir, """
        SELECT n_name,
               (SELECT MAX(c_acctbal) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey
                  AND c.c_mktsegment = 'BUILDING') AS max_building_bal
        FROM nation n
        ORDER BY n_name"""),
      Some("""
        SELECT n_name,
               (SELECT MAX(c_acctbal) FROM customer c
                WHERE c.c_nationkey = n.n_nationkey
                  AND c.c_mktsegment = 'BUILDING') AS max_building_bal
        FROM nation n
        ORDER BY n_name"""),
      doc = "correlated scalar subquery in SELECT list (NULL on empty group)"),

    // ------------------------------------------------------------------
    // q47: NOT IN three-valued logic — the classic subquery trap. One
    // probe list carries a NULL (every 100th custkey nulled): NOT IN
    // against it can never be TRUE, so that branch counts 0; the
    // null-filtered branch behaves like a plain anti join. Both counted
    // side by side from the same orders scan.
    QueryDef(
      "q47_not_in_null_semantics",
      (s, dir) => sql(s, dir, """
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN
             (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
              FROM customer)) AS n_with_null_probe,
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer WHERE c_custkey % 100 <> 0))
            AS n_filtered_probe"""),
      Some("""
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN
             (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END
              FROM customer)) AS n_with_null_probe,
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer WHERE c_custkey % 100 <> 0))
            AS n_filtered_probe"""),
      doc = "NOT IN null semantics: null-poisoned probe vs filtered anti join"),

    // ------------------------------------------------------------------
    // q50: the hand-fused form of q35 — same semantics, same oracle, but
    // the per-part count and sum come from ONE grouped aggregate joined
    // back, instead of two decorrelated subquery joins (Catalyst
    // decorrelates q35 correctly but plans three lineitem scans; this is
    // the shape to write at 100 TB). PlanSpec asserts the scan counts.
    QueryDef(
      "q50_small_qty_revenue_fused",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.DecimalType
        val li = graft.Tables.load(s, dir, "lineitem")
        val perPart = li.groupBy($"l_partkey".as("pk"))
          .agg(count(lit(1)).as("cnt"),
            sum($"l_quantity".cast(DecimalType(18, 2))).as("qty_sum"))
        // The per-part aggregate is bounded by |part| — a DIMENSION
        // cardinality, broadcastable exactly like the star-join dims.
        // Without the hint Catalyst sizes it from lineitem and plans a
        // sort-merge join whose FACT-side exchange writes all 60M rows
        // (the ×100 sweep measured 26 s; AQE converts the join at
        // runtime but the shuffle write is already paid). Broadcasting
        // keeps the fact side scan→filter→partial-agg with no row-level
        // exchange: 26 s → map-side only.
        li.join(broadcast(perPart), $"l_partkey" === $"pk")
          .join(graft.Tables.load(s, dir, "part"), $"p_partkey" === $"l_partkey")
          .filter($"l_quantity".cast(DecimalType(18, 2)) * 2 * $"cnt" < $"qty_sum")
          .groupBy($"p_brand")
          .agg(sum($"l_extendedprice".cast(DecimalType(18, 2))).cast("double")
            .as("small_qty_revenue"),
            count(lit(1)).as("n"))
          .orderBy($"p_brand")
      },
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS small_qty_revenue,
               COUNT(*) AS n
        FROM lineitem l JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 *
                (SELECT COUNT(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
              < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                 FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand"""),
      doc = "q35 hand-fused: one grouped aggregate + join (two scans, not three)")
  )
}
