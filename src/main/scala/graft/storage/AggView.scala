package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Insert-maintained aggregating materialized view — the ClickHouse
  * `CREATE MATERIALIZED VIEW ... ENGINE = SummingMergeTree AS SELECT ...
  * GROUP BY` insert-trigger contract, re-expressed over two FactTables.
  * (The reference's tables.sql:30 uses plain MergeTree; the MV pattern is
  * how ClickHouse deployments of that schema serve their dashboards
  * without rescanning the fact table — the storage-surface family
  * dx12/dx14/dx20 re-express, completed here with the INSERT-time
  * trigger that neither merge-time rollups (dx14) nor part-local
  * projections (dx20) provide: a separate, independently-readable table
  * whose maintenance cost is amortized into ingest.)
  *
  * Mechanics: `insert` lands the raw batch in the base table AND the
  * batch's pre-aggregated delta (one row per (partition, key) touched by
  * the batch — bounded by the batch's key cardinality, never its row
  * count) in the view table, both under the SAME txn id. FactTable's
  * per-table txn markers make each append individually idempotent, which
  * makes the PAIR self-healing under the standard replay contract (the
  * dx08/streaming rule: an un-acked batch is replayed): if a writer dies
  * between the two commits, the replay no-ops on the table that already
  * carries the txn and commits on the one that does not — the view can
  * lag the base only while its batch is still in flight, never silently.
  *
  * Reads never touch the base: `readAggregate` re-sums the view's
  * partial rows at query time (the documented SummingMergeTree read rule
  * — "the sum may be partial until merges finish"), and a periodic
  * `view.summingCompact` collapses partials physically without changing
  * any answer. At 100 TB the dashboard query costs O(keys × un-merged
  * batches) view rows instead of a fact scan, and the view's exact-typed
  * sum columns (longs, never doubles) keep the re-sum deterministic
  * under any parallel aggregation order.
  */
class AggView(baseDir: String, viewDir: String, spark: SparkSession,
    keyCols: Seq[String], sumCols: Seq[String],
    partitionCol: String = "date") {

  val base = new FactTable(baseDir, spark)
  val view = new FactTable(viewDir, spark)

  private val groupCols = (partitionCol +: keyCols).map(col)

  /** The insert trigger: raw batch → base, pre-aggregated delta → view,
    * one txn id for both. Both appends run unconditionally — a replay
    * must be able to heal whichever side is missing the txn. Returns
    * (baseCommitted, viewCommitted); (false, false) = full no-op replay.
    */
  def insert(df: DataFrame, txnId: Long): (Boolean, Boolean) = {
    val delta = df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
    (base.append(df, txnId), view.append(delta, txnId))
  }

  /** Exact aggregate served FROM THE VIEW ONLY: re-sum the partial rows
    * (correct before, during, and after summingCompact convergence).
    */
  def readAggregate(): DataFrame =
    view.read().groupBy(groupCols: _*)
      .agg(sum(col("n")).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)

  /** Physically collapse the view's partial rows (the background merge);
    * answers are identical before and after — dx31 asserts it.
    */
  def converge(): Long =
    view.summingCompact(keyCols, "n" +: sumCols, partitionCol)
}

/** Insert-maintained SKETCH-STATE materialized view — the ClickHouse
  * `ENGINE = AggregatingMergeTree` + `uniqState(...)` / `uniqMerge(...)`
  * contract, the state-column generalization of [[AggView]]: where
  * SummingMergeTree's partials are ADDITIVE (longs that re-sum), a
  * distinct count is not — so the view stores each batch's mergeable
  * HLL sketch STATE (a binary column, Spark's Datasketches
  * `hll_sketch_agg`) per (partition, key), and reads re-MERGE the
  * states (`hll_union_agg` → register-wise max, associative and
  * commutative, so any batch split or merge order yields the same
  * registers) before estimating. This is the shape that makes per-day
  * unique-visitor dashboards O(keys × batches) at 100 TB: the base's
  * user ids are hashed into fixed-size registers at INGEST, and no read
  * ever re-scans them; physical convergence (`converge` →
  * `aggregatingCompact` with a sketch-union merge) collapses batch
  * states without changing any estimate.
  *
  * Same txn-pair lifecycle as [[AggView]]: base append + view append
  * under one txn id, individually idempotent, self-healing on replay.
  */
class SketchView(baseDir: String, viewDir: String, spark: SparkSession,
    keyCols: Seq[String], ndvCol: String,
    partitionCol: String = "date") {

  val base = new FactTable(baseDir, spark)
  val view = new FactTable(viewDir, spark)

  private val groupCols = (partitionCol +: keyCols).map(col)

  /** Insert trigger: raw batch → base; (count, HLL state) per touched
    * (partition, key) → view; one txn id for both.
    */
  def insert(df: DataFrame, txnId: Long): (Boolean, Boolean) = {
    val delta = df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(col(ndvCol)).as("ndv_state"))
    (base.append(df, txnId), view.append(delta, txnId))
  }

  /** Served aggregate FROM THE VIEW ONLY: exact row count (additive
    * longs) + NDV estimate from the union of the stored batch states —
    * correct before, during, and after physical convergence.
    */
  def readAggregate(): DataFrame =
    view.read().groupBy(groupCols: _*)
      .agg(sum(col("n")).as("n"),
        hll_sketch_estimate(hll_union_agg(col("ndv_state"))).as("uniq_est"))

  /** Physically collapse batch states (the AggregatingMergeTree
    * background merge): counts re-sum, sketch states re-union — both
    * merges of partials, so every served answer is unchanged (dx36
    * asserts it).
    */
  def converge(): Long =
    view.aggregatingCompact(keyCols,
      Seq(sum(col("n")).as("n"),
        hll_union_agg(col("ndv_state")).as("ndv_state")),
      partitionCol)
}
