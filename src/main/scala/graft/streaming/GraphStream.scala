package graft.streaming

import graft.operators.SimilarityQueries
import graft.storage.FactTable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming HNSW-graph ingest — the s44 bulk insert driven by a
  * `foreachBatch` stream (the graph-index sibling of `AnnIngest`; the
  * reference's scrape loop appends forever, mb8600.py:329-443, so the
  * graph family needs a live ingest path too). Each micro-batch of
  * `(vec_id, embedding)` vectors beam-searches the CURRENT graph view
  * as one batched job set and commits `bulkMergeDelta`'s changed rows
  * — each touched source's complete recapped edge list plus the new
  * nodes' out-edges, ≤ B·M·(M+1) rows — tagged with the micro-batch
  * id. The serving view is per-src LATEST-BATCH-WINS (the
  * ReplacingMergeTree shape, dx12): a later batch's re-cap of a source
  * supersedes every earlier version of that source's edges, so the
  * store is append-only while the graph is logically mutable. At
  * 100 TB that is exactly the MERGE-per-micro-batch a production
  * vector index commits; per batch the cost is O(R) bounded job waves
  * + one small append, corpus-size independent.
  *
  * Delivery semantics: both appends are txn-idempotent on the
  * micro-batch id (`FactTable.append`), so a foreachBatch retry of a
  * committed batch is a no-op at the store whatever the retry
  * recomputes. A crash BETWEEN the two appends replays the batch with
  * vectors already in `vecsT` — harmless without a shield, unlike
  * DedupIngest: beam candidates come only from the GRAPH's node set,
  * and the graph append did not commit, so the replayed beams read the
  * identical pre-batch graph and score the identical candidate ids;
  * the recomputed delta is deterministic and commits as if first time.
  * The registered batch fold `s49_graph_ingest_fold` is row-identical
  * to this path — StreamingSpec asserts it.
  */
class GraphIngest(graphT: FactTable, vecsT: FactTable,
    entries: Seq[Long]) {

  private val indexDate = to_date(lit("2024-01-01"))

  /** The current logical graph: per src, the edge rows of the latest
    * batch that wrote that src (earlier versions are superseded, never
    * rewritten — compact() folds them away, the dx12 lifecycle).
    */
  def graphView(): DataFrame = {
    val w = Window.partitionBy(col("src"))
    graphT.read()
      .withColumn("mb", max(col("batch")).over(w))
      .filter(col("batch") === col("mb"))
      .select(col("src"), col("dst"), col("gcos"))
  }

  def addBatch(vectors: DataFrame, batchId: Long): Unit = {
    val spark = vectors.sparkSession
    val batch = vectors.select(col("vec_id"), col("embedding")).persist()
    try {
      vecsT.append(batch.withColumn("date", indexDate), batchId)
      val queries = batch.select(col("vec_id").as("qid"),
        col("embedding").as("qv"))
      // score corpus = the vector store (self-contained: the ingest
      // never reads the test corpus table); the current batch's own
      // rows are present but unreachable — candidates come from graph
      // dsts only, and the batch is not in the graph yet
      val corpus = vecsT.read().select(col("vec_id"), col("embedding"))
      val delta = SimilarityQueries.bulkMergeDelta(
        spark, graphView(), corpus, queries, entries)
      graphT.append(delta
        .withColumn("batch", lit(batchId).cast("int"))
        .withColumn("date", indexDate), batchId)
    } finally batch.unpersist()
  }

  /** Wire a `(vec_id, embedding)` stream into the stored graph. */
  def start(vectors: DataFrame, checkpoint: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch((df: DataFrame, id: Long) => addBatch(df, id))
      .option("checkpointLocation", checkpoint)
      .start()
}
