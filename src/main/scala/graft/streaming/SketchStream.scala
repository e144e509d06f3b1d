package graft.streaming

import graft.storage.SketchView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sketch-state MV ingest — dx36's AggregatingMergeTree
  * lifecycle driven by a `foreachBatch` stream (the MV-side sibling of
  * `AnnStream.AnnIngest`): each micro-batch lands raw in the base table
  * AND as one (count, HLL state) row per touched (date, key) in the view
  * table, both under the micro-batch id as the txn id. This is the
  * streaming unique-visitors tier: user ids are register-hashed once at
  * INGEST; dashboard reads merge O(keys × batches) stored states and
  * never rescan the base, however long the stream has been running.
  *
  * Delivery semantics: `SketchView.insert` is the self-healing
  * txn-idempotent PAIR (each side no-ops independently on a seen txn),
  * so a foreachBatch retry after a crash between the two commits heals
  * exactly the missing side — StreamingSpec drives that path. Because
  * HLL union is register-wise max (associative + commutative), ANY
  * micro-batching of the stream yields the same merged registers as a
  * one-shot batch build: stream-built ≡ batch-built, asserted in-spec.
  */
class SketchIngest(mv: SketchView) {

  def addBatch(rows: DataFrame, batchId: Long): (Boolean, Boolean) =
    mv.insert(rows, batchId)

  /** Wire a keyed event stream into the base + sketch-view pair. */
  def start(rows: DataFrame, checkpoint: String): StreamingQuery =
    rows.writeStream
      .foreachBatch((df: DataFrame, id: Long) => { addBatch(df, id); () })
      .option("checkpointLocation", checkpoint)
      .start()
}
