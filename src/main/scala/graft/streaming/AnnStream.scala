package graft.streaming

import graft.operators.SimilarityQueries
import graft.storage.FactTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN index ingest — the s14/s15 stored-IVF lifecycle driven
  * by a `foreachBatch` stream (the similarity-side sibling of
  * `DedupStream.DedupIngest`): each micro-batch of `(vec_id, embedding)`
  * vectors is assigned to the FROZEN offline-trained centroids
  * (broadcast join, batch-only work — the indexed corpus is never
  * re-read, let alone re-clustered) and appended to the stored index
  * table. At 100 TB this is the embedding-ingest shape: per batch the
  * cost is |batch| × nlist codegen'd distances plus one columnar append;
  * searches keep probing the growing index concurrently (FactTable
  * readers see committed generations only).
  *
  * Delivery semantics: the append is txn-idempotent on the micro-batch
  * id (`FactTable.append`), so a foreachBatch retry of a committed batch
  * is a no-op; assignment depends only on the frozen centroids, never on
  * index state, so replays are trivially deterministic and no replay
  * shield is needed (contrast `DedupIngest`, whose decisions read the
  * index they grow). Any batching of the corpus therefore builds
  * byte-identical index content — the batch fold `s21` in the query
  * inventory is row-identical to this path, and StreamingSpec asserts
  * stream-built search ≡ s21 ≡ s14 one-shot build.
  */
class AnnIngest(centroids: DataFrame, idxT: FactTable) {

  private val indexDate = to_date(lit("2024-01-01"))

  def addBatch(vectors: DataFrame, batchId: Long): Unit =
    idxT.append(
      SimilarityQueries.assignToFrozen(
        centroids, vectors.select(col("vec_id"), col("embedding")))
        .withColumn("date", indexDate), batchId)

  /** Wire a `(vec_id, embedding)` stream into the stored index. */
  def start(vectors: DataFrame, checkpoint: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch((df: DataFrame, id: Long) => addBatch(df, id))
      .option("checkpointLocation", checkpoint)
      .start()
}
