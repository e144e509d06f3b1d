package graft.streaming

import graft.operators.DedupQueries
import graft.storage.FactTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-dup ingest filter against a PERSISTED MinHash index —
  * the d13/d19 incremental-dedup core driven by a `foreachBatch` stream:
  * each micro-batch of `(doc_id, text)` documents is deduped against the
  * stored band + shingle-set tables, the per-doc decisions land in a
  * decisions table, and only SURVIVORS' index rows are appended — so the
  * index grows with unique content, not ingest volume, and batch k+1
  * automatically dedups against everything batch 0..k kept. This is the
  * 100 TB crawl-ingest shape: the corpus is never re-read, per batch the
  * work is one broadcast of the batch's bands against the indexed corpus
  * (see `incrementalDedupFromIndex`) plus map-only signature computation
  * over the batch itself.
  *
  * Delivery semantics: all three table appends are txn-idempotent on the
  * micro-batch id (`FactTable.append`), so a foreachBatch retry of a
  * fully-committed batch is a no-op. The three commits are NOT one
  * transaction, so a crash between them can replay a batch whose
  * survivors are already indexed — the dedup view anti-joins the
  * CURRENT batch's doc_ids out of the index first, restoring the
  * pre-append state (a batch never dedups against itself; within-batch
  * dedup is the batch pass d01/d03/d08, run upstream if needed).
  * Decisions are therefore deterministic under replay, and the batch
  * fold `DedupQueries.sequentialDedupDecisions` (inventory row d20) is
  * row-identical to this path — StreamingSpec asserts it.
  */
class DedupIngest(bandsT: FactTable, setsT: FactTable,
    decisionsT: FactTable) {

  /** Index tables are single-partition by design (the band value is the
    * real clustering key, applied at compact() time — see d19).
    */
  private val indexDate = to_date(lit("2024-03-01"))

  def addBatch(docs: DataFrame, batchId: Long): Unit = {
    val batch = docs.select(col("doc_id"), col("text")).persist()
    try {
      val ids = batch.select(col("doc_id"))
      val dec0 =
        if (bandsT.snapshot().files.isEmpty)
          batch.select(col("doc_id").as("new_id"),
            lit(null).cast("long").as("dup_of"), lit(false).as("is_dup"))
        else {
          val oldBands = bandsT.read()
            .join(ids, Seq("doc_id"), "left_anti") // replay shield
            .select(col("doc_id").as("old_id"), col("band"), col("bval"))
          val oldSets = setsT.read()
            .join(ids, Seq("doc_id"), "left_anti")
            .select(col("doc_id").as("old_id"), col("so"))
          DedupQueries.incrementalDedupFromIndex(oldBands, oldSets, batch)
        }
      val dec = dec0.withColumn("batch", lit(batchId).cast("int")).persist()
      dec.count() // pin decisions BEFORE the index they read from mutates
      val survivors = batch.join(
        dec.filter(!col("is_dup")).select(col("new_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      bandsT.append(DedupQueries.bandIndexOf(survivors)
        .withColumn("date", indexDate), batchId)
      setsT.append(DedupQueries.shingleSetsOf(survivors)
        .withColumn("date", indexDate), batchId)
      decisionsT.append(dec.withColumn("date", indexDate), batchId)
      dec.unpersist()
    } finally batch.unpersist()
  }

  /** Wire a `(doc_id, text)` stream through the ingest filter. */
  def start(docs: DataFrame, checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch((df: DataFrame, id: Long) => addBatch(df, id))
      .option("checkpointLocation", checkpoint)
      .start()
}
