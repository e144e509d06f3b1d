package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * A warmup query absorbs JVM/codegen/session start-up so per-query
  * numbers reflect steady-state plan execution; queries run in sorted
  * name order for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // test files are a few MB each — split them so scans parallelize
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // The ContextCleaner is GC-driven: broadcasts, shuffle files and
      // localCheckpoint blocks are only released when the driver GCs
      // their references. With a 48 GiB heap the JVM can go the WHOLE
      // bench without a collection (default periodicGC.interval is
      // 30 min), so ~370 query executions accumulate scratch state and
      // the heavy tail stalls on storage-memory eviction — measured 2-20×
      // per-query inflation in a full run whose queries are all fast in
      // isolation. 45 s keeps cleanup ahead of accumulation.
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + exercise codegen/shuffle machinery once
    val inputRows = Tables.all.map(t => Tables.load(spark, sfDir, t).count()).sum
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    // Separate buckets: the dx12-dx16 storage end-to-ends each write,
    // merge, and re-read a whole temp FactTable — 3-5 s of filesystem
    // work with ±30% run-to-run variance that would otherwise mask real
    // query-engine regressions in the aggregate.
    val storageE2e = Set("dx12_replacing_merge", "dx13_ttl_expiry",
      "dx14_summing_merge", "dx15_targeted_delete", "dx16_bloom_point_lookup",
      // s14/s15 run their offline index BUILD (clustering + FactTable
      // writes) inside the query body so the oracle can see the result;
      // the search itself is a sub-100ms bucket probe. d19/d20 likewise
      // build their persisted dedup index tables in-body.
      "s14_ivf_stored_index", "s15_ivf_incremental_append",
      "s21_streaming_ann_ingest",
      "d19_index_backed_dedup", "d20_streaming_dedup",
      // dx19 appends twice + deletes + reads three log versions of a
      // temp FactTable; q66 round-trips ORC and CSV sinks on disk
      "dx19_time_travel", "dx20_projection_rollup", "dx21_schema_evolution",
      "q66_format_roundtrip",
      // round-6 storage lifecycles: collapsing merge, deletion vectors,
      // quantile-state table, tombstoned IVF index — all build + rewrite
      // temp FactTables in-body
      "dx22_collapsing_merge", "dx23_deletion_vectors",
      "dx24_quantile_state_merge", "s18_ivf_tombstone_delete",
      "dx25_partition_backfill", "dx26_merge_upsert",
      // round-9: shallow clone builds source + clone FactTables in-body;
      // the change-data-feed lifecycle appends/compacts/deletes in-body
      "dx27_shallow_clone", "dx28_change_data_feed",
      "dx29_parts_introspection",
      // round-10 store lifecycles: s24 builds the same offline IVF index
      // as s14 before its multi-probe search; d35/d36/s25 write docs /
      // band / label / vector FactTables in-body so the rebuild-equality
      // oracles run through real stores
      "s24_ivf_stored_multiprobe", "d35_stored_label_lifecycle",
      "d36_subscribed_label_maintenance", "s25_subscribed_ann_maintenance",
      // round-10: the PQ-code store and the assembled IVF-PQ stack both
      // persist codes/codebook/centroid FactTables in-body before serving
      "s26_pq_stored_codes", "s27_ivfpq_stored_serving",
      // round-10: batch serving builds the same index + centroid stores
      // as s24 in-body before the batched probe; the assembled hybrid
      // stack (s32) builds them too for its dense leg
      "s31_ivf_batch_serving", "s32_hybrid_stored_serving",
      "s33_hybrid_recall_audit",
      // round-10: the set skip-index lifecycle writes + prunes a temp
      // FactTable in-body like dx16's bloom
      "dx30_set_skip_index",
      // round-10: the co-located join materializes BOTH fact tables
      // bucketed on the join key in-body (the one-time layout write the
      // query exists to amortize)
      "q84_bucketed_colocated_join",
      // round-10: the materialized-view lifecycle writes base + view
      // FactTables, replays a txn, and converges the view in-body
      "dx31_materialized_view",
      // round-11: the token/ngram-bloom lifecycles each append a
      // ~16-docs-per-part FactTable (hundreds of parts at sf0.1) + one
      // distributed sidecar-build pass in-body before the pruned read
      "dx32_token_bloom_skip_index", "dx33_ngram_bloom_skip_index",
      // round-11: the TTL-rollup lifecycle appends + compacts + rewrites
      // expired partitions of a temp FactTable in-body
      "dx34_ttl_rollup_downsample",
      // round-11 continuation: the SAMPLE BY layout writes a
      // range-clustered FactTable in-body; the sketch-state MV writes
      // base + view, replays a txn, and converges in-body; filtered
      // serving shares s31's corpus-keyed store build (first touch pays)
      "dx35_sample_by_pruning", "dx36_sketch_state_view",
      "s34_filtered_ann_serving",
      // round-11 continuation: the chunk-store lifecycle appends two
      // fingerprint batches + a replay to a temp FactTable in-body
      "d41_cdc_chunk_store",
      // round-11 continuation: the column-TTL lifecycle appends +
      // compacts + rewrites expired partitions in-body like dx34
      "dx37_ttl_column_default",
      // round-12: the k-NN-graph beam pair shares one corpus-keyed
      // graph-store build (banded pairs + top-M window + FactTable
      // write) — first touch pays it, the s31-s33 convention
      "s38_graph_beam_search", "s39_graph_beam_recall",
      // s40 reuses s38's base store and adds its own upper-layer build
      "s40_hnsw_layered_descent",
      // round-13: the insert path builds (or first-touches) the
      // s41_base store and re-caps against it; c24 builds its curated
      // IVF FactTable in-body before the one-bucket probe; the
      // filtered-beam pair serves from the shared s38 store and pays
      // its first touch in a bucket-split run (the s39 precedent)
      "s41_hnsw_incremental_insert", "c24_crawl_index_serve",
      "s42_filtered_graph_beam", "s43_filtered_beam_recall")
    // best-of-2 per query: damps scheduler/GC noise on a shared machine.
    // A query that fails BOTH runs reports -1.0 (never a fake timing).
    // dev-only: SPARK_GRAFT_BENCH_ONLY=q01,q02 restricts the query set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    // dev-only: SPARK_GRAFT_BENCH_BUCKET=storage|query restricts to one
    // bucket — the fresh-JVM-per-bucket control run that separates
    // machine-state drift from real regressions (BASELINE.md r11)
    val bucketOnly = sys.env.get("SPARK_GRAFT_BENCH_BUCKET")
    var sinceGc = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .filter { case (name, _) => bucketOnly.forall {
        case "storage" => storageE2e.contains(name)
        case "query" => !storageE2e.contains(name)
        case _ => true
      } }
      .map { case (name, fn) =>
      // untimed driver GC every 25 queries: releases dropped broadcast /
      // checkpoint / shuffle references so the ContextCleaner can reclaim
      // them NOW, instead of letting pressure build into a later query's
      // timing window (see periodicGC.interval note above)
      // Deterministic scratch cleanup BETWEEN queries (untimed): queries
      // that localCheckpoint (label propagation, IVF builds) leave their
      // blocks registered until the ContextCleaner GCs the reference —
      // across 190+ executions that storage-memory pressure inflates the
      // mid-run tail 2-3× (d05 measured 4.6 s fresh vs 11.5 s mid-run).
      // Dropping them eagerly keeps every query's timing independent of
      // how much ran before it; the periodic System.gc() then releases
      // broadcast/shuffle scratch the cleaner tracks by weak reference.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      sinceGc += 1
      if (sinceGc >= 15) { sinceGc = 0; System.gc() }
      val times = (1 to 2).flatMap { _ =>
        // d08/d09 memoize their label-propagation intermediate; clear it
        // so every timed run pays the full cost (otherwise run 2 of d08
        // and both runs of d09 skip the dominant stage and best-of-2
        // understates the query).
        graft.operators.DedupQueries.clearLabelsCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val qps = if (total > 0) results.size / total else 0.0
    val (stor, quer) = results.partition(r => storageE2e.contains(r._1))
    val storS = stor.map(_._2).sum
    val querS = quer.map(_._2).sum
    val extras = "\"input_rows\":" + inputRows +
      ",\"queries_per_s\":" + qps +
      ",\"storage_e2e_s\":" + storS + ",\"storage_e2e_n\":" + stor.size +
      ",\"query_s\":" + querS + ",\"query_n\":" + quer.size
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extras,"sf":"$sfDir"}""")
    spark.stop()
  }
}
