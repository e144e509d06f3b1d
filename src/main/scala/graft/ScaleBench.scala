package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve harness (VERDICT r7 #1 / r8 punch #3): measures how the
  * heavy operator chains behave at 10× and 100× the sf0.1 corpus, the
  * evidence that the banded/bucketed designs are actually near-linear and
  * not just asserted to be. Results are recorded in BASELINE.md.
  *
  * Derived corpora are SEEDED REPLICATION, not noise: each replica is a
  * deterministic transform of the base corpus chosen so the base's LOCAL
  * structure (near-dup clusters, embedding geometry, per-user event
  * series, key moduli) is preserved within a replica while replicas stay
  * disjoint — weak scaling, the cluster-relevant regime:
  *  - documents: every token gets a per-replica suffix, so shingle/minhash
  *    buckets never span replicas (a verbatim copy would turn every doc
  *    into an m-way exact clone and measure the hot-bucket pathology
  *    instead of throughput);
  *  - embeddings: circular component rotation per replica — norms and
  *    within-replica inner products are exactly preserved, cross-replica
  *    vectors decorrelate;
  *  - events/orders/lineitem: id-shift by a multiple of 10^10 (preserves
  *    the `% 10`-style moduli queries rely on), timestamps untouched.
  *
  * Usage: `sbt "runMain graft.ScaleBench"` — env knobs:
  *   SPARK_GRAFT_SF_DIR    base corpus (default /root/testdata/sf0.1)
  *   SCALE_MULTIPLIERS     default "1,10,100"
  *   SCALE_QUERIES         default: the r8-verdict heavy-chain list
  *   SCALE_WORK_DIR        default /tmp/graft_scale
  * Prints one JSON line per (query, multiplier) and a final summary.
  */
object ScaleBench {
  val defaultQueries: Seq[String] = Seq(
    "d03_lsh_candidate_pairs", "d06_embedding_neardup", "d08_dedup_clusters",
    "d09_dedup_survivors", "d16_semantic_dedup", "d19_index_backed_dedup",
    "d20_streaming_dedup", "s14_ivf_stored_index", "s15_ivf_incremental_append",
    "dx12_replacing_merge", "dx14_summing_merge", "d29_substring_spans",
    "c14_span_scrubbed_export", "t25_bpe_encode", "c15_pack_manifest",
    "s19_mmr_diversified", "d32_minhash_estimator_audit",
    "c18_incremental_funnel", "m14_audio_perceptual_dedup",
    "c17_dedup_provenance", "d35_stored_label_lifecycle",
    "s24_ivf_stored_multiprobe", "d36_subscribed_label_maintenance",
    // round-10 additions with their own sweep history (BASELINE sweeps
    // #2-#5): keep them in the default list so regressions surface
    "m17_video_perceptual_dedup", "s26_pq_stored_codes",
    "s27_ivfpq_stored_serving", "s28_ivfpq_recall",
    "c19_expectations_quarantine", "m07_perceptual_neardup",
    "q50_small_qty_revenue_fused",
    // fixed query set over a growing corpus — the weak-scaling shape a
    // retrieval serving path must hold (legs are corpus-linear scans +
    // group-limited top-k; fusion is O(queries))
    "s29_hybrid_rrf", "s30_nprobe_sweep",
    "s31_ivf_batch_serving", "t29_hashing_vectorizer", "c20_dp_release",
    "s32_hybrid_stored_serving", "s33_hybrid_recall_audit",
    "dx30_set_skip_index", "q79_overlap_sketch",
    "m18_mp3_metadata_sniff", "q80_uniq_upto",
    "q81_countmin_frequency", "q82_weighted_sample", "q83_max_intersections",
    "q84_bucketed_colocated_join", "q85_m4_downsample",
    "d37_weighted_jaccard_rerank",
    // per-user in-row folds (one shuffle, DP never crosses the wire) and
    // the compressed-signature audit riding the shared router
    "q86_sequence_match_gap", "q87_exp_moving_avg",
    "d38_bbit_minhash_audit", "d39_oph_minhash_audit",
    "q88_welch_ttest",
    // round-11 additions: the MV lifecycle (VERDICT r10 punch #6 — its
    // served-read bound is also asserted in-body), the deltaSum
    // aggregate vs its window predecessor, the watermark-drop ledger,
    // the unigram encode fold, and the JPEG sniff (render-bound like
    // m12). dx32 is deliberately NOT swept: its fixed 16-doc parts are
    // sized to the demo corpus's 31-token vocabulary (prune power =
    // token rarity × docs/part), so replication just multiplies tiny
    // files; its scale mechanism — the one-pass distributed sidecar
    // build — is exercised at sf0.1's 313 parts every bench run
    "dx31_materialized_view", "q89_delta_sum_aggregate",
    "q90_watermark_drop_shadow", "t30_unigram_tokenizer",
    "m19_jpeg_exif_sniff",
    // round-11 continuation: SAMPLE BY pruning (layout + stats-prune
    // fraction must hold at any part count), the sketch-state MV (the
    // dx31 shape with HLL states), SpaceSaving (fixed 16-counter state
    // against a 100x key universe IS the claim), CDC chunk dedup
    // (map + one co-partitioned join), audio framing (render-bound,
    // map-parallel like m19/m12)
    "dx35_sample_by_pruning", "dx36_sketch_state_view",
    "q92_topk_spacesaving", "d40_cdc_chunk_dedup",
    "m20_audio_frame_features", "m21_image_resize",
    // filtered serving: fixed query set over the growing stored index
    // (the s31 shape with the metadata conjunct)
    "s34_filtered_ann_serving",
    // spatial cell equijoin (replication co-locates replicas: output is
    // quadratic by construction - the row measures pair throughput) and
    // the bounded-graph iterative rounds
    "q93_grid_radius_join", "q94_pagerank",
    // chunk-store lifecycle: one let-bound md5 pass per batch, fp-keyed
    // anti-join against the stored fingerprints
    "d41_cdc_chunk_store",
    // per-scene keyframe sampler: render-bound decode + bounded per-video
    // list pass
    "m22_scene_cut_keyframes",
    // retention family: the column-blank TTL lifecycle (O(expired parts))
    "dx37_ttl_column_default",
    // round-11 batch 2: the sweep line (2 points per interval, per-group
    // cumulative window), the retention flag bits (one user groupBy),
    // the matryoshka funnel (fixed query set over a growing corpus — the
    // s29 shape), the greedy encode fold (map-only like t30), and the
    // tiering lifecycle (O(expired parts) like dx37). c22 is deliberately
    // NOT swept: replication multiplies every equivalence class by m, so
    // at x10 the sub-k classes the fixture requires vanish (suppression
    // is a property of the base corpus's tail, not of throughput); its
    // scale shape — one partial-aggregable histogram — is PlanSpec-locked
    "q95_max_intersections", "q96_retention", "s35_matryoshka_rerank",
    "t31_wordpiece_tokenizer", "dx38_ttl_move_cold_volume",
    // the mergeable-histogram sketch (bounded state per group at any n)
    // and the SNM linkage (O(n·w) candidates, one per-shard sort)
    "q97_log_bucket_quantiles", "d42_sorted_neighborhood",
    // fixed 100-node graph under replication (like q94): the row
    // measures the edge-dedup + wedge pipeline, not graph growth
    "q98_triangle_count",
    // in-row bigrams + Zipf-bounded unigram joins (replica token
    // suffixes keep pair vocabularies replica-local), and the
    // render-bound ID3 walk (map-parallel like m18/m19)
    "t32_collocations", "m23_id3_frame_walk",
    // dense-spine gap fill (structural holes survive any density) and
    // the array-bloom lifecycle (O(parts), day-tag prune power)
    "q99_gap_fill_series", "dx39_array_bloom_skip_index",
    // fixed query over the growing corpus; group-limited coarse rank
    "s36_matryoshka_width_curve",
    // store build + prefix-pruned coarse scan + semi-joined re-rank
    "s37_stored_prefix_serving",
    // round-12: the next-node fold (q86's one-shuffle in-row shape),
    // the trained classifier (4 gradient epochs, each one
    // partial-aggregated pass — linear per epoch), the byte-BPE encode
    // (map-only like t25), the WARC walk + crawl funnel (render-bound
    // map-parallel archives; funnel shuffles ids/md5s only)
    "q100_sequence_next_node", "t33_trained_quality_classifier",
    "t34_byte_bpe_encode", "m24_warc_record_walk", "c23_crawl_to_curated",
    // graph-ANN pair: the build's banded pairs are bucket-capped at 256
    // members (SimilarityQueries.beamCap), so from x10 up the
    // edge-scoring work is BOUNDED (~4.2M candidate pairs measured at
    // x10, flat to x100 — the cap IS the scale story); serving stays
    // ~100 exact scores per query at every multiplier
    "s38_graph_beam_search", "s39_graph_beam_recall",
    // two-layer descent: the upper layer's build is 1/8 the base's work
    // (same cap bound), serving adds 2 bounded rounds
    "s40_hnsw_layered_descent",
    // round-13: insert cost must stay FLAT while the corpus grows (the
    // weak-scaling claim: beams are ~150 scores + bounded recaps at any
    // size; only the one-time base build is corpus-bound); the filtered
    // beam pair rides the shared store like s39; the trained media
    // classifier is render-linear (one decode pass + 4 partial-agg
    // epochs); the box walk is render-bound map-parallel like m24; the
    // retrieval loop composes already-swept cores
    "s41_hnsw_incremental_insert", "s42_filtered_graph_beam",
    "s43_filtered_beam_recall", "m25_trained_media_classifier",
    "m26_mp4_box_walk", "c24_crawl_index_serve", "q101_dict_functions",
    // round-14: bulk ingest must stay FLAT like s41 (frozen beams are
    // ~B·150 bounded scores, the merge <= B·M·(M+1) rows at any corpus
    // size; only the one-time base build is corpus-bound)
    "s44_hnsw_bulk_ingest")

  // multiple of the id moduli queries PLANT structure on (10, 20, 100,
  // 1000): each replica reproduces the base's planted structure exactly
  // (m14's re-encode plant deliberately uses % 100, which divides this
  // shift — a % 60 plant would vanish in replicas where 40·r % 60 ≠ 0).
  // NOT a multiple of 3 or 7 (10^10 ≡ 1 mod 3, ≡ 4 mod 7): the swept
  // queries that key on those moduli (q92's % 3/% 5 hot keys, d40/d41's
  // doc_id % 7 subset, q94's % 7 edges) only SELECT uniform subsets —
  // replicas pick different but equally-sized subsets, which is fine —
  // but a future chain that PLANTS per-id structure on a % 3/% 7 key
  // must either use a divisor of this shift or extend it.
  private val idShift = 10000000000L

  /** Replicate one table `m`× with the per-table transform; m == 1 is a
    * passthrough of the base file (no rewrite, scans stay comparable). */
  private def replicate(spark: SparkSession, baseDir: String, outDir: String,
      name: String, m: Int): Unit = {
    // the (rotation × one flip pattern) family yields 2·dim distinct
    // embedding transforms — enough for ×128 at dim 64; larger sweeps
    // need more flip patterns
    require(m <= 128, s"replication supports m <= 128, got $m")
    val base = Tables.load(spark, baseDir, name)
    val out = s"$outDir/$name.parquet"
    // derived corpora are deterministic in (base, m): reuse an existing
    // build unless SCALE_REBUILD=1 (a full x100 rewrite is ~5 min)
    if (new java.io.File(out).isDirectory &&
        !sys.env.get("SCALE_REBUILD").contains("1")) return
    val reps = base.crossJoin(
      spark.range(m).select(col("id").cast("long").as("__r")))
    val derived: DataFrame = name match {
      case "documents" => reps.select(
        (col("doc_id") + col("__r") * idShift).as("doc_id"),
        when(col("__r") === 0, col("text")).otherwise(array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit("~"), col("__r"))), " ")).as("text"),
        col("lang"), col("source"),
        // per-replica duration offset: m14's audio fingerprints derive
        // (n, p) from n_chars, so verbatim replication would hash every
        // replica's assets into the BASE replica's clusters — ×100 then
        // measures one giant hot-key groupBy instead of cluster growth
        (col("n_chars") + col("__r")).as("n_chars"))
      case "embeddings" => reps
        // rotation alone collides once r exceeds the dimensionality
        // (round 9's first ×100 corpus silently duplicated replicas
        // 64..99 of the 64-dim vectors — d16 then correctly reported
        // 72k extra cross-replica dups); compose with an odd-component
        // sign flip per rotation cycle: sign flips preserve norms and
        // within-replica inner products (both vectors flip the same
        // components), so replica geometry is still exactly the base's
        .withColumn("__s", (col("__r") % size(col("embedding"))).cast("int"))
        .withColumn("__f", (col("__r") / size(col("embedding"))).cast("int"))
        .select(
          (col("vec_id") + col("__r") * idShift).as("vec_id"),
          expr("""transform(
              CASE WHEN __s = 0 THEN embedding
                   ELSE concat(slice(embedding, __s + 1, size(embedding) - __s),
                               slice(embedding, 1, __s)) END,
              (x, i) -> CASE WHEN __f > 0 AND pmod(i, 2) = 1
                             THEN -x ELSE x END)""").as("embedding"),
          col("label"))
      case "events" => reps.select(
        (col("event_id") + col("__r") * idShift).as("event_id"), col("ts"),
        (col("user_id") + col("__r") * idShift).as("user_id"),
        col("event_type"), col("value"), col("props"))
      case "orders" => reps.select(
        (col("o_orderkey") + col("__r") * idShift).as("o_orderkey") +:
          base.columns.filter(_ != "o_orderkey").map(col).toIndexedSeq: _*)
      case "lineitem" => reps.select(
        (col("l_orderkey") + col("__r") * idShift).as("l_orderkey") +:
          base.columns.filter(_ != "l_orderkey").map(col).toIndexedSeq: _*)
      case "customer" => reps.select(
        // d31's linkage corpus: keep the TPC-H name shape (18 chars,
        // 'Customer#' + 9 digits) but salt the last-4-digit window —
        // d31's blocking key is substring(c_name, 15, 4), so the salt
        // keeps blocks replica-local; char 10 (the dirty-plant edit
        // site) is untouched, so the planted lev-1 structure
        // reproduces in every replica. idShift mod 17 = 2, so the
        // % 17 plant density survives the key shift too.
        Seq((col("c_custkey") + col("__r") * idShift).as("c_custkey"),
          concat(substring(col("c_name"), 1, 14),
            lpad(pmod(expr("CAST(substring(c_name, 15, 4) AS BIGINT)")
              + col("__r") * 7919L, lit(10000L)).cast("string"), 4, "0"))
            .as("c_name")) ++
          base.columns.filterNot(Set("c_custkey", "c_name"))
            .map(col).toIndexedSeq: _*)
      case _ => base // small dims: unreplicated
    }
    // 32 output files so the derived scan parallelizes like the base one
    derived.repartition(32).write.mode("overwrite").parquet(out)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SCALE_WORK_DIR", "/tmp/graft_scale")
    val mults = sys.env.getOrElse("SCALE_MULTIPLIERS", "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val queries = sys.env.get("SCALE_QUERIES")
      .map(_.split(',').map(_.trim).toSeq).getOrElse(defaultQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Long, Double)]()
    mults.foreach { m =>
      val dir = if (m == 1) baseDir else {
        val d = s"$workDir/m$m"
        Tables.all.foreach(t => replicate(spark, baseDir, d, t, m))
        d
      }
      val nDocs = Tables.load(spark, dir, "documents").count()
      queries.foreach { q =>
        graft.operators.DedupQueries.clearLabelsCache()
        // Bench's scratch-cleanup discipline: without it, localCheckpoint
        // blocks and cached relations from earlier chains inflate the
        // ×100 tail 2-4× (d03 measured 60.2 s mid-sweep vs 13.8 s fresh)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        val n = try SparkEntry.queries(q)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[scale] $q x$m failed: ${e.getMessage}"); -1L
        }
        val s = (System.nanoTime() - t0) / 1e9
        rows += ((q, m, n, s))
        println(f"""{"query":"$q","mult":$m,"docs":$nDocs,"out_rows":$n,"seconds":$s%.2f}""")
      }
    }
    println("\n== scaling summary (seconds; linear ⇒ ~mult× the x1 time) ==")
    val byQ = rows.groupBy(_._1)
    queries.foreach { q =>
      val r = byQ.getOrElse(q, Seq.empty).sortBy(_._2)
      val cells = r.map { case (_, m, n, s) => f"x$m=$s%.1fs($n rows)" }
      println(f"$q%-28s ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
