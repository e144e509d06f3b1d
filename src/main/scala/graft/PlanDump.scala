package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for the flagship queries into
  * PLANS.md — the human-readable record that each plan is the one the
  * scale design calls for (broadcasts where intended, pushdown reaching
  * the scan, partial aggregation, no stray sort-merge/cartesian paths).
  * PlanSpec asserts the same properties mechanically; this file is for
  * reading. Usage: runMain graft.PlanDump <sfDir> <outFile>
  */
object PlanDump {
  private val flagship = Seq(
    "q01_pricing_summary" -> "filter/column pushdown into the parquet scan, partial agg",
    "q05_local_supplier_volume" -> "star join: every dimension broadcast, fact never shuffles pre-join",
    "q12_top3_per_brand" -> "ranking window after a single shuffle on the partition key",
    "q28_salted_join" -> "skew-salted join: salt explode + 2-stage de-salt aggregation",
    "q41_band_join_windows" -> "band join rewritten to bucketized hash join (RangeBucketJoin rule)",
    "s01_cosine_topk" -> "brute-force baseline: broadcast query vector + TakeOrderedAndProject",
    "s07_hyperplane_lsh" -> "map-only signatures, broadcast band join, top-k re-rank",
    "s08_pq_adc" -> "PQ encode + ADC lookup: all-broadcast joins, one final shuffle",
    "t09_tfidf" -> "global-IDF join: partial-agg tf/df, 1-row corpus count broadcast",
    "d05_ngram_jaccard_pairs" -> "map-side shingle dedup, one shuffle per agg level, no self-join",
    "d10_decontaminate" -> "benchmark shingles broadcast; the corpus side never shuffles",
    "t11_repetition_metrics" -> "all metrics fold inside the row: zero shuffles before the sort",
    "q58_session_windows" -> "session assembly after one shuffle on the grouping key",
    "dx10_pruned_read" -> "log-stats file skipping before any footer is opened",
    "t14_boilerplate_ngrams" -> "one DF-count shuffle, hot-shingle set probes back as a broadcast",
    "c02_sequence_packing" -> "per-source window: one hash exchange, never a global sort",
    "q61_approx_topk" -> "sketch + exact counts both partial-agg; 1-row sketch broadcast",
    "s10_ann_recall" -> "exact + LSH legs joined; both stay broadcast/TakeOrdered shaped",
    "d13_incremental_dedup" -> "batch bands broadcast against the corpus index; corpus never self-pairs",
    "d14_paragraph_dedup" -> "first-occurrence min is a partial agg, not a window: hot paragraphs combine map-side",
    "t17_text_normalize" -> "codegen'd nfc_normalize keeps the whole pipeline in one map stage",
    "d15_containment_pairs" -> "inverted index + DF cap; containment scored inside capped posting lists",
    "c03_shard_export" -> "uniform md5 shard assignment; stats partial-agg before one exchange",
    "c04_corpus_diff" -> "full-outer over 16-byte fingerprints; bodies consumed map-side",
    "c08_training_order_shuffle" -> "epoch shuffle: sharded windows, never a single-partition row_number",
    "c09_token_budget_mixture" -> "budget take: groupBy reuses the window's source partitioning — one shuffle",
    "d20_streaming_dedup" -> "per-batch dedup vs stored index: batch bands broadcast, survivors-only growth",
    "d21_substring_window_dedup" -> "overlapping-window dedup: per-fingerprint partial agg, semi-join back, no windows",
    "d23_bloom_decontaminate" -> "codegen'd sketch probe filters the corpus before the exact confirm join",
    "q67_anomaly_shadow" -> "prefix-window exact moments: one keyed shuffle, integer sigma test",
    "c12_dataset_card" -> "one grouped pass: everything partial-aggregates but the exact median",
    "c10_perplexity_mixture" -> "LM scoring joins + language-partitioned tercile window, rollup partial-aggs",
    "d03_lsh_candidate_pairs" -> "adaptive pair router: capped in-row lane + salted hot lane in ONE plan, cartesian-free",
    "d07_simhash_near_pairs" -> "simhash bands through the same adaptive router; one signature materialization feeds all lanes",
    "m08_image_decode" -> "real-decode seam: map-only per-partition render+decode, no exchange before the output sort",
    "m09_split_decode" -> "non-solid real decode on the identical map-only seam: dHash edge + mixed luma",
    "d29_substring_spans" -> "substring span removal: join-free gram-window ownership, one explode, islands merge",
    "s19_mmr_diversified" -> "MMR: distributed TakeOrdered candidate head; greedy re-rank folds in-row, no re-join",
    "c15_pack_manifest" -> "window rollup reuses the packing window's source partitioning: one hash exchange total",
    "t26_script_profile" -> "per-script codepoint counts fully in-row; only the presentation sort exchanges",
    "d31_record_linkage" -> "record blocking through the adaptive router; keyed joins back, no cartesian",
    "q73_variant_shred" -> "variant parse + typed path extraction stay in one map stage before the grouped pass",
    "c14_span_scrubbed_export" -> "interval-complement scrub: merged spans join docs once, token rows never leave their row",
    "q75_pivot_event_matrix" -> "explicit-list pivot: ONE conditional-agg pass, no distinct-values pre-collect",
    "s22_range_search" -> "range search: broadcast probes, double prefilter map-side, decimal confirm on survivors",
    "t28_keyness_report" -> "keyness: token-key shuffle with map-side combine, global freq via token window, bounded head",
    "c18_incremental_funnel" -> "incremental funnel: metadata-union re-rank, old corpus contributes only its index",
    "d33_bag_of_words_dedup" -> "bag fingerprint: in-row sort_array, one 32-byte-key groupBy, no pair expansion",
    "m14_audio_perceptual_dedup" -> "audio near-dup: map-partition render+decode+fingerprint, one groupBy, assets never shuffle",
    "s24_ivf_stored_multiprobe" -> "stored multi-probe: centroid-table TakeOrdered probe selection, broadcast bucket probe, no Window",
    "d34_varlen_substring_spans" -> "variable-length spans: same join-free gram kernel as d29, boundary emission adds no exchange",
    "d35_stored_label_lifecycle" -> "stored labels: one-scan cold read + size rollup; maintenance merges only the changed-label delta",
    "m15_mp4_metadata_sniff" -> "MP4 sniff: dynamic box walk as native expressions, map-only before the output sort",
    "m17_video_perceptual_dedup" -> "video near-dup: map-partition render+decode, bounded per-asset frame groupBy, one fingerprint groupBy",
    "s26_pq_stored_codes" -> "stored PQ codes: serving is lookup-join + sum over the codes store, no Window, corpus vectors unread",
    "s27_ivfpq_stored_serving" -> "stored IVF-PQ serving: stats-pruned codes scan (probe filter skips non-probed files) + broadcast ADC lookup",
    "s28_ivfpq_recall" -> "IVF-PQ recall audit: exact truth leg + serving leg, misses attributed to pruning vs quantization",
    "c19_expectations_quarantine" -> "expectations gate: N rules as one bitmask projection over ONE fact scan, referential rule broadcast",
    "s29_hybrid_rrf" -> "hybrid RRF: broadcast query terms/df, per-leg WindowGroupLimit top-20, fusion join sees ≤20 rows per leg per query",
    "s32_hybrid_stored_serving" -> "assembled hybrid stack: BM25 leg + stored-IVF batch-served dense leg, integer RRF fusion over ≤20-row legs",
    "m18_mp3_metadata_sniff" -> "MP3 sniff: syncsafe sizes + sub-byte bit fields as native expressions, map-only before the output sort",
    "q81_countmin_frequency" -> "count-min: exploded hash rows partial-agg to ≤256 cells, probe joins the broadcast grid, min over rows",
    "q82_weighted_sample" -> "A-ES weighted sample: WindowGroupLimit keeps each partition's top-k before the source shuffle",
    "q83_max_intersections" -> "max intersections: (type,day)-partitioned sweep windows + carry prefix over the tiny day table",
    "q84_bucketed_colocated_join" -> "bucketed co-located join: merge join over bucket-aligned scans, zero exchanges below the join",
    "q86_sequence_match_gap" -> "gap-constrained sequence match: one user-key exchange, the DP folds in-row — no per-stage self-join, no window",
    "d38_bbit_minhash_audit" -> "b-bit MinHash audit: adaptive-router candidates, one feature projection per pair side, bit agreement and exact Jaccard fold in-row")

  /** `runMain graft.PlanDump <sfDir> counts:<q1,q2,...>` — the
    * duplicated-work detector: per-query occurrence counts of the heavy
    * expression kernels in the executed plan, for when a new entry
    * benches far off its structural twin (e.g. d38 vs d32).
    */
  private def dumpCounts(spark: SparkSession, sfDir: String,
      names: String): Unit =
    for (n <- names.split(",")) {
      val p = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(s"===== $n =====")
      for (k <- Seq("minhash_lanes", "lambdafunction", "md5", "Scan parquet"))
        println(s"  $k: " + k.r.findAllIn(p).size)
    }

  /** `runMain graft.PlanDump <sfDir> dir:<outDir>:<suffix>:<q1,q2,...>` —
    * write each named query's explain("formatted") to
    * `<outDir>/<name>_<suffix>.txt` (the optimization-round before/after
    * plan artifacts).
    */
  private def dumpDir(spark: SparkSession, sfDir: String,
      spec: String): Unit = {
    val Array(outDir, suffix, names) = spec.split(":", 3)
    new java.io.File(outDir).mkdirs()
    for (n <- names.split(",")) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (out.startsWith("counts:")) {
      dumpCounts(spark, sfDir, out.stripPrefix("counts:"))
      spark.stop(); return
    }
    if (out.startsWith("dir:")) {
      dumpDir(spark, sfDir, out.stripPrefix("dir:"))
      spark.stop(); return
    }
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the flagship queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` on `$sfDir`. Each plan is the\n")
    sb.append("shape the 100 TB design calls for; `PlanSpec` asserts the same\n")
    sb.append("properties mechanically on every test run.\n")
    flagship.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n_${why}_\n\n```\n$plan```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
