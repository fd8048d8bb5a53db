package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plans of the scale-critical operators
  * to a markdown file — the audit trail for the "explain and iterate
  * until it's the plan you'd want" loop. Run:
  * `runMain graft.tools.PlanDump [sfDir] [outFile]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("docs/PLANS_r6.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = Seq(
      "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding",
      "dedup_components", "pipe_corpus_filter", "knn_bruteforce",
      "knn_lsh", "knn_centroid", "emb_quantize", "q05_multijoin",
      "mask_classified", "src_partitioned_prune", "q26_bucketed_join",
      "str_static_enrich", "pipe_interleave", "sql_surface",
      "cls_text_pii", "txt_vocab_stats",
      "pipe_pack_sequences", "q27_percentiles", "src_sheet_range",
      "q28_range_frame", "pipe_dataset_card",
      "q31_kmv_distinct", "cdc_incremental_snapshot", "txt_repetition",
      "src_avro_roundtrip", "emb_matryoshka", "cls_gini",
      "str_asof_exec", "pipe_curriculum", "mm_image_phash",
      "emb_pq", "src_avro_changelog",
      "dedup_containment", "q34_heavy_hitters", "knn_ivf_pq",
      "src_ebcdic_fixedwidth", "cdc_drift_dispatch", "knn_recall_audit",
      "emb_norm_audit", "mask_kanonymity", "txt_char_classes",
      "dedup_components_star", "dedup_keep_best", "pipe_split_leakage",
      "src_recfm_vb", "knn_filtered", "pipe_epoch_plan",
      "cdc_lag_audit", "dedup_incremental",
      "src_schema_evolution", "dedup_emb_sweep",
      "txt_boilerplate", "pipe_split_by_cluster",
      "src_warc_ingest", "pipe_url_canonical",
      "cdc_log_compact", "cls_functional_dep", "pipe_cross_source",
      "mask_text_scrub", "dedup_lines", "cdc_reconcile",
      "txt_html_strip", "dedup_bloom", "cls_outliers",
      "txt_vocab_coverage", "txt_readability",
      "pipe_domain_filter", "cls_inclusion_deps",
      "src_malformed_audit", "cdc_txn_assemble", "knn_graph",
      // r7: the three perf fixes + the round's new operators
      "txt_rarity", "q36_mad", "cdc_conflict_lww", "cls_corr",
      "cls_psi_drift", "mask_fpe_alpha", "str_retention",
      "str_transitions", "pipe_dataset_diff", "emb_drift",
      "knn_rerank", "txt_hapax", "txt_encoding_audit",
      "txt_novelty", "txt_bpe_pairs", "str_anomaly", "cls_datatype_infer",
      "emb_outliers", "src_multiline_csv", "src_gzip_text").distinct
    val w = new java.io.PrintWriter(out, "UTF-8")
    try {
      w.println("# PLANS - physical-plan audit")
      w.println()
      w.println(s"Executed (AQE-final) plans of the scale-critical operators at $sfDir.")
      w.println("What to look for: pair joins are LOGICALLY shuffle joins on blocking")
      w.println("keys - where a BroadcastHashJoin appears on a (band,sig)/(lang,bucket)/")
      w.println("cell key it is AQE's runtime choice because the compacted bucket table")
      w.println("measured only MBs at this SF; at corpus scale the same plan stays a")
      w.println("key-shuffle (no hint forces a broadcast; PlanSpec asserts no")
      w.println("nested-loop/cartesian pair joins). ReusedExchange nodes show the")
      w.println("self-join sides sharing ONE tokenization/signature pass. The only")
      w.println("intentional broadcasts are bounded tables: query vectors, K-row cell")
      w.println("seeds, the K^2 feasible-cell-pair list, and star-schema dims.")
      targets.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.toRdd.count() // finalize AQE
        w.println()
        w.println(s"## $name")
        w.println()
        w.println("```")
        w.println(df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head.trim)
        w.println("```")
      }
    } finally w.close()
    spark.stop()
  }
}
