package graft

/** Every registered query runs at sf0.001 and produces a sane result;
  * the flagship entry produces rows (the driver's smoke check). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // pair-mining queries may legitimately be empty at the smallest SF
  private val mayBeEmpty = Set(
    "q14_anti_join_not_exists", "q21_dedup_minhash_lsh",
    "q23_dedup_ngram_jaccard", "q24_dedup_embedding_cosine",
    "q68_decontamination", "q74_semantic_dedup", "q165_minhash_fidelity")

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  // queries that deliberately crossJoin a BROADCAST one-row/k-row side
  // (query vectors, centroid tables, corpus-size literals, global
  // thresholds) — the only sanctioned nested-loop shape
  private val broadcastCrossJoins = Set(
    "q216_survival_life_table",
    "q25_knn_bruteforce", "q32_ivf_ann_topk", "q50_lsh_ann_topk",
    "q64_quality_threshold", "q72_time_decay", "q82_decile_binning",
    "q88_basket_lift", "q89_timeseries_similarity", "q102_int8_quantization",
    "q107_negative_sampling", "q111_cooccurrence_lift",
    "q112_range_partition_plan", "q115_event_funnel",
    "q116_rfm_segmentation", "q117_gini_concentration",
    "q118_source_drift_tv", "q119_chi_square_independence",
    "q120_ks_two_sample", "q122_vocab_coverage", "q124_target_encoding",
    "q133_join_blowup_audit", "q134_conversion_latency",
    "q135_dup_size_histogram", "q136_temperature_allocation",
    "q139_norm_outliers", "q145_oov_rate_by_cutoff", "q146_robust_outliers",
    "q147_reference_calibration", "q149_k_anonymity", "q151_dow_seasonality",
    "q152_gini_split_quality", "q153_churn_overdue", "q155_benford_audit",
    "q159_token_budget_plan", "q166_source_keyness", "q170_ivf_recall_sweep",
    "q172_dup_split_leakage", "q173_dim_truncation_recall",
    "q174_hybrid_rrf", "q175_recency_weights", "q189_rbo_rank_agreement",
    "q190_not_in_null_trap", "q224_rank_concordance",
    "q231_temporal_split_leakage")

  test("plan hygiene: no cartesian products, no unsanctioned nested loops") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — a scale-killer:\n${plan.take(1500)}")
      if (!broadcastCrossJoins(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unsanctioned BroadcastNestedLoopJoin:\n${plan.take(1500)}")
    }
  }
}
