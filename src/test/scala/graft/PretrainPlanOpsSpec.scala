package graft

import org.apache.spark.sql.functions._

/** Semantics of the pretraining-corpus planning operators (q476–q482)
  * beyond the oracle gate. */
class PretrainPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q476

  test("block dedup ledger: deletions conserve, rates consistent") {
    val rows = run("q476_block_dedup_ledger").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val blocks = r.getAs[Long]("n_blocks")
      val deleted = r.getAs[Long]("n_deleted")
      // keep-first is GLOBAL, so a late source may lose every block —
      // only the bounds and the rate identity are invariant per source
      assert(deleted >= 0L && deleted <= blocks)
      assert(r.getAs[Long]("chars_kept") >= 0L)
      assert(r.getAs[Long]("deleted_ppm") == deleted * 1000000L / blocks)
    }
    // corpus-wide: at least one duplicated block must exist at sf0.01
    // (the synthetic word streams repeat heavily)
    assert(rows.map(_.getAs[Long]("n_deleted")).sum > 0L)
  }

  // ---------------------------------------------------------------- q477

  test("BPE rounds: distinct merges, monotone compression, positive counts") {
    val rows = run("q477_bpe_merge_rounds").orderBy(col("round")).collect()
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L, 3L))
    val pairs = rows.map(_.getAs[String]("pair"))
    assert(pairs.distinct.length == 3, s"merges must differ: ${pairs.toSeq}")
    // each merge strictly shrinks the corpus symbol count
    val totals = rows.map(_.getAs[Long]("total_symbols_after"))
    assert(totals.sliding(2).forall { case Array(a, b) => b < a },
      s"not monotone: ${totals.toSeq}")
    assert(rows.forall(_.getAs[Long]("n") > 0L))
  }

  // ---------------------------------------------------------------- q478

  test("suffix loop census: period counts within doc counts") {
    val rows = run("q478_suffix_loop_census").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val loops = r.getAs[Long]("loop_p1") + r.getAs[Long]("loop_p2") +
        r.getAs[Long]("loop_p3")
      assert(loops <= n)
      assert(r.getAs[Long]("loop_ppm") == loops * 1000000L / n)
    }
  }

  // ---------------------------------------------------------------- q479

  test("DSIR selection: quota respected globally, target source over-selected") {
    val df = run("q479_dsir_selection")
    // scale gate: the selection threshold must come from the score
    // HISTOGRAM — no partition-less window may run over corpus rows
    // (doc_id in its input means it sorts documents, not bins)
    val corpusWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty &&
          w.child.output.exists(_.name == "doc_id") => w
    }
    assert(corpusWindows.isEmpty,
      "q479 plans a corpus-sized single-partition window (the r5 defect)")
    val rows = df.collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val selected = rows.map(_.getAs[Long]("n_selected")).sum
    // bin-granular quota: the boundary score bin is selected whole, so
    // the selection meets the quota and overshoots by less than one bin
    assert(selected >= total / 4, s"quota: $selected of $total")
    assert(selected <= total / 2, s"overshoot: $selected of $total")
    // the target domain must be selected at a rate above the corpus
    // average — that is the entire point of importance resampling
    val src0 = rows.find(_.getAs[String]("source") == "src0").get
    val src0Rate = src0.getAs[Long]("n_selected").toDouble / src0.getAs[Long]("n_docs")
    val restSel = selected - src0.getAs[Long]("n_selected")
    val restDocs = total - src0.getAs[Long]("n_docs")
    assert(src0Rate > restSel.toDouble / restDocs,
      s"target rate $src0Rate vs rest ${restSel.toDouble / restDocs}")
  }

  // ---------------------------------------------------------------- q480

  test("prefix cache plan: monotone decreasing sharing as k grows") {
    val rows = run("q480_prefix_cache_plan").orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(4L, 8L, 16L))
    for (r <- rows) {
      assert(r.getAs[Long]("n_docs_shared") >= 2 * r.getAs[Long]("n_shared_prefixes"))
      assert(r.getAs[Long]("saved_ppm") <= 1000000L)
    }
    // longer prefixes can only split groups: shared docs cannot increase
    val sharedDocs = rows.map(_.getAs[Long]("n_docs_shared"))
    assert(sharedDocs.sliding(2).forall { case Array(a, b) => b <= a },
      s"not monotone: ${sharedDocs.toSeq}")
  }

  // ---------------------------------------------------------------- q481

  test("epoch decay: effective tokens follow the integer decay constants") {
    val rows = run("q481_epoch_decay_effective_tokens").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val u = r.getAs[Long]("unique_tokens")
      assert(r.getAs[Long]("eff_epoch1") == u)
      assert(r.getAs[Long]("eff_epoch2") == u * 1550L / 1000L)
      assert(r.getAs[Long]("eff_epoch4") == u * 2018L / 1000L)
      // diminishing returns: 4 epochs < 4x one epoch
      assert(r.getAs[Long]("eff_epoch4") < 4L * u)
    }
  }

  // ---------------------------------------------------------------- q483

  test("speculative acceptance: rates bounded, speedup consistent with rate") {
    val rows = run("q483_speculative_acceptance").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val acc = r.getAs[Long]("acc_ppm")
      assert(acc >= 0L && acc <= 1000000L)
      assert(r.getAs[Long]("n_accepted") <= r.getAs[Long]("n_transitions"))
      val tps = r.getAs[Long]("tokens_per_step_milli")
      // 1 <= tokens/step <= 5 (4 drafts + 1 verified)
      assert(tps >= 1000L && tps <= 5000L, s"tps=$tps")
      // argmax drafting accepts at least at chance level for a
      // non-degenerate bigram table; and a higher acceptance rate can
      // only raise the expected tokens per step
      val p1 = acc / 1000L
      assert(tps == 1000L + p1 + p1 * p1 / 1000L + p1 * p1 / 1000L * p1 / 1000L +
        p1 * p1 / 1000L * p1 / 1000L * p1 / 1000L)
    }
  }

  // ---------------------------------------------------------------- q484

  test("MMR: 5 distinct picks, first is max-relevance, scores well-formed") {
    val rows = run("q484_mmr_diversified_retrieval").orderBy(col("rank")).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 5L).toSeq)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5)
    assert(rows.head.getAs[Long]("maxsim") == 0L)
    // rank 1 has the globally maximal relevance among picks
    assert(rows.head.getAs[Long]("rel") == rows.map(_.getAs[Long]("rel")).max)
    for (r <- rows)
      assert(r.getAs[Long]("mmr_milli") ==
        r.getAs[Long]("rel") - r.getAs[Long]("maxsim"))
  }

  // ---------------------------------------------------------------- q485

  test("FIM split: spans partition eligible docs exactly") {
    val rows = run("q485_fim_split_plan").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_eligible") <= r.getAs[Long]("n_docs"))
      if (r.getAs[Long]("n_eligible") > 0) {
        // every span non-empty → every mean ≥ 1 token
        assert(r.getAs[Long]("mean_prefix_milli") >= 1000L)
        assert(r.getAs[Long]("mean_middle_milli") >= 1000L)
        assert(r.getAs[Long]("mean_suffix_milli") >= 1000L)
      }
    }
  }

  // ---------------------------------------------------------------- q486

  test("LSH delta maintenance: 4 bands, touched bounds, pairs need standing buckets") {
    val rows = run("q486_lsh_delta_maintenance").orderBy(col("band")).collect()
    assert(rows.map(_.getAs[Long]("band")).toSeq == Seq(0L, 1L, 2L, 3L))
    for (r <- rows) {
      val touched = r.getAs[Long]("buckets_touched")
      assert(touched <= r.getAs[Long]("delta_docs"), "one bucket per doc per band")
      assert(r.getAs[Long]("new_buckets") <= touched)
      // candidate pairs only arise from non-new buckets
      if (r.getAs[Long]("new_buckets") == touched)
        assert(r.getAs[Long]("cand_pairs") == 0L)
    }
  }

  // ---------------------------------------------------------------- q487

  test("packing attention waste: quadratic masses ordered, rate in range") {
    val rows = run("q487_packing_attention_waste").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // Σ l_i² <= (Σ l_i)² always; equality iff every window has 1 doc
      assert(r.getAs[Long]("sum_l2") <= r.getAs[Long]("sum_t2"))
      val w = r.getAs[Long]("waste_ppm")
      assert(w >= 0L && w < 1000000L)
      assert(r.getAs[Long]("n_windows") > 0L)
    }
  }

  // ---------------------------------------------------------------- q488

  test("paged KV: bigger pages mean fewer entries, more fragmentation") {
    val rows = run("q488_paged_kv_fragmentation").orderBy(col("page")).collect()
    assert(rows.map(_.getAs[Long]("page")).toSeq == Seq(16L, 64L, 256L))
    val entries = rows.map(_.getAs[Long]("page_table_entries"))
    assert(entries.sliding(2).forall { case Array(a, b) => b <= a })
    val frag = rows.map(_.getAs[Long]("frag_tokens"))
    assert(frag.sliding(2).forall { case Array(a, b) => b >= a })
    // identity: entries*page = total + frag, per config
    for (r <- rows)
      assert(r.getAs[Long]("page_table_entries") * r.getAs[Long]("page")
        == r.getAs[Long]("total_tokens") + r.getAs[Long]("frag_tokens"))
  }

  // ---------------------------------------------------------------- q489

  test("merge transfer: reductions positive on both splits, trained merges shrink") {
    val rows = run("q489_merge_transfer_eval").orderBy(col("split")).collect()
    assert(rows.map(_.getAs[String]("split")).toSeq == Seq("holdout", "train"))
    for (r <- rows) {
      assert(r.getAs[Long]("symbols_after") < r.getAs[Long]("symbols_before"),
        s"${r.getAs[String]("split")}: merges must shrink the split")
      assert(r.getAs[Long]("reduction_ppm") > 0L)
    }
  }

  // ---------------------------------------------------------------- q490

  test("lexical entropy: buckets partition docs") {
    val rows = run("q490_lexical_entropy_filter").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("n_low") + r.getAs[Long]("n_mid")
        + r.getAs[Long]("n_high") == r.getAs[Long]("n_docs"))
  }

  // ---------------------------------------------------------------- q491

  test("batching policies: sorted never pads more than arrival") {
    val df = run("q491_arrival_vs_sorted_batching")
    // scale gate: both policies must rank WITHIN hash shards — zero
    // partition-less windows anywhere in the plan (the r5 defect)
    val globalWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      "q491 plans a corpus-sized single-partition window (the r5 defect)")
    val rows = df.collect()
    val byPolicy = rows.map(r => r.getAs[String]("policy") -> r).toMap
    assert(byPolicy.keySet == Set("arrival", "sorted"))
    assert(byPolicy("arrival").getAs[Long]("total_tokens")
      == byPolicy("sorted").getAs[Long]("total_tokens"))
    assert(byPolicy("arrival").getAs[Long]("n_batches")
      == byPolicy("sorted").getAs[Long]("n_batches"))
    // sorting by length is the padding-minimal contiguous grouping
    assert(byPolicy("sorted").getAs[Long]("padding_tokens")
      <= byPolicy("arrival").getAs[Long]("padding_tokens"))
  }

  // ---------------------------------------------------------------- q492

  test("HNSW levels: counts conserve, upper levels geometric-ish") {
    val rows = run("q492_hnsw_level_plan").orderBy(col("level")).collect()
    assert(rows.map(_.getAs[Long]("level")).toSeq.forall(l => l >= 0L && l <= 4L))
    val total = rows.map(_.getAs[Long]("n_nodes")).sum
    // n_at_or_above at level 0 is the whole index
    assert(rows.head.getAs[Long]("level") == 0L)
    assert(rows.head.getAs[Long]("n_at_or_above") == total)
    // at-or-above is non-increasing in level
    val above = rows.map(_.getAs[Long]("n_at_or_above"))
    assert(above.sliding(2).forall { case Array(a, b) => b <= a })
    // level 0 holds roughly half the nodes (geometric(1/2) assignment)
    assert(rows.head.getAs[Long]("n_nodes") * 3 > total,
      "level 0 should hold ~half the nodes")
  }

  // ---------------------------------------------------------------- q493

  test("int8 outliers: ranked by ratio, means consistent") {
    val rows = run("q493_int8_outlier_channels").orderBy(col("rk")).collect()
    assert(rows.length == 8)
    val ratios = rows.map(_.getAs[Long]("ratio_milli"))
    assert(ratios.sliding(2).forall { case Array(a, b) => b <= a })
    for (r <- rows) {
      // max >= mean always → ratio >= 1000
      assert(r.getAs[Long]("ratio_milli") >= 1000L)
      assert(r.getAs[Boolean]("is_outlier") == (r.getAs[Long]("ratio_milli") > 6000L))
    }
  }

  // ---------------------------------------------------------------- q494

  test("pass@k: monotone in k, exact at the k=1 closed form") {
    val rows = run("q494_curation_pass_at_k").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("c"))
      val p1 = r.getAs[Long]("pass_at_1_ppm")
      // k=1: exactly c/n in ppm (single floor)
      assert(p1 == 1000000L - (1000000L * (n - c) / n))
      assert(p1 <= r.getAs[Long]("pass_at_5_ppm"))
      assert(r.getAs[Long]("pass_at_5_ppm") <= r.getAs[Long]("pass_at_10_ppm"))
      assert(r.getAs[Long]("pass_at_10_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q495

  test("ANN routing margins: buckets valid, fallback flag matches bucket") {
    val rows = run("q495_ann_routing_margin").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 9L)
      assert(r.getAs[Boolean]("is_fallback") == (b < 2L))
      assert(r.getAs[Long]("n_queries") > 0L)
    }
  }

  // ---------------------------------------------------------------- q496

  test("filtered ANN: selectivity and fetch budget consistent per bucket") {
    val rows = run("q496_filtered_ann_amplification").collect()
    assert(rows.nonEmpty && rows.length <= 16)
    for (r <- rows) {
      val (total, pass) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_pass"))
      assert(pass <= total)
      if (pass == 0L) assert(r.getAs[Long]("fetch_k10") == -1L)
      else {
        // fetch >= 10 always; equality iff every candidate passes
        assert(r.getAs[Long]("fetch_k10") >= 10L)
        assert((r.getAs[Long]("fetch_k10") == 10L) == (pass == total))
      }
    }
  }

  // ---------------------------------------------------------------- q497

  test("Bradley-Terry: ranks total, scores ordered, wins bounded by games") {
    val rows = run("q497_bradley_terry_arena").orderBy(col("rank")).collect()
    assert(rows.length > 1)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores.sliding(2).forall { case Array(a, b) => b <= a })
    for (r <- rows) {
      assert(r.getAs[Long]("wins") <= r.getAs[Long]("games"))
      assert(r.getAs[Long]("score_ppm") >= 1000L) // the epsilon floor
    }
    // the top brand must win more than half its duels (sanity of the
    // preference aggregation)
    assert(rows.head.getAs[Long]("wins") * 2 > rows.head.getAs[Long]("games"))
  }

  // ---------------------------------------------------------------- q498

  test("TTL cache: hit rate monotone in horizon, counts conserve") {
    val rows = run("q498_ttl_cache_reuse_intervals").orderBy(col("ttl")).collect()
    assert(rows.map(_.getAs[Long]("ttl")).toSeq == Seq(10000L, 100000L, 1000000L))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.sliding(2).forall { case Array(a, b) => b >= a })
    for (r <- rows) {
      assert(r.getAs[Long]("n_first") + r.getAs[Long]("n_hits")
        <= r.getAs[Long]("n_accesses"))
      assert(r.getAs[Long]("n_first") > 0L, "every key has a first access")
    }
    // same stream each config
    assert(rows.map(_.getAs[Long]("n_accesses")).distinct.length == 1)
  }

  // ---------------------------------------------------------------- q499

  test("span corruption: sizing identities hold per source") {
    val rows = run("q499_span_corruption_plan").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (tot, cor, sp) = (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("corrupted_tokens"), r.getAs[Long]("sentinel_tokens"))
      assert(cor < tot)
      assert(sp <= cor, "mean span 3 → spans <= corrupted")
      assert(r.getAs[Long]("input_tokens") == tot - cor + sp)
      assert(r.getAs[Long]("target_tokens") == cor + sp + r.getAs[Long]("n_docs"))
    }
  }

  // ---------------------------------------------------------------- q500

  test("Young interval: exact isqrt, overhead near the 2x-sqrt optimum") {
    val r = run("q500_checkpoint_interval_young").collect().head
    val mtbf = r.getAs[Long]("mtbf_s")
    val t = r.getAs[Long]("t_opt_s")
    // exact integer sqrt of 2*C*MTBF
    assert(t * t <= 120L * mtbf && (t + 1) * (t + 1) > 120L * mtbf)
    assert(r.getAs[Long]("overhead_ppm") > 0L)
  }

  // ---------------------------------------------------------------- q501

  test("semantic cache: hit rate anti-monotone in threshold") {
    val rows = run("q501_semantic_cache_hit_sweep").orderBy(col("threshold_milli")).collect()
    assert(rows.map(_.getAs[Long]("threshold_milli")).toSeq == Seq(900L, 950L, 990L))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.sliding(2).forall { case Array(a, b) => b <= a })
    assert(rows.map(_.getAs[Long]("n_queries")).distinct.length == 1)
    for (r <- rows) assert(r.getAs[Long]("hit_ppm") <= 1000000L)
  }

  // ---------------------------------------------------------------- q502

  test("front coding: saves bytes iff LCP beats the header, bounds hold") {
    val r = run("q502_front_coding_plan").collect().head
    val (plain, front) = (r.getAs[Long]("bytes_plain"), r.getAs[Long]("bytes_front"))
    val n = r.getAs[Long]("n_terms")
    // front = plain - totalLcp + n; totalLcp = mean*n/1000
    val totalLcp = r.getAs[Long]("mean_lcp_milli") * n / 1000L
    assert(front <= plain + n)
    assert(front >= plain - 7L * n) // LCP capped at 7
    assert(r.getAs[Long]("savings_ppm") == (plain - front) * 1000000L / plain)
    assert(totalLcp >= 0L)
  }

  // ---------------------------------------------------------------- q503

  test("COEC: expectations calibrated — buckets average around 1.0") {
    val rows = run("q503_coec_position_bias").collect()
    assert(rows.length == 10)
    // the bias curve is fitted on the SAME data, so total actual ==
    // total expected up to integer floors; every bucket near 1000 milli
    val totActual = rows.map(_.getAs[Long]("n_clicks")).sum
    val totExpected = rows.map(_.getAs[Long]("expected_clicks_milli")).sum / 1000L
    assert(math.abs(totActual - totExpected) <= rows.length,
      s"actual=$totActual expected=$totExpected")
  }

  // ---------------------------------------------------------------- q504

  test("top-k churn: overlap bounded, jaccard/churn consistent") {
    val r = run("q504_topk_churn_monitor").collect().head
    val (h1, h2, common) = (r.getAs[Long]("n_h1"), r.getAs[Long]("n_h2"),
      r.getAs[Long]("n_common"))
    assert(h1 == 32L && h2 == 32L)
    assert(common >= 0L && common <= 32L)
    assert(r.getAs[Long]("jaccard_ppm")
      == common * 1000000L / (h1 + h2 - common))
    assert(r.getAs[Long]("churn_ppm") == (h1 - common) * 1000000L / h1)
  }

  // ---------------------------------------------------------------- q505

  test("learned index: epsilons bounded by segment width, keys conserve") {
    val rows = run("q505_learned_index_epsilon").orderBy(col("seg")).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_keys")).sum
    assert(total == Tables.orders(spark, sfMid).count())
    for (r <- rows) {
      // interpolation error cannot exceed the segment's key count
      assert(r.getAs[Long]("eps") >= 0L)
      assert(r.getAs[Long]("eps") < r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("n_keys") <= 4096L)
    }
  }

  // ---------------------------------------------------------------- q506

  test("b-bit minhash: 1-bit estimate corrected, bounded, gap consistent") {
    val rows = run("q506_bbit_minhash_audit").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val full = r.getAs[Long]("est_full_ppm")
      val bit = r.getAs[Long]("est_1bit_ppm")
      assert(full >= 0L && full <= 1000000L)
      assert(bit >= 0L && bit <= 1000000L)
      assert(r.getAs[Long]("abs_gap_ppm") == math.abs(full - bit))
      // matching full values force matching low bits, so bit-match
      // count >= full-match count; the corrected estimate is monotone in
      // it, hence bit >= max(2·full − 1e6, 0) (62500 = one exact 1/16)
      assert(bit >= math.max(2L * full - 1000000L, 0L), s"full=$full bit=$bit")
    }
  }

  // ---------------------------------------------------------------- q507

  test("stratified variance: within <= total, reduction in [0, 1e6)") {
    val r = run("q507_stratified_variance_certificate").collect().head
    val (tot, within) = (r.getAs[Long]("ss_total"), r.getAs[Long]("ss_within"))
    assert(within <= tot, "pooling can only add between-strata scatter")
    val red = r.getAs[Long]("reduction_ppm")
    assert(red >= 0L && red < 1000000L)
    assert(red == (tot - within) * 1000000L / tot)
  }

  // ---------------------------------------------------------------- q508

  test("PRF expansion: 5 ranked distinct terms, weights normalized, probe excluded") {
    val rows = run("q508_prf_query_expansion").orderBy(col("rank")).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 5L).toSeq)
    val terms = rows.map(_.getAs[String]("term"))
    assert(terms.distinct.length == 5)
    val masses = rows.map(_.getAs[Long]("tf_mass"))
    assert(masses.sliding(2).forall { case Array(a, b) => b <= a })
    // weights are shares of the full feedback mass → the top-5 can't
    // exceed the whole
    assert(rows.map(_.getAs[Long]("weight_ppm")).sum <= 1000000L)
  }

  // ---------------------------------------------------------------- q509

  test("LF diagnostics: conflict <= overlap <= labeled <= docs, all three LFs") {
    val rows = run("q509_labeling_function_diagnostics").collect()
    assert(rows.map(_.getAs[String]("lf")).sorted.toSeq
      == Seq("lf1_chars", "lf2_tokens", "lf3_diversity"))
    for (r <- rows) {
      assert(r.getAs[Long]("n_conflict") <= r.getAs[Long]("n_overlap"))
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_labeled"))
      assert(r.getAs[Long]("n_labeled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("coverage_ppm")
        == r.getAs[Long]("n_labeled") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  // ---------------------------------------------------------------- q482

  test("chunk sweep: coverage >= corpus, overhead shrinks with window size") {
    val rows = run("q482_chunk_overlap_sweep").orderBy(col("l")).collect()
    assert(rows.map(r => (r.getAs[Long]("l"), r.getAs[Long]("s"))).toSeq ==
      Seq((32L, 24L), (64L, 48L), (128L, 96L)))
    val total = rows.head.getAs[Long]("total_tokens")
    for (r <- rows) {
      assert(r.getAs[Long]("total_tokens") == total, "same corpus each config")
      assert(r.getAs[Long]("covered_tokens") >= total)
      assert(r.getAs[Long]("n_chunks") > 0L)
    }
    // larger windows with the same 25% overlap ratio re-read fewer tokens
    val overhead = rows.map(_.getAs[Long]("overhead_ppm"))
    assert(overhead.sliding(2).forall { case Array(a, b) => b <= a },
      s"not monotone: ${overhead.toSeq}")
  }
}
