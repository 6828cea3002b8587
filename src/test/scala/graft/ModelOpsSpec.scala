package graft

/** Semantics of the round-5 model-quality operators (q269–q288) beyond
  * the oracle gate: the invariants a hash compare can't see — bounds,
  * conservation laws, guarantee directions — checked at the smallest SF.
  */
class ModelOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- q269

  test("bigram surprisal scores are valid ppm means over >=1 bigrams") {
    val rows = run("q269_bigram_surprisal_filter").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_bigrams") >= 1)
      val score = r.getAs[Long]("score_ppm")
      assert(score >= 0 && score <= 1000000L, s"score_ppm $score out of [0, 1e6]")
    }
    // ascending output: the BOTTOM tail of the corpus
    val scores = rows.map(_.getAs[Long]("score_ppm")).toSeq
    assert(scores == scores.sorted)
  }

  // ---------------------------------------------------------------- q270

  test("kappa is bounded by 1e6 ppm and agreement never exceeds total") {
    val r = run("q270_langid_kappa").collect().head
    val (n, agree, pe, kappa) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_agree"),
      r.getAs[Long]("pe_cross"), r.getAs[Long]("kappa_ppm"))
    assert(agree <= n)
    assert(pe <= n * n)
    assert(kappa <= 1000000L, s"kappa_ppm $kappa > 1e6")
    // kappa = 1e6 exactly iff perfect agreement
    if (agree == n) assert(kappa == 1000000L)
  }

  // ---------------------------------------------------------------- q271

  test("k-core survivors keep degree >= k within the surviving subgraph") {
    // the output IS the 3-peel subgraph's degree table; after reaching
    // fixpoint every degree must be >= k. At sf0.001 the co-supply graph
    // is complete (K10), so k = min+span/4 = min and NOTHING peels —
    // fixpoint in round 1, all 10 nodes retained.
    val rows = run("q271_kcore_decomposition").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("degree") == 9L))
  }

  // ---------------------------------------------------------------- q272

  test("semantic decontamination flags only corpus vectors, cosine >= 0.30") {
    val rows = run("q272_semantic_decontamination").collect()
    for (r <- rows) {
      assert(r.getAs[Long]("vec_id") % 25 != 0, "benchmark vector flagged as corpus")
      assert(r.getAs[Long]("bench_id") % 25 == 0, "non-benchmark named as neighbor")
      assert(r.getAs[Double]("cosine") >= 0.30)
    }
    // one row per flagged vector (argmax collapsed)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
  }

  // ---------------------------------------------------------------- q273

  test("tokenizer fertility: words <= chars, est tokens consistent") {
    val rows = run("q273_tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_words") >= 1)
      assert(r.getAs[Long]("fertility_ppm") > 0)
      // whitespace words are >= 2 chars apart on average in this corpus
      assert(r.getAs[Long]("chars_per_word_cq") >= 100L)
    }
  }

  // ---------------------------------------------------------------- q274

  test("PMI collocations respect the min-count floor") {
    val rows = run("q274_pmi_collocations").collect()
    for (r <- rows) {
      assert(r.getAs[Long]("n_ab") >= 5)
      assert(r.getAs[Long]("n_a") >= r.getAs[Long]("n_ab"))
      assert(r.getAs[Long]("n_b") >= r.getAs[Long]("n_ab"))
    }
  }

  // ---------------------------------------------------------------- q275

  test("degree assortativity is a correlation in [-1, 1]") {
    val r = run("q275_degree_assortativity").collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a out of range")
    // symmetric edge set: the two marginal moment sums must coincide
    assert(r.getAs[Long]("sx") == r.getAs[Long]("sy"))
    assert(r.getAs[Long]("sxx") == r.getAs[Long]("syy"))
  }

  // ---------------------------------------------------------------- q276

  test("growth accounting balances: new+retained+resurrected = weekly actives") {
    val rows = run("q276_growth_accounting").collect()
      .map(r => (r.getAs[Long]("week_idx"), r.getAs[String]("state"), r.getAs[Long]("n_users")))
    val byWeek = rows.groupBy(_._1)
    // recompute weekly actives directly
    val actives = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) div 604800 AS wk")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((wk, entries) <- byWeek) {
      val active = entries.filter(_._2 != "churned").map(_._3).sum
      assert(active == actives.getOrElse(wk, 0L),
        s"week $wk: states sum to $active, actives ${actives.getOrElse(wk, 0L)}")
    }
  }

  // ---------------------------------------------------------------- q277

  test("join advisor: every test-scale table is broadcast-sized") {
    val rows = run("q277_join_strategy_advisor").collect()
    assert(rows.length == 6)
    for (r <- rows) {
      val est = r.getAs[Long]("est_bytes")
      assert(est > 0)
      assert(r.getAs[String]("strategy") ==
        (if (est <= 10485760L) "broadcast" else "shuffle"))
    }
  }

  // ---------------------------------------------------------------- q278

  test("linear attribution conserves credit exactly") {
    val rows = run("q278_linear_attribution").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (vc, n, per, extra) = (r.getAs[Long]("value_cents"), r.getAs[Long]("n_touches"),
        r.getAs[Long]("credit_per_touch_c"), r.getAs[Long]("first_touch_extra_c"))
      assert(per * n + extra == vc, s"credit leak: $per*$n+$extra != $vc")
      assert(extra >= 0 && extra < n)
    }
  }

  // ---------------------------------------------------------------- q279

  test("dataset card rates are valid ppm and top_lang is a real language") {
    val langs = Tables.documents(spark, sfDir).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val rows = run("q279_dataset_card").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(langs.contains(r.getAs[String]("top_lang")))
      assert(r.getAs[Long]("dup_ppm") <= 1000000L)
      assert(r.getAs[Long]("stop_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_langs") >= 1)
    }
  }

  // ---------------------------------------------------------------- q280

  test("KN continuation: preceder counts bounded by unigram presence") {
    val rows = run("q280_kneser_ney_continuation").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_preceders") >= 1)
      assert(r.getAs[Long]("c_unigram") >= 1)
      assert(r.getAs[Long]("p_cont_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q281

  test("burstiness: cf >= df and burst_mq >= 1000 (cf/df >= 1)") {
    val rows = run("q281_term_burstiness").collect()
    for (r <- rows) {
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      assert(r.getAs[Long]("burst_mq") >= 1000L)
      assert(r.getAs[Long]("df") >= 20L)
    }
  }

  // ---------------------------------------------------------------- q282

  test("canonical selection: keep_id belongs to its cluster, clusters >= 2") {
    val rows = run("q282_canonical_selection").collect()
    for (r <- rows) assert(r.getAs[Long]("n_copies") >= 2)
    // survivors are distinct documents
    val keeps = rows.map(_.getAs[Long]("keep_id"))
    assert(keeps.distinct.length == keeps.length)
  }

  // ---------------------------------------------------------------- q283

  test("tf-saturation scores: bounded terms, saturation below k1+1 ceiling") {
    val rows = run("q283_tf_saturation_ranking").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1 && hits <= 3)
      // each term score < (k1+1)/1 · 1e6 = 2.2e6: score < hits · 2.2e6
      assert(r.getAs[Long]("score_ppm") < hits * 2200000L)
    }
  }

  // ---------------------------------------------------------------- q284

  test("bot census: monotone in threshold, shares valid ppm") {
    val rows = run("q284_bot_rate_census").collect()
      .sortBy(_.getAs[Long]("threshold"))
    assert(rows.length == 3)
    val bots = rows.map(_.getAs[Long]("n_bots"))
    assert(bots.zip(bots.tail).forall { case (a, b) => a >= b },
      "bot count must not increase with threshold")
    for (r <- rows) {
      assert(r.getAs[Long]("n_bots") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("bot_event_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q285

  test("LM holdout eval: OOV bounded by token count, ppm valid") {
    val rows = run("q285_lm_holdout_eval").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("oov_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q286

  test("count-min estimates are one-sided: estimate >= exact, always") {
    val rows = run("q286_count_min_frequency").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"CMS underestimated ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("estimate") >= r.getAs[Long]("exact"))
    }
  }

  // ---------------------------------------------------------------- q287

  test("price index: base month is exactly 1e6 ppm") {
    val rows = run("q287_price_index").collect()
    val base = rows.find(_.getAs[Long]("month") == 199501L)
    assert(base.isDefined, "base month missing from index")
    assert(base.get.getAs[Long]("index_ppm") == 1000000L,
      "Laspeyres index at the base month must be exactly 1")
    assert(rows.forall(_.getAs[Long]("n_parts") >= 1))
  }

  // ---------------------------------------------------------------- q289

  test("cardinality audit: flat estimate exact on PK-FK edges, low on skewed self-join") {
    val rows = run("q289_cardinality_estimation_audit").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val (edge, err) = (r.getAs[String]("edge"), r.getAs[Long]("err_ppm"))
      if (edge == "orders_selfjoin_custkey")
        assert(err < 0, s"skewed self-join should be underestimated, err=$err")
      else assert(err == 0L, s"PK-FK edge $edge must estimate exactly, err=$err")
    }
  }

  // ---------------------------------------------------------------- q290

  test("scalar k-means: centroids ordered, counts conserve the corpus") {
    val rows = run("q290_scalar_kmeans_codebook").collect()
      .sortBy(_.getAs[Long]("centroid_idx"))
    val cents = rows.map(_.getAs[Long]("centroid_c"))
    assert(cents.zip(cents.tail).forall { case (a, b) => a < b },
      s"centroids must be strictly increasing: ${cents.mkString(",")}")
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
  }

  // ---------------------------------------------------------------- q291

  test("eta-squared is a valid share of variance") {
    val rows = run("q291_anova_eta_squared").collect()
    assert(rows.length == 2)
    for (r <- rows) {
      val e = r.getAs[Long]("eta2_ppm")
      assert(e >= 0 && e <= 1000000L, s"eta2_ppm $e out of [0, 1e6]")
    }
  }

  // ---------------------------------------------------------------- q292

  test("cascade-delete plan: cohort near 5%, non-negative reach") {
    val r = run("q292_cascade_delete_plan").collect().head
    val nCust = Tables.customer(spark, sfDir).count()
    val cohort = r.getAs[Long]("n_customers")
    assert(cohort > 0 && cohort < nCust / 5, s"cohort $cohort of $nCust not ~5%")
    assert(r.getAs[Long]("n_lineitems") >= r.getAs[Long]("n_orders"))
    assert(r.getAs[Long]("revenue_cents") >= 0)
  }

  // ---------------------------------------------------------------- q293

  test("PCA power iteration: 64 dims, normalized to max-abs 1024") {
    val rows = run("q293_pca_power_iteration").collect()
    assert(rows.length == 64)
    val comps = rows.map(_.getAs[Long]("component_q"))
    assert(comps.forall(c => math.abs(c) <= 1024L))
    assert(comps.map(math.abs).max == 1024L,
      "normalization must pin the max-abs component to exactly 1024")
  }

  // ---------------------------------------------------------------- q294

  test("catalog freshness: shares sum to ~1e6 (floor rounding only)") {
    val rows = run("q294_catalog_freshness").collect()
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length,
      s"share_ppm sums to $shareSum")
    val buckets = rows.map(_.getAs[String]("bucket")).toSet
    assert(buckets.subsetOf(Set("a_0_2m", "b_3_5m", "c_6_11m", "d_12m_plus")))
  }

  // ---------------------------------------------------------------- q295

  test("shingle sweep: uniqueness rises and volume falls with width") {
    val rows = run("q295_shingle_width_sweep").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 3)
    val uniq = rows.map(_.getAs[Long]("uniqueness_ppm"))
    assert(uniq.zip(uniq.tail).forall { case (a, b) => a <= b },
      s"uniqueness must not fall as k grows: ${uniq.mkString(",")}")
    val inst = rows.map(_.getAs[Long]("n_instances"))
    assert(inst.zip(inst.tail).forall { case (a, b) => a >= b })
    for (r <- rows)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_instances"))
  }

  // ---------------------------------------------------------------- q296

  test("reciprocal best match: mutual pairs are injective both ways") {
    val rows = run("q296_reciprocal_best_match").collect()
    assert(rows.nonEmpty)
    val dks = rows.map(_.getAs[Long]("d_key"))
    val mks = rows.map(_.getAs[Long]("match_key"))
    assert(dks.distinct.length == dks.length, "a dirty record matched twice")
    assert(mks.distinct.length == mks.length, "a clean record claimed twice")
    assert(rows.forall(_.getAs[Long]("distance") <= 2))
  }

  // ---------------------------------------------------------------- q297

  test("varint plan: encoded never exceeds raw, count matches events") {
    val r = run("q297_delta_varint_plan").collect().head
    assert(r.getAs[Long]("varint_bytes") <= r.getAs[Long]("raw_bytes"))
    assert(r.getAs[Long]("savings_ppm") >= 0 && r.getAs[Long]("savings_ppm") <= 1000000L)
    assert(r.getAs[Long]("n_values") == Tables.events(spark, sfDir).count())
  }

  // ---------------------------------------------------------------- q298

  test("watermark sweep: drops shrink as the delay grows") {
    val rows = run("q298_watermark_lateness_sweep").collect()
      .sortBy(_.getAs[Long]("delay_s"))
    assert(rows.length == 3)
    val drops = rows.map(_.getAs[Long]("n_dropped"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      s"drops must not grow with delay: ${drops.mkString(",")}")
    for (r <- rows) assert(r.getAs[Long]("dropped_ppm") <= 1000000L)
  }

  // ---------------------------------------------------------------- q299

  test("rare-level plan: kept mass valid, balanced columns keep everything") {
    val rows = run("q299_rare_level_collapse_plan").collect()
    assert(rows.length == 4)
    for (r <- rows) {
      assert(r.getAs[Long]("n_rare_levels") <= r.getAs[Long]("n_levels"))
      assert(r.getAs[Long]("kept_ppm") <= 1000000L)
    }
    // event_type has 5 roughly even levels — nothing below 1%
    val et = rows.find(_.getAs[String]("column_name") == "event_type").get
    assert(et.getAs[Long]("n_rare_levels") == 0L)
    assert(et.getAs[Long]("kept_ppm") == 1000000L)
  }

  // ---------------------------------------------------------------- q300

  test("curation funnel only ever shrinks") {
    val byStage = run("q300_curation_funnel_v2").collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"))).toMap
    val order = Seq("s0_all", "s1_exact_norm", "s2_template", "s3_lm_filter", "s4_sample")
    assert(byStage.keySet == order.toSet)
    for (Seq(a, b) <- order.sliding(2)) {
      assert(byStage(b)._1 <= byStage(a)._1, s"$b grew docs vs $a")
      assert(byStage(b)._2 <= byStage(a)._2, s"$b grew chars vs $a")
    }
  }

  // ---------------------------------------------------------------- q301

  test("Zipf slope: covers the vocabulary, slope in a sane band") {
    val r = run("q301_zipf_slope").collect().head
    val vocab = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.expressions.tokens_native(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .distinct().count()
    assert(r.getAs[Long]("n_points") == vocab)
    val s = r.getAs[Long]("slope_mq")
    assert(s <= 0 && s >= -5000, s"slope_mq $s outside [-5000, 0]")
  }

  // ---------------------------------------------------------------- q302

  test("minibatch schedule: spread <= 1 everywhere, corpus conserved") {
    val rows = run("q302_minibatch_mix_evenness").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
    for (r <- rows)
      assert(r.getAs[Long]("spread") <= 1L,
        s"${r.getAs[String]("lang")} spread ${r.getAs[Long]("spread")} > 1")
  }

  // ---------------------------------------------------------------- q303

  test("seasonal adjustment: only full windows, positive trend ratio") {
    val rows = run("q303_seasonal_adjustment").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("ma_cents") > 0)
      assert(r.getAs[Long]("sa_ppm") > 0)
    }
  }

  // ---------------------------------------------------------------- q304

  test("dispersion census: three distributions, non-negative VMR") {
    val rows = run("q304_dispersion_census").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      assert(r.getAs[Long]("vmr_ppm") >= 0)
      assert(r.getAs[Long]("mean_mq") > 0)
    }
  }

  // ---------------------------------------------------------------- q305

  test("purchase cadence: every segment reports a positive median") {
    val rows = run("q305_repeat_purchase_interval").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("median_gap_days") >= 1)
      assert(r.getAs[Long]("n_intervals") > 0)
    }
  }

  // ---------------------------------------------------------------- q306

  test("cannibalization screen: correlations valid, months floor holds") {
    val rows = run("q306_brand_cannibalization").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p = r.getAs[Double]("pearson_r")
      assert(p >= -1.0 - 1e-9 && p <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_months") >= 24)
    }
  }

  // ---------------------------------------------------------------- q307

  test("drawdown: never negative, peak dominates revenue") {
    val rows = run("q307_revenue_drawdown").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("peak_cents") >= r.getAs[Long]("revenue_cents"))
      assert(r.getAs[Long]("drawdown_cents") >= 0)
      assert(r.getAs[Long]("drawdown_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q308

  test("vocab overlap: all 10 language pairs, intersection bounded") {
    val rows = run("q308_lang_vocab_overlap").collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val (va, vb, inter) = (r.getAs[Long]("va"), r.getAs[Long]("vb"),
        r.getAs[Long]("inter"))
      assert(inter <= math.min(va, vb))
      assert(r.getAs[Long]("jaccard_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q288

  test("hub capping: kept share is monotone in cap and <= 1e6") {
    val rows = run("q288_hub_capping_census").collect()
      .sortBy(_.getAs[Long]("cap"))
    assert(rows.length == 3)
    val kept = rows.map(_.getAs[Long]("kept_ppm"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b },
      "kept share must not decrease with cap")
    assert(kept.forall(_ <= 1000000L))
    for (r <- rows)
      assert(r.getAs[Long]("n_capped_users") <= r.getAs[Long]("n_users"))
  }
}
