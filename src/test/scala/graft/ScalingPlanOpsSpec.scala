package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 scaling/capacity planners (q523–q530)
  * beyond the oracle gate. */
class ScalingPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q523

  test("chinchilla: D = 20N, monotone in budget, gap consistent") {
    val rows = run("q523_chinchilla_allocation").orderBy(col("budget_tflop")).collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val n = r.getAs[Long]("n_opt_params")
      val d = r.getAs[Long]("d_opt_tokens")
      val corpus = r.getAs[Long]("corpus_tokens")
      assert(d == 20L * n)
      assert(r.getAs[Long]("epochs_milli") == d * 1000L / corpus)
      assert(r.getAs[Long]("data_gap_tokens") == math.max(d - corpus, 0L))
    }
    // 100× the compute → 10× the optimal parameter count (√ scaling)
    val ns = rows.map(_.getAs[Long]("n_opt_params"))
    assert(ns.sliding(2).forall { case Array(a, b) => b > 3L * a && b < 4L * a },
      s"adjacent budgets are 10× so N should scale ~√10 ≈ 3.16×: ${ns.toSeq}")
  }

  // ---------------------------------------------------------------- q524

  test("prefill/decode: ppm bounded and consistent with the unit sums") {
    val rows = run("q524_prefill_decode_split").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p = r.getAs[Long]("prefill_units")
      val d = r.getAs[Long]("decode_units")
      assert(p > 0L && d > 0L)
      assert(r.getAs[Long]("prefill_ppm") == p * 1000000L / (p + d))
    }
  }

  // ---------------------------------------------------------------- q525

  test("attention window: coverage bounded, monotone in window size") {
    val rows = run("q525_attention_window_coverage").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    for ((_, rs) <- bySrc) {
      val byW = rs.map(r => r.getAs[Long]("w") -> r).toMap
      assert(byW.keySet == Set(64L, 256L))
      for (r <- rs) {
        assert(r.getAs[Long]("kept_pairs") <= r.getAs[Long]("total_pairs"))
        assert(r.getAs[Long]("coverage_ppm") <= 1000000L)
      }
      // a wider window can only keep more pairs of the same total
      assert(byW(256L).getAs[Long]("coverage_ppm")
        >= byW(64L).getAs[Long]("coverage_ppm"))
    }
  }

  // ---------------------------------------------------------------- q526

  test("spill planner: totals invariant across P, max at least the mean") {
    val rows = run("q526_shuffle_spill_planner").orderBy(col("p")).collect()
    assert(rows.map(_.getAs[Long]("p")).toSeq == Seq(8L, 32L, 128L))
    val totals = rows.map(_.getAs[Long]("total_bytes")).distinct
    assert(totals.length == 1, s"hash partitioning must conserve bytes: ${totals.toSeq}")
    for (r <- rows) {
      assert(r.getAs[Long]("parts_used") <= r.getAs[Long]("p"))
      assert(r.getAs[Long]("spill_partitions") <= r.getAs[Long]("parts_used"))
      // max ≥ total/p ⇒ balance ratio ≥ 1 (up to the ppm floor)
      assert(r.getAs[Long]("balance_ppm") >= 999999L)
    }
  }

  // ---------------------------------------------------------------- q527

  test("MDE plan: sample size and runtime shrink as the target lift grows") {
    val rows = run("q527_mde_power_plan").orderBy(col("lift_permille")).collect()
    assert(rows.map(_.getAs[Long]("lift_permille")).toSeq == Seq(10L, 20L, 50L))
    for (r <- rows) {
      assert(r.getAs[Long]("delta_usd")
        == math.max(r.getAs[Long]("mean_usd") * r.getAs[Long]("lift_permille") / 1000L, 1L))
      assert(r.getAs[Long]("var_usd2") > 0L)
      assert(r.getAs[Long]("days_needed") >= 1L)
    }
    val n = rows.map(_.getAs[Long]("n_per_arm"))
    assert(n.sliding(2).forall { case Array(a, b) => b < a },
      s"n/arm must fall as the detectable lift grows: ${n.toSeq}")
    val days = rows.map(_.getAs[Long]("days_needed"))
    assert(days.sliding(2).forall { case Array(a, b) => b <= a })
  }

  // ---------------------------------------------------------------- q528

  test("best-of-n: expected max is monotone in n and bounded by the scale") {
    val rows = run("q528_best_of_n_quality_gain").orderBy(col("n_samples")).collect()
    assert(rows.map(_.getAs[Long]("n_samples")).toSeq == Seq(1L, 2L, 4L, 8L))
    val e = rows.map(_.getAs[Long]("e_max_q"))
    assert(e.forall(v => v >= 0L && v <= 1000L))
    // drawing more candidates can only lift the expected best score
    assert(e.sliding(2).forall { case Array(a, b) => b >= a },
      s"E[max of n] must be non-decreasing in n: ${e.toSeq}")
    // and strictly so somewhere, unless every document scores identically
    assert(e.distinct.length > 1, "a non-degenerate corpus must show a gain")
  }

  // ---------------------------------------------------------------- q529

  test("autoscale audit: event conservation and bounded counters") {
    val r = run("q529_autoscale_reactive_audit").collect().head
    val hours = r.getAs[Long]("n_hours")
    assert(hours > 0L)
    assert(r.getAs[Long]("scale_up_hours") + r.getAs[Long]("scale_down_hours")
      <= hours - 1L)
    assert(r.getAs[Long]("underprov_hours") <= hours)
    assert(r.getAs[Long]("dropped_ppm") <= 1000000L)
    assert(r.getAs[Long]("dropped_events") >= r.getAs[Long]("underprov_hours"),
      "every under-provisioned hour drops at least one event")
  }

  // ---------------------------------------------------------------- q531

  test("packing contamination: pairs bounded, every shard mixes documents") {
    val rows = run("q531_packing_contamination").orderBy(col("shard")).collect()
    assert(rows.map(_.getAs[Long]("shard")).toSeq == Seq(0L, 1L, 2L, 3L))
    for (r <- rows) {
      assert(r.getAs[Long]("n_blocks") > 0L)
      assert(r.getAs[Long]("cross_doc_pairs") <= r.getAs[Long]("total_pairs"))
      assert(r.getAs[Long]("contamination_ppm") <= 1000000L)
      // 512-token blocks over ~100-token docs must splice documents
      assert(r.getAs[Long]("cross_doc_pairs") > 0L)
    }
  }

  // ---------------------------------------------------------------- q532

  test("KV capacity: GQA-8 fits at least 4x the sessions of MHA per bucket") {
    val rows = run("q532_kv_cache_capacity").collect()
    val byModel = rows.groupBy(_.getAs[String]("model"))
    assert(byModel.keySet ==
      Set("llama7b_mha", "llama7b_gqa8", "llama70b_gqa8"))
    val mha = byModel("llama7b_mha").map(r => r.getAs[Long]("bucket") -> r).toMap
    val gqa = byModel("llama7b_gqa8").map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(mha.keySet == gqa.keySet)
    for ((b, rm) <- mha) {
      val rg = gqa(b)
      assert(rg.getAs[Long]("kv_bytes_per_session") * 4L
        == rm.getAs[Long]("kv_bytes_per_session"))
      assert(rg.getAs[Long]("sessions_per_gpu")
        >= 4L * rm.getAs[Long]("sessions_per_gpu"))
    }
  }

  // ---------------------------------------------------------------- q533

  test("reshard census: rendezvous hashing moves ~1/3, mod moves more") {
    val r = run("q533_reshard_move_census").collect().head
    assert(r.getAs[Long]("n_keys") > 0L)
    assert(r.getAs[Long]("moved_hrw") < r.getAs[Long]("moved_mod"),
      "HRW must move fewer keys than naive mod resharding")
    val hrwPpm = r.getAs[Long]("moved_hrw_ppm")
    // 4 of 12 nodes are new; HRW moves exactly the keys they win
    assert(hrwPpm > 250000L && hrwPpm < 420000L, s"hrw moved $hrwPpm ppm")
  }

  // ---------------------------------------------------------------- q534

  test("LSM plan: leveled always out-writes tiered, deeper at low fanout") {
    val rows = run("q534_lsm_write_amplification").orderBy(col("fanout")).collect()
    assert(rows.map(_.getAs[Long]("fanout")).toSeq == Seq(4L, 10L))
    for (r <- rows) {
      assert(r.getAs[Long]("wa_leveled_deci") > r.getAs[Long]("wa_tiered_deci"))
      assert(r.getAs[Long]("leveled_bytes_written")
        > r.getAs[Long]("tiered_bytes_written"))
      assert(r.getAs[Long]("levels") >= 1L)
    }
    // a smaller fanout needs at least as many levels
    assert(rows.head.getAs[Long]("levels") >= rows.last.getAs[Long]("levels"))
  }

  // ---------------------------------------------------------------- q535

  test("curriculum stages: coverage rises and truncation falls with the cap") {
    val rows = run("q535_seqlen_curriculum_stages").orderBy(col("cap")).collect()
    assert(rows.map(_.getAs[Long]("cap")).toSeq == Seq(128L, 512L, 2048L))
    assert(rows.map(_.getAs[Long]("total_tokens")).distinct.length == 1)
    val cov = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(cov.forall(_ <= 1000000L))
    assert(cov.sliding(2).forall { case Array(a, b) => b >= a }, cov.toSeq.toString)
    val tr = rows.map(_.getAs[Long]("truncated_docs"))
    assert(tr.sliding(2).forall { case Array(a, b) => b <= a }, tr.toSeq.toString)
  }

  // ---------------------------------------------------------------- q530

  test("char census: class ppms partition each source's characters") {
    val rows = run("q530_char_class_census").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val parts = Seq("letters_ppm", "digits_ppm", "space_ppm", "other_ppm")
        .map(r.getAs[Long](_))
      assert(parts.forall(p => p >= 0L && p <= 1000000L))
      // each share is floored, so the four can undershoot 10⁶ by ≤ 3
      val s = parts.sum
      assert(s >= 1000000L - 3L && s <= 1000000L, s"ppm sum $s")
      // prose corpus: letters dominate
      assert(r.getAs[Long]("letters_ppm") > 500000L)
    }
  }
}
