package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 trend/econometrics/disclosure/scan batches
  * (q611–q623) beyond the oracle gate. */
class TrendEconOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("Mann-Kendall: S bounded by pair count, verdict matches z") {
    val r = run("q611_mann_kendall_trend").collect().head
    val n = r.getAs[Long]("n_days")
    val s = r.getAs[Long]("s_stat")
    assert(math.abs(s) <= n * (n - 1) / 2)
    assert(r.getAs[Long]("var_s") > 0L)
    val z = r.getAs[Long]("z_milli")
    val v = r.getAs[String]("verdict")
    assert(if (z > 1960L) v == "increasing"
      else if (z < -1960L) v == "decreasing" else v == "no_trend")
  }

  test("Page-Hinkley: a laxer threshold can only alarm later") {
    val rows = run("q612_page_hinkley_drift").collect()
    assert(rows.length == 4)
    val byCell = rows.map(r => (r.getAs[Long]("delta_div"),
      r.getAs[Long]("lambda_mult")) -> r.getAs[Long]("first_alarm_day")).toMap
    for (dd <- Seq(10L, 20L)) {
      val tight = byCell((dd, 5L)); val lax = byCell((dd, 10L))
      if (tight != -1L && lax != -1L)
        assert(tight <= lax, s"λ=5μ must fire no later than λ=10μ: $tight vs $lax")
      if (tight == -1L) assert(lax == -1L, "laxer threshold cannot fire alone")
    }
    rows.foreach(r => assert(r.getAs[Long]("max_excursion") >= 0L))
  }

  test("turning points: counts bounded, verdict matches z") {
    val r = run("q613_turning_point_test").collect().head
    assert(r.getAs[Long]("n_turning") <= r.getAs[Long]("n_interior"))
    assert(r.getAs[Long]("expected_turning")
      == 2 * r.getAs[Long]("n_interior") / 3)
    val z = r.getAs[Long]("z_milli")
    assert((math.abs(z) > 1960L) == (r.getAs[String]("verdict") == "non_random"))
  }

  test("2SLS: all three slopes computed from one moment row") {
    val r = run("q614_two_stage_least_squares").collect().head
    assert(r.getAs[Long]("n") > 0L)
    // unit price regressed on quantity must be NEGATIVE under TPC-H's
    // extendedprice = qty·unit-price construction only if correlated;
    // assert the estimates exist and OLS differs from IV unless the
    // instrument is perfectly aligned
    Seq("beta_ols_micro", "beta_iv_micro", "first_stage_slope_micro")
      .foreach(c => assert(!r.isNullAt(r.fieldIndex(c)), c))
  }

  test("event study: the reference month is exactly zero") {
    val rows = run("q615_event_study_did").collect()
    assert(rows.length == 7)
    val base = rows.find(_.getAs[Long]("rel_month") == -1L).get
    assert(base.getAs[Long]("effect_cents") == 0L,
      "normalization: effect at r = -1 is 0 by construction")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_treated") > 0L && r.getAs[Long]("n_control") > 0L)
      assert(r.getAs[Long]("effect_cents")
        == r.getAs[Long]("diff_cents") - base.getAs[Long]("diff_cents"))
    }
  }

  test("synthetic control: weights on the simplex, gap is consistent") {
    val rows = run("q616_synthetic_control_grid").collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(r.getAs[Long]("w1") + r.getAs[Long]("w2") + r.getAs[Long]("w3")
        == 1000L)
      assert(r.getAs[Long]("gap_cents")
        == r.getAs[Long]("actual_cents") - r.getAs[Long]("synthetic_cents"))
    }
    // one weight vector serves all months
    assert(rows.map(r => (r.getAs[Long]("w1"), r.getAs[Long]("w2"))).distinct.size == 1)
  }

  test("competing risks: survival falls, masses stay within one") {
    val rows = run("q617_competing_risks_cif").collect()
      .sortBy(_.getAs[Long]("week"))
    assert(rows.length >= 2, "exit weeks must spread past week 0")
    val surv = rows.map(_.getAs[Long]("surv_ppm"))
    assert(surv.sliding(2).forall { case Array(a, b) => b <= a }, surv.toSeq.toString)
    rows.foreach { r =>
      val total = r.getAs[Long]("surv_ppm") + r.getAs[Long]("cif_purchase_ppm") +
        r.getAs[Long]("cif_error_ppm")
      // floored hazards undershoot: total ≤ 1e6, within per-step slack
      assert(total <= 1000000L && total >= 1000000L - 3L * rows.length,
        s"mass conservation: $total")
    }
  }

  test("clipping: higher caps keep more mass and clip fewer users") {
    val rows = run("q618_contribution_clipping_audit").collect()
      .sortBy(_.getAs[Long]("clip"))
    assert(rows.length == 4)
    val kept = rows.map(_.getAs[Long]("clipped_total"))
    val users = rows.map(_.getAs[Long]("n_clipped_users"))
    val bias = rows.map(_.getAs[Long]("bias_ppm"))
    assert(kept.sliding(2).forall { case Array(a, b) => b >= a })
    assert(users.sliding(2).forall { case Array(a, b) => b <= a })
    assert(bias.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("subsampling amplification: between 1 and the base loss") {
    val rows = run("q619_subsampling_amplification").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val f = r.getAs[Long]("amplified_factor_ppm")
      assert(f >= 1000000L && f <= r.getAs[Long]("exp_eps") * 1000000L)
      assert(r.getAs[Long]("group_privacy_factor_k2")
        == r.getAs[Long]("exp_eps") * r.getAs[Long]("exp_eps"))
    }
  }

  test("cell suppression: a higher threshold suppresses at least as much") {
    val rows = run("q620_cell_suppression_plan").collect()
      .sortBy(_.getAs[Long]("threshold"))
    assert(rows.length == 2)
    assert(rows(1).getAs[Long]("n_primary") >= rows(0).getAs[Long]("n_primary"))
    rows.foreach { r =>
      val ppm = r.getAs[Long]("suppressed_mass_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("n_complementary") <= r.getAs[Long]("n_cells"))
    }
  }

  test("late materialization: verdict equals the 50% crossover") {
    val rows = run("q621_late_materialization_advisor").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("late_wins")
        == (r.getAs[Long]("late_bytes") < r.getAs[Long]("early_bytes")))
      // crossover algebra: late wins iff selectivity < 500000 ppm
      assert(r.getAs[Boolean]("late_wins")
        == (r.getAs[Long]("selectivity_ppm") < 500000L))
    }
  }

  test("row groups: bigger groups touch a larger fraction") {
    val rows = run("q622_rowgroup_sizing_sweep").collect()
      .sortBy(_.getAs[Long]("g_rows"))
    assert(rows.length == 3)
    val frac = rows.map(_.getAs[Long]("touched_ppm"))
    assert(frac.sliding(2).forall { case Array(a, b) => b >= a }, frac.toSeq.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("groups_touched") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("sorted_io_bytes") <= r.getAs[Long]("unsorted_io_bytes"))
    }
  }

  test("predicate order: exactly the selectivity-optimal order wins") {
    val rows = run("q623_predicate_order_audit").collect()
    assert(rows.length == 6)
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.nonEmpty)
    assert(best.forall(_.getAs[Long]("overhead_ppm") == 0L))
    rows.filterNot(_.getAs[Boolean]("is_best"))
      .foreach(r => assert(r.getAs[Long]("overhead_ppm") >= 0L))
  }

  test("q692: churn bookkeeping — survivors + churned = k, valid ranks") {
    val rows = SparkEntry.queries("q692_topk_rank_churn")(spark, sfMid)
      .collect().sortBy(_.getAs[Long]("month"))
    assert(rows.length == 11, "11 consecutive 1995 month pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("survivors") + r.getAs[Long]("churned")
        == r.getAs[Long]("k"))
      assert(r.getAs[Long]("churn_ppm")
        == r.getAs[Long]("churned") * 1000000L / r.getAs[Long]("k"))
      // two ranks within the same top-10 differ by at most k-1
      assert(r.getAs[Long]("max_rank_move") <= r.getAs[Long]("k") - 1)
      assert(r.getAs[Long]("survivors") >= 1L,
        "a fully reshuffled top-10 month pair would be generator-suspect")
    }
  }
}
