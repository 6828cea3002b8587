package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 alignment/testing/cohesion/inventory
  * batches (q624–q635) beyond the oracle gate. */
class AlignShiftOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("aligned spans: bucket bounds hold, diagonals exist in the corpus") {
    val rows = run("q624_aligned_span_census").collect()
    assert(rows.nonEmpty, "rare shared shingles must produce candidate pairs")
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_mass")
      val mx = r.getAs[Long]("max_mass")
      assert(mx >= (1L << b) && mx <= (1L << (b + 1)) - 1, s"bucket $b max $mx")
    }
    // the corpus contains real near-duplicate spans: some pair aligns
    // more than a handful of shingles at one offset
    assert(rows.map(_.getAs[Long]("max_mass")).max >= 8L)
  }

  test("BBSE: recovers the constructed prior shift within tolerance") {
    val r = run("q625_bbse_label_shift").collect().head
    assert(r.getAs[Long]("det_milli") != 0L, "confusion matrix must be invertible")
    // est priors form a near-distribution (inversion is exact; the
    // estimate errs only through classifier noise)
    val e0 = r.getAs[Long]("est_prior0_ppm"); val e1 = r.getAs[Long]("est_prior1_ppm")
    assert(math.abs(e0 + e1 - 1000000L) <= 10L, s"$e0 + $e1")
    // BBSE must beat the naive no-shift assumption: the constructed
    // shift halves positives, so |est - true| well under |0.5 - true|
    val err = r.getAs[Long]("abs_err_ppm")
    assert(err < 250000L, s"shift recovery err $err ppm")
  }

  test("acquisition overlap: both sets size 50, overlap consistent") {
    val rows = run("q626_acquisition_overlap").collect()
    assert(rows.map(_.getAs[String]("acq")).toSet
      == Set("margin", "least_confidence"))
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 50L)
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 50L)
      assert(r.getAs[Long]("overlap_ppm") == ov * 1000000L / 50L)
      assert(r.getAs[Long]("n_labels") >= 1L && r.getAs[Long]("n_labels") <= 10L)
    }
  }

  test("pruning drift: bigger budgets keep more and drift less") {
    val rows = run("q627_pruning_class_drift").collect()
      .sortBy(_.getAs[Long]("keep_permille"))
    assert(rows.length == 3)
    val kept = rows.map(_.getAs[Long]("n_kept"))
    assert(kept.sliding(2).forall { case Array(a, b) => b >= a }, kept.toSeq.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("tv_ppm") >= 0L && r.getAs[Long]("tv_ppm") <= 1000000L)
      assert(r.getAs[Long]("min_class_retention_ppm")
        <= r.getAs[Long]("max_class_retention_ppm"))
    }
  }

  test("BY is uniformly more conservative than BH") {
    val rows = run("q628_by_vs_bh_fdr").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      // BY rejects ⊆ BH rejects, row by row
      assert(r.getAs[Long]("rejected_by") <= r.getAs[Long]("rejected_bh"))
    }
    // step-up coherence: rejections are a prefix of the ranking
    val bh = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("rejected_bh"))
    assert(bh.sliding(2).forall { case Array(a, b) => a >= b }, "BH prefix")
  }

  test("Bernstein beats Hoeffding when variance is far from worst case") {
    val rows = run("q629_empirical_bernstein_radius").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // V̂ ≤ R²/4 always; both radii nonnegative
      assert(r.getAs[Long]("variance")
        <= r.getAs[Long]("range_x") * r.getAs[Long]("range_x") / 4 + 1)
      assert(r.getAs[Long]("bernstein_radius") >= 0L)
      assert(r.getAs[Long]("hoeffding_radius") >= 0L)
    }
    // the flag IS the comparison (at sf0.01's ~50 docs/source the 3RL/n
    // term legitimately lets Hoeffding win; at production n the √(V/n)
    // term dominates and EB takes over — the audit's whole point)
    rows.foreach(r => assert(r.getAs[Boolean]("bernstein_tighter")
      == (r.getAs[Long]("bernstein_radius") < r.getAs[Long]("hoeffding_radius"))))
  }

  test("SPRT: decision consistent with the crossing days") {
    val r = run("q630_sprt_purchase_share").collect().head
    val h1 = r.getAs[Long]("first_h1_day"); val h0 = r.getAs[Long]("first_h0_day")
    val d = r.getAs[String]("decision")
    if (d == "continue") assert(h1 == -1L && h0 == -1L)
    if (d == "accept_h1") assert(h1 != -1L && (h0 == -1L || h1 < h0))
    if (d == "accept_h0") assert(h0 != -1L && (h1 == -1L || h0 <= h1))
    assert(r.getAs[Long]("max_llr") >= r.getAs[Long]("min_llr"))
    assert(r.getAs[Long]("share_ppm") > 0L && r.getAs[Long]("share_ppm") < 1000000L)
  }

  test("core-periphery: block densities ordered core >= cross >= periphery") {
    val rows = run("q631_core_periphery_fit").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val cc = r.getAs[Long]("core_density_ppm")
      val cp = r.getAs[Long]("cross_density_ppm")
      val pp = r.getAs[Long]("periphery_density_ppm")
      assert(cc >= cp, s"core $cc < cross $cp — no core-periphery structure")
      assert(cp >= pp, s"cross $cp < periphery $pp")
      assert(r.getAs[Long]("n_core") >= 1L)
    }
  }

  test("tournament: complete round-robin, cycle identity in range") {
    val r = run("q632_tournament_cycle_census").collect().head
    val n = r.getAs[Long]("n_brands")
    assert(r.getAs[Long]("n_duels") == n * (n - 1) / 2,
      "tournament must be complete for the outdegree identity")
    val cyc = r.getAs[Long]("cyclic_triples")
    assert(cyc >= 0L && cyc + r.getAs[Long]("transitive_triples")
      == r.getAs[Long]("n_triples"))
  }

  test("EOQ: more demand or cheaper holding means bigger lots") {
    val rows = run("q633_eoq_order_sizing").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eoq = r.getAs[Long]("eoq_units")
      val d = r.getAs[Long]("d_units"); val h = r.getAs[Long]("h_cents")
      // isqrt exactness: eoq² ≤ 2DS/H < (eoq+1)²
      val v = 2 * d * 10000 / h
      assert(eoq * eoq <= v && (eoq + 1) * (eoq + 1) > v)
      assert(r.getAs[Long]("orders_per_year") == d / math.max(eoq, 1))
    }
  }

  test("safety stock: reorder point covers the mean lead-time demand") {
    val rows = run("q634_safety_stock_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("reorder_point") >= 7 * r.getAs[Long]("mu_daily"))
      assert(r.getAs[Long]("var_daily") >= 0L)
      val ppm = r.getAs[Long]("stockout_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("stockout_weeks") <= r.getAs[Long]("weeks_observed"))
    }
  }

  test("risk pooling: the pooled sd never exceeds the sum of sds") {
    val r = run("q635_risk_pooling_audit").collect().head
    // centi-resolution sds floor at most 1 centi per term
    assert(r.getAs[Long]("pooled_sd_centi")
      <= r.getAs[Long]("sum_sd_centi") + r.getAs[Long]("n_nations"),
      "subadditivity of sd under aggregation")
    assert(r.getAs[Long]("sd_saved_centi")
      == r.getAs[Long]("sum_sd_centi") - r.getAs[Long]("pooled_sd_centi"))
  }
}
