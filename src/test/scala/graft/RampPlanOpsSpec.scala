package graft

/** Semantics of the round-8 multiplicity/ramp batch (q664–q665) beyond
  * the oracle gate. */
class RampPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q664: Holm dominates Bonferroni and stops monotonically") {
    val rows = run("q664_holm_stepdown").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 25)
    // the step-down gate only closes, never reopens
    assert(rows.map(_.getAs[Long]("holm_reject")).sliding(2)
      .forall(p => p(0) >= p(1)))
    rows.foreach { r =>
      // Bonferroni's single bar is Holm's rank-1 bar, the strictest:
      // anything Bonferroni rejects, Holm must also reject
      assert(r.getAs[Long]("holm_reject") >= r.getAs[Long]("bonferroni_reject"),
        s"rank ${r.getAs[Long]("rank")}: Holm lost a Bonferroni rejection")
    }
    // critical values relax as the rank rises (alpha / (m - k + 1))
    assert(rows.map(_.getAs[Long]("crit_ppm")).sliding(2)
      .forall(p => p(0) >= p(1)))
    // evidence order: statistics descend with rank
    assert(rows.map(_.getAs[Long]("stat_ppm")).sliding(2)
      .forall(p => p(0) >= p(1)))
  }

  test("q665: staged exposure tracks the plan on a uniform hash") {
    val rows = run("q665_staged_ramp_srm").collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exposed") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("obs_ppm")
        == r.getAs[Long]("n_exposed") * 1000000L / r.getAs[Long]("n"))
      assert((r.getAs[Long]("srm_flag") == 1L)
        == (r.getAs[Long]("chi2_ppm") >= 3841459L))
      // the hash IS uniform, so no stage should flag on honest data —
      // the audit's null calibration (chi2 up to ~3.6M observed, under
      // the 3.84M bar)
      assert(r.getAs[Long]("srm_flag") == 0L,
        s"stage ${r.getAs[Long]("stage")} flagged on a uniform hash")
    }
    // exposure is sticky: later (wider) stages expose a superset share
    val obs = rows.map(_.getAs[Long]("obs_ppm"))
    assert(obs(0) < obs(1) && obs(1) < obs(2),
      "ramp shares should widen with the plan")
  }
}
