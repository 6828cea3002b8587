package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 experimentation-calibration batch
  * (q639–q641) beyond the oracle gate. */
class ExperimentOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("A/A audit: null splits fire near the nominal rate") {
    val r = run("q639_aa_calibration_audit").collect().head
    assert(r.getAs[Long]("n_splits") == 16L)
    val rej = r.getAs[Long]("n_rejected")
    // 16 null tests at 5%: E = 0.8 rejections; ≥ 6 would be a broken
    // harness (p < 1e-4 under binomial), and the verdict must agree
    assert(rej <= 5L, s"A/A fired $rej/16 — assignment hashing is biased")
    assert(r.getAs[Boolean]("calibrated") == (rej <= 2L))
  }

  test("gatekeeping: verdicts form a prefix and never exceed marginal") {
    val rows = run("q640_fixed_sequence_gatekeeping").collect()
      .sortBy(_.getAs[Long]("seq"))
    assert(rows.length == 25)
    val gated = rows.map(_.getAs[Long]("gatekept_reject"))
    // once the gate closes it stays closed
    assert(gated.sliding(2).forall { case Array(a, b) => a >= b },
      gated.toSeq.toString)
    rows.foreach(r => assert(r.getAs[Long]("gatekept_reject")
      <= r.getAs[Long]("marginal_reject"),
      "the gate can only remove rejections"))
  }

  test("betting monitor: wealth bounded by max, rejection consistent") {
    val r = run("q641_betting_martingale_monitor").collect().head
    assert(r.getAs[Long]("n_days") > 5L)
    assert(r.getAs[Long]("final_wealth_ppm") <= r.getAs[Long]("max_wealth_ppm"))
    assert(r.getAs[Long]("final_wealth_ppm") > 0L, "wealth stays positive (λ < 1)")
    val first = r.getAs[Long]("first_rejection_day")
    assert(r.getAs[Boolean]("ever_rejected_5pct") == (first != -1L))
    if (first != -1L) assert(first >= 1L && first <= r.getAs[Long]("n_days"))
  }
}
