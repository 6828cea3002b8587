package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 robust-estimator batch (q636–q638) beyond
  * the oracle gate. */
class RobustLocationOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("Hodges-Lehmann sits between the extremes of mean and median") {
    val r = run("q636_hodges_lehmann_location").collect().head
    val hl = r.getAs[Long]("hodges_lehmann_cents")
    val mean = r.getAs[Long]("mean_cents")
    val med = r.getAs[Long]("median_cents")
    // HL is a location estimate of the same distribution: it must land
    // inside the [min(mean, median), max(mean, median)] envelope up to
    // pair-average granularity on near-symmetric daily revenue
    val lo = math.min(mean, med); val hi = math.max(mean, med)
    val slack = (hi - lo) / 2 + math.max(hi / 100, 1)
    assert(hl >= lo - slack && hl <= hi + slack, s"HL $hl vs [$lo, $hi]")
    assert(r.getAs[Long]("hl_minus_median_cents") == hl - med)
  }

  test("Siegel and Theil-Sen agree on direction for tame data") {
    val r = run("q637_siegel_repeated_median").collect().head
    val sg = r.getAs[Long]("siegel_slope_micro")
    val ts = r.getAs[Long]("theil_sen_slope_micro")
    assert(r.getAs[Long]("n_days") > 100L)
    // both are median-of-slopes statistics on the same series: on
    // uncontaminated data they differ by far less than the slope scale
    assert(r.getAs[Long]("abs_gap_micro") == math.abs(sg - ts))
    assert(math.abs(sg - ts) <= math.max(math.abs(ts), 1000L) * 10,
      s"Siegel $sg vs Theil-Sen $ts drifted apart on clean data")
  }

  test("Qn scale: quartile exactness and sane ratio to sd") {
    val r = run("q638_pairwise_difference_scale").collect().head
    val qnRaw = r.getAs[Long]("qn_raw")
    assert(qnRaw > 0L)
    assert(r.getAs[Long]("qn_scaled_cents") == qnRaw * 1000 / 2219)
    val ratio = r.getAs[Long]("robust_classical_ratio_milli")
    // Gaussian data gives ratio ≈ 1.19 (the first quartile of |N−N'|
    // is .954σ, divided by the Qn 2.2219 factor tuned for the k-th
    // order statistic, then vs σ): accept a broad sanity band that
    // still catches unit errors
    assert(ratio > 100L && ratio < 3000L, s"ratio $ratio milli")
  }
}
