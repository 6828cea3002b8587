package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 agreement-statistics batch (q642–q644)
  * beyond the oracle gate. */
class AgreementOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("Kendall W in [0,1], Friedman consistent with W") {
    val r = run("q642_kendall_w_concordance").collect().head
    val w = r.getAs[Long]("w_ppm")
    assert(w >= 0L && w <= 1000000L, s"W $w ppm")
    val n = r.getAs[Long]("n_brands")
    assert(r.getAs[Long]("friedman_chi2_milli")
      == 12 * (n - 1) * w / 1000)
    // S is bounded by its perfect-concordance maximum m²n(n²−1)/12
    assert(r.getAs[Long]("s_stat") <= 144 * n * (n * n - 1) / 12)
  }

  test("Cronbach alpha bounded and consistent with the variance share") {
    val r = run("q643_cronbach_alpha").collect().head
    val share = r.getAs[Long]("item_var_share_ppm")
    assert(share > 0L, "item variances are positive")
    assert(r.getAs[Long]("alpha_milli")
      == 12 * (1000000 - share) / 11 / 1000)
    // alpha ≤ 1 always; it can be negative when items anti-correlate
    assert(r.getAs[Long]("alpha_milli") <= 1000L)
  }

  test("Bland-Altman: ~95% of diffs inside the limits by construction") {
    val r = run("q644_bland_altman_agreement").collect().head
    assert(r.getAs[Long]("n_orders") > 1000L)
    assert(r.getAs[Long]("loa_low_cents") < r.getAs[Long]("bias_cents"))
    assert(r.getAs[Long]("loa_high_cents") > r.getAs[Long]("bias_cents"))
    val outside = r.getAs[Long]("outside_ppm")
    // ±1.96σ covers ≥ 1 − 1/1.96² ≈ 74% by Chebyshev for ANY shape;
    // heavy skew can push past the Gaussian 5%, but not past Chebyshev
    assert(outside <= 260000L, s"outside $outside ppm breaks Chebyshev")
  }
}
