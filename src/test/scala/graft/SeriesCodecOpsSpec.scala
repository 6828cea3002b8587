package graft

/** Semantics of the round-10 series/codec batch: banded DTW (q705),
  * Elias–Fano plan (q706), lead-time demand quantiles (q707). */
class SeriesCodecOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q705: DTW never exceeds lockstep and the gain is a valid ppm") {
    val r = run("q705_banded_dtw_revenue").collect().head
    val dtw = r.getAs[Long]("dtw_cost")
    val lock = r.getAs[Long]("lockstep_cost")
    // the lockstep path IS a warping path inside the band, so the DP
    // minimum can only improve on it
    assert(dtw > 0 && dtw <= lock, s"DTW $dtw vs lockstep $lock")
    val gain = r.getAs[Long]("warp_gain_ppm")
    assert(gain >= 0 && gain < 1000000L)
  }

  test("q706: EF beats raw on every decade while log2(u/df) < 31") {
    val rows = run("q706_elias_fano_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_bits")
      val ef = r.getAs[Long]("ef_bits")
      assert(ef > 0 && raw > 0)
      assert(ef < raw, s"EF $ef not under raw $raw at this universe size")
      assert(r.getAs[Long]("ef_vs_raw_ppm") < 1000000L)
    }
  }

  test("q717: the MSE decomposition closes within isqrt slack") {
    val r = run("q717_theil_u_decomposition").collect().head
    val um = r.getAs[Long]("um_ppm")
    val us = r.getAs[Long]("us_ppm")
    val uc = r.getAs[Long]("uc_ppm")
    assert(um >= 0 && us >= 0)
    assert(uc >= -5000, s"covariance share pathological: $uc")
    val total = um + us + uc
    assert(math.abs(total - 1000000L) < 5000,
      s"UM+US+UC = $total should close to 1e6 within floor/isqrt slack")
    assert(r.getAs[Long]("sse") > 0)
  }

  test("q707: quantiles are ordered and both variants present") {
    val rows = run("q707_leadtime_demand_quantiles").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("variant")).toSet
      == Set("a_empirical", "b_independent"))
    rows.foreach { r =>
      val p95 = r.getAs[Long]("p95")
      val p99 = r.getAs[Long]("p99")
      assert(p95 >= 0 && p99 >= p95, s"quantile order broke: $p95/$p99")
    }
  }
}
