package graft

import org.apache.spark.sql.functions._

/** Semantics of the synopsis/signal operators (q419–q421) beyond the
  * oracle gate. */
class SynopsisOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q419

  test("hll sketch: estimates near exact, errors self-consistent") {
    val rows = run("q419_hll_register_sketch").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("exact_distinct")
      val hll = r.getAs[Long]("hll_est")
      val kmv = r.getAs[Long]("kmv_est")
      assert(exact > 0L && hll > 0L && kmv > 0L)
      // raw HLL (no small-range correction) at n ≈ 10·m runs hot but
      // must stay within ±60%; KMV bottom-64 well within ±40%
      assert(math.abs(hll - exact) * 10 <= exact * 6, s"hll $hll vs exact $exact")
      assert(math.abs(kmv - exact) * 10 <= exact * 4, s"kmv $kmv vs exact $exact")
      assert(r.getAs[Long]("hll_err_ppm") ==
        math.abs(hll - exact) * 1000000L / math.max(exact, 1L))
      assert(r.getAs[Long]("kmv_err_ppm") ==
        math.abs(kmv - exact) * 1000000L / math.max(exact, 1L))
    }
  }

  // ---------------------------------------------------------------- q420

  test("haar synopsis: dyadic coefficient counts, energy dominates max") {
    val rows = run("q420_haar_synopsis").orderBy(col("level")).collect()
    assert(rows.map(_.getAs[Long]("level")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_coeffs")).toSeq == Seq(128L, 64L, 32L))
    for (r <- rows) {
      val l1 = r.getAs[Long]("l1_energy_c")
      val mx = r.getAs[Long]("max_abs_c")
      assert(mx >= 0L && l1 >= mx, "L1 energy bounds the max coefficient")
      val b = r.getAs[Long]("argmax_block")
      assert(b >= 0L && b < r.getAs[Long]("n_coeffs"))
    }
  }

  test("haar synopsis: level-1 coefficients reproduce day-pair differences") {
    // independent recomputation of the level-1 L1 energy from raw orders
    val daily = Tables.orders(spark, sfMid)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(graft.functions.Deterministic.cents(col("o_totalprice"))).as("v"))
    val d0 = daily.agg(min(col("day"))).collect().head.getDate(0)
    val series = Array.fill(256)(0L)
    daily.collect().foreach { r =>
      val d = ((r.getDate(0).toLocalDate.toEpochDay -
        d0.toLocalDate.toEpochDay)).toInt
      if (d < 256) series(d) = r.getAs[Long]("v")
    }
    val expect = (0 until 128).map(b =>
      math.abs(series(2 * b) - series(2 * b + 1))).sum
    val got = run("q420_haar_synopsis").filter(col("level") === 1)
      .collect().head.getAs[Long]("l1_energy_c")
    assert(got == expect)
  }

  // ---------------------------------------------------------------- q421

  test("lead-lag: full lag grid, best flag marks the covariance maximum") {
    val rows = run("q421_lead_lag_xcorr").orderBy(col("lag_days")).collect()
    assert(rows.map(_.getAs[Long]("lag_days")).toSeq == (-7L to 7L).toSeq)
    val covs = rows.map(r => BigDecimal(r.getAs[Long]("cov_scaled")))
    val mx = covs.max
    for ((r, c) <- rows.zip(covs)) {
      assert(r.getAs[Long]("n_days") > 0L)
      assert((r.getAs[Long]("is_best") == 1L) == (c == mx))
    }
    assert(rows.map(_.getAs[Long]("is_best")).sum >= 1L)
  }
}
