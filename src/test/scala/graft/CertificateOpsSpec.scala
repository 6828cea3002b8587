package graft

import org.apache.spark.sql.functions._

/** Semantics of the certificate/audit operators (q458–q460) beyond the
  * oracle gate. */
class CertificateOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q458

  test("topk merge: pushed and direct top-10 agree rank by rank") {
    val rows = run("q458_topk_merge_certificate").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("is_equal") == 1L))
    val pcs = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("pc_direct"))
    assert(pcs.zip(pcs.tail).forall { case (a, b) => a >= b }, "descending")
    assert(rows.map(_.getAs[Long]("key_direct")).distinct.length == 10)
  }

  // ---------------------------------------------------------------- q459

  test("predicate correlation: hash pair near independent, factors consistent") {
    val rows = run("q459_predicate_correlation_audit").collect()
    assert(rows.length == 5)
    val m = rows.map(r => r.getAs[String]("pair") -> r).toMap
    // parity of two independent key spaces: within 5% of independence
    val hashPair = m("custkey_even*orderkey_even").getAs[Long]("corr_factor_milli")
    assert(hashPair > 950L && hashPair < 1050L, s"hash pair factor $hashPair")
    for (r <- rows) {
      assert(r.getAs[Long]("cj") <= math.min(r.getAs[Long]("ca"), r.getAs[Long]("cb")))
      assert(r.getAs[Long]("indep_est") ==
        r.getAs[Long]("ca") * r.getAs[Long]("cb") / r.getAs[Long]("n"))
      assert(r.getAs[Long]("corr_factor_milli") ==
        r.getAs[Long]("cj") * 1000L / math.max(r.getAs[Long]("indep_est"), 1L))
    }
  }

  // ---------------------------------------------------------------- q460

  test("nested percentiles: shortcuts measurably differ from the truth") {
    val rows = run("q460_nested_percentile_fallacy").collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getAs[Long]("gap") ==
        r.getAs[Long]("nested") - r.getAs[Long]("global"))
      // the fallacy must be visible but bounded on this data (< 10%)
      assert(r.getAs[Long]("gap_ppm") > 0L && r.getAs[Long]("gap_ppm") < 100000L,
        s"${r.getAs[String]("statistic")}: ${r.getAs[Long]("gap_ppm")} ppm")
    }
    // cross-check the global median against Spark's own percentile_approx
    // upper-bounded sanity (exact rank selection vs approx within 2%)
    val approx = Tables.orders(spark, sfMid)
      .agg(expr("approx_percentile(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5, 10000)"))
      .collect().head.getLong(0)
    val exact = rows.find(_.getAs[String]("statistic") ==
      "median_of_shard_medians_cents").get.getAs[Long]("global")
    assert(math.abs(approx - exact) * 50 < exact, "approx within 2% of exact")
  }
}
