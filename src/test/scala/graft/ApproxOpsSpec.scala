package graft

import org.apache.spark.sql.functions._

/** Semantics of the approximation-economics operators (q455–q457) beyond
  * the oracle gate. */
class ApproxOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q455

  test("entropy bounds: bracket is exactly one bit per value wide and holds") {
    val rows = run("q455_entropy_coding_bounds").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val n = r.getAs[Long]("n_values")
      val lo = r.getAs[Long]("entropy_bits_lower")
      val hi = r.getAs[Long]("entropy_bits_upper")
      assert(hi - lo == n, "floor/floor+1 bracket is n bits wide")
      assert(lo >= 0L && hi <= n * 64L)
      // dictionary code can never beat the entropy lower bound
      assert(r.getAs[Long]("dict_bits") >= lo)
      // a true entropy value for a known column: o_orderstatus has 3
      // levels, so between log2(1)=0 and 2 bits per value
      if (r.getAs[String]("column") == "o_orderstatus")
        assert(lo <= 2 * n && hi <= 2 * n + n)
    }
  }

  // ---------------------------------------------------------------- q456

  test("online agg: overlap converges monotonically-ish to 10, coverage tracks mille") {
    val rows = run("q456_online_agg_convergence").collect()
      .sortBy(_.getAs[Long]("mille"))
    assert(rows.map(_.getAs[Long]("mille")).toSeq ==
      Seq(10L, 20L, 50L, 100L, 250L, 500L, 1000L))
    val full = rows.last
    assert(full.getAs[Long]("overlap_at_10") == 10L)
    assert(full.getAs[Long]("top1_match") == 1L)
    assert(full.getAs[Long]("revenue_coverage_ppm") == 1000000L)
    for (r <- rows) {
      assert(r.getAs[Long]("overlap_at_10") >= 0L &&
        r.getAs[Long]("overlap_at_10") <= 10L)
      // hash tiers are unbiased: coverage within 3x of the nominal rate
      val mille = r.getAs[Long]("mille")
      val cov = r.getAs[Long]("revenue_coverage_ppm")
      assert(cov > mille * 1000 / 3 && cov < mille * 3000 + 1,
        s"tier $mille coverage $cov")
    }
    // the second half of the sweep is already stable on this data
    assert(rows.drop(4).forall(_.getAs[Long]("overlap_at_10") == 10L))
  }

  // ---------------------------------------------------------------- q457

  test("interference: exposure strictly between 0 and 1, consistent per arm") {
    val rows = run("q457_interference_exposure").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("arm")).sorted.toSeq == Seq(0L, 1L))
    val nUsers = Tables.events(spark, sfMid)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    for (r <- rows) {
      val exp = r.getAs[Long]("exposure_ppm")
      // the sparse cell graph must leave SOME users unexposed and
      // expose a majority (dense enough to matter)
      assert(exp > 300000L && exp < 1000000L, s"exposure $exp")
      assert(r.getAs[Long]("n_exposed") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("exposure_ppm") ==
        r.getAs[Long]("n_exposed") * 1000000L / r.getAs[Long]("n_users"))
    }
  }
}
