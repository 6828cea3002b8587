package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 estimation planners (q576–q578) beyond the
  * oracle gate. */
class EstimationPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q576

  test("control variate: the corrected shard means are closer overall") {
    val rows = run("q576_control_variate_audit").collect()
    assert(rows.length == 16)
    assert(rows.map(_.getAs[Long]("true_mean_cents")).distinct.length == 1)
    val plain = rows.map(_.getAs[Long]("plain_dev_cents")).sum
    val cv = rows.map(_.getAs[Long]("cv_dev_cents")).sum
    // corr(quantity, revenue) ~ 0.74 -> expect a >= 15% total reduction
    assert(cv * 100 < plain * 85,
      s"control variate should cut total shard deviation >=15%: $plain -> $cv")
    // and it must never be a catastrophic inflation on any single shard
    rows.foreach { r =>
      assert(r.getAs[Long]("cv_dev_cents") <
        5 * r.getAs[Long]("plain_dev_cents") + 10000L)
    }
  }

  // ---------------------------------------------------------------- q577

  test("german tank: max estimator tracks the keyspace, errors grow as samples shrink") {
    val rows = run("q577_german_tank_estimate").orderBy(col("rate_inv")).collect()
    assert(rows.map(_.getAs[Long]("rate_inv")).toSeq == Seq(64L, 256L, 1024L))
    assert(rows.map(_.getAs[Long]("true_max_key")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") > 0L)
      // m + m/k - 1 with m <= true max can overshoot by at most m/k
      assert(r.getAs[Long]("est_max_key") <=
        r.getAs[Long]("true_max_key") +
          r.getAs[Long]("true_max_key") / r.getAs[Long]("n_sampled"))
      assert(r.getAs[Long]("est_count") ==
        r.getAs[Long]("n_sampled") * r.getAs[Long]("rate_inv"))
    }
    // even 15 samples pin the keyspace within ~2%
    assert(rows.forall(_.getAs[Long]("max_err_ppm") < 50000L),
      rows.map(_.getAs[Long]("max_err_ppm")).toSeq.toString)
  }

  // ---------------------------------------------------------------- q578

  test("chain ladder: completions are sane and improve with observed age") {
    val rows = run("q578_chain_ladder_ltv").collect()
    assert(rows.nonEmpty, "the backtest era must contain test cohorts")
    rows.foreach { r =>
      assert(r.getAs[Long]("obs_age") >= 1L && r.getAs[Long]("obs_age") < 8L)
      // development factors are >= 1 (cumulative revenue never shrinks),
      // so the completion can only grow the observed cumulative
      assert(r.getAs[Long]("pred_ult_cents") >= r.getAs[Long]("cum_obs"),
        s"completion cannot shrink observed development: $r")
      assert(r.getAs[Long]("actual_ult_cents") >= r.getAs[Long]("cum_obs"))
      // a 2-year LTV forecast from >= 1 quarter of development should
      // land within 2x, not an order of magnitude
      assert(r.getAs[Long]("abs_err_ppm") < 1000000L,
        s"chain-ladder prediction off by >100%: $r")
    }
    // the most-developed test cohort predicts best on this stream
    val byAge = rows.sortBy(_.getAs[Long]("obs_age"))
    assert(byAge.last.getAs[Long]("abs_err_ppm") <=
      byAge.head.getAs[Long]("abs_err_ppm"),
      "more observed development should not predict worse")
  }
}
