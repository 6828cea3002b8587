package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 engine planners (q541–q543) beyond the
  * oracle gate. */
class EnginePlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q541

  test("agg advisor: NDV ordering sane, all keys fit at this SF") {
    val rows = run("q541_agg_strategy_advisor").collect()
    assert(rows.length == 4)
    val ndv = rows.map(r => r.getAs[String]("group_key") -> r.getAs[Long]("ndv")).toMap
    // cardinality must rise flag < suppkey < partkey < orderkey
    assert(ndv("l_returnflag") < ndv("l_suppkey"))
    assert(ndv("l_suppkey") < ndv("l_partkey"))
    assert(ndv("l_partkey") < ndv("l_orderkey"))
    for (r <- rows) {
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[String]("strategy") == "hash",
        "at sf0.01 every candidate fits the per-task hash budget")
    }
  }

  // ---------------------------------------------------------------- q542

  test("Shapley: efficiency identity exact, channels sum to full minus empty") {
    val rows = run("q542_shapley_attribution").collect()
    assert(rows.map(_.getAs[String]("channel")).sorted.toSeq
      == Seq("click", "signup", "view"))
    val r0 = rows.head.getAs[Long]("v_empty_ppm")
    val r7 = rows.head.getAs[Long]("v_full_ppm")
    assert(rows.forall(_.getAs[Long]("v_empty_ppm") == r0))
    // Σφ·6 telescopes to exactly 6·(v(full) − v(∅)) — the efficiency
    // axiom, exact in integers because every weight is in sixths
    val phiSum = rows.map(_.getAs[Long]("phi_sixths_ppm")).sum
    assert(phiSum == 6L * (r7 - r0), s"efficiency: $phiSum vs ${6L * (r7 - r0)}")
  }

  // ---------------------------------------------------------------- q544

  test("OLS: positive fit, quantity drives price, R2 meaningful") {
    val r = run("q544_ols_normal_equations").collect().head
    assert(r.getAs[Long]("n_orders") > 0L)
    // more quantity must predict more revenue on TPC-H-shaped data
    assert(r.getAs[Long]("beta2_milli") > 0L,
      s"beta2 ${r.getAs[Long]("beta2_milli")}")
    assert(r.getAs[Long]("sse") >= 0L)
    assert(r.getAs[Long]("sse") <= r.getAs[Long]("sst"),
      "the fitted model cannot be worse than the mean (up to rounding)")
    val r2 = r.getAs[Long]("r2_ppm")
    assert(r2 > 0L && r2 <= 1000000L, s"r2_ppm $r2")
  }

  // ---------------------------------------------------------------- q545

  test("OLS audit: residuals sum to ~zero overall, segments partition orders") {
    val fitRow = run("q544_ols_normal_equations").collect().head
    val rows = run("q545_ols_segment_residual_audit").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum == fitRow.getAs[Long]("n_orders"))
    for (r <- rows) assert(r.getAs[Long]("over_ppm") <= 1000000L)
    // OLS residuals sum to zero by construction; milli-beta rounding
    // leaves at most ~1 dollar per order of drift
    val total = rows.map(_.getAs[Long]("sum_residual")).sum
    assert(math.abs(total) <= fitRow.getAs[Long]("n_orders"),
      s"residual drift $total over ${fitRow.getAs[Long]("n_orders")} orders")
  }

  // ---------------------------------------------------------------- q543

  test("salting plan: caps respected, replicas consistent") {
    val r = run("q543_salting_factor_plan").collect().head
    assert(r.getAs[Long]("hot_keys") <= r.getAs[Long]("n_keys"))
    // every salted task is capped at the 2000-row target
    assert(r.getAs[Long]("max_task_rows_after") <= 2000L)
    assert(r.getAs[Long]("max_task_rows_after") <= r.getAs[Long]("max_key_rows"))
    assert(r.getAs[Long]("total_tasks")
      == r.getAs[Long]("n_keys") + r.getAs[Long]("build_replicas"))
    assert(r.getAs[Long]("skew_reduction_milli") >= 1000L)
  }
}
