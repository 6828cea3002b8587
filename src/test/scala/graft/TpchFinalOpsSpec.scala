package graft

import org.apache.spark.sql.functions._

/** Semantics of the TPC-H closers + SLO alerting (q452–q454) beyond the
  * oracle gate. */
class TpchFinalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q452

  test("tpch q6: filters reach the scan, revenue matches a direct recompute") {
    val r = run("q452_tpch_q6_revenue_change").collect().head
    assert(r.getAs[Long]("n_items") > 0L)
    val direct = Tables.lineitem(spark, sfMid)
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01" &&
        col("l_quantity") < 24d)
      .select(graft.functions.Deterministic.cents(col("l_extendedprice")).as("e"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("d"))
      .filter(col("d").between(5L, 7L))
      .agg(sum(expr("e * d"))).collect().head.getLong(0)
    assert(r.getAs[Long]("revenue_centicents") == direct)
    // pushdown evidence: the physical plan prunes to the 4 used columns
    val plan = run("q452_tpch_q6_revenue_change")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"),
      "scan-level filter pushdown expected")
  }

  // ---------------------------------------------------------------- q453

  test("tpch q13: distribution covers all customers, zero bucket exists") {
    val rows = run("q453_tpch_q13_customer_distribution").collect()
    val nCust = Tables.customer(spark, sfMid).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust,
      "every customer lands in exactly one count bucket")
    // non-urgent orders miss some customers at this SF -> a 0 bucket
    val zero = rows.find(_.getAs[Long]("c_count") == 0L)
    assert(zero.isDefined, "customers without qualifying orders must appear")
    // total orders reconcile
    val totalOrders = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    val expected = Tables.orders(spark, sfMid)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(totalOrders == expected)
  }

  // ---------------------------------------------------------------- q454

  test("burn rate: windows nest, alert logic consistent") {
    val rows = run("q454_slo_burn_rate_alerts").collect()
    val windows = rows.filter(_.getAs[Long]("short_days") == -1L)
      .map(r => r.getAs[Long]("long_days") -> r.getAs[Long]("long_burn")).toMap
    assert(windows.keySet == Set(1L, 7L, 28L))
    // this synthetic stream is stationary (~20% errors): all burns >> 1x
    assert(windows.values.forall(_ > 1000L))
    val alerts = rows.filter(_.getAs[Long]("short_days") != -1L)
    assert(alerts.length == 2)
    for (a <- alerts) {
      val expected = a.getAs[Long]("short_burn") >= a.getAs[Long]("threshold_milli") &&
        a.getAs[Long]("long_burn") >= a.getAs[Long]("threshold_milli")
      assert((a.getAs[Long]("fires") == 1L) == expected)
      assert(a.getAs[Long]("short_burn") == windows(a.getAs[Long]("short_days")))
      assert(a.getAs[Long]("long_burn") == windows(a.getAs[Long]("long_days")))
    }
  }
}
