package graft

import org.apache.spark.sql.functions._

/** Semantics of the signal/record operators (q390–q392) beyond the
  * oracle gate: Kadane optimality re-derived over the reported span,
  * survivorship rules, quantile ordering. */
class SignalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q390

  test("campaign window: reported span reproduces the reported sum exactly") {
    val r = run("q390_best_campaign_window").collect().head
    val start = r.getAs[java.sql.Date]("start_day")
    val end = r.getAs[java.sql.Date]("end_day")
    assert(!start.after(end))
    assert(r.getAs[Int]("span_days") >= 1)
    // independent recomputation of the span's above-mean sum
    val daily = Tables.orders(spark, sfMid)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(graft.functions.Deterministic.cents(col("o_totalprice"))).as("rev_c"))
    val t = daily.agg(sum(col("rev_c")).as("total_c"), count(lit(1)).as("nd"))
      .collect().head
    val (total, nd) = (t.getAs[Long]("total_c"), t.getAs[Long]("nd"))
    val spanSum = daily
      .filter(col("day") >= lit(start) && col("day") <= lit(end))
      .agg(sum(col("rev_c") * nd - total).as("s")).collect().head.getAs[Long]("s")
    assert(spanSum / nd == r.getAs[Long]("best_sum_c"))
    assert(r.getAs[Long]("best_sum_c") > 0L, "some above-mean span must exist")
  }

  // ---------------------------------------------------------------- q391

  test("golden record: groups are real duplicates with non-null merged fields") {
    val rows = run("q391_golden_record_merge").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("canonical_id")).toSeq
    assert(ids == ids.sorted && ids.distinct.length == ids.length)
    for (r <- rows) {
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[String]("lang_majority") != null)
      assert(r.getAs[String]("source_majority") != null)
      assert(r.getAs[Long]("max_chars") > 0L)
    }
  }

  // ---------------------------------------------------------------- q392

  test("conditional quantiles: ordered within every bin, counts conserve") {
    val rows = run("q392_conditional_price_quantiles").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val q = r.getAs[Long]("qty")
      assert(q >= 1L && q <= 50L)
      assert(r.getAs[Long]("p25_c") <= r.getAs[Long]("p50_c"))
      assert(r.getAs[Long]("p50_c") <= r.getAs[Long]("p75_c"))
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.lineitem(spark, sfMid).count())
  }
}
