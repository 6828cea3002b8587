package graft

import org.apache.spark.sql.functions._

/** Semantics of the optimization/search operators (q410–q412) beyond the
  * oracle gate: DP optimality properties, label-propagation invariants,
  * halving-schedule arithmetic. */
class OptimOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q410

  test("v-optimal histogram: error curve is non-increasing and k=1 dominates") {
    val rows = run("q410_v_optimal_histogram").orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L, 3L, 4L))
    val sse = rows.map(_.getAs[Double]("sse")).toSeq
    assert(sse.forall(_ >= 0d), s"SSE must be non-negative: $sse")
    assert(sse.zip(sse.tail).forall { case (a, b) => b <= a },
      s"more segments can never hurt: $sse")
    val red = rows.map(_.getAs[Long]("reduction_ppm")).toSeq
    assert(red.head == 0L && red == red.sorted,
      s"reduction vs k=1 must grow with k: $red")
    assert(red.forall(r => r >= 0L && r <= 1000000L))
  }

  test("v-optimal histogram: k=2 beats every single split's greedy SSE bound") {
    // the DP's 2-segment optimum must be ≤ the SSE of any specific split,
    // e.g. the midpoint split recomputed independently
    val o = Tables.orders(spark, sfMid)
      .select(expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("x"))
    val Array(mn, mx) = o.agg(min(col("x")), max(col("x"))).collect()
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    def sseBelow(lo: Long, hiEx: Long): Double = {
      val r = o.filter(col("x") >= lo && col("x") < hiEx)
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx")).collect().head
      val n = r.getAs[Long]("n")
      if (n == 0) 0d
      else r.getAs[Long]("sxx").toDouble -
        r.getAs[Long]("sx").toDouble * r.getAs[Long]("sx").toDouble / n.toDouble
    }
    val mid = mn + (mx - mn) / 2
    val greedy = sseBelow(mn, mid) + sseBelow(mid, mx + 1)
    val dp2 = run("q410_v_optimal_histogram")
      .filter(col("k") === 2).collect().head.getAs[Double]("sse")
    // DP optimizes over 32-cell boundaries; the midpoint is (close to) one
    // of them, so allow a 5% slack for the cell-quantized boundary
    assert(dp2 <= greedy * 1.05, s"DP k=2 SSE $dp2 should ≤ midpoint split $greedy")
  }

  // ---------------------------------------------------------------- q411

  test("lpa communities: sizes partition the node set, labels are members") {
    val rows = run("q411_lpa_communities").collect()
    val nNodes = Tables.supplier(spark, sfMid).count()
    assert(rows.map(_.getAs[Long]("size")).sum == nNodes,
      "community sizes must partition all suppliers")
    assert(rows.length >= 2, "three LPA rounds should not collapse everything")
    // labels are seed node ids, so they live in the supplier key range
    val Array(lo, hi) = Tables.supplier(spark, sfMid)
      .agg(min(col("s_suppkey")), max(col("s_suppkey"))).collect()
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    for (r <- rows) {
      val label = r.getAs[Long]("label")
      assert(label >= lo && label <= hi, s"label $label outside node universe")
      assert(r.getAs[Long]("size") >= 1L)
    }
  }

  // ---------------------------------------------------------------- q412

  test("successive halving: schedule arithmetic and monotone survivors") {
    val rows = run("q412_successive_halving").orderBy(col("rung")).collect()
    assert(rows.map(_.getAs[Long]("rung")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_eval")).toSeq == Seq(25L, 13L, 7L, 4L))
    assert(rows.map(_.getAs[Long]("n_kept")).toSeq == Seq(13L, 7L, 4L, 1L))
    for (r <- rows) {
      assert(r.getAs[Long]("rung_cost") ==
        r.getAs[Long]("n_eval") * r.getAs[Long]("horizon_days"))
      assert(r.getAs[Long]("kept_min_cents") >= 0L)
      assert(r.getAs[String]("top_brand").startsWith("Brand#"))
    }
    // cumulative metric at a longer horizon can only grow, so the kept
    // minimum is non-decreasing across rungs
    val mins = rows.map(_.getAs[Long]("kept_min_cents")).toSeq
    assert(mins.zip(mins.tail).forall { case (a, b) => b >= a },
      s"kept-min must be non-decreasing over growing horizons: $mins")
  }
}
