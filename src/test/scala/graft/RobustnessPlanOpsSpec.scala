package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 robustness audits (q585–q587) beyond the
  * oracle gate. */
class RobustnessPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q585

  test("breakdown: the mean explodes, the median barely moves") {
    val rows = run("q585_estimator_breakdown_audit").orderBy(col("rate_ppm")).collect()
    assert(rows.map(_.getAs[Long]("rate_ppm")).toSeq == Seq(0L, 10000L, 50000L))
    val zero = rows.head
    // no contamination: all three estimators agree with the clean mean
    // up to the mean-median gap of the underlying distribution
    assert(zero.getAs[Long]("mean_err_ppm") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("median_err_ppm") < 150000L,
        s"median should stay near the clean mean: $r")
      assert(r.getAs[Long]("trimmed_err_ppm") < 200000L)
    }
    // 1% of values x100 adds ~ 0.99 x clean mean to the average
    val at1pct = rows(1)
    assert(at1pct.getAs[Long]("mean_err_ppm") > 500000L,
      s"1% x100 contamination must blow up the mean: $at1pct")
    assert(at1pct.getAs[Long]("mean_err_ppm") >
      10L * at1pct.getAs[Long]("median_err_ppm"))
    // contamination monotonically worsens the mean
    val meanErr = rows.map(_.getAs[Long]("mean_err_ppm"))
    assert(meanErr.sliding(2).forall { case Array(a, b) => b >= a })
  }

  // ---------------------------------------------------------------- q586

  test("quantile regression: slopes are tau-monotone and bracket the ratio") {
    val rows = run("q586_quantile_regression_grid").orderBy(col("tau_pml")).collect()
    assert(rows.map(_.getAs[Long]("tau_pml")).toSeq == Seq(100L, 500L, 900L))
    val slopes = rows.map(_.getAs[Long]("best_slope_milli"))
    // a higher quantile line cannot lie below a lower one
    assert(slopes.sliding(2).forall { case Array(a, b) => b >= a },
      s"quantile slopes must be monotone in tau: ${slopes.toSeq}")
    assert(slopes.head > slopes.last - 3000L)
    // all within the chars-per-token band the corpus actually has
    slopes.foreach(s => assert(s >= 3000L && s <= 6000L))
    rows.foreach(r => assert(r.getAs[Long]("pinball_loss_pml") > 0L))
  }

  test("quantile regression: the grid argmin really minimizes pinball loss") {
    import graft.functions.expressions.token_count
    // recompute tau=0.5's loss for the winner and both grid neighbors
    val best = run("q586_quantile_regression_grid")
      .filter(col("tau_pml") === 500L).collect().head.getAs[Long]("best_slope_milli")
    val xs = Tables.documents(spark, sfMid)
      .select(col("n_chars").as("y"), token_count(col("text")).cast("long").as("x"))
      .filter(col("x") >= 1L).collect().map(r => (r.getLong(0), r.getLong(1)))
    def loss(s: Long) = xs.map { case (y, x) =>
      val r = y - x * s / 1000L
      if (r >= 0) 500L * r else -500L * r
    }.sum
    for (nb <- Seq(best - 250L, best + 250L) if nb >= 3000L && nb <= 6000L)
      assert(loss(best) <= loss(nb),
        s"slope $best (loss ${loss(best)}) beaten by neighbor $nb (${loss(nb)})")
  }

  // ---------------------------------------------------------------- q587

  test("placebo rd: no jump where none exists; the global contrast is the trap") {
    val rows = run("q587_placebo_rd_audit").orderBy(col("bw_pct")).collect()
    assert(rows.map(_.getAs[Long]("bw_pct")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("global_diff_cents")).distinct.length == 1)
    val global = math.abs(rows.head.getAs[Long]("global_diff_cents"))
    assert(global > 0L, "the trend guarantees a nonzero global contrast")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_local") > 0L)
      // every local estimate is closer to zero than the trend-absorbing
      // global comparison
      assert(math.abs(r.getAs[Long]("local_jump_cents")) < global,
        s"local RD must beat the global contrast: $r vs $global")
    }
    // and the narrowest bandwidth is the least trend-contaminated
    assert(math.abs(rows.head.getAs[Long]("local_jump_cents")) <=
      math.abs(rows.last.getAs[Long]("local_jump_cents")),
      "narrowing the bandwidth cannot add trend bias on a linear trend")
  }
}
