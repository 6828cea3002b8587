package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 inference planners (q564–q566) beyond the
  * oracle gate. */
class InferencePlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q564

  test("degree mixing: cells partition the edge set and shares sum to ~1") {
    val rows = run("q564_degree_mixing_matrix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_bin") >= 0L && r.getAs[Long]("s_bin") >= 0L)
      assert(r.getAs[Long]("n_edges") >= 1L)
    }
    val totalShare = rows.map(_.getAs[Long]("edge_share_ppm")).sum
    // floor division loses < 1 ppm per cell
    assert(totalShare <= 1000000L && totalShare >= 1000000L - rows.length,
      s"shares must tile the edge set: $totalShare ppm over ${rows.length} cells")
    // the matrix recounts every edge exactly once: cross-check the total
    // against an independent count of the distinct 1995 edge list
    val edges = Tables.orders(spark, sfMid)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(Tables.lineitem(spark, sfMid)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")), Seq("ok"))
      .select(col("c"), col("s")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_edges")).sum == edges)
  }

  // ---------------------------------------------------------------- q565

  test("randomized response: debiasing recovers the rate, more privacy costs more") {
    val rows = run("q565_randomized_response_recovery").collect()
    assert(rows.length >= 150, "one row per (month, flip rate)")
    rows.foreach { r =>
      // the observed rate is squeezed toward q: obs = t(1-q) + (1-t)q
      val (tr, ob, q) = (r.getAs[Long]("true_ppm"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("q_ppm"))
      assert(r.getAs[Long]("abs_err_ppm") ==
        math.abs(r.getAs[Long]("est_ppm") - tr))
      // with true rates < 50%, the mechanism can only inflate the count
      // in expectation; allow sampling noise but not structural failure
      assert(ob >= 0L && ob <= 1000000L && q > 0L)
    }
    // aggregate recovery beats the raw observed rate, and the weaker
    // flip rate recovers more precisely on average
    val byQ = rows.groupBy(_.getAs[Long]("q_ppm")).map { case (q, rs) =>
      q -> (rs.map(_.getAs[Long]("abs_err_ppm")).sum / rs.length,
        rs.map(r => math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("true_ppm")))
          .sum / rs.length)
    }
    byQ.foreach { case (q, (estErr, obsErr)) =>
      assert(estErr < obsErr, s"q=$q: debiased $estErr must beat raw $obsErr")
    }
    assert(byQ(125000L)._1 < byQ(250000L)._1,
      s"less flipping must recover more precisely: $byQ")
  }

  // ---------------------------------------------------------------- q566

  test("poisson bootstrap: the band contains the point estimate and is tight") {
    val r = run("q566_poisson_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_reps") == 32L)
    val (p, lo, hi) = (r.getAs[Long]("point_mean_cents"),
      r.getAs[Long]("boot_lo_cents"), r.getAs[Long]("boot_hi_cents"))
    assert(lo <= p && p <= hi,
      s"the ~94% band [$lo, $hi] should contain the point mean $p")
    assert(r.getAs[Long]("band_cents") == hi - lo)
    // with ~15k orders the mean's uncertainty is ~1%, not 10%
    assert(hi - lo < p / 10L, s"band ${hi - lo} implausibly wide for mean $p")
    assert(hi - lo > 0L, "32 distinct resamples cannot all tie")
  }

  test("poisson bootstrap: replicate multiplicities are Poisson(1)-shaped") {
    // recompute one replicate's multiplicity distribution and check the
    // quantized pmf: ~36.8% zeros, ~36.8% ones, mean ~1
    val m0 = Tables.orders(spark, sfMid)
      .select(expr("o_orderkey % 2147483648").as("km"))
      .select(expr(
        """CASE WHEN (km * 2654435761L) % 4294967296 % 1000 < 368 THEN 0
           WHEN (km * 2654435761L) % 4294967296 % 1000 < 736 THEN 1
           WHEN (km * 2654435761L) % 4294967296 % 1000 < 920 THEN 2
           WHEN (km * 2654435761L) % 4294967296 % 1000 < 981 THEN 3
           WHEN (km * 2654435761L) % 4294967296 % 1000 < 996 THEN 4
           ELSE 5 END""").as("m"))
    val n = m0.count()
    val zeros = m0.filter(col("m") === 0).count()
    val meanMilli = m0.agg(expr("sum(m) * 1000 div count(1)")).collect().head.getLong(0)
    assert(math.abs(zeros * 1000L / n - 368L) < 30L,
      s"zero-multiplicity share ${zeros * 1000L / n} per mille, expected ~368")
    assert(math.abs(meanMilli - 1000L) < 60L,
      s"resample mass $meanMilli per mille of the original, expected ~1000")
  }
}
