package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 selection/projection audits (q567–q569)
  * beyond the oracle gate. */
class ProjectionPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q567

  test("jl distortion: medians near unbiased, quantiles ordered, panel full") {
    val rows = run("q567_jl_projection_distortion").orderBy(col("dprime")).collect()
    assert(rows.map(_.getAs[Long]("dprime")).toSeq == Seq(8L, 16L, 32L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 190L, "C(20,2) probe pairs")
      val (p10, p50, p90) = (r.getAs[Long]("p10_ppm"), r.getAs[Long]("p50_ppm"),
        r.getAs[Long]("p90_ppm"))
      assert(p10 <= p50 && p50 <= p90)
      assert(p10 > 0L, "sign projection of distinct vectors cannot collapse to 0")
      // E[d_proj^2] = d' * d_orig^2: the median ratio should sit within
      // a factor ~2 of unbiased at every target dim
      assert(p50 > 400000L && p50 < 2500000L,
        s"median ratio $p50 ppm is not JL-shaped at d'=${r.getAs[Long]("dprime")}")
    }
    // more projection dims cannot widen the concentration band
    val spread = rows.map(r => r.getAs[Long]("p90_ppm") - r.getAs[Long]("p10_ppm"))
    assert(spread(2) < spread(0),
      s"d'=32 must concentrate tighter than d'=8: ${spread.toSeq}")
  }

  // ---------------------------------------------------------------- q568

  test("secretary: all rules beat random picking; later cutoffs settle lower") {
    val rows = run("q568_secretary_stopping_audit").orderBy(col("r_pct")).collect()
    assert(rows.map(_.getAs[Long]("r_pct")).toSeq == Seq(25L, 37L, 50L))
    assert(rows.map(_.getAs[Long]("n_stages")).distinct.length == 1)
    val n = rows.head.getAs[Long]("n_stages")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_best") <= n)
      assert(r.getAs[Long]("best_pick_ppm") ==
        r.getAs[Long]("n_best") * 1000000L / n)
      // ~190 candidates/month: random picking wins ~0.5% of the time,
      // any look-then-leap rule should land within a factor of the 1/e
      // optimum (~37%) — require at least 20%
      assert(r.getAs[Long]("best_pick_ppm") > 200000L,
        s"rule r=${r.getAs[Long]("r_pct")} wins only ${r.getAs[Long]("best_pick_ppm")} ppm")
      assert(r.getAs[Long]("avg_pick_rank_milli") >= 1000L,
        "mean pick rank cannot beat rank 1")
    }
    // a later cutoff leaves fewer candidates to leap at: the settled
    // rank degrades monotonically in r on this stream
    val ranks = rows.map(_.getAs[Long]("avg_pick_rank_milli"))
    assert(ranks.sliding(2).forall { case Array(a, b) => b >= a },
      s"pick rank should degrade with the cutoff: ${ranks.toSeq}")
  }

  // ---------------------------------------------------------------- q569

  test("winner's curse: selection bias grows with arms and exceeds holdout") {
    val rows = run("q569_winners_curse_audit").orderBy(col("n_arms")).collect()
    assert(rows.map(_.getAs[Long]("n_arms")).toSeq == Seq(4L, 8L, 16L))
    rows.foreach { r =>
      assert(r.getAs[Long]("winner_arm") < r.getAs[Long]("n_arms"))
      // the winner was chosen AS the max: its estimation lift is
      // positive by construction
      assert(r.getAs[Long]("est_lift_ppm") > 0L)
      // the same arm on untouched data regresses toward the mean
      assert(r.getAs[Long]("holdout_lift_ppm") < r.getAs[Long]("est_lift_ppm"),
        s"holdout must shrink the winner's apparent lift: $r")
    }
    // max of more arms is more biased
    val lifts = rows.map(_.getAs[Long]("est_lift_ppm"))
    assert(lifts.sliding(2).forall { case Array(a, b) => b >= a },
      s"selection bias should grow with the number of arms: ${lifts.toSeq}")
  }

  test("winner's curse: arms and halves are genuinely crossed (no aliasing)") {
    import graft.operators.Sampling
    // the q569 bug class this guards: low bits of a Knuth hash alias the
    // key's own low bits, making half a function of arm16 — high-bit
    // extraction must produce all 32 (arm16, half) cells
    val cells = Tables.orders(spark, sfMid)
      .select(Sampling.keyHash(col("o_custkey")).as("h1"),
        Sampling.keyHash(col("o_custkey"), 2246822519L).as("h2"))
      .select(expr("h1 div 268435456").as("arm16"),
        expr("h2 div 2147483648").as("half"))
      .distinct().count()
    assert(cells == 32L, s"expected all 16x2 cells populated, got $cells")
  }
}
