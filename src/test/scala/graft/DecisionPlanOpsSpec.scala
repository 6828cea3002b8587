package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 decision audits (q597–q599) beyond the
  * oracle gate. */
class DecisionPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q597

  test("cost thresholds: dearer false drops lower the gate, dearer keeps raise it") {
    val rows = run("q597_cost_threshold_chooser").collect()
    val byR = rows.map(r => r.getAs[String]("regime") -> r).toMap
    val (bal, fn, fp) = (byR("balanced"), byR("fn_heavy"), byR("fp_heavy"))
    assert(fn.getAs[Long]("best_threshold_chars")
      <= bal.getAs[Long]("best_threshold_chars"),
      "pricier false drops cannot raise the keep threshold")
    assert(fp.getAs[Long]("best_threshold_chars")
      >= bal.getAs[Long]("best_threshold_chars"),
      "pricier false keeps cannot lower the keep threshold")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_loss") ==
        r.getAs[Long]("c_false_drop") * r.getAs[Long]("false_drops") +
          r.getAs[Long]("c_false_keep") * r.getAs[Long]("false_keeps"))
      assert(r.getAs[Long]("min_loss") > 0L,
        "the gate signal is imperfect, so some loss is unavoidable")
    }
    // the regime-optimal choices trade the error types as designed
    assert(fn.getAs[Long]("false_drops") <= bal.getAs[Long]("false_drops"))
    assert(fp.getAs[Long]("false_keeps") <= bal.getAs[Long]("false_keeps"))
  }

  // ---------------------------------------------------------------- q598

  test("nearest centroid: predictions partition the test half consistently") {
    val rows = run("q598_nearest_centroid_confusion").collect()
    assert(rows.length == 10, "one row per label")
    val nTrue = rows.map(_.getAs[Long]("n_true")).sum
    val nPred = rows.map(_.getAs[Long]("n_pred")).sum
    assert(nTrue == nPred, "every test vector gets exactly one prediction")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_pred"))
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_hit") * 1000000L / r.getAs[Long]("n_true"))
    }
    // the embeddings carry little label signal — the honest baseline
    // should land near (but not catastrophically below) the 10% chance
    // rate, which is exactly what a fancier model must beat
    val acc = rows.map(_.getAs[Long]("n_hit")).sum * 1000000L / nTrue
    assert(acc > 50000L && acc < 500000L,
      s"nearest-centroid accuracy $acc ppm out of plausible range")
  }

  // ---------------------------------------------------------------- q599

  test("dp geometric: more epsilon buys accuracy; zero-noise months exist") {
    val rows = run("q599_dp_geometric_utility").orderBy(col("alpha_den")).collect()
    assert(rows.map(_.getAs[Long]("alpha_den")).toSeq == Seq(2L, 4L))
    assert(rows.map(_.getAs[Long]("n_groups")).distinct.length == 1)
    val (tight, loose) = (rows(1), rows(0)) // alpha 1/4 = bigger epsilon
    assert(tight.getAs[Long]("total_abs_err") <
      loose.getAs[Long]("total_abs_err"),
      "doubling epsilon must shrink total error")
    assert(tight.getAs[Long]("max_abs_err") <=
      loose.getAs[Long]("max_abs_err"))
    rows.foreach { r =>
      // geometric(1/2) noise magnitude is <= 19 by construction
      assert(r.getAs[Long]("max_abs_err") <= 19L)
      assert(r.getAs[Long]("mean_rel_err_ppm") < 100000L,
        "monthly counts are large enough that DP noise stays under 10%")
    }
  }
}
