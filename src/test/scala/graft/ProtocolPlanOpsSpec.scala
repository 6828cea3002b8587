package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 protocol audits (q594–q596) beyond the
  * oracle gate. */
class ProtocolPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q594

  test("secure agg: full participation cancels exactly, dropouts leak residue") {
    val rows = run("q594_secure_agg_dropout").orderBy(col("drop_pml")).collect()
    assert(rows.map(_.getAs[Long]("drop_pml")).toSeq == Seq(0L, 125L, 250L))
    val full = rows.head
    // the telescoping identity: all 16 clients present => masks cancel
    // to the exact true sum
    assert(full.getAs[Long]("n_active") == 16L)
    assert(full.getAs[Long]("mask_residue_cents") == 0L,
      s"pairwise masks must cancel exactly at full participation: $full")
    // any dropout leaves un-cancelled masks
    rows.tail.foreach { r =>
      assert(r.getAs[Long]("n_active") < 16L)
      assert(r.getAs[Long]("mask_residue_cents") > 0L,
        s"dropouts must break the cancellation: $r")
      // the residue is bounded by (dropped x active) masks of <= 10^6
      val dropped = 16L - r.getAs[Long]("n_active")
      assert(r.getAs[Long]("mask_residue_cents") <=
        dropped * r.getAs[Long]("n_active") * 1000000L)
    }
  }

  // ---------------------------------------------------------------- q595

  test("front door: recovers the mechanism truth while naive reads the confounder") {
    val rows = run("q595_front_door_adjustment").collect()
    val byE = rows.map(r => r.getAs[String]("estimator") ->
      r.getAs[Long]("est_cents")).toMap
    val truth = byE("mechanism_truth")
    assert(truth > 3500000L && truth < 4500000L,
      s"5M x ~0.8 flip gap should be ~4M: $truth")
    // the front-door estimate lands within 25% of the truth...
    assert(math.abs(byE("front_door") - truth) * 4 < truth,
      s"front door missed: ${byE("front_door")} vs $truth")
    // ...while the naive contrast is inflated several-fold by the
    // unobserved price-decile confounder
    assert(byE("naive") > 3L * truth,
      s"naive must read the confounder: ${byE("naive")} vs $truth")
  }

  // ---------------------------------------------------------------- q596

  test("mergeable top-k: every undercount sits inside the summed bound") {
    val rows = run("q596_mergeable_topk_audit").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("merged_est") <= r.getAs[Long]("true_count"),
        "truncated summaries can only undercount")
      assert(r.getAs[Long]("undercount") ==
        r.getAs[Long]("true_count") - r.getAs[Long]("merged_est"))
      assert(r.getAs[Long]("within_bound") == 1L,
        s"the mergeability contract must hold: $r")
    }
    assert(rows.map(_.getAs[Long]("merge_bound")).distinct.length == 1)
  }
}
