package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 capacity/quality analytics (q546–q548)
  * beyond the oracle gate. */
class CapacityPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q546

  test("Kingman: wait explodes with utilization, CV terms sane") {
    val rows = run("q546_kingman_queue_wait").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.size == 5, s"expected 5 event types, got ${byType.keySet}")
    for ((_, rs) <- byType) {
      val byRho = rs.sortBy(_.getAs[Long]("rho_milli"))
      assert(byRho.map(_.getAs[Long]("rho_milli")).toSeq == Seq(500L, 800L, 950L))
      // the hockey stick: wait strictly increases with utilization
      // (whenever there is any variability at all)
      val wq = byRho.map(_.getAs[Long]("wq_per_service_milli"))
      assert(wq.sliding(2).forall { case Array(a, b) => b >= a }, wq.toSeq.toString)
      // ρ = 0.95 multiplies variability 19×/2 vs ρ = 0.5's 1×/2
      assert(wq.last >= 9L * math.max(wq.head, 1L) || wq.head == 0L)
      for (r <- rs) assert(r.getAs[Long]("ca2_milli") >= -1000L)
    }
  }

  // ---------------------------------------------------------------- q547

  test("class-balanced: weights normalized, bigger classes never weigh more") {
    val rows = run("q547_class_balanced_weights").collect()
    assert(rows.nonEmpty)
    val totalW = rows.map(_.getAs[Long]("weight_ppm")).sum
    // floored normalization undershoots by < 1 ppm per class
    assert(totalW <= 1000000L && totalW >= 1000000L - rows.length,
      s"weight sum $totalW")
    for (r <- rows) {
      assert(r.getAs[Long]("beta_pow_ppm") <= 1000000L)
      assert(r.getAs[Long]("eff_number_milli") >= 0L)
    }
    // weight is anti-monotone in class size
    val bySize = rows.sortBy(_.getAs[Long]("n_vectors"))
    assert(bySize.map(_.getAs[Long]("weight_ppm")).sliding(2).forall {
      case Array(a, b) => b <= a
    }, "bigger classes must not get bigger weights")
  }

  // ---------------------------------------------------------------- q548

  test("kNN noise: consensus and noise complementary, rates bounded") {
    val rows = run("q548_knn_label_noise").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val c = r.getAs[Long]("consensus_ppm")
      assert(c >= 0L && c <= 1000000L)
      assert(c + r.getAs[Long]("noise_estimate_ppm") == 1000000L)
      assert(r.getAs[Long]("n_probes") > 0L)
    }
  }
}
