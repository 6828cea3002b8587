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

  // ---------------------------------------------------------------- q549

  test("spec-dec sweep: tokens/step monotone in k, net speedup peaks") {
    val rows = run("q549_specdec_draft_length_sweep").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    for ((_, rs) <- bySrc) {
      val byK = rs.sortBy(_.getAs[Long]("k"))
      assert(byK.map(_.getAs[Long]("k")).toSeq == Seq(2L, 4L, 8L))
      // a longer draft can only add accepted tokens
      val tps = byK.map(_.getAs[Long]("tokens_per_step_milli"))
      assert(tps.sliding(2).forall { case Array(a, b) => b >= a }, tps.toSeq.toString)
      // E_k is bounded by k+1 target-equivalents
      byK.foreach(r => assert(r.getAs[Long]("tokens_per_step_milli")
        <= (r.getAs[Long]("k") + 1L) * 1000L))
      // net speedup must beat vanilla decoding somewhere only if
      // acceptance is decent; it must always be positive
      assert(byK.forall(_.getAs[Long]("net_speedup_milli") > 0L))
    }
  }

  // ---------------------------------------------------------------- q550

  test("shuffle audit: hashing recovers the diversity clustering destroys") {
    val rows = run("q550_shuffle_quality_audit").collect()
    val byPolicy = rows.groupBy(_.getAs[String]("policy"))
    assert(byPolicy.keySet == Set("clustered", "hashed"))
    val cl = byPolicy("clustered").map(_.getAs[Long]("mean_distinct_sources_milli"))
    val ha = byPolicy("hashed").map(_.getAs[Long]("mean_distinct_sources_milli"))
    // per shard, hashed batches must see at least 2x the sources
    assert(ha.min >= 2L * cl.max,
      s"hashed ${ha.toSeq} should dominate clustered ${cl.toSeq}")
    // batch counts match across policies per shard
    assert(byPolicy("clustered").map(_.getAs[Long]("n_batches")).sum
      == byPolicy("hashed").map(_.getAs[Long]("n_batches")).sum)
  }

  // ---------------------------------------------------------------- q551

  test("AGM audit: actual <= AGM ceiling, wedges dominate triangles") {
    val r = run("q551_agm_bound_audit").collect().head
    val m = r.getAs[Long]("m")
    val agm = r.getAs[Long]("agm_bound")
    // the bound is exactly floor(m^1.5)
    assert(agm * agm <= m * m * m && (agm + 1) * (agm + 1) > m * m * m)
    // AGM is a worst-case ceiling: the real instance must respect it
    assert(r.getAs[Long]("n_triangles") <= agm)
    // every triangle closes a wedge
    assert(r.getAs[Long]("n_triangles") <= r.getAs[Long]("wedges"))
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
    // the probe panel is a fixed BUDGET (64), not a fraction: candidate
    // pairs stay linear in N instead of N²/50
    assert(rows.map(_.getAs[Long]("n_probes")).sum <= 64L,
      "probe budget exceeded — the fixed-panel selection regressed")
  }
}
