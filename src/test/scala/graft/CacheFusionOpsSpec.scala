package graft

/** Semantics of the round-8 cache-analytics (q645–q647) and rank-fusion
  * (q648–q650) batches beyond the oracle gate. */
class CacheFusionOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q645: hit ratio identity and bounds per prefix length") {
    val rows = run("q645_prefix_cache_reuse").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val p = r.getAs[Long]("n_prefixes")
      assert(p >= 1L && p <= n)
      assert(r.getAs[Long]("hit_ppm") == (n - p) * 1000000L / n)
      assert(r.getAs[Long]("max_prefix_mass") >= 1L
        && r.getAs[Long]("max_prefix_mass") <= n)
    }
  }

  test("q646: gap shares sum to ~1e6 and buckets bound their max gap") {
    val rows = run("q646_reuse_distance_census").collect()
    val total = rows.map(_.getAs[Long]("share_ppm")).sum
    // each bucket floors once, so the sum can fall short by < #buckets
    assert(total <= 1000000L && total > 1000000L - rows.length)
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_gap_s")
      val mx = r.getAs[Long]("max_gap_s")
      assert(java.lang.Long.toBinaryString(mx + 1).length - 1 == b,
        s"max gap $mx escapes bucket $b")
    }
  }

  test("q647: staleness monotone nonincreasing in TTL, cold count fixed") {
    val rows = run("q647_ttl_staleness_audit").collect()
      .sortBy(_.getAs[Long]("ttl_s"))
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n_stale")).sliding(2)
      .forall(p => p(0) >= p(1)), "longer TTL cannot create staleness")
    assert(rows.map(_.getAs[Long]("n_cold")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("n_warm_reads")).distinct.length == 1)
  }

  test("q648: cascade recall monotone nondecreasing in depth") {
    val rows = run("q648_cascade_recall_sweep").collect()
      .sortBy(_.getAs[Long]("depth"))
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("recall_ppm")).sliding(2)
      .forall(p => p(0) <= p(1)), "deeper candidate list cannot lose hits")
    rows.foreach(r => assert(
      r.getAs[Long]("total_hits") <= 10L * r.getAs[Long]("n_probes")))
    // at depth 10 the cheap list is exactly the dot top-10, so hits
    // equal the two lists' intersection — strictly fewer than perfect
    // unless the rankers agree
    assert(rows.head.getAs[Long]("recall_ppm") <= 1000000L)
  }

  test("q649: RRF scores ordered within probe, membership flags sane") {
    val rows = run("q649_reciprocal_rank_fusion").collect()
    assert(rows.length == 15) // 5 probes x fused top-3
    rows.groupBy(_.getAs[Long]("pid")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("fused_rank"))
      assert(byRank.map(_.getAs[Long]("rrf_ppm")).sliding(2)
        .forall(p => p(0) >= p(1)))
    }
    rows.foreach { r =>
      val d = r.getAs[Long]("in_dot"); val m = r.getAs[Long]("in_ms")
      assert(Set(0L, 1L)(d) && Set(0L, 1L)(m) && d + m >= 1L)
      // max possible: rank 1 in both lists
      assert(r.getAs[Long]("rrf_ppm") <= 2L * (1000000L / 61L))
    }
  }

  test("q650: footrule and Jaccard bounded by the top-20 geometry") {
    val rows = run("q650_rank_disagreement_footrule").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_common")
      assert(c >= 1L && c <= 20L)
      // each shared candidate's rank displacement is < 20
      assert(r.getAs[Long]("footrule") <= 19L * c)
      assert(r.getAs[Long]("jaccard_ppm") == c * 1000000L / (40L - c))
    }
  }
}
