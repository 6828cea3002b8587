package graft

/** Semantics of the round-10 access-structure batch: MaxScore pruning
  * (q702), de Bruijn branching (q703), sort-key order advisor (q704). */
class StructureOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q702: the MaxScore split is exactly the cum-UB threshold rule") {
    val rows = run("q702_maxscore_pruning_audit").collect()
    assert(rows.length == 6)
    val theta = rows.head.getAs[Long]("theta")
    var cum = 0L
    var scannedEss = 0L
    rows.foreach { r => // output is ordered by ub asc
      cum += r.getAs[Long]("ub")
      assert(r.getAs[Long]("cum_ub") == cum, "cumulative UB broke")
      val ess = r.getAs[Long]("essential")
      assert(ess == (if (cum > theta) 1L else 0L), "split rule broke")
      if (ess == 1L) scannedEss += r.getAs[Long]("posting_len")
    }
    val r0 = rows.head
    assert(r0.getAs[Long]("scanned_maxscore") == scannedEss)
    assert(r0.getAs[Long]("scanned_maxscore")
      <= r0.getAs[Long]("scanned_exhaustive"))
    // the top term is always essential (its UB alone ends the prefix
    // only if ≤ θ — but the LAST cum necessarily exceeds θ: the top-10
    // threshold can't dominate the sum of all six UBs when ≥10 docs
    // exist)
    assert(rows.last.getAs[Long]("essential") == 1L)
  }

  test("q703: the out-degree histogram closes over the state census") {
    val rows = run("q703_debruijn_branching").collect()
    assert(rows.nonEmpty)
    val nStates = rows.head.getAs[Long]("n_states")
    assert(rows.map(_.getAs[Long]("n_states_at")).sum == nStates)
    val ppm = rows.head.getAs[Long]("unitig_ppm")
    assert(ppm >= 0 && ppm <= 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("n_states_at") > 0))
  }

  test("q704: costs decompose, prefixes nest, ranks are a permutation") {
    val rows = run("q704_sortkey_order_advisor").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("rk")).toSet == (1L to 6L).toSet)
    val n3s = rows.map(_.getAs[Long]("n3")).distinct
    assert(n3s.length == 1, "full-prefix NDV must not vary by order")
    rows.foreach { r =>
      val (n1, n2, n3) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("n3"))
      assert(r.getAs[Long]("run_cost") == n1 + n2 + n3)
      assert(n1 <= n2 && n2 <= n3, "prefix NDVs must be monotone")
    }
    // output sorted by rank = sorted by cost
    val costs = rows.map(_.getAs[Long]("run_cost")).toSeq
    assert(costs == costs.sorted)
  }
}
