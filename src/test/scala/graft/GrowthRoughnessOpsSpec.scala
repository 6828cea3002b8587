package graft

/** Semantics of the round-9 corpus-growth (q667–q669) and roughness/
  * dependence (q670–q672) batches beyond the oracle gate. */
class GrowthRoughnessOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q667: prefixes nest — docs/tokens/vocab monotone, Heaps rate falls") {
    val rows = run("q667_heaps_vocab_growth").collect().sortBy(_.getAs[Long]("f8"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs") <= b.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
      assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
      // Heaps: vocabulary per million tokens cannot RISE as a prefix
      // grows — every token of the smaller prefix is in the larger one
      assert(a.getAs[Long]("vocab_per_mtoken") + 1L
        >= b.getAs[Long]("vocab_per_mtoken"),
        s"vocab rate rose from f8=${a.getAs[Long]("f8")}")
    }
    rows.foreach(r => assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens")))
  }

  test("q668: frequency-of-frequencies bounds hold per source") {
    val rows = run("q668_good_turing_unseen").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val v = r.getAs[Long]("vocab")
      val f1 = r.getAs[Long]("f1"); val f2 = r.getAs[Long]("f2")
      assert(v <= n); assert(f1 + f2 <= v)
      // hapax mass + dis-legomena mass cannot exceed the token count
      assert(f1 + 2 * f2 <= n)
      val u = r.getAs[Long]("unseen_ppm")
      assert(u >= 0L && u <= 1000000L, s"unseen $u")
      assert(r.getAs[Long]("r1_star_milli") >= 0L)
    }
  }

  test("q669: fixed-window TTR is a valid ppm with ordered summary") {
    val rows = run("q669_fixed_window_ttr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Long]("min_ttr_ppm"); val hi = r.getAs[Long]("max_ttr_ppm")
      val mean = r.getAs[Long]("mean_ttr_ppm")
      assert(lo >= 1L && hi <= 1000000L, s"ttr range [$lo, $hi]")
      assert(lo <= mean && mean <= hi)
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("q670: integer diffs make mean squares dominate mean abs; lags thin") {
    val rows = run("q670_variogram_madogram").collect().sortBy(_.getAs[Long]("h"))
    assert(rows.length == 5)
    rows.foreach { r =>
      // pointwise d² >= |d| for integer d, so the means inherit it
      assert(r.getAs[Long]("mean_sq_diff") >= r.getAs[Long]("mean_abs_diff"))
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
    assert(rows.head.getAs[Long]("n_pairs") >= rows.last.getAs[Long]("n_pairs"),
      "larger lags cannot have MORE day pairs than lag 1")
  }

  test("q671: block counts shrink, block means grow with block size") {
    val rows = run("q671_aggregated_variance_hurst").collect()
      .sortBy(_.getAs[Long]("m"))
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_blocks") >= b.getAs[Long]("n_blocks"))
    }
    assert(rows.last.getAs[Long]("mean_block_sum")
      > rows.head.getAs[Long]("mean_block_sum"),
      "16-day block sums must dwarf 1-day sums")
    rows.foreach(r => assert(r.getAs[Long]("var_block_sum") >= 0L))
  }

  test("q672: copula cells reconcile with their margins") {
    val rows = run("q672_empirical_copula_grid").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") >= 1L)
      assert(r.getAs[Long]("n_obs") <= r.getAs[Long]("n_row"))
      assert(r.getAs[Long]("n_obs") <= r.getAs[Long]("n_col"))
      assert(r.getAs[Long]("lift_ppm") >= 0L)
      val bx = r.getAs[Long]("bx"); val by = r.getAs[Long]("by")
      assert(bx >= 0L && bx <= 4L && by >= 0L && by <= 4L)
    }
    // each row-margin equals the sum of its cells (exact bookkeeping)
    rows.groupBy(_.getAs[Long]("bx")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("n_obs")).sum
        == cells.head.getAs[Long]("n_row"))
    }
    rows.groupBy(_.getAs[Long]("by")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("n_obs")).sum
        == cells.head.getAs[Long]("n_col"))
    }
  }
}
