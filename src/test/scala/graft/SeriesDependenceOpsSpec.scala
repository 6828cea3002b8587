package graft

/** Semantics of the round-8 series/dependence batch (q662–q663) beyond
  * the oracle gate. */
class SeriesDependenceOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q662: words conserve segments; alphabet stays within a..d") {
    val rows = run("q662_sax_motif_census").collect()
    // 73 PAA segments yield 71 complete 3-symbol words
    assert(rows.map(_.getAs[Long]("n")).sum == 71L)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.length == 3 && w.forall(c => c >= 'a' && c <= 'd'), w)
      assert(r.getAs[Boolean]("is_discord") == (r.getAs[Long]("n") == 1L))
      assert(r.getAs[Long]("first_seg") >= 0L && r.getAs[Long]("first_seg") <= 70L)
    }
    // census is ordered most-frequent first: the head is the motif
    assert(rows.map(_.getAs[Long]("n")).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q663: quadrant counts partition the non-tied orders") {
    val r = run("q663_blomqvist_beta").collect().head
    val n = r.getAs[Long]("n_orders")
    val ties = r.getAs[Long]("n_ties")
    val c = r.getAs[Long]("concordant"); val d = r.getAs[Long]("discordant")
    assert(c + d + ties == n, "every order is tied, concordant, or discordant")
    val beta = r.getAs[Long]("beta_ppm")
    assert(beta >= -1000000L && beta <= 1000000L)
    assert(beta == (c - d) * 1000000L / (c + d))
    // this synthetic generator draws o_totalprice independently of the
    // lineitems (unlike real TPC-H, where the header sums the lines),
    // so the right answer here is β ≈ 0 — the statistic detecting that
    // independence IS the test (measured ≈ −0.02 at sf0.01)
    assert(math.abs(beta) < 100000L,
      s"independent columns should read near-zero beta, got $beta")
  }
}
