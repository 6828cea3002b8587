package graft

/** Semantics of the round-10 rank-test batch: Kruskal–Wallis (q693),
  * Jonckheere–Terpstra (q694), Mood's squared-rank scale test (q695).
  * Each test pins an EXACT algebraic identity of the rank calculus, not
  * just shape — the identities hold for any data, so a regression in
  * the histogram-rank plumbing cannot hide behind plausible numbers. */
class RankTestOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q693: doubled-rank sums close the N(N+1) identity; H is sane") {
    val rows = run("q693_kruskal_wallis").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("flag")).toSet == Set("A", "N", "R"))
    val nTotal = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n")).sum == nTotal)
    // sum over everyone of the doubled tie-averaged rank is exactly
    // 2·(1+2+…+N) = N(N+1) — tie averaging redistributes, never leaks
    val r2Total = rows.map(_.getAs[Long]("r2_sum")).sum
    assert(r2Total == nTotal * (nTotal + 1),
      s"doubled ranks leaked: $r2Total vs ${nTotal * (nTotal + 1)}")
    val h = rows.head.getAs[Double]("h_stat")
    assert(!h.isNaN && !h.isInfinite && h >= 0.0, s"H = $h")
    assert(rows.map(_.getAs[Double]("h_stat")).distinct.length == 1)
  }

  test("q694: JT sits inside [0, 2·E0] and the z is finite") {
    val r = run("q694_jonckheere_terpstra").collect().head
    val jt2 = r.getAs[Long]("jt2")
    val e2 = r.getAs[Long]("e2")
    assert(e2 > 0)
    assert(jt2 >= 0 && jt2 <= 2 * e2, s"jt2 $jt2 outside [0, ${2 * e2}]")
    val z = r.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
    // quantity and discount are independent in the generator: the
    // standardized trend must be modest (|z| < 6 is ~10⁻⁸ tail room)
    assert(math.abs(z) < 6.0, s"independent columns gave |z| = $z")
  }

  test("q696: rank sums close the b·k(k+1)/2 identity; z is finite") {
    val rows = run("q696_pages_l_trend").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("yr")).toSeq
      == (1995L to 2000L).toSeq)
    // every block hands out ranks 1..k exactly once
    val rTotal = rows.map(_.getAs[Long]("r_sum")).sum
    assert(rTotal % (6 * 7 / 2) == 0, s"rank total $rTotal not b·21")
    val b = rTotal / 21
    assert(b >= 20 && b <= 25, s"blocks $b") // 25 nations, some may be empty
    val l = rows.head.getAs[Long]("l_stat")
    // L is bounded by the perfectly anti-monotone and monotone layouts
    assert(l >= b * (1 * 6 + 2 * 5 + 3 * 4 + 4 * 3 + 5 * 2 + 6 * 1))
    assert(l <= b * (1 * 1 + 2 * 2 + 3 * 3 + 4 * 4 + 5 * 5 + 6 * 6))
    val z = rows.head.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("q697: year actives are plausible and Q is a nonneg ppm") {
    val rows = run("q697_cochran_q").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("yr")).toSeq == Seq(1995L, 1996L, 1997L))
    rows.foreach { r =>
      assert(r.getAs[Long]("g") > 0)
      assert(r.getAs[Long]("q_ppm") >= 0)
      assert(r.getAs[Long]("discordant") >= 0)
    }
    assert(rows.map(_.getAs[Long]("q_ppm")).distinct.length == 1)
  }

  test("q716: doubled ranks close n(n+1) and W+ sits inside its range") {
    val r = run("q716_wilcoxon_signed_rank").collect().head
    val n = r.getAs[Long]("n_pairs")
    val w2 = r.getAs[Long]("w2_plus")
    val s2 = r.getAs[Long]("s2_total")
    assert(n > 0)
    assert(s2 == n * (n + 1), s"doubled ranks leaked: $s2 vs ${n * (n + 1)}")
    assert(w2 >= 0 && w2 <= s2)
    val z = r.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
    // 1995 vs 1996 revenue cells are generator-stationary: |z| modest
    assert(math.abs(z) < 6.0, s"stationary panel gave |z| = $z")
  }

  test("q695: dispersion shares bracket ppm parity and close exactly") {
    val rows = run("q695_mood_scale_test").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("status")).toSet == Set("F", "O"))
    val disp = rows.map(_.getAs[Long]("disp_ppm"))
    assert(disp.min <= 1000000L && 1000000L <= disp.max,
      s"shares ${disp.toSeq} don't bracket parity")
    // Σ n_j·disp_j = N·10⁶ − (floor slack < Σ n_j): the exact-mean
    // identity E[M_j] = n_j·S/N, surviving the per-group floor
    val n = rows.map(_.getAs[Long]("n"))
    val nTotal = n.sum
    val weighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Long]("disp_ppm")).sum
    assert(weighted <= nTotal * 1000000L &&
      weighted > nTotal * 1000000L - nTotal,
      s"weighted shares $weighted vs ${nTotal * 1000000L}")
  }
}
