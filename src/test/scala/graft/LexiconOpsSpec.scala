package graft

/** Semantics of the round-10 lexical-spectrum batch. */
class LexiconOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  test("q711: shift shares are valid ppm over nonempty pair panels") {
    val rows = SparkEntry.queries("q711_texttiling_shift_census")(
      spark, sfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pairs = r.getAs[Long]("n_pairs")
      val shifts = r.getAs[Long]("n_shifts")
      val ppm = r.getAs[Long]("shift_ppm")
      assert(pairs > 0)
      assert(shifts >= 0 && shifts <= pairs)
      assert(ppm == shifts * 1000000L / pairs, "ppm must be the floored share")
    }
  }

  test("q698: spectrum moments are consistent and K is positive") {
    val rows = SparkEntry.queries("q698_yules_k")(spark, sfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val v = r.getAs[Long]("n_types")
      val k = r.getAs[Long]("k_milli")
      assert(v >= 1 && v <= n, s"types $v vs tokens $n")
      // S₂ ≥ N always (Cauchy–Schwarz floor m² ≥ m) → K ≥ 0; and a
      // natural-language source repeats SOME type → strictly positive
      assert(k > 0, s"K $k for ${r.getAs[String]("source")}")
      // K = 10⁴·(S₂−N)/N² ≤ 10⁴·(N²−N)/N² < 10⁴ → k_milli < 10⁷
      assert(k < 10000000L, s"K $k exceeds the algebraic ceiling")
    }
  }
}
