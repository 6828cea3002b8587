package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 policy/layout planners (q536–q540) beyond
  * the oracle gate. */
class PolicyPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q536

  test("sorted-neighborhood: candidate volume linear, bounded by quadratic") {
    val rows = run("q536_sorted_neighborhood_blocking").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_customers")
      val cand = r.getAs[Long]("candidate_pairs")
      // window w = 2 neighbors: exactly 2n − 3 pairs once n ≥ 2
      if (n >= 2L) assert(cand == 2L * n - 3L, s"n=$n cand=$cand")
      assert(cand <= r.getAs[Long]("full_pairs") || n < 3L)
      assert(r.getAs[Long]("same_segment_pairs") <= cand)
    }
  }

  // ---------------------------------------------------------------- q537

  test("flow time: SJF never waits longer than FIFO, invariants hold") {
    val rows = run("q537_sjf_vs_fifo_flowtime").collect()
    val byPolicy = rows.map(r => r.getAs[String]("policy") -> r).toMap
    assert(byPolicy.keySet == Set("fifo", "sjf"))
    assert(byPolicy("fifo").getAs[Long]("n_jobs")
      == byPolicy("sjf").getAs[Long]("n_jobs"))
    assert(byPolicy("fifo").getAs[Long]("total_service")
      == byPolicy("sjf").getAs[Long]("total_service"))
    // SJF minimizes total flow time over any order (exchange argument)
    assert(byPolicy("sjf").getAs[Long]("total_flowtime")
      <= byPolicy("fifo").getAs[Long]("total_flowtime"))
    // flow time always at least the service itself
    assert(byPolicy("sjf").getAs[Long]("total_flowtime")
      >= byPolicy("sjf").getAs[Long]("total_service"))
  }

  // ---------------------------------------------------------------- q538

  test("reserve sweep: clearing monotone down, r=0 is second-price baseline") {
    val rows = run("q538_reserve_price_sweep").orderBy(col("reserve")).collect()
    assert(rows.map(_.getAs[Long]("reserve")).toSeq == Seq(0L, 1000L, 2000L, 4000L))
    assert(rows.map(_.getAs[Long]("n_auctions")).distinct.length == 1)
    val cleared = rows.map(_.getAs[Long]("cleared"))
    assert(cleared.sliding(2).forall { case Array(a, b) => b <= a },
      s"raising the reserve cannot clear more auctions: ${cleared.toSeq}")
    // at reserve 0 every auction clears
    assert(cleared.head == rows.head.getAs[Long]("n_auctions"))
    for (r <- rows) assert(r.getAs[Long]("revenue") >= 0L)
  }

  // ---------------------------------------------------------------- q539

  test("syllables: every word has at least its complex share, rates bounded") {
    val rows = run("q539_syllable_complexity_census").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // complex words contribute >= 3 syllables each; with
      // ppm = floor(c·10⁶/n) this bounds as syl·10⁶ >= 3·ppm·n
      assert(r.getAs[Long]("n_syllables") * 1000000L
        >= 3L * r.getAs[Long]("complex_ppm") * r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("complex_ppm") <= 1000000L)
      // prose words average at least one syllable (vowel-less tokens are
      // rare punctuation/consonant artifacts)
      assert(r.getAs[Long]("syl_per_word_milli") >= 500L)
    }
  }

  // ---------------------------------------------------------------- q540

  test("dict advisor: low-cardinality columns all win, math consistent") {
    val rows = run("q540_dict_encoding_advisor").collect()
    assert(rows.length == 4)
    for (r <- rows) {
      assert(r.getAs[Long]("ndv") >= 1L)
      assert(r.getAs[Long]("dict_bytes") > 0L)
      assert(r.getAs[Long]("savings_ppm") <= 1000000L)
      // these TPC-H flag/segment/priority columns have single-digit NDV
      // over thousands of rows — dictionary must always win
      assert(r.getAs[String]("winner") == "dict",
        s"${r.getAs[String]("column_name")} should dict-encode")
    }
  }
}
