package graft

/** Semantics of the round-10 inspection batch: Dorfman pooling (q712),
  * fingerprint truncation birthday audit (q713). */
class InspectionOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q712: the plan beats the unpooled baseline at a rare defect rate") {
    val rows = run("q712_dorfman_pooling_plan").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("k")).toSeq == (1L to 10L).toSeq)
    val byK = rows.map(r => r.getAs[Long]("k") -> r).toMap
    assert(byK(1L).getAs[Long]("e_tests_ppm") == 1000000L,
      "k = 1 is one test per item by definition")
    val best = rows.filter(_.getAs[Long]("is_best") == 1L)
    assert(best.nonEmpty)
    val bestPpm = best.head.getAs[Long]("e_tests_ppm")
    assert(rows.forall(_.getAs[Long]("e_tests_ppm") >= bestPpm))
    // quantity = 1 is a ~2% defect rate: pooling must pay
    assert(best.head.getAs[Long]("k") > 1L, "pooling should beat k = 1")
    assert(bestPpm < 1000000L)
  }

  test("q713: collision expectations fall 256x per 8 bits; counts close") {
    val rows = run("q713_fingerprint_truncation_audit").collect()
    assert(rows.map(_.getAs[Long]("b")).toSeq == Seq(16L, 24L, 32L))
    val n = rows.map(_.getAs[Long]("n_docs")).distinct
    assert(n.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buckets") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("obs_pairs") >= 0)
      // buckets + colliding pairs close over the doc count: each bucket
      // of size m contributes m docs and C(m,2) pairs
      assert(r.getAs[Long]("n_buckets") + r.getAs[Long]("obs_pairs")
        >= r.getAs[Long]("n_docs"),
        "a bucket census can't lose documents")
    }
    val exp = rows.map(_.getAs[Long]("expected_pairs_milli"))
    assert(exp(0) >= exp(1) && exp(1) >= exp(2),
      "birthday expectation must fall with width")
  }
}
