package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 access-path audits (q570–q572) beyond the
  * oracle gate. */
class AccessPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q570

  test("ht correction: naive is size-biased high, HT recovers the mean") {
    val rows = run("q570_length_biased_ht_correction").orderBy(col("m_cap")).collect()
    assert(rows.map(_.getAs[Long]("m_cap")).toSeq == Seq(512L, 1024L, 2048L))
    assert(rows.map(_.getAs[Long]("true_mean_chars")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") > 0L && r.getAs[Long]("n_sampled")
        <= r.getAs[Long]("n_docs"))
      // length-proportional inclusion makes the naive mean estimate
      // E[X^2]/E[X] — strictly above E[X] for any non-degenerate lengths
      assert(r.getAs[Long]("naive_mean_chars") > r.getAs[Long]("true_mean_chars"),
        s"naive mean must be size-biased high: $r")
      assert(r.getAs[Long]("ht_err_ppm") < r.getAs[Long]("naive_err_ppm"),
        s"HT must beat the naive estimate: $r")
    }
    // a higher cap keeps fewer documents
    val k = rows.map(_.getAs[Long]("n_sampled"))
    assert(k.sliding(2).forall { case Array(a, b) => b < a },
      s"sample size must shrink as the cap rises: ${k.toSeq}")
  }

  // ---------------------------------------------------------------- q571

  test("posting advisor: gallop dominates at high length ratios") {
    val rows = run("q571_posting_intersection_advisor").orderBy(col("ratio_bin")).collect()
    assert(rows.nonEmpty)
    // the panel is min(40, vocabulary) terms — the sf0.01 corpus has a
    // deliberately tiny vocabulary, so derive the expected pair count
    import graft.functions.expressions.tokens_native
    val vocab = Tables.documents(spark, sfMid)
      .select(explode(array_distinct(tokens_native(col("text")))).as("t"))
      .select(col("t")).distinct().count()
    val p = math.min(40L, vocab)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == p * (p - 1) / 2,
      s"C($p,2) ordered pairs expected")
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_merge_cost") > 0L)
      assert(r.getAs[Long]("gallop_wins_ppm") >= 0L &&
        r.getAs[Long]("gallop_wins_ppm") <= 1000000L)
    }
    // once one list is >=8x the other, skipping always beats merging
    rows.filter(_.getAs[Long]("ratio_bin") >= 3L).foreach { r =>
      assert(r.getAs[Long]("gallop_wins_ppm") == 1000000L,
        s"gallop must always win at ratio bin ${r.getAs[Long]("ratio_bin")}")
      assert(r.getAs[Long]("avg_gallop_cost") < r.getAs[Long]("avg_merge_cost"))
    }
  }

  // ---------------------------------------------------------------- q572

  test("maxsim: dominates the flat dot per-facet and diverges from it") {
    val rows = run("q572_maxsim_late_interaction").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") != 0L, "the query never retrieves itself")
      assert(Set(0L, 1L)(r.getAs[Long]("same_label")))
      assert(Set(0L, 1L)(r.getAs[Long]("in_dot_top10")))
    }
    // late interaction genuinely reranks: the two top-10s must differ
    // (if they coincided, the 4-subvector max would be pure overhead)
    val overlap = rows.map(_.getAs[Long]("in_dot_top10")).sum
    assert(overlap < 10L, "MaxSim top-10 identical to dot top-10")
  }

  test("maxsim: score equals the sum of per-facet maxima, and >= dot/4 bound") {
    // recompute vec 216's MaxSim from raw subvector dots on the driver
    val rows = Tables.embeddings(spark, sfMid)
      .filter(col("vec_id").isin(0L, 216L))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 512 + 0.5) AS BIGINT))")
          .as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val (q, d) = (rows(0L), rows(216L))
    def dot(j: Int, k: Int) =
      (0 until 16).map(t => q(j * 16 + t) * d(k * 16 + t)).sum
    val expected = (0 until 4).map(j => (0 until 4).map(k => dot(j, k)).max).sum
    val got = run("q572_maxsim_late_interaction")
      .filter(col("vec_id") === 216L).collect()
    assert(got.nonEmpty && got.head.getAs[Long]("maxsim_q") == expected,
      s"driver recomputation $expected != ${got.headOption.map(_.getAs[Long]("maxsim_q"))}")
    // MaxSim >= the aligned-facet sum, which IS the full dot product
    val fullDot = (0 until 64).map(t => q(t) * d(t)).sum
    assert(expected >= fullDot)
  }
}
