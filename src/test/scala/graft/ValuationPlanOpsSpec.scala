package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 valuation/guarantee audits (q582–q584)
  * beyond the oracle gate. */
class ValuationPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q582

  test("two-pass median: exact vs a direct computation, pass 2 is tiny") {
    val r = run("q582_two_pass_exact_median").collect().head
    // independent truth: lower median of order totals
    import graft.functions.Deterministic.cents
    val vals = Tables.orders(spark, sfMid)
      .select(cents(col("o_totalprice")).as("v")).collect().map(_.getLong(0)).sorted
    val expected = vals((vals.length + 1) / 2 - 1)
    assert(r.getAs[Long]("exact_median_cents") == expected,
      s"two-pass ${r.getAs[Long]("exact_median_cents")} != direct $expected")
    assert(r.getAs[Long]("n_rows") == vals.length)
    // the refinement only re-reads one coarse bin
    assert(r.getAs[Long]("pass2_share_ppm") < 200000L,
      s"pass 2 re-read ${r.getAs[Long]("pass2_share_ppm")} ppm of the table")
  }

  // ---------------------------------------------------------------- q583

  test("knn shapley: values bounded, helpful neighbors rank first") {
    val rows = run("q583_knn_shapley_valuation").collect()
    assert(rows.length == 20)
    val vals = rows.map(_.getAs[Long]("avg_shapley_nano"))
    // per-test values are bounded by 1/K = 0.2; averages inherit it
    assert(vals.forall(v => v <= 200000000L && v >= -200000000L),
      s"KNN-Shapley values must lie in [-1/K, 1/K]: ${vals.max}, ${vals.min}")
    // output is the TOP-20: sorted descending and strictly useful
    assert(vals.sliding(2).forall { case Array(a, b) => b <= a })
    assert(vals.head > 0L, "the most valuable training point must help")
    assert(rows.map(_.getAs[Long]("n_tests")).forall(_ == 10L))
  }

  test("knn shapley: per-test values sum to the panel's kNN accuracy") {
    // Jia et al.'s efficiency property: sum_i s_i = a_(1..K) mean =
    // P(top-K neighbor label = test label)... for the exact recursion,
    // sum of ALL train values per test equals the K-NN vote share of
    // the test label. Check on one test point by brute force.
    val base = Tables.embeddings(spark, sfMid)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("transform(embedding, x -> CAST(floor(x * 512 + 0.5) AS BIGINT))")
          .as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val t = base.find(_._1 == 0L).get
    val train = base.filter(_._1 >= 10L)
      .map { case (id, l, v) =>
        val d2 = (0 until 64).map(i => (v(i) - t._3(i)) * (v(i) - t._3(i))).sum
        (d2, id, if (l == t._2) 1L else 0L)
      }.sortBy(x => (x._1, x._2))
    val k = 5
    val n = train.length
    // recursion from the paper, exact in nano with the query's flooring
    val s = new Array[Long](n)
    s(n - 1) = train(n - 1)._3 * 1000000000L / n
    for (i <- n - 2 to 0 by -1)
      s(i) = s(i + 1) + (train(i)._3 - train(i + 1)._3) * 1000000000L *
        math.min(k, i + 1) / (k.toLong * (i + 1))
    val total = s.sum
    // efficiency: Σsᵢ ≈ mean of the K nearest labels' agreement
    val topkAgree = train.take(k).map(_._3).sum * 1000000000L / k
    assert(math.abs(total - topkAgree) < 2000L * n,
      s"efficiency violated: sum $total vs top-K agreement $topkAgree")
  }

  // ---------------------------------------------------------------- q584

  test("conformal: coverage meets every target level and widths grow") {
    val rows = run("q584_conformal_coverage_audit").orderBy(col("level_pml")).collect()
    assert(rows.map(_.getAs[Long]("level_pml")).toSeq == Seq(800L, 900L, 950L))
    rows.foreach { r =>
      // the split-conformal guarantee (finite-sample, any model):
      // coverage >= level, minus a small exchangeability slack on a
      // few-hundred-doc test half
      assert(r.getAs[Long]("coverage_ppm") + 60000L >=
        r.getAs[Long]("level_pml") * 1000L,
        s"conformal guarantee violated: $r")
      assert(r.getAs[Long]("n_cal") > 0L && r.getAs[Long]("n_test") > 0L)
    }
    // stricter levels need wider intervals
    val widths = rows.map(_.getAs[Long]("q_hat"))
    assert(widths.sliding(2).forall { case Array(a, b) => b >= a },
      s"q_hat must grow with the level: ${widths.toSeq}")
  }
}
