package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 reliability audits (q561–q563) beyond the
  * oracle gate. */
class ReliabilityPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q561

  test("kappa: bounds hold and the short-token/stopword raters correlate") {
    val rows = run("q561_rater_agreement_kappa").collect()
    assert(rows.length == 60, "20 sources x 3 pairs")
    rows.foreach { r =>
      val (po, pe, k) = (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"),
        r.getAs[Long]("kappa_ppm"))
      assert(po >= 0L && po <= 1000000L && pe >= 0L && pe <= 1000000L)
      assert(k <= 1000000L, "kappa cannot exceed perfect agreement")
      // kappa sign follows observed-vs-chance (integer div truncation
      // keeps the sign of the numerator)
      assert((k > 0) == (po > pe) || k == 0L)
    }
    // stopwords are short words: the stopword-density and mean-token-
    // length raters agree beyond chance on average across sources
    val byPair = rows.groupBy(_.getAs[String]("pair"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("kappa_ppm")).sum / rs.length }
    assert(byPair("stop_vs_toklen") > byPair("len_vs_stop"),
      s"expected the stopword/token-length raters to correlate most: $byPair")
    assert(byPair("stop_vs_toklen") > 100000L,
      s"stop_vs_toklen mean kappa should be clearly positive: $byPair")
  }

  test("kappa: a rater paired with itself gives kappa = 1 on a hand corpus") {
    // degenerate check of the formula path: po = 1, pe < 1 => kappa 10^6
    // (exercised through the same ppm arithmetic the query uses)
    val n = 10L; val ka = 4L
    val po = 1000000L
    val pa = ka * 1000000L / n
    val pe = (pa * pa + (1000000L - pa) * (1000000L - pa)) / 1000000L
    val kappa = (po - pe) * 1000000L / math.max(1000000L - pe, 1L)
    assert(kappa == 1000000L)
  }

  // ---------------------------------------------------------------- q562

  test("speculation: caps the tail without touching the median, saves makespan") {
    val rows = run("q562_speculation_payoff").collect()
    assert(rows.length >= 28, "one stage per observed event day")
    rows.foreach { r =>
      val (m, ms, med) = (r.getAs[Long]("makespan"),
        r.getAs[Long]("makespan_spec"), r.getAs[Long]("median_d"))
      assert(ms <= m, "speculation cannot slow the stage down")
      assert(ms >= med, "the stage cannot beat its own median task")
      // speculated completion is capped at detection + one median run
      assert(ms <= 3 * med / 2 + med || ms == m)
      assert(r.getAs[Long]("n_speculated") <= r.getAs[Long]("n_tasks"))
      assert(r.getAs[Long]("saved_ppm") ==
        (m - ms) * 1000000L / m)
    }
    // the event stream's power users are real stragglers: most days save
    assert(rows.count(_.getAs[Long]("saved_ppm") > 0) * 2 > rows.length,
      "speculation should pay on the majority of stages")
  }

  // ---------------------------------------------------------------- q563

  test("priority sampling: threshold falls with k and estimates are unbiased-ish") {
    val rows = run("q563_priority_sampling_audit").orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(64L, 256L, 1024L))
    assert(rows.map(_.getAs[Long]("true_sum_cents")).distinct.length == 1)
    val taus = rows.map(_.getAs[Long]("tau_q"))
    assert(taus.sliding(2).forall { case Array(a, b) => b < a },
      s"a bigger sample must lower the (k+1)-th priority threshold: ${taus.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("k"),
        "q > tau keeps at most k items")
      assert(r.getAs[Long]("abs_err_ppm") < 100000L,
        "a 64+ item priority sample estimates total revenue within 10%")
      // every sampled item contributes at least tau (the max(w, tau) floor)
      assert(r.getAs[Long]("est_sum_cents") >=
        r.getAs[Long]("n_sample") * r.getAs[Long]("tau_q"))
    }
  }

  test("priority sampling: estimator recomputed from first principles at k=64") {
    import graft.functions.Deterministic.cents
    import graft.operators.Sampling
    val pri = Tables.lineitem(spark, sfMid)
      .select(cents(col("l_extendedprice")).as("w"),
        (Sampling.keyHash(expr("l_orderkey * 10 + l_linenumber"))
          % 999983L + 1L).as("u"))
      .select(col("w"), expr("w * 1000000 div u").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = pri.map(_._2).sorted(Ordering[Long].reverse)
    val tau = sorted(64) // the 65th largest priority
    val est = pri.filter(_._2 > tau).map { case (w, _) => math.max(w, tau) }.sum
    val got = run("q563_priority_sampling_audit")
      .filter(col("k") === 64L).collect().head
    assert(got.getAs[Long]("tau_q") == tau)
    assert(got.getAs[Long]("est_sum_cents") == est)
  }
}
