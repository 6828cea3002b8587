package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 selection-effect audits (q573–q575) beyond
  * the oracle gate. */
class SelectionPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q573

  test("raking: weighted margins land nearer the population than raw") {
    val rows = run("q573_ipf_raking").collect()
    assert(rows.length == 25, "5 regions x 5 segments")
    rows.foreach { r =>
      assert(r.getAs[Long]("w_milli") > 0L, "weights stay positive")
      assert(r.getAs[Long]("n_samp") <= r.getAs[Long]("n_pop"))
    }
    // raking targets MARGINS: compare region-margin L1 error raw vs
    // weighted (floor rounding can cost a few ppm on one margin, so
    // judge the total)
    def l1(share: String): Long = rows
      .groupBy(_.getAs[String]("region"))
      .map { case (_, rs) =>
        math.abs(rs.map(_.getAs[Long](share)).sum -
          rs.map(_.getAs[Long]("pop_share_ppm")).sum)
      }.sum
    assert(l1("weighted_share_ppm") < l1("raw_share_ppm"),
      s"raking must shrink the region-margin error: " +
        s"${l1("weighted_share_ppm")} !< ${l1("raw_share_ppm")}")
    // and the weighted joint distribution still sums to ~1
    val tot = rows.map(_.getAs[Long]("weighted_share_ppm")).sum
    assert(tot > 1000000L - 50L && tot <= 1000000L + 50L)
  }

  // ---------------------------------------------------------------- q574

  test("cascade: wider deferral bands buy agreement with the judge") {
    val rows = run("q574_cascade_routing_frontier")
      .orderBy(col("judged_share_ppm")).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("agreement_ppm") + r.getAs[Long]("false_drop_ppm")
        + r.getAs[Long]("false_keep_ppm") >= 1000000L - 3L,
        "verdicts partition the corpus (up to floor rounding)")
      assert(r.getAs[Long]("judged_share_ppm") <= 1000000L)
    }
    // the frontier is monotone: more judging, more fidelity
    val agree = rows.map(_.getAs[Long]("agreement_ppm"))
    assert(agree.sliding(2).forall { case Array(a, b) => b >= a },
      s"agreement must rise with judge budget: ${agree.toSeq}")
    // deferred docs are decided BY the judge, so errors only come from
    // outside the band: error share <= unjudged share
    rows.foreach { r =>
      assert(r.getAs[Long]("false_drop_ppm") + r.getAs[Long]("false_keep_ppm")
        <= 1000000L - r.getAs[Long]("judged_share_ppm") + 3L)
    }
  }

  // ---------------------------------------------------------------- q575

  test("berkson: conditioning on the union induces negative dependence") {
    val rows = run("q575_berkson_collider_audit").collect()
    assert(rows.length == 2)
    val byScope = rows.map(r => r.getAs[String]("scope") -> r).toMap
    val (pop, adm) = (byScope("population"), byScope("admitted"))
    assert(adm.getAs[Long]("n_docs") <= pop.getAs[Long]("n_docs"))
    // inside the admitted pool every doc passes at least one gate:
    // pa + pb - pab = 1 exactly (up to floor rounding)
    val cover = adm.getAs[Long]("pa_ppm") + adm.getAs[Long]("pb_ppm") -
      adm.getAs[Long]("pab_ppm")
    assert(math.abs(cover - 1000000L) <= 3L,
      s"union admission must cover the pool exactly: $cover")
    // the collider effect: association among admitted drops below the
    // population association
    assert(adm.getAs[Long]("lift_ppm") < pop.getAs[Long]("lift_ppm"),
      s"admission must depress the lift: $adm vs $pop")
  }
}
