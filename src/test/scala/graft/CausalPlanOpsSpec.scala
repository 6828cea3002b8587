package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 observational-data audits (q588–q590)
  * beyond the oracle gate. */
class CausalPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q588

  test("confounded logging: stratification collapses the phantom effect") {
    val rows = run("q588_confounded_logging_audit").collect()
    val byE = rows.map(r => r.getAs[String]("estimator") ->
      r.getAs[Long]("est_diff_cents")).toMap
    // treatment does NOTHING, but the logging policy favors expensive
    // orders: the naive contrast reads the confounder
    assert(math.abs(byE("naive")) > 5000000L,
      s"the biased policy must fake a large effect: ${byE("naive")}")
    // the decile-stratified estimator collapses it by >= 20x
    assert(math.abs(byE("stratified")) * 20 < math.abs(byE("naive")),
      s"stratification failed to de-confound: $byE")
    assert(math.abs(byE("stratified_trimmed")) * 20 < math.abs(byE("naive")))
    // trimming drops at least the most extreme-propensity decile
    val used = rows.map(r => r.getAs[String]("estimator") ->
      r.getAs[Long]("n_deciles_used")).toMap
    assert(used("stratified") == 10L)
    assert(used("stratified_trimmed") < 10L,
      "the 10%..82% policy design leaves at least one non-overlap decile")
  }

  // ---------------------------------------------------------------- q589

  test("pooling bias: the pooled system keeps its score, the rival loses") {
    val rows = run("q589_pooling_bias_eval").collect()
    val byS = rows.map(r => r.getAs[String]("system") -> r).toMap
    // the pool IS dot's top-10, so dot's hits are judged by definition
    assert(byS("dot").getAs[Long]("pool_bias_ppm") == 0L,
      "the pooling system cannot lose from its own pool")
    // maxsim retrieves relevant docs outside the pool: they count wrong
    assert(byS("maxsim").getAs[Long]("pool_bias_ppm") > 0L,
      s"late interaction must find unpooled relevant docs: ${byS("maxsim")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("p10_pooled_ppm") <= r.getAs[Long]("p10_full_ppm"))
      assert(r.getAs[Long]("p10_full_ppm") - r.getAs[Long]("p10_pooled_ppm")
        == r.getAs[Long]("pool_bias_ppm"))
    }
  }

  // ---------------------------------------------------------------- q590

  test("local clustering: backbone shows spread and valid coefficients") {
    val rows = run("q590_local_clustering_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("lcc_decile")
      assert(d >= 0L && d <= 10L)
      assert(r.getAs[Long]("n_nodes") >= 1L)
      val avg = r.getAs[Long]("avg_lcc_milli")
      assert(avg >= 0L && avg <= 1000L, s"LCC is a fraction: $avg")
      // decile labeling is consistent with the average inside it
      assert(avg / 100L == d || avg / 100L == d - 1 || avg / 100L == d + 1,
        s"decile $d holds average $avg")
    }
    // the backbone threshold leaves actual structure: more than one bin
    assert(rows.length >= 2,
      "backbone extraction must leave LCC variation (raw graph is a clique)")
  }
}
