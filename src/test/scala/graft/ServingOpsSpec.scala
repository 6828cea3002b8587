package graft

import org.apache.spark.sql.functions._

/** Semantics of the serving/bounds operators (q470–q472) beyond the
  * oracle gate. */
class ServingOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q470

  test("dkw bands: bracket the exact value, epsilon matches the closed form") {
    val rows = run("q470_dkw_percentile_bands").collect()
    assert(rows.length == 3)
    val n = Tables.orders(spark, sfMid).count()
    val eps = math.sqrt(3.689 / (2.0 * n)) * 1e6
    for (r <- rows) {
      assert(math.abs(r.getAs[Long]("eps_ppm") - eps) <= 1.0,
        s"eps ${r.getAs[Long]("eps_ppm")} vs closed form $eps")
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("exact_cents"))
      assert(r.getAs[Long]("exact_cents") <= r.getAs[Long]("hi_cents"))
      assert(r.getAs[Long]("band_width_ppm") > 0L)
    }
    // the tail band is TIGHTER in relative terms on this distribution
    val byP = rows.map(r => r.getAs[Long]("p") -> r.getAs[Long]("band_width_ppm")).toMap
    assert(byP(99L) < byP(50L))
  }

  // ---------------------------------------------------------------- q471

  test("lda separability: scatters positive, total-variance identity holds loosely") {
    val r = run("q471_lda_separability").collect().head
    assert(r.getAs[Long]("n_labels") == 10L)
    val within = r.getAs[Long]("within_scatter")
    val between = r.getAs[Long]("between_scatter")
    assert(within > 0L && between >= 0L)
    // random-label embeddings: labels explain under 10% of the variance
    assert(r.getAs[Long]("fisher_ratio_ppm") < 100000L)
    // total scatter ≈ within + between (integer-division slack per label)
    val qv = Tables.embeddings(spark, sfMid)
      .select(graft.functions.expressions.quantize_vec(col("embedding")).as("q"))
    val ssq = qv.select(expr("aggregate(q, 0L, (acc, x) -> acc + x * x)").as("s"))
      .agg(sum(col("s"))).collect().head.getLong(0)
    val n = qv.count()
    val gd = qv.select(posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x")).as("gd"))
      .agg(sum(expr("gd * gd"))).collect().head.getLong(0)
    val total = ssq - gd / n
    assert(math.abs(total - (within + between)) <= 20L + n,
      s"scatter identity: $total vs ${within + between}")
  }

  // ---------------------------------------------------------------- q472

  test("fenwick: every range certified, lookups bounded by 2 log2(n)") {
    val rows = run("q472_fenwick_range_serving").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getAs[Long]("is_equal") == 1L,
        s"range ${r.getAs[Long]("lo")}..${r.getAs[Long]("hi")} mismatch")
      assert(r.getAs[Long]("n_lookups") <= 16L, "2 * log2(256) bound")
      assert(r.getAs[Long]("n_lookups") >= 1L)
    }
    // the full range is a single tree node: exactly 1 lookup
    val full = rows.find(r => r.getAs[Long]("lo") == 1L &&
      r.getAs[Long]("hi") == 256L).get
    assert(full.getAs[Long]("n_lookups") == 1L)
  }
}
