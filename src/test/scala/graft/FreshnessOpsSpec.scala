package graft

import org.apache.spark.sql.functions._

/** Semantics of the economics operators (q461–q463) beyond the oracle
  * gate. */
class FreshnessOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q461

  test("anisotropy: sum-vector identity matches a brute-force pair sum on one label") {
    val rows = run("q461_embedding_anisotropy").collect()
    assert(rows.length == 10)
    // synthetic embeddings are near-isotropic: |anisotropy| well under 5%
    for (r <- rows) {
      assert(math.abs(r.getAs[Long]("anisotropy_ppm")) < 50000L)
      assert(r.getAs[Long]("mean_self_dot") > 0L)
    }
    // brute-force cross-check on the smallest label
    val label = rows.minBy(_.getAs[Long]("n_vectors")).getAs[Long]("label")
    val vecs = Tables.embeddings(spark, sfMid)
      .filter(col("label") === label)
      .select(graft.functions.expressions.quantize_vec(col("embedding")).as("q"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length
    var pairSum = 0L
    for (i <- vecs.indices; j <- vecs.indices if i != j)
      pairSum += vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
    val expected = pairSum / (n.toLong * (n - 1))
    val got = rows.find(_.getAs[Long]("label") == label).get
      .getAs[Long]("mean_pair_dot")
    assert(got == expected, s"identity check: $got vs brute $expected")
  }

  // ---------------------------------------------------------------- q462

  test("cache sweep: hits monotone in k, bounded by accesses") {
    val rows = run("q462_static_cache_sweep").collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(16L, 128L, 1024L))
    val hits = rows.map(_.getAs[Long]("hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a < b },
      "bigger cache strictly helps below saturation")
    for (r <- rows) {
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_accesses"))
      // top-k of a ~uniform access distribution covers ~k/parts of traffic
      val exp = r.getAs[Long]("k") * 1000000L / r.getAs[Long]("distinct_parts")
      val got = r.getAs[Long]("hit_ppm")
      assert(got >= exp, "top-k can never cover less than uniform share")
      assert(got < exp * 3, "synthetic accesses are near-uniform")
    }
  }

  // ---------------------------------------------------------------- q463

  test("staleness: daily refresh is exact, coarser cadences strictly worse") {
    val rows = run("q463_view_staleness_pricing").collect()
      .sortBy(_.getAs[Long]("cadence_days"))
    assert(rows.map(_.getAs[Long]("cadence_days")).toSeq == Seq(1L, 7L, 28L))
    assert(rows.head.getAs[Long]("mean_stale_ppm") == 0L,
      "cadence 1 refreshes on every day: zero staleness")
    assert(rows.head.getAs[Long]("max_stale_ppm") == 0L)
    val means = rows.map(_.getAs[Long]("mean_stale_ppm"))
    assert(means.zip(means.tail).forall { case (a, b) => a < b },
      "coarser refresh is strictly staler")
    val ns = rows.map(_.getAs[Long]("n_days"))
    assert(ns.distinct.length == 1, "every cadence scores the same span")
  }
}
