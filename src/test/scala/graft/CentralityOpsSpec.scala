package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 graph/structure batch (q600–q604) beyond
  * the oracle gate. */
class CentralityOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("Katz: dominated by the degree term, top-10 properly ordered") {
    val rows = run("q600_katz_centrality").collect()
    assert(rows.length == 10)
    val katz = rows.map(_.getAs[Long]("katz_milli"))
    assert(katz.sliding(2).forall { case Array(a, b) => b <= a }, katz.toSeq.toString)
    rows.foreach { r =>
      // the k = 1 term alone is walks_1·1000/8; the series only adds
      assert(r.getAs[Long]("katz_milli") >= r.getAs[Long]("walks_1") * 1000 / 8)
      assert(r.getAs[Long]("walks_4") >= r.getAs[Long]("walks_1"),
        "walk counts grow with length on a connected co-supply graph")
    }
  }

  test("k-truss: census shares sum to one, support conservation holds") {
    val rows = run("q601_ktruss_support_census").collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Long]("edge_share_ppm")).sum
    val nEdges = rows.map(_.getAs[Long]("n_edges")).sum
    // floored shares undershoot by < 1 ppm per bucket
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length, s"$shareSum")
    // Σ support·n_edges = 3·triangles — divisible by 3
    val supportMass = rows.map(r => r.getAs[Long]("support") * r.getAs[Long]("n_edges")).sum
    assert(supportMass % 3 == 0, s"per-edge supports must sum to 3·Δ: $supportMass")
    assert(nEdges > 0)
  }

  test("harmonic closeness: bounded by reach count, 4 landmarks") {
    val rows = run("q602_harmonic_closeness_landmarks").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val h = r.getAs[Long]("harmonic_2520")
      val reached = r.getAs[Long]("n_reached")
      // every reached node is 1..3 hops: per-node term in [840, 2520]
      assert(h >= reached * 840 && h <= reached * 2520, s"$h vs $reached")
    }
  }

  test("butterflies: bucket bounds hold and census is consistent") {
    val rows = run("q603_butterfly_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val n = r.getAs[Long]("n_pairs")
      val bf = r.getAs[Long]("n_butterflies")
      // every pair in bucket b carries butterflies in [2^b, 2^(b+1))
      assert(bf >= n * (1L << b) && bf <= n * ((1L << (b + 1)) - 1), s"$b $n $bf")
    }
  }

  test("Yannakakis: reduction monotone, region fully determined") {
    val rows = run("q604_yannakakis_reduction_audit").collect()
    val byRel = rows.map(r => r.getAs[String]("relation") -> r).toMap
    assert(byRel.keySet == Set("1_region", "2_nation", "3_customer", "4_orders"))
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_surviving") <= r.getAs[Long]("rows_total"))
      assert(r.getAs[Long]("rows_dangling")
        == r.getAs[Long]("rows_total") - r.getAs[Long]("rows_surviving"))
    }
    // the single ASIA region row survives iff any chain reaches orders
    assert(byRel("1_region").getAs[Long]("rows_total") == 1L)
    assert(byRel("1_region").getAs[Long]("rows_surviving") == 1L,
      "ASIA customers with 1995 orders exist at every SF")
    // nations outside ASIA are dangling by the region filter alone
    assert(byRel("2_nation").getAs[Long]("rows_surviving") <= 5L,
      "at most the 5 ASIA nations can survive")
  }
}
