package graft

/** Semantics of the round-10 graph-probe batch: resource-allocation link
  * prediction (q699), SCC bowtie (q700), two-sweep diameter (q701). */
class GraphProbeOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q699: RA scores respect the per-neighbor weight bounds") {
    val rows = run("q699_resource_allocation_links").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val u = r.getAs[Long]("u"); val v = r.getAs[Long]("v")
      val cn = r.getAs[Long]("cn"); val ra = r.getAs[Long]("ra_ppm")
      assert(u < v)
      assert(cn >= 1)
      // every common neighbor links to BOTH u and v → deg ≥ 2 →
      // w ≤ 500000; the hub cap floors w at ⌊10⁶/64⌋ = 15625
      assert(ra <= cn * 500000, s"($u,$v) ra $ra exceeds cn·½·10⁶")
      assert(ra >= cn * 15625, s"($u,$v) ra $ra under the cap floor")
    }
    // output is sorted by score
    val scores = rows.map(_.getAs[Long]("ra_ppm")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q700: bowtie parts partition the node set with a nonempty core") {
    val rows = run("q700_scc_bowtie").collect()
    val parts = rows.map(r =>
      r.getAs[String]("part") -> r.getAs[Long]("n_nations")).toMap
    assert(parts.keySet.subsetOf(Set("core", "in", "out", "disc")))
    assert(parts.getOrElse("core", 0L) >= 1L, "largest SCC can't be empty")
    assert(parts.values.sum <= 25L, "more parts than nations")
    assert(parts.values.forall(_ > 0L))
  }

  test("q701: sweep-2 eccentricity dominates sweep-1 (the two-sweep bound)") {
    val rows = run("q701_two_sweep_diameter").collect()
    assert(rows.length == 2)
    val byTag = rows.map(r => r.getAs[String]("sweep") -> r).toMap
    val e1 = byTag("s1_maxdeg").getAs[Long]("ecc_capped")
    val e2 = byTag("s2_farthest").getAs[Long]("ecc_capped")
    assert(e1 >= 1 && e1 <= 5 && e2 <= 5)
    // d(B, A) = d(A, B) = ecc(A), both within the 5-round cap → the
    // second sweep's eccentricity can only be ≥ the first's
    assert(e2 >= e1, s"two-sweep bound inverted: $e2 < $e1")
    rows.foreach(r => assert(r.getAs[Long]("reached") >= 1L))
  }
}
