package graft

/** Semantics of the round-9 warehouse-governance batch: blocking quality
  * (q688), exact view selection (q689), k-map disclosure (q690). */
class WarehouseOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q688: both metrics are valid ppm and the truth set is respected") {
    val rows = run("q688_blocking_quality_audit").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("scheme")).toSet
      == Set("a_head4", "b_len16", "c_lang"))
    val truthTotals = rows.map(_.getAs[Long]("truth_pairs")).distinct
    assert(truthTotals.length == 1, "one reference pair set for all schemes")
    rows.foreach { r =>
      val red = r.getAs[Long]("reduction_ppm")
      assert(red >= 0L && red <= 1000000L, s"reduction $red")
      assert(r.getAs[Long]("truth_co_blocked") <= r.getAs[Long]("truth_pairs"))
      val pc = r.getAs[Long]("completeness_ppm")
      assert(pc >= 0L && pc <= 1000000L, s"completeness $pc")
      assert(r.getAs[Long]("max_block") >= 1L)
    }
    // lang has ~5 giant blocks: the least reduction of the three schemes
    val byScheme = rows.map(r => r.getAs[String]("scheme") -> r).toMap
    assert(byScheme("c_lang").getAs[Long]("reduction_ppm")
      <= byScheme("a_head4").getAs[Long]("reduction_ppm"))
  }

  test("q689: routing is sound — every query scans a containing source") {
    val rows = run("q689_view_selection_exact").collect()
    assert(rows.length == 8)
    val total = rows.head.getAs[Long]("total_cost")
    assert(rows.map(_.getAs[Long]("cost")).sum == total,
      "per-query costs must sum to the winner's total")
    rows.foreach { r =>
      val qm = r.getAs[Long]("qm"); val routed = r.getAs[Long]("routed_to")
      assert(r.getAs[Long]("cost") <= r.getAs[Long]("base_rows"))
      if (routed >= 0L) {
        assert(routed == r.getAs[Long]("vm1") || routed == r.getAs[Long]("vm2"))
        assert((qm & routed) == qm, s"view $routed cannot answer query $qm")
      } else
        assert(r.getAs[Long]("cost") == r.getAs[Long]("base_rows"),
          "base-table fallback must cost a full scan")
    }
  }

  test("q691: peeling shrinks the graph; the density readout reconciles") {
    val rows = run("q691_densest_subgraph_peel").collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("nodes") <= a.getAs[Long]("nodes"))
      assert(b.getAs[Long]("edges") <= a.getAs[Long]("edges"))
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("nodes"); val m = r.getAs[Long]("edges")
      // avg_deg_milli is exactly 2m·1000 div max(n,1) — no drift between
      // the census columns (density can legitimately rise then FALL:
      // batch peeling overshoots past the 2-approx optimum, which is
      // precisely why the whole trajectory is reported)
      assert(r.getAs[Long]("avg_deg_milli") == 2 * m * 1000 / math.max(n, 1L))
    }
    assert(rows.head.getAs[Long]("nodes") > 0L)
    // the graph never densifies by deletion alone past round 0's edge set
    assert(rows.last.getAs[Long]("edges") <= rows.head.getAs[Long]("edges"))
  }

  test("q690: uniqueness counts nest and precision is a valid ppm") {
    val r = run("q690_kmap_uniqueness_audit").collect().head
    assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_pop"))
    assert(r.getAs[Long]("pop_unique_cells") <= r.getAs[Long]("pop_k2_cells"))
    assert(r.getAs[Long]("kmap_true_uniques")
      <= math.min(r.getAs[Long]("sample_unique_cells"),
        r.getAs[Long]("pop_unique_cells")))
    val p = r.getAs[Long]("kmap_precision_ppm")
    assert(p >= 0L && p <= 1000000L, s"precision $p")
    assert(r.getAs[Long]("n_cells") <= r.getAs[Long]("n_pop"))
  }
}
