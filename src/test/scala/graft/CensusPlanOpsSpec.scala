package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 structure/capacity censuses (q558–q560)
  * beyond the oracle gate. */
class CensusPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q558

  test("k-core: peeling is monotone and the fixpoint honors the degree bound") {
    val rows = run("q558_kcore_peeling").orderBy(col("round")).collect()
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val nodes = rows.map(_.getAs[Long]("nodes"))
    val edges = rows.map(_.getAs[Long]("edges"))
    assert(nodes.sliding(2).forall { case Array(a, b) => b <= a },
      s"peeling cannot add nodes: ${nodes.toSeq}")
    assert(edges.sliding(2).forall { case Array(a, b) => b <= a },
      s"peeling cannot add edges: ${edges.toSeq}")
    assert(nodes(1) < nodes(0), "round 1 peels the degree-<3 periphery")
    // every surviving node has degree >= 3, so the handshake bound holds
    // at every post-peel round (and trivially once a round is a fixpoint)
    rows.tail.foreach { r =>
      assert(2 * r.getAs[Long]("edges") >= 3 * r.getAs[Long]("nodes"),
        s"round ${r.getAs[Long]("round")} violates 2E >= 3V")
    }
    assert(nodes(4) == nodes(3) && edges(4) == edges(3),
      "4 rounds reach the 3-core fixpoint on the sf0.01 purchase graph")
  }

  // ---------------------------------------------------------------- q559

  test("capture-recapture: estimator bounds hold and widening windows converge") {
    val rows = run("q559_capture_recapture").orderBy(col("window_h")).collect()
    assert(rows.map(_.getAs[Long]("window_h")).toSeq == Seq(6L, 12L, 24L))
    assert(rows.map(_.getAs[Long]("true_n")).distinct.length == 1)
    rows.foreach { r =>
      val (n1, n2, m, tn) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("m"), r.getAs[Long]("true_n"))
      assert(m <= math.min(n1, n2), "the overlap is a subset of each survey")
      assert(math.max(n1, n2) <= tn, "a survey cannot exceed the population")
      // Chapman's estimate is at least the union lower bound minus 1 and,
      // like LP, at least each survey size when m <= min(n1, n2)
      assert(r.getAs[Long]("chapman_est") >= math.max(n1, n2) - 1)
      assert((r.getAs[Long]("bias") == 0L) == (r.getAs[Long]("chapman_est") == tn))
    }
    val err = rows.map(_.getAs[Long]("abs_err_ppm"))
    assert(err.sliding(2).forall { case Array(a, b) => b <= a },
      s"wider surveys tighten the estimate on this stream: ${err.toSeq}")
  }

  test("capture-recapture: estimators match the closed forms from (n1,n2,m)") {
    run("q559_capture_recapture").collect().foreach { r =>
      val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("m"))
      assert(r.getAs[Long]("lp_est") == n1 * n2 / math.max(m, 1L))
      assert(r.getAs[Long]("chapman_est") == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    }
  }

  // ---------------------------------------------------------------- q560

  test("erlang-b: blocking falls with trunks and the SLA pick is consistent") {
    val rows = run("q560_erlang_blocking_plan").orderBy(col("hod")).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val (b4, b8, b12) = (r.getAs[Long]("b4_ppm"), r.getAs[Long]("b8_ppm"),
        r.getAs[Long]("b12_ppm"))
      assert(b4 >= b8 && b8 >= b12, "more trunks cannot block more")
      assert(b4 <= 1000000L && b12 >= 0L)
      val pick = r.getAs[Long]("min_trunks_1pct")
      // only b4/b8/b12 are exposed; the pick must be consistent with them
      if (pick > 4) assert(b4 > 10000L, "picked past 4 trunks although b4 meets 1%")
      if (pick > 8) assert(b8 > 10000L)
      if (pick >= 1 && pick <= 4) assert(b4 <= 10000L)
      if (pick >= 1 && pick <= 8) assert(b8 <= 10000L)
      if (pick == -1L) assert(b12 > 10000L)
    }
  }

  test("erlang-b: the fixed-point chain equals the driver-side recursion") {
    run("q560_erlang_blocking_plan").collect().foreach { r =>
      val a = r.getAs[Long]("a_centi")
      var b = 1000000L
      for (c <- 1 to 12)
        b = (1000000L * a * b) / (c * 100000000L + a * b)
      assert(b == r.getAs[Long]("b12_ppm"),
        s"hod ${r.getAs[Long]("hod")}: chain ${r.getAs[Long]("b12_ppm")} != recursion $b")
    }
  }
}
