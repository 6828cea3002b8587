package graft

import org.apache.spark.sql.functions._

/** Semantics of the monitoring/profiling operators (q449–q451) beyond the
  * oracle gate. */
class MonitorOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q449

  test("sequential monitor: statistics consistent, boundaries decrease, crossing flagged once") {
    val rows = run("q449_group_sequential_monitor").collect()
      .sortBy(_.getAs[Long]("look"))
    assert(rows.map(_.getAs[Long]("look")).toSeq == Seq(1L, 2L, 3L, 4L))
    val bs = rows.map(_.getAs[Long]("boundary_milli"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a > b },
      "OBF spends alpha gradually: boundaries strictly fall")
    for (r <- rows) {
      // recompute chi2 exactly
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val (ca, cb) = (r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b"))
      val num = BigInt(na + nb) * (BigInt(ca) * (nb - cb) - BigInt(cb) * (na - ca))
        .pow(2) * 1000
      val den = BigInt(na) * nb * BigInt(math.max(ca + cb, 1L)) *
        BigInt(math.max(na + nb - ca - cb, 1L))
      assert(BigInt(r.getAs[Long]("chi2_milli")) == num / den)
      assert((r.getAs[Long]("crossed") == 1L) ==
        (r.getAs[Long]("chi2_milli") >= r.getAs[Long]("boundary_milli")))
    }
    // conversions monotone over looks (cumulative outcome)
    val cas = rows.map(_.getAs[Long]("conv_a"))
    assert(cas.zip(cas.tail).forall { case (a, b) => a <= b })
    // at most one first crossing, and it is the min crossed look
    val firsts = rows.filter(_.getAs[Long]("is_first_crossing") == 1L)
    assert(firsts.length <= 1)
    val crossedLooks = rows.filter(_.getAs[Long]("crossed") == 1L)
      .map(_.getAs[Long]("look"))
    if (crossedLooks.nonEmpty)
      assert(firsts.head.getAs[Long]("look") == crossedLooks.min)
  }

  // ---------------------------------------------------------------- q450

  test("ndv profile: keys near row count, small-range correction exact, errors sane") {
    val rows = run("q450_ndv_profile_sweep").collect()
    assert(rows.length == 6)
    val m = rows.map(r => r.getAs[String]("column") ->
      (r.getAs[Long]("exact_ndv"), r.getAs[Long]("hll_ndv"),
        r.getAs[Long]("err_ppm"))).toMap
    val nOrders = Tables.orders(spark, sfMid).count()
    assert(m("o_orderkey")._1 == nOrders, "orderkey is the PK")
    // linear counting makes tiny-NDV columns exact (raw HLL read 15x high)
    assert(m("o_orderstatus")._3 == 0L, "3 distinct statuses: exact after LC")
    assert(m("o_orderpriority")._3 == 0L)
    // 64 registers: big-NDV estimates within ~25%
    for ((c, (exact, est, err)) <- m) {
      assert(est > 0L, c)
      assert(err <= 250000L, s"$c err $err ppm")
      assert(err == math.abs(est - exact) * 1000000L / math.max(exact, 1L))
    }
  }

  // ---------------------------------------------------------------- q451

  test("sharded quantile merge: estimates bracket exact within 2 bucket depths") {
    val rows = run("q451_sharded_quantile_merge").collect()
    assert(rows.map(_.getAs[Long]("p")).sorted.toSeq == Seq(50L, 90L, 99L))
    for (r <- rows) {
      // bucket-max estimates are upper-bound-flavored but must stay close:
      // 64 buckets x 8 shards => rank resolution ~ n/64 per shard
      assert(r.getAs[Long]("err_ppm") <= 50000L,
        s"p${r.getAs[Long]("p")}: ${r.getAs[Long]("err_ppm")} ppm")
      assert(r.getAs[Long]("err_cents") ==
        math.abs(r.getAs[Long]("est_cents") - r.getAs[Long]("exact_cents")))
    }
  }
}
