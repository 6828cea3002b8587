package graft

import org.apache.spark.sql.functions._

/** Semantics of the accuracy-audit operators (q434–q436) beyond the
  * oracle gate. */
class AccuracyOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q434

  test("histogram quantiles: error bounded by bin width, finer beats coarser") {
    val rows = run("q434_histogram_quantile_error").collect()
    assert(rows.length == 9)
    val stats = Tables.orders(spark, sfMid)
      .agg(min(graft.functions.Deterministic.cents(col("o_totalprice"))).as("vmin"),
        max(graft.functions.Deterministic.cents(col("o_totalprice"))).as("vmax"))
      .collect().head
    val span = stats.getAs[Long]("vmax") - stats.getAs[Long]("vmin")
    for (r <- rows) {
      val w = span / r.getAs[Long]("bins") + 1
      assert(r.getAs[Long]("err_cents") < w,
        s"estimate must land in the exact value's bin (err ${r.getAs[Long]("err_cents")} vs width $w)")
    }
    val byP = rows.groupBy(_.getAs[Long]("p"))
    for ((_, g) <- byP) {
      val sorted = g.sortBy(_.getAs[Long]("bins"))
      assert(sorted.head.getAs[Long]("err_cents") >=
        sorted.last.getAs[Long]("err_cents"),
        "2048 bins at least as accurate as 32")
    }
  }

  // ---------------------------------------------------------------- q435

  test("bloom audit: load and fpr fall as m grows, small filter shows real fps") {
    val rows = run("q435_bloom_fpr_audit").collect().sortBy(_.getAs[Long]("m"))
    assert(rows.map(_.getAs[Long]("m")).toSeq == Seq(4096L, 16384L, 65536L))
    val loads = rows.map(_.getAs[Long]("load_ppm"))
    assert(loads.zip(loads.tail).forall { case (a, b) => a > b },
      "load factor strictly falls with m")
    val fprs = rows.map(_.getAs[Long]("fpr_ppm"))
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a >= b },
      "fpr weakly falls with m")
    assert(fprs.head > 0L, "the overloaded filter must show real false positives")
    for (r <- rows) {
      // k=3 hashes: at most 3n bits set; members/probes partition customers
      assert(r.getAs[Long]("bits_set") <= 3 * r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("false_positives") <= r.getAs[Long]("n_probes"))
    }
    val nCust = Tables.customer(spark, sfMid).count()
    assert(rows.head.getAs[Long]("n_members") + rows.head.getAs[Long]("n_probes")
      == nCust)
  }

  // ---------------------------------------------------------------- q436

  test("ivm counting: refresh matches recompute for every group") {
    val rows = run("q436_ivm_agg_counting").collect()
    assert(rows.map(_.getAs[String]("rf")).sorted.toSeq == Seq("A", "N", "R"))
    for (r <- rows) {
      assert(r.getAs[Long]("is_consistent") == 1L,
        s"IVM certificate failed for ${r.getAs[String]("rf")}")
      assert(r.getAs[Long]("n_inc") > 0L)
    }
    // the delete delta really removed R rows: recompute R count directly
    val li = Tables.lineitem(spark, sfMid)
    val rBase = li.filter(col("l_shipdate") < "2000-07-01" &&
      col("l_returnflag") === "R").count()
    val rView = rows.find(_.getAs[String]("rf") == "R").get.getAs[Long]("n_inc")
    assert(rView < rBase, "deletes must shrink the R group below raw count")
  }
}
