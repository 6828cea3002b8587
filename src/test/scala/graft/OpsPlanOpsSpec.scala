package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 operational planners (q552–q554) beyond the
  * oracle gate. */
class OpsPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q552

  test("newsvendor: stock rises with the ratio, trades overage for underage") {
    val rows = run("q552_newsvendor_stock_plan").orderBy(col("ratio_milli")).collect()
    assert(rows.map(_.getAs[Long]("ratio_milli")).toSeq == Seq(500L, 800L, 900L))
    assert(rows.map(_.getAs[Long]("n_days")).distinct.length == 1)
    val stock = rows.map(_.getAs[Long]("stock_units"))
    assert(stock.sliding(2).forall { case Array(a, b) => b >= a },
      s"a higher critical ratio cannot lower the stock: ${stock.toSeq}")
    // more stock → more leftover, fewer lost sales
    val over = rows.map(_.getAs[Long]("overage_units"))
    val under = rows.map(_.getAs[Long]("underage_units"))
    assert(over.sliding(2).forall { case Array(a, b) => b >= a })
    assert(under.sliding(2).forall { case Array(a, b) => b <= a })
  }

  // ---------------------------------------------------------------- q553

  test("blast radius: counts nest, revenue share consistent") {
    val r = run("q553_corruption_blast_radius").collect().head
    assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_orders"))
    assert(r.getAs[Long]("n_lineitems") >= r.getAs[Long]("n_orders"),
      "every order has at least one line item")
    val share = r.getAs[Long]("revenue_share_ppm")
    // one month of a multi-year history: a real but minority share
    assert(share > 0L && share < 500000L, s"share $share")
  }

  // ---------------------------------------------------------------- q554

  test("vacuum census: conservation and bounds") {
    val r = run("q554_version_chain_vacuum").collect().head
    assert(r.getAs[Long]("keys_to_vacuum") <= r.getAs[Long]("n_keys"))
    assert(r.getAs[Long]("reclaimable_versions")
      <= r.getAs[Long]("total_versions") - r.getAs[Long]("n_keys"),
      "vacuum keeps at least one version per key (two, in fact)")
    assert(r.getAs[Long]("reclaimable_bytes") <= r.getAs[Long]("total_bytes"))
    assert(r.getAs[Long]("reclaim_ppm") <= 1000000L)
    // every vacuumed key keeps exactly 2: reclaimable = total − 2·keys
    // for keys with chains, plus shorter chains keep all
    assert(r.getAs[Long]("reclaimable_versions") >= r.getAs[Long]("keys_to_vacuum"),
      "each vacuumed key frees at least one version")
  }
}
