package graft

/** Semantics of the closing TPC-H shapes (q359–q363) beyond the oracle
  * gate: the invariants a hash compare can't see — minimality of the
  * Q2 join-back, EXISTS-count bounds, direction-pair closure, signed
  * profit sanity, top-k ordering. sf0.01 keeps every shape non-degenerate
  * (sf0.001 has too few EUROPE offers in the size/type slice).
  */
class TpchOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q359

  test("q2 shape: every emitted offer is the part's minimum, sorted by balance") {
    val rows = run("q359_tpch_q2_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    // join-back equality: within a part, all emitted offers are equal
    // (they all matched the part's min)
    for ((_, g) <- rows.groupBy(_.getAs[Long]("p_partkey")))
      assert(g.map(_.getAs[Long]("offer_mc")).distinct.length == 1)
    val bals = rows.map(_.getAs[Long]("bal_c")).toSeq
    assert(bals == bals.sorted.reverse)
    assert(rows.length <= 100)
  }

  // ---------------------------------------------------------------- q360

  test("q4 shape: priority counts bounded by the quarter's order count") {
    import org.apache.spark.sql.functions._
    val rows = run("q360_tpch_q4_priority_check").collect()
    assert(rows.nonEmpty)
    val windowTotal = Tables.orders(spark, sfMid)
      .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-04-01")
      .count()
    val counted = rows.map(_.getAs[Long]("order_count")).sum
    assert(counted >= 1 && counted <= windowTotal,
      s"semi-join must never multiply rows: $counted > $windowTotal")
    val prios = rows.map(_.getAs[String]("o_orderpriority")).toSeq
    assert(prios == prios.sorted)
  }

  // ---------------------------------------------------------------- q361

  test("q7 shape: only the two direction pairs, only the two ship years") {
    val rows = run("q361_tpch_q7_volume_shipping").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val pair = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(pair == ("NATION_1", "NATION_2") || pair == ("NATION_2", "NATION_1"))
      assert(Set(1995L, 1996L).contains(r.getAs[Long]("l_year")))
      assert(r.getAs[Double]("revenue") > 0d)
    }
    // at most 2 pairs × 2 years
    assert(rows.length <= 4)
  }

  // ---------------------------------------------------------------- q362

  test("q9 shape: one row per (nation, year), years within the data span") {
    val rows = run("q362_tpch_q9_product_profit").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(keys.distinct.length == keys.length)
    assert(keys.forall { case (_, y) => y >= 1995L && y <= 2001L })
    // profit is a signed sum but must be finite and non-degenerate
    assert(rows.forall(r => !r.getAs[Double]("sum_profit").isNaN))
  }

  // ---------------------------------------------------------------- q363

  test("q10 shape: top-20 lost revenue, strictly ordered, positive") {
    val rows = run("q363_tpch_q10_returned_items").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
    assert(revs.forall(_ > 0d), "returned lines always carry positive revenue")
  }

  // ---------------------------------------------------------------- q369

  test("q18 shape: every large order's quantity clears the HAVING bar") {
    val rows = run("q369_tpch_q18_large_orders").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Long]("sum_qty") > 250L))
    val prices = rows.map(_.getAs[Long]("price_c")).toSeq
    assert(prices == prices.sorted.reverse)
  }

  // ---------------------------------------------------------------- q370

  test("q19 shape: disjunctive revenue is a subset of the brands' total") {
    import org.apache.spark.sql.functions._
    val r = run("q370_tpch_q19_disjunct_revenue").collect().head
    val n = r.getAs[Long]("n_lines")
    assert(n > 0)
    // every counted line belongs to one of the three brands
    val brandLines = Tables.lineitem(spark, sfMid)
      .join(Tables.part(spark, sfMid)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")),
        col("l_partkey") === col("p_partkey"))
      .count()
    assert(n <= brandLines)
    assert(r.getAs[Double]("revenue") > 0d)
  }

  // ---------------------------------------------------------------- q371

  test("q20 shape: dominance is exclusive — at most one dominant supplier per part") {
    import org.apache.spark.sql.functions._
    val rows = run("q371_tpch_q20_dominant_suppliers").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("s_suppkey")).toSeq
    assert(keys == keys.sorted && keys.distinct.length == keys.length)
    // 2·q > total admits at most one supplier per part, so the supplier
    // count is bounded by the number of qualifying bolt parts
    val boltParts = Tables.part(spark, sfMid)
      .filter(col("p_name").contains("bolt")).count()
    assert(rows.length <= boltParts)
  }
}
