package graft

import org.apache.spark.sql.functions._

/** Semantics of the rewrite/fusion/testing operators (q446–q448) beyond
  * the oracle gate. */
class RewriteOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q446

  test("eager aggregation: both plans agree on every nation") {
    val rows = run("q446_eager_agg_certificate").collect()
    assert(rows.length == 25)
    for (r <- rows) {
      assert(r.getAs[Long]("is_equal") == 1L,
        s"rewrite changed ${r.getAs[String]("nation")}")
      assert(r.getAs[Long]("rev_naive") > 0L)
    }
    // totals reconcile with a direct lineitem sum (inner FK joins lose no rows)
    val totalItems = rows.map(_.getAs[Long]("n_items_naive")).sum
    assert(totalItems == Tables.lineitem(spark, sfMid).count())
  }

  // ---------------------------------------------------------------- q447

  test("copeland: scores bounded by opponents, zero-sum, rank follows score") {
    val rows = run("q447_copeland_rank_fusion").collect()
    assert(rows.length == 20)
    for (r <- rows) {
      assert(r.getAs[Long]("wins") + r.getAs[Long]("losses") <= 19L)
      assert(r.getAs[Long]("copeland") ==
        r.getAs[Long]("wins") - r.getAs[Long]("losses"))
    }
    // wins and losses pair up across the field (ties excluded from both)
    assert(rows.map(_.getAs[Long]("wins")).sum ==
      rows.map(_.getAs[Long]("losses")).sum)
    val ranked = rows.sortBy(_.getAs[Long]("rk"))
    val cs = ranked.map(_.getAs[Long]("copeland"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  // ---------------------------------------------------------------- q448

  test("cvm: statistic positive on real drift, zero on identical samples") {
    val r = run("q448_cramer_von_mises").collect().head
    assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n2") > 0L)
    assert(r.getAs[Long]("ks_gap_scaled") >= 0L)
    assert(r.getAs[Long]("cvm_nano") >= 0L)
    // T(X, X) = 0: recompute with both "samples" = 1995
    import spark.implicits._
    val v = Tables.orders(spark, sfMid)
      .filter(year(col("o_orderdate")) === 1995)
      .select(graft.functions.Deterministic.cents(col("o_totalprice")).as("v"))
    val hist = v.groupBy(col("v"))
      .agg(count(lit(1)).as("c1"), count(lit(1)).as("c2"))
    val cum = hist
      .withColumn("f1", sum(col("c1")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
      .withColumn("f2", sum(col("c2")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    val t = cum.agg(sum(expr(
      "CAST(c1 + c2 AS DECIMAL(38,0)) * (f1 - f2) * (f1 - f2)")))
      .collect().head.getDecimal(0)
    assert(t.longValueExact() == 0L, "self-comparison must integrate to zero")
  }
}
