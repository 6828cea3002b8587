package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 topology/fairness audits (q591–q593) beyond
  * the oracle gate. */
class TopologyPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q591

  test("drf: equal dominant shares, one binding resource, near-saturation") {
    val rows = run("q591_drf_allocation_plan").collect()
    assert(rows.length == 20)
    // the defining DRF property: every tenant's dominant share is equal
    assert(rows.map(_.getAs[Long]("dom_share_ppm")).distinct.length == 1)
    assert(rows.map(_.getAs[String]("binding_resource")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("tasks_allocated") > 0L)
      assert(Set("tokens", "chars")(r.getAs[String]("dominant_resource")))
      assert(r.getAs[Long]("smax_ppb") > 0L)
    }
    // the binding resource is ~fully used: sum over tenants of
    // tasks * s_binding ~ 10^9 ppb (floor rounding loses a little)
    val binding = rows.head.getAs[String]("binding_resource")
    val used = rows.map { r =>
      val dom = r.getAs[String]("dominant_resource")
      // only dominant-share usage is reconstructible from the output;
      // tenants whose dominant IS the binding resource use
      // tasks * smax of it
      if (dom == binding) r.getAs[Long]("tasks_allocated") * r.getAs[Long]("smax_ppb")
      else 0L
    }.sum
    assert(used < 1000000000L + rows.length * 1000000L,
      s"allocation cannot exceed capacity: $used ppb")
  }

  // ---------------------------------------------------------------- q592

  test("percolation: degradation is monotone and matches driver-side BFS") {
    val rows = run("q592_percolation_robustness").orderBy(col("keep_pml").desc).collect()
    assert(rows.map(_.getAs[Long]("keep_pml")).toSeq == Seq(700L, 300L, 100L))
    val shares = rows.map(_.getAs[Long]("largest_share_ppm"))
    assert(shares.sliding(2).forall { case Array(a, b) => b <= a },
      s"fewer edges cannot grow the giant component: ${shares.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("largest_cc") <= r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("n_components") >= 1L)
    }
    // prove 8 propagation rounds converged at keep=100: recompute the
    // component structure exactly with driver-side union-find
    import graft.operators.Sampling
    val kept = {
      val pairs = Tables.orders(spark, sfMid)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey").as("ok"))
        .join(Tables.lineitem(spark, sfMid)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")), Seq("ok"))
        .select(col("ok"), col("s")).distinct()
      val weighted = pairs.as("a").join(pairs.as("b"),
          col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("u"), col("b.s").as("v"))
        .agg(count(lit(1)).as("w"))
      val thr = weighted.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("w"))
            .rowsBetween(Long.MinValue, 0)))
        .withColumn("np", expr("sum(c) OVER ()"))
        .filter(expr("cum * 4 >= 3 * np")).agg(min(col("w"))).collect().head.getLong(0)
      weighted.filter(col("w") >= thr)
        .filter(Sampling.keyHash(expr("u * 1048576 + v"), 2246822519L) * 1000L
          < lit(100L * 4294967296L))
        .select(col("u"), col("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    kept.foreach { case (u, v) => parent(find(u)) = find(v) }
    val sizes = kept.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).map(_._2.length)
    val r100 = rows.last
    assert(r100.getAs[Long]("n_nodes") == sizes.sum)
    assert(r100.getAs[Long]("largest_cc") == sizes.max,
      s"8 label-propagation rounds disagree with union-find: " +
        s"${r100.getAs[Long]("largest_cc")} vs ${sizes.max}")
    assert(r100.getAs[Long]("n_components") == sizes.size)
  }

  // ---------------------------------------------------------------- q593

  test("rich club: elite density exceeds graph density and fades outward") {
    val rows = run("q593_rich_club_coefficient").orderBy(col("top_pml")).collect()
    assert(rows.map(_.getAs[Long]("top_pml")).toSeq == Seq(100L, 250L, 500L))
    assert(rows.map(_.getAs[Long]("graph_density_ppm")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_club") >= 2L)
      assert(r.getAs[Long]("club_density_ppm") <= 1000000L)
      // the top decile of a co-purchase backbone trades among itself
      assert(r.getAs[Long]("rich_club_ratio_ppm") > 1000000L,
        s"expected a rich-club effect: $r")
    }
    // the effect concentrates at the top
    val ratios = rows.map(_.getAs[Long]("rich_club_ratio_ppm"))
    assert(ratios.sliding(2).forall { case Array(a, b) => b <= a },
      s"widening the club must dilute it: ${ratios.toSeq}")
  }
}
