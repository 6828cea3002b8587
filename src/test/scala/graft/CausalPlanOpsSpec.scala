package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 observational-data audits (q588–q590)
  * beyond the oracle gate. */
class CausalPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q588

  test("confounded logging: stratification collapses the phantom effect") {
    val rows = run("q588_confounded_logging_audit").collect()
    val byE = rows.map(r => r.getAs[String]("estimator") ->
      r.getAs[Long]("est_diff_cents")).toMap
    // treatment does NOTHING, but the logging policy favors expensive
    // orders: the naive contrast reads the confounder
    assert(math.abs(byE("naive")) > 5000000L,
      s"the biased policy must fake a large effect: ${byE("naive")}")
    // the decile-stratified estimator collapses it by >= 20x
    assert(math.abs(byE("stratified")) * 20 < math.abs(byE("naive")),
      s"stratification failed to de-confound: $byE")
    assert(math.abs(byE("stratified_trimmed")) * 20 < math.abs(byE("naive")))
    // trimming drops at least the most extreme-propensity decile
    val used = rows.map(r => r.getAs[String]("estimator") ->
      r.getAs[Long]("n_deciles_used")).toMap
    assert(used("stratified") == 10L)
    assert(used("stratified_trimmed") < 10L,
      "the 10%..82% policy design leaves at least one non-overlap decile")
  }

  // ---------------------------------------------------------------- q589

  test("pooling bias: the pooled system keeps its score, the rival loses") {
    val rows = run("q589_pooling_bias_eval").collect()
    val byS = rows.map(r => r.getAs[String]("system") -> r).toMap
    // the pool IS dot's top-10, so dot's hits are judged by definition
    assert(byS("dot").getAs[Long]("pool_bias_ppm") == 0L,
      "the pooling system cannot lose from its own pool")
    // maxsim retrieves relevant docs outside the pool: they count wrong
    assert(byS("maxsim").getAs[Long]("pool_bias_ppm") > 0L,
      s"late interaction must find unpooled relevant docs: ${byS("maxsim")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("p10_pooled_ppm") <= r.getAs[Long]("p10_full_ppm"))
      assert(r.getAs[Long]("p10_full_ppm") - r.getAs[Long]("p10_pooled_ppm")
        == r.getAs[Long]("pool_bias_ppm"))
    }
  }

  // ---------------------------------------------------------------- q590

  test("local clustering: backbone shows spread and valid coefficients") {
    val rows = run("q590_local_clustering_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("lcc_decile")
      assert(d >= 0L && d <= 10L)
      assert(r.getAs[Long]("n_nodes") >= 1L)
      val avg = r.getAs[Long]("avg_lcc_milli")
      assert(avg >= 0L && avg <= 1000L, s"LCC is a fraction: $avg")
      // decile labeling is consistent with the average inside it
      assert(avg / 100L == d || avg / 100L == d - 1 || avg / 100L == d + 1,
        s"decile $d holds average $avg")
    }
    // the backbone threshold leaves actual structure: more than one bin
    assert(rows.length >= 2,
      "backbone extraction must leave LCC variation (raw graph is a clique)")
  }

  test("q589/q548 rank via the bounded heap: no WindowExec in their plans") {
    // the round-6 forms ranked the full scored corpus inside each probe's
    // window partition; the re-plan must carry ≤k rows per probe through
    // a TopKPairs aggregate instead — asserted on the physical plan
    for (name <- Seq("q589_pooling_bias_eval", "q548_knn_label_noise")) {
      val plan = SparkEntry.queries(name)(spark, sfMid)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plans a window sort — the bounded-heap re-plan regressed")
      assert(plan.contains("topk_pairs"),
        s"$name no longer aggregates through the TopKPairs bounded heap")
    }
  }

  test("q590 wedge discipline: oriented wedges bounded by m^1.5, below unoriented") {
    // replicate the query's backbone build, then check the wedge budget
    // the scaladoc claims: Σ C(outdeg,2) over the (degree, id)-oriented
    // edge list stays under m^1.5 and under the unoriented Σ C(deg,2)
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
    import org.apache.spark.sql.expressions.Window
    val thr = weighted.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("w"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("np", expr("sum(c) OVER ()"))
      .filter(expr("cum * 4 >= 3 * np"))
      .agg(min(col("w")).as("w_thr"))
    val edges = weighted.crossJoin(broadcast(thr))
      .filter(col("w") >= col("w_thr"))
      .select(col("u"), col("v")).persist()
    val m = edges.count()
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val unorientedWedges = deg.agg(sum(expr("d * (d - 1) div 2")))
      .collect()(0).getLong(0)
    val oriented = edges
      .join(deg.select(col("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("u"))
    val orientedWedges = oriented.groupBy(col("u")).agg(count(lit(1)).as("od"))
      .agg(sum(expr("od * (od - 1) div 2"))).collect()(0).getLong(0)
    edges.unpersist()
    assert(orientedWedges <= math.ceil(math.pow(m.toDouble, 1.5)).toLong,
      s"oriented wedges $orientedWedges exceed m^1.5 for m=$m edges")
    assert(orientedWedges < unorientedWedges,
      s"orientation must shrink the wedge set: $orientedWedges vs $unorientedWedges")
  }
}
