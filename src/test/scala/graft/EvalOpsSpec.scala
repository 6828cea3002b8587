package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics of the layout/eval/attribution operators (q372–q374) beyond
  * the oracle gate: the two-level RLE decomposition against a one-window
  * reference, DCG bounds, and removal-effect direction. */
class EvalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q372

  test("rle plan: bucketed adjacency == single global window (decomposition is exact)") {
    val rows = run("q372_rle_layout_plan").collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_runs")).toMap
    // reference: ONE global window (fine at test scale, the thing the
    // bucketed form avoids at 100 TB)
    val li = Tables.lineitem(spark, sfMid)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_suppkey"),
        graft.functions.Deterministic.cents(col("l_extendedprice")).as("price_c"))
    val g = Window.orderBy(col("l_orderkey"), col("l_linenumber"),
      col("l_suppkey"), col("price_c"), col("l_returnflag"))
    val truth = li
      .withColumn("p_rf", lag(col("l_returnflag"), 1).over(g))
      .withColumn("p_sk", lag(col("l_suppkey"), 1).over(g))
      .agg(
        (sum(when(col("p_rf").isNotNull && col("p_rf") =!= col("l_returnflag"), 1L)
          .otherwise(0L)) + lit(1L)).as("rf_runs"),
        (sum(when(col("p_sk").isNotNull && col("p_sk") =!= col("l_suppkey"), 1L)
          .otherwise(0L)) + lit(1L)).as("sk_runs"))
      .collect().head
    assert(rows("l_returnflag") == truth.getAs[Long]("rf_runs"))
    assert(rows("l_suppkey") == truth.getAs[Long]("sk_runs"))
  }

  test("rle plan: runs bounded by distinct floor and row ceiling") {
    for (r <- run("q372_rle_layout_plan").collect()) {
      assert(r.getAs[Long]("n_runs") >= r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("rle_ratio_pct") >= 100L)
    }
  }

  // ---------------------------------------------------------------- q373

  test("dcg eval: scores within the harmonic-ideal envelope") {
    val rows = run("q373_dcg_retrieval_eval").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val dcg = r.getAs[Long]("dcg_mu")
      assert(dcg >= 0L && dcg <= 7381L, "DCG can't exceed the perfect-10 ideal")
      val ndcg = r.getAs[Long]("ndcg_ppm")
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(r.getAs[Long]("n_rel") >= 0L)
    }
  }

  // ---------------------------------------------------------------- q374

  test("markov removal: base effect is zero, removals never help conversion") {
    val rows = run("q374_markov_removal_attribution").collect()
    assert(rows.map(_.getAs[String]("removed_channel")).toSet ==
      Set("none", "click", "view", "signup", "error"))
    val base = rows.find(_.getAs[String]("removed_channel") == "none").get
    assert(base.getAs[Long]("removal_effect_ppm") == 0L)
    for (r <- rows) {
      val conv = r.getAs[Long]("conv_ppm")
      assert(conv >= 0L && conv <= 1000000L)
      // removal only deletes conversion paths (no renormalization), so
      // the effect is non-negative and bounded by 100%
      val eff = r.getAs[Long]("removal_effect_ppm")
      assert(eff >= 0L && eff <= 1000000L)
      assert(conv <= base.getAs[Long]("conv_ppm"))
    }
  }

  // ---------------------------------------------------------------- q375

  test("ivm join delta: maintained view equals the full recompute") {
    val rows = run("q375_ivm_join_delta").collect()
    assert(rows.nonEmpty)
    // independent full recompute of the T1 snapshot view
    val direct = Tables.lineitem(spark, sfMid)
      .filter(col("l_shipdate") < "1998-02-01")
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * 100d + 0.5d).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100d + 0.5d).cast("long"))).as("rev_e4"))
      .join(Tables.orders(spark, sfMid).filter(col("o_orderdate") < "1998-02-01")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfMid).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg((sum(col("rev_e4")).cast("double") / 10000d).as("rev"))
      .collect().map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Double]("rev")).toMap
    for (r <- rows) {
      val seg = r.getAs[String]("c_mktsegment")
      assert(r.getAs[Double]("rev_maintained") == direct(seg),
        s"IVM drifted from recompute for $seg")
      assert(math.abs(r.getAs[Double]("rev_base") + r.getAs[Double]("rev_delta") -
        r.getAs[Double]("rev_maintained")) < 1e-4)
    }
  }

  // ---------------------------------------------------------------- q376

  test("write plan: file counts and small-file flags are self-consistent") {
    val rows = run("q376_partitioned_write_plan").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val bytes = r.getAs[Long]("est_bytes")
      assert(bytes >= r.getAs[Long]("n_rows") * 64L)
      assert(r.getAs[Long]("n_files") == (bytes + 65535L) / 65536L)
      assert(r.getAs[Boolean]("small_file_risk") == (bytes < 16384L))
    }
  }

  // ---------------------------------------------------------------- q377

  test("design effect: deff identity holds and effective n never exceeds n") {
    val r = run("q377_cluster_design_effect").collect().head
    val icc = r.getAs[Long]("icc_ppm")
    assert(icc >= 0L && icc <= 1000000L)
    assert(r.getAs[Long]("deff_ppm") ==
      1000000L + (r.getAs[Long]("m_bar") - 1L) * icc)
    assert(r.getAs[Long]("n_effective") <= r.getAs[Long]("n"))
    assert(r.getAs[Long]("n_effective") >= 1L)
  }

  // ---------------------------------------------------------------- q378

  test("cluster labels: three ranked keywords per cluster, floors respected") {
    val rows = run("q378_cluster_keyword_labels").collect()
    assert(rows.nonEmpty)
    for ((_, g) <- rows.groupBy(_.getAs[Long]("cluster"))) {
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to byRank.length))
      val keys = byRank.map(_.getAs[Long]("keyness_ppm")).toSeq
      assert(keys == keys.sorted.reverse)
      assert(g.forall(_.getAs[Long]("c_lt") >= 5L))
    }
  }

  // ---------------------------------------------------------------- q379

  test("hamming histogram: pair count equals fingerprints minus prefix blocks") {
    val rows = run("q379_simhash_hamming_histogram").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hamming"); h >= 0L && h <= 30L
    })
    val fp = graft.dedup.SimHash.fingerprints(
      Tables.documents(spark, sfMid), "doc_id", "text")
    val nFp = fp.count()
    val nPrefix = fp.select(expr("simhash div 1048576")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nFp - nPrefix,
      "every fingerprint except each block's first contributes one adjacent pair")
  }

  // ---------------------------------------------------------------- q380

  test("water filling: budget respected, cap maximal, uncapped sources whole") {
    val rows = run("q380_water_filling_quota").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val budget = total * 60L / 100L
    val allocated = rows.map(_.getAs[Long]("allocated")).sum
    assert(allocated <= budget)
    for (r <- rows)
      if (!r.getAs[Boolean]("capped"))
        assert(r.getAs[Long]("allocated") == r.getAs[Long]("n_docs"))
    val capped = rows.filter(_.getAs[Boolean]("capped"))
    if (capped.nonEmpty) {
      val caps = capped.map(_.getAs[Long]("allocated")).distinct
      assert(caps.length == 1, "all capped sources share the common water level")
      val cap = caps.head
      // maximality: raising the cap by one doc per capped source must
      // overflow the budget
      val atPlusOne = rows.map(r =>
        math.min(r.getAs[Long]("n_docs"), cap + 1L)).sum
      assert(atPlusOne > budget)
    }
  }

  // ---------------------------------------------------------------- q381

  test("median CI: two-level rank selection equals the directly sorted ranks") {
    val r = run("q381_median_order_stat_ci").collect().head
    assert(r.getAs[Long]("ci_lo_c") <= r.getAs[Long]("median_c"))
    assert(r.getAs[Long]("median_c") <= r.getAs[Long]("ci_hi_c"))
    // direct check at test scale: collect the sorted values and index
    val sorted = Tables.orders(spark, sfMid)
      .select(graft.functions.Deterministic.cents(col("o_totalprice")).as("v"))
      .orderBy(col("v")).collect().map(_.getAs[Long]("v"))
    def at(rank: Long) = sorted((rank - 1).toInt)
    assert(r.getAs[Long]("median_c") == at(r.getAs[Long]("med_r")))
    assert(r.getAs[Long]("ci_lo_c") == at(r.getAs[Long]("lo_r")))
    assert(r.getAs[Long]("ci_hi_c") == at(r.getAs[Long]("hi_r")))
  }

  // ---------------------------------------------------------------- q382

  test("mantel-haenszel: cells conserve the joined row count, ORs positive") {
    val r = run("q382_mantel_haenszel_or").collect().head
    val cells = r.getAs[Long]("sa") + r.getAs[Long]("sb") +
      r.getAs[Long]("sc") + r.getAs[Long]("sd")
    val joined = Tables.lineitem(spark, sfMid)
      .join(Tables.part(spark, sfMid), col("l_partkey") === col("p_partkey"))
      .count()
    assert(cells == joined)
    assert(r.getAs[Long]("crude_or_milli") > 0L)
    assert(r.getAs[Long]("mh_or_milli") > 0L)
  }

  // ---------------------------------------------------------------- q383

  test("runs test: run count bounds and z-sign consistency") {
    val r = run("q383_runs_test_daily_revenue").collect().head
    val (n, n1, n2) = (r.getAs[Long]("n"), r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    assert(n1 + n2 == n)
    val runs = r.getAs[Long]("runs")
    assert(runs >= 1L && runs <= n)
    assert(runs <= 2L * math.min(n1, n2) + 1L, "max runs is 2·min(n1,n2)+1")
    val z = r.getAs[Long]("z_milli")
    assert((runs * 1000L >= r.getAs[Long]("e_milli")) == (z >= 0L))
  }

  // ---------------------------------------------------------------- q384

  test("cohort halflife: positive offset or the -1 sentinel, sized cohorts only") {
    val rows = run("q384_cohort_halflife").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val h = r.getAs[Long]("halflife_months")
      assert(h == -1L || h >= 1L)
      assert(r.getAs[Long]("cohort_size") >= 20L)
    }
    val ms = rows.map(_.getAs[Long]("cohort_m")).toSeq
    assert(ms == ms.sorted)
  }

  // ---------------------------------------------------------------- q385

  test("trend test: z-squared non-negative, counts conserve") {
    val r = run("q385_cochran_armitage_trend").collect().head
    assert(r.getAs[Long]("z2_ppm") >= 0L)
    assert(Set(-1, 1, 0).contains(r.getAs[Int]("trend_sign")))
    assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_total"))
  }

  // ---------------------------------------------------------------- q386

  test("link prediction: candidates are true non-edges with valid jaccard") {
    val rows = run("q386_link_prediction_jaccard").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // recompute the edge set independently
    val li = Tables.lineitem(spark, sfMid)
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val edges = li.join(li.withColumnRenamed("sk", "sk2"), Seq("ok"))
      .filter(col("sk") < col("sk2"))
      .select(col("sk"), col("sk2")).distinct().collect()
      .map(r => (r.getAs[Long]("sk"), r.getAs[Long]("sk2"))).toSet
    for (r <- rows) {
      val pair = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(!edges.contains(pair), s"$pair is already an edge")
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j > 0L && j <= 1000000L)
      assert(r.getAs[Long]("cn") >= 1L)
    }
    val js = rows.map(_.getAs[Long]("jaccard_ppm")).toSeq
    assert(js == js.sorted.reverse)
  }

  // ---------------------------------------------------------------- q387

  test("gram coverage: cumulative curve ends at exactly 100%") {
    val rows = run("q387_gram_coverage_curve").collect()
    assert(rows.nonEmpty)
    val deciles = rows.map(_.getAs[Long]("decile")).toSeq
    assert(deciles == deciles.sorted && deciles.forall(d => d >= 1 && d <= 10))
    val cums = rows.map(_.getAs[Long]("cum_grams")).toSeq
    assert(cums == cums.sorted)
    assert(rows.map(_.getAs[Long]("new_grams")).sum == cums.last)
    assert(rows.last.getAs[Long]("coverage_ppm") == 1000000L)
  }

  // ---------------------------------------------------------------- q388

  test("shapley attribution: efficiency axiom — values sum to v(N) - v(empty)") {
    val rows = run("q388_shapley_attribution").collect()
    assert(rows.map(_.getAs[String]("channel")).toSet ==
      Set("click", "error", "signup", "view"))
    // independent v(·) for the grand coalition and the empty set
    val perUser = Tables.events(spark, sfMid)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", array_sort(collect_set(
          when(col("event_type") =!= "purchase", col("event_type")))))
          .as("coalition"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    def v(coalition: String): Long = {
      val g = perUser.filter(col("coalition") === coalition)
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k")).collect().head
      val n = g.getAs[Long]("n")
      if (n == 0) 0L else g.getAs[Long]("k") * 1000000L / n
    }
    val grand = v("click,error,signup,view")
    val empty = v("")
    assert(rows.map(_.getAs[Long]("phi_ppm_x24")).sum == 24L * (grand - empty),
      "Shapley values must exactly split v(N) - v(empty)")
  }

  // ---------------------------------------------------------------- q389

  test("mase eval: positive errors, ratio consistent with the two MAEs") {
    val r = run("q389_mase_forecast_eval").collect().head
    assert(r.getAs[Long]("n_days") >= 1L)
    assert(r.getAs[Long]("mae_naive1_c") > 0L)
    assert(r.getAs[Long]("mae_naive7_c") > 0L)
    assert(r.getAs[Long]("mase_ppm") > 0L)
  }
}
