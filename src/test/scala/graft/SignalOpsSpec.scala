package graft

import org.apache.spark.sql.functions._

/** Semantics of the signal/record operators (q390–q392) beyond the
  * oracle gate: Kadane optimality re-derived over the reported span,
  * survivorship rules, quantile ordering. */
class SignalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q390

  test("campaign window: reported span reproduces the reported sum exactly") {
    val r = run("q390_best_campaign_window").collect().head
    val start = r.getAs[java.sql.Date]("start_day")
    val end = r.getAs[java.sql.Date]("end_day")
    assert(!start.after(end))
    assert(r.getAs[Long]("span_days") >= 1L)
    // independent recomputation of the span's above-mean sum
    val daily = Tables.orders(spark, sfMid)
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(sum(graft.functions.Deterministic.cents(col("o_totalprice"))).as("rev_c"))
    val t = daily.agg(sum(col("rev_c")).as("total_c"), count(lit(1)).as("nd"))
      .collect().head
    val (total, nd) = (t.getAs[Long]("total_c"), t.getAs[Long]("nd"))
    val spanSum = daily
      .filter(col("day") >= lit(start) && col("day") <= lit(end))
      .agg(sum(col("rev_c") * nd - total).as("s")).collect().head.getAs[Long]("s")
    assert(spanSum / nd == r.getAs[Long]("best_sum_c"))
    assert(r.getAs[Long]("best_sum_c") > 0L, "some above-mean span must exist")
  }

  // ---------------------------------------------------------------- q391

  test("golden record: groups are real duplicates with non-null merged fields") {
    val rows = run("q391_golden_record_merge").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getAs[Long]("canonical_id")).toSeq
    assert(ids == ids.sorted && ids.distinct.length == ids.length)
    for (r <- rows) {
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[String]("lang_majority") != null)
      assert(r.getAs[String]("source_majority") != null)
      assert(r.getAs[Long]("max_chars") > 0L)
    }
  }

  // ---------------------------------------------------------------- q392

  test("conditional quantiles: ordered within every bin, counts conserve") {
    val rows = run("q392_conditional_price_quantiles").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val q = r.getAs[Long]("qty")
      assert(q >= 1L && q <= 50L)
      assert(r.getAs[Long]("p25_c") <= r.getAs[Long]("p50_c"))
      assert(r.getAs[Long]("p50_c") <= r.getAs[Long]("p75_c"))
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.lineitem(spark, sfMid).count())
  }

  // ---------------------------------------------------------------- q393

  test("phrase search: every hit really contains the phrase at that position") {
    val rows = run("q393_phrase_search_positional").collect()
    assert(rows.nonEmpty)
    val phrase = rows.head.getAs[String]("phrase").split(" ")
    val docs = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = Tables.documents(spark, sfMid)
      .filter(col("doc_id").isin(docs.toSeq: _*))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty)).toMap
    for (r <- rows) {
      val toks = texts(r.getAs[Long]("doc_id"))
      val p = r.getAs[Long]("pos").toInt
      assert(toks.slice(p, p + 3).sameElements(phrase),
        s"doc ${r.getAs[Long]("doc_id")} pos $p does not hold the phrase")
    }
  }

  // ---------------------------------------------------------------- q394

  test("bpe merge: merged pair dominates and disappears from round 2") {
    val rows = run("q394_bpe_merge_step").collect()
    val r1 = rows.filter(_.getAs[Long]("round") == 1L)
    val r2 = rows.filter(_.getAs[Long]("round") == 2L)
    assert(r1.length == 1 && r2.nonEmpty)
    val (mergePair, mergeN) = (r1.head.getAs[String]("pair"), r1.head.getAs[Long]("n"))
    // a merge can only create pairs rarer than (or equal to) the one it fused
    assert(r2.forall(_.getAs[Long]("n") <= mergeN))
    assert(!r2.exists(_.getAs[String]("pair") == mergePair),
      "the merged pair cannot survive its own merge")
  }

  // ---------------------------------------------------------------- q395

  test("markov stationarity: evolved mass conserves to within floor bleed") {
    val rows = run("q395_markov_stationarity").collect()
    assert(rows.nonEmpty)
    val evolved = rows.map(_.getAs[Long]("evolved_ppm")).sum
    assert(evolved <= 1000000L && evolved >= 1000000L - 1000L,
      s"8 integer power steps bleed at most ~states x 8 ppm, got $evolved")
    for (r <- rows)
      assert(r.getAs[Long]("abs_diff_ppm") ==
        math.abs(r.getAs[Long]("empirical_ppm") - r.getAs[Long]("evolved_ppm")))
  }

  // ---------------------------------------------------------------- q396

  test("rendezvous sharding: adding a shard moves keys ONLY into it") {
    val rows = run("q396_rendezvous_sharding").collect()
    assert(rows.length == 9)
    for (r <- rows; if r.getAs[Long]("shard") < 8L)
      assert(r.getAs[Long]("n_moved_in") == 0L,
        "HRW must never move a key between pre-existing shards")
    val total = rows.map(_.getAs[Long]("n_after")).sum
    assert(total == Tables.customer(spark, sfMid).count())
    val moved = rows.find(_.getAs[Long]("shard") == 8L).get.getAs[Long]("n_moved_in")
    // ≈ 1/9 of keys move; allow generous slack for the cheap hash family
    assert(moved > total / 20 && moved < total / 4)
  }

  // ---------------------------------------------------------------- q397

  test("unigram^0.75: flattening shrinks the head, ordering preserved") {
    val rows = run("q397_unigram_sampling_table").collect()
    assert(rows.nonEmpty)
    val head = rows.head
    assert(head.getAs[Long]("sample_ppm") < head.getAs[Long]("raw_ppm"),
      "the most frequent token must lose mass under ^0.75 flattening")
    val samples = rows.map(_.getAs[Long]("sample_ppm")).toSeq
    assert(samples == samples.sorted.reverse, "x^0.75 is monotone in x")
  }

  // ---------------------------------------------------------------- q398

  test("disparate impact: reference nation sits at exactly 1.0") {
    val rows = run("q398_disparate_impact_audit").collect()
    assert(rows.nonEmpty)
    val ref = rows.head.getAs[String]("ref_nation")
    val refRow = rows.find(_.getAs[String]("n_name") == ref).get
    assert(refRow.getAs[Long]("impact_ratio_ppm") == 1000000L)
    for (r <- rows) {
      assert(r.getAs[Boolean]("below_four_fifths") ==
        (r.getAs[Long]("impact_ratio_ppm") < 800000L))
      assert(r.getAs[Long]("rate_ppm") >= 0L &&
        r.getAs[Long]("rate_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q399

  test("iv wald: arms partition the joined lines, sign algebra holds") {
    val r = run("q399_iv_wald_estimator").collect().head
    val joined = Tables.lineitem(spark, sfMid)
      .join(Tables.orders(spark, sfMid),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n0") == joined)
    val (num, den, w) = (r.getAs[Long]("num"), r.getAs[Long]("den"),
      r.getAs[Long]("wald_milli"))
    if (den != 0L)
      assert((w >= 0L) == ((num >= 0L) == (den >= 0L)))
  }

  // ---------------------------------------------------------------- q400

  test("catalog census: ten tables, lineitem's composite key exposed as non-unique") {
    val rows = run("q400_catalog_row_census").collect()
    assert(rows.length == 10)
    for (r <- rows) {
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Boolean]("pk_unique") ==
        (r.getAs[Long]("n_keys") == r.getAs[Long]("n_rows")))
    }
    val li = rows.find(_.getAs[String]("table_name") == "lineitem").get
    assert(!li.getAs[Boolean]("pk_unique"),
      "this dataset's (orderkey, linenumber) is known to collide")
    assert(rows.find(_.getAs[String]("table_name") == "orders").get
      .getAs[Boolean]("pk_unique"))
  }

  // ---------------------------------------------------------------- q401

  test("dow envelope: breakout counts bounded by the band's tail mass") {
    val rows = run("q401_dow_percentile_envelope").collect()
    assert(rows.length == 7)
    for (r <- rows) {
      assert(r.getAs[Long]("p10_c") <= r.getAs[Long]("p90_c"))
      val n = r.getAs[Long]("n_days")
      // strictly-below-p10 mass is < 10% by the rank definition; same
      // for strictly-above-p90
      assert(r.getAs[Long]("n_below") * 10 <= n)
      assert(r.getAs[Long]("n_above") * 10 <= n)
    }
  }

  // ---------------------------------------------------------------- q402

  test("knapsack: DP optimum matches brute-force over all 2^10 subsets") {
    val r = run("q402_knapsack_source_budget").collect().head
    assert(r.getAs[Long]("dp_best") >= r.getAs[Long]("greedy_v"))
    assert(r.getAs[Long]("gap_ppm") >= 0L)
    // brute force the exact same bucketed instance
    val bySource = Tables.documents(spark, sfMid)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("v"), sum(col("n_chars")).as("bytes"))
      .collect().map(x => (x.getAs[String]("source"),
        x.getAs[Long]("v"), x.getAs[Long]("bytes")))
      .sortBy(x => (-x._3, x._1)).take(10)
    val tot = bySource.map(_._3).sum
    val items = bySource.map { case (_, v, b) => (v, (b * 64 + tot - 1) / tot) }
    val best = (0 until (1 << items.length)).map { mask =>
      val picked = items.zipWithIndex.filter { case (_, i) => (mask & (1 << i)) != 0 }
      val w = picked.map(_._1._2).sum
      if (w <= 32) picked.map(_._1._1).sum else -1L
    }.max
    assert(r.getAs[Long]("dp_best") == best,
      s"DP (${r.getAs[Long]("dp_best")}) must equal brute force ($best)")
  }

  // ---------------------------------------------------------------- q403

  test("shard packing: makespan dominates the fill bound, k respects both LBs") {
    val r = run("q403_shard_packing_bounds").collect().head
    val k = r.getAs[Long]("k_shards")
    assert(k == math.max(math.max(r.getAs[Long]("lb_fill"), r.getAs[Long]("lb_half")), 1L))
    val total = r.getAs[Long]("total")
    // average load is a floor on the max load
    assert(r.getAs[Long]("makespan") >= (total + k - 1) / k)
    assert(r.getAs[Long]("n_overflow") <= k)
  }
}
