package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 curator batch: SymSpell variants (q736),
  * LSH S-curve planning (q737), exact lane assignment (q738). Each is
  * checked against an independent in-test reimplementation. */
class CuratorPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  private def ed1(a: String, b: String): Boolean = {
    if (math.abs(a.length - b.length) > 1) false
    else if (a.length == b.length) a.zip(b).count { case (x, y) => x != y } == 1
    else {
      val (s, l) = if (a.length < b.length) (a, b) else (b, a)
      (0 until l.length).exists(i => l.take(i) + l.drop(i + 1) == s)
    }
  }

  test("q736: the deletion-neighborhood join finds EXACTLY the " +
    "brute-force ED-1 pairs") {
    val rows = run("q736_symspell_typo_variants").collect()
    assert(rows.nonEmpty, "the OCR-noise slice produced no variants")
    // independent replay: rebuild the mangled vocabulary and brute-force
    // all pairs driver-side (vocabulary is bounded)
    val vocab = Tables.documents(spark, sfMid)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(when(col("doc_id") % 9L === 0L && length(col("w")) >= 4,
        concat(substring(col("w"), 1, 1), expr("substring(w, 3)")))
        .otherwise(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val pairs = for {
      i <- vocab.indices; j <- (i + 1) until vocab.length
      if ed1(vocab(i)._1, vocab(j)._1)
    } yield (vocab(i), vocab(j))
    val byLen = pairs.groupBy { case ((t1, _), (t2, _)) =>
      math.max(t1.length, t2.length).toLong }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs.length,
      "deletion join missed or fabricated a pair")
    for (r <- rows) {
      val expected = byLen(r.getAs[Long]("wlen"))
      assert(r.getAs[Long]("n_pairs") == expected.length)
      assert(r.getAs[Long]("reclaim_mass") ==
        expected.map { case ((_, f1), (_, f2)) => math.min(f1, f2) }.sum)
    }
  }

  test("q737: the S-curve is monotone in s, sharpens with more bands, " +
    "and matches an exact integer replay") {
    val rows = run("q737_lsh_scurve_planner").collect()
    assert(rows.length == 8)
    def replay(sPpm: Long, b: Long, r: Long): Long = {
      var q = 1000000L
      for (_ <- 1L to b) {
        var p = 1000000L
        for (_ <- 1L to r) p = p * sPpm / 1000000L
        q = q * (1000000L - p) / 1000000L
      }
      1000000L - q
    }
    for (row <- rows) {
      val (b, r) = (row.getAs[Long]("bands"), row.getAs[Long]("rows_per_band"))
      assert(b * r == 24)
      assert(row.getAs[Long]("p_at_50") == replay(500000L, b, r))
      assert(row.getAs[Long]("p_at_70") == replay(700000L, b, r))
      assert(row.getAs[Long]("p_at_90") == replay(900000L, b, r))
      assert(row.getAs[Long]("p_at_50") <= row.getAs[Long]("p_at_70"))
      assert(row.getAs[Long]("p_at_70") <= row.getAs[Long]("p_at_90"))
    }
    // more bands (fewer rows) catches more at EVERY s — the curve shifts
    // left monotonically along this fixed-signature family
    val byBands = rows.sortBy(_.getAs[Long]("bands")).toSeq
    for (pair <- byBands.sliding(2) if pair.length == 2)
      assert(pair(0).getAs[Long]("p_at_90") <= pair(1).getAs[Long]("p_at_90"))
  }

  test("q738: the permutation grid finds the true optimum of the trade " +
    "matrix") {
    val rows = run("q738_dedicated_lane_assignment").collect()
    assert(rows.length == 4)
    val planTotal = rows.head.getAs[Long]("plan_cents")
    assert(rows.map(_.getAs[Long]("plan_cents")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("lane_cents")).sum == planTotal,
      "lane cents do not sum to the plan total")
    // independent optimum: collect the bounded matrix and try all 24
    // permutations driver-side
    val cells = Tables.orders(spark, sfMid)
      .select(col("o_orderkey").as("ok"), col("o_custkey"))
      .join(Tables.customer(spark, sfMid)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("cn")),
        Seq("o_custkey"))
      .join(Tables.lineitem(spark, sfMid)
        .select(col("l_orderkey").as("ok"),
          col("l_suppkey"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents")),
        Seq("ok"))
      .join(Tables.supplier(spark, sfMid)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey").as("sn")),
        Seq("l_suppkey"))
      .groupBy(col("cn"), col("sn")).agg(sum(col("cents")).as("m"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue) -> r.getLong(2)).toMap
    def top4(by: ((Long, Long)) => Long) = cells.toSeq
      .groupBy(kv => by(kv._1)).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (k, m) => (-m, k) }.take(4).map(_._1)
    val cs = top4(_._1)
    val ss = top4(_._2)
    val best = cs.indices.permutations.map { perm =>
      perm.zipWithIndex.map { case (j, i) =>
        cells.getOrElse((cs(i), ss(j)), 0L) }.sum
    }.max
    assert(planTotal == best,
      s"grid optimum $planTotal != brute-force optimum $best")
  }
}
