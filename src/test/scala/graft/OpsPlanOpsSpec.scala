package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 operational planners (q552–q557) beyond the
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

  // ---------------------------------------------------------------- q555

  test("moe overflow: content routing drops more than positional, CF monotone") {
    val rows = run("q555_moe_capacity_overflow").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("total_tokens")).distinct.length == 1,
      "both policies route the same token stream")
    val byPolicy = rows.groupBy(_.getAs[String]("policy"))
      .map { case (p, rs) =>
        p -> rs.sortBy(_.getAs[Long]("cf_milli")).map(_.getAs[Long]("dropped_tokens")) }
    // more capacity never drops more
    byPolicy.values.foreach { d =>
      assert(d.sliding(2).forall { case Array(a, b) => b <= a }, d.toSeq.toString) }
    // Zipf-head content routing overflows harder than the uniform hash
    (byPolicy("content") zip byPolicy("position")).foreach { case (c, p) =>
      assert(c >= p, s"content $c < position $p") }
    // aux loss: E·Σf² ≥ 1 always, and content is the less balanced router
    val lb = rows.groupBy(_.getAs[String]("policy"))
      .map { case (p, rs) => p -> rs.head.getAs[Long]("lb_loss_ppm") }
    assert(lb.values.forall(_ >= 1000000L))
    assert(lb("content") > lb("position"))
  }

  // ---------------------------------------------------------------- q556

  test("shaper backlog: faster drain strictly shrinks the queue census") {
    val rows = run("q556_shaper_backlog_audit").orderBy(col("r_milli")).collect()
    assert(rows.map(_.getAs[Long]("r_milli")).toSeq == Seq(2L, 5L, 15L))
    assert(rows.map(_.getAs[Long]("n_users")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("users_carrying") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("carrying_minutes") <= r.getAs[Long]("observed_minutes"))
      assert(r.getAs[Long]("max_carry_milli") <= r.getAs[Long]("total_carry_milli"))
    }
    Seq("carrying_minutes", "total_carry_milli").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      assert(v.sliding(2).forall { case Array(a, b) => b <= a },
        s"$c not monotone in the drain rate: ${v.toSeq}")
    }
  }

  test("shaper backlog: window identity matches the sequential bucket recursion") {
    import graft.functions.Deterministic.epochS
    // brute-force the r=5 shaper per user on the driver:
    // carry_k = max(0, b_{k-1} − r·gap), b_k = carry_k + 1000·a_k
    val r = 5L
    val perMin = Tables.events(spark, sfMid)
      .select(col("user_id"), (epochS(col("ts")) / 60L).cast("long").as("minute"))
      .groupBy(col("user_id"), col("minute")).agg(count(lit(1)).as("a"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val expected = perMin.groupBy(_._1).values.map { g =>
      val s = g.sortBy(_._2)
      var b = 0L; var prevT = s.head._2; var total = 0L
      s.foreach { case (_, t, a) =>
        val carry = math.max(0L, b - r * (t - prevT))
        total += carry; b = carry + 1000L * a; prevT = t
      }
      total
    }.sum
    val got = run("q556_shaper_backlog_audit")
      .filter(col("r_milli") === r).collect().head.getAs[Long]("total_carry_milli")
    assert(got == expected, s"window-identity carry $got != sequential $expected")
  }

  // ---------------------------------------------------------------- q557

  test("peeking: crossings shrink as z rises; A/A peeking shows false stops") {
    val rows = run("q557_peeking_inflation_audit").collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (nc, fc, nd) = (r.getAs[Long]("n_crossings"),
        r.getAs[Long]("first_cross_idx"), r.getAs[Long]("n_days"))
      assert((nc == 0L) == (fc == -1L), "first crossing exists iff any crossing")
      assert(fc <= nd)
    }
    rows.groupBy(_.getAs[String]("stream")).values.foreach { rs =>
      val byZ = rs.sortBy(_.getAs[Long]("z_milli")).map(_.getAs[Long]("n_crossings"))
      assert(byZ.sliding(2).forall { case Array(a, b) => b <= a },
        s"a stricter threshold cannot cross more: ${byZ.toSeq}")
    }
    // the experiment is A/A: daily peeking at z=1.96 still "detects" effects
    val peeked = rows.filter(_.getAs[Long]("z_milli") == 1960L)
    assert(peeked.map(_.getAs[Long]("n_crossings")).sum > 0L,
      "peeking inflation should be visible at z=1.96 on years of daily looks")
  }
}
