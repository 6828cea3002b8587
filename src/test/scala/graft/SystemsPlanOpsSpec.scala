package graft

import org.apache.spark.sql.functions._

/** Semantics of the systems-planning operators (q510–q515) beyond the
  * oracle gate: the latency/durability/capacity math must obey its own
  * monotonicity and conservation laws. */
class SystemsPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q510

  test("tail hedging: hedged p99 never worse, load tracks deadline") {
    val rows = run("q510_tail_hedging_policy")
      .orderBy(col("deadline_permille")).collect()
    assert(rows.map(_.getAs[Long]("deadline_permille")).toSeq ==
      Seq(900L, 950L, 990L))
    for (r <- rows) {
      // hedging can only help: min(X1, d + X2) ≤ X1 pointwise
      assert(r.getAs[Long]("p99_hedged") <= r.getAs[Long]("p99_plain"))
      // the deadline is the pm-quantile, so the backup-send probability
      // is ≤ the quantile's tail mass (ties only shrink it)
      val pm = r.getAs[Long]("deadline_permille")
      val load = r.getAs[Long]("extra_load_ppm")
      assert(load <= (1000L - pm) * 1000L, s"pm=$pm load=$load")
      assert(load >= 0L)
    }
    // a later deadline hedges fewer requests
    val loads = rows.map(_.getAs[Long]("extra_load_ppm"))
    assert(loads.sliding(2).forall { case Array(a, b) => b <= a })
    // deadlines are the claimed order statistics: monotone increasing
    val ds = rows.map(_.getAs[Long]("deadline_c"))
    assert(ds.sliding(2).forall { case Array(a, b) => b >= a })
  }

  // ---------------------------------------------------------------- q511

  test("quorum latency: waiting for more replicas is slower, quantiles ordered") {
    val rows = run("q511_quorum_read_latency")
      .orderBy(col("read_quorum")).collect()
    assert(rows.map(_.getAs[Long]("read_quorum")).toSeq == Seq(1L, 2L, 3L))
    for (r <- rows) {
      assert(r.getAs[Long]("read_quorum") + r.getAs[Long]("write_quorum") == 4L)
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p99"))
      assert(r.getAs[Long]("p99") <= r.getAs[Long]("p999"))
    }
    // R-th order statistic is monotone in R at every quantile
    for (q <- Seq("p50", "p99", "p999")) {
      val v = rows.map(_.getAs[Long](q))
      assert(v.sliding(2).forall { case Array(a, b) => b >= a },
        s"$q not monotone in R: ${v.toSeq}")
    }
    // fastest-of-3 p50 must not exceed the single-replica median region:
    // P(min > t) = q³ ≤ q, so the R=1 curve sits left of R=2's
    assert(rows(0).getAs[Long]("p99") <= rows(1).getAs[Long]("p99"))
  }

  // ---------------------------------------------------------------- q512

  test("erasure coding: overhead/durability tradeoff is real") {
    val rows = run("q512_erasure_code_plan").orderBy(col("k"), col("m")).collect()
    assert(rows.length == 4)
    val rep = rows.head // (k=1, m=2) = 3x replication
    assert(rep.getAs[Long]("storage_overhead_ppm") == 3000000L)
    assert(rep.getAs[Long]("repair_reads_per_lost_block") == 1L)
    for (r <- rows) {
      val k = r.getAs[Long]("k"); val m = r.getAs[Long]("m")
      assert(r.getAs[Long]("storage_overhead_ppm") == (k + m) * 1000000L / k)
      assert(r.getAs[Long]("min_kill_nodes") == m + 1)
      val loss = r.getAs[Long]("loss_ppm_at_min_kill")
      assert(loss > 0L && loss < 1000000L)
      // stored blocks = stripes × stripe width
      assert(r.getAs[Long]("stored_blocks") ==
        r.getAs[Long]("stripes") * (k + m))
      // wider stripes must store cheaper than replication
      if (k > 1) assert(r.getAs[Long]("storage_overhead_ppm") < 3000000L)
    }
  }

  // ---------------------------------------------------------------- q513

  test("group commit: bigger windows batch more and wait longer") {
    val rows = run("q513_group_commit_sweep").orderBy(col("window_ms")).collect()
    assert(rows.map(_.getAs[Long]("window_ms")).toSeq == Seq(1L, 5L, 20L, 100L))
    for (r <- rows) {
      val w_us = r.getAs[Long]("window_ms") * 1000L
      assert(r.getAs[Long]("n_commits") <= r.getAs[Long]("n_events"))
      // each event waits at least 1 µs (flush at window end) and less
      // than a full window
      val mean = r.getAs[Long]("mean_wait_us")
      assert(mean >= 1L && mean <= w_us, s"w=$w_us mean=$mean")
      assert(r.getAs[Long]("batch_milli") >= 1000L)
    }
    val commits = rows.map(_.getAs[Long]("n_commits"))
    assert(commits.sliding(2).forall { case Array(a, b) => b <= a })
    val reduction = rows.map(_.getAs[Long]("fsync_reduction_ppm"))
    assert(reduction.sliding(2).forall { case Array(a, b) => b >= a })
  }

  // ---------------------------------------------------------------- q514

  test("backlog catchup: more capacity drains faster; 4h multiplier sufficient") {
    val rows = run("q514_backlog_catchup_plan")
      .orderBy(col("mult_permille")).collect()
    assert(rows.length == 4)
    val feasible = rows.filter(_.getAs[Long]("catchup_milli_hours") >= 0L)
    assert(feasible.nonEmpty, "at least 2x capacity must be feasible")
    val times = feasible.map(_.getAs[Long]("catchup_milli_hours"))
    assert(times.sliding(2).forall {
      case Array(a, b) => b <= a
      case _           => true
    })
    for (r <- rows) {
      assert(r.getAs[Long]("backlog_events") ==
        2L * r.getAs[Long]("peak_hourly"))
      // the claimed 4h multiplier really recovers within 4h: surplus at
      // that multiplier × 4h ≥ backlog
      val lam = r.getAs[Long]("avg_hourly")
      val need = r.getAs[Long]("mult_needed_4h_permille")
      assert(lam * (need - 1000L) * 4L >= r.getAs[Long]("backlog_events") * 1000L)
    }
  }

  // ---------------------------------------------------------------- q515

  test("replica placement: best pair dominates, shares conserve") {
    val df = run("q515_replica_placement_plan")
    val rows = df.collect()
    assert(rows.length == 10, "C(5,2) placements")
    for (r <- rows) {
      assert(r.getAs[Long]("local_orders") <= r.getAs[Long]("total"))
      val ppm = r.getAs[Long]("local_ppm")
      assert(ppm > 0L && ppm < 1000000L)
    }
    // pair sums are consistent: recover per-region counts from three
    // pairs (cnt(a) = (ab + ac − bc) / 2) and check every pair is the
    // sum of its two regions — and the winner is the top-2 regions
    val pair = rows.map(r => (r.getAs[String]("region_a"),
      r.getAs[String]("region_b")) -> r.getAs[Long]("local_orders")).toMap
    def p(a: String, b: String): Long =
      if (a < b) pair((a, b)) else pair((b, a))
    val regions = rows.flatMap(r => Seq(r.getAs[String]("region_a"),
      r.getAs[String]("region_b"))).distinct.sorted
    val Array(ra, rb, rc) = regions.take(3)
    val cnt = regions.map { g =>
      val (x, y) = (regions.filterNot(_ == g)(0), regions.filterNot(_ == g)(1))
      g -> (p(g, x) + p(g, y) - p(x, y)) / 2
    }.toMap
    assert((p(ra, rb) + p(ra, rc) - p(rb, rc)) % 2 == 0)
    for (((a, b), v) <- pair) assert(cnt(a) + cnt(b) == v, s"($a,$b)")
    val top = rows.maxBy(r => (r.getAs[Long]("local_ppm"),
      r.getAs[String]("region_a")))
    val top2 = cnt.toSeq.sortBy(-_._2).take(2).map(_._1).sorted
    assert(top.getAs[Long]("local_orders") == cnt(top2(0)) + cnt(top2(1)))
  }

  // ---------------------------------------------------------------- q516

  test("continuous batching: same work, padding grows with batch size") {
    val rows = run("q516_continuous_batching_gain")
      .orderBy(col("batch_size")).collect()
    assert(rows.map(_.getAs[Long]("batch_size")).toSeq == Seq(4L, 8L, 16L, 32L))
    // continuous cost is the true token count — identical at every B
    assert(rows.map(_.getAs[Long]("continuous_steps")).distinct.length == 1)
    for (r <- rows) {
      assert(r.getAs[Long]("static_steps") >= r.getAs[Long]("continuous_steps"))
      val s = r.getAs[Long]("savings_ppm")
      assert(s >= 0L && s < 1000000L)
    }
    // wider static batches pad to a larger max: static cost is monotone
    val st = rows.map(_.getAs[Long]("static_steps"))
    assert(st.sliding(2).forall { case Array(a, b) => b >= a })
  }

  // ---------------------------------------------------------------- q517

  test("gang scheduling: packing arithmetic exact, shares conserve") {
    val rows = run("q517_gang_schedule_fragmentation").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val g = r.getAs[Long]("gang_gpus")
      val jobs = r.getAs[Long]("n_jobs")
      val jpn = r.getAs[Long]("jobs_per_node")
      val nodes = r.getAs[Long]("nodes_needed")
      assert(g >= 1L && g <= 8L)
      assert(jpn == 8L / g)
      assert(nodes == (jobs + jpn - 1) / jpn)
      assert(r.getAs[Long]("stranded_gpus") == nodes * 8L - jobs * g)
      val util = r.getAs[Long]("util_ppm")
      assert(util > 0L && util <= 1000000L)
      // a gang size dividing 8 strands nothing on full nodes: util of
      // g ∈ {1,2,4,8} is ≥ that of g=3 when full (only last node ragged)
      if (g == 1L) assert(util >= 1000000L - 1000000L / jobs.max(1L) * 7L)
    }
    assert(rows.map(_.getAs[Long]("demand_share_ppm")).sum <= 1000000L)
    assert(rows.map(_.getAs[Long]("demand_share_ppm")).sum >= 1000000L -
      rows.length)
  }

  // ---------------------------------------------------------------- q518

  test("retry budget: more retries help less, load amplifies with f") {
    val rows = run("q518_retry_budget_amplification").collect()
    assert(rows.length == 32, "8 shards x 4 budgets")
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    for ((_, rs) <- byShard) {
      val sorted = rs.sortBy(_.getAs[Long]("budget"))
      val succ = sorted.map(_.getAs[Long]("success_ppm"))
      assert(succ.sliding(2).forall { case Array(a, b) => b >= a },
        s"success not monotone in budget: ${succ.toSeq}")
      val att = sorted.map(_.getAs[Long]("attempts_milli"))
      assert(att.sliding(2).forall { case Array(a, b) => b >= a })
      assert(att.head == 1000L, "budget 0 = exactly one attempt")
      // budget-0 success = 1 - f exactly
      assert(succ.head == 1000000L - sorted.head.getAs[Long]("fail_ppm"))
    }
  }

  // ---------------------------------------------------------------- q519

  test("fan-out tail: wider fan-out is strictly slower and blows the SLO") {
    val rows = run("q519_fanout_tail_amplification")
      .orderBy(col("fanout")).collect()
    assert(rows.map(_.getAs[Long]("fanout")).toSeq == Seq(4L, 16L, 64L, 256L))
    for (q <- Seq("p50_max", "p99_max", "blown_at_single_p99_ppm")) {
      val v = rows.map(_.getAs[Long](q))
      assert(v.sliding(2).forall { case Array(a, b) => b >= a },
        s"$q not monotone in fanout: ${v.toSeq}")
    }
    for (r <- rows) {
      assert(r.getAs[Long]("p50_max") <= r.getAs[Long]("p99_max"))
      val blown = r.getAs[Long]("blown_at_single_p99_ppm")
      assert(blown >= 0L && blown <= 1000000L)
    }
    // at s=256 the shard p99 is blown with near-certainty:
    // 1 - 0.99^256 ≈ 0.923 (floor-ppm can only push it higher)
    assert(rows.last.getAs[Long]("blown_at_single_p99_ppm") > 900000L)
  }

  // ---------------------------------------------------------------- q520

  test("load shedding: targets hit exactly, cheap traffic dies first") {
    val rows = run("q520_load_shed_priority_plan")
      .orderBy(col("shed_permille")).collect()
    assert(rows.map(_.getAs[Long]("shed_permille")).toSeq ==
      Seq(100L, 250L, 500L))
    for (r <- rows) {
      // pro-rating makes the shed event count exact up to the permille
      // floor: |shed_ppm − target·1000| < 1000000/tot_n rounding, and
      // never overshoots the target
      val target = r.getAs[Long]("shed_permille") * 1000L
      val ppm = r.getAs[Long]("events_shed_ppm")
      assert(ppm <= target && ppm >= target - 1000L, s"target=$target ppm=$ppm")
      val kept = r.getAs[Long]("revenue_retained_ppm")
      assert(kept > 0L && kept <= 1000000L)
      // shedding the CHEAPEST events first keeps revenue share above
      // event share: retained revenue ppm > retained event ppm
      assert(kept >= 1000000L - ppm, s"kept=$kept ppm=$ppm")
    }
    // more shedding → monotone: fewer kept, more types dark
    val kept = rows.map(_.getAs[Long]("revenue_retained_ppm"))
    assert(kept.sliding(2).forall { case Array(a, b) => b <= a })
    val dark = rows.map(_.getAs[Long]("types_fully_shed"))
    assert(dark.sliding(2).forall { case Array(a, b) => b >= a })
  }

  // ---------------------------------------------------------------- q521

  test("write conflicts: longer lag can only add conflicts") {
    val rows = run("q521_write_conflict_rate").orderBy(col("lag_s")).collect()
    assert(rows.map(_.getAs[Long]("lag_s")).toSeq == Seq(3600L, 21600L, 86400L))
    val pairs = rows.map(_.getAs[Long]("conflict_pairs"))
    assert(pairs.sliding(2).forall { case Array(a, b) => b >= a })
    val parts = rows.map(_.getAs[Long]("parts_affected"))
    assert(parts.sliding(2).forall { case Array(a, b) => b >= a })
    for (r <- rows) {
      assert(r.getAs[Long]("parts_affected") <= r.getAs[Long]("conflict_pairs"))
      assert(r.getAs[Long]("conflicts_per_million_writes") >= 0L)
    }
    // ground truth at 24h on a small slice: recount via a plain
    // self-join over one part's writes
    val spark0 = spark
    import spark0.implicits._
    val w = graft.Tables.lineitem(spark, sfMid)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        graft.functions.Deterministic.epochS(col("l_shipdate")).as("ts"))
      .as[(Long, Long, Long)].collect()
    val brute = w.groupBy(_._1).valuesIterator.map { g =>
      g.flatMap(a => g.map(b => (a, b))).count { case (a, b) =>
        a._2 != b._2 &&
          (b._3 > a._3 || (b._3 == a._3 && b._2 > a._2)) &&
          b._3 - a._3 <= 86400L
      }.toLong
    }.sum
    assert(rows.last.getAs[Long]("conflict_pairs") == brute)
  }

  // ---------------------------------------------------------------- q522

  test("bulkhead sizing: Little's law identities hold per type") {
    val rows = run("q522_bulkhead_little_law").collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val n = r.getAs[Long]("n")
      val span = r.getAs[Long]("span_s")
      assert(span > 0L)
      assert(r.getAs[Long]("lambda_milli") == n * 1000L / span)
      val load = r.getAs[Long]("load_micro")
      // pool covers the offered load with 20% headroom, rounded up
      val pool = r.getAs[Long]("pool_size")
      assert(pool == (load * 12L / 10L + 999999L) / 1000000L)
      assert(pool * 1000000L >= load, "pool must cover the load")
      assert(r.getAs[Long]("mean_svc_10us") > 0L)
    }
  }
}
