package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-7 batch/queue planning batch (q605–q610)
  * beyond the oracle gate. */
class BatchQueueOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("critical batch size: positive, pooled row present") {
    val rows = run("q605_critical_batch_size").collect()
    val labels = rows.map(_.getAs[Long]("label"))
    assert(labels.contains(-1L), "pooled (-1) row required")
    rows.foreach { r =>
      assert(r.getAs[Long]("b_crit_milli") > 0L,
        "trace(Σ) and ‖G‖² are positive on real embeddings")
      assert(r.getAs[Long]("n_vectors") > 0L)
    }
  }

  test("loss scale: overflow monotone up, underflow monotone down") {
    val rows = run("q606_loss_scale_range_audit").collect()
      .sortBy(_.getAs[Long]("scale"))
    assert(rows.length == 4)
    val over = rows.map(_.getAs[Long]("values_overflow"))
    val under = rows.map(_.getAs[Long]("underflow_ppm"))
    assert(over.sliding(2).forall { case Array(a, b) => b >= a }, over.toSeq.toString)
    assert(under.sliding(2).forall { case Array(a, b) => b <= a }, under.toSeq.toString)
    rows.foreach(r => assert(r.getAs[Boolean]("is_safe")
      == (r.getAs[Long]("values_overflow") == 0L)))
  }

  test("inverse-sqrt schedule: peaks at warmup boundary, decays after") {
    val rows = run("q607_inverse_sqrt_lr_plan").collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 11)
    rows.foreach(r => assert(r.getAs[Long]("lr_milli") >= 0L
      && r.getAs[Long]("lr_milli") <= 1000L))
    // past warmup (deciles 1..10 here: warmup = steps/100 < steps/10)
    // the schedule is nonincreasing
    val post = rows.filter(r => r.getAs[Long]("step") > r.getAs[Long]("warmup"))
      .map(_.getAs[Long]("lr_milli"))
    assert(post.sliding(2).forall { case Array(a, b) => b <= a }, post.toSeq.toString)
  }

  test("Erlang-C: more agents can only cut the wait probability") {
    val rows = run("q608_erlang_c_staffing").collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val c4 = r.getAs[Long]("wait_prob_s4_ppm")
      val c8 = r.getAs[Long]("wait_prob_s8_ppm")
      val c12 = r.getAs[Long]("wait_prob_s12_ppm")
      assert(c4 >= c8 && c8 >= c12, s"monotone staffing: $c4 $c8 $c12")
      Seq(c4, c8, c12).foreach(c => assert(c >= 0L && c <= 1000000L))
      val m = r.getAs[Long]("min_agents_20pct")
      assert(m == -1L || (m >= 1L && m <= 12L))
    }
  }

  test("tandem: exactly one bottleneck at the max utilization") {
    val rows = run("q609_tandem_bottleneck").collect()
    assert(rows.length == 5)
    val maxRho = rows.map(_.getAs[Long]("rho_ppm")).max
    val bn = rows.filter(_.getAs[Boolean]("is_bottleneck"))
    assert(bn.nonEmpty && bn.forall(_.getAs[Long]("rho_ppm") == maxRho))
    rows.foreach(r =>
      assert(r.getAs[Long]("headroom_ppm") == 1000000000000L / maxRho))
  }

  test("backlog: capacity up, max backlog down; feasibility monotone") {
    val rows = run("q610_deadline_backlog_audit").collect()
      .sortBy(_.getAs[Long]("cap_permille"))
    assert(rows.length == 3)
    val backlog = rows.map(_.getAs[Long]("max_backlog_centi"))
    assert(backlog.sliding(2).forall { case Array(a, b) => b <= a },
      backlog.toSeq.toString)
    rows.foreach { r =>
      // 3-day feasibility dominates 1-day
      assert(!r.getAs[Boolean]("feasible_1d") || r.getAs[Boolean]("feasible_3d"))
      assert(r.getAs[Long]("catchup_days_milli") >= 0L)
    }
  }
}
