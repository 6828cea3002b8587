package graft

import org.apache.spark.sql.functions._

/** Semantics of the sequence/causal/graph operators (q413–q415) beyond
  * the oracle gate. */
class SequenceOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q413

  test("gapped sequences: support bounded by users, anti-monotone vs prefix pair") {
    val rows = run("q413_gapped_sequence_support").collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sfMid)
      .select(col("user_id")).distinct().count()
    val support = rows.map(r => (
      (r.getAs[String]("t1"), r.getAs[String]("t2"), r.getAs[String]("t3")),
      r.getAs[Long]("support"))).toMap
    assert(support.values.forall(s => s >= 1 && s <= nUsers))
    // independent witness for the top triple: recount its support directly
    val top = rows.maxBy(_.getAs[Long]("support"))
    val (t1, t2, t3) = (top.getAs[String]("t1"), top.getAs[String]("t2"),
      top.getAs[String]("t3"))
    val recount = Tables.events(spark, sfMid)
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_type")).collect()
      .groupBy(_.getLong(0))
      .count { case (_, evs) =>
        val types = evs.map(_.getString(1)).toSeq
        val i = types.indexOf(t1)
        val j = if (i < 0) -1 else types.indexOf(t2, i + 1)
        i >= 0 && j >= 0 && types.indexOf(t3, j + 1) >= 0
      }
    assert(recount.toLong == top.getAs[Long]("support"))
  }

  // ---------------------------------------------------------------- q414

  test("quantile treatment effects: deciles ordered within each arm") {
    val rows = run("q414_quantile_treatment_effects").orderBy(col("bp")).collect()
    assert(rows.map(_.getAs[Long]("bp")).toSeq ==
      (1 to 9).map(_ * 1000L).toSeq)
    val qt = rows.map(_.getAs[Long]("q_treated_c")).toSeq
    val qc = rows.map(_.getAs[Long]("q_control_c")).toSeq
    assert(qt == qt.sorted && qc == qc.sorted,
      "quantiles must be non-decreasing in the rank")
    for (r <- rows) {
      assert(r.getAs[Long]("n_treated") > 0 && r.getAs[Long]("n_control") > 0)
      assert(r.getAs[Long]("qte_c") ==
        r.getAs[Long]("q_treated_c") - r.getAs[Long]("q_control_c"))
    }
  }

  test("quantile treatment effects: median matches a direct exact selection") {
    val med = run("q414_quantile_treatment_effects")
      .filter(col("bp") === 5000).collect().head
    val direct = Tables.lineitem(spark, sfMid)
      .filter(col("l_discount") === 0d)
      .select(graft.functions.Deterministic.cents(col("l_extendedprice")).as("c"))
      .orderBy(col("c")).collect().map(_.getLong(0))
    // smallest value whose cumulative count reaches half (the gate's rule)
    val expect = direct((direct.length * 5000 + 9999) / 10000 - 1)
    assert(med.getAs[Long]("q_control_c") == expect)
  }

  // ---------------------------------------------------------------- q415

  test("hits: top suppliers normalized, leader at the cap, ranks total-ordered") {
    val rows = run("q415_hits_hub_authority").collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Long]("authority_q")).toSeq
    assert(scores.head == 1000000L, "max-normalization pins the leader at 10⁶")
    assert(scores == scores.sorted.reverse, "descending by authority")
    assert(scores.forall(s => s >= 0 && s <= 1000000L))
    val keys = rows.map(_.getAs[Long]("s_suppkey"))
    assert(keys.distinct.length == keys.length)
  }
}
