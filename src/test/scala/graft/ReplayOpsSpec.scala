package graft

import org.apache.spark.sql.functions._

/** Semantics of the replay/billing/certificate operators (q467–q469)
  * beyond the oracle gate. */
class ReplayOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q467

  test("bandit replay: oracle dominates, estimates are rates in [0, 1e6]") {
    val r = run("q467_bandit_replay_ope").collect().head
    val policy = r.getAs[Long]("policy_reward_ppm")
    val logging = r.getAs[Long]("logging_reward_ppm")
    val oracle = r.getAs[Long]("oracle_fixed_arm_ppm")
    for (v <- Seq(policy, logging, oracle)) assert(v >= 0L && v <= 1000000L)
    // the best FIXED arm beats the logging average by construction
    assert(oracle >= logging)
    assert(r.getAs[Long]("n_matched") > 0L, "replay must match some rows")
  }

  // ---------------------------------------------------------------- q468

  test("tiering bill: months partition, tier prices respected, savings match rates") {
    val rows = run("q468_storage_tiering_bill").collect()
    val byTier = rows.map(r => r.getAs[String]("tier") -> r).toMap
    assert(byTier.keySet == Set("hot", "warm", "cold"))
    assert(byTier("hot").getAs[Long]("n_months") == 3L)
    assert(byTier("warm").getAs[Long]("n_months") == 9L)
    // savings are tier-rate identities: (100 - price)/100
    assert(byTier("hot").getAs[Long]("savings_ppm") == 0L)
    assert(byTier("warm").getAs[Long]("savings_ppm") == 700000L)
    assert(byTier("cold").getAs[Long]("savings_ppm") == 960000L)
    for (r <- rows)
      assert(r.getAs[Long]("est_bytes") == r.getAs[Long]("n_rows") * 64L)
  }

  // ---------------------------------------------------------------- q469

  test("outer join decomposition: counts and checksums reassemble exactly") {
    val rows = run("q469_outer_join_decomposition").collect()
    val m = rows.map(r => r.getAs[String]("component") ->
      (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    assert(m.keySet ==
      Set("full_direct", "inner", "left_anti", "right_anti"))
    // every component participates (filters were chosen to guarantee it)
    assert(m("inner")._1 > 0L && m("left_anti")._1 > 0L && m("right_anti")._1 > 0L)
    assert(m("full_direct")._1 ==
      m("inner")._1 + m("left_anti")._1 + m("right_anti")._1)
    assert(m("full_direct")._2 ==
      m("inner")._2 + m("left_anti")._2 + m("right_anti")._2,
      "value checksum must reassemble, not just the row count")
  }
}
