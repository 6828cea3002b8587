package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 fidelity audits (q579–q581) beyond the
  * oracle gate. */
class FidelityPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q579

  test("sketches: count-min only overshoots; countsketch errs both ways") {
    val rows = run("q579_countsketch_bias_audit").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // the CM structural guarantee: estimates never undershoot
      assert(r.getAs[Long]("cm_overshoot") >= 0L,
        s"count-min undershot: $r")
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("true_count"))
      assert(r.getAs[Long]("cs_abs_err") ==
        math.abs(r.getAs[Long]("cs_est") - r.getAs[Long]("true_count")))
    }
    // the 16-bucket squeeze really collides: some estimates are wrong
    assert(rows.exists(_.getAs[Long]("cm_overshoot") > 0L),
      "a 16-bucket sketch of a 30+-term vocabulary must collide")
    // and countsketch is two-sided: at least one signed estimate lands
    // BELOW the true count (impossible for count-min)
    assert(rows.exists(r => r.getAs[Long]("cs_est") < r.getAs[Long]("true_count")),
      "countsketch must undershoot somewhere under forced collisions")
  }

  // ---------------------------------------------------------------- q580

  test("hellinger: affinity bounded, identity gives zero drift") {
    val rows = run("q580_hellinger_drift_census").collect()
    assert(rows.length >= 10, "one row per source")
    rows.foreach { r =>
      val (bc, h2) = (r.getAs[Long]("bc_ppm"), r.getAs[Long]("hellinger_sq_ppm"))
      assert(bc >= 0L && bc <= 1000000L)
      assert(h2 == 1000000L - bc || (bc == 1000000L && h2 == 0L))
    }
    // the fix-up'd isqrt is exact: sqrt identity on a perfect square
    // (same formula the query uses, checked through SQL)
    val v = spark.sql(
      """SELECT (CASE
           WHEN (CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT) + 1)
              * (CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT) + 1)
              <= 999998000001
             THEN CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT) + 1
           WHEN CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT)
              * CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT)
              > 999998000001
             THEN CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT) - 1
           ELSE CAST(floor(sqrt(CAST(999998000001 AS DOUBLE))) AS BIGINT) END) AS s
      """).collect().head.getLong(0)
    assert(v == 999999L, s"isqrt(999999^2) = $v")
  }

  // ---------------------------------------------------------------- q581

  test("join sampling: aligned keeps ~10%, misaligned collapses to ~1%") {
    val rows = run("q581_join_preserving_sample").collect()
    assert(rows.length == 3)
    val byS = rows.map(r => r.getAs[String]("strategy") ->
      r.getAs[Long]("join_recall_ppm")).toMap
    // aligned = one_sided by construction (same orderkey predicate)
    assert(byS("aligned") == byS("one_sided"))
    // ~10% with hash noise
    assert(byS("aligned") > 80000L && byS("aligned") < 120000L,
      s"aligned recall ${byS("aligned")} ppm, expected ~100000")
    // the pitfall: independent streams multiply the rates
    assert(byS("misaligned") < 20000L,
      s"misaligned recall ${byS("misaligned")} ppm, expected ~10000")
    assert(byS("misaligned") * 5 < byS("aligned"),
      "misaligned must collapse relative to aligned")
  }
}
