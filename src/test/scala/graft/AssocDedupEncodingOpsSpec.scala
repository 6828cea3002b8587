package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-8 nominal-association (q651–q653),
  * dedup-policy (q654–q656), and encoding-estimator (q657–q659)
  * batches beyond the oracle gate. */
class AssocDedupEncodingOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q651: lambda in [0, 1e6], modal prediction never beats conditioning") {
    val rows = run("q651_gk_lambda_direction").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      // sum of per-row maxima >= global column maximum, always
      assert(r.getAs[Long]("model_correct") >= r.getAs[Long]("base_correct"))
      val l = r.getAs[Long]("lambda_ppm")
      assert(l >= 0L && l <= 1000000L, s"lambda $l")
    }
  }

  test("q652: tau in [~0, 1e6]; Gini PRE nonnegative up to floor slack") {
    val rows = run("q652_gk_tau_direction").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      // Cauchy-Schwarz gives model >= base exactly; each conditional
      // term floors once (< #groups total slack in the ppm numerator)
      val t = r.getAs[Long]("tau_ppm")
      assert(t >= -1L && t <= 1000000L, s"tau $t")
      assert(r.getAs[Long]("model_hits_ppm")
        >= r.getAs[Long]("base_hits_ppm") - 20L)
    }
  }

  test("q653: Cramer's V in [0, 1000] with positive df") {
    val rows = run("q653_cramers_v_battery").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("df_min") >= 1L)
      assert(r.getAs[Long]("chi2_ppm") >= 0L)
      val v = r.getAs[Long]("v_milli")
      assert(v >= 0L && v <= 1000L, s"V $v")
    }
  }

  test("q654: keep-longest dominates keep-first in retained chars") {
    val r = run("q654_keep_policy_delta").collect().head
    assert(r.getAs[Long]("keep_longest_chars") >= r.getAs[Long]("keep_first_chars"))
    assert(r.getAs[Long]("chars_delta")
      == r.getAs[Long]("keep_longest_chars") - r.getAs[Long]("keep_first_chars"))
    assert(r.getAs[Long]("n_policy_differs") <= r.getAs[Long]("n_multi_clusters"))
    assert(r.getAs[Long]("n_multi_clusters") <= r.getAs[Long]("n_clusters"))
    // the synthetic corpus does have shared heads (verified round 8)
    assert(r.getAs[Long]("n_multi_clusters") >= 1L)
  }

  test("q655: upper-triangle source pairs with positive cells") {
    val rows = run("q655_dup_source_matrix").collect()
    assert(rows.nonEmpty, "no cross-source boilerplate found — degenerate")
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_shared_clusters") >= 1L)
    }
  }

  test("q656: docs conserved across buckets; singletons carry no redundancy") {
    val rows = run("q656_dup_exposure_census").collect()
    val docsWithHead = Tables.documents(spark, sfMid)
      .filter(size(expr("filter(split(text, ' '), t -> t != '')")) >= 8)
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsWithHead)
    rows.foreach { r =>
      if (r.getAs[Long]("log2_copies") == 0L)
        assert(r.getAs[Long]("redundant_chars") == 0L
          || r.getAs[Long]("max_copies") > 1L)
      assert(r.getAs[Long]("redundant_chars") >= 0L)
    }
  }

  test("q657: delta-varint never exceeds raw, at least one byte per posting") {
    val rows = run("q657_varint_posting_size").collect()
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_bytes")
      val v = r.getAs[Long]("varint_bytes")
      assert(v <= raw, "varint beaten by raw at 64-bit ids means a bug")
      assert(v >= raw / 8L, "fewer than one byte per posting is impossible")
      assert(r.getAs[Long]("ratio_ppm") == v * 1000000L / raw)
    }
  }

  test("q658: runs bounded by rows below and order count above") {
    val rows = run("q658_rle_run_census").collect()
    rows.foreach { r =>
      val runs = r.getAs[Long]("total_runs")
      assert(runs >= r.getAs[Long]("n_orders"), "every order opens a run")
      assert(r.getAs[Long]("rle_ratio_ppm") <= 1000000L)
    }
  }

  test("q659: runs-test pieces are mutually consistent") {
    val r = run("q659_runs_test_daily_orders").collect().head
    assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_below")
      == r.getAs[Long]("n_days"))
    val runs = r.getAs[Long]("n_runs")
    assert(runs >= 1L && runs <= r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("z2_ppm") >= 0L)
  }
}
