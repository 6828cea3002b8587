package graft

import org.apache.spark.sql.functions._

/** Semantics of the lateness/fidelity operators (q464–q466) beyond the
  * oracle gate. */
class LatenessOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q464

  test("laggards: quantiles ordered, max is the true straggler") {
    val r = run("q464_watermark_laggards").collect().head
    val (p50, p90, p99, mx) = (r.getAs[Long]("p50_lag_s"), r.getAs[Long]("p90_lag_s"),
      r.getAs[Long]("p99_lag_s"), r.getAs[Long]("max_lag_s"))
    assert(p50 <= p90 && p90 <= p99 && p99 <= mx)
    assert(r.getAs[Long]("n_over_1d") >= 1L, "some users must trail > 1 day")
    // recompute the max lag directly
    val e = Tables.events(spark, sfMid)
      .select(col("user_id"), graft.functions.Deterministic.epochS(col("ts")).as("s"))
    val lastByUser = e.groupBy(col("user_id")).agg(max(col("s")).as("ls"))
    val tmax = e.agg(max(col("s"))).collect().head.getLong(0)
    val maxLag = lastByUser.agg(max(lit(tmax) - col("ls"))).collect().head.getLong(0)
    assert(mx == maxLag)
    assert(r.getAs[Long]("n_users") == lastByUser.count())
  }

  // ---------------------------------------------------------------- q465

  test("tokenize roundtrip: the contract holds on every document") {
    val rows = run("q465_tokenize_roundtrip_certificate").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_exact") == r.getAs[Long]("n_docs"),
        s"lossy tokenization in ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("roundtrip_ppm") == 1000000L)
    }
  }

  // ---------------------------------------------------------------- q466

  test("ivf balance: cells partition the vectors, ratios consistent") {
    val rows = run("q466_ivf_cell_balance").collect()
    assert(rows.length == 8)
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(total == Tables.embeddings(spark, sfMid).count(),
      "cells partition the corpus")
    val biggest = rows.map(_.getAs[Long]("n_vectors")).max
    for (r <- rows) {
      assert(r.getAs[Long]("ratio_to_mean_milli") ==
        r.getAs[Long]("n_vectors") * 8L * 1000L / total)
      assert((r.getAs[Long]("is_largest") == 1L) ==
        (r.getAs[Long]("n_vectors") == biggest))
    }
    // a healthy 1-iteration k-means on isotropic data stays within 2x
    assert(biggest * 8 <= total * 2, "no runaway hub cell on this data")
  }
}
