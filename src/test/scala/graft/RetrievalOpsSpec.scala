package graft

import org.apache.spark.sql.functions._

/** Semantics of the retrieval/testing operators (q416–q418) beyond the
  * oracle gate. */
class RetrievalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q416

  test("bm25: positive discriminating scores, saturation bounded") {
    val rows = run("q416_bm25_ranking").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score_q")).toSeq
    assert(scores == scores.sorted.reverse, "descending by score")
    assert(scores.head > 0L, "mid-frequency terms must yield positive IDF")
    assert(scores.distinct.length > 1, "scores must discriminate documents")
    for (r <- rows) {
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1L && hits <= 3L)
      // per-term score < idf_q_max · 2200; idf_q ≤ 30 ⇒ hard cap
      assert(r.getAs[Long]("score_q") < hits * 30L * 2200L)
    }
  }

  // ---------------------------------------------------------------- q417

  test("bh fdr: step-up coherence — rejections are a rank prefix under ramp") {
    val rows = run("q417_bh_fdr_control").orderBy(col("rank")).collect()
    assert(rows.length == 25)
    val stats = rows.map(_.getAs[Long]("stat_ppm")).toSeq
    assert(stats == stats.sorted.reverse, "ranked by statistic descending")
    val ths = rows.map(_.getAs[Long]("t_ppm")).toSeq
    assert(ths == ths.sorted.reverse, "BH thresholds decrease with rank")
    assert(ths.head == 9549535L && ths.last == 3841458L,
      "endpoints are chi2(1) icdf at alpha/m and alpha")
    val rej = rows.map(_.getAs[Long]("rejected")).toSeq
    // step-up: rejections form a prefix of the ranking
    assert(!rej.dropWhile(_ == 1L).contains(1L), s"non-prefix rejections: $rej")
    // and the prefix ends exactly at the last threshold crossing
    val kMax = rows.filter(r => r.getAs[Long]("stat_ppm") >= r.getAs[Long]("t_ppm"))
      .map(_.getAs[Long]("rank")).sorted.lastOption.getOrElse(0L)
    assert(rej.count(_ == 1L).toLong == kMax)
  }

  // ---------------------------------------------------------------- q418

  test("kmv containment: bounded ppm, reasonable accuracy vs exact") {
    val rows = run("q418_kmv_containment").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("est_a") >= 0L)
      assert(r.getAs[Long]("est_diff") >= 0L)
      val est = r.getAs[Long]("est_containment_ppm")
      val exact = r.getAs[Long]("exact_containment_ppm")
      assert(est >= 0L && exact >= 0L && exact <= 1000000L)
      // k=64 sketches are coarse; containment must still land in the
      // right half of the spectrum (±35 points absolute)
      assert(math.abs(est - exact) <= 350000L,
        s"${r.getAs[String]("src_a")}→${r.getAs[String]("src_b")}: est $est vs exact $exact")
    }
  }
}
