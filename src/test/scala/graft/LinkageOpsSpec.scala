package graft

import org.apache.spark.sql.functions._

/** Semantics of the linkage/curation operators (q404–q406) beyond the
  * oracle gate: span accounting, isotonic fit properties, and the
  * Fellegi–Sunter probability axioms. */
class LinkageOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q404

  test("duplicate spans: accounting is consistent and bounded per source") {
    val rows = run("q404_duplicate_span_merge").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nDocs = r.getAs[Long]("n_docs")
      val affected = r.getAs[Long]("docs_affected")
      val spans = r.getAs[Long]("n_spans")
      val dupTok = r.getAs[Long]("dup_tokens")
      val tok = r.getAs[Long]("tokens")
      assert(affected <= nDocs)
      assert(spans >= affected, "an affected doc has at least one span")
      // maximal merged spans are disjoint, each ≥ 5 tokens, within the doc
      assert(dupTok >= 5L * spans || spans == 0L)
      assert(dupTok <= tok, "spans cannot exceed the source's token mass")
      assert(r.getAs[Long]("dup_ppm") == dupTok * 1000000L / tok)
    }
  }

  test("duplicate spans: a shared 5-gram really exists when spans do") {
    val total = run("q404_duplicate_span_merge")
      .agg(sum(col("dup_tokens")).as("s")).collect().head.getAs[Long]("s")
    // independent witness: at least one 5-gram shared by ≥ 2 docs
    val shared = Tables.documents(spark, sfMid)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(filter(split(text, ' '), t -> length(t) > 0)) - 4), " +
          "i -> concat_ws(' ', slice(filter(split(text, ' '), t -> length(t) > 0), i, 5)))")).as("g"))
      .groupBy(col("g")).agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).limit(1).count()
    assert((shared > 0) == (total > 0))
  }

  // ---------------------------------------------------------------- q405

  test("isotonic fit: monotone, bracketed by raw extremes, mean-preserving order") {
    val rows = run("q405_isotonic_return_curve")
      .orderBy(col("discount_pct")).collect()
    assert(rows.length >= 2)
    val iso = rows.map(_.getAs[Long]("iso_ppm")).toSeq
    assert(iso == iso.sorted, s"isotonic fit must be non-decreasing: $iso")
    val raw = rows.map(_.getAs[Long]("raw_ppm")).toSeq
    assert(iso.min >= raw.min - 1 && iso.max <= raw.max + 1,
      "PAV pools averages, so the fit stays inside the raw range (±floor slack)")
    // PAV preserves the weighted mean up to floor error: |Σ n·(iso−raw)| small
    val drift = rows.map(r =>
      r.getAs[Long]("n_rows") * (r.getAs[Long]("iso_ppm") - r.getAs[Long]("raw_ppm"))).sum
    val totalN = rows.map(_.getAs[Long]("n_rows")).sum
    assert(math.abs(drift) <= totalN, s"mean drift $drift exceeds floor slack $totalN")
  }

  // ---------------------------------------------------------------- q406

  test("fellegi-sunter: probabilities in [0,1], m > u for discriminating fields") {
    val rows = run("q406_fellegi_sunter_weights").collect()
    assert(rows.map(_.getAs[String]("field")).toSet ==
      Set("lang", "source", "len_bucket"))
    for (r <- rows) {
      val m = r.getAs[Double]("m_prob")
      val u = r.getAs[Double]("u_prob")
      assert(m >= 0d && m <= 1d, s"m out of range: $m")
      assert(u > 0d && u <= 1d, s"u out of range: $u")
      assert(r.getAs[Long]("m_num") % 2 == 0 && r.getAs[Long]("u_num") % 2 == 0,
        "ordered agreeing pairs come in both orders")
      assert(r.getAs[Double]("weight") == m / u)
    }
    // the same m denominator (within-family ordered pairs) for every field
    assert(rows.map(_.getAs[Long]("m_den")).distinct.length == 1)
  }

  // ---------------------------------------------------------------- q409

  test("edit-distance verify: star pairs, metric bounds, self-consistent ppm") {
    val rows = run("q409_edit_distance_verify").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("doc_id") > r.getAs[Long]("canonical_id"))
      val lev = r.getAs[Long]("lev")
      val lm = r.getAs[Long]("len_max")
      assert(lev >= 0L && lev <= lm, "levenshtein ≤ longer-string length")
      assert(r.getAs[Long]("norm_ppm") == lev * 1000000L / lm)
      assert((r.getAs[Long]("is_near_dup") == 1L) ==
        (r.getAs[Long]("norm_ppm") <= 200000L))
    }
    // canonical ids never appear as the right-hand member
    val canon = rows.map(_.getAs[Long]("canonical_id")).toSet
    val members = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(canon.intersect(members).isEmpty,
      "star pairing: canonical is always the left side")
  }

  // ---------------------------------------------------------------- q407

  test("roc curve: cumulative counts monotone, endpoints hit (1,1)") {
    val rows = SparkEntry.queries("q407_roc_curve")(spark, sfMid)
      .orderBy(col("score_q").desc).collect()
    assert(rows.length >= 2)
    val tp = rows.map(_.getAs[Long]("cum_tp")).toSeq
    val fp = rows.map(_.getAs[Long]("cum_fp")).toSeq
    assert(tp == tp.sorted && fp == fp.sorted, "cumulative counts are monotone")
    assert(rows.last.getAs[Long]("tpr_ppm") == 1000000L)
    assert(rows.last.getAs[Long]("fpr_ppm") == 1000000L)
    for (r <- rows) {
      assert(r.getAs[Long]("tpr_ppm") <= 1000000L)
      assert(r.getAs[Long]("fpr_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- q408

  test("brier decomposition: one row, non-negative terms, sane bounds") {
    val r = SparkEntry.queries("q408_brier_decomposition")(spark, sfMid)
      .collect().head
    assert(r.getAs[Long]("n_test") > 0L)
    assert(r.getAs[Long]("n_bins") >= 1L)
    assert(r.getAs[Long]("rel_sum_pm2") >= 0L)
    assert(r.getAs[Long]("res_sum_pm2") >= 0L)
    val unc = r.getAs[Long]("unc_pm2")
    assert(unc >= 0L && unc <= 250000L, "p(1-p) peaks at 250000 pm²")
    // resolution cannot exceed uncertainty (up to per-mille floor slack)
    assert(r.getAs[Long]("res_pm2") <= unc + 1000L)
  }
}
