package graft

/** Semantics of the round-9 hygiene/balance (q682–q683), lead-change
  * (q684) and partition-quality (q685–q687) batches beyond the oracle
  * gate. */
class HygieneConductanceOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q682: conflict censuses nest; every conflicted cluster rescues") {
    val r = run("q682_dup_label_conflicts").collect().head
    val docs = r.getAs[Long]("n_docs"); val cl = r.getAs[Long]("n_clusters")
    val multi = r.getAs[Long]("n_multi")
    assert(cl <= docs && multi <= cl)
    assert(r.getAs[Long]("n_lang_conflict") <= multi)
    assert(r.getAs[Long]("n_source_conflict") <= multi)
    val relabel = r.getAs[Long]("relabel_docs")
    assert(relabel >= r.getAs[Long]("n_lang_conflict"),
      "each lang-conflicted cluster rescues at least one member")
    assert(relabel <= docs)
  }

  test("q666: the curator census books the whole corpus exactly once") {
    val rows = run("q666_dedup_pipeline_census").collect()
    val nDocs = SparkEntry.queries("q682_dup_label_conflicts")(spark, sfMid)
      .collect().head.getAs[Long]("n_docs")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one cluster-size band")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs")
        == r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("removed_chars")
        == r.getAs[Long]("chars_total") - r.getAs[Long]("kept_chars"))
      if (r.getAs[Long]("cluster_size") == 1L)
        assert(r.getAs[Long]("removed_chars") == 0L,
          "singletons always survive whole")
    }
  }

  test("q683: both segregation indices are valid ppm per language") {
    val rows = run("q683_language_evenness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("d_ppm"); val iso = r.getAs[Long]("isolation_ppm")
      assert(d >= 0L && d <= 1000000L, s"D $d")
      // per-term floors can only LOWER the exact isolation value
      assert(iso >= 0L && iso <= 1000000L, s"isolation $iso")
      assert(r.getAs[Long]("n_docs_lang") >= 1L)
    }
  }

  test("q684: lead bands partition the days; flips bounded") {
    val rows = run("q684_lead_change_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("days_view_lead") + r.getAs[Long]("days_buy_lead")
        + r.getAs[Long]("days_tied") == r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("lead_changes") <= r.getAs[Long]("n_days"))
      assert(r.getAs[Long]("max_abs_margin") >= 0L)
    }
  }

  test("q685: per-nation volume reconciles as 2·internal + cut") {
    val rows = run("q685_partition_conductance").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("vol")
        == 2 * r.getAs[Long]("internal_edges") + r.getAs[Long]("cut"),
        s"nation ${r.getAs[Long]("nk")} volume bookkeeping")
      val phi = r.getAs[Long]("conductance_ppm")
      assert(phi >= 0L && phi <= 1000000L, s"phi $phi")
      assert(r.getAs[Long]("n_members") >= 1L)
    }
  }

  test("q686: homophily is a signed ppm with consistent edge counts") {
    val r = run("q686_nation_homophily").collect().head
    val m2 = r.getAs[Long]("m2")
    assert(m2 % 2 == 0, "symmetric edge list must have even row count")
    assert(r.getAs[Long]("internal_edges") <= m2 / 2)
    val h = r.getAs[Long]("homophily_ppm")
    assert(h <= 1000000L, s"homophily $h cannot exceed 1")
  }

  test("q687: sweep sets grow with f and conductance stays a valid ppm") {
    val rows = run("q687_conductance_sweep").collect().sortBy(_.getAs[Long]("f"))
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_s") <= b.getAs[Long]("n_s"))
      assert(a.getAs[Long]("vol") <= b.getAs[Long]("vol"))
      assert(a.getAs[Long]("d_f") >= b.getAs[Long]("d_f"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("cut") <= r.getAs[Long]("vol"))
      val phi = r.getAs[Long]("conductance_ppm")
      assert(phi >= 0L && phi <= 1000000L, s"phi $phi")
    }
  }
}
