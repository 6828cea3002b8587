package graft

import org.apache.spark.sql.functions._

/** Semantics of the selectivity/storage operators (q443–q445) beyond the
  * oracle gate. */
class SelectivityOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q443

  test("histogram selectivity: exact masses agree across histograms, qerror sane") {
    val rows = run("q443_histogram_selectivity_qerror").collect()
    assert(rows.length == 10)
    val byBand = rows.groupBy(_.getAs[String]("band"))
    for ((band, g) <- byBand) {
      assert(g.length == 2)
      assert(g.map(_.getAs[Long]("exact_rows")).distinct.length == 1,
        s"exact mass must not depend on the histogram: $band")
    }
    for (r <- rows) {
      assert(r.getAs[Long]("qerror_milli") >= 1000L, "qerror >= 1 by definition")
      // order totals are smooth: 64 buckets estimate bands within 15%
      assert(r.getAs[Long]("qerror_milli") <= 1150L,
        s"${r.getAs[String]("hist")}/${r.getAs[String]("band")}: ${r.getAs[Long]("qerror_milli")}")
      assert(r.getAs[Long]("est_rows") >= 0L)
    }
  }

  // ---------------------------------------------------------------- q444

  test("cdc chunking: chunks partition every document exactly") {
    val rows = run("q444_content_defined_chunking").collect()
    assert(rows.nonEmpty)
    val expected = Tables.documents(spark, sfMid)
      .groupBy(col("source")).agg(sum(length(col("text")).cast("long")).as("chars"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("chars")).toMap
    for (r <- rows) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("chars_total") == expected(src),
        s"chunk lengths must cover $src exactly")
      assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("chars_unique") <= r.getAs[Long]("chars_total"))
      assert(r.getAs[Long]("dedup_savings_ppm") < 1000000L)
      // expected chunk length is ~64 chars; allow a broad band
      val mean = r.getAs[Long]("chars_total") / r.getAs[Long]("n_chunks")
      assert(mean >= 16L && mean <= 256L, s"mean chunk len $mean")
    }
  }

  // ---------------------------------------------------------------- q445

  test("sortkey advisor: keys skip only on their own column, date wins this workload") {
    val rows = run("q445_sortkey_zonemap_advisor").collect()
    assert(rows.length == 18)
    for (r <- rows) {
      val key = r.getAs[String]("sort_key")
      val pred = r.getAs[String]("pred")
      val skipped = r.getAs[Long]("zones_skipped")
      assert(skipped >= 0L && skipped <= 64L)
      // custkey ordering correlates with neither predicate column
      if (key == "by_custkey") assert(skipped == 0L, s"$key/$pred")
      // sorting by one column cannot skip on the other at this data size
      if (key == "by_date" && pred.startsWith("price")) assert(skipped == 0L)
      if (key == "by_price" && pred.startsWith("date")) assert(skipped == 0L)
      // sorting by the predicate's own column must actually skip zones
      if (key == "by_date" && pred.startsWith("date")) assert(skipped > 32L)
      if (key == "by_price" && pred.startsWith("price")) assert(skipped > 32L)
    }
    val winners = rows.filter(_.getAs[Long]("is_best_key") == 1L)
      .map(_.getAs[String]("sort_key")).distinct
    assert(winners.toSeq == Seq("by_date"),
      "the date-heavy workload must pick the date sort key")
  }
}
