package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 engine-surface batch 2: parse_url (q723),
  * regexp accessors (q724), LATERAL decorrelation (q725), ordered-set
  * aggregates (q726), collation-aware distinct (q727). */
class EngineSurface2OpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q723: parse_url host/path/query recover the source coordinates") {
    val rows = run("q723_parse_url_host_census").collect()
    assert(rows.length == 20)
    val direct = Tables.documents(spark, sfMid)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s"),
        countDistinct(col("lang")).as("l"))
      .collect()
      .map(r => s"${r.getString(0)}.example.com" ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (r <- rows) {
      val e = direct(r.getAs[String]("host"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("id_sum"),
        r.getAs[Long]("n_langs")) == e,
        s"URL round-trip drifted for ${r.getAs[String]("host")}")
    }
  }

  test("q724: regexp_count sums match a split-based recount") {
    val rows = run("q724_regexp_accessor_census").collect()
    assert(rows.length == 20)
    // independent recount: occurrences of the 'ta[a-z]+e' pattern via
    // explode + rlike on whole tokens is a LOWER bound (the regex can
    // also match inside longer tokens); exact equality holds here
    // because the corpus is space-separated word salad
    val direct = Tables.documents(spark, sfMid)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^ta[a-z]+e"))
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("hits") == direct(r.getAs[String]("source")),
        s"regexp_count drifted for ${r.getAs[String]("source")}")
    // first positions are 1-based offsets inside the doc, so every
    // matched doc contributes >= 1
    for (r <- rows) assert(r.getAs[Long]("first_pos_sum") >= 0)
  }

  test("q725: LATERAL decorrelates to one aggregate + join — no per-row " +
    "re-scan survives in the plan") {
    val df = run("q725_lateral_source_probe")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LateralJoin"),
      "LATERAL was not decorrelated — a per-source re-scan at scale:\n" +
        plan.take(1500))
    // and the answer matches a plain grouped aggregate
    val direct = Tables.documents(spark, sfMid)
      .groupBy(col("source"))
      .agg(max(col("n_chars")).as("m"),
        sum(when(col("n_chars") > 200, 1L).otherwise(0L)).as("nl"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- df.collect())
      assert((r.getAs[Long]("max_chars"), r.getAs[Long]("n_long"))
        == direct(r.getAs[String]("source")))
  }

  test("q726: percentile_disc returns actual data values in order; " +
    "listagg folds the ordered status domain") {
    val rows = run("q726_ordered_set_aggregates").collect()
    assert(rows.length == 3)
    val quantities = Tables.lineitem(spark, sfMid)
      .select(col("l_quantity")).distinct()
      .collect().map(_.getDouble(0)).toSet
    for (r <- rows) {
      val (a, b, c) = (r.getAs[Double]("q25"), r.getAs[Double]("q50"),
        r.getAs[Double]("q90"))
      assert(a <= b && b <= c, "quartiles out of order")
      // disc percentiles are DATA values, never interpolations
      assert(Seq(a, b, c).forall(quantities.contains),
        "percentile_disc interpolated")
      assert(r.getAs[String]("statuses") == "F,O")
    }
  }

  test("q727: case-insensitive distinct equals lower()-normalized " +
    "distinct and never exceeds the exact count") {
    val rows = run("q727_collation_ci_distinct").collect()
    assert(rows.length == 20)
    val direct = Tables.documents(spark, sfMid)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source")).agg(countDistinct(lower(col("w"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getAs[Long]("n_ci") <= r.getAs[Long]("n_exact"))
      // casing noise is real in this corpus: exact distinct must exceed ci
      assert(r.getAs[Long]("n_exact") > r.getAs[Long]("n_ci"),
        "no casing variants — the collation path proved nothing")
      assert(r.getAs[Long]("n_ci") == direct(r.getAs[String]("source")),
        s"collated distinct drifted for ${r.getAs[String]("source")}")
    }
  }
}
