package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 engine-surface batch: debounce dedup
  * (q718), bitmap distinct (q719), VARIANT ingestion (q720), from_xml
  * round-trip (q721), HLL sketch union (q722). Each test pins the new
  * engine primitive against an INDEPENDENT in-test computation (an
  * imperative replay, a count(DISTINCT), a regexp re-extraction) so the
  * primitive cannot drift behind plausible numbers. */
class EngineSurfaceOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q718: debounce fold matches an imperative replay of the " +
    "dropDuplicatesWithinWatermark state rule") {
    val rows = run("q718_debounce_dedup_watermark").collect()
    assert(rows.length == 5)
    // bounds: the first event per key is always kept; keeps never exceed
    // raw events
    for (r <- rows) {
      val (keys, events, kept) = (r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_kept"))
      assert(kept >= keys, s"fewer keeps than keys: $kept < $keys")
      assert(kept <= events, s"more keeps than events: $kept > $events")
      assert(kept < events, "24h horizon dropped nothing — degenerate")
    }
    // independent replay (driver-side, sf0.01 is 10k events): greedy
    // keep-if-gap>horizon per (user, type), exactly the streaming
    // operator's state rule
    val horizon = 86400000000L
    val raw = Tables.events(spark, sfMid)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = raw.groupBy(r => (r._1, r._2)).view.mapValues { es =>
      val ts = es.map(_._3).sorted
      ts.tail.foldLeft((ts.head, 1L)) { case ((last, k), x) =>
        if (x > last + horizon) (x, k + 1) else (last, k)
      }._2
    }.toMap
    val byType = expected.groupBy(_._1._2).view.mapValues(_.values.sum)
    for (r <- rows)
      assert(r.getAs[Long]("n_kept") == byType(r.getAs[String]("event_type")),
        s"replay mismatch for ${r.getAs[String]("event_type")}")
  }

  test("q719: bitmap cardinalities equal exact count(DISTINCT)") {
    val rows = run("q719_bitmap_distinct_buyers").collect()
    assert(rows.length == 5)
    val exact = Tables.orders(spark, sfMid)
      .select(col("o_custkey").as("ck"))
      .join(Tables.customer(spark, sfMid)
        .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk")), Seq("ck"))
      .join(Tables.nation(spark, sfMid)
        .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk")), Seq("nk"))
      .join(Tables.region(spark, sfMid)
        .select(col("r_regionkey").as("rk"), col("r_name").as("region")), Seq("rk"))
      .groupBy(col("region")).agg(countDistinct(col("ck")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n_buyers") == exact(r.getAs[String]("region")),
        s"bitmap count drifted from exact for ${r.getAs[String]("region")}")
  }

  test("q720: variant_get extraction equals regexp re-extraction; " +
    "absent path is null on every row") {
    val rows = run("q720_variant_json_ingest").collect()
    assert(rows.length == 5)
    for (r <- rows)
      assert(r.getAs[Long]("n_absent") == r.getAs[Long]("n"),
        "try_variant_get('$.missing') must be null on every row")
    val direct = Tables.events(spark, sfMid)
      .select(col("event_type"),
        expr("CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)").as("k"))
      .groupBy(col("event_type")).agg(sum(col("k")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("k_sum") == direct(r.getAs[String]("event_type")),
        s"variant k_sum drifted for ${r.getAs[String]("event_type")}")
  }

  test("q721: the XML round-trip loses no rows and no key mass") {
    val rows = run("q721_from_xml_roundtrip").collect()
    assert(rows.length == 5)
    val o = Tables.orders(spark, sfMid)
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ks"))
      .collect().head
    assert(rows.map(_.getAs[Long]("n_orders")).sum == o.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("key_sum")).sum == o.getAs[Long]("ks"))
  }

  test("q722: HLL union estimates stay inside the asserted 5% envelope " +
    "and the exact counts agree with q719") {
    val rows = run("q722_hll_sketch_union_audit").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Boolean]("hll_within_5pct")),
      "an HLL estimate left the 5% envelope")
    val bitmap = run("q719_bitmap_distinct_buyers").collect()
      .map(r => r.getAs[String]("region") -> r.getAs[Long]("n_buyers")).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n_buyers") == bitmap(r.getAs[String]("region")),
        "sum-of-nation-exacts disagrees with the bitmap count")
  }
}
