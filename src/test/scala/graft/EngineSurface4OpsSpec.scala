package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 engine-surface batch 4: crosstab (q732),
  * map HOF drift (q733), array set algebra (q734), XOR checksums
  * (q735). */
class EngineSurface4OpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q732: crosstab cells sum to the table row count and match " +
    "a grouped recount") {
    val rows = run("q732_crosstab_contingency").collect()
    assert(rows.length == 3)
    val total = rows.map(r => r.getAs[Long]("F") + r.getAs[Long]("O")).sum
    assert(total == Tables.lineitem(spark, sfMid).count())
    val direct = Tables.lineitem(spark, sfMid)
      .groupBy(col("l_returnflag"), col("l_linestatus")).count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- rows) {
      val f = r.getAs[String]("l_returnflag_l_linestatus")
      assert(r.getAs[Long]("F") == direct.getOrElse((f, "F"), 0L))
      assert(r.getAs[Long]("O") == direct.getOrElse((f, "O"), 0L))
    }
  }

  test("q733: per-source ppm shares are conserved and the global row " +
    "has zero self-drift") {
    val rows = run("q733_map_lang_drift").collect()
    assert(rows.length == 20)
    // drift is a metric: non-negative, and bounded by 2,000,000 ppm
    // (total variation x2)
    for (r <- rows) {
      val d = r.getAs[Long]("l1_drift_ppm")
      assert(d >= 0 && d <= 2000000, s"drift $d out of range")
      assert(r.getAs[Long]("n_dominant") >= 1,
        "no dominant language — shares can't all be < 5%")
    }
    // self-check of the HOF pipeline: zipping the global share map with
    // itself must give exactly zero drift
    val docs = Tables.documents(spark, sfMid)
      .groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("lang"), col("c"))))).as("gm"), sum(col("c")).as("t"))
      .select(expr("transform_values(gm, (k, v) -> v * 1000000 div t)").as("g"))
      .select(expr("""aggregate(
          map_values(map_zip_with(g, g, (k, a, b) -> abs(a - b))),
          0L, (acc, x) -> acc + x)""").as("z"))
      .collect().head
    assert(docs.getAs[Long]("z") == 0L, "map_zip_with self-drift nonzero")
  }

  test("q734: inclusion-exclusion closes exactly on every pair") {
    val rows = run("q734_vocab_set_algebra").collect()
    assert(rows.length == 19) // 20 sources, 19 adjacent pairs
    for (r <- rows) {
      val (a, b, both, union, onlyA) = (r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
        r.getAs[Long]("n_union"), r.getAs[Long]("n_only_a"))
      assert(union == a + b - both, "inclusion-exclusion broken")
      assert(onlyA == a - both, "except/intersect disagree")
      assert(both <= math.min(a, b) && union >= math.max(a, b))
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j == both * 1000000 / union)
    }
  }

  test("q735: the XOR checksum detects a dropped document and ignores " +
    "row order") {
    val rows = run("q735_xor_integrity_checksum").collect()
    assert(rows.length == 20)
    val base = Tables.documents(spark, sfMid)
      .select(col("source"),
        graft.functions.expressions.poly_hash(col("text")).as("h"))
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source")).agg(expr("bit_xor(h)").as("x"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shuffled = checksum(base.orderBy(rand(7))) // any order, same fold
    for (r <- rows)
      assert(r.getAs[Long]("xor_checksum") == shuffled(r.getAs[String]("source")),
        "checksum is order-dependent — not a valid integrity fold")
    // dropping one row flips its source's checksum
    val one = Tables.documents(spark, sfMid)
      .orderBy(col("doc_id")).limit(1)
      .select(col("source"), col("doc_id")).collect().head
    val dropped = checksum(Tables.documents(spark, sfMid)
      .filter(col("doc_id") =!= one.getLong(1))
      .select(col("source"),
        graft.functions.expressions.poly_hash(col("text")).as("h")))
    val full = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("xor_checksum")).toMap
    assert(dropped(one.getString(0)) != full(one.getString(0)),
      "a dropped document left the checksum unchanged")
  }
}
