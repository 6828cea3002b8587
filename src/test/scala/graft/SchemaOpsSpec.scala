package graft

import org.apache.spark.sql.functions._

/** Semantics of the schema/workload operators (q440–q442) beyond the
  * oracle gate. */
class SchemaOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q440

  test("inclusion deps: declared FKs are perfect INDs, reverse direction measured") {
    val rows = run("q440_inclusion_dependency_mining").collect()
    assert(rows.length == 8)
    val m = rows.map(r => r.getAs[String]("pair") -> r).toMap
    // the four real FK edges must be full inclusions
    for (fk <- Seq(
      "lineitem.l_orderkey->orders.o_orderkey",
      "orders.o_custkey->customer.c_custkey",
      "lineitem.l_partkey->part.p_partkey",
      "lineitem.l_suppkey->supplier.s_suppkey")) {
      assert(m(fk).getAs[Long]("is_ind") == 1L, s"$fk must be an IND")
      assert(m(fk).getAs[Long]("containment_ppm") == 1000000L)
    }
    for (r <- rows) {
      assert(r.getAs[Long]("n_contained") <= r.getAs[Long]("n_child_distinct"))
      assert(r.getAs[Long]("containment_ppm") <= 1000000L)
    }
    // the surrogate-range false positive: high containment, no FK meaning
    assert(m("supplier.s_suppkey->customer.c_custkey")
      .getAs[Long]("containment_ppm") >= 900000L,
      "overlapping key ranges look like INDs — the documented trap")
  }

  // ---------------------------------------------------------------- q441

  test("session stitch: batch-minus-bridges equals the global count") {
    val r = run("q441_session_stitch_certificate").collect().head
    assert(r.getAs[Long]("is_consistent") == 1L)
    assert(r.getAs[Long]("sessions_global") ==
      r.getAs[Long]("sessions_batch") - r.getAs[Long]("n_bridges"))
    assert(r.getAs[Long]("sessions_batch") >= r.getAs[Long]("sessions_global"))
    assert(r.getAs[Long]("sessions_global") > 0L)
    // bridges only exist when a session actually crosses midnight
    assert(r.getAs[Long]("n_bridges") >= 0L)
  }

  test("session stitch: identity survives a synthetic midnight-spanning user") {
    // hand-built case: one user, events at 23:50, 23:59, 00:05, 00:20 and
    // a separate burst next evening — global sessions 2, daily 3, bridge 1
    import spark.implicits._
    val day = 86400L
    val e = Seq(day - 600L, day - 60L, day + 300L, day + 1200L,
      day + 80000L, day + 80060L)
      .toDF("s").select(lit(1L).as("user_id"), col("s"))
      .withColumn("day", expr("s div 86400"))
    val wU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"))
    val wUD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("day")).orderBy(col("s"))
    def breaks(w: org.apache.spark.sql.expressions.WindowSpec) =
      when(lag(col("s"), 1).over(w).isNull ||
        col("s") - lag(col("s"), 1).over(w) > 1800L, 1L).otherwise(0L)
    val g = e.withColumn("b", breaks(wU)).agg(sum(col("b"))).collect().head.getLong(0)
    val b = e.withColumn("b", breaks(wUD)).agg(sum(col("b"))).collect().head.getLong(0)
    val bounds = e.groupBy(col("user_id"), col("day"))
      .agg(min(col("s")).as("f"), max(col("s")).as("l"))
    val br = bounds.alias("a").join(bounds.alias("b"),
      col("a.user_id") === col("b.user_id") && col("b.day") === col("a.day") + 1L)
      .filter(col("b.f") - col("a.l") <= 1800L).count()
    assert(g == 2L && b == 3L && br == 1L && g == b - br)
  }

  // ---------------------------------------------------------------- q442

  test("index advisor: weights consistent, equality predicates rank high") {
    val rows = run("q442_index_advisor").collect()
    assert(rows.length == 6, "six distinct workload columns")
    assert(rows.map(_.getAs[Long]("total_freq")).sum == 135L,
      "all workload weight accounted for")
    val picked = rows.filter(_.getAs[Long]("is_picked") == 1L)
    assert(picked.length == 2)
    val ranked = rows.sortBy(_.getAs[Long]("rk"))
    val sw = ranked.map(_.getAs[Long]("saved_weight"))
    assert(sw.zip(sw.tail).forall { case (a, b) => a >= b }, "rank order")
    for (r <- rows)
      // saved weight can never exceed freq × 1e6 (selectivity >= 0)
      assert(r.getAs[Long]("saved_weight") <= r.getAs[Long]("total_freq") * 1000000L)
  }
}
