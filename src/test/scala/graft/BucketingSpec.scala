package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Co-bucketed joins must plan without a shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no Exchange hashpartitioning") {
    val sfDir = "/root/testdata/sf0.001"
    // force SMJ so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")),
        "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "b_orders", "l_orderkey", 4)
      val joined = Bucketing.cobucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
      // and it's still correct
      val expected = Tables.lineitem(spark, sfDir).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("custom top-k aggregate == window-rank result") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val viaAgg = SparkEntry.queries("q35_topk_per_group_aggregate")(spark, sfDir)
      .select("c_nationkey", "rank", "c_custkey").as[(Int, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWindow = Tables.customer(spark, sfDir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("c_nationkey", "rank", "c_custkey")
      .orderBy("c_nationkey", "rank").as[(Int, Long, Long)].collect().toSeq
    assert(viaAgg === viaWindow)
  }
}
