package graft

import org.apache.spark.sql.functions._

/** Round-11 engine behaviors a 100 TB pipeline depends on that no query
  * output can witness: free pipeline counters via `Dataset.observe`
  * (metrics ride the action — no second scan), cost-based-optimizer
  * statistics flipping a join strategy (`ANALYZE TABLE` + CBO), and
  * dynamic partition overwrite (replacing exactly the partitions a
  * backfill touches, leaving the rest intact). */
class EngineBehaviorSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("observe(): pipeline counters ride the action and match direct " +
    "aggregates — no second scan") {
    val obs = new org.apache.spark.sql.Observation("graft_audit")
    val df = Tables.orders(spark, sfDir)
      .observe(obs, count(lit(1)).as("n"),
        sum(col("o_totalprice")).as("mass"),
        max(col("o_orderdate")).as("latest"))
      .filter(col("o_totalprice") > 0)
    val kept = df.count() // ONE action drives both the query and the metrics
    val m = obs.get
    val direct = Tables.orders(spark, sfDir)
      .agg(count(lit(1)), sum(col("o_totalprice"))).collect().head
    assert(m("n") == direct.getLong(0),
      "observed row count diverged from a direct count")
    // Observation merges per-task sums in completion order; double
    // addition is non-associative, so compare with a relative epsilon
    val mass = m("mass").asInstanceOf[Double]
    assert(math.abs(mass - direct.getDouble(1)) <=
      1e-9 * math.max(1.0, math.abs(direct.getDouble(1))))
    // observe sees PRE-filter rows (it sits below the filter): with a
    // positive-price table the two coincide; the point is the metric
    // arrived without a second job
    assert(kept <= m("n").asInstanceOf[Long])
  }

  test("CBO: ANALYZE TABLE statistics flip the join to broadcast where " +
    "size-unknown planning could not") {
    val suffix = System.nanoTime()
    val big = s"graft_cbo_big_$suffix"
    val small = s"graft_cbo_small_$suffix"
    Tables.orders(spark, sfDir).write.saveAsTable(big)
    Tables.orders(spark, sfDir).select(col("o_custkey")).distinct()
      .limit(50).write.saveAsTable(small)
    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536") // 64 KB
      spark.sql(s"ANALYZE TABLE $big COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE $small COMPUTE STATISTICS")
      val joined = spark.sql(
        s"SELECT count(*) FROM $big b JOIN $small s ON b.o_custkey = s.o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"with stats, the 50-row side must broadcast under a 64 KB " +
          s"threshold:\n${plan.take(1200)}")
      // statistics are actually attached (not a lucky file-size estimate)
      val stats = spark.sql(s"DESCRIBE EXTENDED $small")
        .filter(col("col_name") === "Statistics").collect()
      assert(stats.nonEmpty && stats.head.getString(1).contains("rows"),
        "ANALYZE TABLE recorded no row-count statistic")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql(s"DROP TABLE IF EXISTS $big")
      spark.sql(s"DROP TABLE IF EXISTS $small")
    }
  }

  test("dynamic partition overwrite replaces ONLY the touched partitions " +
    "(backfill semantics); static mode would truncate the table") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpo").toString +
      "/data"
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    orders.write.partitionBy("o_orderpriority").parquet(out)
    val before = spark.read.parquet(out).count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // backfill exactly one partition with a sentinel rewrite
      orders.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", lit(-1.0))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      val after = spark.read.parquet(out)
      assert(after.count() == before,
        "dynamic overwrite changed row mass outside the touched partition")
      assert(after.filter(col("o_orderpriority") === "1-URGENT")
        .filter(col("o_totalprice") =!= -1.0).count() == 0,
        "the touched partition was not fully replaced")
      assert(after.filter(col("o_orderpriority") =!= "1-URGENT")
        .filter(col("o_totalprice") === -1.0).count() == 0,
        "the sentinel leaked outside the touched partition")
      val untouched = after.filter(col("o_orderpriority") === "2-HIGH").count()
      assert(untouched ==
        orders.filter(col("o_orderpriority") === "2-HIGH").count(),
        "an untouched partition lost rows — that's static-overwrite " +
          "truncation, not backfill semantics")
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
