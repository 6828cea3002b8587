package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.zorder_key
import graft.sources.FileSources

/** Data-layout levers for 100 TB scans: hive-partitioned writes with
  * directory pruning, sorted writes with row-group stat pruning, Z-order
  * keys, and explicit join-strategy hints. */
class LayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("partitioned write: one file per value; reads prune directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val orders = Tables.orders(spark, sfDir)
    FileSources.writePartitioned(orders, out, "o_orderpriority")
    val priorities = orders.select("o_orderpriority").distinct().count()
    val dataFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(dataFiles === priorities, "exactly one file per partition value")

    val pruned = spark.read.parquet(out).filter(col("o_orderpriority") === "1-URGENT")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter should prune directories:\n$scan")
    // directory pruning: the scan's selected partition count is 1 of N
    val scanNode = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scanNode.metrics("numFiles").value <= 1 ||
      pruned.count() === orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("sorted write: selective filters are pushed to the parquet scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    FileSources.writeSorted(Tables.orders(spark, sfDir), out, Seq(col("o_custkey")))
    val read = spark.read.parquet(out).filter(col("o_custkey") === 42L)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)"),
      s"filter should reach the scan:\n$scan")
  }

  test("zorder key interleaves bits and preserves 2-D locality") {
    import spark.implicits._
    // golden values: interleave(x) | interleave(y)<<1
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("a", "b")
      .select(zorder_key(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got === Seq(0L, 1L, 2L, 3L, 12L, 39L))
    // locality: the z-range covering a small 2-D box is far smaller than
    // the one covering a thin-but-long stripe with the same area
    def zrange(xs: Range, ys: Range): Long = {
      val zs = for (x <- xs; y <- ys) yield graft.functions.GraftHash.zorder2(x, y)
      zs.max - zs.min
    }
    assert(zrange(0 until 8, 0 until 8) < zrange(0 until 1, 0 until 64))
  }

  test("persist serves later actions from the in-memory relation") {
    val df = Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag")).count().persist()
    try {
      df.count() // materialize the cache
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"cached plan should read the in-memory relation:\n$plan")
    } finally df.unpersist()
  }

  test("localCheckpoint truncates lineage for iterative refinement") {
    // iterative algorithms (Lloyd loops, label propagation) re-derive a
    // frame each round; checkpointing caps the plan's growth
    val df = Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag")).count()
    val cp = df.localCheckpoint(eager = true)
    assert(cp.count() === df.count())
    val plan = cp.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), s"checkpointed lineage should be a bare scan:\n$plan")
  }

  test("join-strategy hints select the physical join") {
    val big = spark.range(100000).select(col("id").as("k"), col("id").as("v"))
    val small = spark.range(100).select(col("id").as("k"), col("id").as("w"))
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    assert(planOf(big.join(small.hint("broadcast"), "k")).contains("BroadcastHashJoin"))
    assert(planOf(big.join(small.hint("merge"), "k")).contains("SortMergeJoin"))
    assert(planOf(big.join(small.hint("shuffle_hash"), "k")).contains("ShuffledHashJoin"))
  }
}
