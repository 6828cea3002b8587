package graft

import org.apache.spark.sql.functions._

import graft.queries.EncodingPlanQueries

/** q657's hot-list sharding (round-9): gap windows run per
  * (token, doc_id div S) with one stitched boundary gap per shard, so
  * no window partition scales with the corpus — a stop word's posting
  * list lands in ceil(N/S) bounded sorts instead of one corpus-sized
  * one. The stitch must change NO census number: this spec asserts the
  * census is shard-width-invariant and equals the unsharded reference
  * form, at a width small enough that multiple shards (and therefore
  * the stitch path) provably execute.
  */
class ShardedPostingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def census(width: Long): Seq[String] =
    EncodingPlanQueries.varintPostingCensus(spark, sfDir, width)
      .collect().map(_.toString).toSeq

  test("census is shard-width invariant and equals the unsharded reference") {
    val docs = Tables.documents(spark, sfDir).agg(max(col("doc_id"))).head().getLong(0)
    assert(docs > 64, "fixture must span multiple width-64 shards")
    val reference = census(0L) // unsharded form (test-only)
    // width 64: many shards, dense stitch traffic; width 4096: the
    // registered q657 width; width 2^20: the production note's width
    // (single shard at this SF — exercises the no-stitch edge)
    for (w <- Seq(64L, 4096L, 1L << 20))
      assert(census(w) === reference, s"shard width $w diverged")
  }

  test("sharded plan windows never partition by the bare token") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val df = EncodingPlanQueries.varintPostingCensus(spark, sfDir, 4096L)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty)
    // the in-shard window must carry the shard key; the stitch window
    // runs over the per-(token, shard) SUMMARY (corpus/S rows per
    // partition), which the plan shows as a window above an Aggregate
    val overRawPostings = windows.filter { w =>
      val child = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
      w.partitionSpec.size == 1 && child.isEmpty
    }
    assert(overRawPostings.isEmpty,
      "a single-key window over raw postings is the unsharded shape")
  }
}
