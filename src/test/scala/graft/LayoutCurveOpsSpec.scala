package graft

import org.apache.spark.sql.functions._

/** Semantics of the storage-layout operators (q431–q433) beyond the
  * oracle gate. */
class LayoutCurveOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q431

  test("hilbert vs z: hilbert needs no more scan runs on straddling tiles") {
    val rows = run("q431_hilbert_z_locality").collect()
    val byCurve = rows.map(r => r.getAs[String]("curve") -> r).toMap
    assert(byCurve.keySet == Set("hilbert", "zorder"))
    val h = byCurve("hilbert").getAs[Long]("total_runs")
    val z = byCurve("zorder").getAs[Long]("total_runs")
    // Hilbert's adjacency property: never worse on rectangle workloads
    assert(h <= z, s"hilbert $h runs vs zorder $z")
    // both curves cover the same non-empty cells
    assert(byCurve("hilbert").getAs[Long]("n_nonempty_cells") ==
      byCurve("zorder").getAs[Long]("n_nonempty_cells"))
    assert(rows.filter(_.getAs[Long]("is_winner") == 1L).nonEmpty)
    // runs can't be fewer than tiles (each tile needs >= 1 scan range):
    // offset 4x4 tiling of a 16x16 grid yields at most 25 windows
    assert(h >= 16L && z >= 16L)
  }

  // ---------------------------------------------------------------- q432

  test("sstable prefix plan: savings grow with block size, bounded by raw") {
    val rows = run("q432_sstable_prefix_plan").collect()
      .sortBy(_.getAs[Long]("block_size"))
    assert(rows.map(_.getAs[Long]("block_size")).toSeq == Seq(16L, 64L, 256L))
    val saved = rows.map(_.getAs[Long]("saved_bytes"))
    // fewer restarts -> strictly more suffix sharing (weakly, if lcp=0 at
    // every restart boundary)
    assert(saved.zip(saved.tail).forall { case (a, b) => a <= b })
    for (r <- rows) {
      assert(r.getAs[Long]("saved_bytes") <= r.getAs[Long]("raw_bytes"))
      assert(r.getAs[Long]("n_keys") ==
        Tables.part(spark, sfMid).count())
      val bs = r.getAs[Long]("block_size")
      val nk = r.getAs[Long]("n_keys")
      assert(r.getAs[Long]("n_blocks") == (nk + bs - 1) / bs)
    }
  }

  test("sstable prefix plan: lcp fold matches a scala reference on a sample") {
    val sample = Tables.part(spark, sfMid).select(col("p_name"))
      .orderBy(col("p_name")).limit(50).collect().map(_.getString(0))
    def lcpRef(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    // recompute the per-pair lcp with the query's fold expression
    import spark.implicits._
    val df = sample.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("prev", "k")
    val folded = df.select(expr(
      """CAST(aggregate(sequence(1, least(length(k), length(prev))), 0,
         (acc, i) -> IF(acc = i - 1 AND substring(k, i, 1) = substring(prev, i, 1),
                        i, acc)) AS BIGINT)""").as("lcp"))
      .collect().map(_.getAs[Long]("lcp"))
    val ref = sample.sliding(2).map(p => lcpRef(p(0), p(1)).toLong).toSeq
    assert(folded.toSeq == ref)
  }

  // ---------------------------------------------------------------- q433

  test("merkle diff: corruption localizes along the tree path") {
    val rows = run("q433_merkle_snapshot_diff").collect()
      .sortBy(_.getAs[Long]("level"))
    assert(rows.map(_.getAs[Long]("level")).toSeq == Seq(0L, 1L, 2L, 3L))
    for (r <- rows) {
      assert(r.getAs[Long]("n_diff") >= 1L, "injected delta must be visible")
      assert(r.getAs[Long]("n_diff") <= r.getAs[Long]("n_nodes"))
    }
    // the delta spans keys [1000,1200) + [2000,2100): leaves 0,1,2 differ
    val leaves = rows.last
    assert(leaves.getAs[Long]("n_diff") == 3L)
    // each differing node's parent must differ too (digest is a sum of
    // children, and the injected deltas cannot cancel a 32-bit sum here)
    val diffs = rows.map(_.getAs[Long]("n_diff"))
    assert(diffs.zip(diffs.tail).forall { case (parent, child) => parent <= child },
      "diff count is monotone down the tree")
  }
}
