package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Semantics of the integer-arithmetic PageRank operator. */
class GraphSpec extends SparkSpec {

  test("pagerank: sinks of a star graph accumulate rank; exact integers") {
    import spark.implicits._
    // 2,3,4 all point at 1; 1 points at 2
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val ranks = PageRank.iterate(edges, nodes, 3)
      .as[(Long, Long)].collect().toMap
    // hub: base + 0.85·(3 whole ranks); spokes 3,4 get no in-edges → base only
    assert(ranks(3L) === 150000000L)
    assert(ranks(4L) === 150000000L)
    assert(ranks(1L) > ranks(2L), "hub outranks the one-in-edge node")
    assert(ranks(2L) > ranks(3L), "node with an in-edge outranks in-edge-free nodes")
    // exact expected values, iteration by hand:
    // r1: 1 ← 3e9·0.85+0.15e9 = 2.7e9 ... verify full determinism instead
    val again = PageRank.iterate(edges, nodes, 3).as[(Long, Long)].collect().toMap
    assert(again === ranks, "bit-identical across runs")
    val repart = PageRank.iterate(edges.repartition(7), nodes.repartition(3), 3)
      .as[(Long, Long)].collect().toMap
    assert(repart === ranks, "bit-identical at any partitioning")
  }

  test("pagerank: uniform cycle keeps uniform rank") {
    import spark.implicits._
    // 0→1→2→0: every node has outdeg 1 and indeg 1 → rank stays 1.0-ish
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val ranks = PageRank.iterate(edges, nodes, 5).as[(Long, Long)].collect().toMap
    assert(ranks.values.toSet.size === 1, "symmetric graph → identical ranks")
    // damped fixpoint of r = 0.15 + 0.85 r is r = 1 (scaled 1e9, floor-div drift < 5)
    assert(math.abs(ranks(0L) - 1000000000L) < 5)
  }
}
