package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration, in exact integer arithmetic.
  *
  * Ranks are longs scaled by 10^9 (rank 1.0 = 1_000_000_000). Each
  * iteration:
  *   contribution(e: src→dst) = rank_q(src) DIV outdeg(src)
  *   rank_q'(v) = 150_000_000 + (85 · Σ contributions to v) DIV 100
  * i.e. the standard 0.15/0.85 damping with every operation an integer
  * multiply/divide — no double accumulation anywhere, so results are
  * bit-identical at any partitioning, any engine. (The floor divisions
  * bleed < outdeg·1e-9 of mass per node per step — irrelevant for
  * ranking, decisive for reproducibility. Dangling-node mass is dropped,
  * the common simplification.)
  *
  * Scale shape per iteration: one shuffle join of the edge list with the
  * current ranks on src, one hash aggregation on dst — the Pregel
  * dataflow expressed declaratively; nothing driver-side, nothing
  * quadratic. Lineage grows linearly with iterations; for long runs
  * callers should checkpoint every few steps (the 3-5 iterations that
  * rank a co-occurrence graph don't need it).
  */
object PageRank {

  /** (node, rank_q) after `iterations` damped power steps over the
    * directed `edges` (src, dst) — self-loops allowed, duplicates should
    * be deduplicated by the caller if unwanted. `nodes` is the full
    * vertex set (single column `node`); vertices with no in-edges keep
    * the base rank. */
  def iterate(edges: DataFrame, nodes: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // materialize the degree-annotated edge list ONCE: it appears in
    // every iteration of the unrolled plan, and without the checkpoint
    // Spark would re-derive it (the caller's edge build can be an
    // expensive join) inside each iteration's lineage
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(outdeg, Seq("src")).localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(1000000000L).as("rank_q"))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank_q DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      // floor(85·m/100) = 85·(m div 100) + (85·(m mod 100)) div 100 for
      // m ≥ 0: exact, and never forms 85·m — which would silently wrap
      // Long for hub vertices once total mass (≈ N·1e9) nears 2^63/85
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000000L) + expr(
            "85 * (coalesce(in_mass, 0L) DIV 100) + (85 * (coalesce(in_mass, 0L) % 100)) DIV 100"
          )).as("rank_q"))
    }
    ranks
  }
}
