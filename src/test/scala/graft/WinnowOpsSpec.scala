package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics of the fingerprint/eval/graph operators (q425–q427) beyond
  * the oracle gate. */
class WinnowOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q425

  test("winnowing: density near 2/(w+1), shared bounded by selected") {
    val rows = run("q425_minimizer_fingerprints").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_shingles")
      val f = r.getAs[Long]("n_fps")
      assert(f >= 1L && f <= n)
      val d = r.getAs[Long]("density_ppm")
      // window of 9: expected density 2/(9+1); real text shifts it some
      assert(d >= 140000L && d <= 350000L, s"density $d ppm")
      assert(r.getAs[Long]("n_shared_fps") <= f)
    }
  }

  test("winnowing: every 9-shingle window contains a selected position") {
    // the coverage guarantee, recomputed from raw keys on the longest doc
    import graft.functions.expressions.{poly_hash, tokens_native}
    val doc = Tables.documents(spark, sfMid)
      .orderBy(col("n_chars").desc, col("doc_id")).limit(1)
    val keys = doc
      .select(col("doc_id"), tokens_native(col("text")).as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(posexplode(expr(
        "transform(sequence(0, size(toks) - 4), j -> array_join(slice(toks, j + 1, 4), ' '))"))
        .as(Seq("i", "shingle")))
      .select(col("i"), poly_hash(col("shingle")).as("p"))
      .withColumn("key",
        expr("(((p % 2147483648) * 2654435761L) % 4294967296) * 1048576 + i"))
      .orderBy(col("i"))
      .collect().map(_.getAs[Long]("key"))
    assert(keys.length >= 20, "longest doc long enough to exercise windows")
    // selected = argmin position of each 9-window (what the query keeps)
    val selected = (0 to keys.length - 9).map { s =>
      (s until s + 9).minBy(keys)
    }.toSet
    for (start <- 0 to keys.length - 9)
      assert((start until start + 9).exists(selected.contains),
        s"window at $start has no fingerprint")
    // density on this doc within the winnowing band
    val dens = selected.size.toDouble / keys.length
    assert(dens > 0.12 && dens < 0.4, s"doc density $dens")
  }

  // ---------------------------------------------------------------- q426

  test("mcnemar: cells partition the docs, statistic recomputes") {
    val rows = run("q426_mcnemar_filter_test").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val (a, b, c, d) = (r.getAs[Long]("both_pass"), r.getAs[Long]("only_len"),
        r.getAs[Long]("only_tok"), r.getAs[Long]("neither"))
      assert(a + b + c + d == n, "2x2 cells partition")
      val expected =
        if (b + c == 0) 0L
        else (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000 / (b + c)
      assert(r.getAs[Long]("mcnemar_milli") == expected)
    }
  }

  // ---------------------------------------------------------------- q427

  test("landmark bfs: 4 seeds at distance 0, layers within 3 hops, total = suppliers") {
    val rows = run("q427_landmark_bfs_layers").collect()
    val byDist = rows.map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    assert(byDist.getOrElse(0L, 0L) == 4L, s"landmark layer: $byDist")
    assert(byDist.keySet.forall(d => d == -1L || (d >= 0L && d <= 3L)))
    val nSupp = Tables.supplier(spark, sfMid).count()
    assert(byDist.values.sum == nSupp, "histogram partitions the node set")
    // a dense co-order graph reaches most nodes within 3 hops
    assert(byDist.filterKeys(_ >= 0L).values.sum * 2 > nSupp)
  }
}
