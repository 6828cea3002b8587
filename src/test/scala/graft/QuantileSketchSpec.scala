package graft

import org.apache.spark.sql.functions._

import graft.functions.Deterministic.cents
import graft.functions.QuantileSketch.sketch_quantiles

/** The mergeable quantile sketch: exactness below capacity, rank-error
  * bounds above it, and partition-count invariance of the bounds (the
  * property that makes it shuffle-safe at scale).
  */
class QuantileSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private val probs = Seq(0.1, 0.5, 0.9, 0.99)

  private def exactCents: Array[Long] =
    Tables.orders(spark, sfDir)
      .select(cents(col("o_totalprice")).as("vc"))
      .collect().map(_.getLong(0)).sorted

  private def rankOf(sorted: Array[Long], v: Long): Long = {
    // number of elements <= v (upper bound rank of the estimate)
    val i = java.util.Arrays.binarySearch(sorted, v)
    if (i >= 0) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == v) j += 1
      j + 1L
    } else -(i + 1).toLong
  }

  test("below capacity the sketch is exact (no compaction ever fires)") {
    val vals = (1L to 200L).toSeq
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v")
    val got = df.agg(sketch_quantiles(col("v"), Seq(0.25, 0.5, 1.0), k = 256))
      .collect().head.getSeq[Long](0)
    // target rank ceil(p*200): 50, 100, 200
    assert(got == Seq(50L, 100L, 200L))
  }

  test("rank error stays under 3% at k=256 on 15k order prices") {
    val sorted = exactCents
    val n = sorted.length.toLong
    val got = Tables.orders(spark, sfDir)
      .agg(sketch_quantiles(cents(col("o_totalprice")), probs, k = 256))
      .collect().head.getSeq[Long](0)
    for ((p, est) <- probs.zip(got)) {
      val target = math.max(1L, math.ceil(p * n).toLong)
      val r = rankOf(sorted, est)
      assert(math.abs(r - target) <= n * 3 / 100,
        s"p=$p target rank $target got rank $r (n=$n)")
    }
  }

  test("rank error bound holds regardless of partitioning (merge safety)") {
    val sorted = exactCents
    val n = sorted.length.toLong
    for (parts <- Seq(1, 16)) {
      val got = Tables.orders(spark, sfDir)
        .repartition(parts)
        .agg(sketch_quantiles(cents(col("o_totalprice")), probs, k = 256))
        .collect().head.getSeq[Long](0)
      for ((p, est) <- probs.zip(got)) {
        val target = math.max(1L, math.ceil(p * n).toLong)
        val r = rankOf(sorted, est)
        assert(math.abs(r - target) <= n * 3 / 100,
          s"parts=$parts p=$p target $target got rank $r")
      }
    }
  }

  test("per-group sketches: quantiles are monotone in p and within range") {
    val rows = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(sketch_quantiles(cents(col("o_totalprice")), Seq(0.1, 0.5, 0.9), k = 128)
        .as("qs"))
      .collect()
    assert(rows.length == 5)
    val (mn, mx) = (exactCents.head, exactCents.last)
    for (r <- rows) {
      val qs = r.getSeq[Long](1)
      assert(qs.length == 3)
      assert(qs == qs.sorted, s"${r.getString(0)}: quantiles must be monotone")
      assert(qs.forall(v => v >= mn && v <= mx))
    }
  }
}
