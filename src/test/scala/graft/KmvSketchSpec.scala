package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch.{kmv_bottom_k, kmv_estimate}
import graft.operators.Sampling

/** The KMV bottom-k distinct sketch: exact bottom-k semantics vs a
  * driver-side brute force, partition-count invariance (merge is
  * union-trim, so the result cannot depend on how rows were split), and
  * the exact-below-capacity estimator branch.
  */
class KmvSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def hashed =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        Sampling.keyHash(graft.functions.expressions.poly_hash(col("text"))).as("h"))

  test("sketch is the exact sorted bottom-k of the distinct hashes") {
    val k = 16
    val got = hashed.groupBy(col("source"))
      .agg(kmv_bottom_k(col("h"), k).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    val brute = hashed.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(k).toList).toMap
    assert(got == brute)
  }

  test("sketch is invariant to partitioning") {
    val k = 32
    def sketchWith(parts: Int) =
      hashed.repartition(parts)
        .agg(kmv_bottom_k(col("h"), k).as("sketch"))
        .collect().head.getSeq[Long](0).toList
    val one = sketchWith(1)
    assert(sketchWith(7) == one)
    assert(sketchWith(32) == one)
  }

  test("streaming groupBy sketch == batch sketch (complete mode)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val k = 8
    val data = (1L to 500L).map(i => (s"g${i % 3}", i * 2654435761L % 4294967296L))
    val input = MemoryStream[(String, Long)](spark)
    val q = input.toDF().toDF("g", "h")
      .groupBy(col("g")).agg(kmv_bottom_k(col("h"), k).as("sketch"))
      .writeStream.format("memory").queryName("kmv_out").outputMode("complete").start()
    try {
      input.addData(data.take(200): _*)
      q.processAllAvailable()
      input.addData(data.drop(200): _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_out")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val batch = data.toDF("g", "h")
        .groupBy(col("g")).agg(kmv_bottom_k(col("h"), k).as("sketch"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("estimator: exact below capacity, bounded error above it") {
    val k = 64
    val rows = hashed
      .rollup(col("source"))
      .agg(kmv_bottom_k(col("h"), k).as("sketch"),
        countDistinct(col("h")).as("n_exact"))
      .select(coalesce(col("source"), lit("ALL")).as("scope"), col("n_exact"),
        kmv_estimate("sketch", k).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((scope, exact, est) <- rows) {
      if (exact < k) assert(est == exact, s"$scope should be exact below capacity")
      else {
        // KMV standard error is ~1/sqrt(k-2) ≈ 13% at k=64; allow 3σ
        val err = math.abs(est - exact).toDouble / exact
        assert(err < 0.4, s"$scope: est=$est exact=$exact err=$err")
      }
    }
  }
}
