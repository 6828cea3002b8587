package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.similarity.{Ivf, Knn}

/** IVF index semantics and salted-join equivalence. */
class ScaleOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF probe results are a subset-ranking of the exact scan; self-cell always probed") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val (assignments, centroids) = Ivf.build(emb, "vec_id", "embedding", k = 8)
    assert(assignments.count() === emb.count())
    assert(centroids.count() === 8)

    val ivf = Ivf.probeTopK(assignments, centroids, queryId = 0L, k = 10, nprobe = 8)
    val exact = Knn.bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10)
    // probing ALL cells must equal the exact scan
    assert(ivf.as[(Long, Double)].collect().toSeq === exact.as[(Long, Double)].collect().toSeq)

    // narrow probe returns k results ranked by the same cosine
    val narrow = Ivf.probeTopK(assignments, centroids, queryId = 0L, k = 10, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(narrow.length === 10)
    assert(narrow.map(_._2).toSeq === narrow.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("salted join result == plain join result") {
    import spark.implicits._
    val lineitem = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = Skew.saltedJoin(lineitem, orders, "l_orderkey", salts = 8)
      .groupBy("o_orderpriority").count()
    val plain = lineitem.join(orders, "l_orderkey")
      .groupBy("o_orderpriority").count()
    val s = salted.as[(String, Long)].collect().toMap
    val p = plain.as[(String, Long)].collect().toMap
    assert(s === p)
  }

  test("asof join: latest at-or-before match per key, >= tie semantics, null when none") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:30")), // after p1 → 100
      (2L, "u1", ts("2024-01-01 10:01:00")), // exactly at p2 → 200 (>= semantics)
      (3L, "u1", ts("2024-01-01 09:59:00")), // before any → null
      (4L, "u2", ts("2024-01-01 10:05:00"))  // other key, no purchases → null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 100L),
      ("u1", ts("2024-01-01 10:01:00"), 200L)
    ).toDF("k", "rt", "v")
    val got = graft.operators.AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }

  test("key histogram surfaces the heaviest keys") {
    val h = Skew.keyHistogram(Tables.lineitem(spark, sfDir), col("l_returnflag"), topN = 3)
    assert(h.count() === 3)
  }
}
