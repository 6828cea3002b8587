package graft

import org.apache.spark.sql.functions._

/** Round-13: the self-healing checkpoint memo (graph.Backbone /
  * SuffixDedupQueries) and the bench cleanup contract around it.
  *
  * Background (r12 ADVICE, high): unpersisting a locally-checkpointed
  * RDD deletes its blocks irrecoverably, so a memo that kept returning
  * the dead frame poisoned every later consumer with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — and the bench recorded
  * time-to-failure as the query time. Two defenses, both tested here:
  * the memo validates a hit's storage level and rebuilds a dead entry,
  * and Bench.cleanup skips checkpointed RDDs entirely.
  */
class CkptMemoSpec extends SparkSpec {

  test("a memo entry whose checkpoint blocks were unpersisted is rebuilt, " +
    "not returned dead") {
    val memo = new CkptMemo[org.apache.spark.sql.DataFrame]()
    var builds = 0
    def build() = {
      builds += 1
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
        .localCheckpoint(true)
    }
    val a = memo.getOrBuild(spark, "t")(build())(Seq(_))
    assert(a.count() === 100 && builds === 1)
    // warm hit: same frame, no rebuild
    val b = memo.getOrBuild(spark, "t")(build())(Seq(_))
    assert(b.count() === 100 && builds === 1)
    // simulate the r12 bench sweep: blanket-unpersist every persistent RDD
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // the memo must detect the dead checkpoint and rebuild — and the
    // rebuilt frame must be fully consumable
    val c = memo.getOrBuild(spark, "t")(build())(Seq(_))
    assert(builds === 2, "dead entry was returned instead of rebuilt")
    assert(c.count() === 100)
  }

  test("distinct sessions/keys never share entries") {
    val memo = new CkptMemo[org.apache.spark.sql.DataFrame]()
    val a = memo.getOrBuild(spark, "k1")(
      spark.range(5).toDF.localCheckpoint(true))(Seq(_))
    val b = memo.getOrBuild(spark, "k2")(
      spark.range(7).toDF.localCheckpoint(true))(Seq(_))
    assert(a.count() === 5 && b.count() === 7)
  }

  test("Backbone memo consumers survive a blanket unpersist between reads " +
    "(the r12 bench failure mode, end to end)") {
    val dir = "/root/testdata/sf0.001"
    val e1 = graph.Backbone.coPurchase(spark, dir)
    val n1 = e1.count()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val e2 = graph.Backbone.coPurchase(spark, dir)
    assert(e2.count() === n1, "rebuilt backbone diverged from the original")
  }
}
