package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{max, struct}

import graft.streaming.Stateful

/** Stateful streaming operators: watermark-bounded streaming dedup and
  * custom session state (flatMapGroupsWithState + EventTimeTimeout). */
class StatefulStreamingSpec extends SparkSpec {

  case class Evt(order_id: String, user_id: String, total_amount: Double,
                 event_timestamp: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    import spark.implicits._
    val input = MemoryStream[Evt](spark)
    val q = Stateful.dedupStream(input.toDF(), Seq("order_id"), "event_timestamp", "30 seconds")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        Evt("a", "u1", 10.0, ts("2024-01-01 10:00:00")),
        Evt("a", "u1", 10.0, ts("2024-01-01 10:00:05")), // dup within horizon
        Evt("b", "u2", 20.0, ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("order_id").as[String].collect().sorted.toSeq === Seq("a", "b"))

      // same key again within the same batch horizon → still dropped
      input.addData(Evt("a", "u1", 10.0, ts("2024-01-01 10:00:12")))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions close on event-time gap and emit one summary") {
    import spark.implicits._
    val input = MemoryStream[Evt](spark)
    val q = Stateful.userSessions(input.toDF(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      input.addData(
        Evt("o1", "u1", 10.0, ts("2024-01-01 10:00:00")),
        Evt("o2", "u1", 15.0, ts("2024-01-01 10:00:30")),
        Evt("o3", "u2", 99.0, ts("2024-01-01 10:00:40")))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // sessions still open

      // event time jumps far ahead → watermark passes both timeouts
      input.addData(Evt("o9", "u3", 1.0, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      input.addData(Evt("o10", "u3", 1.0, ts("2024-01-01 10:31:00")))
      q.processAllAvailable()

      val sessions = spark.table("sessions_out")
        .select("user_id", "n_events", "total_amount", "duration_s")
        .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
      assert(sessions("u1") === (("u1", 2L, 25.0, 30L)))
      assert(sessions("u2") === (("u2", 1L, 99.0, 0L)))
    } finally q.stop()
  }

  test("transformWithState keeps per-key running totals across batches") {
    import spark.implicits._
    // graft pins the reference's HDFS-backed provider globally;
    // runningTotals itself must re-pin RocksDB (transformWithState
    // supports only RocksDB) — start the query with NO manual override
    // so this test fails if the operator stops doing that.
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    val input = MemoryStream[Evt](spark)
    val totals = Stateful.runningTotals(input.toDF())
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    val q = totals
      .writeStream.format("memory").queryName("running_out").outputMode("update").start()
    try {
      input.addData(
        Evt("o1", "u1", 10.0, ts("2024-01-01 10:00:00")),
        Evt("o2", "u1", 15.0, ts("2024-01-01 10:00:10")),
        Evt("o3", "u2", 50.0, ts("2024-01-01 10:00:20")))
      q.processAllAvailable()
      input.addData(Evt("o4", "u1", 5.0, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // update mode: latest row per (user, batch); final running totals win
      val latest = spark.table("running_out")
        .groupBy($"user_id").agg(max(struct($"n_orders", $"total_amount")).as("s"))
        .select($"user_id", $"s.n_orders", $"s.total_amount")
        .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(latest("u1") === ((3L, 30.0))) // state survived across batches
      assert(latest("u2") === ((1L, 50.0)))
    } finally {
      q.stop()
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    }
  }
}
