package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Ecommerce
import graft.streaming.Pipelines

/** Streaming-semantics parity with the reference (SURVEY.md §2.6):
  * sliding-window double-assignment, watermark-gated append emission,
  * late-data drop, fraud-rule precedence, lenient JSON parsing with
  * schema drift, rate-source order synthesis.
  */
class StreamingParitySpec extends SparkSpec {

  case class OrderEvent(order_id: String, user_id: String, category: String,
                        location: String, total_amount: Double,
                        is_fraud_simulation: Boolean, event_timestamp: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  private def evt(id: Int, at: String, amount: Double = 100.0) =
    OrderEvent(s"o$id", s"u${id % 3}", "Electronics", "US", amount, false, ts(at))

  test("sliding window + watermark + append mode emit exactly the reference semantics") {
    import spark.implicits._
    val input = MemoryStream[OrderEvent](spark)
    val query = Pipelines.windowedAggregationStream(input.toDF())
      .writeStream.format("memory").queryName("agg_out").outputMode("append").start()
    try {
      // three events inside 10:00:00..10:01:00
      input.addData(
        evt(1, "2024-01-01 10:00:10"),
        evt(2, "2024-01-01 10:00:20", amount = 200.0),
        evt(3, "2024-01-01 10:00:40"))
      query.processAllAvailable()
      // append mode: nothing emitted until the watermark passes window end
      assert(spark.table("agg_out").count() === 0)

      // advance event time to 10:05 → watermark 10:04:30 → earlier windows close
      input.addData(evt(9, "2024-01-01 10:05:00"))
      query.processAllAvailable()
      val rows = spark.table("agg_out")
        .select($"window_start".cast("string"), $"order_count", $"total_revenue")
        .as[(String, Long, Double)].collect().map { case (k, c, r) => k -> ((c, r)) }.toMap

      // every event lands in exactly 2 windows (1 min window / 30 s slide)
      assert(rows === Map(
        "2024-01-01 09:59:30" -> ((2L, 300.0)),  // e1, e2
        "2024-01-01 10:00:00" -> ((3L, 400.0)),  // e1, e2, e3
        "2024-01-01 10:00:30" -> ((1L, 100.0)))) // e3

      // a 4.5-minute-late event (behind the watermark) must be dropped
      input.addData(evt(4, "2024-01-01 10:00:05"))
      query.processAllAvailable()
      assert(spark.table("agg_out").count() === 3)
    } finally query.stop()
  }

  test("fraud rules: disjunctive filter + first-match-wins CASE precedence") {
    import spark.implicits._
    val orders = Seq(
      // matches rule 1 AND 2 → first match (HIGH_VALUE_ORDER) must win
      ("o1", "u1", "p", 1500.0, "XX", false, ts("2024-01-01 10:00:00")),
      ("o2", "u2", "p", 500.0, "YY", true, ts("2024-01-01 10:00:00")), // rule 2 beats rule 3
      ("o3", "u3", "p", 500.0, "US", true, ts("2024-01-01 10:00:00")), // rule 3 only
      ("o4", "u4", "p", 500.0, "US", false, ts("2024-01-01 10:00:00")) // no match → filtered out
    ).toDF("order_id", "user_id", "product_name", "total_amount", "location",
      "is_fraud_simulation", "event_timestamp")
    val alerts = Ecommerce.fraudAlerts(orders)
      .select("order_id", "alert_type").as[(String, String)].collect().toMap
    assert(alerts === Map(
      "o1" -> "HIGH_VALUE_ORDER", "o2" -> "SUSPICIOUS_LOCATION", "o3" -> "FRAUD_SIMULATION"))
  }

  test("parseOrders is lenient to schema drift (from_json PERMISSIVE)") {
    import spark.implicits._
    // drifted producer payload: customer_id/region instead of user_id/location
    val drifted = """{"order_id":"a1","customer_id":"CUST_1","product_id":"P1","total_amount":12.5,"timestamp":"2024-01-01T10:00:00"}"""
    val ok = """{"order_id":"a2","user_id":"u1","total_amount":99.0,"location":"US","timestamp":"2024-01-01T11:00:00"}"""
    val bad = """{"order_id":"a3","timestamp":"not-a-time"}"""
    val kafkaShaped = Seq(drifted, ok, bad).toDF("v")
      .select(encode($"v", "utf-8").as("value"), lit(ts("2024-01-01 12:00:00")).as("timestamp"))
    val parsed = Ecommerce.parseOrders(kafkaShaped)
    val rows = parsed.select("order_id", "user_id", "location", "total_amount").collect()
    // a3 dropped (unparseable timestamp → null → F1 filter)
    assert(rows.map(_.getString(0)).toSet === Set("a1", "a2"))
    val a1 = rows.find(_.getString(0) == "a1").get
    assert(a1.isNullAt(1) && a1.isNullAt(2) && a1.getDouble(3) === 12.5)
  }

  test("rate-source synthesis matches the reference's deterministic columns") {
    import spark.implicits._
    val rate = Seq((0L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-01 10:00:01")),
      (10L, ts("2024-01-01 10:00:02"))).toDF("value", "timestamp")
    val rows = Ecommerce.synthesizeOrders(rate)
      .select("order_id", "category", "location", "total_amount", "is_fraud_simulation")
      .as[(String, String, String, Double, Boolean)].collect().sortBy(_._1)
    assert(rows(0) === (("order_0", "Electronics", "US", 50.0, true)))
    assert(rows(1) === (("order_10", "Clothing", "UK", 60.0, true)))
    assert(rows(2) === (("order_3", "Clothing", "US", 53.0, false)))
  }

  test("reference fan-out topology runs end-to-end on the rate source") {
    val out = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val queries = Pipelines.runReferenceTopology(spark, out, rowsPerSecond = 200)
    try {
      // wait for the alert branch (5 s trigger) to commit at least one batch
      val deadline = System.currentTimeMillis() + 60000
      def alertBatches = Option(queries(1).lastProgress).map(_.batchId).getOrElse(-1L)
      while (alertBatches < 1 && System.currentTimeMillis() < deadline) Thread.sleep(500)
      queries.foreach(q => assert(q.isActive, s"query ${q.name} died: ${Option(q.exception).flatten}"))
      assert(alertBatches >= 1, "alert sink never committed a batch")
    } finally queries.foreach(_.stop())
    val alerts = spark.read.parquet(s"$out/alerts")
    assert(alerts.columns.toSeq === Seq("value"))
    assert(alerts.count() > 0) // rate source guarantees fraud matches (value%10=0)
  }
}
