package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Pipelines

/** Reliability surface of the streaming rebuild: Kafka source/sink option
  * plumbing (assertable without a broker), the approx_count_distinct
  * accuracy contract behind the reference's `unique_customers` column,
  * and checkpoint-recovery (stop → restart from the same checkpoint loses
  * and duplicates nothing — the reference's fault-tolerance claim,
  * README.md:175).
  */
class StreamingReliabilitySpec extends SparkSpec {

  case class OrderEvent(order_id: String, user_id: String, category: String,
                        location: String, total_amount: Double,
                        is_fraud_simulation: Boolean, event_timestamp: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  private def evt(id: Int, at: String, user: String = null, amount: Double = 100.0) =
    OrderEvent(s"o$id", Option(user).getOrElse(s"u$id"), "Electronics", "US",
      amount, false, ts(at))

  /** All private field values of `obj` (walking superclasses): the string
    * fields and every String→String map merged with lower-cased keys.
    * This is how the spec reads a DataStreamReader/Writer's format and
    * options without starting the query. */
  private def reflectConfig(obj: AnyRef): (Set[String], Map[String, String], Seq[Any]) = {
    def fields(c: Class[_]): List[java.lang.reflect.Field] =
      if (c == null || c == classOf[Object]) Nil
      else c.getDeclaredFields.toList ::: fields(c.getSuperclass)
    val vals = fields(obj.getClass).map { f => f.setAccessible(true); f.get(obj) }
    val strings = vals.collect { case s: String => s }.toSet
    val options = vals.collect { case m: scala.collection.Map[_, _] =>
      m.toSeq.collect { case (k: String, v: String) => k.toLowerCase -> v }
    }.flatten.toMap
    (strings, options, vals)
  }

  test("Kafka source options all reach the stream definition (no broker needed)") {
    val reader = Pipelines.kafkaOrderReader(spark, "broker1:9092,broker2:9092")
    val (strings, opts, _) = reflectConfig(reader)
    assert(strings.contains("kafka"), "format should be kafka")
    assert(opts("kafka.bootstrap.servers") === "broker1:9092,broker2:9092")
    assert(opts("subscribe") === "ecommerce-orders")
    assert(opts("startingoffsets") === "latest")
    assert(opts("maxoffsetspertrigger") === "1000") // W7 rate limiting
    assert(opts("kafka.request.timeout.ms") === "60000")
    assert(opts("kafka.session.timeout.ms") === "60000")
  }

  test("Kafka sink options + trigger reach the sink definition (no broker needed)") {
    import spark.implicits._
    val input = MemoryStream[String](spark)
    val writer = Pipelines.kafkaSink(input.toDF().toDF("value"),
      "broker1:9092", "fraud-alerts", "/tmp/cp-kafka-plumbing")
    val (strings, opts, vals) = reflectConfig(writer)
    assert(strings.contains("kafka"), "sink format should be kafka")
    assert(opts("kafka.bootstrap.servers") === "broker1:9092")
    assert(opts("topic") === "fraud-alerts")
    assert(opts("checkpointlocation") === "/tmp/cp-kafka-plumbing")
    assert(vals.exists {
      case t: Trigger => t == Trigger.ProcessingTime("5 seconds")
      case _ => false
    }, "5 s processing-time trigger should be set")
  }

  test("approx_count_distinct(user_id) lands within rsd of exact — batch") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val row = events.agg(
      approx_count_distinct(col("user_id")).as("approx"),
      countDistinct(col("user_id")).as("exact")).head()
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    // default rsd = 5%; assert within 3 standard deviations
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
      s"approx=$approx exact=$exact")
  }

  test("approx_count_distinct(user_id) lands within rsd of exact — streaming window") {
    import spark.implicits._
    val input = MemoryStream[OrderEvent](spark)
    val query = Pipelines.windowedAggregationStream(input.toDF())
      .writeStream.format("memory").queryName("acd_out").outputMode("append").start()
    try {
      // 120 distinct users inside one window slot
      input.addData((1 to 120).map(i => evt(i, "2024-01-01 10:00:10")): _*)
      query.processAllAvailable()
      input.addData(evt(999, "2024-01-01 10:05:00")) // advance watermark, close windows
      query.processAllAvailable()
      val got = spark.table("acd_out")
        .filter(col("window_start") === ts("2024-01-01 10:00:00"))
        .select(col("unique_customers"), col("order_count"))
        .as[(Long, Long)].head()
      assert(got._2 === 120L)
      assert(math.abs(got._1 - 120L) <= 18L, s"unique_customers=${got._1}, exact=120")
    } finally query.stop()
  }

  case class Payment(pay_order_id: String, pay_amount: Double, pay_timestamp: Timestamp)

  test("stream-stream join: time-bounded match, state-evicting outer emission") {
    import spark.implicits._
    val orders = MemoryStream[OrderEvent](spark)
    val payments = MemoryStream[Payment](spark)
    val joined = Pipelines.ordersWithPayments(orders.toDF(), payments.toDF(),
      joinType = "left_outer")
      .select(col("order_id"), col("pay_amount"))
    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      orders.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:00:00"))
      payments.addData(
        Payment("o1", 99.0, ts("2024-01-01 10:05:00")),  // within 10 min → match
        Payment("o2", 11.0, ts("2024-01-01 10:20:00")))  // beyond window → no match
      query.processAllAvailable()
      val matched = spark.table("ss_join")
        .filter(col("pay_amount").isNotNull)
        .as[(String, Double)].collect().toMap
      assert(matched === Map("o1" -> 99.0)) // o2's late payment never matches

      // advance both watermarks far past the match window: o2's state can
      // no longer match, so the outer side emits it with a null payment
      orders.addData(evt(9, "2024-01-01 11:00:00"))
      payments.addData(Payment("o9x", 1.0, ts("2024-01-01 11:00:00")))
      query.processAllAvailable()
      val unmatched = spark.table("ss_join")
        .filter(col("pay_amount").isNull)
        .select("order_id").as[String].collect().toSet
      assert(unmatched.contains("o2"), "expired order must emit with null payment")
    } finally query.stop()
  }

  test("stream-static enrichment join: broadcast dim, no state, nulls pass through") {
    import spark.implicits._
    val input = MemoryStream[OrderEvent](spark)
    val dim = Seq(("Electronics", "Tech", 0.12), ("Clothing", "Apparel", 0.35))
      .toDF("category", "department", "margin")
    val enriched = Pipelines.enrichedStream(input.toDF(), dim, "category")
      .select(col("order_id"), col("department"), col("margin"))
    val query = enriched.writeStream.format("memory").queryName("ss_enrich")
      .outputMode("append").start()
    try {
      input.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:00:01"))
      query.processAllAvailable()
      val got = spark.table("ss_enrich")
        .as[(String, String, Double)].collect().sortBy(_._1).toSeq
      // every Electronics order enriched in the same micro-batch — no
      // waiting on watermarks, no join state held between batches
      assert(got === Seq(("o1", "Tech", 0.12), ("o2", "Tech", 0.12)))
      assert(query.lastProgress == null ||
        query.lastProgress.stateOperators.isEmpty,
        "stream-static join must hold no state store")
    } finally query.stop()

    // unmatched categories flow through with nulls (left join) — the
    // stream never blocks on incomplete reference data
    val input2 = MemoryStream[OrderEvent](spark)
    val enriched2 = Pipelines.enrichedStream(
      input2.toDF().withColumn("category", lit("Garden")), dim, "category")
      .select(col("order_id"), col("department"))
    val q2 = enriched2.writeStream.format("memory").queryName("ss_enrich2")
      .outputMode("append").start()
    try {
      input2.addData(evt(7, "2024-01-01 10:00:00"))
      q2.processAllAvailable()
      val row = spark.table("ss_enrich2").collect().head
      assert(row.getString(0) === "o7" && row.isNullAt(1))
    } finally q2.stop()
  }

  test("foreachBatch sink delivers every row exactly once with batch ids") {
    import spark.implicits._
    val input = MemoryStream[OrderEvent](spark)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val cp = java.nio.file.Files.createTempDirectory("graft-feb-cp").toString
    val query = Pipelines.foreachBatchSink(input.toDF(), cp) { (batch, id) =>
      batch.select("order_id").collect().foreach(r => seen.add(id -> r.getString(0)))
    }.start()
    try {
      input.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:00:01"))
      query.processAllAvailable()
      input.addData(evt(3, "2024-01-01 10:00:02"))
      query.processAllAvailable()
      val rows = seen.toArray(Array.empty[(Long, String)])
      assert(rows.map(_._2).sorted.toSeq === Seq("o1", "o2", "o3"))
      assert(rows.map(_._1).distinct.length >= 2, "rows arrived across distinct batch ids")
    } finally query.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[OrderEvent](spark)
    input.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:00:01"))
    input.addData(evt(3, "2024-01-01 10:00:02"))
    val query = input.toDF().select(col("order_id"))
      .writeStream.format("memory").queryName("avail_now")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    try {
      assert(query.awaitTermination(60000), "AvailableNow query should self-terminate")
      assert(!query.isActive)
      val got = spark.table("avail_now").as[String].collect().sorted.toSeq
      assert(got === Seq("o1", "o2", "o3"), "entire backlog processed before stopping")
    } finally if (query.isActive) query.stop()
  }

  test("restart from checkpoint: no lost and no duplicated windows") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-recover-out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-recover-cp").toString
    val input = MemoryStream[OrderEvent](spark)
    def start() = Pipelines.windowedAggregationStream(input.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append").start()

    // Phase 1: two events + a watermark advancer, then stop.
    val q1 = start()
    try {
      input.addData(evt(1, "2024-01-01 10:00:10"), evt(2, "2024-01-01 10:00:40"))
      q1.processAllAvailable()
      input.addData(evt(3, "2024-01-01 10:02:01")) // wm → 10:01:31, closes 3 windows
      q1.processAllAvailable()
    } finally q1.stop()
    val phase1 = spark.read.parquet(out).count()
    assert(phase1 === 3, s"3 windows should have closed before the stop, got $phase1")

    // Phase 2: restart from the SAME checkpoint, close e3's windows.
    val q2 = start()
    try {
      input.addData(evt(4, "2024-01-01 10:06:00")) // wm → 10:05:30
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .select(col("window_start").cast("string"), col("order_count"))
      .as[(String, Long)].collect()
    // exactly once per window: nothing lost, nothing replayed after restart
    assert(rows.length === rows.map(_._1).distinct.length, s"duplicate windows in $rows")
    assert(rows.toMap === Map(
      "2024-01-01 09:59:30" -> 1L, // e1
      "2024-01-01 10:00:00" -> 2L, // e1, e2
      "2024-01-01 10:00:30" -> 1L, // e2
      "2024-01-01 10:01:30" -> 1L, // e3 (closed only after restart)
      "2024-01-01 10:02:00" -> 1L))
  }
}
