package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Deterministic._

/** The reference application's operator surface, rebuilt as pure
  * DataFrame→DataFrame transforms so the SAME code path serves batch
  * (oracle-verified) and Structured Streaming (graft.streaming.Pipelines).
  *
  * Reference: nikitamandhan10/kafka-spark-streaming-app,
  * `ecommerce_streaming.py` (see SURVEY.md §2 for the full inventory).
  */
object Ecommerce {

  /** Declared order schema — `define_order_schema()`
    * (ecommerce_streaming.py:21-36). All fields nullable; `from_json` is
    * permissive so drifted producer payloads (customer_id/region instead
    * of user_id/location, ecommerce_data_producer.py:59-69) parse with
    * nulls rather than failing.
    */
  val orderSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("user_id", StringType),
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("price", DoubleType),
    StructField("quantity", IntegerType),
    StructField("total_amount", DoubleType),
    StructField("location", StringType),
    StructField("timestamp", StringType),
    StructField("event_type", StringType),
    StructField("is_fraud_simulation", BooleanType)))

  /** Kafka value bytes → typed columns — `parse_and_clean_data`
    * (ecommerce_streaming.py:54-63): CAST(value AS STRING), from_json,
    * struct flatten, processing/event time columns, null-timestamp filter.
    * Narrow (no shuffle); fuses into one codegen stage.
    */
  def parseOrders(kafka: DataFrame): DataFrame =
    kafka
      .selectExpr("CAST(value AS STRING) AS json_string", "timestamp AS kafka_timestamp")
      .select(from_json(col("json_string"), orderSchema).alias("data"), col("kafka_timestamp"))
      .select(col("data.*"), col("kafka_timestamp"))
      .withColumn("processing_time", current_timestamp())
      .withColumn("event_timestamp", try_to_timestamp(col("timestamp")))
      .filter(col("event_timestamp").isNotNull)

  /** Flagship query — `create_windowed_aggregations`
    * (ecommerce_streaming.py:65-85): sliding event-time window (1 min
    * window / 30 s slide → every event in exactly 2 windows) × category ×
    * location, six aggregates, HAVING order_count > 0.
    *
    * Scale: one shuffle on (window, keys); Spark plans partial
    * (map-side) + final HashAggregate, so the shuffle carries one row per
    * (window×key) per mapper, not per event. In streaming the same plan
    * gets StateStoreRestore/Save around the final agg.
    */
  def windowedAggregations(orders: DataFrame,
                           timeCol: String = "event_timestamp",
                           keys: Seq[String] = Seq("category", "location")): DataFrame =
    orders
      .groupBy((window(col(timeCol), "1 minute", "30 seconds") +: keys.map(col)): _*)
      .agg(
        count(lit(1)).as("order_count"),
        sum(col("total_amount")).as("total_revenue"),
        avg(col("total_amount")).as("avg_order_value"),
        approx_count_distinct(col("user_id")).as("unique_customers"),
        max(col("total_amount")).as("max_order_value"),
        min(col("total_amount")).as("min_order_value"))
      .filter(col("order_count") > 0)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Suspicious locations of rule F2/C1 (ecommerce_streaming.py:92,103). */
  val SuspiciousLocations: Seq[String] = Seq("XX", "YY", "ZZ")

  /** Fraud predicate F2 (ecommerce_streaming.py:90-94):
    * amount > 1000 OR suspicious location OR simulated-fraud flag. */
  def fraudFilter(orders: DataFrame,
                  amountCol: String = "total_amount",
                  locations: Seq[String] = SuspiciousLocations): DataFrame =
    orders.filter(
      col(amountCol) > 1000 ||
      col("location").isin(locations: _*) ||
      col("is_fraud_simulation") === true)

  /** Alert projection + first-match-wins CASE chain C1
    * (ecommerce_streaming.py:95-107). Stateless, narrow, codegen-fused. */
  def fraudAlerts(orders: DataFrame): DataFrame =
    fraudFilter(orders).select(
      col("order_id"), col("user_id"), col("product_name"),
      col("total_amount"), col("location"), col("event_timestamp"),
      when(col("total_amount") > 1000, "HIGH_VALUE_ORDER")
        .when(col("location").isin(SuspiciousLocations: _*), "SUSPICIOUS_LOCATION")
        .when(col("is_fraud_simulation") === true, "FRAUD_SIMULATION")
        .otherwise("UNKNOWN").as("alert_type"),
      current_timestamp().as("alert_timestamp"))

  /** Kafka-sink re-encoding P9 (ecommerce_streaming.py:122):
    * whole row → single JSON `value` column. */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("*"))).alias("value"))

  /** Synthetic order columns from a rate-source stream
    * (ecommerce_streaming.py:176-183) — the reference's executable path.
    * Deterministic given `value`, so ideal for golden tests.
    */
  def synthesizeOrders(rate: DataFrame): DataFrame =
    rate
      .withColumn("order_id", expr("concat('order_', value)"))
      .withColumn("user_id", expr("concat('user_', value % 100)"))
      .withColumn("category", expr("case when value % 4 = 0 then 'Electronics' else 'Clothing' end"))
      .withColumn("product_name", expr("case when value % 4 = 0 then 'MacBook Pro' else 'Nike Shoes' end"))
      .withColumn("location", expr("case when value % 3 = 0 then 'US' else 'UK' end"))
      .withColumn("total_amount", expr("cast((value % 500) + 50.0 as double)"))
      .withColumn("is_fraud_simulation", expr("value % 10 = 0"))
      .withColumn("event_timestamp", col("timestamp"))
}
