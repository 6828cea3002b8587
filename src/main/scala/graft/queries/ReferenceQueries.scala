package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Deterministic._

/** Batch-verifiable analogues of the reference's operator surface
  * (SURVEY.md §2), run over the `events` table: sliding/tumbling windowed
  * aggregation, fraud filter + CASE chain, JSON parse/encode, projections,
  * casts, scalar functions.
  *
  * The streaming forms of the same operators live in
  * graft.streaming.Pipelines (built on graft.operators.Ecommerce); here the
  * aggregates are swapped to their exact, order-independent forms so DuckDB
  * can hash-match (approx_count_distinct → count distinct, double sums →
  * integer cents; SURVEY.md §7.4).
  */
object ReferenceQueries extends QueryGroup {

  /** Sliding-window agg — batch analogue of `create_windowed_aggregations`
    * (ecommerce_streaming.py:65-85). window(1 min, 30 s) ⇒ each event in
    * exactly 2 windows; windows emitted as epoch seconds.
    */
  private val q01 = QueryDef(
    "q01_windowed_agg_sliding",
    (spark, dir) => {
      Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "1 minute", "30 seconds"), col("event_type"))
        .agg(
          count(lit(1)).as("order_count"),
          moneySum(col("value")).as("total_value"),
          moneyAvg(col("value")).as("avg_value"),
          countDistinct(col("user_id")).as("unique_users"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"))
        .filter(col("order_count") > 0)
        .select(
          epochS(col("window.start")).as("window_start"),
          epochS(col("window.end")).as("window_end"),
          col("event_type"), col("order_count"), col("total_value"),
          col("avg_value"), col("unique_users"), col("max_value"), col("min_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      WITH w AS (
        SELECT ((epoch_ms(ts) // 30000) - off.k) * 30 AS ws, e.*
        FROM events e CROSS JOIN (VALUES (0),(1)) off(k)
        WHERE ts IS NOT NULL
      )
      SELECT ws AS window_start, ws + 60 AS window_end, event_type,
        count(*) AS order_count,
        CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS total_value,
        (CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100)/count(*) AS avg_value,
        count(DISTINCT user_id) AS unique_users,
        max(value) AS max_value, min(value) AS min_value
      FROM w GROUP BY ws, event_type HAVING count(*) > 0
      ORDER BY window_start, event_type
    """))

  /** Tumbling-window variant (slide = size path of the window operator). */
  private val q02 = QueryDef(
    "q02_windowed_agg_tumbling",
    (spark, dir) => {
      Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("order_count"), moneySum(col("value")).as("total_value"))
        .select(
          epochS(col("window.start")).as("window_start"),
          col("event_type"), col("order_count"), col("total_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""
      SELECT (epoch_ms(ts) // 60000) * 60 AS window_start, event_type,
        count(*) AS order_count,
        CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS total_value
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2 ORDER BY window_start, event_type
    """))

  /** Fraud pipeline analogue — disjunctive filter F2 + first-match-wins
    * CASE chain C1 + narrow projection (ecommerce_streaming.py:90-107),
    * retargeted at the events columns. */
  private val q03 = QueryDef(
    "q03_fraud_filter_case",
    (spark, dir) => {
      Tables.events(spark, dir)
        .filter(col("value") > 250 || col("event_type").isin("purchase", "click") || col("user_id") % 10 === 0)
        .select(
          concat(lit("evt_"), col("event_id")).as("alert_id"),
          col("user_id"), col("event_type"),
          col("value"),
          epochS(col("ts")).as("event_epoch"),
          when(col("value") > 250, "HIGH_VALUE")
            .when(col("event_type").isin("purchase", "click"), "WATCHED_TYPE")
            .when(col("user_id") % 10 === 0, "WATCHED_USER")
            .otherwise("UNKNOWN").as("alert_type"))
        .orderBy("alert_id")
    },
    Some("""
      SELECT 'evt_' || event_id AS alert_id, user_id, event_type, value,
        CAST(epoch_ms(ts) // 1000 AS BIGINT) AS event_epoch,
        CASE WHEN value > 250 THEN 'HIGH_VALUE'
             WHEN event_type IN ('purchase','click') THEN 'WATCHED_TYPE'
             WHEN user_id % 10 = 0 THEN 'WATCHED_USER'
             ELSE 'UNKNOWN' END AS alert_type
      FROM events
      WHERE value > 250 OR event_type IN ('purchase','click') OR user_id % 10 = 0
      ORDER BY alert_id
    """))

  /** from_json against a declared schema (P2/X2) + aggregation over the
    * extracted field — the JSON-decode half of the Kafka value path. */
  private val q04 = QueryDef(
    "q04_json_extract_agg",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_type"), from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"))
        .orderBy("k_bucket")
    },
    Some("""
      SELECT CAST(json_extract(props,'$.k') AS INT) % 10 AS k_bucket,
        count(*) AS n, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY 1 ORDER BY k_bucket
    """))

  /** to_json(struct(...)) re-encode (P9/X3/X4) — byte-exact JSON built
    * from non-null int/string fields only (Spark omits null fields). */
  private val q05 = QueryDef(
    "q05_to_json_encode",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))).as("value"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        '{"o_orderkey":' || o_orderkey || ',"o_orderstatus":"' || o_orderstatus
          || '","o_orderpriority":"' || o_orderpriority || '"}' AS value
      FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
    """))

  /** Projection/cast/scalar-function bundle (P1, X1, X7-X10): CASTs,
    * concat, modulo bucketing, arithmetic. */
  private val q06 = QueryDef(
    "q06_projection_scalars",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          concat(lit("order_"), col("l_orderkey")).as("order_tag"),
          concat(lit("user_"), col("l_suppkey") % 100).as("supp_bucket"),
          col("l_quantity").cast("int").as("qty_int"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("revenue_e4"),
          (col("l_partkey") % 7 === 0).as("lucky_part"))
        .filter(col("l_orderkey") % 50 === 0)
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        'order_' || l_orderkey AS order_tag,
        'user_' || (l_suppkey % 100) AS supp_bucket,
        CAST(l_quantity AS INT) AS qty_int,
        CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
          * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS revenue_e4,
        l_partkey % 7 = 0 AS lucky_part
      FROM lineitem WHERE l_orderkey % 50 = 0
      ORDER BY l_orderkey, l_linenumber
    """))

  /** Predicate bundle (F1-F4): isNotNull, range comparison on timestamps,
    * IN-list, conjunction/disjunction. */
  private val q07 = QueryDef(
    "q07_filter_predicates",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate").isNotNull &&
          col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
          (col("l_returnflag").isin("A", "R") || col("l_discount") > 0.05))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS sum_price
      FROM lineitem
      WHERE l_shipdate IS NOT NULL
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
        AND (l_returnflag IN ('A','R') OR l_discount > 0.05)
      GROUP BY 1 ORDER BY l_returnflag
    """))

  /** CASE-chain precedence (C1/C2) on overlapping conditions — first match
    * must win, as in the reference's alert classifier. */
  private val q08 = QueryDef(
    "q08_case_chain",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "JUMBO")
            .when(col("o_totalprice") > 150000, "LARGE")
            .when(col("o_orderstatus") === "F", "FINISHED_SMALL")
            .otherwise("OTHER").as("order_class"))
        .groupBy("order_class")
        .agg(count(lit(1)).as("n"))
        .orderBy("order_class")
    },
    Some("""
      SELECT CASE WHEN o_totalprice > 300000 THEN 'JUMBO'
                  WHEN o_totalprice > 150000 THEN 'LARGE'
                  WHEN o_orderstatus = 'F' THEN 'FINISHED_SMALL'
                  ELSE 'OTHER' END AS order_class, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY order_class
    """))

  /** Timestamp functions (X5/X6 family): year/month/day extraction,
    * month truncation — emitted as integers for cross-engine exactness. */
  private val q09 = QueryDef(
    "q09_timestamp_functions",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .select(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          epochS(date_trunc("month", col("o_orderdate"))).as("month_epoch"),
          col("o_totalprice"))
        .groupBy("y", "m", "month_epoch")
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("y", "m")
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m,
        CAST(epoch_ms(date_trunc('month', o_orderdate)) // 1000 AS BIGINT) AS month_epoch,
        count(*) AS n,
        CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS revenue
      FROM orders GROUP BY 1,2,3 ORDER BY y, m
    """))

  def defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09)
}
