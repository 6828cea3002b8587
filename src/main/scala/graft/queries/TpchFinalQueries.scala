package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.{cents, epochS}

/** Round-4 closers: TPC-H Q6 and Q13 — the final two of the 22 TPC-H
  * shapes — plus multi-window SLO burn-rate alerting; deterministic for
  * the oracle gate.
  */
object TpchFinalQueries extends QueryGroup {

  // ---------------------------------------------------------------- q452

  /** TPC-H Q6 (forecasting revenue change): one tight scan-filter-fold —
    * shipped in 1995, discount 5–7%, quantity < 24 — summing
    * extendedprice×discount. The discount enters as EXACT centi-units
    * (floor(d·100+0.5)), so the predicate band and the product are pure
    * integers; revenue is reported in centi-cents (÷10⁴ for dollars).
    * Completes the 22-query TPC-H sweep together with q453.
    *
    * Scale shape: everything reaches the scan (three pushed filters,
    * two read columns beyond the filter set) and folds map-side to one
    * row — the canonical predicate-pushdown benchmark. */
  private val q452 = QueryDef(
    "q452_tpch_q6_revenue_change",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .select(cents(col("l_extendedprice")).as("epc"),
          expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("dc"),
          col("l_quantity"), col("l_shipdate"))
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01" &&
          col("dc") >= 5L && col("dc") <= 7L && col("l_quantity") < 24d)
        .agg(count(lit(1)).as("n_items"),
          sum(expr("epc * dc")).as("revenue_centicents"))
    },
    Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
          * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
          AS revenue_centicents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24
    """))

  // ---------------------------------------------------------------- q453

  /** TPC-H Q13 (customer distribution): orders-per-customer counted
    * through a LEFT join (customers with no orders land in the 0
    * bucket), excluding urgent-priority orders as the Q13 comment
    * filter's stand-in, then the distribution of customers by order
    * count — the two-level aggregation whose outer join is the
    * notorious skew point of the official benchmark.
    *
    * Scale shape: the filter reaches the orders scan; the first
    * aggregate folds per customer key; the distribution is a
    * vocabulary-sized second fold. */
  private val q453 = QueryDef(
    "q453_tpch_q13_customer_distribution",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"))
      val perCust = Tables.customer(spark, dir).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      WITH per_cust AS (
        SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN (SELECT o_custkey FROM orders
                   WHERE o_orderpriority <> '1-URGENT') o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey)
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM per_cust GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """))

  // ---------------------------------------------------------------- q454

  /** Multi-window SLO burn-rate alerting (the SRE-workbook policy):
    * with SLO "error events ≤ 2% of traffic", the error rate over
    * trailing 1/7/28-day windows (anchored at the stream's end) is
    * scored as a burn rate (rate ÷ SLO, ×1000); an alert FIRES only
    * when its window pair both burn above the policy threshold — the
    * long window for severity, the short one to stop alerting once the
    * incident ends. Pure integer rates; window edges in epoch seconds.
    *
    * Scale shape: one events scan folds three windowed conditional
    * sums map-side into a single row (the trailing filters reach the
    * scan); policy evaluation is 3 literal rows. */
  private val q454 = QueryDef(
    "q454_slo_burn_rate_alerts",
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(epochS(col("ts")).as("s"), col("event_type"))
      val tmax = e.agg(max(col("s")).as("tmax"))
      val aggs = Seq(1L, 7L, 28L).flatMap { d =>
        Seq(
          sum((col("s") > col("tmax") - lit(d * 86400L)).cast("long"))
            .as(s"n_$d"),
          sum((col("s") > col("tmax") - lit(d * 86400L) &&
            col("event_type") === "error").cast("long")).as(s"e_$d"))
      }
      val counted = e.crossJoin(broadcast(tmax)).agg(aggs.head, aggs.tail: _*)
      val windows = counted.select(explode(array(
        struct(lit(1L).as("window_days"), col("n_1").as("n_events"),
          col("e_1").as("n_errors")),
        struct(lit(7L).as("window_days"), col("n_7").as("n_events"),
          col("e_7").as("n_errors")),
        struct(lit(28L).as("window_days"), col("n_28").as("n_events"),
          col("e_28").as("n_errors")))).as("w")).select(col("w.*"))
        .withColumn("err_rate_ppm",
          expr("n_errors * 1000000 div greatest(n_events, 1)"))
        // SLO 2% => burn = rate / 20000 ppm, scaled x1000
        .withColumn("burn_milli", expr("err_rate_ppm * 1000 div 20000"))
      // policy rows: (short, long, threshold_milli) per SRE workbook
      val pol = windows.select(col("window_days"), col("burn_milli"))
      val shortB = pol.withColumnRenamed("window_days", "short_days")
        .withColumnRenamed("burn_milli", "short_burn")
      val longB = pol.withColumnRenamed("window_days", "long_days")
        .withColumnRenamed("burn_milli", "long_burn")
      val policies = Seq((1L, 7L, 6000L), (7L, 28L, 3000L))
      val polDf = spark.range(1).select(explode(array(policies.map {
        case (sd, ld, th) => struct(lit(sd).as("short_days"),
          lit(ld).as("long_days"), lit(th).as("threshold_milli"))
      }: _*)).as("p")).select(col("p.*"))
      val alerts = polDf
        .join(broadcast(shortB), Seq("short_days"))
        .join(broadcast(longB), Seq("long_days"))
        .select(col("short_days"), col("long_days"), col("threshold_milli"),
          col("short_burn"), col("long_burn"),
          (col("short_burn") >= col("threshold_milli") &&
            col("long_burn") >= col("threshold_milli")).cast("long").as("fires"))
      windows.select(lit(-1L).as("short_days"),
        col("window_days").as("long_days"), lit(-1L).as("threshold_milli"),
        lit(-1L).as("short_burn"), col("burn_milli").as("long_burn"),
        lit(-1L).as("fires"))
        .unionAll(alerts.select(col("short_days"), col("long_days"),
          col("threshold_milli"), col("short_burn"), col("long_burn"),
          col("fires")))
        .orderBy(col("short_days"), col("long_days"))
    },
    Some("""
      WITH e AS (
        SELECT CAST(epoch_ms(ts) // 1000 AS BIGINT) AS s, event_type
        FROM events),
      tm AS (SELECT max(s) AS tmax FROM e),
      counted AS (
        SELECT
          CAST(sum(CASE WHEN s > tmax - 86400 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
          CAST(sum(CASE WHEN s > tmax - 86400 AND event_type = 'error'
            THEN 1 ELSE 0 END) AS BIGINT) AS e_1,
          CAST(sum(CASE WHEN s > tmax - 604800 THEN 1 ELSE 0 END) AS BIGINT) AS n_7,
          CAST(sum(CASE WHEN s > tmax - 604800 AND event_type = 'error'
            THEN 1 ELSE 0 END) AS BIGINT) AS e_7,
          CAST(sum(CASE WHEN s > tmax - 2419200 THEN 1 ELSE 0 END) AS BIGINT) AS n_28,
          CAST(sum(CASE WHEN s > tmax - 2419200 AND event_type = 'error'
            THEN 1 ELSE 0 END) AS BIGINT) AS e_28
        FROM e CROSS JOIN tm),
      win AS (
        SELECT w.window_days, w.n_events, w.n_errors,
          w.n_errors * 1000000 // greatest(w.n_events, 1) AS err_rate_ppm,
          (w.n_errors * 1000000 // greatest(w.n_events, 1)) * 1000 // 20000
            AS burn_milli
        FROM counted,
        LATERAL (VALUES (CAST(1 AS BIGINT), n_1, e_1), (7, n_7, e_7),
          (28, n_28, e_28)) AS w(window_days, n_events, n_errors)),
      pol AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(7 AS BIGINT),
        CAST(6000 AS BIGINT)), (7, 28, 3000))
        AS t(short_days, long_days, threshold_milli)),
      alerts AS (
        SELECT p.short_days, p.long_days, p.threshold_milli,
          sw.burn_milli AS short_burn, lw.burn_milli AS long_burn,
          CAST(CASE WHEN sw.burn_milli >= p.threshold_milli
            AND lw.burn_milli >= p.threshold_milli THEN 1 ELSE 0 END AS BIGINT)
            AS fires
        FROM pol p
        JOIN win sw ON sw.window_days = p.short_days
        JOIN win lw ON lw.window_days = p.long_days)
      SELECT CAST(-1 AS BIGINT) AS short_days, window_days AS long_days,
        CAST(-1 AS BIGINT) AS threshold_milli, CAST(-1 AS BIGINT) AS short_burn,
        burn_milli AS long_burn, CAST(-1 AS BIGINT) AS fires
      FROM win
      UNION ALL
      SELECT short_days, long_days, threshold_milli, short_burn, long_burn,
        fires
      FROM alerts
      ORDER BY short_days, long_days
    """))

  override def defs: Seq[QueryDef] = Seq(q452, q453, q454)
}
