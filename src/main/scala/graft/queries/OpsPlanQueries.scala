package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 batch 5: operational planners — newsvendor stocking from the
  * demand distribution, corruption blast-radius accounting, and MVCC
  * version-chain vacuum sizing. All outputs integers / strings with
  * total ORDER BYs for the oracle gate.
  */
object OpsPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q552

  /** Newsvendor stock plan: the profit-optimal stock level is the
    * critical quantile F⁻¹(cᵤ/(cᵤ+cₒ)) of the demand distribution —
    * taken here bin-exactly from the observed DAILY demand (total
    * lineitem quantity per ship day) for critical ratios 0.5/0.8/0.9,
    * with the expected leftover (overage) and lost-sales (underage)
    * units per day that each choice actually implies, summed exactly
    * over the demand history. The one-number inventory decision, made
    * from data instead of a distributional guess.
    *
    * Scale shape: demand folds to one row per day (calendar-sized); the
    * quantile comes from a cumulative window over the per-day demand
    * table (q64's bin discipline — the boundary day is included whole);
    * the 3-row ratio grid and its stock levels broadcast back onto the
    * day table for the expectation sums. */
  private val q552 = QueryDef(
    "q552_newsvendor_stock_plan",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(500L, 800L, 900L).toDF("ratio_milli")
      val daily = Tables.lineitem(spark, dir)
        .select((epochS(col("l_shipdate")) / 86400L).cast("long").as("day"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .groupBy(col("day")).agg(sum(col("q")).as("d"))
      val cum = daily
        .withColumn("cum_days", count(lit(1)).over(Window.orderBy(col("d"), col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      val tot = daily.agg(count(lit(1)).as("n_days"))
      val stocks = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(grid))
        .filter(col("cum_days") * 1000L >= col("ratio_milli") * col("n_days"))
        .groupBy(col("ratio_milli"))
        .agg(min(col("d")).as("stock_units"), max(col("n_days")).as("n_days"))
      daily.crossJoin(broadcast(stocks))
        .groupBy(col("ratio_milli"), col("stock_units"), col("n_days"))
        .agg(sum(expr("greatest(stock_units - d, 0)")).as("overage_units"),
          sum(expr("greatest(d - stock_units, 0)")).as("underage_units"))
        .select(col("ratio_milli"), col("n_days"), col("stock_units"),
          col("overage_units"), col("underage_units"),
          expr("overage_units * 1000 div n_days").as("overage_per_day_milli"),
          expr("underage_units * 1000 div n_days").as("underage_per_day_milli"))
        .orderBy(col("ratio_milli"))
    },
    Some("""
      WITH grid(ratio_milli) AS (VALUES (CAST(500 AS BIGINT)),
        (CAST(800 AS BIGINT)), (CAST(900 AS BIGINT))),
      daily AS (
        SELECT epoch_ms(l_shipdate) // 1000 // 86400 AS day,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        FROM lineitem GROUP BY 1),
      cum AS (
        SELECT day, d,
          count(*) OVER (ORDER BY d, day ROWS UNBOUNDED PRECEDING) AS cum_days
        FROM daily),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
      stocks AS (
        SELECT ratio_milli, min(d) AS stock_units, max(n_days) AS n_days
        FROM cum CROSS JOIN tot CROSS JOIN grid
        WHERE cum_days * 1000 >= ratio_milli * n_days
        GROUP BY ratio_milli)
      SELECT ratio_milli, n_days, stock_units,
        CAST(sum(greatest(stock_units - d, 0)) AS BIGINT) AS overage_units,
        CAST(sum(greatest(d - stock_units, 0)) AS BIGINT) AS underage_units,
        CAST(sum(greatest(stock_units - d, 0)) * 1000 // n_days AS BIGINT)
          AS overage_per_day_milli,
        CAST(sum(greatest(d - stock_units, 0)) * 1000 // n_days AS BIGINT)
          AS underage_per_day_milli
      FROM daily CROSS JOIN stocks
      GROUP BY ratio_milli, stock_units, n_days
      ORDER BY ratio_milli
    """))

  // ---------------------------------------------------------------- q553

  /** Corruption blast-radius accounting: if one ingest slice (the
    * orders of 1995-03) is found corrupted, what exactly must be
    * quarantined and restated — orders, their line items, the customers
    * whose histories are now suspect, and the revenue at risk, absolute
    * and as a share of total (cents-exact). The first query an incident
    * runbook runs; q292 plans the cascade DELETE mechanics, this sizes
    * the incident.
    *
    * Scale shape: partition-pruned scans (the date filter reaches the
    * orders scan), two keyed joins, one-row total broadcast for the
    * share. */
  private val q553 = QueryDef(
    "q553_corruption_blast_radius",
    (spark, dir) => {
      val bad = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-03-01" && col("o_orderdate") < "1995-04-01")
        .select(col("o_orderkey"), col("o_custkey"))
      val badLines = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("price_c"))
        .join(bad, Seq("o_orderkey"))
      val total = Tables.lineitem(spark, dir)
        .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
          .as("total_revenue_c"))
      val oStats = bad.agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      badLines.agg(count(lit(1)).as("n_lineitems"),
          sum(col("price_c")).as("revenue_at_risk_c"))
        .crossJoin(broadcast(oStats))
        .crossJoin(broadcast(total))
        .select(col("n_orders"), col("n_lineitems"), col("n_customers"),
          col("revenue_at_risk_c"),
          expr("revenue_at_risk_c * 1000000 div total_revenue_c")
            .as("revenue_share_ppm"))
    },
    Some("""
      WITH bad AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-03-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'),
      bl AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM lineitem l JOIN bad b ON l.l_orderkey = b.o_orderkey),
      t AS (
        SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS total_revenue_c
        FROM lineitem),
      os AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM bad)
      SELECT os.n_orders, CAST(count(*) AS BIGINT) AS n_lineitems,
        os.n_customers,
        CAST(sum(price_c) AS BIGINT) AS revenue_at_risk_c,
        CAST(sum(price_c) * 1000000 // total_revenue_c AS BIGINT)
          AS revenue_share_ppm
      FROM bl CROSS JOIN os CROSS JOIN t
      GROUP BY os.n_orders, os.n_customers, t.total_revenue_c
    """))

  // ---------------------------------------------------------------- q554

  /** MVCC version-chain vacuum sizing: treating each user's events as
    * versions of one logical row, a keep-latest-2 vacuum reclaims every
    * older version — counted per key with a key-partitioned recency
    * rank, with reclaimable bytes from the props payload (+16 bytes of
    * row header). The VACUUM cost/benefit readout (chains needing work,
    * bytes returned) that schedules compaction; q61 keeps the latest
    * version, this prices deleting the rest.
    *
    * Scale shape: the rank is partitioned by user key (the table's
    * natural key, bounded per key); two keyed folds to a one-row
    * census. */
  private val q554 = QueryDef(
    "q554_version_chain_vacuum",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val ranked = Tables.events(spark, dir)
        .select(col("user_id"), epochS(col("ts")).as("ts_s"), col("event_id"),
          (length(col("props")) + 16L).cast("long").as("bytes"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts_s").desc, col("event_id").desc)))
      val perKey = ranked.groupBy(col("user_id"))
        .agg(count(lit(1)).as("versions"), sum(col("bytes")).as("bytes"),
          sum(when(col("rk") > 2, col("bytes")).otherwise(0L)).as("old_bytes"),
          sum(when(col("rk") > 2, 1L).otherwise(0L)).as("old_versions"))
      perKey.agg(count(lit(1)).as("n_keys"),
          sum(when(col("versions") > 2L, 1L).otherwise(0L)).as("keys_to_vacuum"),
          sum(col("versions")).as("total_versions"),
          sum(col("old_versions")).as("reclaimable_versions"),
          sum(col("bytes")).as("total_bytes"),
          sum(col("old_bytes")).as("reclaimable_bytes"))
        .select(col("n_keys"), col("keys_to_vacuum"), col("total_versions"),
          col("reclaimable_versions"), col("total_bytes"),
          col("reclaimable_bytes"),
          expr("reclaimable_bytes * 1000000 div total_bytes")
            .as("reclaim_ppm"))
    },
    Some("""
      WITH ranked AS (
        SELECT user_id, CAST(len(props) + 16 AS BIGINT) AS bytes,
          row_number() OVER (PARTITION BY user_id
            ORDER BY epoch_ms(ts) // 1000 DESC, event_id DESC) AS rk
        FROM events),
      perkey AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS versions,
          CAST(sum(bytes) AS BIGINT) AS bytes,
          CAST(sum(CASE WHEN rk > 2 THEN bytes ELSE 0 END) AS BIGINT)
            AS old_bytes,
          CAST(sum(CASE WHEN rk > 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS old_versions
        FROM ranked GROUP BY user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
        CAST(sum(CASE WHEN versions > 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS keys_to_vacuum,
        CAST(sum(versions) AS BIGINT) AS total_versions,
        CAST(sum(old_versions) AS BIGINT) AS reclaimable_versions,
        CAST(sum(bytes) AS BIGINT) AS total_bytes,
        CAST(sum(old_bytes) AS BIGINT) AS reclaimable_bytes,
        CAST(sum(old_bytes) * 1000000 // sum(bytes) AS BIGINT) AS reclaim_ppm
      FROM perkey
    """))

  def defs: Seq[QueryDef] = Seq(q552, q553, q554)
}
