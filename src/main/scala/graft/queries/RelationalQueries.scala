package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic._

/** Relational operator catalog over the TPC-H-style tables: aggregation
  * pipelines, join shapes (broadcast/shuffle/semi/anti/outer), top-k,
  * set operations, analytic window functions, rollup.
  *
  * The reference itself performs no joins (SURVEY.md §2.4) — this group
  * rounds out the engine's relational surface and is where the
  * scale-sensitive plan choices live:
  *  - dimension tables are `broadcast()` so fact scans never shuffle for
  *    the join (region/nation/supplier stay tiny at any SF; customer and
  *    orders grow, so they join shuffle-side)
  *  - revenue math is exact integer units (1e-4 dollars), summed as longs:
  *    cheap to combine map-side and order-independent
  *  - top-k is orderBy+limit → TakeOrderedAndProject (per-partition heap,
  *    no global sort)
  */
object RelationalQueries extends QueryGroup {

  /** Revenue in exact 1e-4-dollar units: cents(price) × (100−cents(disc)).
    * Fits a long far beyond 100 TB of rows per partition-sum. */
  private def revenueE4(price: String, disc: String) =
    cents(col(price)) * (lit(100L) - cents(col(disc)))

  private val revenueSql =
    "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))"

  /** TPC-H Q1 shape: full-scan grouped aggregation with exact sums. */
  private val q10 = QueryDef(
    "q10_tpch_q1_pricing_summary",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).cast("double")./(lit(100d)).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          (sum(revenueE4("l_extendedprice", "l_discount")).cast("double") / lit(10000d)).as("sum_disc_price"),
          moneyAvg(col("l_extendedprice")).as("avg_price"),
          moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
        CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
        CAST(sum($revenueSql) AS DOUBLE)/10000 AS sum_disc_price,
        (CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100)/count(*) AS avg_price,
        (CAST(sum(CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS DOUBLE)/100)/count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus
    """))

  /** Star join through 4 dimensions with broadcast hints:
    * customer⋈nation⋈region filtered to one region, aggregated per nation.
    * nation/region are broadcast — the customer scan never shuffles for
    * the join, only for the final per-nation aggregation. */
  private val q11 = QueryDef(
    "q11_star_join_broadcast",
    (spark, dir) => {
      val customer = Tables.customer(spark, dir)
      val nation = Tables.nation(spark, dir)
      val region = Tables.region(spark, dir)
      customer
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          moneySum(col("c_acctbal")).as("total_balance"))
        .orderBy("r_name", "n_name")
    },
    Some("""
      SELECT r_name, n_name, count(*) AS n_customers,
        CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS total_balance
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA','EUROPE')
      GROUP BY 1, 2 ORDER BY r_name, n_name
    """))

  /** TPC-H Q3 shape: fact⋈fact join (orders⋈lineitem, both large → shuffle
    * hash join on orderkey), revenue agg, top-10 — deterministic tie-break
    * on orderkey. */
  private val q12 = QueryDef(
    "q12_tpch_q3_shipping_priority",
    (spark, dir) => {
      val orders = Tables.orders(spark, dir).filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      val lineitem = Tables.lineitem(spark, dir).filter(col("l_shipdate") > to_timestamp(lit("1996-12-15")))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), epochS(col("o_orderdate")).as("order_epoch"), col("o_orderpriority"))
        .agg((sum(revenueE4("l_extendedprice", "l_discount")).cast("double") / lit(10000d)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, CAST(epoch_ms(o_orderdate) // 1000 AS BIGINT) AS order_epoch,
        o_orderpriority, CAST(sum($revenueSql) AS DOUBLE)/10000 AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1996-12-15'
      GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10
    """))

  /** Left-semi join (EXISTS): customers that placed a high-value order. */
  private val q13 = QueryDef(
    "q13_semi_join_exists",
    (spark, dir) => {
      val customer = Tables.customer(spark, dir)
      val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 200000)
      customer
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      ORDER BY c_custkey
    """))

  /** Left-anti join (NOT EXISTS): customers that never placed an urgent
    * order (plain "no orders at all" is empty at every SF). */
  private val q14 = QueryDef(
    "q14_anti_join_not_exists",
    (spark, dir) => {
      val urgent = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(spark, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orderless"), moneySum(col("c_acctbal")).as("balance"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_orderless,
        CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS balance
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY c_mktsegment
    """))

  /** Left-outer join with null-compensating aggregation: every order with
    * its lineitem count (0 when unmatched). */
  private val q15 = QueryDef(
    "q15_outer_join",
    (spark, dir) => {
      val orders = Tables.orders(spark, dir).filter(col("o_orderkey") % 40 === 0)
      val lineitem = Tables.lineitem(spark, dir)
      orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(
          count(col("l_linenumber")).as("n_lines"),
          coalesce(sum(cents(col("l_quantity"))), lit(0L)).cast("double")./(lit(100d)).as("total_qty"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, count(l_linenumber) AS n_lines,
        CAST(coalesce(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)), 0) AS DOUBLE)/100 AS total_qty
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey % 40 = 0
      GROUP BY 1, 2 ORDER BY o_orderkey
    """))

  /** Set operations: UNION / INTERSECT / EXCEPT (distinct semantics) over
    * nation keys reachable from customers vs suppliers. */
  private val q16 = QueryDef(
    "q16_set_operations",
    (spark, dir) => {
      val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
      val union = c.union(s).distinct().select(lit("union").as("op"), col("nationkey"))
      val inter = c.intersect(s).select(lit("intersect").as("op"), col("nationkey"))
      val minus = c.except(s).select(lit("except").as("op"), col("nationkey"))
      union.union(inter).union(minus).orderBy("op", "nationkey")
    },
    Some("""
      WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
           s AS (SELECT s_nationkey AS nationkey FROM supplier)
      SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
      UNION ALL
      SELECT 'intersect', nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
      UNION ALL
      SELECT 'except', nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
      ORDER BY op, nationkey
    """))

  /** Analytic window functions: rank / row_number / lag / running sum per
    * partition. Running sum accumulates exact cents in a deterministic
    * frame order (total order within partition via custkey tie-break). */
  private val q17 = QueryDef(
    "q17_analytic_windows",
    (spark, dir) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(spark, dir)
        .select(
          col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          lag(col("c_custkey"), 1, -1L).over(w).as("prev_custkey"),
          sum(cents(col("c_acctbal"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")./(lit(100d)).as("running_balance"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },
    Some("""
      SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          row_number() OVER w AS rn,
          rank() OVER w AS rnk,
          lag(c_custkey, 1, -1) OVER w AS prev_custkey,
          CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT))
               OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100 AS running_balance
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      ) WHERE rn <= 3 ORDER BY c_nationkey, rn
    """))

  /** Top-k: orderBy+limit → TakeOrderedAndProject (no global sort at
    * scale; per-partition heaps + single merge on the driver/final stage). */
  private val q18 = QueryDef(
    "q18_topk",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25
    """))

  /** Rollup with GROUPING() indicator — partial-total hierarchy over
    * region→nation, null keys made explicit for deterministic compare. */
  private val q19 = QueryDef(
    "q19_rollup_grouping",
    (spark, dir) => {
      val customer = Tables.customer(spark, dir)
      val nation = Tables.nation(spark, dir)
      val region = Tables.region(spark, dir)
      customer
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          grouping(col("r_name")).cast("long").as("g_region"),
          grouping(col("n_name")).cast("long").as("g_nation"),
          count(lit(1)).as("n"),
          sum(cents(col("c_acctbal"))).as("balance_cents"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("g_region"), col("g_nation"), col("n"), col("balance_cents"))
        .orderBy("g_region", "g_nation", "region", "nation")
    },
    Some("""
      SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        CAST(grouping(r_name) AS BIGINT) AS g_region,
        CAST(grouping(n_name) AS BIGINT) AS g_nation,
        count(*) AS n,
        CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS balance_cents
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY g_region, g_nation, region, nation
    """))

  /** Correlated scalar subqueries through the SQL API: customers above
    * their own nation's average balance. The above-average test is the
    * integer cross-multiplication `cents·n > sum_cents` — no division,
    * so both engines compare exactly. Catalyst decorrelates the two
    * subqueries into aggregated joins (RewriteCorrelatedScalarSubquery);
    * the executed plan is shuffle-agg + join, not a per-row loop. */
  private val q48 = QueryDef(
    "q48_correlated_subquery",
    (spark, dir) => {
      Seq("customer", "nation")
        .foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(s"graft48_$n"))
      spark.sql("""
        SELECT n_name, count(*) AS n_above
        FROM graft48_customer c JOIN graft48_nation ON c_nationkey = n_nationkey
        WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) *
              (SELECT count(*) FROM graft48_customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
            > (SELECT sum(CAST(floor(c2.c_acctbal*100 + 0.5) AS BIGINT))
               FROM graft48_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY n_name ORDER BY n_name
      """)
    },
    Some("""
      SELECT n_name, count(*) AS n_above
      FROM customer c JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) *
            (SELECT count(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(floor(c2.c_acctbal*100 + 0.5) AS BIGINT))
             FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      GROUP BY n_name ORDER BY n_name
    """))

  /** RANGE-frame analytic window: 7-day trailing revenue per priority.
    * The frame ranges over the VALUE of the day column (gaps count), not
    * row offsets — the remaining window-frame shape q17's ROWS frames
    * don't cover. Scale: the window runs over the already-aggregated
    * daily table (days × priorities rows), never the raw orders. */
  private val q49 = QueryDef(
    "q49_range_frame_window",
    (spark, dir) => {
      val daily = Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority"),
          (epochS(col("o_orderdate")) / lit(86400L)).cast("long").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      daily
        .select(col("o_orderpriority"), col("day"), col("rev_cents"),
          sum(col("rev_cents")).over(w).as("rev_7d_cents"))
        .orderBy("o_orderpriority", "day")
    },
    Some("""
      WITH daily AS (
        SELECT o_orderpriority,
          CAST(epoch_us(o_orderdate) // 1000000 // 86400 AS BIGINT) AS day,
          CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, day, rev_cents,
        CAST(sum(rev_cents) OVER (PARTITION BY o_orderpriority ORDER BY day
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev_7d_cents
      FROM daily ORDER BY o_orderpriority, day
    """))

  /** Pivot (long → wide): per-user event-type counts as columns. The
    * pivot is a single hash aggregate over (user, type) with the listed
    * pivot values — no second pass; empty cells coalesced to 0 to match
    * the oracle's FILTER counts. */
  private val q52 = QueryDef(
    "q52_pivot",
    (spark, dir) => {
      val types = Seq("view", "click", "purchase", "signup", "error")
      val wide = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
        count(*) FILTER (event_type = 'view') AS n_view,
        count(*) FILTER (event_type = 'click') AS n_click,
        count(*) FILTER (event_type = 'purchase') AS n_purchase,
        count(*) FILTER (event_type = 'signup') AS n_signup,
        count(*) FILTER (event_type = 'error') AS n_error
      FROM events GROUP BY user_id ORDER BY user_id
    """))

  /** Unpivot (wide → long): the inverse reshape, melting two numeric
    * columns into (metric, value) rows — a narrow Expand, no shuffle. */
  private val q53 = QueryDef(
    "q53_unpivot",
    (spark, dir) => {
      Tables.customer(spark, dir)
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"), cents(col("c_acctbal")).as("acctbal_cents"),
          col("c_nationkey").cast("long").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal_cents"), col("nationkey")), "metric", "value")
        .orderBy("c_custkey", "metric")
    },
    Some("""
      WITH base AS (
        SELECT c_custkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents,
          CAST(c_nationkey AS BIGINT) AS nationkey
        FROM customer WHERE c_custkey % 50 = 0)
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey, 'acctbal_cents' AS metric, acctbal_cents AS value FROM base
        UNION ALL
        SELECT c_custkey, 'nationkey', nationkey FROM base)
      ORDER BY c_custkey, metric
    """))

  /** Brand-month running shipment position: cumulative quantity shipped
    * per brand over the month calendar — the running-balance query
    * behind inventory/commitment dashboards, and the canonical
    * PARTITIONED cumulative window (contrast q122's sanctioned global
    * window: here the frame is per-brand, so it scales out).
    *
    * Scale shape: fact scan → equi-join to part on partkey (broadcast
    * when the dim fits, shuffle-hash otherwise — either is fine, the
    * planner chooses), one (brand, month) aggregate collapses the
    * corpus to brand×calendar cells, and the running sum windows over
    * those cells partitioned by brand. Month index is pure Gregorian
    * arithmetic ((year−1970)·12 + month−1), identical in both engines. */
  private val q164 = QueryDef(
    "q164_brand_month_position",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_partkey"),
          expr("""CAST((year(CAST(l_shipdate AS DATE)) - 1970) * 12
                  + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT)""").as("month"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("qty"))
      val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
      val cells = li.join(pt, li("l_partkey") === pt("p_partkey"))
        .groupBy(col("p_brand"), col("month"))
        .agg(sum(col("qty")).as("qty_shipped"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("cum_qty", sum(col("qty_shipped")).over(w))
        .orderBy(col("p_brand"), col("month"))
    },
    Some("""
      WITH cells AS (
        SELECT p_brand,
          CAST((year(CAST(l_shipdate AS DATE)) - 1970) * 12
            + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS month,
          CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty_shipped
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2)
      SELECT p_brand, month, qty_shipped,
        CAST(sum(qty_shipped) OVER (PARTITION BY p_brand ORDER BY month
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_qty
      FROM cells ORDER BY p_brand, month
    """))

  /** Hierarchical revenue shares (percent-of-parent at two levels):
    * each nation's share of its region's revenue and each region's
    * share of the total, in exact ppm — the drill-down ratio table
    * every BI hierarchy renders, done as ONE pass instead of three
    * correlated subqueries.
    *
    * Scale shape: orders → customer equi-join carries only
    * (custkey, cents); the nation/region dims broadcast; the nation
    * grid is vocabulary-sized (25), so region totals and the grand
    * total derive from it with window sums over nothing-sized data.
    * decimal(38,0) guards cents·10⁶ at the 100 TB point. */
  private val q168 = QueryDef(
    "q168_revenue_hierarchy",
    (spark, dir) => {
      val rev = Tables.orders(spark, dir)
        .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(sum(col("c")).as("rev"))
      val dims = broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
      val w = Window.partitionBy(col("r_name"))
      val wAll = Window.partitionBy()
      rev.join(dims, col("c_nationkey") === col("n_nationkey"))
        .select(col("r_name"), col("n_name"), col("rev"))
        .withColumn("region_rev", sum(col("rev")).over(w))
        .withColumn("total_rev", sum(col("rev")).over(wAll))
        .select(col("r_name"), col("n_name"), col("rev").as("revenue_cents"),
          expr("CAST(CAST(rev AS DECIMAL(38,0)) * 1000000 DIV region_rev AS BIGINT)")
            .as("share_of_region_ppm"),
          expr("CAST(CAST(region_rev AS DECIMAL(38,0)) * 1000000 DIV total_rev AS BIGINT)")
            .as("region_share_ppm"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""
      WITH rev AS (
        SELECT c_nationkey, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          AS BIGINT) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1),
      g AS (
        SELECT r_name, n_name, rev,
          sum(rev) OVER (PARTITION BY r_name) AS region_rev,
          sum(rev) OVER () AS total_rev
        FROM rev
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey)
      SELECT r_name, n_name, rev AS revenue_cents,
        CAST(CAST(rev AS HUGEINT) * 1000000 // region_rev AS BIGINT)
          AS share_of_region_ppm,
        CAST(CAST(region_rev AS HUGEINT) * 1000000 // total_rev AS BIGINT)
          AS region_share_ppm
      FROM g ORDER BY r_name, n_name
    """))

  /** Rank-distribution surfaces: `ntile` / `percent_rank` / `cume_dist`
    * — the three relative-rank window functions q17 left uncovered —
    * exercised per nation over customer balances, rolled up to a
    * 25×10 decile census (count, balance mass, rank-fraction bounds
    * per tile).
    *
    * Determinism: the window order (`c_acctbal DESC, c_custkey`) is a
    * total order, so ntile's bucket boundaries, percent_rank's
    * (rank−1)/(n−1) and cume_dist's rank/n are all tie-free; the two
    * fractions are single double divisions from exact integers —
    * the same IEEE op in both engines (n=1 partitions yield 0.0 in
    * both).
    *
    * Scale shape: the window shards by the partition key (nation); at
    * corpus scale a production run keys by a finer stratum, but the
    * per-key plan — one shuffle to the key, one sorted pass, map-side
    * rollup — is the right one at any width. */
  private val q183 = QueryDef(
    "q183_rank_surfaces",
    (spark, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(spark, dir)
        .select(col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"),
          ntile(10).over(w).cast("long").as("tile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .groupBy(col("c_nationkey"), col("tile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_cents"),
          min(col("pr")).as("min_pr"), max(col("cd")).as("max_cd"))
        .orderBy(col("c_nationkey"), col("tile"))
    },
    Some("""
      WITH r AS (
        SELECT c_nationkey,
          CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c,
          CAST(ntile(10) OVER w AS BIGINT) AS tile,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey))
      SELECT c_nationkey, tile, CAST(count(*) AS BIGINT) AS n_cust,
        CAST(sum(bal_c) AS BIGINT) AS bal_cents,
        min(pr) AS min_pr, max(cd) AS max_cd
      FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** LATERAL correlated-subquery surface: the two most recent orders of
    * each of the ten richest customers, phrased as `FROM top, LATERAL
    * (SELECT ... WHERE o_custkey = top.key ORDER BY ... LIMIT 2)` — the
    * per-row-subquery API both engines expose.
    *
    * Scale shape: Spark decorrelates the lateral LIMIT into
    * WindowGroupLimit (partial per-partition top-k heaps map-side,
    * final after one shuffle) + an equi hash join against the 10-row
    * outer — NOT a nested loop per outer row; the same plan a
    * hand-written window rank would get, which is exactly why the
    * surface is safe to expose at corpus scale. */
  private val q187 = QueryDef(
    "q187_lateral_topk",
    (spark, dir) => {
      Seq("customer", "orders")
        .foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(s"graft_$n"))
      spark.sql("""
        WITH top_cust AS (
          SELECT c_custkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c
          FROM graft_customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
        SELECT c.c_custkey, c.bal_c, l.o_orderkey, l.price_cents, l.od_s
        FROM top_cust c,
        LATERAL (
          SELECT o_orderkey,
            CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
            CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) AS od_s
          FROM graft_orders WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) l
        ORDER BY c.c_custkey, l.o_orderkey
      """)
    },
    Some("""
      WITH top_cust AS (
        SELECT c_custkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
      SELECT c.c_custkey, c.bal_c, l.o_orderkey, l.price_cents, l.od_s
      FROM top_cust c,
      LATERAL (
        SELECT o_orderkey,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
          CAST(epoch_ms(o_orderdate) // 1000 AS BIGINT) AS od_s
        FROM orders WHERE o_custkey = c.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) l
      ORDER BY c.c_custkey, l.o_orderkey
    """))

  /** NOT IN three-valued-logic surface: the classic null trap, asserted
    * as behavior. One urgent-order custkey is nulled (`nullif`), and the
    * same "customers with no urgent order" question is asked three ways:
    * `NOT IN` against the null-bearing set (UNKNOWN poisons every row —
    * count 0), `NOT IN` with nulls filtered, and `NOT EXISTS` (null-
    * immune). The last two must agree; the first must be zero. Both
    * engines implement the same SQL-standard semantics, which is the
    * point of pinning it with an oracle.
    *
    * Scale shape: Spark plans the null-aware NOT IN as a single-column
    * null-aware anti join (optimizeNullAwareAntiJoin) — a broadcast
    * hash anti join with a null-check fast path, not a nested loop;
    * the NOT EXISTS variant is an ordinary left-anti hash join. */
  private val q190 = QueryDef(
    "q190_not_in_null_trap",
    (spark, dir) => {
      Seq("customer", "orders")
        .foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(s"graft_$n"))
      spark.sql("""
        WITH urgent AS (
          SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM graft_orders
                                    WHERE o_orderpriority = '1-URGENT')) AS k
          FROM graft_orders WHERE o_orderpriority = '1-URGENT')
        SELECT
          (SELECT count(*) FROM graft_customer
           WHERE c_custkey NOT IN (SELECT k FROM urgent)) AS n_not_in_with_null,
          (SELECT count(*) FROM graft_customer
           WHERE c_custkey NOT IN (SELECT k FROM urgent WHERE k IS NOT NULL))
            AS n_not_in_filtered,
          (SELECT count(*) FROM graft_customer c
           WHERE NOT EXISTS (SELECT 1 FROM urgent u WHERE u.k = c.c_custkey))
            AS n_not_exists
      """)
    },
    Some("""
      WITH urgent AS (
        SELECT nullif(o_custkey, (SELECT min(o_custkey) FROM orders
                                  WHERE o_orderpriority = '1-URGENT')) AS k
        FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT k FROM urgent)) AS n_not_in_with_null,
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT k FROM urgent WHERE k IS NOT NULL))
          AS n_not_in_filtered,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM urgent u WHERE u.k = c.c_custkey))
          AS n_not_exists
    """))

  /** Bag-semantics set operations — the ALL variants q16's distinct set
    * ops leave out. Over the nationkey MULTISETS of customers and
    * suppliers: EXCEPT ALL keeps max(c−s, 0) copies per key, INTERSECT
    * ALL keeps min(c, s) — multiplicity arithmetic, not membership.
    * Spark: `exceptAll` / `intersectAll`; the result is re-aggregated
    * to (op, key, multiplicity) so the output stays vocabulary-sized.
    *
    * Scale shape: Spark plans both ALL variants as a count-aggregate +
    * generate(replicate) — two keyed shuffles, never a sort of the raw
    * union; multiplicities travel as longs. */
  private val q193 = QueryDef(
    "q193_bag_set_ops",
    (spark, dir) => {
      val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
      val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
      val exAll = c.exceptAll(s)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
        .select(lit("except_all").as("op"), col("nationkey"), col("multiplicity"))
      val inAll = c.intersectAll(s)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
        .select(lit("intersect_all").as("op"), col("nationkey"), col("multiplicity"))
      exAll.union(inAll).orderBy(col("op"), col("nationkey"))
    },
    Some("""
      WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
           s AS (SELECT s_nationkey AS nationkey FROM supplier),
      ex AS (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s),
      ia AS (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s)
      SELECT 'except_all' AS op, nationkey,
        CAST(count(*) AS BIGINT) AS multiplicity
      FROM ex GROUP BY 2
      UNION ALL
      SELECT 'intersect_all', nationkey, CAST(count(*) AS BIGINT)
      FROM ia GROUP BY 2
      ORDER BY op, nationkey
    """))

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): enrichment
    * where the join key is legitimately nullable and NULL must match
    * NULL — here a nullable "campaign" key (event_type with 'view'
    * nulled out, the organic-traffic cohort) joined back to its own
    * per-key dimension. A plain equi-join silently drops every organic
    * row (NULL = NULL is NULL); the null-safe form keeps them, and the
    * output proves it by asserting n_fact == dim_n per key.
    *
    * Scale shape: EqualNullSafe is still an EQUI-join predicate —
    * Spark plans a hash/sort-merge join on the null-coalesced key, not
    * a nested loop (`AffinityOpsSpec` pins the plan), so this costs
    * the same one shuffle as `=`. */
  private val q202 = QueryDef(
    "q202_null_safe_join",
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(expr("NULLIF(event_type, 'view')").as("k"),
          cents(col("value")).as("vc"))
      val dim = e.groupBy(col("k"))
        .agg(count(lit(1)).as("dim_n"), sum(col("vc")).as("dim_cents"))
        .withColumnRenamed("k", "dk")
      e.join(dim, col("k") <=> col("dk"))
        .groupBy(coalesce(col("k"), lit("organic")).as("key"))
        .agg(count(lit(1)).as("n_fact"), max(col("dim_n")).as("dim_n"),
          sum(col("vc")).as("fact_cents"))
        .withColumn("no_rows_lost", col("n_fact") === col("dim_n"))
        .orderBy(col("key"))
    },
    Some("""
      WITH e AS (
        SELECT NULLIF(event_type, 'view') AS k,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
        FROM events),
      dim AS (
        SELECT k AS dk, CAST(count(*) AS BIGINT) AS dim_n,
          CAST(sum(vc) AS BIGINT) AS dim_cents
        FROM e GROUP BY 1)
      SELECT coalesce(e.k, 'organic') AS key,
        CAST(count(*) AS BIGINT) AS n_fact,
        CAST(max(dim_n) AS BIGINT) AS dim_n,
        CAST(sum(vc) AS BIGINT) AS fact_cents,
        count(*) = max(dim_n) AS no_rows_lost
      FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.dk
      GROUP BY 1 ORDER BY key
    """))

  /** Diversity-capped top-k: the 10 highest-revenue parts of 1995 under
    * an at-most-2-per-brand constraint — the result-diversification rule
    * every retrieval/recommendation surface applies so one dominant
    * group can't monopolize the page. Two ranks compose: a per-brand
    * window keeps each brand's best 2, then a global rank takes 10 of
    * the survivors; both orders are total (revenue desc, partkey) so the
    * cut is engine-invariant.
    *
    * Scale shape: one date-pruned scan → part-sized aggregate; the
    * per-brand rank partitions by brand (parallel), and only the
    * ≤2-per-brand survivors reach the global top-10 — at the 100 TB
    * design point that final rank sees 2·|brands| rows, not |parts|. */
  private val q217 = QueryDef(
    "q217_diversified_topk",
    (spark, dir) => {
      val byPart = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey").as("partkey"), col("p_brand").as("brand"))
        .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"))
      byPart
        .withColumn("brand_rank", row_number().over(
          Window.partitionBy(col("brand"))
            .orderBy(col("revenue_cents").desc, col("partkey"))))
        .filter(col("brand_rank") <= 2)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("revenue_cents").desc, col("partkey"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("partkey").cast("long").as("partkey"),
          col("brand"), col("brand_rank").cast("long").as("brand_rank"),
          col("revenue_cents"))
        .orderBy(col("rank"))
    },
    Some("""
      WITH bp AS (
        SELECT l_partkey AS partkey, p_brand AS brand,
          CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
            AS revenue_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY 1, 2),
      br AS (
        SELECT partkey, brand, revenue_cents,
          row_number() OVER (PARTITION BY brand
            ORDER BY revenue_cents DESC, partkey) AS brand_rank
        FROM bp),
      g AS (
        SELECT partkey, brand, brand_rank, revenue_cents,
          row_number() OVER (ORDER BY revenue_cents DESC, partkey) AS rank
        FROM br WHERE brand_rank <= 2)
      SELECT CAST(rank AS BIGINT) AS rank, CAST(partkey AS BIGINT) AS partkey,
        brand, CAST(brand_rank AS BIGINT) AS brand_rank, revenue_cents
      FROM g WHERE rank <= 10 ORDER BY rank
    """))

  /** Single-pass grouped argmin via struct ordering: the cheapest
    * lineitem offer per part — price AND the supplier who made it — from
    * `min(struct(price, suppkey))`, whose lexicographic comparison makes
    * the tie policy (lowest supplier key at equal price) part of the
    * aggregate itself. The Spark-first answer to "which row attains the
    * group minimum": one codegen'd hash aggregate with map-side partial
    * combine, where the window form (row_number = 1) pays a full
    * per-group sort and the join-back form scans twice. This is the
    * argmin companion to q35's aggregate top-k.
    *
    * Scale shape: one scan, one hash aggregate keyed by part; an
    * 8-byte-pair struct is all that shuffles per group. The oracle
    * reproduces the same lexicographic min with DuckDB's struct
    * ordering — tie semantics verified, not assumed. */
  private val q220 = QueryDef(
    "q220_argmin_struct",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      Tables.lineitem(spark, dir)
        .select(col("l_partkey").cast("long").as("partkey"),
          cents(col("l_extendedprice")).as("c"),
          col("l_suppkey").cast("long").as("sk"))
        .groupBy(col("partkey"))
        .agg(min(struct(col("c"), col("sk"))).as("m"),
          count(lit(1)).as("n_offers"))
        .select(col("partkey"), col("m.sk").as("best_suppkey"),
          col("m.c").as("best_price_cents"), col("n_offers"))
        .orderBy(col("partkey"))
    },
    Some("""
      SELECT l_partkey AS partkey, m.sk AS best_suppkey,
        m.c AS best_price_cents, n_offers
      FROM (
        SELECT l_partkey,
          min({'c': CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT),
               'sk': CAST(l_suppkey AS BIGINT)}) AS m,
          CAST(count(*) AS BIGINT) AS n_offers
        FROM lineitem GROUP BY l_partkey)
      ORDER BY partkey
    """))

  def defs: Seq[QueryDef] =
    Seq(q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q48, q49, q52, q53,
      q164, q168, q183, q187, q190, q193, q202, q217, q220)
}
