package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.{cents, epochS}

/** Round-4 closing block of classic TPC-H decision-support shapes not yet
  * in the inventory (Q2 correlated-min supplier selection, Q4 EXISTS
  * priority check, Q7 two-nation volume shipping, Q9 product-profit
  * decomposition, Q10 returned-item reporting), each adapted to this
  * dataset's schema (no partsupp/commit-date/shipmode: lineitem plays the
  * part-supplier offer relation, ship lag plays the lateness signal).
  *
  * All money math follows the repo convention — exact integer cents /
  * 1e-4-dollar units summed in 64-bit, one IEEE division at the end — so
  * the DuckDB hash compare is byte-exact (see Deterministic).
  */
object TpchQueries extends QueryGroup {

  /** Revenue in exact 1e-4-dollar units: cents(price) × (100−cents(disc)). */
  private def revE4(price: String, disc: String) =
    cents(col(price)) * (lit(100L) - cents(col(disc)))

  private val revE4Sql =
    "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))"

  /** Integral quantity as a long (values are whole numbers stored as
    * double; round-half-up matches both engines bit-exactly). */
  private def qtyL = floor(col("l_quantity") + 0.5).cast("long")
  private val qtyLSql = "CAST(floor(l_quantity + 0.5) AS BIGINT)"

  // ---------------------------------------------------------------- q359

  /** TPC-H Q2's shape (minimum-cost supplier): for mid-size STANDARD
    * parts, find the EUROPE supplier(s) whose best historical unit price
    * (milli-cents, exact integer division of line price by integral
    * quantity) equals the part's minimum across all EUROPE suppliers.
    * This dataset has no partsupp, so lineitem is the offer relation.
    *
    * Scale shape: the textbook correlated `ps_supplycost = (SELECT
    * min(..))` is decorrelated into groupBy(part)→min + an equality
    * join-back — two shuffles on l_partkey, both AQE-coalescible; the
    * supplier/nation/region dimension chain collapses to ONE broadcast
    * before it touches the fact table, so region pruning happens
    * map-side and the offers that leave the scan are already
    * EUROPE-only. No correlated rescan, no cartesian. */
  private val q359 = QueryDef(
    "q359_tpch_q2_min_cost_supplier",
    (spark, dir) => {
      val eur = Tables.supplier(spark, dir)
        .join(
          Tables.nation(spark, dir)
            .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"),
          cents(col("s_acctbal")).as("bal_c"), col("n_name"))
      val offers = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * lit(1000L)).as("price_mc"), qtyL.as("qty"))
        .withColumn("unit_mc", expr("price_mc div qty"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("unit_mc")).as("offer_mc"))
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      val best = offers.groupBy(col("l_partkey").as("bp"))
        .agg(min(col("offer_mc")).as("best_mc"))
      offers
        .join(best, col("l_partkey") === col("bp") && col("offer_mc") === col("best_mc"))
        .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_name"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("bal_c"), col("offer_mc"))
        .orderBy(col("bal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    Some(s"""
      WITH eur AS (
        SELECT s_suppkey, s_name,
          CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS bal_c, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      offer AS (
        SELECT l_partkey, l_suppkey,
          min((CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * 1000)
              // $qtyLSql) AS offer_mc
        FROM lineitem GROUP BY 1, 2),
      eo AS (
        SELECT l_partkey, offer_mc, s_name, bal_c, n_name
        FROM offer JOIN eur ON l_suppkey = s_suppkey),
      best AS (SELECT l_partkey AS bp, min(offer_mc) AS best_mc FROM eo GROUP BY 1)
      SELECT p_partkey, p_name, s_name, n_name, bal_c, offer_mc
      FROM eo
      JOIN best ON eo.l_partkey = best.bp AND eo.offer_mc = best.best_mc
      JOIN part ON eo.l_partkey = p_partkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      ORDER BY bal_c DESC, n_name, s_name, p_partkey
      LIMIT 100
    """))

  // ---------------------------------------------------------------- q360

  /** TPC-H Q4's shape (order-priority checking): orders placed in
    * 1997Q1 where at least one line shipped more than 60 days after the
    * order date (the dataset has no commitdate; ship lag is the
    * lateness signal), counted per priority.
    *
    * Scale shape: EXISTS becomes a LEFT SEMI join on l_orderkey with
    * the lag predicate as the join residual — one pass over each table,
    * no DISTINCT materialization of the lineitem side. The lineitem
    * scan is pre-filtered to l_shipdate ≥ window-start + 60 d (implied
    * by the residual, but stated explicitly so it reaches the parquet
    * scan as a pushed filter — the optimizer cannot derive it across
    * the join). */
  private val q360 = QueryDef(
    "q360_tpch_q4_priority_check",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1997-01-01" && col("o_orderdate") < "1997-04-01")
        .select(col("o_orderkey"), col("o_orderpriority"),
          epochS(col("o_orderdate")).as("od_s"))
      val late = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1997-03-02") // 1997-01-01 + 60 d: implied bound, pushed to the scan
        .select(col("l_orderkey"), epochS(col("l_shipdate")).as("ship_s"))
      o.join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("ship_s") > col("od_s") + lit(60L * 86400L),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND epoch_ms(l_shipdate) // 1000
                > epoch_ms(o_orderdate) // 1000 + 60*86400)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  // ---------------------------------------------------------------- q361

  /** TPC-H Q7's shape (volume shipping between two nations): revenue of
    * lines shipped in 1995–1996 where the supplier sits in NATION_1 and
    * the customer in NATION_2 or vice versa, by (supp, cust, year).
    *
    * Scale shape: the nation predicate is pushed INTO both dimension
    * sides before they touch a fact table — supplier shrinks to 2/25 of
    * nations and broadcasts; customer shrinks the same way before the
    * orders join, so the o_custkey shuffle carries only candidate
    * orders. The OR-of-directions filter runs after both cheap joins on
    * an already-tiny row set. One wide shuffle total (orders ⋈ filtered
    * customers), everything else broadcast or local. */
  private val q361 = QueryDef(
    "q361_tpch_q7_volume_shipping",
    (spark, dir) => {
      val nations = Tables.nation(spark, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(spark, dir)
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(spark, dir)
        .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          revE4("l_extendedprice", "l_discount").as("rev_e4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum(col("rev_e4")).cast("double") / lit(10000d)).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""
      SELECT supp_nation, cust_nation, l_year,
        CAST(sum(rev_e4) AS DOUBLE)/10000 AS revenue
      FROM (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          year(l_shipdate) AS l_year, $revE4Sql AS rev_e4
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year
    """))

  // ---------------------------------------------------------------- q362

  /** TPC-H Q9's shape (product-type profit): per supplier nation and
    * order year, profit on 'bolt' parts — revenue minus quantity ×
    * retail cost (no partsupp: p_retailprice is the unit-cost proxy).
    * Profit stays in exact 1e-4-dollar integers until the final
    * division; lines can be individually negative, which exercises the
    * signed-sum path.
    *
    * Scale shape: part (name-filtered) and supplier⋈nation both
    * broadcast; orders joins on l_orderkey co-partitioned with the
    * revenue agg's keying. One fact shuffle, vocabulary-sized output
    * (25 nations × 7 years). */
  private val q362 = QueryDef(
    "q362_tpch_q9_product_profit",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
        .filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"), cents(col("p_retailprice")).as("cost_c"))
      val supN = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revE4("l_extendedprice", "l_discount").as("rev_e4"), qtyL.as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg((sum(col("rev_e4") - col("qty") * col("cost_c") * lit(100L))
          .cast("double") / lit(10000d)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""
      SELECT nation, o_year, CAST(sum(profit_e4) AS DOUBLE)/10000 AS sum_profit
      FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
          $revE4Sql
            - $qtyLSql * CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) * 100
            AS profit_e4
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%bolt%')
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC
    """))

  // ---------------------------------------------------------------- q363

  /** TPC-H Q10's shape (returned-item reporting): customers ranked by
    * revenue lost to returns (l_returnflag = 'R') on orders placed in
    * 1998Q1, with their nation — the churn-risk shortlist.
    *
    * Scale shape: the quarter filter prunes orders at the scan; the
    * orderkey join carries only that quarter's lines; nation broadcasts
    * onto the final customer-keyed agg. TakeOrderedAndProject caps the
    * driver at 20 rows. */
  private val q363 = QueryDef(
    "q363_tpch_q10_returned_items",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1998-01-01" && col("o_orderdate") < "1998-04-01")
        .select(col("o_orderkey"), col("o_custkey"))
      val rev = Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revE4("l_extendedprice", "l_discount").as("rev_e4"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_e4")).as("lost_e4"))
      rev
        .join(Tables.customer(spark, dir)
          .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            cents(col("c_acctbal")).as("bal_c")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("bal_c"),
          (col("lost_e4").cast("double") / lit(10000d)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      WITH lost AS (
        SELECT o_custkey, sum($revE4Sql) AS lost_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1998-04-01'
        GROUP BY o_custkey)
      SELECT c_custkey, c_name, n_name,
        CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c,
        CAST(lost_e4 AS DOUBLE)/10000 AS revenue
      FROM lost
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """))

  // ---------------------------------------------------------------- q364

  /** TPC-H Q11's shape (important stock): per part, the "stock value"
    * held by NATION_3 suppliers (line price as the value proxy — no
    * partsupp), keeping only parts whose value exceeds 0.1% of the
    * nation's total. The global threshold is a one-row broadcast
    * aggregate cross-joined onto the per-part totals (q64's sanctioned
    * pattern — no driver collect, no second scan of the raw fact), and
    * the comparison is exact integer cross-multiplication:
    * value_c × 1000 > total_c. */
  private val q364 = QueryDef(
    "q364_tpch_q11_important_stock",
    (spark, dir) => {
      val sup3 = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey"), cents(col("l_extendedprice")).as("val_c"))
        .join(broadcast(sup3), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("val_c")).as("value_c"))
      val total = perPart.agg(sum(col("value_c")).as("total_c"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_c") * lit(1000L) > col("total_c"))
        .select(col("l_partkey").as("p_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("p_partkey"))
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey AS p_partkey,
          sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS value_c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1)
      SELECT p_partkey, CAST(value_c AS BIGINT) AS value_c
      FROM per_part
      WHERE value_c * 1000 > (SELECT sum(value_c) FROM per_part)
      ORDER BY value_c DESC, p_partkey
    """))

  // ---------------------------------------------------------------- q365

  /** TPC-H Q12's shape (shipping-mode priority): the dataset has no
    * l_shipmode, so ship-lag bands play the mode — FAST (≤ 30 d from
    * order to ship) vs SLOW (> 90 d). For lines shipped in 1996, count
    * critical-priority (1-URGENT/2-HIGH) and other orders per band —
    * the "does slow shipping starve urgent orders" audit.
    *
    * Scale shape: one orderkey join (date filter pushed to the lineitem
    * scan), band + priority classification as codegen'd CASE chains,
    * two-row output. */
  private val q365 = QueryDef(
    "q365_tpch_q12_ship_lag_priority",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          epochS(col("o_orderdate")).as("od_s"))
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select(col("l_orderkey"), epochS(col("l_shipdate")).as("ship_s"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("band",
          when(col("ship_s") - col("od_s") <= lit(30L * 86400L), "FAST")
            .when(col("ship_s") - col("od_s") > lit(90L * 86400L), "SLOW"))
        .filter(col("band").isNotNull)
        .withColumn("critical",
          when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
        .groupBy(col("band"))
        .agg(sum(col("critical")).as("high_line_count"),
          sum(lit(1L) - col("critical")).as("low_line_count"))
        .orderBy(col("band"))
    },
    Some("""
      SELECT band, CAST(sum(critical) AS BIGINT) AS high_line_count,
        CAST(sum(1 - critical) AS BIGINT) AS low_line_count
      FROM (
        SELECT CASE
            WHEN epoch_ms(l_shipdate)//1000 - epoch_ms(o_orderdate)//1000
                 <= 30*86400 THEN 'FAST'
            WHEN epoch_ms(l_shipdate)//1000 - epoch_ms(o_orderdate)//1000
                 > 90*86400 THEN 'SLOW' END AS band,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS critical
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01')
      WHERE band IS NOT NULL
      GROUP BY band
      ORDER BY band
    """))

  // ---------------------------------------------------------------- q366

  /** TPC-H Q14's shape (promotion effect): the share of September-1997
    * shipped revenue carried by PROMO-type parts, as an exact
    * parts-per-million integer plus both exact revenue legs — a single
    * conditional aggregate row, no threshold join.
    *
    * Scale shape: part's (key → is-promo) projection broadcasts; the
    * month filter prunes the fact scan; ONE aggregate produces both
    * legs (no two-pass "promo then total"). */
  private val q366 = QueryDef(
    "q366_tpch_q14_promo_share",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
        .select(col("l_partkey"), revE4("l_extendedprice", "l_discount").as("rev_e4"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("is_promo"), col("rev_e4")).otherwise(0L)).as("promo_e4"),
          sum(col("rev_e4")).as("total_e4"))
        .select(
          (col("promo_e4").cast("double") / lit(10000d)).as("promo_revenue"),
          (col("total_e4").cast("double") / lit(10000d)).as("total_revenue"),
          expr("promo_e4 * 1000000 div total_e4").as("promo_ppm"))
    },
    Some(s"""
      SELECT CAST(promo_e4 AS DOUBLE)/10000 AS promo_revenue,
        CAST(total_e4 AS DOUBLE)/10000 AS total_revenue,
        CAST(promo_e4 * 1000000 // total_e4 AS BIGINT) AS promo_ppm
      FROM (
        SELECT sum(CASE WHEN p_type = 'PROMO' THEN $revE4Sql
                        ELSE CAST(0 AS BIGINT) END) AS promo_e4,
          sum($revE4Sql) AS total_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01')
    """))

  // ---------------------------------------------------------------- q367

  /** TPC-H Q15's shape (top supplier): the supplier(s) whose 1996Q1
    * shipped revenue equals the global maximum — the classic
    * view + `= (SELECT max(...))` pattern, decorrelated into a one-row
    * broadcast max cross-joined onto the per-supplier totals.
    *
    * Scale shape: one supplier-keyed agg over the quarter's lines, a
    * one-row broadcast, a vocabulary-sized name join. Revenue compared
    * in exact 1e-4 integers — float ties can't split the max. */
  private val q367 = QueryDef(
    "q367_tpch_q15_top_supplier",
    (spark, dir) => {
      val perSup = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .select(col("l_suppkey"), revE4("l_extendedprice", "l_discount").as("rev_e4"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev_e4")).as("total_e4"))
      val top = perSup.agg(max(col("total_e4")).as("max_e4"))
      perSup.crossJoin(broadcast(top))
        .filter(col("total_e4") === col("max_e4"))
        .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_e4").cast("double") / lit(10000d)).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""
      WITH revenue AS (
        SELECT l_suppkey, sum($revE4Sql) AS total_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(total_e4 AS DOUBLE)/10000 AS total_revenue
      FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_e4 = (SELECT max(total_e4) FROM revenue)
      ORDER BY s_suppkey
    """))

  // ---------------------------------------------------------------- q368

  /** TPC-H Q17's shape (small-quantity-order revenue): revenue locked
    * in Brand#1 lines whose quantity is below 20% of that part's average
    * — the correlated-average shape, decorrelated into a per-part
    * (count, sum) aggregate joined back, with the 20%-of-average test
    * as exact cross-multiplication: qty × 5 × n < sum_qty.
    *
    * Scale shape: the brand filter broadcasts into both the aggregate
    * and the probe, so only Brand#1 lines shuffle; the join-back is
    * part-keyed (same key as the agg — AQE coalesces). Output: one row
    * (line count + total revenue / 7 per TPC-H's yearly-average
    * convention, both exact). */
  private val q368 = QueryDef(
    "q368_tpch_q17_small_qty_revenue",
    (spark, dir) => {
      val brand = Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val li = Tables.lineitem(spark, dir)
        .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), qtyL.as("qty"),
          cents(col("l_extendedprice")).as("price_c"))
      val perPart = li.groupBy(col("l_partkey").as("pp"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
      li.join(perPart, col("l_partkey") === col("pp"))
        .filter(col("qty") * lit(5L) * col("n") < col("sum_qty"))
        .agg(count(lit(1)).as("n_small_lines"), sum(col("price_c")).as("sum_c"))
        .select(col("n_small_lines"),
          (col("sum_c").cast("double") / lit(100d) / lit(7d)).as("avg_yearly"))
    },
    Some("""
      WITH li AS (
        SELECT l_partkey, CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'),
      per_part AS (
        SELECT l_partkey AS pp, CAST(count(*) AS BIGINT) AS n,
          sum(qty) AS sum_qty
        FROM li GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
        CAST(sum(price_c) AS DOUBLE)/100/7 AS avg_yearly
      FROM li JOIN per_part ON l_partkey = pp
      WHERE qty * 5 * n < sum_qty
    """))

  // ---------------------------------------------------------------- q369

  /** TPC-H Q18's shape (large-volume orders): orders whose total line
    * quantity exceeds 250 units, with the buying customer — the
    * HAVING-on-sum semi-join against a detail aggregate.
    *
    * Scale shape: the quantity HAVING runs as ONE orderkey-keyed agg
    * (map-side partial combine shrinks 7 lines/order before the
    * shuffle); the surviving ~0.3% of orders then join orders/customer.
    * TakeOrderedAndProject caps the result at 100. */
  private val q369 = QueryDef(
    "q369_tpch_q18_large_orders",
    (spark, dir) => {
      val big = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), qtyL.as("qty"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("qty")).as("sum_qty"))
        .filter(col("sum_qty") > 250L)
      big
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            epochS(col("o_orderdate")).as("od_s"), cents(col("o_totalprice")).as("price_c")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("od_s"), col("price_c"), col("sum_qty"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey,
        epoch_ms(o_orderdate) // 1000 AS od_s,
        CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_c,
        CAST(sum_qty AS BIGINT) AS sum_qty
      FROM (
        SELECT l_orderkey, sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sum_qty
        FROM lineitem GROUP BY 1 HAVING sum_qty > 250)
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY price_c DESC, o_orderkey
      LIMIT 100
    """))

  // ---------------------------------------------------------------- q370

  /** TPC-H Q19's shape (discounted revenue under disjunctive
    * brand/size/quantity predicates): three conjunctive blocks OR'd
    * together — the classic test that an engine keeps an OR-of-ANDs in
    * ONE scan instead of three passes, and pushes the part predicates
    * into the broadcast build side.
    *
    * Scale shape: part's (key, brand, size) projection broadcasts; the
    * disjunction evaluates codegen'd post-join; one conditional
    * aggregate row out. */
  private val q370 = QueryDef(
    "q370_tpch_q19_disjunct_revenue",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), qtyL.as("qty"),
          revE4("l_extendedprice", "l_discount").as("rev_e4"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("qty").between(1L, 15L)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
              col("qty").between(10L, 25L)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
              col("qty").between(20L, 35L)))
        .agg(count(lit(1)).as("n_lines"),
          (sum(col("rev_e4")).cast("double") / lit(10000d)).as("revenue"))
    },
    Some(s"""
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum($revE4Sql) AS DOUBLE)/10000 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
             AND CAST(floor(l_quantity + 0.5) AS BIGINT) BETWEEN 1 AND 15)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
             AND CAST(floor(l_quantity + 0.5) AS BIGINT) BETWEEN 10 AND 25)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
             AND CAST(floor(l_quantity + 0.5) AS BIGINT) BETWEEN 20 AND 35)
    """))

  // ---------------------------------------------------------------- q371

  /** TPC-H Q20's shape (dominant suppliers): suppliers who, for some
    * 'bolt' part, shipped MORE THAN HALF of that part's total 1997
    * quantity — the nested-aggregate EXISTS chain (partsupp availqty vs
    * half the shipped total in the original), flattened into
    * per-(part, supplier) vs per-part aggregates with an exact
    * 2·q > total comparison, then a distinct-supplier projection.
    *
    * Scale shape: the part-name filter broadcasts into the fact scan;
    * both aggregates key on l_partkey (the second reuses the first's
    * partitioning — no extra wide shuffle); dominance is an equi
    * join-back, and the final distinct runs over an already
    * supplier-sized set. */
  private val q371 = QueryDef(
    "q371_tpch_q20_dominant_suppliers",
    (spark, dir) => {
      val bolts = Tables.part(spark, dir)
        .filter(col("p_name").contains("bolt")).select(col("p_partkey"))
      val ps = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), qtyL.as("qty"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("ps_qty"))
      val tot = ps.groupBy(col("l_partkey").as("tp"))
        .agg(sum(col("ps_qty")).as("total_qty"))
      ps.join(tot, col("l_partkey") === col("tp"))
        .filter(col("ps_qty") * lit(2L) > col("total_qty"))
        .select(col("l_suppkey")).distinct()
        .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
          sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS ps_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND p_name LIKE '%bolt%'
        GROUP BY 1, 2),
      tot AS (SELECT l_partkey AS tp, sum(ps_qty) AS total_qty FROM ps GROUP BY 1)
      SELECT DISTINCT s_suppkey, s_name
      FROM ps
      JOIN tot ON l_partkey = tp
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE ps_qty * 2 > total_qty
      ORDER BY s_suppkey
    """))

  override def defs: Seq[QueryDef] =
    Seq(q359, q360, q361, q362, q363, q364, q365, q366, q367, q368,
      q369, q370, q371)
}
