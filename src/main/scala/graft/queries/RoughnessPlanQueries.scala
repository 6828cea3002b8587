package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-9 batch 2: series-roughness and dependence-structure analytics —
  * how rough is the demand series (variogram/madogram at a lag grid, the
  * geostatistics readout), how does its variance aggregate over block
  * sizes (the aggregated-variance Hurst-exponent method: long-range
  * dependence means block variance decays SLOWER than 1/m, so naive
  * "average the days" error bars are wrong), and how do two per-customer
  * metrics co-move beyond a single correlation number (an empirical
  * copula quintile grid — the full dependence surface, seeing tail
  * dependence that q663's Blomqvist β median-split cannot). All exact
  * integers, DECIMAL(38,0)/HUGEINT internals for the quadratic sums.
  */
object RoughnessPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q670

  /** Variogram + madogram of daily revenue at lags {1,2,4,8,16} days:
    * γ(h) = mean squared difference and ν(h) = mean |difference| between
    * days h apart. Rising-with-h = trending/rough series; flat = white
    * noise; the h where it levels (the range) is the horizon beyond
    * which forecasts revert to climatology. Dollars (cents div 100) keep
    * the squared sums inside DECIMAL(38,0)/HUGEINT headroom; the
    * mean-squared column overflows BIGINT somewhere past ~sf10 (daily
    * dollars ~1e10 → squared 1e20) — q639-class SF ceiling, documented.
    *
    * Scale shape: lineitem folds once to a calendar-sized daily table;
    * the lag join is daily×5-row broadcast grid against itself
    * (calendar², still calendar-bounded); the readout is 5 rows. */
  private val q670 = QueryDef(
    "q670_variogram_madogram",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(1L, 2L, 4L, 8L, 16L).toDF("h")
      val daily = Tables.lineitem(spark, dir)
        .select(expr("CAST(l_shipdate AS DATE)").as("day"),
          cents(col("l_extendedprice")).as("c"))
        .groupBy(col("day")).agg(expr("sum(c) div 100").as("v"))
      val a = daily.crossJoin(broadcast(grid))
        .select(col("h"), col("day").as("da"), col("v").as("x"))
      val b = daily.select(col("day").as("db"), col("v").as("y"))
      a.join(b, expr("db = date_add(da, CAST(h AS INT))"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("x") - col("y"))).as("mad_total"),
          sum(expr("CAST(x - y AS DECIMAL(38,0)) * CAST(x - y AS DECIMAL(38,0))"))
            .as("sq"))
        .select(col("h"), col("n_pairs"),
          col("mad_total"),
          expr("mad_total div n_pairs").as("mean_abs_diff"),
          expr("CAST(sq div n_pairs AS BIGINT)").as("mean_sq_diff"))
        .orderBy(col("h"))
    },
    Some("""
      WITH grid(h) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
        (CAST(4 AS BIGINT)), (CAST(8 AS BIGINT)), (CAST(16 AS BIGINT))),
      daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 100 AS v
        FROM lineitem GROUP BY 1),
      pairs AS (
        SELECT h, a.v AS x, b.v AS y
        FROM daily a CROSS JOIN grid
        JOIN daily b ON b.day = a.day + CAST(h AS INTEGER))
      SELECT h, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(abs(x - y)) AS BIGINT) AS mad_total,
        CAST(sum(abs(x - y)) // count(*) AS BIGINT) AS mean_abs_diff,
        CAST(sum(CAST(x - y AS HUGEINT) * CAST(x - y AS HUGEINT))
          // count(*) AS BIGINT) AS mean_sq_diff
      FROM pairs GROUP BY h ORDER BY h
    """))

  // ---------------------------------------------------------------- q671

  /** Aggregated-variance Hurst readout: block the daily revenue series
    * into m-day blocks for m ∈ {1,2,4,8,16}, sum each block, and report
    * the sample variance of the block sums. Var ∝ m^(2H): slope 1 on the
    * log-log (H=0.5) is independence — averaging n days shrinks error
    * like 1/√n; steeper means long-range dependence and every
    * sample-size calculation on this series is optimistic. Dollars
    * domain; variance column carries the q670 SF ceiling (~sf10).
    *
    * Scale shape: one fold to the calendar-sized daily table, block ids
    * by integer division of the day index (no window), block sums and
    * the variance fold are keyed/grouping-free aggs over calendar-
    * bounded rows; DECIMAL(38,0) quadratic internals. */
  private val q671 = QueryDef(
    "q671_aggregated_variance_hurst",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(1L, 2L, 4L, 8L, 16L).toDF("m")
      val daily = Tables.lineitem(spark, dir)
        .select(expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01') AS BIGINT)")
          .as("di"),
          cents(col("l_extendedprice")).as("c"))
        .groupBy(col("di")).agg(expr("sum(c) div 100").as("v"))
      val blocks = daily.crossJoin(broadcast(grid))
        .groupBy(col("m"), expr("di div m").as("b"))
        .agg(sum(col("v")).as("bv"))
      blocks.groupBy(col("m"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("bv")).as("s1"),
          sum(expr("CAST(bv AS DECIMAL(38,0)) * CAST(bv AS DECIMAL(38,0))"))
            .as("s2"))
        .filter(col("n_blocks") > 1L)
        .select(col("m"), col("n_blocks"),
          expr("s1 div n_blocks").as("mean_block_sum"),
          expr("CAST((n_blocks * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)" +
            " div (n_blocks * (n_blocks - 1)) AS BIGINT)").as("var_block_sum"))
        .orderBy(col("m"))
    },
    Some("""
      WITH grid(m) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
        (CAST(4 AS BIGINT)), (CAST(8 AS BIGINT)), (CAST(16 AS BIGINT))),
      daily AS (
        SELECT CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
            AS BIGINT) AS di,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 100 AS v
        FROM lineitem GROUP BY 1),
      blocks AS (
        SELECT m, di // m AS b, CAST(sum(v) AS BIGINT) AS bv
        FROM daily CROSS JOIN grid GROUP BY m, di // m),
      fold AS (
        SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
          CAST(sum(bv) AS BIGINT) AS s1,
          sum(CAST(bv AS HUGEINT) * CAST(bv AS HUGEINT)) AS s2
        FROM blocks GROUP BY m)
      SELECT m, n_blocks,
        CAST(s1 // n_blocks AS BIGINT) AS mean_block_sum,
        CAST((n_blocks * s2 - CAST(s1 AS HUGEINT) * s1)
          // (n_blocks * (n_blocks - 1)) AS BIGINT) AS var_block_sum
      FROM fold WHERE n_blocks > 1 ORDER BY m
    """))

  // ---------------------------------------------------------------- q672

  /** Empirical copula quintile grid: per customer, X = order count and
    * Y = total spend dollars; rank each axis into quintiles and report
    * the 5×5 contingency with margins and lift (obs/expected ×10⁶).
    * The full dependence SURFACE — corner cells are tail dependence
    * (do the heaviest orderers also spend the most per order?), which
    * no single coefficient shows. Quintiles are histogram-granular
    * (the q663 median discipline): rank = customers strictly below the
    * value, all ties share a bucket, so both engines agree exactly.
    *
    * Scale shape: per-customer fold (customer-keyed agg), then each
    * axis builds a value-DOMAIN histogram (order counts: tiny; dollars:
    * bounded by the granulated domain, not the customer count) whose
    * cumulative window is domain-sized — never corpus-sized; bucket
    * assignment joins back on the value key; the grid folds to ≤25
    * cells plus margins. */
  private val q672 = QueryDef(
    "q672_empirical_copula_grid",
    (spark, dir) => {
      val cust = Tables.orders(spark, dir)
        .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("x"), expr("sum(c) div 100").as("y"))
      val n = cust.agg(count(lit(1)).as("n"))
      def buckets(df: org.apache.spark.sql.DataFrame, v: String, b: String) = {
        val hist = df.groupBy(col(v)).agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col(v))
          .rowsBetween(Window.unboundedPreceding, -1)
        hist.withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
          .crossJoin(broadcast(n))
          .select(col(v), least(lit(4L), expr("cum_before * 5 div n")).as(b))
      }
      val bx = buckets(cust, "x", "bx")
      val by = buckets(cust, "y", "by")
      val cells = cust.join(bx, Seq("x")).join(by, Seq("y"))
        .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("n_obs"))
      val rowm = cells.groupBy(col("bx")).agg(sum(col("n_obs")).as("n_row"))
      val colm = cells.groupBy(col("by")).agg(sum(col("n_obs")).as("n_col"))
      cells.join(rowm, Seq("bx")).join(colm, Seq("by"))
        .crossJoin(broadcast(n))
        .select(col("bx"), col("by"), col("n_obs"), col("n_row"), col("n_col"),
          expr("CAST(CAST(n_obs AS DECIMAL(38,0)) * n * 1000000" +
            " div (CAST(n_row AS DECIMAL(38,0)) * n_col) AS BIGINT)")
            .as("lift_ppm"))
        .orderBy(col("bx"), col("by"))
    },
    Some("""
      WITH cust AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
          sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS y
        FROM orders GROUP BY o_custkey),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
      hx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY x),
      bx AS (
        SELECT x, least(4, coalesce(sum(cnt) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * 5 // (SELECT n FROM nn)) AS bx
        FROM hx),
      hy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM cust GROUP BY y),
      by_ AS (
        SELECT y, least(4, coalesce(sum(cnt) OVER (ORDER BY y
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          * 5 // (SELECT n FROM nn)) AS by
        FROM hy),
      cells AS (
        SELECT bx, by, CAST(count(*) AS BIGINT) AS n_obs
        FROM cust JOIN bx USING (x) JOIN by_ USING (y)
        GROUP BY bx, by),
      rowm AS (SELECT bx, CAST(sum(n_obs) AS BIGINT) AS n_row
        FROM cells GROUP BY bx),
      colm AS (SELECT by, CAST(sum(n_obs) AS BIGINT) AS n_col
        FROM cells GROUP BY by)
      SELECT CAST(bx AS BIGINT) AS bx, CAST(by AS BIGINT) AS by, n_obs,
        n_row, n_col,
        CAST(CAST(n_obs AS HUGEINT) * (SELECT n FROM nn) * 1000000
          // (CAST(n_row AS HUGEINT) * n_col) AS BIGINT) AS lift_ppm
      FROM cells JOIN rowm USING (bx) JOIN colm USING (by)
      ORDER BY bx, by
    """))

  override def defs: Seq[QueryDef] = Seq(q670, q671, q672)
}
