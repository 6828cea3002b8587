package graft.queries

import graft.Tables

/** Round-12 engine surface: Spark 4's recursive CTE (`WITH RECURSIVE`,
  * new in Spark 4.0) driving a genuinely sequential computation — the
  * class of logic (state feeding nonlinearly into the next step) that
  * windows cannot express and that the repo's unrolled-loop queries
  * (q374/q402/q477) hand-build; the recursion is the declarative form.
  */
object EngineSurfacePlanQueries6 extends QueryGroup {

  // ---------------------------------------------------------------- q745

  /** Recursive-CTE inventory simulation: monthly 1995 demand folds from
    * lineitem; stock starts at 2× average monthly demand; each month
    * ships min(stock, demand), loses the shortfall, and places a
    * 2×-average reorder (arriving next month) whenever the month ends
    * below one average. The carryover is max/min/CASE on the previous
    * month's state — NOT window-expressible — so the 12-step recursion
    * is the honest declarative form, and a LINEAR one (one row per
    * step; no walk explosion, the trap that makes recursive closure on
    * a cyclic graph blow up under UNION ALL).
    *
    * Scale shape: the one corpus-scale operation is the demand fold
    * (map-side combined group-by to 12 rows), materialized ONCE with
    * an eager localCheckpoint before the recursion — Spark's recursive
    * step re-executes its whole subtree on every iteration, so an inline
    * demand CTE would re-scan the fact table 12 times (measured:
    * 4.3 s → 0.3 s solo at sf0.1); the recursion then iterates 12
    * times over one row joined to the 12 checkpointed rows. At 100 TB
    * the recursion cost is unchanged — dimension-sized by
    * construction. */
  private val q745 = QueryDef(
    "q745_recursive_inventory_sim",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
        .select(expr("CAST(month(l_shipdate) AS BIGINT)").as("m"),
          expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
        .groupBy(col("m")).agg(sum(col("q")).as("d"))
        .localCheckpoint(true)
        .createOrReplaceTempView("graft_q745_demand")
      spark.sql("""
        WITH RECURSIVE
        demand AS (SELECT m, d FROM graft_q745_demand),
        init AS (SELECT CAST(sum(d) div 12 AS BIGINT) AS avg_d FROM demand),
        rec(m, stock_start, shipped, lost, stock_end, on_order) AS (
          SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 CAST(0 AS BIGINT), 2 * avg_d, CAST(0 AS BIGINT)
          FROM init
          UNION ALL
          SELECT d.m,
            r.stock_end + r.on_order,
            least(r.stock_end + r.on_order, d.d),
            d.d - least(r.stock_end + r.on_order, d.d),
            r.stock_end + r.on_order - least(r.stock_end + r.on_order, d.d),
            CASE WHEN r.stock_end + r.on_order
                      - least(r.stock_end + r.on_order, d.d) < i.avg_d
                 THEN i.avg_d * 2 ELSE CAST(0 AS BIGINT) END
          FROM rec r JOIN demand d ON d.m = r.m + 1 CROSS JOIN init i
          WHERE r.m < 12)
        SELECT m, stock_start, shipped, lost, stock_end, on_order
        FROM rec WHERE m >= 1 ORDER BY m
      """)
    },
    Some("""
      WITH RECURSIVE
      demand AS MATERIALIZED (
        SELECT CAST(month(l_shipdate) AS BIGINT) AS m,
          CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS d
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY 1),
      init AS MATERIALIZED (
        SELECT CAST(sum(d) // 12 AS BIGINT) AS avg_d FROM demand),
      rec(m, stock_start, shipped, lost, stock_end, on_order) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), 2 * avg_d, CAST(0 AS BIGINT)
        FROM init
        UNION ALL
        SELECT d.m,
          r.stock_end + r.on_order,
          least(r.stock_end + r.on_order, d.d),
          d.d - least(r.stock_end + r.on_order, d.d),
          r.stock_end + r.on_order - least(r.stock_end + r.on_order, d.d),
          CASE WHEN r.stock_end + r.on_order
                    - least(r.stock_end + r.on_order, d.d) < i.avg_d
               THEN i.avg_d * 2 ELSE CAST(0 AS BIGINT) END
        FROM rec r JOIN demand d ON d.m = r.m + 1 CROSS JOIN init i
        WHERE r.m < 12)
      SELECT m, stock_start, shipped, lost, stock_end, on_order
      FROM rec WHERE m >= 1 ORDER BY m
    """))

  // ---------------------------------------------------------------- q751

  /** SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN`):
    * a scalar UDF (`graft_band`: log₂ price band via the exact bin()
    * bit-length trick) and a TABLE function (`graft_band_bounds`: the
    * [2^(b−1), 2^b) boundary table, generated — not stored) drive an
    * order-value band census. The point is the abstraction is FREE:
    * SQL UDFs inline into the plan and stay inside whole-stage codegen
    * (unlike a JVM/Python UDF, which walls off the operator), so the
    * reusable definition costs nothing at 100 TB. DuckDB's twin is
    * `CREATE MACRO` / `CREATE MACRO ... AS TABLE`; the gate oracle
    * inlines the same expressions (compare.py DESCRIBEs the oracle, so
    * it must stay a single statement).
    *
    * Scale shape: one orders scan folding to ≤ ~40 band rows; the
    * bounds table is generated (≤ 62 rows) and broadcast. */
  private val q751 = QueryDef(
    "q751_sql_udf_band_census",
    (spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q751_ord")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_band(v BIGINT)
        RETURNS BIGINT RETURN CAST(length(bin(v)) AS BIGINT)""")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_share_ppm(
        a BIGINT, b BIGINT) RETURNS BIGINT RETURN a * 1000000 div b""")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_band_bounds(
          maxb BIGINT) RETURNS TABLE(band BIGINT, lo BIGINT, hi BIGINT)
        RETURN SELECT i AS band,
          shiftleft(CAST(1 AS BIGINT), CAST(i - 1 AS INT)) AS lo,
          shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)) - 1 AS hi
        FROM (SELECT explode(sequence(CAST(1 AS BIGINT), maxb)) AS i)""")
      spark.sql("""
        WITH cents AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
          FROM graft_q751_ord),
        census AS (
          SELECT graft_band(v) AS band, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(v) AS BIGINT) AS mass
          FROM cents GROUP BY 1),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM census)
        SELECT c.band, b.lo AS band_lo_cents, b.hi AS band_hi_cents,
          c.n, c.mass, graft_share_ppm(c.n, t.nt) AS share_ppm
        FROM census c JOIN graft_band_bounds(CAST(62 AS BIGINT)) b
          ON b.band = c.band
        CROSS JOIN tot t
        ORDER BY c.band
      """)
    },
    Some("""
      WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders),
      census AS (
        SELECT CAST(len(bin(v)) AS BIGINT) AS band,
          CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS mass
        FROM cents GROUP BY 1),
      bounds AS (
        SELECT CAST(i AS BIGINT) AS band,
          CAST(1 AS BIGINT) << CAST(i - 1 AS INTEGER) AS lo,
          (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) - 1 AS hi
        FROM (SELECT unnest(range(1, 63)) AS i)),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM census)
      SELECT c.band, b.lo AS band_lo_cents, b.hi AS band_hi_cents,
        c.n, c.mass,
        CAST(c.n * 1000000 // t.nt AS BIGINT) AS share_ppm
      FROM census c JOIN bounds b ON b.band = c.band
      CROSS JOIN tot t
      ORDER BY c.band
    """))

  override def defs: Seq[QueryDef] = Seq(q745, q751)
}
