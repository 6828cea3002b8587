package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 8: scan-layer planning — late-materialization benefit,
  * row-group sizing against zone-map pruning, and predicate evaluation
  * ordering. Each query turns exact selectivity counts into the byte/
  * evaluation cost model a columnar scan planner applies; widths are
  * schema literals, counts are measured. Exact integers with total
  * ORDER BYs for the oracle gate.
  */
object ScanPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q621

  /** Late-materialization advisor: for each candidate predicate on
    * lineitem, compare EARLY materialization (decode all 16 columns,
    * ~120 bytes/row, for every scanned row) against LATE (decode the
    * 8-byte predicate column + 8-byte row id everywhere, fetch the
    * remaining ~104 bytes only for survivors — at a 2× random-access
    * amplification, since survivor fetches are point reads where the
    * early scan streams). The crossover is pure selectivity — late
    * wins below 50% on these widths (104·2·s < 104·n) — and the
    * advisor prices it from exact counts, the decision every
    * columnar executor (and Parquet reader with filter pushdown) makes
    * per predicate.
    *
    * Scale shape: ONE lineitem scan computes all three predicate
    * selectivities as conditional sums; everything after is arithmetic
    * on a 3-row grid. */
  private val q621 = QueryDef(
    "q621_late_materialization_advisor",
    (spark, dir) => {
      val counts = Tables.lineitem(spark, dir).agg(
        count(lit(1)).as("n"),
        sum(when(col("l_shipdate") >= "1995-01-01"
          && col("l_shipdate") < "1996-01-01", 1L).otherwise(0L)).as("s_date"),
        sum(when(col("l_discount") >= 0.05, 1L).otherwise(0L)).as("s_disc"),
        sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("s_qty"))
      val grid = counts.select(col("n"), explode(expr(
        """array(named_struct('predicate', '1_shipdate_1995', 'survivors', s_date),
                 named_struct('predicate', '2_discount_ge_5pct', 'survivors', s_disc),
                 named_struct('predicate', '3_quantity_ge_25', 'survivors', s_qty))"""))
        .as("p"))
        .select(col("n"), col("p.predicate").as("predicate"),
          col("p.survivors").as("survivors"))
      grid.select(col("predicate"), col("n").as("n_rows"), col("survivors"),
          expr("survivors * 1000000 div n").as("selectivity_ppm"),
          expr("n * 120").as("early_bytes"),
          expr("n * 16 + survivors * 208").as("late_bytes"))
        .select(col("predicate"), col("n_rows"), col("survivors"),
          col("selectivity_ppm"), col("early_bytes"), col("late_bytes"),
          expr("(early_bytes - late_bytes) * 1000000 div early_bytes")
            .as("saving_ppm"),
          (col("late_bytes") < col("early_bytes")).as("late_wins"))
        .orderBy(col("predicate"))
    },
    Some("""
      WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT)
            AS s_date,
          CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
            AS s_disc,
          CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
            AS s_qty
        FROM lineitem),
      g AS (
        SELECT n, '1_shipdate_1995' AS predicate, s_date AS survivors FROM c
        UNION ALL SELECT n, '2_discount_ge_5pct', s_disc FROM c
        UNION ALL SELECT n, '3_quantity_ge_25', s_qty FROM c)
      SELECT predicate, n AS n_rows, survivors,
        CAST(survivors * 1000000 // n AS BIGINT) AS selectivity_ppm,
        CAST(n * 120 AS BIGINT) AS early_bytes,
        CAST(n * 16 + survivors * 208 AS BIGINT) AS late_bytes,
        CAST((n * 120 - (n * 16 + survivors * 208)) * 1000000 // (n * 120)
          AS BIGINT) AS saving_ppm,
        n * 16 + survivors * 208 < n * 120 AS late_wins
      FROM g ORDER BY predicate
    """))

  // ---------------------------------------------------------------- q622

  /** Row-group sizing against zone-map pruning: lay orders out sorted
    * by date, cut into row groups of G ∈ {1 000, 10 000, 100 000}
    * rows, and count the groups a one-month predicate must touch —
    * group boundaries land on day boundaries via the cumulative day
    * histogram (bin-granular, documented), so a group is touched iff
    * its [min, max] day span overlaps the month. Small groups prune
    * razor-sharp but pay per-group footer/dictionary overhead; the
    * sweep prices both terms — the parquet row-group / Iceberg
    * file-size decision made from measured density rather than
    * defaults. The unsorted baseline touches every group (zone maps
    * useless under hash layout — the q331 lesson, here priced per G).
    *
    * Scale shape: orders fold to the day histogram; group assignment
    * is a cumulative window over that calendar-bounded histogram (the
    * q82 class); readout is 3 rows. */
  private val q622 = QueryDef(
    "q622_rowgroup_sizing_sweep",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(1000L, 10000L, 100000L).toDF("g_rows")
      val byDay = Tables.orders(spark, dir)
        .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT)")
          .as("day"),
          expr("CAST(o_orderdate >= TIMESTAMP '1995-03-01'" +
            " AND o_orderdate < TIMESTAMP '1995-04-01' AS INT)").as("in_month"))
        .groupBy(col("day")).agg(count(lit(1)).as("c"),
          max(col("in_month")).cast("long").as("m"))
      val wDay = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val assigned = byDay.crossJoin(broadcast(grid))
        .withColumn("cum_before", coalesce(sum(col("c")).over(
          Window.partitionBy(col("g_rows")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        // a day's rows may straddle two groups; charge both (documented
        // bin-granular pessimism, identical in the oracle)
        .withColumn("g_first", expr("cum_before div g_rows"))
        .withColumn("g_last", expr("(cum_before + c - 1) div g_rows"))
      val touched = assigned.filter(col("m") === 1L)
        .select(col("g_rows"), explode(expr("sequence(g_first, g_last)")).as("g"))
        .groupBy(col("g_rows")).agg(countDistinct(col("g")).as("groups_touched"))
      val totals = assigned.groupBy(col("g_rows"))
        .agg(sum(col("c")).as("n_rows"),
          (max(col("g_last")) + 1L).as("n_groups"))
      totals.join(touched, Seq("g_rows"))
        .select(col("g_rows"), col("n_groups"), col("groups_touched"),
          expr("groups_touched * 1000000 div n_groups").as("touched_ppm"),
          // IO = touched groups × G rows × 8 B + per-group 4 KB footer
          expr("groups_touched * g_rows * 8 + n_groups * 4096").as("sorted_io_bytes"),
          expr("n_groups * g_rows * 8 + n_groups * 4096").as("unsorted_io_bytes"))
        .orderBy(col("g_rows"))
    },
    Some("""
      WITH grid(g_rows) AS (VALUES (CAST(1000 AS BIGINT)),
        (CAST(10000 AS BIGINT)), (CAST(100000 AS BIGINT))),
      byday AS (
        SELECT CAST(datediff('day', DATE '1992-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
          CAST(count(*) AS BIGINT) AS c,
          CAST(max(CASE WHEN o_orderdate >= TIMESTAMP '1995-03-01'
            AND o_orderdate < TIMESTAMP '1995-04-01' THEN 1 ELSE 0 END)
            AS BIGINT) AS m
        FROM orders GROUP BY 1),
      a AS (
        SELECT g_rows, day, c, m,
          coalesce(sum(c) OVER (PARTITION BY g_rows ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM byday CROSS JOIN grid),
      b AS (
        SELECT g_rows, day, c, m,
          CAST(cum_before // g_rows AS BIGINT) AS g_first,
          CAST((cum_before + c - 1) // g_rows AS BIGINT) AS g_last
        FROM a),
      touched AS (
        SELECT g_rows, CAST(count(DISTINCT g.g) AS BIGINT) AS groups_touched
        FROM b, LATERAL (SELECT unnest(range(b.g_first, b.g_last + 1)) AS g) g
        WHERE b.m = 1 GROUP BY g_rows),
      totals AS (
        SELECT g_rows, CAST(sum(c) AS BIGINT) AS n_rows,
          CAST(max(g_last) + 1 AS BIGINT) AS n_groups
        FROM b GROUP BY g_rows)
      SELECT g_rows, n_groups, groups_touched,
        CAST(groups_touched * 1000000 // n_groups AS BIGINT) AS touched_ppm,
        CAST(groups_touched * g_rows * 8 + n_groups * 4096 AS BIGINT)
          AS sorted_io_bytes,
        CAST(n_groups * g_rows * 8 + n_groups * 4096 AS BIGINT)
          AS unsorted_io_bytes
      FROM totals JOIN touched USING (g_rows) ORDER BY g_rows
    """))

  // ---------------------------------------------------------------- q623

  /** Predicate evaluation-order audit: three lineitem predicates
    * (1995 ship year, discount ≥ 5%, quantity ≥ 25) can short-circuit
    * in 6 orders; the evaluation count of order (p, q, r) is
    * N + N·sel(p) + N·sel(p∧q) — all read off the 8-cell truth cube
    * from ONE scan. Cheapest-first by marginal selectivity is the
    * textbook rule; the cube prices every order exactly (correlated
    * predicates can dethrone it, which the audit would surface), the
    * micro-decision every vectorized filter chain compiles.
    *
    * Scale shape: one scan → 8-cell cube aggregate; the 6-order grid
    * is literal arithmetic on those cells; readout is 6 rows. */
  private val q623 = QueryDef(
    "q623_predicate_order_audit",
    (spark, dir) => {
      val cube = Tables.lineitem(spark, dir)
        .select(
          when(col("l_shipdate") >= "1995-01-01"
            && col("l_shipdate") < "1996-01-01", 1L).otherwise(0L).as("a"),
          when(col("l_discount") >= 0.05, 1L).otherwise(0L).as("b"),
          when(col("l_quantity") >= 25, 1L).otherwise(0L).as("c"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"), sum(col("c")).as("sc"),
          sum(col("a") * col("b")).as("sab"),
          sum(col("a") * col("c")).as("sac"),
          sum(col("b") * col("c")).as("sbc"))
      val orders = Seq(
        ("a_b_c", "sa", "sab"), ("a_c_b", "sa", "sac"),
        ("b_a_c", "sb", "sab"), ("b_c_a", "sb", "sbc"),
        ("c_a_b", "sc", "sac"), ("c_b_a", "sc", "sbc"))
      val graded = orders.map { case (name, s1, s12) =>
        cube.select(lit(name).as("eval_order"),
          expr(s"n + $s1 + $s12").as("evaluations"))
      }.reduce(_ union _)
      val best = graded.agg(min(col("evaluations")).as("best"))
      graded.crossJoin(broadcast(best))
        .select(col("eval_order"), col("evaluations"),
          (col("evaluations") === col("best")).as("is_best"),
          expr("(evaluations - best) * 1000000 div best").as("overhead_ppm"))
        .orderBy(col("eval_order"))
    },
    Some("""
      WITH cube_ AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
          CAST(sum(c) AS BIGINT) AS sc,
          CAST(sum(a * b) AS BIGINT) AS sab,
          CAST(sum(a * c) AS BIGINT) AS sac,
          CAST(sum(b * c) AS BIGINT) AS sbc
        FROM (
          SELECT CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END AS a,
            CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS b,
            CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS c
          FROM lineitem)),
      g AS (
        SELECT 'a_b_c' AS eval_order, n + sa + sab AS evaluations FROM cube_
        UNION ALL SELECT 'a_c_b', n + sa + sac FROM cube_
        UNION ALL SELECT 'b_a_c', n + sb + sab FROM cube_
        UNION ALL SELECT 'b_c_a', n + sb + sbc FROM cube_
        UNION ALL SELECT 'c_a_b', n + sc + sac FROM cube_
        UNION ALL SELECT 'c_b_a', n + sc + sbc FROM cube_),
      best AS (SELECT CAST(min(evaluations) AS BIGINT) AS best FROM g)
      SELECT eval_order, CAST(evaluations AS BIGINT) AS evaluations,
        evaluations = best AS is_best,
        CAST((evaluations - best) * 1000000 // best AS BIGINT) AS overhead_ppm
      FROM g CROSS JOIN best ORDER BY eval_order
    """))

  override def defs: Seq[QueryDef] = Seq(q621, q622, q623)
}
