package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-9 batch 8: warehouse-governance analytics — materialized-view
  * selection over the cube lattice (the Harinarayan–Rajaraman–Ullman
  * problem: which aggregates to precompute when you can't afford all of
  * them), solved EXACTLY for a 2-view budget by enumerating the bounded
  * lattice instead of greedily approximating it; and a k-map
  * re-identification audit (is a sample-unique quasi-identifier
  * combination actually population-unique? — the number that separates
  * real disclosure risk from sample-uniqueness alarmism, next to q149's
  * k-anonymity and q354's t-closeness). All exact integers.
  */
object WarehousePlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q689

  /** Exact 2-view materialization choice on the {partkey, returnflag,
    * shipyear} cube lattice: all 8 views sized in ONE cube pass
    * (grouping-set cells counted per grouping mask), every C(8,2) view
    * pair costed against the 8-query workload (a query scans the
    * smallest selected view that contains its dims, else the base
    * table), and the argmin pair reported with each query's routed
    * source and cost. HRU's greedy is the classic because real
    * lattices are exponential; at 3 dims the EXACT optimum is 28
    * candidates — enumerate, don't approximate.
    *
    * Scale shape: the cube is one hash-agg pass over lineitem (cells
    * bounded by the dim-combination count, the only corpus-sized
    * input); sizing, pairing (28 rows), costing (224 rows) and the
    * argmin all run on the 8-row view table; the winner re-joins as a
    * one-row broadcast. */
  private val q689 = QueryDef(
    "q689_view_selection_exact",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("p"), col("l_returnflag").as("f"),
          expr("CAST(year(l_shipdate) AS BIGINT)").as("y"))
      // 8-row lattice, referenced three times below (queries + both pair
      // sides): checkpoint so the cube runs once (q687's degree-table
      // pattern). r13: the cube's Expand runs over the DISTINCT
      // (p, f, y) base cells, not the raw fact — per-mask cell counts
      // are identical (distinct projections of base cells ≡ distinct
      // projections of the fact) and the 8× row multiplication applies
      // to the deduplicated cell table (guide §2.3).
      val baseCells = li.groupBy(col("p"), col("f"), col("y"))
        .agg(count(lit(1)).as("nr")).select(col("p"), col("f"), col("y"))
      val views = baseCells.cube(col("p"), col("f"), col("y"))
        .agg(grouping(col("p")).as("gp"), grouping(col("f")).as("gf"),
          grouping(col("y")).as("gy"))
        .select(expr("CAST(4 * (1 - gp) + 2 * (1 - gf) + (1 - gy) AS BIGINT)")
          .as("vm"))
        .groupBy(col("vm")).agg(count(lit(1)).as("sz"))
        .localCheckpoint(true)
      val base = li.agg(count(lit(1)).as("base_rows"))
      val queries = views.select(col("vm").as("qm"))
      val pairs = views.select(col("vm").as("vm1"), col("sz").as("s1"))
        .join(broadcast(views.select(col("vm").as("vm2"), col("sz").as("s2"))),
          col("vm1") < col("vm2"))
      val costed = pairs.crossJoin(broadcast(queries))
        .crossJoin(broadcast(base))
        .withColumn("cost", least(
          expr("CASE WHEN (qm & vm1) = qm THEN s1 ELSE base_rows END"),
          expr("CASE WHEN (qm & vm2) = qm THEN s2 ELSE base_rows END")))
      val winner = costed.groupBy(col("vm1"), col("vm2"))
        .agg(sum(col("cost")).as("total_cost"))
        .orderBy(col("total_cost"), col("vm1"), col("vm2")).limit(1)
      costed.join(broadcast(winner), Seq("vm1", "vm2"))
        .select(col("qm"), col("vm1"), col("vm2"),
          expr("CASE WHEN (qm & vm1) = qm AND (s1 <= base_rows)" +
            " AND NOT ((qm & vm2) = qm AND s2 < s1) THEN vm1" +
            " WHEN (qm & vm2) = qm AND s2 <= base_rows THEN vm2" +
            " ELSE -1 END").as("routed_to"),
          col("cost"), col("base_rows"), col("total_cost"))
        .orderBy(col("qm"))
    },
    Some("""
      WITH li AS (
        SELECT l_partkey AS p, l_returnflag AS f,
          CAST(year(l_shipdate) AS BIGINT) AS y
        FROM lineitem),
      cube_cells AS (
        SELECT CAST(4 * (1 - GROUPING(p)) + 2 * (1 - GROUPING(f))
          + (1 - GROUPING(y)) AS BIGINT) AS vm
        FROM li GROUP BY CUBE (p, f, y)),
      views AS (
        SELECT vm, CAST(count(*) AS BIGINT) AS sz
        FROM cube_cells GROUP BY vm),
      base AS (SELECT CAST(count(*) AS BIGINT) AS base_rows FROM li),
      queries AS (SELECT vm AS qm FROM views),
      pairs AS (
        SELECT a.vm AS vm1, a.sz AS s1, b.vm AS vm2, b.sz AS s2
        FROM views a JOIN views b ON a.vm < b.vm),
      costed AS (
        SELECT vm1, vm2, s1, s2, qm, base_rows,
          least(CASE WHEN (qm & vm1) = qm THEN s1 ELSE base_rows END,
                CASE WHEN (qm & vm2) = qm THEN s2 ELSE base_rows END) AS cost
        FROM pairs CROSS JOIN queries CROSS JOIN base),
      winner AS (
        SELECT vm1, vm2, CAST(sum(cost) AS BIGINT) AS total_cost
        FROM costed GROUP BY vm1, vm2
        ORDER BY total_cost, vm1, vm2 LIMIT 1)
      SELECT qm, c.vm1, c.vm2,
        CAST(CASE WHEN (qm & c.vm1) = qm AND (s1 <= base_rows)
            AND NOT ((qm & c.vm2) = qm AND s2 < s1) THEN c.vm1
          WHEN (qm & c.vm2) = qm AND s2 <= base_rows THEN c.vm2
          ELSE -1 END AS BIGINT) AS routed_to,
        CAST(cost AS BIGINT) AS cost, base_rows, total_cost
      FROM costed c JOIN winner w ON w.vm1 = c.vm1 AND w.vm2 = c.vm2
      ORDER BY qm
    """))

  // ---------------------------------------------------------------- q690

  /** k-map re-identification audit: over the quasi-identifier
    * (mktsegment, nation, $100 balance band), how many combinations are
    * unique in a 10% systematic sample (custkey ≡ 0 mod 10), and how
    * many of those are ALSO unique in the population? Sample uniqueness
    * is the alarm everyone raises; k-map precision is how often the
    * alarm is real — plus the prosecutor-risk tail (population cells of
    * size ≤ 2). Completes the disclosure panel of q149 (k-anonymity),
    * q197 (l-diversity) and q354 (t-closeness).
    *
    * Scale shape: two QI-keyed hash aggs over one customer scan
    * (population and sample counts in the same fold via a flag sum),
    * then a one-row census. */
  private val q690 = QueryDef(
    "q690_kmap_uniqueness_audit",
    (spark, dir) => {
      val qi = Tables.customer(spark, dir)
        .select(col("c_mktsegment"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal_cents"),
          when(col("c_custkey") % 10 === 0L, 1L).otherwise(0L).as("in_sample"))
        .select(col("c_mktsegment"), col("c_nationkey"),
          expr("bal_cents div 10000").as("bal_band"), col("in_sample"))
      val cells = qi.groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
        .agg(count(lit(1)).as("pop"), sum(col("in_sample")).as("samp"))
      cells.agg(
        sum(col("pop")).as("n_pop"),
        sum(col("samp")).as("n_sample"),
        count(lit(1)).as("n_cells"),
        sum(when(col("pop") === 1L, 1L).otherwise(0L)).as("pop_unique_cells"),
        sum(when(col("pop") <= 2L, 1L).otherwise(0L)).as("pop_k2_cells"),
        sum(when(col("samp") === 1L, 1L).otherwise(0L)).as("sample_unique_cells"),
        sum(when(col("samp") === 1L && col("pop") === 1L, 1L).otherwise(0L))
          .as("kmap_true_uniques"))
        .select(col("n_pop"), col("n_sample"), col("n_cells"),
          col("pop_unique_cells"), col("pop_k2_cells"),
          col("sample_unique_cells"), col("kmap_true_uniques"),
          expr("CASE WHEN sample_unique_cells > 0 THEN" +
            " kmap_true_uniques * 1000000 div sample_unique_cells" +
            " ELSE 0 END").as("kmap_precision_ppm"))
    },
    Some("""
      WITH qi AS (
        SELECT c_mktsegment, c_nationkey,
          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 10000 AS bal_band,
          CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS in_sample
        FROM customer),
      cells AS (
        SELECT c_mktsegment, c_nationkey, bal_band,
          CAST(count(*) AS BIGINT) AS pop,
          CAST(sum(in_sample) AS BIGINT) AS samp
        FROM qi GROUP BY 1, 2, 3)
      SELECT CAST(sum(pop) AS BIGINT) AS n_pop,
        CAST(sum(samp) AS BIGINT) AS n_sample,
        CAST(count(*) AS BIGINT) AS n_cells,
        CAST(sum(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS pop_unique_cells,
        CAST(sum(CASE WHEN pop <= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS pop_k2_cells,
        CAST(sum(CASE WHEN samp = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS sample_unique_cells,
        CAST(sum(CASE WHEN samp = 1 AND pop = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS kmap_true_uniques,
        CAST(CASE WHEN sum(CASE WHEN samp = 1 THEN 1 ELSE 0 END) > 0
          THEN sum(CASE WHEN samp = 1 AND pop = 1 THEN 1 ELSE 0 END)
            * 1000000 // sum(CASE WHEN samp = 1 THEN 1 ELSE 0 END)
          ELSE 0 END AS BIGINT) AS kmap_precision_ppm
      FROM cells
    """))

  override def defs: Seq[QueryDef] = Seq(q689, q690)
}
