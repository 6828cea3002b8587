package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.{cents, epochS}
import graft.operators.Sampling

/** Round-4 OLAP heavy shapes: the remaining classic TPC-H decision-support
  * query forms (Q21 multi-correlated self-join, Q22 anti-join against an
  * aggregate threshold, Q16 NOT-IN supplier diversity) re-expressed as
  * single-pass keyed aggregations, plus a deterministic Poisson-bootstrap
  * confidence interval — the resampling method that actually scales
  * (per-row weight vectors, map-side combined; no data replication).
  *
  * All arithmetic is engine-portable: integer cents, integer epoch
  * seconds, and doubles only as images of exact integers under identical
  * IEEE expressions on both engines.
  */
object OlapQueries extends QueryGroup {

  /** TPC-H Q21's shape (suppliers who kept waiting multi-supplier
    * orders): for finished orders touched by ≥2 suppliers where EXACTLY
    * ONE supplier shipped late (> 365 days after the order date —
    * adapted to this dataset's synthetic ship lags; the reference schema
    * has no commit/receipt dates), blame that supplier and rank by
    * blamed-order count.
    *
    * Scale shape: the textbook EXISTS + NOT-EXISTS double self-join is
    * rewritten as ONE groupBy over the order's lines — n_supp and
    * n_late_supp are distinct-counts, and when n_late_supp = 1 the
    * blamed supplier IS max(late supplier). One shuffle on l_orderkey
    * (co-partitioned with the orders join), one vocabulary-sized
    * supplier agg; the quadratic self-join never materializes. */
  private val q319 = QueryDef(
    "q319_tpch_q21_late_blame",
    (spark, dir) => {
      val lateCut = 365L * 86400L
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), epochS(col("o_orderdate")).as("o_s"))
      val perOrder = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), epochS(col("l_shipdate")).as("ship_s"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late_supp",
          when(col("ship_s") > col("o_s") + lateCut, col("l_suppkey")))
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("late_supp")).as("n_late_supp"),
          max(col("late_supp")).as("blamed"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      perOrder.groupBy(col("blamed").as("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
          Seq("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    },
    Some("""
      WITH per_order AS (
        SELECT l_orderkey,
          count(DISTINCT l_suppkey) AS n_supp,
          count(DISTINCT CASE WHEN epoch_ms(l_shipdate) // 1000
                                   > epoch_ms(o_orderdate) // 1000 + 365*86400
                              THEN l_suppkey END) AS n_late_supp,
          max(CASE WHEN epoch_ms(l_shipdate) // 1000
                        > epoch_ms(o_orderdate) // 1000 + 365*86400
                   THEN l_suppkey END) AS blamed
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey)
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM per_order JOIN supplier ON blamed = s_suppkey
      WHERE n_supp >= 2 AND n_late_supp = 1
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 25
    """))

  /** TPC-H Q22's shape (dormant capital): customers in three target
    * segments whose balance exceeds the average positive balance of
    * that population, and who placed NO order in the final year of the
    * dataset (every customer here has SOME order, so "never ordered"
    * is adapted to "dormant for the last 365 days"). Per segment:
    * customer count + total idle balance.
    *
    * Scale shape: the threshold and the cutoff are one-row aggregates
    * cross-joined (broadcast nested loop of exactly one row — q64's
    * sanctioned pattern, no driver collect); the "no recent order"
    * predicate is a left-anti join against the distinct recent
    * customer keys. The avg comparison is exact: cents(bal)·n >
    * sum_cents, all in 64-bit integers. */
  private val q320 = QueryDef(
    "q320_tpch_q22_dormant_capital",
    (spark, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
      val cust = Tables.customer(spark, dir)
        .filter(col("c_mktsegment").isin(segs: _*))
        .select(col("c_custkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("bal_c"))
      val thr = cust.filter(col("bal_c") > 0)
        .agg(sum(col("bal_c")).as("pos_sum"), count(lit(1)).as("pos_n"))
      val orders = Tables.orders(spark, dir)
        .select(col("o_custkey"), epochS(col("o_orderdate")).as("od_s"))
      val cutoff = orders.agg((max(col("od_s")) - 365L * 86400L).as("cut_s"))
      val recent = orders.crossJoin(broadcast(cutoff))
        .filter(col("od_s") >= col("cut_s"))
        .select(col("o_custkey")).distinct()
      cust.crossJoin(broadcast(thr))
        .filter(col("bal_c") * col("pos_n") > col("pos_sum"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_dormant"), sum(col("bal_c")).as("idle_cents"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      WITH cust AS (
        SELECT c_custkey, c_mktsegment,
          CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')),
      thr AS (
        SELECT CAST(sum(bal_c) AS BIGINT) AS pos_sum,
               CAST(count(*) AS BIGINT) AS pos_n
        FROM cust WHERE bal_c > 0),
      cut AS (
        SELECT max(epoch_ms(o_orderdate) // 1000) - 365*86400 AS cut_s FROM orders),
      recent AS (
        SELECT DISTINCT o_custkey FROM orders, cut
        WHERE epoch_ms(o_orderdate) // 1000 >= cut_s)
      SELECT c_mktsegment,
        CAST(count(*) AS BIGINT) AS n_dormant,
        CAST(sum(bal_c) AS BIGINT) AS idle_cents
      FROM cust, thr
      WHERE bal_c * pos_n > pos_sum
        AND c_custkey NOT IN (SELECT o_custkey FROM recent)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """))

  /** TPC-H Q16's shape (supplier diversity per part class): for each
    * (p_brand, p_size), how many DISTINCT suppliers have shipped that
    * part — excluding "complaint" suppliers (negative balance, this
    * dataset's proxy for Q16's complaint-comment scan). The part-supplier
    * link is derived from lineitem (no partsupp table here).
    *
    * Scale shape: lineitem collapses to distinct (partkey, suppkey)
    * FIRST (the only big shuffle, on partkey — and it combines
    * map-side); the exclude set is vocabulary-sized and broadcast as a
    * left-anti; part join is keyed; the final distinct-count groups a
    * vocabulary-sized (brand, size) space. */
  private val q321 = QueryDef(
    "q321_tpch_q16_supplier_diversity",
    (spark, dir) => {
      val links = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val complaints = Tables.supplier(spark, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      links
        .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(100)
    },
    Some("""
      WITH links AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      ok AS (
        SELECT l_partkey, l_suppkey FROM links
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
      SELECT p_brand, p_size,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM ok JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size
      LIMIT 100
    """))

  /** Deterministic Poisson-bootstrap 95% CI for mean order value per
    * market segment (B = 200 replicates). The multinomial bootstrap
    * cannot be distributed (it needs a global draw); the Poisson(1)
    * approximation gives each row an i.i.d. weight, so each replicate
    * is a weighted mean — the standard resampling design at cluster
    * scale. Weights come from the keyed hash (multiplier varied per
    * replicate → independent streams), inverse-CDF'd through hard-coded
    * integer thresholds (floor(CDF·2^32)) so both engines compute
    * identical integers; the tail is truncated at w = 6 (residual mass
    * 6e-4, identically on both sides).
    *
    * Scale shape: the order rows are scanned ONCE and never replicated —
    * the native bootstrap_moments aggregate computes every weight inside
    * its fused update loop (zero per-row allocation) and ships one
    * long[2B] buffer per (segment, partition), combined map-side. The B
    * replicate means then unfold from the aggregate (vocabulary-sized)
    * and the CI is order-statistics rank 5 / rank 196 of 200. */
  private val q322 = QueryDef(
    "q322_poisson_bootstrap_ci",
    (spark, dir) => {
      val B = 200
      val rows = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
          cents(col("o_totalprice")).as("v"))
      val agg = rows.groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("sum_v"),
          graft.functions.VectorAggregates
            .bootstrap_moments(col("o_orderkey"), col("v"), B).as("bm"))
      val reps = agg
        .select(col("segment"), col("n_orders"), col("sum_v"),
          posexplode(expr(
            s"zip_with(slice(bm, 1, $B), slice(bm, ${B + 1}, $B), (a, b) -> struct(a AS sw, b AS swx))"))
            .as(Seq("b0", "p")))
        .select(col("segment"), col("n_orders"), col("sum_v"),
          (col("b0") + 1).as("b"),
          (col("p.swx").cast("double") / col("p.sw").cast("double")).as("rep_mean"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("segment")).orderBy(col("rep_mean"), col("b"))))
      reps.filter(col("rk") === 5 || col("rk") === 196)
        .groupBy(col("segment"), col("n_orders"), col("sum_v"))
        .agg(min(when(col("rk") === 5, col("rep_mean"))).as("ci_lo_cents"),
          min(when(col("rk") === 196, col("rep_mean"))).as("ci_hi_cents"))
        .select(col("segment"), col("n_orders"),
          (col("sum_v").cast("double") / col("n_orders").cast("double")).as("mean_cents"),
          col("ci_lo_cents"), col("ci_hi_cents"))
        .orderBy(col("segment"))
    },
    Some("""
      WITH rows_v AS (
        SELECT c_mktsegment AS segment, o_orderkey,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey),
      weighted AS (
        SELECT segment, v, b,
          CASE
            WHEN h < 1580030168 THEN 0
            WHEN h < 3160060337 THEN 1
            WHEN h < 3950075421 THEN 2
            WHEN h < 4213413783 THEN 3
            WHEN h < 4279248373 THEN 4
            WHEN h < 4292415291 THEN 5
            ELSE 6 END AS w
        FROM (
          SELECT segment, v, b,
            ((o_orderkey % 2147483648) * (2654435761 + 2*b)) % 4294967296 AS h
          FROM rows_v, generate_series(1, 200) g(b))),
      reps AS (
        SELECT segment, b,
          CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS rep_mean
        FROM weighted GROUP BY segment, b),
      ranked AS (
        SELECT segment, rep_mean,
          row_number() OVER (PARTITION BY segment ORDER BY rep_mean, b) AS rk
        FROM reps),
      base AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
          CAST(sum(v) AS BIGINT) AS sum_v
        FROM rows_v GROUP BY segment)
      SELECT base.segment, n_orders,
        CAST(sum_v AS DOUBLE) / CAST(n_orders AS DOUBLE) AS mean_cents,
        min(CASE WHEN rk = 5 THEN rep_mean END) AS ci_lo_cents,
        min(CASE WHEN rk = 196 THEN rep_mean END) AS ci_hi_cents
      FROM base JOIN ranked ON base.segment = ranked.segment
      WHERE rk = 5 OR rk = 196
      GROUP BY base.segment, n_orders, sum_v
      ORDER BY base.segment
    """))

  override def defs: Seq[QueryDef] = Seq(q319, q320, q321, q322)
}
