package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 2: bipartite/acyclic join structure — butterfly
  * (2×2-biclique) counting on the order–supplier incidence graph, and a
  * Yannakakis semi-join-reduction audit on the region→nation→customer→
  * orders chain. Both are exact-counting plans whose working sets are
  * aggregates (co-occurrence weights, per-relation row counts), never
  * materialized join products.
  */
object BipartitePlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q603

  /** Butterfly (2×2 biclique) census on the bipartite order–supplier
    * graph: two suppliers co-appearing on w orders form C(w, 2)
    * butterflies, the bipartite analogue of the triangle — the motif
    * behind bipartite clustering, co-purchase recommendation strength,
    * and fraud-ring detection (dense 2×2 blocks = coordinated
    * behavior). Census by log₂(butterflies)-bucket of supplier pairs
    * plus the global count.
    *
    * Scale shape: the only corpus-sized step is the distinct (order,
    * supplier) projection; pair weights come from the standard wedge
    * aggregation (bounded by the supplier-pair grid, the q590 family's
    * working set); butterflies are priced as C(w, 2) per pair — never
    * enumerated — and the census lands on ≤ ~40 log buckets. */
  private val q603 = QueryDef(
    "q603_butterfly_census",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
        .distinct()
      val w = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("u"), col("b.s").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2L) // pairs with w < 2 close no butterfly
        .select(col("w"), expr("w * (w - 1) div 2").as("bf"))
      // floor(log2) via binary-string length — exact integers, immune to
      // cross-engine libm rounding at power-of-two boundaries
      w.groupBy(expr("CAST(length(bin(bf)) - 1 AS BIGINT)").as("log2_bucket"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("bf")).as("n_butterflies"))
        .orderBy(col("log2_bucket"))
    },
    Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'),
      w AS (
        SELECT a.s AS u, b.s AS v, CAST(count(*) AS BIGINT) AS w
        FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s
        GROUP BY 1, 2 HAVING count(*) >= 2),
      bf AS (SELECT w, w * (w - 1) // 2 AS bf FROM w)
      SELECT CAST(length(bin(bf)) - 1 AS BIGINT) AS log2_bucket,
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(bf) AS BIGINT) AS n_butterflies
      FROM bf GROUP BY 1 ORDER BY log2_bucket
    """))

  // ---------------------------------------------------------------- q604

  /** Yannakakis semi-join reduction audit on the acyclic chain
    * region('ASIA') → nation → customer → orders(1995): the full
    * reducer semi-joins each relation down to the tuples that
    * participate in at least one final join result, and the audit
    * reports, per relation, total rows, surviving rows, and dangling
    * rows — the tuples a binary join plan would carry and then throw
    * away. The final result cardinality certifies the reduction
    * (every surviving orders row joins exactly once up the chain, so
    * |result| = surviving orders rows — the acyclic-query guarantee
    * binary plans cannot certify).
    *
    * Scale shape: reduction is two sweeps of keyed left_semi joins
    * (bottom-up then top-down), each shuffling only keys; nothing
    * materializes a join product, and the readout is 4 rows. */
  private val q604 = QueryDef(
    "q604_yannakakis_reduction_audit",
    (spark, dir) => {
      val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val nation = Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))
      val customer = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val orders = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey"), col("o_custkey"))
      // bottom-up semi-join sweep (orders end is the "root")
      val n1 = nation.join(region, col("n_regionkey") === col("r_regionkey"), "left_semi")
      val c1 = customer.join(n1, col("c_nationkey") === col("n_nationkey"), "left_semi")
      val o2 = orders.join(c1, col("o_custkey") === col("c_custkey"), "left_semi")
      // top-down sweep back: keep only tuples reachable from the root
      val c2 = c1.join(o2, col("c_custkey") === col("o_custkey"), "left_semi")
      val n2 = n1.join(c2, col("n_nationkey") === col("c_nationkey"), "left_semi")
      val r2 = region.join(n2, col("r_regionkey") === col("n_regionkey"), "left_semi")
      def audit(name: String, total: org.apache.spark.sql.DataFrame,
                reduced: org.apache.spark.sql.DataFrame) =
        total.agg(count(lit(1)).as("rows_total"))
          .crossJoin(reduced.agg(count(lit(1)).as("rows_surviving")))
          .select(lit(name).as("relation"), col("rows_total"), col("rows_surviving"),
            (col("rows_total") - col("rows_surviving")).as("rows_dangling"))
      audit("1_region", region, r2)
        .union(audit("2_nation", nation, n2))
        .union(audit("3_customer", customer, c2))
        .union(audit("4_orders", orders, o2))
        .orderBy(col("relation"))
    },
    Some("""
      WITH region0 AS (
        SELECT r_regionkey FROM region WHERE r_name = 'ASIA'),
      orders0 AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'),
      n1 AS (SELECT n_nationkey, n_regionkey FROM nation
             WHERE n_regionkey IN (SELECT r_regionkey FROM region0)),
      c1 AS (SELECT c_custkey, c_nationkey FROM customer
             WHERE c_nationkey IN (SELECT n_nationkey FROM n1)),
      o2 AS (SELECT o_orderkey, o_custkey FROM orders0
             WHERE o_custkey IN (SELECT c_custkey FROM c1)),
      c2 AS (SELECT * FROM c1
             WHERE c_custkey IN (SELECT o_custkey FROM o2)),
      n2 AS (SELECT * FROM n1
             WHERE n_nationkey IN (SELECT c_nationkey FROM c2)),
      r2 AS (SELECT * FROM region0
             WHERE r_regionkey IN (SELECT n_regionkey FROM n2))
      SELECT relation, rows_total, rows_surviving,
        rows_total - rows_surviving AS rows_dangling
      FROM (
        SELECT '1_region' AS relation,
          CAST((SELECT count(*) FROM region0) AS BIGINT) AS rows_total,
          CAST((SELECT count(*) FROM r2) AS BIGINT) AS rows_surviving
        UNION ALL SELECT '2_nation',
          CAST((SELECT count(*) FROM nation) AS BIGINT),
          CAST((SELECT count(*) FROM n2) AS BIGINT)
        UNION ALL SELECT '3_customer',
          CAST((SELECT count(*) FROM customer) AS BIGINT),
          CAST((SELECT count(*) FROM c2) AS BIGINT)
        UNION ALL SELECT '4_orders',
          CAST((SELECT count(*) FROM orders0) AS BIGINT),
          CAST((SELECT count(*) FROM o2) AS BIGINT))
      ORDER BY relation
    """))

  override def defs: Seq[QueryDef] = Seq(q603, q604)
}
