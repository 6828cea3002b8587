package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 optimization/search operators: v-optimal histogram segmentation
  * (dynamic programming over a value histogram), synchronous label
  * propagation communities, and a successive-halving resource-allocation
  * schedule — DP, graph clustering, and AutoML-style search expressed as
  * dataflow, deterministic for the oracle gate.
  */
object OptimQueries extends QueryGroup {

  // ---------------------------------------------------------------- q410

  /** V-optimal histogram: the optimal 1–4-segment piecewise-constant
    * summary of the order-price distribution (minimum total within-
    * segment SSE), solved EXACTLY by dynamic programming over a 32-cell
    * pre-histogram — the classic synopsis-construction algorithm behind
    * zone maps and histogram statistics (q372/q325 plan layouts
    * greedily; this one is provably optimal). Emits the k-segment error
    * curve plus each level's optimal last cut. Every SSE is the same
    * IEEE op sequence in both engines (sxx − sx·sx/n on exact integer
    * prefix sums), so mins/adds of those doubles agree bitwise.
    *
    * Scale shape: one corpus scan folds rows into ≤ 32 (cell, n, Σx,
    * Σx²) rows; the O(B²) interval table and O(k·B²) DP run on that
    * vocabulary-sized histogram (sanctioned tiny nested loops). Dollar
    * units keep Σx² within 64 bits to ~10⁹ rows; beyond that the two
    * moment columns become decimals. */
  private val q410 = QueryDef(
    "q410_v_optimal_histogram",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .select(expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("x"))
      val rng = o.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val cells = o.crossJoin(broadcast(rng))
        .select(expr("least(31L, (x - mn) * 32 div (mx - mn + 1))").as("cell"),
          col("x"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
      val w = Window.orderBy(col("cell"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the ≤ 32-row histogram feeds every DP branch — persist (lazily)
      // so the corpus folds exactly once however many levels re-read it
      val pre = cells
        .withColumn("rn", row_number().over(Window.orderBy(col("cell"))))
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("csx", sum(col("sx")).over(w))
        .withColumn("csxx", sum(col("sxx")).over(w))
        .persist()
      val lo = pre.select(col("rn").as("i"), (col("cn") - col("n")).as("pcn"),
        (col("csx") - col("sx")).as("pcsx"), (col("csxx") - col("sxx")).as("pcsxx"))
      val hi = pre.select(col("rn").as("j"), col("cn"), col("csx"), col("csxx"))
      // sse over the cell range i..j from exact integer prefix moments;
      // sx·sx must multiply as doubles (the long product overflows)
      val sse = lo.join(hi, col("i") <= col("j"))
        .select(col("i"), col("j"), expr(
          "CAST(csxx - pcsxx AS DOUBLE) - " +
            "CAST(csx - pcsx AS DOUBLE) * CAST(csx - pcsx AS DOUBLE) " +
            "/ CAST(cn - pcn AS DOUBLE)").as("e"))
        .persist() // ≤ B(B+1)/2 rows, read by all four DP levels
      val b = pre.agg(max(col("rn")).as("bb"))
      def level(prev: DataFrame): DataFrame = // Ek(j) = min_i E(i)+sse(i+1..j)
        prev.select(col("j").as("i"), col("e").as("pe"))
          .join(sse.withColumnRenamed("i", "i1"), col("i1") === col("i") + 1)
          .groupBy(col("j")).agg(min(col("pe") + col("e")).as("e"))
      val e1 = sse.filter(col("i") === 1).select(col("j"), col("e"))
      val levels = Seq(e1, level(e1), level(level(e1)), level(level(level(e1))))
      val rows = levels.zipWithIndex.map { case (ek, idx) =>
        ek.crossJoin(broadcast(b)).filter(col("j") === col("bb"))
          .select(lit(idx + 1).cast("long").as("k"), col("e").as("sse"))
      }.reduce(_.unionAll(_))
      val base = rows.filter(col("k") === 1).select(col("sse").as("e1v"))
      rows.crossJoin(broadcast(base))
        .select(col("k"), col("sse"),
          expr("CAST(floor((e1v - sse) * 1000000D / e1v) AS BIGINT)")
            .as("reduction_ppm"))
        .orderBy(col("k"))
    },
    Some("""
      WITH o AS (
        SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x FROM orders),
      rng AS (SELECT min(x) AS mn, max(x) AS mx FROM o),
      cells AS (
        SELECT least(31, (x - mn) * 32 // (mx - mn + 1)) AS cell,
          CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(x * x) AS BIGINT) AS sxx
        FROM o CROSS JOIN rng GROUP BY 1),
      pre AS (
        SELECT row_number() OVER (ORDER BY cell) AS rn, n, sx, sxx,
          CAST(sum(n) OVER w AS BIGINT) AS cn,
          CAST(sum(sx) OVER w AS BIGINT) AS csx,
          CAST(sum(sxx) OVER w AS BIGINT) AS csxx
        FROM cells
        WINDOW w AS (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      sse AS (
        SELECT i.rn AS i, j.rn AS j,
          CAST(j.csxx - (i.csxx - i.sxx) AS DOUBLE)
            - CAST(j.csx - (i.csx - i.sx) AS DOUBLE)
              * CAST(j.csx - (i.csx - i.sx) AS DOUBLE)
              / CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS e
        FROM pre i JOIN pre j ON i.rn <= j.rn),
      b AS (SELECT max(rn) AS bb FROM pre),
      e1 AS (SELECT j, e FROM sse WHERE i = 1),
      e2 AS (
        SELECT s.j, min(p.e + s.e) AS e FROM e1 p
        JOIN sse s ON s.i = p.j + 1 GROUP BY s.j),
      e3 AS (
        SELECT s.j, min(p.e + s.e) AS e FROM e2 p
        JOIN sse s ON s.i = p.j + 1 GROUP BY s.j),
      e4 AS (
        SELECT s.j, min(p.e + s.e) AS e FROM e3 p
        JOIN sse s ON s.i = p.j + 1 GROUP BY s.j),
      rows_ AS (
        SELECT CAST(1 AS BIGINT) AS k, e1.e AS sse FROM e1 CROSS JOIN b WHERE e1.j = b.bb
        UNION ALL
        SELECT 2, e2.e FROM e2 CROSS JOIN b WHERE e2.j = b.bb
        UNION ALL
        SELECT 3, e3.e FROM e3 CROSS JOIN b WHERE e3.j = b.bb
        UNION ALL
        SELECT 4, e4.e FROM e4 CROSS JOIN b WHERE e4.j = b.bb),
      base AS (SELECT sse AS e1v FROM rows_ WHERE k = 1)
      SELECT k, sse,
        CAST(floor((e1v - sse) * 1000000.0 / e1v) AS BIGINT) AS reduction_ppm
      FROM rows_ CROSS JOIN base
      ORDER BY k
    """))

  // ---------------------------------------------------------------- q411

  /** Synchronous label-propagation communities (3 rounds) on the 1994
    * co-order supplier graph: every node adopts its neighbors' majority
    * label (count-desc, label-asc tiebreak; isolated nodes keep their
    * own), seeded with node ids — the near-linear community detector
    * that complements q56's connectivity, q271's k-core and q329's
    * modularity with actual cluster assignments. Deterministic by
    * construction: integer labels, total tiebreak order.
    *
    * Scale shape: identical to q75's PageRank loop — the edge list is
    * built once (localCheckpoint truncates the self-join lineage) and
    * each round is one keyed join + one (node, label) agg + one
    * rank-per-node window; rounds never widen the data. */
  private val q411 = QueryDef(
    "q411_lpa_communities",
    (spark, dir) => {
      // r13: symmetric 1994 edges from the memoized graph.Backbone canon
      // (the checkpoint lives in the memo; the mirror union is flat)
      val edges = graft.graph.Backbone.coSupplySym(spark, dir, year = 1994)
      val nodes = Tables.supplier(spark, dir).select(col("s_suppkey").as("node"))
      var labels = nodes.select(col("node"), col("node").as("label"))
      for (_ <- 1 to 3) {
        val wMode = Window.partitionBy(col("node"))
          .orderBy(col("cnt").desc, col("label"))
        val adopted = edges
          .join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(wMode))
          .filter(col("rk") === 1)
          .select(col("node"), col("label").as("new_label"))
        labels = nodes
          .join(labels, Seq("node")).join(adopted, Seq("node"), "left")
          .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
      }
      labels.groupBy(col("label"))
        .agg(count(lit(1)).as("size"), min(col("node")).as("min_node"))
        .orderBy(col("size").desc, col("label"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey, l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate < TIMESTAMP '1995-01-01'),
      e AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
      n0 AS (SELECT s_suppkey AS node FROM supplier),
      l0 AS (SELECT node, node AS label FROM n0),
      a1 AS (
        SELECT node, label AS new_label FROM (
          SELECT e.dst AS node, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY e.dst
              ORDER BY count(*) DESC, l.label) AS rk
          FROM e JOIN l0 l ON l.node = e.src
          GROUP BY e.dst, l.label) WHERE rk = 1),
      l1 AS (
        SELECT n0.node, coalesce(a1.new_label, l0.label) AS label
        FROM n0 JOIN l0 USING (node) LEFT JOIN a1 USING (node)),
      a2 AS (
        SELECT node, label AS new_label FROM (
          SELECT e.dst AS node, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY e.dst
              ORDER BY count(*) DESC, l.label) AS rk
          FROM e JOIN l1 l ON l.node = e.src
          GROUP BY e.dst, l.label) WHERE rk = 1),
      l2 AS (
        SELECT n0.node, coalesce(a2.new_label, l1.label) AS label
        FROM n0 JOIN l1 USING (node) LEFT JOIN a2 USING (node)),
      a3 AS (
        SELECT node, label AS new_label FROM (
          SELECT e.dst AS node, l.label, count(*) AS cnt,
            row_number() OVER (PARTITION BY e.dst
              ORDER BY count(*) DESC, l.label) AS rk
          FROM e JOIN l2 l ON l.node = e.src
          GROUP BY e.dst, l.label) WHERE rk = 1),
      l3 AS (
        SELECT n0.node, coalesce(a3.new_label, l2.label) AS label
        FROM n0 JOIN l2 USING (node) LEFT JOIN a3 USING (node))
      SELECT label, CAST(count(*) AS BIGINT) AS size,
        min(node) AS min_node
      FROM l3 GROUP BY label
      ORDER BY size DESC, label
    """))

  // ---------------------------------------------------------------- q412

  /** Successive-halving allocation (Hyperband's inner loop): 25 brand
    * "configurations" race on cumulative revenue, evaluated at
    * exponentially growing horizons (90/180/365/730 days from first
    * shipment); each rung keeps the top half (metric-desc, brand-asc) —
    * the early-stopping search schedule that spends exponentially more
    * budget only on survivors. One scan computes ALL rung metrics as
    * conditional sums; survival is pure window ranking on the 25-row
    * config table.
    *
    * Scale shape: the fact scan aggregates once into (brand, m0..m3);
    * horizons come from a one-row broadcast of min(shipdate); every
    * rung after that is vocabulary-sized. */
  private val q412 = QueryDef(
    "q412_successive_halving",
    (spark, dir) => {
      val cents = graft.functions.Deterministic.cents _
      val li = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val d0 = Tables.lineitem(spark, dir).agg(min(col("l_shipdate")).as("d0"))
      def m(days: Int): Column =
        sum(when(col("l_shipdate") < expr(s"d0 + INTERVAL $days DAY"),
          cents(col("l_extendedprice"))).otherwise(0L))
      val metrics = li.crossJoin(broadcast(d0))
        .groupBy(col("p_brand"))
        .agg(m(90).as("m0"), m(180).as("m1"), m(365).as("m2"), m(730).as("m3"))
        .persist() // 25 rows; the four rung aggregates must not rescan facts
      // rank WITHIN the surviving partition (the boolean splits the 25-row
      // table; losers rank among themselves and are masked to null)
      def rankWithin(flag: Column, c: String): Column =
        row_number().over(
          Window.partitionBy(flag).orderBy(col(c).desc, col("p_brand")))
      val raced = metrics
        .withColumn("r0",
          row_number().over(Window.orderBy(col("m0").desc, col("p_brand"))))
        .withColumn("r1",
          when(col("r0") <= 13, rankWithin(col("r0") <= 13, "m1")))
        .withColumn("r2",
          when(col("r1") <= 7, rankWithin(col("r1") <= 7, "m2")))
        .withColumn("r3",
          when(col("r2") <= 4, rankWithin(col("r2") <= 4, "m3")))
      def rung(r: Int, horizon: Int, nKeep: Int): DataFrame = {
        val rk = col(s"r$r"); val mc = col(s"m$r")
        raced.filter(rk.isNotNull)
          .agg(count(lit(1)).as("n_eval"),
            min(when(rk <= nKeep, mc)).as("kept_min_cents"),
            min_by(col("p_brand"), rk).as("top_brand"))
          .select(lit(r).cast("long").as("rung"),
            lit(horizon).cast("long").as("horizon_days"),
            col("n_eval"), lit(nKeep).cast("long").as("n_kept"),
            (col("n_eval") * horizon).as("rung_cost"),
            col("kept_min_cents"), col("top_brand"))
      }
      rung(0, 90, 13).unionAll(rung(1, 180, 7))
        .unionAll(rung(2, 365, 4)).unionAll(rung(3, 730, 1))
        .orderBy(col("rung"))
    },
    Some("""
      WITH li AS (
        SELECT p.p_brand, l.l_shipdate,
          CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      d0 AS (SELECT min(l_shipdate) AS d0 FROM lineitem),
      metrics AS (
        SELECT p_brand,
          CAST(sum(CASE WHEN l_shipdate < d0 + INTERVAL 90 DAY
            THEN c ELSE 0 END) AS BIGINT) AS m0,
          CAST(sum(CASE WHEN l_shipdate < d0 + INTERVAL 180 DAY
            THEN c ELSE 0 END) AS BIGINT) AS m1,
          CAST(sum(CASE WHEN l_shipdate < d0 + INTERVAL 365 DAY
            THEN c ELSE 0 END) AS BIGINT) AS m2,
          CAST(sum(CASE WHEN l_shipdate < d0 + INTERVAL 730 DAY
            THEN c ELSE 0 END) AS BIGINT) AS m3
        FROM li CROSS JOIN d0 GROUP BY p_brand),
      raced AS (
        SELECT p_brand, m0, m1, m2, m3,
          row_number() OVER (ORDER BY m0 DESC, p_brand) AS r0
        FROM metrics),
      raced1 AS (
        SELECT *, CASE WHEN r0 <= 13 THEN
          row_number() OVER (PARTITION BY (r0 <= 13) ORDER BY m1 DESC, p_brand)
          END AS r1 FROM raced),
      raced2 AS (
        SELECT *, CASE WHEN r1 <= 7 THEN
          row_number() OVER (PARTITION BY (r1 <= 7) ORDER BY m2 DESC, p_brand)
          END AS r2 FROM raced1),
      raced3 AS (
        SELECT *, CASE WHEN r2 <= 4 THEN
          row_number() OVER (PARTITION BY (r2 <= 4) ORDER BY m3 DESC, p_brand)
          END AS r3 FROM raced2)
      SELECT CAST(0 AS BIGINT) AS rung, CAST(90 AS BIGINT) AS horizon_days,
        CAST(count(*) AS BIGINT) AS n_eval, CAST(13 AS BIGINT) AS n_kept,
        CAST(count(*) * 90 AS BIGINT) AS rung_cost,
        min(CASE WHEN r0 <= 13 THEN m0 END) AS kept_min_cents,
        arg_min(p_brand, r0) AS top_brand
      FROM raced3 WHERE r0 IS NOT NULL
      UNION ALL
      SELECT 1, 180, CAST(count(*) AS BIGINT), 7,
        CAST(count(*) * 180 AS BIGINT),
        min(CASE WHEN r1 <= 7 THEN m1 END), arg_min(p_brand, r1)
      FROM raced3 WHERE r1 IS NOT NULL
      UNION ALL
      SELECT 2, 365, CAST(count(*) AS BIGINT), 4,
        CAST(count(*) * 365 AS BIGINT),
        min(CASE WHEN r2 <= 4 THEN m2 END), arg_min(p_brand, r2)
      FROM raced3 WHERE r2 IS NOT NULL
      UNION ALL
      SELECT 3, 730, CAST(count(*) AS BIGINT), 1,
        CAST(count(*) * 730 AS BIGINT),
        min(CASE WHEN r3 <= 1 THEN m3 END), arg_min(p_brand, r3)
      FROM raced3 WHERE r3 IS NOT NULL
      ORDER BY rung
    """))

  override def defs: Seq[QueryDef] = Seq(q410, q411, q412)
}
