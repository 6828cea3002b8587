package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 batch 4: spatial blocking — the grid-bucketed neighbor join
  * (the one classic scale-join family the catalog did not yet name:
  * points within distance ε found by joining each point's cell to the
  * 3×3 neighborhood, never all-pairs) and parameterized SQL execution
  * (session variables + EXECUTE IMMEDIATE — injection-safe templating
  * as an engine feature).
  */
object SpatialPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q752

  /** Grid-bucketed ε-neighbor join: customers get deterministic integer
    * coordinates in a 10⁶×10⁶ square (two independent multiplicative
    * hashes — identical on any engine), and all pairs within Chebyshev
    * distance ε = 20000 are found by the canonical spatial blocking: a
    * cell size equal to ε guarantees every qualifying pair lands in
    * adjacent cells, so joining side A exploded to its 3×3 cell
    * neighborhood against side B's home cell enumerates each candidate
    * pair EXACTLY once (one offset matches), and the exact distance
    * filter keeps the true neighbors. Census: candidate pairs vs verified
    * pairs (the blocking-efficiency readout) and verified pairs per
    * distance band.
    *
    * Scale shape: the 9-way explode is on cell KEYS (9 rows per point,
    * fixed fan-out); the join shuffles on cell id, whose occupancy is
    * ~n/(10⁶/ε)² points — the all-pairs O(n²) collapses to
    * O(n · occupancy). No window, no driver state. */
  private val q752 = QueryDef(
    "q752_grid_neighbor_join",
    (spark, dir) => {
      val eps = 20000L
      // two independent xorshift-mixed multiplicative hashes: the extra
      // xor rounds matter — a multiplicative-only hash of SEQUENTIAL
      // keys is linear, so (px, py) lands on a 2D lattice whose minimum
      // pair distance can exceed ε and the join finds nothing (measured
      // at ε=2000: 0 pairs at sf0.01 unmixed vs 19 with mixing)
      val pts = Tables.customer(spark, dir)
        .select(col("c_custkey").as("id"))
        .withColumn("a", expr("((id % 2147483648) * 2246822519) % 4294967296"))
        .withColumn("b", expr("((id % 2147483648) * 2654435761) % 4294967296"))
        .withColumn("a2",
          expr("(((a ^ (a div 65536)) % 2147483648) * 2654435761) % 4294967296"))
        .withColumn("b2",
          expr("(((b ^ (b div 65536)) % 2147483648) * 2246822519) % 4294967296"))
        .select(col("id"),
          expr("(a2 ^ (a2 div 65536)) % 1000000").as("px"),
          expr("(b2 ^ (b2 div 65536)) % 1000000").as("py"))
        .withColumn("cx", expr(s"px div $eps"))
        .withColumn("cy", expr(s"py div $eps"))
      val probe = pts.select(col("id"), col("px"), col("py"),
          explode(expr("array(-1L, 0L, 1L)")).as("dx"), col("cx"), col("cy"))
        .select(col("id"), col("px"), col("py"),
          (col("cx") + col("dx")).as("jx"), col("cy"))
        .select(col("id"), col("px"), col("py"), col("jx"),
          explode(expr("array(-1L, 0L, 1L)")).as("dy"), col("cy"))
        .select(col("id"), col("px"), col("py"), col("jx"),
          (col("cy") + col("dy")).as("jy"))
      val cand = probe.as("a").join(
          pts.select(col("id").as("id_b"), col("px").as("px_b"),
            col("py").as("py_b"), col("cx").as("jx"), col("cy").as("jy")),
          Seq("jx", "jy"))
        .filter(col("id") < col("id_b"))
      val verified = cand.filter(
        abs(col("px") - col("px_b")) <= eps && abs(col("py") - col("py_b")) <= eps)
      val stats = cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(pts.agg(count(lit(1)).as("n_points"))))
      val bands = verified
        .select(greatest(abs(col("px") - col("px_b")),
          abs(col("py") - col("py_b"))).as("d"))
        .groupBy(expr(s"d * 5 div ($eps + 1)").as("band"))
        .agg(count(lit(1)).as("n_pairs"))
      bands.crossJoin(broadcast(stats))
        .select(col("band"), col("n_pairs"), col("n_points"), col("n_candidates"))
        .orderBy(col("band"))
    },
    Some("""
      WITH h1 AS (
        SELECT c_custkey AS id,
          ((c_custkey % 2147483648) * 2246822519) % 4294967296 AS a,
          ((c_custkey % 2147483648) * 2654435761) % 4294967296 AS b
        FROM customer),
      h2 AS (
        SELECT id,
          ((xor(a, a // 65536) % 2147483648) * 2654435761) % 4294967296 AS a2,
          ((xor(b, b // 65536) % 2147483648) * 2246822519) % 4294967296 AS b2
        FROM h1),
      pts AS MATERIALIZED (
        SELECT id, xor(a2, a2 // 65536) % 1000000 AS px,
          xor(b2, b2 // 65536) % 1000000 AS py
        FROM h2),
      cells AS (SELECT id, px, py, px // 20000 AS cx, py // 20000 AS cy FROM pts),
      probe AS (
        SELECT id, px, py, cx + dx.d AS jx, cy + dy.d AS jy
        FROM cells,
          (SELECT unnest([-1, 0, 1]) AS d) dx,
          (SELECT unnest([-1, 0, 1]) AS d) dy),
      cand AS MATERIALIZED (
        SELECT a.id, a.px, a.py, b.id AS id_b, b.px AS px_b, b.py AS py_b
        FROM probe a JOIN cells b ON b.cx = a.jx AND b.cy = a.jy
        WHERE a.id < b.id),
      verified AS (
        SELECT greatest(abs(px - px_b), abs(py - py_b)) AS d
        FROM cand
        WHERE abs(px - px_b) <= 20000 AND abs(py - py_b) <= 20000),
      stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
               (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points)
      SELECT d * 5 // 20001 AS band, CAST(count(*) AS BIGINT) AS n_pairs,
        n_points, n_candidates
      FROM verified CROSS JOIN stats
      GROUP BY 1, 3, 4 ORDER BY band
    """))

  // ---------------------------------------------------------------- q753

  /** Parameterized SQL execution: a session variable is SET from a
    * scalar subquery (the mean order value in cents) and bound into a
    * templated query via `EXECUTE IMMEDIATE ... USING` — the
    * injection-safe way to run data-derived templates, and an engine
    * feature a pipeline orchestrator leans on (DuckDB's twin is
    * prepared-statement parameters; the gate oracle inlines the same
    * threshold computation as one statement). Census: per priority,
    * orders above the mean and their share.
    *
    * Scale shape: one fold for the threshold (one row), one filtered
    * fold for the census (priority-keyed, ≤ 5 rows). */
  private val q753 = QueryDef(
    "q753_execute_immediate_params",
    (spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q753_ord")
      spark.sql("DECLARE OR REPLACE VARIABLE graft_q753_thr BIGINT")
      spark.sql("""SET VAR graft_q753_thr = (
        SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          div count(*) AS BIGINT)
        FROM graft_q753_ord)""")
      spark.sql("""EXECUTE IMMEDIATE
        'SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                              > :thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_mean,
           CAST(sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                              > :thr THEN 1 ELSE 0 END) * 1000000
                div count(*) AS BIGINT) AS above_ppm
         FROM graft_q753_ord GROUP BY 1 ORDER BY 1'
        USING graft_q753_thr AS thr""")
    },
    Some("""
      WITH thr AS (
        SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          // count(*) AS BIGINT) AS t
        FROM orders)
      SELECT o_orderpriority AS priority,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           > t THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean,
        CAST(sum(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           > t THEN 1 ELSE 0 END) * 1000000
             // count(*) AS BIGINT) AS above_ppm
      FROM orders CROSS JOIN thr
      GROUP BY 1, t ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(q752, q753)
}
