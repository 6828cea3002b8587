package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 batch 8: estimation under transformation — degree-mixing
  * structure, local-privacy frequency recovery, and the one-pass
  * Poisson bootstrap. All outputs integers / strings with total
  * ORDER BYs for the oracle gate.
  */
object InferencePlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q564

  /** Degree-mixing matrix of the customer–supplier purchase graph: bin
    * each side's degree into log₂ buckets (bit-length, q215's portable
    * ⌊log₂⌋ — no libm) and count edges per (customer-degree bin,
    * supplier-degree bin) cell with each cell's share of all edges in
    * ppm. This is the scale-safe form of degree assortativity: the
    * full mixing table shows WHERE high-degree hubs attach (the
    * Pearson assortativity coefficient is one number summarizing this
    * matrix, and its count-product sums overflow int64 on graphs with
    * ~10⁹ edges — the matrix never does). Hub-hub concentration on
    * the bottom-right cells is what makes joins on this graph skew.
    *
    * Scale shape: degrees are two keyed aggregates over the distinct
    * edge list; the matrix build is two keyed joins (edge →
    * endpoint-degree bins) and a hash agg onto ≤ 64×64 cells; the
    * one-row edge total broadcasts back onto the cells for the ppm
    * share. */
  private val q564 = QueryDef(
    "q564_degree_mixing_matrix",
    (spark, dir) => {
      val base = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")), Seq("ok"))
        .select(col("c"), col("s")).distinct()
        .persist()
      val degC = base.groupBy(col("c")).agg(count(lit(1)).as("dc"))
        .select(col("c"), (length(bin(col("dc"))) - 1).cast("long").as("c_bin"))
      val degS = base.groupBy(col("s")).agg(count(lit(1)).as("ds"))
        .select(col("s"), (length(bin(col("ds"))) - 1).cast("long").as("s_bin"))
      val cells = base.join(degC, Seq("c")).join(degS, Seq("s"))
        .groupBy(col("c_bin"), col("s_bin")).agg(count(lit(1)).as("n_edges"))
      val tot = base.agg(count(lit(1)).as("total_edges"))
      cells.crossJoin(broadcast(tot))
        .select(col("c_bin"), col("s_bin"), col("n_edges"),
          expr("n_edges * 1000000 div total_edges").as("edge_share_ppm"))
        .orderBy(col("c_bin"), col("s_bin"))
    },
    Some("""
      WITH b AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'),
      dc AS (SELECT c, CAST(length(bin(count(*))) - 1 AS BIGINT) AS c_bin
             FROM b GROUP BY c),
      ds AS (SELECT s, CAST(length(bin(count(*))) - 1 AS BIGINT) AS s_bin
             FROM b GROUP BY s),
      cells AS (
        SELECT c_bin, s_bin, CAST(count(*) AS BIGINT) AS n_edges
        FROM b JOIN dc USING (c) JOIN ds USING (s)
        GROUP BY c_bin, s_bin),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS total_edges FROM b)
      SELECT c_bin, s_bin, n_edges,
        CAST(n_edges * 1000000 // total_edges AS BIGINT) AS edge_share_ppm
      FROM cells CROSS JOIN tot
      ORDER BY c_bin, s_bin
    """))

  // ---------------------------------------------------------------- q565

  /** Randomized-response frequency recovery: flip each order's
    * sensitive bit (is it URGENT?) with probability 1/4 or 1/8 before
    * "collecting" it — the classical local-privacy mechanism — then
    * invert the bias with p̂ = (p_obs − q)/(1 − 2q) per month and score
    * the recovery against the true rate the raw table knows. The
    * flip-rate grid is the privacy/accuracy dial: stronger privacy
    * (more flipping) costs recovery precision, and per-month cells
    * show where small n makes the debiased estimate noisy. The flip
    * decision is a deterministic per-key hash, so the "mechanism" is
    * replayable and the oracle exact.
    *
    * Scale shape: one scan computes both mechanisms' observed bits;
    * everything folds to (month × 2) cells in one keyed aggregate; the
    * debias arithmetic runs on ppm SHARES (never count products), so
    * it is overflow-free at any order count. Signed integer division
    * truncates identically in both engines, so estimates below zero
    * (tiny n, unlucky flips) stay portable. */
  private val q565 = QueryDef(
    "q565_randomized_response_recovery",
    (spark, dir) => {
      import graft.operators.Sampling
      val base = Tables.orders(spark, dir)
        .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("t"),
          (Sampling.keyHash(col("o_orderkey"), 2246822519L) % 8L).as("h8"))
        .select(col("ym"), col("t"),
          when(col("h8") < 2L, lit(1L) - col("t")).otherwise(col("t")).as("o25"),
          when(col("h8") < 1L, lit(1L) - col("t")).otherwise(col("t")).as("o125"))
      base.groupBy(col("ym")).agg(
          count(lit(1)).as("n"), sum(col("t")).as("tp"),
          sum(col("o25")).as("op25"), sum(col("o125")).as("op125"))
        .select(col("ym"), col("n"), expr("""stack(2,
            CAST(250000 AS BIGINT), op25,
            CAST(125000 AS BIGINT), op125) AS (q_ppm, obs_pos)"""),
          col("tp"))
        .withColumn("true_ppm", expr("tp * 1000000 div n"))
        .withColumn("obs_ppm", expr("obs_pos * 1000000 div n"))
        .withColumn("est_ppm",
          expr("(obs_ppm - q_ppm) * 1000000 div (1000000 - 2 * q_ppm)"))
        .select(col("ym"), col("q_ppm"), col("n").as("n_orders"),
          col("true_ppm"), col("obs_ppm"), col("est_ppm"),
          expr("abs(est_ppm - true_ppm)").as("abs_err_ppm"))
        .orderBy(col("ym"), col("q_ppm"))
    },
    Some("""
      WITH base AS (
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
          ((o_orderkey % 2147483648) * 2246822519) % 4294967296 % 8 AS h8
        FROM orders),
      m AS (
        SELECT ym, t,
          CASE WHEN h8 < 2 THEN 1 - t ELSE t END AS o25,
          CASE WHEN h8 < 1 THEN 1 - t ELSE t END AS o125
        FROM base),
      g AS (
        SELECT ym, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS tp,
          CAST(sum(o25) AS BIGINT) AS op25, CAST(sum(o125) AS BIGINT) AS op125
        FROM m GROUP BY ym),
      p AS (
        SELECT ym, n, CAST(250000 AS BIGINT) AS q_ppm, op25 AS obs_pos, tp FROM g
        UNION ALL SELECT ym, n, 125000, op125, tp FROM g),
      s AS (
        SELECT ym, q_ppm, n AS n_orders,
          CAST(tp * 1000000 // n AS BIGINT) AS true_ppm,
          CAST(obs_pos * 1000000 // n AS BIGINT) AS obs_ppm
        FROM p)
      SELECT CAST(ym AS BIGINT) AS ym, q_ppm, n_orders, true_ppm, obs_ppm,
        CAST((obs_ppm - q_ppm) * 1000000 // (1000000 - 2 * q_ppm) AS BIGINT)
          AS est_ppm,
        CAST(abs((obs_ppm - q_ppm) * 1000000 // (1000000 - 2 * q_ppm) - true_ppm)
          AS BIGINT) AS abs_err_ppm
      FROM s ORDER BY ym, q_ppm
    """))

  // ---------------------------------------------------------------- q566

  /** One-pass Poisson bootstrap CI for mean order revenue: each of 32
    * replicates gives every order a deterministic Poisson(1)
    * multiplicity (per-replicate Knuth hash → milli-quantized Poisson
    * CDF: 368/736/920/981/996), so all 32 resampled means come out of
    * ONE aggregation pass — the only bootstrap that works at cluster
    * scale, because classical resampling would shuffle the corpus B
    * times while this never shuffles it at all. Reports the point
    * mean and the central ~94% band (2nd..31st replicate order
    * statistics) — the uncertainty attached to every revenue KPI this
    * engine reports.
    *
    * Scale shape: 64 conditional sums fold in one scan (codegen'd
    * CASE chains, no joins, no explode ×32); replicate means unpivot
    * from the ONE-ROW global aggregate; the ranking window runs over
    * exactly 32 replicate rows (sanctioned: replicate-grid-sized).
    * Cents sums stay within int64 under the repo-wide money
    * convention. */
  private val q566 = QueryDef(
    "q566_poisson_bootstrap_ci",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      val reps = 0 until 32
      val base = Tables.orders(spark, dir)
        .select(cents(col("o_totalprice")).as("x"),
          expr("o_orderkey % 2147483648").as("km"))
      val withM = reps.foldLeft(base) { (df, b) =>
        val mult = 2654435761L + 2L * b
        df.withColumn(s"m$b", expr(
          s"""CASE WHEN (km * ${mult}L) % 4294967296 % 1000 < 368 THEN 0
              WHEN (km * ${mult}L) % 4294967296 % 1000 < 736 THEN 1
              WHEN (km * ${mult}L) % 4294967296 % 1000 < 920 THEN 2
              WHEN (km * ${mult}L) % 4294967296 % 1000 < 981 THEN 3
              WHEN (km * ${mult}L) % 4294967296 % 1000 < 996 THEN 4
              ELSE 5 END"""))
      }
      val aggs = Seq(sum(col("x")).as("sx"), count(lit(1)).as("nx")) ++
        reps.flatMap(b => Seq(
          sum(expr(s"m$b * x")).as(s"s$b"), sum(col(s"m$b")).as(s"n$b")))
      val one = withM.agg(aggs.head, aggs.tail: _*)
      val stackArgs = reps.map(b => s"CAST($b AS BIGINT), s$b, n$b").mkString(", ")
      val means = one.select(col("sx"), col("nx"),
          expr(s"stack(32, $stackArgs) AS (b, s, n)"))
        .select(col("sx"), col("nx"), expr("s div n").as("mean_b"))
      means
        .withColumn("rk", row_number().over(
          Window.orderBy(col("mean_b"), col("sx"))))
        .groupBy(col("sx"), col("nx"))
        .agg(count(lit(1)).as("n_reps"),
          max(when(col("rk") === 2, col("mean_b"))).as("boot_lo_cents"),
          max(when(col("rk") === 31, col("mean_b"))).as("boot_hi_cents"))
        .select(col("n_reps"), expr("sx div nx").as("point_mean_cents"),
          col("boot_lo_cents"), col("boot_hi_cents"),
          expr("boot_hi_cents - boot_lo_cents").as("band_cents"))
    },
    Some {
      val reps = 0 until 32
      def h(b: Int) = s"(km * ${2654435761L + 2L * b}) % 4294967296 % 1000"
      val ms = reps.map(b =>
        s"""CASE WHEN ${h(b)} < 368 THEN 0 WHEN ${h(b)} < 736 THEN 1
            WHEN ${h(b)} < 920 THEN 2 WHEN ${h(b)} < 981 THEN 3
            WHEN ${h(b)} < 996 THEN 4 ELSE 5 END AS m$b""").mkString(",\n          ")
      val sums = reps.map(b =>
        s"CAST(sum(m$b * x) AS BIGINT) AS s$b, CAST(sum(m$b) AS BIGINT) AS n$b")
        .mkString(",\n          ")
      val unpiv = reps.map(b => s"SELECT s$b AS s, n$b AS n FROM one")
        .mkString("\n        UNION ALL ")
      s"""
      WITH base AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
          o_orderkey % 2147483648 AS km
        FROM orders),
      m AS (
        SELECT x,
          $ms
        FROM base),
      one AS (
        SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS nx,
          $sums
        FROM m),
      means AS (
        SELECT (SELECT sx FROM one) AS sx, (SELECT nx FROM one) AS nx,
          CAST(s // n AS BIGINT) AS mean_b
        FROM ($unpiv)),
      rk AS (
        SELECT sx, nx, mean_b,
          row_number() OVER (ORDER BY mean_b, sx) AS rk
        FROM means)
      SELECT CAST(count(*) AS BIGINT) AS n_reps,
        CAST(max(sx) // max(nx) AS BIGINT) AS point_mean_cents,
        CAST(max(CASE WHEN rk = 2 THEN mean_b END) AS BIGINT) AS boot_lo_cents,
        CAST(max(CASE WHEN rk = 31 THEN mean_b END) AS BIGINT) AS boot_hi_cents,
        CAST(max(CASE WHEN rk = 31 THEN mean_b END)
          - max(CASE WHEN rk = 2 THEN mean_b END) AS BIGINT) AS band_cents
      FROM rk
    """
    })

  def defs: Seq[QueryDef] = Seq(q564, q565, q566)
}
