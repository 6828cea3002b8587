package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 7: disclosure-control planning — per-user contribution
  * clipping (the DP sensitivity/bias dial), privacy amplification by
  * subsampling (exact in the e^ε domain), and small-cell suppression
  * with complementary suppression. All exact integers with total ORDER
  * BYs for the oracle gate.
  */
object DisclosurePlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q618

  /** Contribution-bounding (clipping) audit: a DP release of "total
    * orders" must cap each customer at C contributions — sensitivity C
    * — but capping discards real mass. Per C ∈ {1, 2, 4, 8}: clipped
    * total, bias ppm, and the bias²+variance proxy 10¹²·bias_ppm² +
    * 2·C²·10¹²/ε² at ε = 1 (geometric-mechanism variance 2C²/ε² scaled
    * to the same ppm² units via the true total) — the standard
    * clip-level chooser: small C = big bias/low noise, big C = the
    * reverse; the audit finds the crossing on real data.
    *
    * Scale shape: one orders scan → per-customer counts (customer-
    * dimension aggregate); the 4-row clip grid broadcasts onto it;
    * readout is 4 rows. */
  private val q618 = QueryDef(
    "q618_contribution_clipping_audit",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(1L, 2L, 4L, 8L).toDF("clip")
      val perCust = Tables.orders(spark, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
      val tot = perCust.agg(sum(col("k")).as("true_total"))
      perCust.crossJoin(broadcast(grid))
        .groupBy(col("clip"))
        .agg(sum(least(col("k"), col("clip"))).as("clipped_total"),
          sum(when(col("k") > col("clip"), 1L).otherwise(0L)).as("n_clipped_users"))
        .crossJoin(broadcast(tot))
        .select(col("clip"), col("clipped_total"), col("n_clipped_users"),
          col("true_total"),
          expr("(true_total - clipped_total) * 1000000 div true_total")
            .as("bias_ppm"))
        .select(col("clip"), col("clipped_total"), col("n_clipped_users"),
          col("bias_ppm"),
          // mse proxy in ppm² units: bias² + noise² where the geometric
          // noise sd ≈ √2·C/ε rescales to ppm via the true total
          expr("""bias_ppm * bias_ppm
            + 2 * clip * clip * 1000000 div true_total * 1000000 div true_total""")
            .as("mse_proxy_ppm2"))
        .orderBy(col("clip"))
    },
    Some("""
      WITH grid(clip) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
        (CAST(4 AS BIGINT)), (CAST(8 AS BIGINT))),
      pc AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
        FROM orders GROUP BY o_custkey),
      tot AS (SELECT CAST(sum(k) AS BIGINT) AS true_total FROM pc),
      c AS (
        SELECT clip, CAST(sum(least(k, clip)) AS BIGINT) AS clipped_total,
          CAST(sum(CASE WHEN k > clip THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clipped_users
        FROM pc CROSS JOIN grid GROUP BY clip)
      SELECT clip, clipped_total, n_clipped_users,
        CAST((true_total - clipped_total) * 1000000 // true_total AS BIGINT)
          AS bias_ppm,
        CAST((true_total - clipped_total) * 1000000 // true_total
          * ((true_total - clipped_total) * 1000000 // true_total)
          + 2 * clip * clip * 1000000 // true_total * 1000000 // true_total
          AS BIGINT) AS mse_proxy_ppm2
      FROM c CROSS JOIN tot ORDER BY clip
    """))

  // ---------------------------------------------------------------- q619

  /** Privacy amplification by subsampling, exact in the e^ε domain:
    * running an (ε)-DP mechanism on a q-fraction sample satisfies
    * ε' = ln(1 + q·(e^ε − 1)) — and with base losses chosen at
    * e^ε ∈ {2, 4, 8}, the amplified LOSS FACTOR e^ε' = 1 + q·(e^ε − 1)
    * is exactly rational, so the audit reports it in ppm with no
    * transcendental calls. q is measured, not assumed: the actual
    * hash-sample rate of customers (q45's keyed sampler at 5%). Also
    * reports the k-fold group-privacy factor (e^ε)^k for k = 2 — what
    * a user appearing twice costs.
    *
    * Scale shape: one customer scan → (sampled, total) one-row counts;
    * the 3-row base grid broadcasts; readout is 3 rows. */
  private val q619 = QueryDef(
    "q619_subsampling_amplification",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(2L, 4L, 8L).toDF("exp_eps")
      val counts = Tables.customer(spark, dir)
        .select(graft.operators.Sampling.keyHash(col("c_custkey")).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("h") % 10000L < 500L, 1L).otherwise(0L)).as("n_sampled"))
      counts.crossJoin(broadcast(grid))
        .select(col("exp_eps"), col("n"), col("n_sampled"),
          expr("n_sampled * 1000000 div n").as("q_ppm"))
        .select(col("exp_eps"), col("n_sampled"), col("q_ppm"),
          expr("1000000 + q_ppm * (exp_eps - 1)").as("amplified_factor_ppm"),
          (col("exp_eps") * col("exp_eps")).as("group_privacy_factor_k2"))
        .orderBy(col("exp_eps"))
    },
    Some("""
      WITH grid(exp_eps) AS (VALUES (CAST(2 AS BIGINT)), (CAST(4 AS BIGINT)),
        (CAST(8 AS BIGINT))),
      c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN (c_custkey % 2147483648) * 2654435761
            % 4294967296 % 10000 < 500 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_sampled
        FROM customer)
      SELECT exp_eps, n_sampled,
        CAST(n_sampled * 1000000 // n AS BIGINT) AS q_ppm,
        CAST(1000000 + n_sampled * 1000000 // n * (exp_eps - 1) AS BIGINT)
          AS amplified_factor_ppm,
        CAST(exp_eps * exp_eps AS BIGINT) AS group_privacy_factor_k2
      FROM c CROSS JOIN grid ORDER BY exp_eps
    """))

  // ---------------------------------------------------------------- q620

  /** Small-cell suppression with complementary suppression: the
    * (nation, order-month) count table is published only where cell
    * count ≥ threshold; but a nation-row with exactly ONE suppressed
    * cell leaks it by subtraction from the row margin, so the next
    * smallest cell in that nation is suppressed too (the deterministic
    * complementary rule: smallest count, ties by month). Per threshold
    * ∈ {5, 10}: primary/complementary counts and the suppressed value
    * mass — the disclosure-vs-utility frontier of every published
    * statistical table.
    *
    * Scale shape: orders fold to (nation, month) cells — 25 × 24
    * bounded; ranks partition per nation over its ≤ 24 cells;
    * readout is 2 rows. */
  private val q620 = QueryDef(
    "q620_cell_suppression_plan",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(5L, 10L).toDF("threshold")
      val cells = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1997-01-01")
        .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"),
          expr("CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12" +
            " + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)").as("m"))
        .agg(count(lit(1)).as("c"))
      val marked = cells.crossJoin(broadcast(grid))
        .withColumn("primary", col("c") < col("threshold"))
      val byNat = Window.partitionBy(col("threshold"), col("nat"))
      val compRank = Window.partitionBy(col("threshold"), col("nat"))
        .orderBy(col("c"), col("m"))
      val withComp = marked
        .withColumn("n_primary_in_nat",
          sum(when(col("primary"), 1L).otherwise(0L)).over(byNat))
        .withColumn("rk_unsuppressed", row_number().over(
          Window.partitionBy(col("threshold"), col("nat"))
            .orderBy(col("primary").desc, col("c"), col("m"))))
        // when exactly one primary cell exists in the nation row, the
        // smallest unsuppressed cell (rank 2 in the primary-first order)
        // is complementarily suppressed
        .withColumn("complementary",
          !col("primary") && col("n_primary_in_nat") === 1L
            && col("rk_unsuppressed") === 2)
      withComp.groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("primary"), 1L).otherwise(0L)).as("n_primary"),
          sum(when(col("complementary"), 1L).otherwise(0L)).as("n_complementary"),
          sum(when(col("primary") || col("complementary"), col("c"))
            .otherwise(0L)).as("suppressed_mass"),
          sum(col("c")).as("total_mass"))
        .select(col("threshold"), col("n_cells"), col("n_primary"),
          col("n_complementary"),
          expr("suppressed_mass * 1000000 div total_mass")
            .as("suppressed_mass_ppm"))
        .orderBy(col("threshold"))
    },
    Some("""
      WITH grid(threshold) AS (VALUES (CAST(5 AS BIGINT)), (CAST(10 AS BIGINT))),
      cells AS (
        SELECT c_nationkey AS nat,
          CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12
            + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
          CAST(count(*) AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2),
      marked AS (
        SELECT threshold, nat, m, c, c < threshold AS prim
        FROM cells CROSS JOIN grid),
      comp AS (
        SELECT *,
          sum(CASE WHEN prim THEN 1 ELSE 0 END)
            OVER (PARTITION BY threshold, nat) AS n_primary_in_nat,
          row_number() OVER (PARTITION BY threshold, nat
            ORDER BY prim DESC, c, m) AS rk
        FROM marked)
      SELECT threshold, CAST(count(*) AS BIGINT) AS n_cells,
        CAST(sum(CASE WHEN prim THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
        CAST(sum(CASE WHEN NOT prim AND n_primary_in_nat = 1 AND rk = 2
          THEN 1 ELSE 0 END) AS BIGINT) AS n_complementary,
        CAST(sum(CASE WHEN prim OR (NOT prim AND n_primary_in_nat = 1
          AND rk = 2) THEN c ELSE 0 END) * 1000000 // sum(c) AS BIGINT)
          AS suppressed_mass_ppm
      FROM comp GROUP BY threshold ORDER BY threshold
    """))

  override def defs: Seq[QueryDef] = Seq(q618, q619, q620)
}
