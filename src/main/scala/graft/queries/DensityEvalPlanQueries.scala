package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 6a: a grid-density clustering census over the
  * embedding cloud (DBSCAN's core/border/noise trichotomy with the
  * grid-neighborhood density surrogate — the shape every curation run
  * wants before committing to a clustering), and the DeLong paired-AUC
  * test (are two rankers on the SAME observations actually different? —
  * the correlated comparison q181's single-AUC machinery cannot make).
  */
object DensityEvalPlanQueries extends QueryGroup {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")

  // ---------------------------------------------------------------- q708

  /** Grid-density (DBSCAN-lite) census on the first two embedding
    * dimensions, quantized to a 0.05 grid: a cell is CORE if its 3×3
    * neighborhood holds ≥ 6 points, BORDER if not core but adjacent to
    * a core cell, NOISE otherwise. The census (cells + points per
    * class) is the pre-clustering shape check: a high noise share says
    * the eps/minPts regime is wrong before any cluster assignment is
    * computed.
    *
    * Scale shape: one projection+groupBy to the occupied-cell histogram
    * (the only row-scale stage); neighborhood sums are the 9-offset
    * broadcast shift-join on the bounded cell table; the census is
    * 3 rows. */
  private val q708 = QueryDef(
    "q708_grid_density_census",
    (spark, dir) => {
      val pts = Tables.embeddings(spark, dir)
        .select(
          expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 20)" +
            " AS BIGINT)").as("gx"),
          expr("CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE) * 20)" +
            " AS BIGINT)").as("gy"))
      val cells = pts.groupBy(col("gx"), col("gy"))
        .agg(count(lit(1)).as("cnt"))
      val offsets = spark.sql(
        """SELECT * FROM VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
           (1,-1),(1,0),(1,1) AS t(dx, dy)""")
      val nbhd = cells.crossJoin(broadcast(offsets))
        .groupBy((col("gx") + col("dx")).as("gx"),
          (col("gy") + col("dy")).as("gy"))
        .agg(sum(col("cnt")).as("nb"))
      val classed = cells.join(nbhd, Seq("gx", "gy"))
        .withColumn("is_core", (col("nb") >= 6).cast("int"))
      val coreAdj = classed.filter(col("is_core") === 1)
        .crossJoin(broadcast(offsets))
        .select((col("gx") + col("dx")).as("gx"),
          (col("gy") + col("dy")).as("gy"))
        .distinct()
      classed
        .join(broadcast(coreAdj.withColumn("adj", lit(1))), Seq("gx", "gy"),
          "left")
        .select(when(col("is_core") === 1, "a_core")
          .when(col("adj") === 1, "b_border")
          .otherwise("c_noise").as("klass"), col("cnt"))
        .groupBy(col("klass"))
        .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_points"))
        .orderBy(col("klass"))
    },
    Some("""
      WITH pts AS (
        SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 20) AS BIGINT)
            AS gx,
          CAST(floor(CAST(embedding[2] AS DOUBLE) * 20) AS BIGINT) AS gy
        FROM embeddings),
      cells AS MATERIALIZED (
        SELECT gx, gy, CAST(count(*) AS BIGINT) AS cnt
        FROM pts GROUP BY gx, gy),
      offsets(dx, dy) AS (
        VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
               (1,-1),(1,0),(1,1)),
      nbhd AS (
        SELECT gx + dx AS gx, gy + dy AS gy, CAST(sum(cnt) AS BIGINT) AS nb
        FROM cells CROSS JOIN offsets GROUP BY 1, 2),
      classed AS MATERIALIZED (
        SELECT cells.gx, cells.gy, cnt,
          CASE WHEN nb >= 6 THEN 1 ELSE 0 END AS is_core
        FROM cells JOIN nbhd ON cells.gx = nbhd.gx AND cells.gy = nbhd.gy),
      core_adj AS MATERIALIZED (
        SELECT DISTINCT gx + dx AS gx, gy + dy AS gy
        FROM classed CROSS JOIN offsets WHERE is_core = 1)
      SELECT CASE WHEN is_core = 1 THEN 'a_core'
          WHEN a.gx IS NOT NULL THEN 'b_border'
          ELSE 'c_noise' END AS klass,
        CAST(count(*) AS BIGINT) AS n_cells,
        CAST(sum(cnt) AS BIGINT) AS n_points
      FROM classed c
      LEFT JOIN core_adj a ON c.gx = a.gx AND c.gy = a.gy
      GROUP BY 1 ORDER BY klass
    """))

  // ---------------------------------------------------------------- q710

  // z = (AUC_A − AUC_B)/sqrt(VarA + VarB − 2·Cov), every moment an
  // exact integer fold over the joint histogram; one shared IEEE text.
  private val delongCastExprs: Seq[String] = Seq(
    "CAST(n_pos AS DOUBLE) AS fp", "CAST(n_neg AS DOUBLE) AS fq",
    "CAST(sa_pos AS DOUBLE) AS fsa1", "CAST(sb_pos AS DOUBLE) AS fsb1",
    "CAST(saa_pos AS DOUBLE) AS fsaa1", "CAST(sbb_pos AS DOUBLE) AS fsbb1",
    "CAST(sab_pos AS DOUBLE) AS fsab1",
    "CAST(sa_neg AS DOUBLE) AS fsa0", "CAST(sb_neg AS DOUBLE) AS fsb0",
    "CAST(saa_neg AS DOUBLE) AS fsaa0", "CAST(sbb_neg AS DOUBLE) AS fsbb0",
    "CAST(sab_neg AS DOUBLE) AS fsab0")
  private val delongZExpr: String =
    """((fsa1 - fsb1) / (2.0*fp*fq)) / sqrt(
       ((fsaa1 - fsa1*fsa1/fp) / (fp - 1.0)
         + (fsbb1 - fsb1*fsb1/fp) / (fp - 1.0)
         - 2.0*(fsab1 - fsa1*fsb1/fp) / (fp - 1.0)) / (4.0*fp*fq*fq)
       + ((fsaa0 - fsa0*fsa0/fq) / (fq - 1.0)
         + (fsbb0 - fsb0*fsb0/fq) / (fq - 1.0)
         - 2.0*(fsab0 - fsa0*fsb0/fq) / (fq - 1.0)) / (4.0*fq*fp*fp))
       AS z_stat"""

  /** DeLong paired-AUC comparison: on the same events, does the dollar
    * value rank purchases better than the hour of day does? Both
    * "rankers" score every observation; AUC difference significance
    * must price the CORRELATION between the two rankers, which is what
    * the DeLong placement calculus does. Doubled placements
    * W(x) = 2·(# opposite-class below) + (# at) stay integer via the
    * q324 histogram-rank trick; per-observation joint products
    * accumulate over the (value, hour, label) joint histogram —
    * covariance needs W_A·W_B per OBSERVATION, which is exactly why
    * the joint histogram (not two marginals) is the minimal sufficient
    * fold. z is one shared IEEE expression over 12 exact sums.
    *
    * Scale shape: one groupBy to the ≤ |values|×24×2 joint histogram
    * (the row-scale shuffle, map-side combined); placements come from
    * value-resolution cumulative windows (bounded global windows,
    * sanctioned); moments fold cells. Exact while cnt·W² < 10³⁸. */
  private val q710 = QueryDef(
    "q710_delong_paired_auc",
    (spark, dir) => {
      val jh = Tables.events(spark, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(
          floor(col("value")).cast("long").as("a"),
          hour(col("ts")).cast("long").as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy(col("a"), col("b"), col("y"))
        .agg(count(lit(1)).as("cnt"))
      // doubled placement of score s against the OPPOSITE class:
      // W(s) = 2·cum_below(s) + at(s). Densified over EVERY observed
      // score × both classes — a score the opposite class never takes
      // still needs its cum-below row, or the cell join drops it.
      def placements(grain: String) = {
        val grains = jh.select(col(grain)).distinct()
        val both = grains.crossJoin(
          broadcast(jh.sparkSession.sql("SELECT * FROM VALUES (0), (1) AS t(y)")
            .select(col("y").cast("long").as("y"))))
        val opp = jh.groupBy(col(grain), (lit(1L) - col("y")).as("y"))
          .agg(sum(col("cnt")).as("c"))
        val w = Window.partitionBy(col("y")).orderBy(col(grain))
        both.join(opp, Seq(grain, "y"), "left")
          .select(col(grain), col("y"),
            coalesce(col("c"), lit(0L)).as("c"))
          .select(col(grain), col("y"),
            (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c"))
              .as(s"w_$grain"))
      }
      val cells = jh
        .join(broadcast(placements("a")), Seq("a", "y"))
        .join(broadcast(placements("b")), Seq("b", "y"))
      val m = cells.groupBy(col("y"))
        .agg(sum(col("cnt")).as("n"),
          sum(dec(col("cnt")) * col("w_a")).as("sa"),
          sum(dec(col("cnt")) * col("w_b")).as("sb"),
          sum(dec(col("cnt")) * col("w_a") * col("w_a")).as("saa"),
          sum(dec(col("cnt")) * col("w_b") * col("w_b")).as("sbb"),
          sum(dec(col("cnt")) * col("w_a") * col("w_b")).as("sab"))
      val pos = m.filter(col("y") === 1).select(col("n").as("n_pos"),
        col("sa").as("sa_pos"), col("sb").as("sb_pos"),
        col("saa").as("saa_pos"), col("sbb").as("sbb_pos"),
        col("sab").as("sab_pos"))
      val neg = m.filter(col("y") === 0).select(col("n").as("n_neg"),
        col("sa").as("sa_neg"), col("sb").as("sb_neg"),
        col("saa").as("saa_neg"), col("sbb").as("sbb_neg"),
        col("sab").as("sab_neg"))
      pos.crossJoin(broadcast(neg))
        .selectExpr("n_pos", "n_neg",
          "CAST(sa_pos * 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) AS auc_a_ppm",
          "CAST(sb_pos * 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) AS auc_b_ppm",
          "sa_pos", "sb_pos", "saa_pos", "sbb_pos", "sab_pos",
          "sa_neg", "sb_neg", "saa_neg", "sbb_neg", "sab_neg")
        .selectExpr(Seq("n_pos", "n_neg", "auc_a_ppm", "auc_b_ppm")
          ++ delongCastExprs: _*)
        .selectExpr("n_pos", "n_neg", "auc_a_ppm", "auc_b_ppm", delongZExpr)
    },
    Some(s"""
      WITH jh AS MATERIALIZED (
        SELECT CAST(floor(value) AS BIGINT) AS a,
          CAST(hour(ts) AS BIGINT) AS b,
          CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            AS BIGINT) AS y,
          CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY a, b, y),
      pa AS MATERIALIZED (
        SELECT a, y, 2*(sum(c) OVER (PARTITION BY y ORDER BY a) - c) + c
          AS w_a
        FROM (
          SELECT g.a, t.y, CAST(coalesce(o.c, 0) AS BIGINT) AS c
          FROM (SELECT DISTINCT a FROM jh) g
          CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
            AS t(y)
          LEFT JOIN (
            SELECT a, 1 - y AS y, CAST(sum(cnt) AS BIGINT) AS c
            FROM jh GROUP BY a, 1 - y) o ON o.a = g.a AND o.y = t.y)),
      pb AS MATERIALIZED (
        SELECT b, y, 2*(sum(c) OVER (PARTITION BY y ORDER BY b) - c) + c
          AS w_b
        FROM (
          SELECT g.b, t.y, CAST(coalesce(o.c, 0) AS BIGINT) AS c
          FROM (SELECT DISTINCT b FROM jh) g
          CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
            AS t(y)
          LEFT JOIN (
            SELECT b, 1 - y AS y, CAST(sum(cnt) AS BIGINT) AS c
            FROM jh GROUP BY b, 1 - y) o ON o.b = g.b AND o.y = t.y)),
      m AS MATERIALIZED (
        SELECT y, CAST(sum(cnt) AS BIGINT) AS n,
          sum(CAST(cnt AS HUGEINT) * w_a) AS sa,
          sum(CAST(cnt AS HUGEINT) * w_b) AS sb,
          sum(CAST(cnt AS HUGEINT) * w_a * w_a) AS saa,
          sum(CAST(cnt AS HUGEINT) * w_b * w_b) AS sbb,
          sum(CAST(cnt AS HUGEINT) * w_a * w_b) AS sab
        FROM jh JOIN pa USING (a, y) JOIN pb USING (b, y)
        GROUP BY y),
      wide AS (
        SELECT p.n AS n_pos, q.n AS n_neg,
          CAST(p.sa * 1000000 // (2 * CAST(p.n AS HUGEINT) * q.n)
            AS BIGINT) AS auc_a_ppm,
          CAST(p.sb * 1000000 // (2 * CAST(p.n AS HUGEINT) * q.n)
            AS BIGINT) AS auc_b_ppm,
          p.sa AS sa_pos, p.sb AS sb_pos, p.saa AS saa_pos,
          p.sbb AS sbb_pos, p.sab AS sab_pos,
          q.sa AS sa_neg, q.sb AS sb_neg, q.saa AS saa_neg,
          q.sbb AS sbb_neg, q.sab AS sab_neg
        FROM (SELECT * FROM m WHERE y = 1) p
        CROSS JOIN (SELECT * FROM m WHERE y = 0) q),
      casted AS (
        SELECT n_pos, n_neg, auc_a_ppm, auc_b_ppm,
          ${delongCastExprs.mkString(", ")}
        FROM wide)
      SELECT n_pos, n_neg, auc_a_ppm, auc_b_ppm, $delongZExpr
      FROM casted
    """))

  def defs: Seq[QueryDef] = Seq(q708, q710)
}
