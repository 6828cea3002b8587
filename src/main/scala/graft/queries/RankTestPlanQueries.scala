package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 1: the classical k-sample rank tests the catalog was
  * missing — Kruskal–Wallis (location, unordered k groups),
  * Jonckheere–Terpstra (location, ORDERED alternative — strictly more
  * powerful than KW when the hypothesis is monotone), and Mood's
  * squared-rank test (scale/dispersion, the rank complement of q55's
  * variance and q304's dispersion census). All three follow q324's
  * defining trick: tie-averaged ranks are a pure function of the VALUE
  * HISTOGRAM (doubled rank 2r(v) = 2·count_below + count_at + 1 stays
  * integer), so no per-row sort ever happens — one map-side-combined
  * groupBy to a cells-bounded joint histogram, then vocabulary-sized
  * windows and bounded joins. Moments accumulate in decimal(38,0) /
  * HUGEINT; the final statistic is ONE shared IEEE expression text both
  * engines evaluate over identical integers (the q544 OLS discipline).
  */
object RankTestPlanQueries extends QueryGroup {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")

  // ---------------------------------------------------------------- q693

  // H = (3·T/(N(N+1)) − 3(N+1)) / (1 − TT/(N³−N)), T = Σ_j ⌊s2_j²/n_j⌋
  // (s2_j = doubled-rank sum of group j; the ⌊·⌋ is the identical div
  // both engines floor), TT = Σ_v (t³−t) the tie correction. One
  // expression text, evaluated over exact integers on both sides.
  private val kwCastExprs: Seq[String] = Seq(
    "CAST(n_total AS DOUBLE) AS fn",
    "CAST(t_sum AS DOUBLE) AS ft",
    "CAST(tt_sum AS DOUBLE) AS ftt")
  private val kwHExpr: String =
    "(3.0*ft/(fn*(fn+1.0)) - 3.0*(fn+1.0)) / (1.0 - ftt/(fn*fn*fn - fn)) AS h_stat"

  /** Kruskal–Wallis H across the three return flags on line quantity:
    * does ANY flag's quantity distribution sit apart from the rest?
    * Tie-averaged doubled ranks from the ≤50-cell quantity histogram,
    * tie-corrected H (ties are massive here — 50 values, millions of
    * rows — the uncorrected H would be biased low by the tie mass).
    *
    * Scale shape: one groupBy to the (flag, qty) joint histogram — the
    * only row-scale shuffle, map-side combined; ranks come from the
    * ≤50-row value histogram (bounded global window, sanctioned); the
    * per-group moment fold and the one-row H are dimension-sized.
    * Exact while s2_j² < 10³⁸ (s2_j ≤ 2N² → N ≲ 7·10⁹ rows) and the
    * emitted r2_sum < 2⁶³ (N ≲ 2·10⁹ — the q664 SF-ceiling note). */
  private val q693 = QueryDef(
    "q693_kruskal_wallis",
    (spark, dir) => {
      val jh = Tables.lineitem(spark, dir)
        .select(col("l_returnflag").as("flag"),
          floor(col("l_quantity") + 0.5).cast("long").as("x"))
        .groupBy(col("flag"), col("x")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("x"))
      val vh = jh.groupBy(col("x")).agg(sum(col("cnt")).as("c"))
        .select(col("x"), col("c"),
          (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c") + 1)
            .as("r2"))
      val groups = jh.join(broadcast(vh.select(col("x"), col("r2"))), Seq("x"))
        .groupBy(col("flag"))
        .agg(sum(col("cnt")).as("n"),
          sum(dec(col("cnt")) * col("r2")).as("s2"))
      val t = groups
        .agg(sum(col("n")).as("n_total"),
          sum(expr("s2 * s2 div n")).as("t_sum"))
      val tt = vh.agg(
        sum(dec(col("c")) * col("c") * col("c") - col("c")).as("tt_sum"))
      groups.select(col("flag"), col("n"),
          col("s2").cast("long").as("r2_sum"))
        .crossJoin(broadcast(t.crossJoin(tt)
          .selectExpr(Seq("n_total") ++ kwCastExprs: _*)
          .selectExpr("n_total", kwHExpr)))
        .orderBy(col("flag"))
    },
    Some(s"""
      WITH jh AS (
        SELECT l_returnflag AS flag,
          CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
          CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY flag, x),
      vh AS (
        SELECT x, c, 2*(sum(c) OVER (ORDER BY x) - c) + c + 1 AS r2
        FROM (SELECT x, CAST(sum(cnt) AS BIGINT) AS c FROM jh GROUP BY x)),
      groups AS (
        SELECT flag, CAST(sum(cnt) AS BIGINT) AS n,
          sum(CAST(cnt AS HUGEINT) * r2) AS s2
        FROM jh JOIN vh USING (x) GROUP BY flag),
      t AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total,
          sum(s2 * s2 // n) AS t_sum
        FROM groups),
      tt AS (
        SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS tt_sum FROM vh),
      stat AS (
        SELECT n_total, ${kwCastExprs.mkString(", ")} FROM t CROSS JOIN tt),
      h AS (SELECT n_total, $kwHExpr FROM stat)
      SELECT flag, n, CAST(s2 AS BIGINT) AS r2_sum, n_total, h_stat
      FROM groups CROSS JOIN h ORDER BY flag
    """))

  // ---------------------------------------------------------------- q694

  // z = (jt2 − e2) / (2·sqrt(var)), var the Hollander–Wolfe
  // tie-corrected variance assembled from three exact integer pieces.
  private val jtCastExprs: Seq[String] = Seq(
    "CAST(jt2 AS DOUBLE) AS fjt2", "CAST(e2 AS DOUBLE) AS fe2",
    "CAST(va AS DOUBLE) AS fva", "CAST(vb AS DOUBLE) AS fvb",
    "CAST(vc AS DOUBLE) AS fvc",
    "CAST(n_total AS DOUBLE) AS fn")
  private val jtZExpr: String =
    """(fjt2 - fe2) / (2.0*sqrt(fva/72.0
       + fvb/(36.0*fn*(fn-1.0)*(fn-2.0))
       + fvc/(8.0*fn*(fn-1.0)))) AS z_stat"""

  /** Jonckheere–Terpstra ordered-alternative test: does the discount
    * distribution shift MONOTONICALLY across the five quantity bands
    * (1–10, …, 41–50)? JT is the sum of pairwise Mann–Whitney counts
    * over ordered group pairs; doubled (ties count 1) it stays integer,
    * and over the (band, bps) joint histogram the whole statistic is a
    * ≤55×55 bounded self-join — pairs of CELLS, never pairs of rows.
    * The null mean Σ_{i<j} n_i·n_j and the Hollander–Wolfe
    * tie-corrected variance are exact integer folds of the group and
    * tie histograms; z is one shared IEEE expression.
    *
    * Scale shape: one groupBy to the ≤55-cell joint histogram (the only
    * row-scale shuffle), one broadcast self-join over the bounded
    * cells, dimension-sized moment folds. Exact while N³ < 10³⁸. */
  private val q694 = QueryDef(
    "q694_jonckheere_terpstra",
    (spark, dir) => {
      val jh = Tables.lineitem(spark, dir)
        .select(
          expr("(CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) div 10")
            .as("b"),
          floor(col("l_discount") * 10000 + 0.5).cast("long").as("v"))
        .groupBy(col("b"), col("v")).agg(count(lit(1)).as("cnt"))
      val a = jh.select(col("b").as("b1"), col("v").as("v1"),
        col("cnt").as("c1"))
      val bb = jh.select(col("b").as("b2"), col("v").as("v2"),
        col("cnt").as("c2"))
      val jt2 = a.join(broadcast(bb), col("b1") < col("b2"))
        .agg(sum(when(col("v1") < col("v2"),
            lit(2) * dec(col("c1")) * col("c2"))
          .when(col("v1") === col("v2"), dec(col("c1")) * col("c2"))
          .otherwise(dec(lit(0)))).as("jt2"))
      val g = jh.groupBy(col("b")).agg(sum(col("cnt")).as("n"))
      val e2 = g.select(col("b").as("b1"), col("n").as("n1"))
        .join(broadcast(g.select(col("b").as("b2"), col("n").as("n2"))),
          col("b1") < col("b2"))
        .agg(sum(dec(col("n1")) * col("n2")).as("e2"))
      val gm = g.agg(sum(col("n")).as("n_total"),
        sum(dec(col("n")) * (col("n") - 1) * (lit(2) * col("n") + 5))
          .as("g25"),
        sum(dec(col("n")) * (col("n") - 1) * (col("n") - 2)).as("g3"),
        sum(dec(col("n")) * (col("n") - 1)).as("g2"))
      val th = jh.groupBy(col("v")).agg(sum(col("cnt")).as("t"))
        .agg(
          sum(dec(col("t")) * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("t25"),
          sum(dec(col("t")) * (col("t") - 1) * (col("t") - 2)).as("t3"),
          sum(dec(col("t")) * (col("t") - 1)).as("t2"))
      jt2.crossJoin(e2).crossJoin(gm).crossJoin(th)
        .selectExpr("CAST(jt2 AS BIGINT) AS jt2",
          "CAST(e2 AS BIGINT) AS e2", "n_total",
          "CAST(n_total AS DECIMAL(38,0)) * (n_total-1) * (2*n_total+5)" +
            " - g25 - t25 AS va",
          "g3 * t3 AS vb", "g2 * t2 AS vc")
        .selectExpr(Seq("jt2", "e2", "n_total") ++ jtCastExprs: _*)
        .selectExpr("jt2", "e2", "n_total", jtZExpr)
    },
    Some(s"""
      WITH jh AS (
        SELECT (CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) // 10 AS b,
          CAST(floor(l_discount*10000 + 0.5) AS BIGINT) AS v,
          CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY b, v),
      jt AS (
        SELECT sum(CASE WHEN a.v < c.v THEN 2*CAST(a.cnt AS HUGEINT)*c.cnt
                        WHEN a.v = c.v THEN CAST(a.cnt AS HUGEINT)*c.cnt
                        ELSE CAST(0 AS HUGEINT) END) AS jt2
        FROM jh a JOIN jh c ON a.b < c.b),
      g AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS n FROM jh GROUP BY b),
      e AS (
        SELECT sum(CAST(a.n AS HUGEINT) * c.n) AS e2
        FROM g a JOIN g c ON a.b < c.b),
      gm AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total,
          sum(CAST(n AS HUGEINT)*(n-1)*(2*n+5)) AS g25,
          sum(CAST(n AS HUGEINT)*(n-1)*(n-2)) AS g3,
          sum(CAST(n AS HUGEINT)*(n-1)) AS g2
        FROM g),
      th AS (
        SELECT sum(CAST(t AS HUGEINT)*(t-1)*(2*t+5)) AS t25,
          sum(CAST(t AS HUGEINT)*(t-1)*(t-2)) AS t3,
          sum(CAST(t AS HUGEINT)*(t-1)) AS t2
        FROM (SELECT v, CAST(sum(cnt) AS BIGINT) AS t FROM jh GROUP BY v)),
      raw AS (
        SELECT CAST(jt2 AS BIGINT) AS jt2, CAST(e2 AS BIGINT) AS e2,
          n_total,
          CAST(n_total AS HUGEINT)*(n_total-1)*(2*n_total+5)
            - g25 - t25 AS va,
          g3 * t3 AS vb, g2 * t2 AS vc
        FROM jt CROSS JOIN e CROSS JOIN gm CROSS JOIN th),
      casted AS (
        SELECT jt2, e2, n_total, ${jtCastExprs.mkString(", ")} FROM raw)
      SELECT jt2, e2, n_total, $jtZExpr FROM casted
    """))

  // ---------------------------------------------------------------- q695

  /** Mood's squared-rank scale test between open (linestatus O) and
    * fulfilled (F) lines on quantity: with d(v) = 2·rank(v) − (N+1) (integer, thanks to
    * doubled tie-averaged ranks), group j's dispersion mass is
    * M_j = Σ d², and under H0 exchangeability E[M_j] = n_j·S/N EXACTLY
    * (S the total mass) — ties included, no approximation. The readout
    * is disp_ppm = ⌊M_j·N·10⁶ / (n_j·S)⌋ per group: 10⁶ means "this
    * group's spread is exactly its share", the two groups bracket 10⁶
    * by construction.
    *
    * Scale shape: one groupBy to the ≤100-cell (status, qty)
    * histogram; ranks from the ≤50-row value histogram (bounded global
    * window, sanctioned); moment folds are cell-sized. Exact while
    * M_j·N·10⁶ < 10³⁸ (M ≤ N³ → N ≲ 4·10⁷ rows in the two modes; at
    * larger SF drop the 10⁶ to 10³ — the q664 ceiling discipline). */
  private val q695 = QueryDef(
    "q695_mood_scale_test",
    (spark, dir) => {
      val jh = Tables.lineitem(spark, dir)
        .select(col("l_linestatus").as("status"),
          floor(col("l_quantity") + 0.5).cast("long").as("x"))
        .groupBy(col("status"), col("x")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("x"))
      val vh = jh.groupBy(col("x")).agg(sum(col("cnt")).as("c"))
        .select(col("x"),
          (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c") + 1)
            .as("r2"))
      val nTot = jh.agg(sum(col("cnt")).as("n_total"))
      val cells = jh.join(broadcast(vh), Seq("x"))
        .crossJoin(broadcast(nTot))
        .select(col("status"), col("cnt"), col("n_total"),
          (dec(col("r2") - col("n_total") - 1)
            * (col("r2") - col("n_total") - 1)).as("d2"))
      val groups = cells.groupBy(col("status"), col("n_total"))
        .agg(sum(col("cnt")).as("n"), sum(dec(col("cnt")) * col("d2")).as("m"))
      val s = groups.agg(sum(col("m")).as("s_mass"))
      groups.crossJoin(broadcast(s))
        .select(col("status"), col("n"),
          expr("CAST(m * n_total * 1000000 div (n * s_mass) AS BIGINT)")
            .as("disp_ppm"))
        .orderBy(col("status"))
    },
    Some("""
      WITH jh AS (
        SELECT l_linestatus AS status,
          CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
          CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY status, x),
      vh AS (
        SELECT x, 2*(sum(c) OVER (ORDER BY x) - c) + c + 1 AS r2
        FROM (SELECT x, CAST(sum(cnt) AS BIGINT) AS c FROM jh GROUP BY x)),
      nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM jh),
      cells AS (
        SELECT status, cnt, n_total,
          CAST(r2 - n_total - 1 AS HUGEINT) * (r2 - n_total - 1) AS d2
        FROM jh JOIN vh USING (x) CROSS JOIN nt),
      groups AS (
        SELECT status, n_total, CAST(sum(cnt) AS BIGINT) AS n,
          sum(CAST(cnt AS HUGEINT) * d2) AS m
        FROM cells GROUP BY status, n_total),
      s AS (SELECT sum(m) AS s_mass FROM groups)
      SELECT status, n,
        CAST(m * n_total * 1000000 // (n * s_mass) AS BIGINT) AS disp_ppm
      FROM groups CROSS JOIN s ORDER BY status
    """))

  def defs: Seq[QueryDef] = Seq(q693, q694, q695)
}
