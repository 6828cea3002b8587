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
  // (s2_j = doubled-rank sum of group j; the ⌊·⌋ is exact integer floor
  // on both sides — Spark folds it in decimal(38,0) via the
  // subtract-remainder form (s2²−s2²%n)/n because `div`'s BIGINT result
  // would overflow at s2²/n ≈ 1.3N³ > 2⁶³, i.e. N ≈ 2·10⁶ ≈ sf0.3;
  // DuckDB's HUGEINT `//` is exact natively), TT = Σ_v (t³−t) the tie
  // correction. One expression text, evaluated over exact integers.
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
    * Exactness ceiling (binding constraints): s2_j² must fit
    * decimal(38,0)/HUGEINT (s2_j ≈ 0.67N² → N ≲ 4·10⁹) and the
    * emitted r2_sum = s2_j must fit BIGINT (N ≲ 3.7·10⁹) — both
    * ≈ sf500. The T-fold itself stays in decimal(38,0) end-to-end
    * (T ≈ 1.3N³ fits to N ≈ 4·10¹²), never BIGINT. */
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
          // exact ⌊s2²/n⌋ in decimal(38,0): subtract the remainder, then
          // the division is exact (no rounding); `div` would emit BIGINT
          // and overflow at N ≈ 2·10⁶ (≈ sf0.3) while decimal carries
          // T ≈ 1.3N³ to N ≈ 4·10¹²
          sum(expr("CAST((s2*s2 - (s2*s2) % n) / n AS DECIMAL(38,0))"))
            .as("t_sum"))
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
  // vb = g3·t3 and vc = g2·t2 are cast to DOUBLE factor-by-factor and
  // multiplied in IEEE: the exact decimal product vb ≈ N⁶/3000 breaches
  // decimal(38,0)/HUGEINT around sf2-3, while the factors g3 ≈ N³/25 and
  // t3 ≈ N³/120 each fit to N ≈ 10¹³. For factors < 2⁵³ the IEEE product
  // rounds identically to casting the exact product, so tested SFs are
  // bit-identical either way; both engines share this expression text.
  private val jtCastExprs: Seq[String] = Seq(
    "CAST(jt2 AS DOUBLE) AS fjt2", "CAST(e2 AS DOUBLE) AS fe2",
    "CAST(va AS DOUBLE) AS fva",
    "CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE) AS fvb",
    "CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE) AS fvc",
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
    * cells, dimension-sized moment folds. Exactness ceiling (binding
    * constraints): the emitted jt2 ≈ 0.8N² and e2 ≈ 0.4N² must fit
    * BIGINT → N ≲ 3·10⁹ ≈ sf500; the decimal moment folds (va terms
    * ≈ 2N³, g3/t3 ≈ N³/25) hold far beyond that (N ≲ 10¹²). */
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
          "g3", "t3", "g2", "t2")
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
          g3, t3, g2, t2
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

  // ---------------------------------------------------------------- q696

  // z = (L − b·k(k+1)²/4) / sqrt(b·k²(k+1)(k²−1)/144), evaluated once
  // over exact integers (L, b, k) — the shared-expression discipline.
  private val pageCastExprs: Seq[String] = Seq(
    "CAST(l_stat AS DOUBLE) AS fl", "CAST(n_blocks AS DOUBLE) AS fb",
    "CAST(k_treat AS DOUBLE) AS fk")
  private val pageZExpr: String =
    """(fl - fb*fk*(fk+1.0)*(fk+1.0)/4.0)
       / sqrt(fb*fk*fk*(fk+1.0)*(fk*fk-1.0)/144.0) AS z_stat"""

  /** Page's L trend test: across the 25 nation blocks, do the six full
    * order years (1995–2000) show a MONOTONE revenue trend? Within each
    * block the six year-revenues are ranked (deterministic year
    * tiebreak — cents totals tie with probability ~0) and
    * L = Σ_j j·R_j weights the per-year rank sums by the hypothesized
    * order; the ordered alternative is what Friedman's unordered χ²
    * (and q642's W) cannot see.
    *
    * Scale shape: the orders⋈customer key join is the only row-scale
    * work, folded immediately to the 25×6 (nation, year) revenue
    * panel; the rank window partitions by nation over 6-row frames;
    * the L fold and z readout are one-row. Exact integers throughout —
    * cents revenue, integer ranks, integer L. */
  private val q696 = QueryDef(
    "q696_pages_l_trend",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      val panel = Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")).between(1995, 2000))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("rev"))
      val wr = Window.partitionBy(col("nat"))
        .orderBy(col("rev"), col("yr"))
      val ranked = panel.select(col("nat"), col("yr"),
        rank().over(wr).cast("long").as("r"))
      val perYear = ranked.groupBy(col("yr"))
        .agg(sum(col("r")).as("r_sum"), count(lit(1)).as("n_blocks"))
      val l = perYear
        .agg(sum((col("yr") - 1994) * col("r_sum")).as("l_stat"),
          max(col("n_blocks")).as("n_blocks"),
          count(lit(1)).as("k_treat"))
      perYear.select(col("yr"), col("r_sum"))
        .crossJoin(broadcast(l
          .selectExpr(Seq("l_stat") ++ pageCastExprs: _*)
          .selectExpr("l_stat", pageZExpr)))
        .orderBy(col("yr"))
    },
    Some(s"""
      WITH panel AS (
        SELECT c_nationkey AS nat, CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
            AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE year(o_orderdate) BETWEEN 1995 AND 2000
        GROUP BY nat, yr),
      ranked AS (
        SELECT nat, yr,
          CAST(rank() OVER (PARTITION BY nat ORDER BY rev, yr) AS BIGINT)
            AS r
        FROM panel),
      per_year AS (
        SELECT yr, CAST(sum(r) AS BIGINT) AS r_sum,
          CAST(count(*) AS BIGINT) AS n_blocks
        FROM ranked GROUP BY yr),
      l AS (
        SELECT CAST(sum((yr - 1994) * r_sum) AS BIGINT) AS l_stat,
          CAST(max(n_blocks) AS BIGINT) AS n_blocks,
          CAST(count(*) AS BIGINT) AS k_treat
        FROM per_year),
      z AS (
        SELECT l_stat, ${pageCastExprs.mkString(", ")} FROM l),
      stat AS (SELECT l_stat, $pageZExpr FROM z)
      SELECT yr, r_sum, l_stat, z_stat
      FROM per_year CROSS JOIN stat ORDER BY yr
    """))

  // ---------------------------------------------------------------- q697

  /** Cochran's Q: do the three order years 1995–1997 differ in the
    * FRACTION of customers active in them, treating each customer as
    * their own control (a blocked McNemar for k > 2 — q426's pairwise
    * form can't see three-way patterns)? x_ij ∈ {0,1} = customer i
    * ordered in year j; Q = (k−1)(k·ΣG_j² − (ΣG_j)²) / (kΣL_i − ΣL_i²)
    * — every term an exact integer fold; concordant all-0/all-k blocks
    * cancel algebraically, so the customer universe needs no trimming.
    *
    * Scale shape: one distinct-projection of orders to (custkey, year)
    * — the only row-scale shuffle; G_j is a 3-row fold, the L_i moments
    * fold customer-keyed then reduce; readout is q_ppm on 3 rows. */
  private val q697 = QueryDef(
    "q697_cochran_q",
    (spark, dir) => {
      val flags = Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")).between(1995, 1997))
        .select(col("o_custkey").as("cust"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .distinct()
      val gj = flags.groupBy(col("yr")).agg(count(lit(1)).as("g"))
      val li = flags.groupBy(col("cust")).agg(count(lit(1)).as("l"))
        .agg(sum(col("l")).as("l_sum"),
          sum(col("l") * col("l")).as("l2_sum"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("discordant"))
      val q = gj.agg(sum(col("g")).as("g_sum"),
          sum(dec(col("g")) * col("g")).as("g2_sum"))
        .crossJoin(li)
        .select(col("discordant"),
          expr("""CAST((3 - 1) * (3 * g2_sum - CAST(g_sum AS DECIMAL(38,0)) * g_sum)
              * 1000000 div (3 * l_sum - l2_sum) AS BIGINT)""")
            .as("q_ppm"))
      gj.select(col("yr"), col("g"))
        .crossJoin(broadcast(q))
        .orderBy(col("yr"))
    },
    Some("""
      WITH flags AS (
        SELECT DISTINCT o_custkey AS cust,
          CAST(year(o_orderdate) AS BIGINT) AS yr
        FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1997),
      gj AS (SELECT yr, CAST(count(*) AS BIGINT) AS g
             FROM flags GROUP BY yr),
      li AS (
        SELECT CAST(sum(l) AS BIGINT) AS l_sum,
          CAST(sum(l * l) AS BIGINT) AS l2_sum,
          CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS discordant
        FROM (SELECT cust, count(*) AS l FROM flags GROUP BY cust)),
      q AS (
        SELECT discordant,
          CAST((3 - 1) * (3 * sum(CAST(g AS HUGEINT) * g)
              - CAST(sum(g) AS HUGEINT) * sum(g))
            * 1000000 // (3 * l_sum - l2_sum) AS BIGINT) AS q_ppm
        FROM gj CROSS JOIN li GROUP BY discordant, l_sum, l2_sum)
      SELECT yr, g, discordant, q_ppm
      FROM gj CROSS JOIN q ORDER BY yr
    """))

  // ---------------------------------------------------------------- q716

  // z = (w2p − S2/2) / sqrt(Var), doubled statistic: W⁺ counts doubled
  // tie-averaged ranks of |d|; E[2W⁺] = Σ2r/2 = S2/2·… kept exact and
  // evaluated once as one shared IEEE text.
  private val wilcoxonCastExprs: Seq[String] = Seq(
    "CAST(w2p AS DOUBLE) AS fw", "CAST(s2 AS DOUBLE) AS fs2",
    "CAST(s2sq AS DOUBLE) AS fs2sq")
  private val wilcoxonZExpr: String =
    // E[2W⁺] = S2/2 under H0 (each |d| rank joins W⁺ w.p. ½);
    // Var(2W⁺) = Σ (2r)²/4 = s2sq/4 → z = (w − S/2)/sqrt(s2sq/4)
    "(fw - fs2/2.0) / sqrt(fs2sq/4.0) AS z_stat"

  /** Wilcoxon signed-rank test on the (nation, month) revenue panel:
    * did revenue shift from 1995 to 1996, pairing each cell with
    * itself? The paired complement of q695/q693's independent-sample
    * tests — differences d = rev₉₆ − rev₉₅ per cell, zero diffs
    * dropped (Wilcoxon's convention), |d| ranked with tie-averaged
    * doubled ranks from the value histogram, W⁺ = Σ 2r over positive
    * d. Under H0 each rank joins W⁺ independently w.p. ½, so
    * E[2W⁺] = S/2 and Var(2W⁺) = Σ(2r)²/4 EXACTLY — ties included, no
    * lookup-table approximation.
    *
    * Scale shape: the orders⋈customer join folds once to the ≤25×12
    * panel; everything after runs on ≤300 rows (bounded global rank
    * window, sanctioned); moments are decimal(38,0). */
  private val q716 = QueryDef(
    "q716_wilcoxon_signed_rank",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      val panel = Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"),
          month(col("o_orderdate")).cast("long").as("m"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("rev"))
      val diffs = panel.groupBy(col("nat"), col("m"))
        .agg(sum(when(col("yr") === 1996, col("rev")).otherwise(0L))
          .as("r96"),
          sum(when(col("yr") === 1995, col("rev")).otherwise(0L))
            .as("r95"))
        .select((col("r96") - col("r95")).as("d"))
        .filter(col("d") =!= 0)
        .select(abs(col("d")).as("ad"),
          when(col("d") > 0, 1L).otherwise(0L).as("pos"))
      val w = Window.orderBy(col("ad"))
      val vh = diffs.groupBy(col("ad"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
        .select(col("ad"), col("c"), col("p"),
          (lit(2) * (sum(col("c")).over(w) - col("c")) + col("c") + 1)
            .as("r2"))
      vh.agg(sum(col("c")).as("n_pairs"),
          sum(dec(col("p")) * col("r2")).as("w2p"),
          sum(dec(col("c")) * col("r2")).as("s2"),
          sum(dec(col("c")) * col("r2") * col("r2")).as("s2sq"))
        .selectExpr("n_pairs", "CAST(w2p AS BIGINT) AS w2p_out",
          "CAST(s2 AS BIGINT) AS s2_out",
          "w2p", "s2", "s2sq")
        .selectExpr(Seq("n_pairs", "w2p_out", "s2_out")
          ++ wilcoxonCastExprs: _*)
        .selectExpr("n_pairs", "w2p_out AS w2_plus", "s2_out AS s2_total",
          wilcoxonZExpr)
    },
    Some(s"""
      WITH panel AS MATERIALIZED (
        SELECT c_nationkey AS nat, CAST(month(o_orderdate) AS BIGINT) AS m,
          CAST(year(o_orderdate) AS BIGINT) AS yr,
          CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY nat, m, yr),
      diffs AS (
        SELECT abs(d) AS ad,
          CAST(CASE WHEN d > 0 THEN 1 ELSE 0 END AS BIGINT) AS pos
        FROM (
          SELECT sum(CASE WHEN yr = 1996 THEN rev ELSE 0 END)
            - sum(CASE WHEN yr = 1995 THEN rev ELSE 0 END) AS d
          FROM panel GROUP BY nat, m)
        WHERE d <> 0),
      vh AS MATERIALIZED (
        SELECT ad, c, p, 2*(sum(c) OVER (ORDER BY ad) - c) + c + 1 AS r2
        FROM (SELECT ad, CAST(count(*) AS BIGINT) AS c,
                CAST(sum(pos) AS BIGINT) AS p
              FROM diffs GROUP BY ad)),
      m AS (
        SELECT CAST(sum(c) AS BIGINT) AS n_pairs,
          sum(CAST(p AS HUGEINT) * r2) AS w2p,
          sum(CAST(c AS HUGEINT) * r2) AS s2,
          sum(CAST(c AS HUGEINT) * r2 * r2) AS s2sq
        FROM vh),
      casted AS (
        SELECT n_pairs, CAST(w2p AS BIGINT) AS w2p_out,
          CAST(s2 AS BIGINT) AS s2_out,
          ${wilcoxonCastExprs.mkString(", ")}
        FROM m)
      SELECT n_pairs, w2p_out AS w2_plus, s2_out AS s2_total,
        $wilcoxonZExpr
      FROM casted
    """))

  def defs: Seq[QueryDef] = Seq(q693, q694, q695, q696, q697, q716)
}
