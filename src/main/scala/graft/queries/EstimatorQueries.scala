package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-4 estimator/planner operators: the AMS F2 sketch baked off
  * against the exact self-join size, System-R left-deep join-order
  * enumeration driven by live statistics, and SAX symbolization with
  * motif counting over the revenue series — the sketch, the optimizer
  * and the time-series synopsis an engine runs ON ITSELF, deterministic
  * for the oracle gate.
  */
object EstimatorQueries extends QueryGroup {

  /** Nine independent Knuth multipliers (odd, < 2^32) — distinct hash
    * streams for the AMS sign estimators, same construction as
    * [[graft.operators.Sampling.keyHash]]. */
  private val AmsMults = Seq(
    2654435761L, 2246822519L, 3266489917L, 668265263L, 374761393L,
    1540483477L, 2971215073L, 2166136261L, 16777619L)

  // ---------------------------------------------------------------- q422

  /** AMS (Alon–Matias–Szegedy) F2 sketch of the `l_partkey` frequency
    * vector, head-to-head against the exact second moment Σₖ nₖ² (= the
    * self-join size q289 estimates by formula): nine ±1 sign streams
    * gᵢ(k), Xᵢ = Σ_rows gᵢ(k), estimate = median of 3 means of 3 Xᵢ² —
    * the one-pass, O(1)-state join-size estimator every streaming
    * planner carries. The sign hash needs avalanche, not just
    * uniformity: a bare Knuth-multiply high bit is a low-discrepancy
    * sequence over dense integer keys, which cancels Σgᵢ(k) far below
    * its random variance and biases the sketch ~25× low (measured) —
    * so each stream is multiply → xor-shift → multiply. Pure integer.
    *
    * Scale shape: the sketch is ONE scan folding to a single 9-column
    * row (each Xᵢ a map-side sum partial — no per-key state at all);
    * the exact answer needs the keyed count aggregate. Xᵢ is bounded by
    * row count, so Xᵢ² fits a long through ~3·10⁹ rows; beyond that
    * evaluate the squares in decimal(38,0). */
  private val q422 = QueryDef(
    "q422_ams_f2_sketch",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir).select(col("l_partkey").as("k"))
      def sign(m: Long) = {
        val h1 = s"(((k % 2147483648) * ${m}L) % 4294967296)"
        val h2 = s"($h1 ^ ($h1 div 65536))"
        val h3 = s"((($h2 % 2147483648) * 2654435761L) % 4294967296)"
        expr(s"1L - 2L * ($h3 div 2147483648)")
      }
      val xs = li.agg(
        sum(sign(AmsMults.head)).as("x0"),
        AmsMults.tail.zipWithIndex.map { case (m, i) =>
          sum(sign(m)).as(s"x${i + 1}")
        }: _*)
      val gm = (0 until 3).map(g =>
        s"(${(0 until 3).map(j => s"x${3 * g + j} * x${3 * g + j}").mkString(" + ")}) div 3")
      val sq = (0 until 9).map(i => s"x$i * x$i")
      val sketch = xs.select(
        expr(s"array_sort(array(${gm.mkString(", ")}))[1]").as("ams_mom"),
        expr(s"(${sq.mkString(" + ")}) div 9").as("ams_mean"))
      val exact = li.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * n")).as("exact_f2"))
      exact.crossJoin(broadcast(sketch))
        .select(col("exact_f2"), col("ams_mom"), col("ams_mean"),
          expr("abs(ams_mom - exact_f2) * 1000000 div exact_f2")
            .as("mom_err_ppm"),
          expr("abs(ams_mean - exact_f2) * 1000000 div exact_f2")
            .as("mean_err_ppm"))
    },
    Some {
      val signs = AmsMults.zipWithIndex.map { case (m, i) =>
        val h1 = s"(((l_partkey % 2147483648) * $m) % 4294967296)"
        val h2 = s"(xor($h1, $h1 // 65536))"
        val h3 = s"((($h2 % 2147483648) * 2654435761) % 4294967296)"
        s"CAST(sum(1 - 2 * ($h3 // 2147483648)) AS BIGINT) AS x$i"
      }.mkString(",\n          ")
      val gm = (0 until 3).map(g =>
        s"(${(0 until 3).map(j => s"x${3 * g + j} * x${3 * g + j}").mkString(" + ")}) // 3")
        .mkString(", ")
      val sq = (0 until 9).map(i => s"x$i * x$i").mkString(" + ")
      s"""
      WITH xs AS (
        SELECT
          $signs
        FROM lineitem),
      sk AS (
        SELECT CAST(list_sort([$gm])[2] AS BIGINT) AS ams_mom,
          CAST(($sq) // 9 AS BIGINT) AS ams_mean
        FROM xs),
      exact AS (
        SELECT CAST(sum(n * n) AS BIGINT) AS exact_f2
        FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_partkey))
      SELECT exact_f2, ams_mom, ams_mean,
        CAST(abs(ams_mom - exact_f2) * 1000000 // exact_f2 AS BIGINT)
          AS mom_err_ppm,
        CAST(abs(ams_mean - exact_f2) * 1000000 // exact_f2 AS BIGINT)
          AS mean_err_ppm
      FROM exact CROSS JOIN sk
    """
    })

  // ---------------------------------------------------------------- q423

  /** System-R left-deep join-order enumeration over the
    * customer⋈orders⋈lineitem chain, driven by LIVE statistics: row
    * counts and exact key NDVs feed the textbook estimate |A⋈B| =
    * |A|·|B| div max(d_A, d_B) (q289 audits that formula's error;
    * q277 prices the broadcast decision), every connected left-deep
    * permutation is costed as Σ intermediate rows, and the argmin is
    * flagged — the optimizer-as-a-query: what Catalyst's CBO does at
    * plan time, run as a plan. Disconnected prefixes (customer×lineitem
    * first) are excluded, exactly as a CBO prunes cross products.
    *
    * Scale shape: three narrow count/NDV aggregates (map-side partials)
    * cross-joined into ONE stats row; the 4-row enumeration explodes
    * from that single broadcast row — the search is driver-free and
    * costs nothing at any corpus size. Triple products fit a long
    * through ~SF 1000; beyond, decimal(38,0). */
  private val q423 = QueryDef(
    "q423_join_order_enum",
    (spark, dir) => {
      val sC = Tables.customer(spark, dir)
        .agg(count(lit(1)).as("n_c"), countDistinct(col("c_custkey")).as("d_cc"))
      val sO = Tables.orders(spark, dir)
        .agg(count(lit(1)).as("n_o"), countDistinct(col("o_custkey")).as("d_oc"),
          countDistinct(col("o_orderkey")).as("d_oo"))
      val sL = Tables.lineitem(spark, dir)
        .agg(count(lit(1)).as("n_l"), countDistinct(col("l_orderkey")).as("d_lo"))
      val stats = sC.crossJoin(broadcast(sO)).crossJoin(broadcast(sL))
        .select(col("*"),
          expr("n_c * n_o div greatest(d_cc, d_oc)").as("est_co"),
          expr("n_o * n_l div greatest(d_oo, d_lo)").as("est_ol"))
        .select(col("*"),
          expr("est_co * n_l div greatest(d_oo, d_lo)").as("est_full"))
      val plans = stats.select(explode(array(
        struct(lit("customer*orders->lineitem").as("join_order"),
          col("est_co").as("step1_rows_est")),
        struct(lit("orders*customer->lineitem").as("join_order"),
          col("est_co").as("step1_rows_est")),
        struct(lit("orders*lineitem->customer").as("join_order"),
          col("est_ol").as("step1_rows_est")),
        struct(lit("lineitem*orders->customer").as("join_order"),
          col("est_ol").as("step1_rows_est")))).as("p"),
        col("est_full").as("full_rows_est"))
        .select(col("p.join_order"), col("p.step1_rows_est"),
          col("full_rows_est"),
          (col("p.step1_rows_est") + col("full_rows_est")).as("cost_est"))
      val best = plans.agg(min(col("cost_est")).as("best_cost"))
      plans.crossJoin(broadcast(best))
        .select(col("join_order"), col("step1_rows_est"), col("full_rows_est"),
          col("cost_est"),
          when(col("cost_est") === col("best_cost"), 1L).otherwise(0L)
            .as("is_best"))
        .orderBy(col("cost_est"), col("join_order"))
    },
    Some("""
      WITH sc AS (
        SELECT CAST(count(*) AS BIGINT) AS n_c,
          CAST(count(DISTINCT c_custkey) AS BIGINT) AS d_cc FROM customer),
      so AS (
        SELECT CAST(count(*) AS BIGINT) AS n_o,
          CAST(count(DISTINCT o_custkey) AS BIGINT) AS d_oc,
          CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_oo FROM orders),
      sl AS (
        SELECT CAST(count(*) AS BIGINT) AS n_l,
          CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d_lo FROM lineitem),
      st AS (
        SELECT *,
          n_c * n_o // greatest(d_cc, d_oc) AS est_co,
          n_o * n_l // greatest(d_oo, d_lo) AS est_ol
        FROM sc CROSS JOIN so CROSS JOIN sl),
      st2 AS (
        SELECT *, est_co * n_l // greatest(d_oo, d_lo) AS est_full FROM st),
      plans AS (
        SELECT o.join_order,
          CASE WHEN o.first_pair = 'co' THEN est_co ELSE est_ol END
            AS step1_rows_est,
          est_full AS full_rows_est,
          CASE WHEN o.first_pair = 'co' THEN est_co ELSE est_ol END + est_full
            AS cost_est
        FROM st2 CROSS JOIN (VALUES
          ('customer*orders->lineitem', 'co'),
          ('orders*customer->lineitem', 'co'),
          ('orders*lineitem->customer', 'ol'),
          ('lineitem*orders->customer', 'ol')) AS o(join_order, first_pair)),
      best AS (SELECT min(cost_est) AS best_cost FROM plans)
      SELECT join_order, step1_rows_est, full_rows_est, cost_est,
        CAST(CASE WHEN cost_est = best_cost THEN 1 ELSE 0 END AS BIGINT)
          AS is_best
      FROM plans CROSS JOIN best
      ORDER BY cost_est, join_order
    """))

  // ---------------------------------------------------------------- q424

  /** SAX (symbolic aggregate approximation) of the first 240 days of
    * order revenue: PAA folds 4-day frames to integer cent sums, the 60
    * frame values map to a 4-letter alphabet by empirical quartile
    * (ntile over a deterministic total order — the distribution-free
    * cousin of SAX's Gaussian breakpoints), and consecutive-frame
    * trigrams are counted as motifs — the symbolic synopsis that turns
    * a numeric series into countable, indexable patterns (q420's Haar
    * coefficients are the numeric view of the same hierarchy).
    *
    * Scale shape: one orders scan folds to ≤ 240 (day, cents) rows; the
    * dense grid, PAA, ntile and trigram lead() all run on that
    * calendar-sized table — the unpartitioned windows span ≤ 60 rows by
    * construction. */
  private val q424 = QueryDef(
    "q424_sax_motifs",
    (spark, dir) => {
      val daily = Tables.orders(spark, dir)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      val d0 = daily.agg(min(col("day")).as("d0"))
      val idx = daily.crossJoin(broadcast(d0))
        .select(datediff(col("day"), col("d0")).cast("long").as("d"), col("rev_c"))
        .filter(col("d") < 240)
      val grid = spark.range(0, 240).select(col("id").as("d"))
        .join(idx, Seq("d"), "left")
        .select(col("d"), coalesce(col("rev_c"), lit(0L)).as("v"))
      val paa = grid.groupBy(expr("d div 4").as("f"))
        .agg(sum(col("v")).as("paa_c"))
      val sym = paa.withColumn("s",
        (ntile(4).over(Window.orderBy(col("paa_c"), col("f"))) - 1).cast("long"))
      val wF = Window.orderBy(col("f"))
      val tri = sym
        .withColumn("s1", lead(col("s"), 1).over(wF))
        .withColumn("s2", lead(col("s"), 2).over(wF))
        .filter(col("s1").isNotNull && col("s2").isNotNull)
        .select(concat(col("s"), lit(","), col("s1"), lit(","), col("s2"))
          .as("motif"))
      tri.groupBy(col("motif")).agg(count(lit(1)).as("n_frames"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_frames").desc, col("motif"))).cast("long"))
        .orderBy(col("rk"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
      d0 AS (SELECT min(day) AS d0 FROM daily),
      idx AS (
        SELECT date_diff('day', d0, day) AS d, rev_c
        FROM daily CROSS JOIN d0
        WHERE date_diff('day', d0, day) < 240),
      grid AS (
        SELECT g.d, coalesce(i.rev_c, 0) AS v
        FROM (SELECT unnest(range(0, 240)) AS d) g
        LEFT JOIN idx i USING (d)),
      paa AS (
        SELECT d // 4 AS f, CAST(sum(v) AS BIGINT) AS paa_c
        FROM grid GROUP BY 1),
      sym AS (
        SELECT f, ntile(4) OVER (ORDER BY paa_c, f) - 1 AS s FROM paa),
      tri AS (
        SELECT s, lead(s, 1) OVER (ORDER BY f) AS s1,
          lead(s, 2) OVER (ORDER BY f) AS s2
        FROM sym),
      motifs AS (
        SELECT s || ',' || s1 || ',' || s2 AS motif,
          CAST(count(*) AS BIGINT) AS n_frames
        FROM tri WHERE s1 IS NOT NULL AND s2 IS NOT NULL
        GROUP BY 1)
      SELECT motif, n_frames,
        CAST(row_number() OVER (ORDER BY n_frames DESC, motif) AS BIGINT) AS rk
      FROM motifs
      ORDER BY rk
    """))

  override def defs: Seq[QueryDef] = Seq(q422, q423, q424)
}
