package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 6: econometric identification — continuous-instrument
  * 2SLS (vs OLS, with first-stage strength), an event-study DID with
  * leads and lags, synthetic control over an explicit simplex weight
  * grid, and discrete-time competing-risks cumulative incidence. All
  * exact integer arithmetic (decimal(38,0) moment guards, ppm fixed
  * point, sequential folds with documented truncation order) with total
  * ORDER BYs for the oracle gate.
  */
object EconPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q614

  /** Two-stage least squares with a continuous instrument: demand
    * (quantity) on unit price is endogenous — price moves with demand
    * shocks — so the slope is instrumented by part size (a supply-side
    * cost shifter uncorrelated with order-level demand shocks by
    * construction). Just-identified IV: β = (nΣzy − ΣzΣy)/(nΣzx − ΣzΣx)
    * against the OLS β = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), plus the
    * first-stage slope (x on z) — the weak-instrument tell. q399's
    * Wald estimator is the binary-instrument special case; this is the
    * continuous one, all moments exact in decimal(38,0).
    *
    * Scale shape: one lineitem ⋈ broadcast(part) scan folds to a
    * single moment row (the q544 normal-equations discipline); the
    * readout is one row of exact micro-slopes. */
  private val q614 = QueryDef(
    "q614_two_stage_least_squares",
    (spark, dir) => {
      val rows = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_size").cast("long").as("z"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("z"),
          expr("CAST(l_quantity AS BIGINT)").as("y"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)" +
            " div CAST(l_quantity AS BIGINT)").as("x"))
      val m = rows.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * x")).as("szx"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * y")).as("szy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("szz"))
      m.select(col("n"),
          expr("""CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
            DIV (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("beta_ols_micro"),
          expr("""CAST((n * szy - CAST(sz AS DECIMAL(38,0)) * sy) * 1000000
            DIV (n * szx - CAST(sz AS DECIMAL(38,0)) * sx) AS BIGINT)""")
            .as("beta_iv_micro"),
          expr("""CAST((n * szx - CAST(sz AS DECIMAL(38,0)) * sx) * 1000000
            DIV (n * szz - CAST(sz AS DECIMAL(38,0)) * sz) AS BIGINT)""")
            .as("first_stage_slope_micro"))
    },
    Some("""
      WITH rows_ AS (
        SELECT CAST(p_size AS BIGINT) AS z,
          CAST(l_quantity AS BIGINT) AS y,
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
            // CAST(l_quantity AS BIGINT) AS x
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(z) AS BIGINT) AS sz,
          sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy,
          sum(CAST(z AS HUGEINT) * x) AS szx, sum(CAST(z AS HUGEINT) * y) AS szy,
          sum(CAST(z AS HUGEINT) * z) AS szz
        FROM rows_)
      SELECT n,
        CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
          // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS beta_ols_micro,
        CAST((n * szy - CAST(sz AS HUGEINT) * sy) * 1000000
          // (n * szx - CAST(sz AS HUGEINT) * sx) AS BIGINT) AS beta_iv_micro,
        CAST((n * szx - CAST(sz AS HUGEINT) * sx) * 1000000
          // (n * szz - CAST(sz AS HUGEINT) * sz) AS BIGINT)
          AS first_stage_slope_micro
      FROM m
    """))

  // ---------------------------------------------------------------- q615

  /** Event-study difference-in-differences with leads and lags: treated
    * cohort = even-nation customers, pseudo-event at 1995-07, outcome =
    * mean order value per (group, calendar month). Each relative month
    * r ∈ [−3, +3] reports the treated−control gap and the DID effect
    * normalized to r = −1 (the event-study convention: pre-period
    * effects ≈ 0 certify parallel trends; here the event is a placebo,
    * so flat lags AND leads are the expected, auditable readout —
    * q240's two-period DID cannot show pre-trends at all).
    *
    * Scale shape: orders ⋈ broadcast(customer-group map) folds to
    * (group, month) cells; everything after is arithmetic on ≤ 14
    * cells against the r = −1 baseline broadcast. */
  private val q615 = QueryDef(
    "q615_event_study_did",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), (col("c_nationkey") % 2 === 0).as("treated"))
      val cells = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-04-01" && col("o_orderdate") < "1995-11-01")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("treated"),
          expr("CAST(month(CAST(o_orderdate AS DATE)) - 7 AS BIGINT)").as("rel_month"),
          graft.functions.Deterministic.cents(col("o_totalprice")).as("c"))
        .groupBy(col("rel_month"), col("treated"))
        .agg(count(lit(1)).as("n"), expr("sum(c) div count(1)").as("mean_cents"))
      val diffs = cells.groupBy(col("rel_month"))
        .agg(
          max(when(col("treated"), col("mean_cents"))).as("treated_mean"),
          max(when(!col("treated"), col("mean_cents"))).as("control_mean"),
          sum(when(col("treated"), col("n")).otherwise(0L)).as("n_treated"),
          sum(when(!col("treated"), col("n")).otherwise(0L)).as("n_control"))
        .withColumn("diff_cents", col("treated_mean") - col("control_mean"))
      val base = diffs.filter(col("rel_month") === -1L)
        .select(col("diff_cents").as("base_diff"))
      diffs.crossJoin(broadcast(base))
        .select(col("rel_month"), col("n_treated"), col("n_control"),
          col("diff_cents"),
          (col("diff_cents") - col("base_diff")).as("effect_cents"))
        .orderBy(col("rel_month"))
    },
    Some("""
      WITH cells AS (
        SELECT CAST(month(CAST(o_orderdate AS DATE)) - 7 AS BIGINT) AS rel_month,
          c_nationkey % 2 = 0 AS treated,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // count(*)
            AS BIGINT) AS mean_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1995-04-01'
          AND o_orderdate < TIMESTAMP '1995-11-01'
        GROUP BY 1, 2),
      diffs AS (
        SELECT rel_month,
          max(CASE WHEN treated THEN mean_cents END)
            - max(CASE WHEN NOT treated THEN mean_cents END) AS diff_cents,
          CAST(sum(CASE WHEN treated THEN n ELSE 0 END) AS BIGINT) AS n_treated,
          CAST(sum(CASE WHEN NOT treated THEN n ELSE 0 END) AS BIGINT) AS n_control
        FROM cells GROUP BY rel_month),
      base AS (SELECT diff_cents AS base_diff FROM diffs WHERE rel_month = -1)
      SELECT rel_month, n_treated, n_control,
        CAST(diff_cents AS BIGINT) AS diff_cents,
        CAST(diff_cents - base_diff AS BIGINT) AS effect_cents
      FROM diffs CROSS JOIN base ORDER BY rel_month
    """))

  // ---------------------------------------------------------------- q616

  /** Synthetic control over an explicit simplex grid: nation 0's
    * monthly 1995 revenue is matched by a convex combination of three
    * donor nations (1, 2, 3), weights searched over the 66-point
    * simplex grid in 10% steps; the SSE-minimal weights (ties broken
    * by (w1, w2)) then produce the 1996 counterfactual, and the
    * monthly actual−synthetic gap is the estimated effect — the
    * comparative-case-study estimator, with the weight search made
    * exact and enumerable instead of an opaque optimizer.
    *
    * Scale shape: orders ⋈ broadcast(nation map) fold to (nation,
    * month) cells — 4 nations × 24 months; the 66-combo grid explodes
    * from literals and scores on the 12-month pre-period (792 rows);
    * argmin is a one-row min(struct) broadcast. */
  private val q616 = QueryDef(
    "q616_synthetic_control_grid",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
        .filter(col("c_nationkey") <= 3)
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nat"))
      val cells = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1997-01-01")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("nat"),
          expr("CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12" +
            " + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT)").as("m"),
          graft.functions.Deterministic.cents(col("o_totalprice")).as("c"))
        .groupBy(col("nat"), col("m")).agg(sum(col("c")).as("rev"))
        .persist()
      val wide = cells.groupBy(col("m"))
        .agg(coalesce(max(when(col("nat") === 0L, col("rev"))), lit(0L)).as("y"),
          coalesce(max(when(col("nat") === 1L, col("rev"))), lit(0L)).as("d1"),
          coalesce(max(when(col("nat") === 2L, col("rev"))), lit(0L)).as("d2"),
          coalesce(max(when(col("nat") === 3L, col("rev"))), lit(0L)).as("d3"))
      val combos = Tables.region(spark, dir).limit(1) // one-row seed
        .select(explode(expr("sequence(0, 10)")).as("i"))
        .select(col("i"), explode(expr("sequence(0, 10 - i)")).as("j"))
        .select((col("i") * 100L).as("w1"), (col("j") * 100L).as("w2"),
          (lit(1000L) - col("i") * 100L - col("j") * 100L).as("w3"))
      val synth = expr("(w1 * d1 + w2 * d2 + w3 * d3) div 1000")
      val best = wide.filter(col("m") < 12L).crossJoin(broadcast(combos))
        .select(col("w1"), col("w2"), col("w3"),
          expr("CAST(y - (w1 * d1 + w2 * d2 + w3 * d3) div 1000 AS DECIMAL(38,0))")
            .as("e"))
        .groupBy(col("w1"), col("w2"), col("w3"))
        .agg(sum(expr("e * e")).as("sse"))
        .agg(min(struct(col("sse"), col("w1"), col("w2"), col("w3"))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"), col("b.w3").as("w3"))
      wide.filter(col("m") >= 12L).crossJoin(broadcast(best))
        .select((col("m") - 12L).as("post_month"), col("y").as("actual_cents"),
          synth.as("synthetic_cents"),
          (col("y") - synth).as("gap_cents"),
          col("w1"), col("w2"), col("w3"))
        .orderBy(col("post_month"))
    },
    Some("""
      WITH cells AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nat,
          CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12
            + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS m,
          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
            AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey <= 3
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2),
      wide AS (
        SELECT m,
          coalesce(max(CASE WHEN nat = 0 THEN rev END), 0) AS y,
          coalesce(max(CASE WHEN nat = 1 THEN rev END), 0) AS d1,
          coalesce(max(CASE WHEN nat = 2 THEN rev END), 0) AS d2,
          coalesce(max(CASE WHEN nat = 3 THEN rev END), 0) AS d3
        FROM cells GROUP BY m),
      combos AS (
        SELECT CAST(i.i * 100 AS BIGINT) AS w1, CAST(j.j * 100 AS BIGINT) AS w2,
          CAST(1000 - i.i * 100 - j.j * 100 AS BIGINT) AS w3
        FROM (SELECT unnest(range(0, 11)) AS i) i,
          LATERAL (SELECT unnest(range(0, 11 - i.i)) AS j) j),
      scored AS (
        SELECT w1, w2, w3,
          sum(CAST(y - (w1 * d1 + w2 * d2 + w3 * d3) // 1000 AS HUGEINT)
            * CAST(y - (w1 * d1 + w2 * d2 + w3 * d3) // 1000 AS HUGEINT)) AS sse
        FROM wide CROSS JOIN combos WHERE m < 12
        GROUP BY 1, 2, 3),
      best AS (
        SELECT w1, w2, w3 FROM scored
        ORDER BY sse, w1, w2 LIMIT 1)
      SELECT CAST(m - 12 AS BIGINT) AS post_month,
        CAST(y AS BIGINT) AS actual_cents,
        CAST((w1 * d1 + w2 * d2 + w3 * d3) // 1000 AS BIGINT) AS synthetic_cents,
        CAST(y - (w1 * d1 + w2 * d2 + w3 * d3) // 1000 AS BIGINT) AS gap_cents,
        w1, w2, w3
      FROM wide CROSS JOIN best WHERE m >= 12 ORDER BY post_month
    """))

  // ---------------------------------------------------------------- q617

  /** Discrete-time competing-risks cumulative incidence (Aalen–
    * Johansen in weekly bins): per user, the clock starts at their
    * first event; the competing terminal events are the first
    * HIGH-SEVERITY purchase vs error (value ≥ 150 — rare enough that
    * exits spread over weeks instead of collapsing into week 0),
    * censoring at the stream's end. Weekly cause-specific
    * hazards give S(w) = S(w−1)·(1 − (dₚ+dₑ)/n(w)) and CIFₖ(w) +=
    * S(w−1)·dₖ/n(w) — computed by ONE sequential fold over the
    * week-ordered risk table with ppm truncation at every step
    * (identical order in both engines), because naive 1−KM per cause
    * overstates incidence when risks compete (the classic Gooley
    * pitfall). q334's Kaplan–Meier is the single-risk special case.
    *
    * Scale shape: events fold to one row per user (first-event
    * arithmetic), then to ≤ ~120 weekly rows; the fold runs over that
    * calendar-bounded array on one row. */
  private val q617 = QueryDef(
    "q617_competing_risks_cif",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("value"),
          epochS(col("ts")).as("es"))
      val horizon = ev.agg(max(col("es")).as("h"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(col("es")).as("origin"),
          min(when(col("event_type") === "purchase"
            && col("value") >= 150, col("es"))).as("tp"),
          min(when(col("event_type") === "error"
            && col("value") >= 150, col("es"))).as("te"))
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          expr("""CASE
              WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 'purchase'
              WHEN te IS NOT NULL THEN 'error'
              ELSE 'censored' END""").as("cause"),
          expr("""(CASE
              WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN tp
              WHEN te IS NOT NULL THEN te
              ELSE h END - origin) div 604800""").as("week"))
      val weekly = perUser.groupBy(col("week"))
        .agg(sum(when(col("cause") === "purchase", 1L).otherwise(0L)).as("dp"),
          sum(when(col("cause") === "error", 1L).otherwise(0L)).as("de"),
          count(lit(1)).as("exits"))
      // n at risk in week w = users whose exit week >= w
      val tot = perUser.agg(count(lit(1)).as("n_users"))
      val risk = weekly.crossJoin(broadcast(tot))
        .withColumn("cum_before", coalesce(sum(col("exits")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("week"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
        .withColumn("n_risk", col("n_users") - col("cum_before"))
        .select(col("week"), col("dp"), col("de"), col("n_risk"))
      // sequential fold, ppm truncation per step, week-ascending order
      risk.agg(sort_array(collect_list(struct(col("week"), col("dp"),
          col("de"), col("n_risk")))).as("arr"))
        .select(expr(
          """aggregate(arr,
               named_struct('s', 1000000L,
                 'out', CAST(array() AS ARRAY<STRUCT<week: BIGINT, n_risk: BIGINT,
                   d_purchase: BIGINT, d_error: BIGINT, surv_ppm: BIGINT,
                   cif_purchase_ppm: BIGINT, cif_error_ppm: BIGINT>>),
                 'cp', 0L, 'ce', 0L),
               (acc, x) -> named_struct(
                 's', acc.s - acc.s * (x.dp + x.de) div greatest(x.n_risk, 1L),
                 'out', concat(acc.out, array(named_struct(
                   'week', x.week, 'n_risk', x.n_risk,
                   'd_purchase', x.dp, 'd_error', x.de,
                   'surv_ppm', acc.s - acc.s * (x.dp + x.de) div greatest(x.n_risk, 1L),
                   'cif_purchase_ppm', acc.cp + acc.s * x.dp div greatest(x.n_risk, 1L),
                   'cif_error_ppm', acc.ce + acc.s * x.de div greatest(x.n_risk, 1L)))),
                 'cp', acc.cp + acc.s * x.dp div greatest(x.n_risk, 1L),
                 'ce', acc.ce + acc.s * x.de div greatest(x.n_risk, 1L))).out""")
          .as("rows"))
        .select(explode(col("rows")).as("r"))
        .select(col("r.week").as("week"), col("r.n_risk").as("n_risk"),
          col("r.d_purchase").as("d_purchase"), col("r.d_error").as("d_error"),
          col("r.surv_ppm").as("surv_ppm"),
          col("r.cif_purchase_ppm").as("cif_purchase_ppm"),
          col("r.cif_error_ppm").as("cif_error_ppm"))
        .orderBy(col("week"))
    },
    Some("""
      WITH RECURSIVE ev AS (
        SELECT user_id, event_type, value, epoch_ms(ts) // 1000 AS es
        FROM events),
      h AS (SELECT CAST(max(es) AS BIGINT) AS h FROM ev),
      pu AS (
        SELECT user_id,
          CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 'purchase'
               WHEN te IS NOT NULL THEN 'error' ELSE 'censored' END AS cause,
          (CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN tp
                WHEN te IS NOT NULL THEN te ELSE h.h END - origin) // 604800
            AS week
        FROM (SELECT user_id, min(es) AS origin,
                min(CASE WHEN event_type = 'purchase' AND value >= 150
                  THEN es END) AS tp,
                min(CASE WHEN event_type = 'error' AND value >= 150
                  THEN es END) AS te
              FROM ev GROUP BY user_id) u CROSS JOIN h),
      weekly AS (
        SELECT week,
          CAST(sum(CASE WHEN cause = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
            AS dp,
          CAST(sum(CASE WHEN cause = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS de,
          CAST(count(*) AS BIGINT) AS exits
        FROM pu GROUP BY week),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM pu),
      risk AS (
        SELECT week, dp, de,
          CAST(n_users - coalesce(sum(exits) OVER (ORDER BY week
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS n_risk,
          row_number() OVER (ORDER BY week) AS rn
        FROM weekly CROSS JOIN tot),
      rec AS (
        SELECT rn, week, dp, de, n_risk,
          CAST(1000000 - 1000000 * (dp + de) // greatest(n_risk, 1) AS BIGINT)
            AS s,
          CAST(1000000 * dp // greatest(n_risk, 1) AS BIGINT) AS cp,
          CAST(1000000 * de // greatest(n_risk, 1) AS BIGINT) AS ce
        FROM risk WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.week, r.dp, r.de, r.n_risk,
          CAST(rec.s - rec.s * (r.dp + r.de) // greatest(r.n_risk, 1) AS BIGINT),
          CAST(rec.cp + rec.s * r.dp // greatest(r.n_risk, 1) AS BIGINT),
          CAST(rec.ce + rec.s * r.de // greatest(r.n_risk, 1) AS BIGINT)
        FROM risk r JOIN rec ON r.rn = rec.rn + 1)
      SELECT week, n_risk, dp AS d_purchase, de AS d_error,
        s AS surv_ppm, cp AS cif_purchase_ppm, ce AS cif_error_ppm
      FROM rec ORDER BY week
    """))

  override def defs: Seq[QueryDef] = Seq(q614, q615, q616, q617)
}
