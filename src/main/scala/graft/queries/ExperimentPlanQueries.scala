package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 14: experimentation-platform calibration — an A/A
  * harness audit (does the test fire at its nominal rate on null
  * splits?), fixed-sequence gatekeeping (the multiplicity procedure for
  * PRE-ORDERED hypotheses), and an anytime-valid test-by-betting
  * monitor (the e-process alternative to q630's SPRT). All exact
  * integers (±1-corrected isqrt z, ppm wealth folds) with total ORDER
  * BYs for the oracle gate.
  */
object ExperimentPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q639

  /** A/A harness calibration: run the two-proportion z-test on 16
    * DETERMINISTIC null splits of the same population (independent-ish
    * hash bits of the customer key — no treatment exists, so every
    * rejection is a false positive) and compare the rejection rate to
    * the nominal α = 5%. A platform whose A/A rate runs hot has a
    * variance or interference bug that will fake lifts in every real
    * experiment — this audit is the first thing run on a new
    * assignment pipeline. z² in exact ppm via the χ²₁ identity (the
    * q417 statistic); threshold 3.841459 ppm-scaled.
    *
    * Scale shape: ONE orders scan computes all 16 splits' cells
    * (conditional sums on hash bits); the verdicts are 16-row
    * arithmetic.
    *
    * SF CEILING (round-8 note, from the round-7 advice): the χ²
    * numerator N·(ad−bc)²·10⁶ is computed in DECIMAL(38,0) (HUGEINT on
    * the oracle side). Worst case (ad−bc = N²/4) that is ~N⁵·10⁶/16,
    * which stays under 10³⁸ only for N ≲ 2.5·10⁶ orders (~sf1.5); but
    * on A/A data the statistic is O(1) by construction, so
    * (ad−bc)² ≈ D/N·χ² and the realistic numerator ≈ D·10⁶·χ² — under
    * 10³⁸ through roughly sf50 (D ≤ N⁴/16). Past that, subsample each
    * split's cells (the test's power at 10⁸ rows is absurd anyway) or
    * rescale the cells by a common factor before the multiply; a silent
    * NULL under ANSI-off is the failure mode this note exists to
    * prevent. */
  private val q639 = QueryDef(
    "q639_aa_calibration_audit",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = (0 until 16).map(_.toLong).toDF("split")
      val rows = Tables.orders(spark, dir)
        .select(col("o_custkey"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
          graft.operators.Sampling.keyHash(col("o_custkey")).as("h"))
      val cells = rows.crossJoin(broadcast(grid))
        // split s uses hash bit 8+s: high-ish bits, pairwise independent
        // enough for distinct null assignments of the SAME population
        .select(col("split"), col("y"),
          expr("CAST(h div CAST(pow(2, 8 + split) AS BIGINT) % 2 AS BIGINT)")
            .as("arm"))
        .groupBy(col("split"))
        .agg(sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("a"),
          sum(when(col("arm") === 1L, lit(1L) - col("y")).otherwise(0L)).as("b"),
          sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("c"),
          sum(when(col("arm") === 0L, lit(1L) - col("y")).otherwise(0L)).as("d"))
      val verdicts = cells.select(col("split"),
        expr("""CAST(CAST((a + b + c + d) AS DECIMAL(38,0))
            * (CAST(a * d - b * c AS DECIMAL(38,0)) * (a * d - b * c)) * 1000000
          div (CAST((a + b) * (c + d) AS DECIMAL(38,0)) * (a + c) * (b + d))
          AS BIGINT)""").as("chi2_ppm"))
        .withColumn("rejected", (col("chi2_ppm") >= 3841459L).cast("long"))
      verdicts.agg(count(lit(1)).as("n_splits"),
          sum(col("rejected")).as("n_rejected"),
          max(col("chi2_ppm")).as("max_chi2_ppm"))
        .select(col("n_splits"), col("n_rejected"),
          expr("n_rejected * 1000000 div n_splits").as("false_positive_ppm"),
          lit(50000L).as("nominal_ppm"), col("max_chi2_ppm"),
          (col("n_rejected") <= 2L).as("calibrated"))
    },
    Some("""
      WITH grid AS (SELECT unnest(range(0, 16)) AS split),
      rows_ AS (
        SELECT o_custkey,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
          (o_custkey % 2147483648) * 2654435761 % 4294967296 AS h
        FROM orders),
      cells AS (
        SELECT split,
          CAST(sum(CASE WHEN h // CAST(pow(2, 8 + split) AS BIGINT) % 2 = 1
            THEN y ELSE 0 END) AS BIGINT) AS a,
          CAST(sum(CASE WHEN h // CAST(pow(2, 8 + split) AS BIGINT) % 2 = 1
            THEN 1 - y ELSE 0 END) AS BIGINT) AS b,
          CAST(sum(CASE WHEN h // CAST(pow(2, 8 + split) AS BIGINT) % 2 = 0
            THEN y ELSE 0 END) AS BIGINT) AS c,
          CAST(sum(CASE WHEN h // CAST(pow(2, 8 + split) AS BIGINT) % 2 = 0
            THEN 1 - y ELSE 0 END) AS BIGINT) AS d
        FROM rows_ CROSS JOIN grid GROUP BY split),
      v AS (
        SELECT split,
          CAST(CAST(a + b + c + d AS HUGEINT)
            * (CAST(a * d - b * c AS HUGEINT) * (a * d - b * c)) * 1000000
            // (CAST((a + b) * (c + d) AS HUGEINT) * (a + c) * (b + d))
            AS BIGINT) AS chi2_ppm
        FROM cells),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_splits,
          CAST(sum(CASE WHEN chi2_ppm >= 3841459 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rejected,
          CAST(max(chi2_ppm) AS BIGINT) AS max_chi2_ppm
        FROM v)
      SELECT n_splits, n_rejected,
        CAST(n_rejected * 1000000 // n_splits AS BIGINT) AS false_positive_ppm,
        CAST(50000 AS BIGINT) AS nominal_ppm, max_chi2_ppm,
        n_rejected <= 2 AS calibrated
      FROM agg
    """))

  // ---------------------------------------------------------------- q640

  /** Fixed-sequence gatekeeping: when hypotheses carry a PRE-SPECIFIED
    * importance order (here: brands by revenue — test the biggest
    * first), testing each at FULL α until the first failure controls
    * FWER with no correction at all — strictly more powerful than
    * Bonferroni for the early hypotheses, at the price that one early
    * miss gates everything after it. Run on q417's exact brand
    * statistics; reports each brand's marginal verdict vs its
    * gatekept verdict and where the gate slammed.
    *
    * Scale shape: q417's — 25 statistic cells, one revenue ranking,
    * one running-min gate over the 25-row grid. */
  private val q640 = QueryDef(
    "q640_fixed_sequence_gatekeeping",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
          graft.functions.Deterministic.cents(col("l_extendedprice")).as("v"))
      val cells = li.groupBy(col("p_brand"))
        .agg(sum(col("y")).as("a"), sum(lit(1L) - col("y")).as("b"),
          sum(col("v")).as("rev"))
      val tot = cells.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
      val stats = cells.crossJoin(broadcast(tot))
        .withColumn("c", col("ta") - col("a"))
        .withColumn("d", col("tb") - col("b"))
        .withColumn("stat_ppm", expr("""
          CAST(CAST((ta + tb) AS DECIMAL(38,0))
            * (CAST(a * d - b * c AS DECIMAL(38,0)) * (a * d - b * c)) * 1000000
          div (CAST((a + b) * (c + d) AS DECIMAL(38,0)) * (a + c) * (b + d))
          AS BIGINT)"""))
        .withColumn("seq", row_number().over(
          Window.orderBy(col("rev").desc, col("p_brand"))).cast("long"))
        .withColumn("marginal_reject",
          (col("stat_ppm") >= 3841459L).cast("long"))
      // the gate: rejections continue only while EVERY earlier test
      // rejected — a running min over the pre-specified order
      val gated = stats
        .withColumn("gate_open", min(col("marginal_reject")).over(
          Window.orderBy(col("seq")).rowsBetween(Window.unboundedPreceding, 0)))
      gated.select(col("seq"), col("p_brand"), col("stat_ppm"),
          col("marginal_reject"), col("gate_open").as("gatekept_reject"))
        .orderBy(col("seq"))
    },
    Some("""
      WITH li AS (
        SELECT p_brand, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      cells AS (
        SELECT p_brand, CAST(sum(y) AS BIGINT) AS a,
          CAST(sum(1 - y) AS BIGINT) AS b, CAST(sum(v) AS BIGINT) AS rev
        FROM li GROUP BY p_brand),
      tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
              CAST(sum(b) AS BIGINT) AS tb FROM cells),
      stats AS (
        SELECT p_brand, rev,
          CAST(CAST(ta + tb AS HUGEINT)
            * (CAST(a * (tb - b) - b * (ta - a) AS HUGEINT)
               * (a * (tb - b) - b * (ta - a))) * 1000000
            // (CAST((a + b) * (ta - a + tb - b) AS HUGEINT) * ta * tb)
            AS BIGINT) AS stat_ppm
        FROM cells CROSS JOIN tot),
      seqd AS (
        SELECT p_brand, stat_ppm,
          CAST(row_number() OVER (ORDER BY rev DESC, p_brand) AS BIGINT) AS seq,
          CAST(CASE WHEN stat_ppm >= 3841459 THEN 1 ELSE 0 END AS BIGINT)
            AS marginal_reject
        FROM stats)
      SELECT seq, p_brand, stat_ppm, marginal_reject,
        CAST(min(marginal_reject) OVER (ORDER BY seq
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gatekept_reject
      FROM seqd ORDER BY seq
    """))

  // ---------------------------------------------------------------- q641

  /** Test-by-betting anytime-valid monitor: wealth
    * W_t = Π (1 + λ·(x̄_t − p₀)/p₀) with a fixed bet λ = 1/4 against
    * H₀: daily purchase share = 18% — by Ville's inequality,
    * W_t ≥ 1/α is an ALWAYS-VALID level-α rejection no matter when or
    * how often you look, the property fixed-horizon z-tests lose the
    * moment anyone peeks (q557). The per-day ppm wealth updates fold
    * sequentially with documented truncation (the q617 discipline);
    * reported: final wealth, max wealth, first day over 20× (α = 5%).
    *
    * Scale shape: events fold to one row per day; the fold runs over
    * the calendar-bounded day array on one row; readout is one row. */
  private val q641 = QueryDef(
    "q641_betting_martingale_monitor",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val byDay = Tables.events(spark, dir)
        .select(epochS(col("ts")).as("es"), col("event_type"))
        .groupBy(expr("es div 86400").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
      byDay.agg(sort_array(collect_list(struct(col("day"), col("n"), col("x"))))
          .as("arr"))
        .select(expr(
          """aggregate(arr,
               named_struct('w', 1000000L, 'mx', 1000000L, 'first', -1L,
                 'i', 0L),
               (acc, e) -> named_struct(
                 'w', acc.w * (1000000 +
                   (e.x * 1000000 div e.n - 180000) * 250000 div 180000)
                   div 1000000,
                 'mx', greatest(acc.mx, acc.w * (1000000 +
                   (e.x * 1000000 div e.n - 180000) * 250000 div 180000)
                   div 1000000),
                 'first', CASE WHEN acc.first >= 0 THEN acc.first
                   WHEN acc.w * (1000000 +
                     (e.x * 1000000 div e.n - 180000) * 250000 div 180000)
                     div 1000000 >= 20000000 THEN acc.i + 1
                   ELSE -1L END,
                 'i', acc.i + 1))""").as("s"))
        .select(expr("s.i").as("n_days"),
          expr("s.w").as("final_wealth_ppm"),
          expr("s.mx").as("max_wealth_ppm"),
          expr("s.first").as("first_rejection_day"),
          expr("s.mx >= 20000000").as("ever_rejected_5pct"))
    },
    Some("""
      WITH RECURSIVE byday AS (
        SELECT epoch_ms(ts) // 1000 // 86400 AS day,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS x
        FROM events GROUP BY 1),
      seqd AS (
        SELECT day, n, x, row_number() OVER (ORDER BY day) AS rn
        FROM byday),
      rec AS (
        SELECT rn, CAST(1000000 * (1000000 +
            (x * 1000000 // n - 180000) * 250000 // 180000) // 1000000
            AS BIGINT) AS w
        FROM seqd WHERE rn = 1
        UNION ALL
        SELECT s.rn,
          CAST(rec.w * (1000000 +
            (s.x * 1000000 // s.n - 180000) * 250000 // 180000) // 1000000
            AS BIGINT)
        FROM seqd s JOIN rec ON s.rn = rec.rn + 1),
      agg AS (
        SELECT CAST(max(rn) AS BIGINT) AS n_days,
          CAST(max(CASE WHEN rn = (SELECT max(rn) FROM rec) THEN w END)
            AS BIGINT) AS final_wealth_ppm,
          CAST(max(w) AS BIGINT) AS max_wealth_ppm,
          CAST(coalesce(min(CASE WHEN w >= 20000000 THEN rn END), -1)
            AS BIGINT) AS first_rejection_day
        FROM rec)
      SELECT n_days, final_wealth_ppm, max_wealth_ppm, first_rejection_day,
        max_wealth_ppm >= 20000000 AS ever_rejected_5pct
      FROM agg
    """))

  override def defs: Seq[QueryDef] = Seq(q639, q640, q641)
}
