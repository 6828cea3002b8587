package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-9 batch 5: extreme-and-direction analytics on the daily series —
  * the readouts behind capacity headroom and trend claims. A directional
  * sign-transfer contingency (does yesterday's view swing predict today's
  * purchase swing, and is it asymmetric? — the sign-level Granger
  * question q421's product-moment xcorr can't answer), an extremal-index
  * cluster census (do demand spikes arrive alone or in bursts? burst
  * arrival means peak provisioning must ride out RUNS, not single days),
  * and a record-breaking census (under a stationary series, all-time
  * highs thin out harmonically; a late-calendar record surplus is trend
  * evidence no mean test gives this cheaply). All exact integers;
  * calendar-bounded windows only.
  */
object ExtremesPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q679

  /** Sign-transfer contingency at lag 1, both directions: bucket each
    * day's view-count delta and purchase-count delta into up (>0) /
    * down (≤0), then cross yesterday's X-sign with today's Y-sign for
    * X→Y in {view→purchase, purchase→view}. The per-direction odds
    * ratio (×10⁶) is the directional-dependence readout: a
    * view-leads-purchase excess with no reverse excess is conversion
    * lag made visible.
    *
    * Scale shape: events fold once to a calendar-sized daily table; the
    * three lag windows run over that bounded table (the documented
    * calendar-frame discipline); the readout is 2 rows. */
  private val q679 = QueryDef(
    "q679_sign_transfer_contingency",
    (spark, dir) => {
      val w = Window.orderBy(col("day"))
      val daily = Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .groupBy(expr("CAST(ts AS DATE)").as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("nb"))
        .withColumn("dv", col("nv") - lag(col("nv"), 1).over(w))
        .withColumn("db", col("nb") - lag(col("nb"), 1).over(w))
        .withColumn("dv_y", lag(col("dv"), 1).over(w))
        .withColumn("db_y", lag(col("db"), 1).over(w))
      def fold(label: String, x: String, y: String) =
        daily.filter(col(x).isNotNull && col(y).isNotNull)
          .agg(
            sum(when(col(x) > 0 && col(y) > 0, 1L).otherwise(0L)).as("n_uu"),
            sum(when(col(x) > 0 && col(y) <= 0, 1L).otherwise(0L)).as("n_ud"),
            sum(when(col(x) <= 0 && col(y) > 0, 1L).otherwise(0L)).as("n_du"),
            sum(when(col(x) <= 0 && col(y) <= 0, 1L).otherwise(0L)).as("n_dd"))
          .select(lit(label).as("direction"), col("n_uu"), col("n_ud"),
            col("n_du"), col("n_dd"),
            expr("CASE WHEN n_ud * n_du > 0" +
              " THEN n_uu * n_dd * 1000000 div (n_ud * n_du)" +
              " ELSE 0 END").as("odds_ppm"))
      fold("view_to_buy", "dv_y", "db")
        .unionAll(fold("buy_to_view", "db_y", "dv"))
        .orderBy(col("direction"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS nv,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS nb
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      deltas AS (
        SELECT day, nv - lag(nv) OVER (ORDER BY day) AS dv,
          nb - lag(nb) OVER (ORDER BY day) AS db
        FROM daily),
      lagged AS (
        SELECT dv, db,
          lag(dv) OVER (ORDER BY day) AS dv_y,
          lag(db) OVER (ORDER BY day) AS db_y
        FROM deltas),
      v2b AS (
        SELECT 'view_to_buy' AS direction,
          CAST(sum(CASE WHEN dv_y > 0 AND db > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_uu,
          CAST(sum(CASE WHEN dv_y > 0 AND db <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ud,
          CAST(sum(CASE WHEN dv_y <= 0 AND db > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_du,
          CAST(sum(CASE WHEN dv_y <= 0 AND db <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dd
        FROM lagged WHERE dv_y IS NOT NULL AND db IS NOT NULL),
      b2v AS (
        SELECT 'buy_to_view' AS direction,
          CAST(sum(CASE WHEN db_y > 0 AND dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_uu,
          CAST(sum(CASE WHEN db_y > 0 AND dv <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ud,
          CAST(sum(CASE WHEN db_y <= 0 AND dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_du,
          CAST(sum(CASE WHEN db_y <= 0 AND dv <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dd
        FROM lagged WHERE db_y IS NOT NULL AND dv IS NOT NULL),
      both_dir AS (SELECT * FROM v2b UNION ALL SELECT * FROM b2v)
      SELECT direction, n_uu, n_ud, n_du, n_dd,
        CAST(CASE WHEN n_ud * n_du > 0
          THEN n_uu * n_dd * 1000000 // (n_ud * n_du) ELSE 0 END
          AS BIGINT) AS odds_ppm
      FROM both_dir ORDER BY direction
    """))

  // ---------------------------------------------------------------- q680

  /** Extremal-index cluster census: days whose revenue clears the
    * histogram-granular 90th percentile, grouped into CLUSTERS of
    * consecutive calendar days. The extremal index θ ≈ clusters/
    * exceedances ∈ (0,1]: θ near 1 means spikes arrive alone (peak
    * capacity rides out one day); small θ means bursts (provision for
    * max_cluster_len consecutive peak days). The q663 histogram-
    * granular quantile discipline makes the threshold exact on both
    * engines.
    *
    * Scale shape: one fold to the calendar-sized daily table; the
    * percentile comes from a value-domain histogram window; run
    * detection is one lag over exceedance days (calendar-bounded);
    * readout is 1 row. */
  private val q680 = QueryDef(
    "q680_extremal_index_clusters",
    (spark, dir) => {
      val daily = Tables.lineitem(spark, dir)
        .select(expr("CAST(l_shipdate AS DATE)").as("day"),
          cents(col("l_extendedprice")).as("c"))
        .groupBy(col("day")).agg(expr("sum(c) div 100").as("v"))
      val n = daily.agg(count(lit(1)).as("n_days"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = daily.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum_incl", sum(col("cnt")).over(wv))
        .crossJoin(broadcast(n))
        .filter(col("cum_incl") * 10 >= col("n_days") * 9)
        .agg(min(col("v")).as("thr"))
      val exceed = daily.crossJoin(broadcast(thr))
        .filter(col("v") >= col("thr"))
      val wd = Window.orderBy(col("day"))
      val runs = exceed
        .withColumn("prev", lag(col("day"), 1).over(wd))
        .withColumn("is_start",
          when(col("prev").isNull || expr("datediff(day, prev) > 1"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("is_start")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val runLens = runs.groupBy(col("run_id")).agg(count(lit(1)).as("len"))
      val folded = runLens.agg(count(lit(1)).as("n_clusters"),
        sum(col("len")).as("n_exceed"), max(col("len")).as("max_cluster_len"))
      folded.crossJoin(broadcast(n)).crossJoin(broadcast(thr))
        .select(col("n_days"), col("thr").as("thr_dollars"), col("n_exceed"),
          col("n_clusters"),
          expr("n_clusters * 1000000 div n_exceed").as("extremal_index_ppm"),
          col("max_cluster_len"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 100 AS v
        FROM lineitem GROUP BY 1),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
      hist AS (
        SELECT v, count(*) AS cnt,
          sum(count(*)) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
        FROM daily GROUP BY v),
      thr AS (
        SELECT min(v) AS thr FROM hist
        WHERE cum_incl * 10 >= (SELECT n_days FROM nn) * 9),
      exceed AS (
        SELECT day FROM daily WHERE v >= (SELECT thr FROM thr)),
      marked AS (
        SELECT day,
          CASE WHEN lag(day) OVER (ORDER BY day) IS NULL
            OR datediff('day', lag(day) OVER (ORDER BY day), day) > 1
            THEN 1 ELSE 0 END AS is_start
        FROM exceed),
      runs AS (
        SELECT day, sum(is_start) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM marked),
      lens AS (SELECT run_id, CAST(count(*) AS BIGINT) AS len
        FROM runs GROUP BY run_id)
      SELECT (SELECT n_days FROM nn) AS n_days,
        CAST((SELECT thr FROM thr) AS BIGINT) AS thr_dollars,
        CAST(sum(len) AS BIGINT) AS n_exceed,
        CAST(count(*) AS BIGINT) AS n_clusters,
        CAST(count(*) * 1000000 // sum(len) AS BIGINT)
          AS extremal_index_ppm,
        CAST(max(len) AS BIGINT) AS max_cluster_len
      FROM lens
    """))

  // ---------------------------------------------------------------- q681

  /** Record-breaking census: per ship-year, how many days set a new
    * all-time daily-revenue high? For a stationary series the expected
    * count of records among the first n observations is the harmonic
    * number H(n) — ~6.6 records in 730 days, nearly all early — so
    * records persisting into late years are distribution-free trend
    * evidence (the classic records test). Reported per year with the
    * year's max for context.
    *
    * Scale shape: one fold to the calendar-sized daily table, one
    * running-prior-max window over it (calendar-bounded), year-keyed
    * readout. */
  private val q681 = QueryDef(
    "q681_record_breaking_census",
    (spark, dir) => {
      val daily = Tables.lineitem(spark, dir)
        .select(expr("CAST(l_shipdate AS DATE)").as("day"),
          cents(col("l_extendedprice")).as("c"))
        .groupBy(col("day")).agg(expr("sum(c) div 100").as("v"))
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("prior_max", max(col("v")).over(w))
        .withColumn("is_record",
          when(col("prior_max").isNull || col("v") > col("prior_max"), 1L)
            .otherwise(0L))
        .groupBy(expr("CAST(year(day) AS BIGINT)").as("yr"))
        .agg(count(lit(1)).as("n_days"), sum(col("is_record")).as("n_records"),
          max(col("v")).as("year_max_dollars"))
        .select(col("yr"), col("n_days"), col("n_records"),
          col("year_max_dollars"))
        .orderBy(col("yr"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
          sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 100 AS v
        FROM lineitem GROUP BY 1),
      marked AS (
        SELECT day, v,
          max(v) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        FROM daily)
      SELECT CAST(year(day) AS BIGINT) AS yr,
        CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(CASE WHEN prior_max IS NULL OR v > prior_max
          THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
        CAST(max(v) AS BIGINT) AS year_max_dollars
      FROM marked GROUP BY 1 ORDER BY yr
    """))

  // ---------------------------------------------------------------- q684

  /** Lead-change census on the cumulative view-vs-purchase race: per
    * calendar year, how many days does the running
    * view-minus-purchase total lead on each side, and how often does
    * the lead FLIP? The arcsine law says a fair race spends most time
    * on one side and flips rarely (flips ~ √n, time-in-lead U-shaped),
    * so "views led 95% of days" is NOT trend evidence by itself — this
    * census gives the flip count that actually is. Zero-margin days
    * are their own band; a flip is two consecutive nonzero-margin days
    * with opposite sign.
    *
    * Scale shape: events fold once to the calendar-sized daily table;
    * the running margin and the flip lag run over that bounded series
    * (the q130/q383 calendar class); readout is one row per year. */
  private val q684 = QueryDef(
    "q684_lead_change_census",
    (spark, dir) => {
      val wd = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .groupBy(expr("CAST(ts AS DATE)").as("day"))
        .agg((sum(when(col("event_type") === "view", 1L).otherwise(0L))
          - sum(when(col("event_type") === "purchase", 1L).otherwise(0L)))
          .as("margin"))
        .withColumn("cum", sum(col("margin")).over(wd))
      val flips = daily.filter(col("cum") =!= 0L)
        .withColumn("prev_sign",
          lag(signum(col("cum")).cast("long"), 1).over(Window.orderBy(col("day"))))
        .withColumn("flip",
          when(col("prev_sign").isNotNull
            && col("prev_sign") =!= signum(col("cum")).cast("long"), 1L)
            .otherwise(0L))
        .select(col("day"), col("flip"))
      daily.join(flips, Seq("day"), "left")
        .groupBy(expr("CAST(year(day) AS BIGINT)").as("yr"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("cum") > 0L, 1L).otherwise(0L)).as("days_view_lead"),
          sum(when(col("cum") < 0L, 1L).otherwise(0L)).as("days_buy_lead"),
          sum(when(col("cum") === 0L, 1L).otherwise(0L)).as("days_tied"),
          sum(coalesce(col("flip"), lit(0L))).as("lead_changes"),
          max(abs(col("cum"))).as("max_abs_margin"))
        .select(col("yr"), col("n_days"), col("days_view_lead"),
          col("days_buy_lead"), col("days_tied"), col("lead_changes"),
          col("max_abs_margin"))
        .orderBy(col("yr"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            - sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS margin
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      cums AS (
        SELECT day, sum(margin) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM daily),
      flips AS (
        SELECT day,
          CASE WHEN lag(sign(cum)) OVER (ORDER BY day) IS NOT NULL
            AND lag(sign(cum)) OVER (ORDER BY day) <> sign(cum)
            THEN 1 ELSE 0 END AS flip
        FROM cums WHERE cum <> 0)
      SELECT CAST(year(c.day) AS BIGINT) AS yr,
        CAST(count(*) AS BIGINT) AS n_days,
        CAST(sum(CASE WHEN cum > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS days_view_lead,
        CAST(sum(CASE WHEN cum < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS days_buy_lead,
        CAST(sum(CASE WHEN cum = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS days_tied,
        CAST(sum(coalesce(flip, 0)) AS BIGINT) AS lead_changes,
        CAST(max(abs(cum)) AS BIGINT) AS max_abs_margin
      FROM cums c LEFT JOIN flips f ON f.day = c.day
      GROUP BY 1 ORDER BY yr
    """))

  override def defs: Seq[QueryDef] = Seq(q679, q680, q681, q684)
}
