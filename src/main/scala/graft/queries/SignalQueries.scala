package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-4 signal/record operators: maximum-sum campaign window (Kadane
  * via prefix sums), golden-record survivorship merge, and binned
  * conditional quantiles — time-series DP, master-data management, and
  * quantile-regression readouts, all integer-exact for the oracle gate.
  */
object SignalQueries extends QueryGroup {

  // ---------------------------------------------------------------- q390

  /** Best contiguous campaign window: the consecutive day span with the
    * largest cumulative revenue ABOVE the global daily mean — Kadane's
    * maximum-subarray, O(n)-sequential in a loop, here as pure window
    * algebra: deviations are exact (rev·n − total, no mean division),
    * the best span ending at t is prefix(t) − min(prefix(<t) ∪ {0}),
    * and the argmax plus a tiny join on the day table recovers the
    * span's start.
    *
    * Scale shape: everything after the daily fold runs on the
    * calendar-sized day table (sanctioned global windows); the fold
    * itself is one keyed agg. */
  private val q390 = QueryDef(
    "q390_best_campaign_window",
    (spark, dir) => {
      val daily = Tables.orders(spark, dir)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      val tot = daily.agg(sum(col("rev_c")).as("total_c"), count(lit(1)).as("nd"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val pref = daily.crossJoin(broadcast(tot))
        .withColumn("p", sum(col("rev_c") * col("nd") - col("total_c")).over(w))
        .withColumn("m", least(coalesce(min(col("p")).over(wPrev), lit(0L)), lit(0L)))
        .withColumn("best", col("p") - col("m"))
      val top = pref.agg(max(col("best")).as("best_v"))
      val end = pref.crossJoin(broadcast(top))
        .filter(col("best") === col("best_v"))
        .groupBy(col("best_v"))
        .agg(min(col("day")).as("end_day"),
          min_by(col("m"), col("day")).as("m_at_end"),
          max(col("nd")).as("nd"))
      val start = pref.select(col("day"), col("p")).crossJoin(broadcast(end))
        .filter(col("p") === col("m_at_end") && col("day") < col("end_day"))
        .groupBy(col("best_v"), col("end_day"), col("nd"))
        .agg(max(col("day")).as("d0"))
      val startAll = end.join(start, Seq("best_v", "end_day", "nd"), "left")
        .crossJoin(broadcast(daily.agg(min(col("day")).as("first_day"))))
      startAll
        .select(
          expr("best_v div nd").as("best_sum_c"),
          coalesce(date_add(col("d0"), 1), col("first_day")).as("start_day"),
          col("end_day"),
          (datediff(col("end_day"),
            coalesce(date_add(col("d0"), 1), col("first_day"))) + 1).as("span_days"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
      tot AS (SELECT sum(rev_c) AS total_c, CAST(count(*) AS BIGINT) AS nd FROM daily),
      pref AS (
        SELECT day, nd,
          sum(rev_c * nd - total_c) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM daily CROSS JOIN tot),
      scored AS (
        SELECT day, nd, p,
          least(coalesce(min(p) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0) AS m
        FROM pref),
      best AS (
        SELECT max(p - m) AS best_v FROM scored),
      e AS (
        SELECT best_v, min(day) AS end_day, arg_min(m, day) AS m_at_end,
          max(nd) AS nd
        FROM scored CROSS JOIN best
        WHERE p - m = best_v
        GROUP BY best_v),
      s AS (
        SELECT max(scored.day) AS d0 FROM scored CROSS JOIN e
        WHERE scored.p = e.m_at_end AND scored.day < e.end_day),
      f AS (SELECT min(day) AS first_day FROM daily)
      SELECT best_v // nd AS best_sum_c,
        coalesce(d0 + 1, first_day) AS start_day,
        end_day,
        date_diff('day', coalesce(d0 + 1, first_day), end_day) + 1 AS span_days
      FROM e CROSS JOIN s CROSS JOIN f
    """))

  // ---------------------------------------------------------------- q391

  /** Golden-record survivorship merge: documents sharing a duplicate
    * family key (the 8-token prefix — boilerplate/template identity,
    * q177's signal) collapse into one master record under explicit
    * survivorship rules — smallest id as the canonical key, MAJORITY
    * lang and source (count-desc, value-asc tiebreak), max n_chars —
    * the MDM merge step that follows duplicate detection; q282 picks
    * one member, this FUSES fields across members.
    *
    * Scale shape: one key-keyed agg for the scalars plus one
    * (key, field)-keyed count → rank per majority field; joins stay on
    * the family key throughout (one shuffle family, AQE-coalesced). */
  private val q391 = QueryDef(
    "q391_golden_record_merge",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .withColumn("text", expr(
          "concat_ws(' ', slice(filter(split(text, ' '), t -> length(t) > 0), 1, 8))"))
      val base = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_members"),
          max(col("n_chars")).as("max_chars"))
        .filter(col("n_members") >= 2L)
      def majority(field: String, out: String) = {
        val wRank = Window.partitionBy(col("text"))
          .orderBy(col("cnt").desc, col(field))
        docs.groupBy(col("text"), col(field))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(wRank))
          .filter(col("rk") === 1)
          .select(col("text"), col(field).as(out))
      }
      base
        .join(majority("lang", "lang_majority"), Seq("text"))
        .join(majority("source", "source_majority"), Seq("text"))
        .select(col("canonical_id"), col("n_members"),
          col("lang_majority"), col("source_majority"), col("max_chars"))
        .orderBy(col("canonical_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang, source, n_chars,
          array_to_string(
            list_filter(str_split(text, ' '), t -> len(t) > 0)[1:8], ' ') AS text
        FROM documents),
      base AS (
        SELECT text, min(doc_id) AS canonical_id,
          CAST(count(*) AS BIGINT) AS n_members, max(n_chars) AS max_chars
        FROM d GROUP BY text HAVING count(*) >= 2),
      lang_m AS (
        SELECT text, lang AS lang_majority FROM (
          SELECT text, lang,
            row_number() OVER (PARTITION BY text
              ORDER BY count(*) DESC, lang) AS rk
          FROM d GROUP BY text, lang)
        WHERE rk = 1),
      src_m AS (
        SELECT text, source AS source_majority FROM (
          SELECT text, source,
            row_number() OVER (PARTITION BY text
              ORDER BY count(*) DESC, source) AS rk
          FROM d GROUP BY text, source)
        WHERE rk = 1)
      SELECT canonical_id, n_members, lang_majority, source_majority, max_chars
      FROM base JOIN lang_m USING (text) JOIN src_m USING (text)
      ORDER BY canonical_id
    """))

  // ---------------------------------------------------------------- q392

  /** Binned conditional quantiles ("poor man's quantile regression"):
    * p25/p50/p75 of the line price at EVERY quantity level 1..50 — the
    * distributional price-vs-volume curve that a conditional mean
    * (q236's elasticity) flattens away. Exact rank selection per bin
    * via RankSelect's two-level histogram (no per-group sort of raw
    * rows at scale).
    *
    * Scale shape: RankSelect — coarse $10-bin histogram per quantity
    * level, cumulative window over bins, exact refinement only inside
    * selected bins. */
  private val q392 = QueryDef(
    "q392_conditional_price_quantiles",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(floor(col("l_quantity") + 0.5).cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c"))
      graft.operators.RankSelect
        .percentiles(li, "qty", "price_c", Seq(2500, 5000, 7500), binWidth = 1000L)
        .select(col("qty"), col("n"),
          col("p_2500").as("p25_c"), col("p_5000").as("p50_c"),
          col("p_7500").as("p75_c"))
        .orderBy(col("qty"))
    },
    Some("""
      WITH li AS (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c
        FROM lineitem),
      cum AS (
        SELECT qty, price_c, c,
          sum(c) OVER (PARTITION BY qty ORDER BY price_c) AS cum,
          sum(c) OVER (PARTITION BY qty) AS n
        FROM (SELECT qty, price_c, count(*) AS c FROM li GROUP BY 1, 2))
      SELECT qty, CAST(max(n) AS BIGINT) AS n,
        CAST(min(CASE WHEN cum * 10000 >= 2500 * n THEN price_c END) AS BIGINT) AS p25_c,
        CAST(min(CASE WHEN cum * 10000 >= 5000 * n THEN price_c END) AS BIGINT) AS p50_c,
        CAST(min(CASE WHEN cum * 10000 >= 7500 * n THEN price_c END) AS BIGINT) AS p75_c
      FROM cum
      GROUP BY qty
      ORDER BY qty
    """))

  override def defs: Seq[QueryDef] = Seq(q390, q391, q392)
}
