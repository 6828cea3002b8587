package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 forecast-evaluation operators: the ROC threshold sweep and the
  * Murphy (reliability/resolution/uncertainty) decomposition of the Brier
  * score — the classifier-evaluation readouts that q181's scalar AUC and
  * q147's calibration table summarize away, integer-exact throughout.
  */
object CalibrationQueries extends QueryGroup {

  // ---------------------------------------------------------------- q407

  /** ROC curve by threshold sweep: cumulative TP/FP (and ppm rates) at
    * every distinct value of an integer embedding score, positives =
    * labels 5–9 — the full operating-characteristic curve behind q181's
    * single AUC number. The score is the exact int8 mass of the vector
    * (Σ floor(eᵢ·127+0.5)), so both engines bin identically.
    *
    * Scale shape: one corpus scan folds rows into a per-score histogram
    * (the only row-sized shuffle); the cumulative sweep is a window over
    * the DISTINCT-score table (score values, not rows — bounded by the
    * int8 mass range, a few thousand), and the two class totals arrive
    * as a one-row broadcast. */
  private val q407 = QueryDef(
    "q407_roc_curve",
    (spark, dir) => {
      val scored = Tables.embeddings(spark, dir).select(
        expr("aggregate(embedding, 0L, (a, x) -> " +
          "a + CAST(floor(CAST(x AS DOUBLE) * 127.0D + 0.5D) AS LONG))").as("score_q"),
        when(col("label") >= 5, 1L).otherwise(0L).as("y"))
      val hist = scored.groupBy(col("score_q"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
      val tot = hist.agg(sum(col("p")).as("pos"), sum(col("n") - col("p")).as("neg"))
      val w = Window.orderBy(col("score_q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.crossJoin(broadcast(tot))
        .withColumn("cum_tp", sum(col("p")).over(w))
        .withColumn("cum_fp", sum(col("n") - col("p")).over(w))
        .select(col("score_q"), col("cum_tp"), col("cum_fp"),
          expr("cum_tp * 1000000 div pos").as("tpr_ppm"),
          expr("cum_fp * 1000000 div neg").as("fpr_ppm"))
        .orderBy(col("score_q").desc)
    },
    Some("""
      WITH scored AS (
        SELECT list_sum(list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) * 127.0 + 0.5) AS BIGINT))) AS score_q,
          CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
        FROM embeddings),
      hist AS (
        SELECT score_q, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
        FROM scored GROUP BY score_q),
      tot AS (
        SELECT CAST(sum(p) AS BIGINT) AS pos, CAST(sum(n - p) AS BIGINT) AS neg
        FROM hist),
      cum AS (
        SELECT score_q,
          CAST(sum(p) OVER w AS BIGINT) AS cum_tp,
          CAST(sum(n - p) OVER w AS BIGINT) AS cum_fp
        FROM hist
        WINDOW w AS (ORDER BY score_q DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT CAST(score_q AS BIGINT) AS score_q, cum_tp, cum_fp,
        CAST(cum_tp * 1000000 // pos AS BIGINT) AS tpr_ppm,
        CAST(cum_fp * 1000000 // neg AS BIGINT) AS fpr_ppm
      FROM cum CROSS JOIN tot
      ORDER BY score_q DESC
    """))

  // ---------------------------------------------------------------- q408

  /** Murphy decomposition of the Brier score: a return-probability
    * forecast learned per discount bin on the odd-orderkey half of
    * lineitem is evaluated on the even half, and its Brier score splits
    * into REL (how far forecasts sit from realized rates — lower is
    * better), RES (how much the forecast separates outcomes — higher is
    * better) and UNC (base-rate entropy, forecast-independent) — the
    * standard diagnosis of WHY a probability forecast is good or bad.
    * All terms are exact per-mille² integers (floor rates commute with
    * the grouping; squared diffs of per-mille ints sum in 64 bits up to
    * ~10⁹ test rows — beyond that the partial sums become decimals).
    *
    * Scale shape: train and test are two predicate-pushed scans; the
    * learned forecast is an ≤ 11-row broadcast joined on the bin key;
    * the decomposition is one keyed agg plus a one-row broadcast of the
    * base rate. */
  private val q408 = QueryDef(
    "q408_brier_decomposition",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir).select(
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("d"),
        expr("l_orderkey % 2").as("half"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
      val forecast = li.filter(col("half") === 1)
        .groupBy(col("d"))
        .agg(expr("sum(y) * 1000 div count(1)").as("f_pm"))
      val test = li.filter(col("half") === 0)
        .join(broadcast(forecast), Seq("d"))
      val binned = test.groupBy(col("f_pm"))
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("y_b"))
        .withColumn("o_pm", expr("y_b * 1000 div n_b"))
      val base = binned.agg(sum(col("y_b")).as("yy"), sum(col("n_b")).as("nn"))
        .select(expr("yy * 1000 div nn").as("obar_pm"), col("nn").as("n_test"))
      binned.crossJoin(broadcast(base))
        .groupBy(col("obar_pm"), col("n_test"))
        .agg(sum(expr("n_b * (f_pm - o_pm) * (f_pm - o_pm)")).as("rel_sum_pm2"),
          sum(expr("n_b * (o_pm - obar_pm) * (o_pm - obar_pm)")).as("res_sum_pm2"),
          count(lit(1)).as("n_bins"))
        .select(col("n_test"), col("n_bins"),
          col("rel_sum_pm2"), col("res_sum_pm2"),
          expr("rel_sum_pm2 div n_test").as("rel_pm2"),
          expr("res_sum_pm2 div n_test").as("res_pm2"),
          expr("obar_pm * (1000 - obar_pm)").as("unc_pm2"))
    },
    Some("""
      WITH li AS (
        SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
          l_orderkey % 2 AS half,
          CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      forecast AS (
        SELECT d, CAST(sum(y) * 1000 // count(*) AS BIGINT) AS f_pm
        FROM li WHERE half = 1 GROUP BY d),
      test AS (
        SELECT f.f_pm, t.y FROM li t JOIN forecast f USING (d) WHERE t.half = 0),
      binned AS (
        SELECT f_pm, CAST(count(*) AS BIGINT) AS n_b, CAST(sum(y) AS BIGINT) AS y_b,
          CAST(sum(y) * 1000 // count(*) AS BIGINT) AS o_pm
        FROM test GROUP BY f_pm),
      base AS (
        SELECT CAST(sum(y_b) * 1000 // sum(n_b) AS BIGINT) AS obar_pm,
          CAST(sum(n_b) AS BIGINT) AS n_test
        FROM binned)
      SELECT n_test, CAST(count(*) AS BIGINT) AS n_bins,
        CAST(sum(n_b * (f_pm - o_pm) * (f_pm - o_pm)) AS BIGINT) AS rel_sum_pm2,
        CAST(sum(n_b * (o_pm - obar_pm) * (o_pm - obar_pm)) AS BIGINT) AS res_sum_pm2,
        CAST(sum(n_b * (f_pm - o_pm) * (f_pm - o_pm)) // n_test AS BIGINT) AS rel_pm2,
        CAST(sum(n_b * (o_pm - obar_pm) * (o_pm - obar_pm)) // n_test AS BIGINT)
          AS res_pm2,
        obar_pm * (1000 - obar_pm) AS unc_pm2
      FROM binned CROSS JOIN base
      GROUP BY n_test, obar_pm
    """))

  override def defs: Seq[QueryDef] = Seq(q407, q408)
}
