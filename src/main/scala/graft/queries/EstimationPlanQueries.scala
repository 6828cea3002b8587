package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 batch 12: estimation machinery — control-variate variance
  * reduction, serial-number (German tank) keyspace estimation, and
  * chain-ladder development completion. All outputs integers / strings
  * with total ORDER BYs for the oracle gate.
  */
object EstimationPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q576

  /** Control-variate estimator audit: estimating mean order revenue
    * (Σ extendedprice per order) from a shard (here: 16 hash shards
    * standing in for "the one shard you can afford to read"), subtract
    * β·(x̄_shard − μx) using a cheap correlated control — total item
    * quantity, corr ≈ 0.74 with revenue — whose global mean IS
    * affordable (one narrow column scan). β comes from the 16
    * shard-level aggregates (scale-safe: never a corpus-sized Σxy),
    * and the readout is each shard's plain deviation from the true
    * mean next to its control-variate deviation — the classical
    * variance-reduction trick, priced on real data. (o_totalprice is
    * NOT usable as the target: this generator draws it independently
    * of the order's lineitems, corr ≈ −0.006.)
    *
    * Scale shape: one join+fold produces per-order (x, y), one keyed
    * aggregate folds 16 shard rows; β and the global means are window
    * arithmetic over those 16 rows (bounded global window,
    * sanctioned). Shard assignment uses HIGH hash bits (the q569
    * low-bit aliasing trap). */
  private val q576 = QueryDef(
    "q576_control_variate_audit",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      import graft.operators.Sampling
      import org.apache.spark.sql.expressions.Window
      val perOrder = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), cents(col("l_extendedprice")).as("p"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          Sampling.keyHash(col("l_orderkey")).as("h"))
        .groupBy(col("ok"), expr("h div 268435456").as("g"))
        .agg(sum(col("p")).as("y"), sum(col("q")).as("x"))
      val shards = perOrder.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
        .select(col("g"), col("n"),
          expr("sx * 1000 div n").as("xbar_milli"), expr("sy div n").as("ybar"))
      // global windows over the 16 shard rows (bounded, sanctioned);
      // integer div throughout — Column./ is double division and its
      // round-to-nearest can disagree with floor at exact boundaries
      val withG = shards
        .withColumn("mux_milli",
          expr("sum(xbar_milli * n) OVER () div sum(n) OVER ()"))
        .withColumn("muy", expr("sum(ybar * n) OVER () div sum(n) OVER ()"))
      // beta from the 16 shard-level points: milli cents-per-unit
      val withB = withG
        .withColumn("dx", expr("xbar_milli - mux_milli"))
        .withColumn("dy", expr("ybar - muy"))
        .withColumn("beta_milli",
          expr("sum(dx * dy) OVER () * 1000 div greatest(sum(dx * dx) OVER (), 1)"))
      withB
        .select(col("g"), col("n"), col("ybar").as("ybar_cents"),
          col("muy").as("true_mean_cents"),
          expr("abs(ybar - muy)").as("plain_dev_cents"),
          expr("abs(ybar - beta_milli * dx div 1000 - muy)")
            .as("cv_dev_cents"))
        .orderBy(col("g"))
    },
    Some("""
      WITH po AS (
        SELECT l_orderkey AS ok,
          ((l_orderkey % 2147483648) * 2654435761) % 4294967296
            // 268435456 AS g,
          CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS y,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
        FROM lineitem
        GROUP BY 1, 2),
      shards AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) * 1000 // count(*) AS BIGINT) AS xbar_milli,
          CAST(sum(y) // count(*) AS BIGINT) AS ybar
        FROM po GROUP BY g),
      gm AS (
        SELECT *,
          CAST(sum(xbar_milli * n) OVER () // sum(n) OVER () AS BIGINT)
            AS mux_milli,
          CAST(sum(ybar * n) OVER () // sum(n) OVER () AS BIGINT) AS muy
        FROM shards),
      d AS (
        SELECT *, xbar_milli - mux_milli AS dx, ybar - muy AS dy FROM gm),
      b AS (
        SELECT *,
          CAST(sum(dx * dy) OVER () * 1000
            // greatest(sum(dx * dx) OVER (), 1) AS BIGINT) AS beta_milli
        FROM d)
      SELECT g, n, ybar AS ybar_cents, muy AS true_mean_cents,
        CAST(abs(ybar - muy) AS BIGINT) AS plain_dev_cents,
        CAST(abs(ybar - beta_milli * dx // 1000 - muy) AS BIGINT)
          AS cv_dev_cents
      FROM b ORDER BY g
    """))

  // ---------------------------------------------------------------- q577

  /** Serial-number (German tank) keyspace estimation: from a tiny hash
    * sample of orders, estimate the largest orderkey with the
    * minimum-variance unbiased m + m/k − 1 (m = sample max, k = sample
    * size) and the row count with the plain k·rate⁻¹ blow-up, then
    * score both against truth. The max-based estimator reads the
    * KEYSPACE (what you need to size an ID map or pick a partition
    * range) while the count blow-up reads VOLUME — at sampling rates
    * 1/64, 1/256, 1/1024 the table shows how little data either
    * needs. The WWII estimator, pointed at a table's serial keys.
    *
    * Scale shape: one narrow scan; each rate is a conditional
    * aggregate over the same fold (HIGH hash bits); truth re-enters as
    * a one-row broadcast (sanctioned). */
  private val q577 = QueryDef(
    "q577_german_tank_estimate",
    (spark, dir) => {
      import graft.operators.Sampling
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(64L, 256L, 1024L).toDF("rate_inv")
      val base = Tables.orders(spark, dir)
        .select(col("o_orderkey").as("k"),
          Sampling.keyHash(col("o_orderkey"), 2246822519L).as("h"))
      val tot = base.agg(count(lit(1)).as("true_count"), max(col("k")).as("true_max_key"))
      base.crossJoin(broadcast(grid))
        .filter(expr("h div (4294967296 div rate_inv) = 0"))
        .groupBy(col("rate_inv"))
        .agg(count(lit(1)).as("n_sampled"), max(col("k")).as("sample_max"))
        .crossJoin(broadcast(tot))
        .select(col("rate_inv"), col("n_sampled"),
          expr("sample_max + sample_max div n_sampled - 1").as("est_max_key"),
          col("true_max_key"),
          expr("abs(sample_max + sample_max div n_sampled - 1 - true_max_key) " +
            "* 1000000 div true_max_key").as("max_err_ppm"),
          expr("n_sampled * rate_inv").as("est_count"),
          col("true_count"),
          expr("abs(n_sampled * rate_inv - true_count) * 1000000 div true_count")
            .as("count_err_ppm"))
        .orderBy(col("rate_inv"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
          ((o_orderkey % 2147483648) * 2246822519) % 4294967296 AS h
        FROM orders),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS true_count,
                CAST(max(k) AS BIGINT) AS true_max_key FROM base),
      grid(rate_inv) AS (VALUES (CAST(64 AS BIGINT)), (CAST(256 AS BIGINT)),
        (CAST(1024 AS BIGINT))),
      s AS (
        SELECT rate_inv, CAST(count(*) AS BIGINT) AS n_sampled,
          CAST(max(k) AS BIGINT) AS sample_max
        FROM base CROSS JOIN grid
        WHERE h // (4294967296 // rate_inv) = 0
        GROUP BY rate_inv)
      SELECT rate_inv, n_sampled,
        CAST(sample_max + sample_max // n_sampled - 1 AS BIGINT) AS est_max_key,
        true_max_key,
        CAST(abs(sample_max + sample_max // n_sampled - 1 - true_max_key)
          * 1000000 // true_max_key AS BIGINT) AS max_err_ppm,
        CAST(n_sampled * rate_inv AS BIGINT) AS est_count,
        true_count,
        CAST(abs(n_sampled * rate_inv - true_count) * 1000000 // true_count
          AS BIGINT) AS count_err_ppm
      FROM s CROSS JOIN tot ORDER BY rate_inv
    """))

  // ---------------------------------------------------------------- q578

  /** Chain-ladder development completion: build the customer-cohort
    * LTV triangle (origin = first-order quarter, age = quarters since,
    * value = cumulative order revenue), learn per-age development
    * factors from cohorts whose 8-quarter development is fully
    * observable before a backtest cutoff, then complete the recent,
    * partially-observed cohorts to their age-8 ultimate and score the
    * prediction against the actuals the full table knows. The
    * actuarial triangle-completion that turns "this cohort is 3
    * quarters old" into a defensible lifetime-value forecast.
    *
    * Scale shape: the triangle folds to (cohort, age) cells (calendar²
    * /2 — bounded); cumulative development is a window per cohort;
    * factors live on ≤ 9 age rows, pivoted to ONE row and broadcast
    * onto the test cohorts where the ≤ 8-step factor chain is plain
    * column arithmetic in milli. */
  private val q578 = QueryDef(
    "q578_chain_ladder_ltv",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      import org.apache.spark.sql.expressions.Window
      val H = 8 // develop to age-8 quarters (2-year LTV)
      val orders = Tables.orders(spark, dir)
        .select(col("o_custkey").as("c"), cents(col("o_totalprice")).as("v"),
          (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
            .cast("long").as("q"))
      val cohort = orders.groupBy(col("c")).agg(min(col("q")).as("cq"))
      val tri = orders.join(cohort, Seq("c"))
        .select(col("cq"), (col("q") - col("cq")).as("age"), col("v"))
        .filter(col("age") <= H)
        .groupBy(col("cq"), col("age")).agg(sum(col("v")).as("inc"))
      val cum = tri.withColumn("cum", sum(col("inc")).over(
        Window.partitionBy(col("cq")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      // backtest cutoff: the last cohort with a fully observed age-8
      // development defines the training era; later cohorts are tests
      val maxQ = Window.partitionBy()
      val marked = cum
        .withColumn("last_q", max(col("cq") + col("age")).over(maxQ))
        .withColumn("train", col("cq") + lit(H.toLong) <= col("last_q") - 8L)
      val factors = marked.filter(col("train"))
        .select(col("cq"), col("age"), col("cum"))
        .withColumn("nxt", lead(col("cum"), 1).over(
          Window.partitionBy(col("cq")).orderBy(col("age"))))
        .filter(col("nxt").isNotNull && col("age") < H)
        .groupBy(col("age"))
        .agg(expr("sum(nxt) * 1000 div sum(cum)").as("f_milli"))
      // pivot the <= 8 factors to one row for the prediction chain
      val fCols = (0 until H).map(a =>
        max(when(col("age") === a.toLong, col("f_milli"))).as(s"f$a"))
      val fRow = factors.agg(fCols.head, fCols.tail: _*)
      // test cohorts: not train, observed to SOME age < H before cutoff
      val tests = marked.filter(!col("train"))
        .withColumn("obs_age", least(col("last_q") - 8L - col("cq"), lit(H.toLong)))
        .filter(col("age") === col("obs_age") && col("obs_age") >= 1L
          && col("obs_age") < H)
        .select(col("cq"), col("obs_age"), col("cum").as("cum_obs"))
      val actual = cum.filter(col("age") === H).select(col("cq"), col("cum").as("actual_ult"))
      var pred = tests.crossJoin(broadcast(fRow)).withColumn("pred", col("cum_obs"))
      for (a <- 0 until H)
        pred = pred.withColumn("pred",
          when(col("obs_age") <= a.toLong, expr(s"pred * f$a div 1000"))
            .otherwise(col("pred")))
      pred.join(actual, Seq("cq"))
        .select(col("cq").as("cohort_q"), col("obs_age"), col("cum_obs"),
          col("pred").as("pred_ult_cents"), col("actual_ult").as("actual_ult_cents"),
          expr("abs(pred - actual_ult) * 1000000 div actual_ult").as("abs_err_ppm"))
        .orderBy(col("cohort_q"))
    },
    Some("""
      WITH orders_q AS (
        SELECT o_custkey AS c,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
          year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS q
        FROM orders),
      cohort AS (SELECT c, min(q) AS cq FROM orders_q GROUP BY c),
      tri AS (
        SELECT cq, o.q - cq AS age, CAST(sum(v) AS BIGINT) AS inc
        FROM orders_q o JOIN cohort USING (c)
        WHERE o.q - cq <= 8
        GROUP BY 1, 2),
      cum AS (
        SELECT cq, age,
          CAST(sum(inc) OVER (PARTITION BY cq ORDER BY age
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tri),
      marked AS (
        SELECT *, max(cq + age) OVER () AS last_q,
          CASE WHEN cq + 8 <= max(cq + age) OVER () - 8
            THEN 1 ELSE 0 END AS train
        FROM cum),
      fac AS (
        SELECT age, CAST(sum(nxt) * 1000 // sum(cum) AS BIGINT) AS f_milli
        FROM (SELECT cq, age, cum,
                lead(cum) OVER (PARTITION BY cq ORDER BY age) AS nxt
              FROM marked WHERE train = 1)
        WHERE nxt IS NOT NULL AND age < 8
        GROUP BY age),
      frow AS (
        SELECT
          max(CASE WHEN age = 0 THEN f_milli END) AS f0,
          max(CASE WHEN age = 1 THEN f_milli END) AS f1,
          max(CASE WHEN age = 2 THEN f_milli END) AS f2,
          max(CASE WHEN age = 3 THEN f_milli END) AS f3,
          max(CASE WHEN age = 4 THEN f_milli END) AS f4,
          max(CASE WHEN age = 5 THEN f_milli END) AS f5,
          max(CASE WHEN age = 6 THEN f_milli END) AS f6,
          max(CASE WHEN age = 7 THEN f_milli END) AS f7
        FROM fac),
      tests AS (
        SELECT cq, least(last_q - 8 - cq, 8) AS obs_age, cum AS cum_obs
        FROM marked
        WHERE train = 0 AND age = least(last_q - 8 - cq, 8)
          AND least(last_q - 8 - cq, 8) >= 1 AND least(last_q - 8 - cq, 8) < 8),
      chain AS (
        SELECT cq, obs_age, cum_obs,
          ((((((((cum_obs
            * (CASE WHEN obs_age <= 0 THEN f0 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 1 THEN f1 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 2 THEN f2 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 3 THEN f3 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 4 THEN f4 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 5 THEN f5 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 6 THEN f6 ELSE 1000 END) // 1000)
            * (CASE WHEN obs_age <= 7 THEN f7 ELSE 1000 END) // 1000) AS pred
        FROM tests CROSS JOIN frow),
      actual AS (SELECT cq, cum AS actual_ult FROM cum WHERE age = 8)
      SELECT c.cq AS cohort_q, c.obs_age, c.cum_obs,
        CAST(c.pred AS BIGINT) AS pred_ult_cents,
        a.actual_ult AS actual_ult_cents,
        CAST(abs(c.pred - a.actual_ult) * 1000000 // a.actual_ult AS BIGINT)
          AS abs_err_ppm
      FROM chain c JOIN actual a USING (cq)
      ORDER BY c.cq
    """))

  def defs: Seq[QueryDef] = Seq(q576, q577, q578)
}
