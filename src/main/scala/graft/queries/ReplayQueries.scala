package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-4 replay/billing/certificate operators: off-policy bandit
  * evaluation by replay, the storage-tiering bill, and the outer-join
  * decomposition certificate — policy evaluation, cost planning, and
  * one more rewrite a planner must be allowed to make, deterministic
  * for the oracle gate.
  */
object ReplayQueries extends QueryGroup {

  // ---------------------------------------------------------------- q467

  /** Off-policy evaluation by replay (the Li et al. estimator): the
    * logged "bandit" data is one row per order — context = month,
    * action = the order's top brand, reward = order total above the
    * global median. The candidate policy "play last month's best
    * brand" is evaluated ONLY on logged rows whose action matches the
    * policy's choice (the replay trick that needs no simulator), next
    * to the best-fixed-arm hindsight oracle and the logging baseline.
    *
    * Scale shape: facts fold to per-(month, brand) reward partials;
    * the policy table is month-sized (lag window over month
    * leaderboards); matched-row scoring is one broadcast join back
    * onto the per-(month, brand) partials — never row-level replay.
    * The per-order arg-max is PACKED into one BIGINT (cents·100 +
    * brand suffix; ties → larger suffix): DuckDB 1.0 evaluates
    * max(struct) via interpreted struct comparisons — measured 128 s
    * at sf0.1 vs 0.26 s for the packed integer max, which blew the
    * oracle's 60 s budget. Exact while cents·100 < 2⁶³. */
  private val q467 = QueryDef(
    "q467_bandit_replay_ope",
    (spark, dir) => {
      val med = 25148209L // global median order cents (q434's exact p50)
      val logged = Tables.lineitem(spark, dir)
        .join(broadcast(Tables.part(spark, dir)
          .select(col("p_partkey"),
            expr("CAST(substring(p_brand, 7) AS BIGINT)").as("bsuf"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(max(cents(col("l_extendedprice")) * 100L + col("bsuf")).as("pk"))
        .select(col("l_orderkey"),
          concat(lit("Brand#"), (col("pk") % 100L).cast("string"))
            .as("action"))
      val rewards = Tables.orders(spark, dir)
        .select(col("o_orderkey"),
          expr("date_format(o_orderdate, 'yyyy-MM')").as("month"),
          (cents(col("o_totalprice")) > med).cast("long").as("reward"))
        .join(logged, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("month"), col("action"))
        .agg(count(lit(1)).as("n"), sum(col("reward")).as("r"))
        .persist() // feeds the leaderboard, the replay, and the oracle
      val wM = Window.partitionBy(col("month"))
        .orderBy(col("r").desc, col("action"))
      val best = rewards
        .withColumn("rk", row_number().over(wM)).filter(col("rk") === 1)
        .select(col("month"), col("action").as("best_action"))
      val wLag = Window.orderBy(col("month"))
      val policy = best
        .withColumn("policy_action", lag(col("best_action"), 1).over(wLag))
        .filter(col("policy_action").isNotNull)
        .select(col("month"), col("policy_action"))
      val replay = rewards.join(broadcast(policy),
        rewards("month") === policy("month") &&
          col("action") === col("policy_action"))
        .agg(sum(col("n")).as("n_matched"), sum(col("r")).as("r_matched"))
      val baseline = rewards.agg(sum(col("n")).as("n_all"), sum(col("r")).as("r_all"))
      val oracleArm = rewards.groupBy(col("action"))
        .agg(sum(col("n")).as("n"), sum(col("r")).as("r"))
        .withColumn("rate", expr("r * 1000000 div n"))
        .orderBy(col("rate").desc, col("action")).limit(1)
        .select(col("rate").as("oracle_fixed_arm_ppm"))
      replay.crossJoin(broadcast(baseline)).crossJoin(broadcast(oracleArm))
        .select(col("n_matched"),
          expr("r_matched * 1000000 div greatest(n_matched, 1)")
            .as("policy_reward_ppm"),
          expr("r_all * 1000000 div n_all").as("logging_reward_ppm"),
          col("oracle_fixed_arm_ppm"))
    },
    Some("""
      WITH logged AS MATERIALIZED (
        SELECT l.l_orderkey,
          max(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) * 100
            + CAST(p.p_brand[7:] AS BIGINT)) AS pk
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY l.l_orderkey),
      rewards AS MATERIALIZED (
        SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
          'Brand#' || CAST(lg.pk % 100 AS VARCHAR) AS action,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
            > 25148209 THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM orders o JOIN logged lg ON o.o_orderkey = lg.l_orderkey
        GROUP BY 1, 2),
      best AS MATERIALIZED (
        SELECT month, action AS best_action,
          row_number() OVER (PARTITION BY month ORDER BY r DESC, action) AS rk
        FROM rewards QUALIFY rk = 1),
      policy AS MATERIALIZED (
        SELECT month, lag(best_action) OVER (ORDER BY month) AS policy_action
        FROM best QUALIFY policy_action IS NOT NULL),
      replay AS (
        SELECT CAST(sum(rw.n) AS BIGINT) AS n_matched,
          CAST(sum(rw.r) AS BIGINT) AS r_matched
        FROM rewards rw JOIN policy p
          ON rw.month = p.month AND rw.action = p.policy_action),
      baseline AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_all, CAST(sum(r) AS BIGINT) AS r_all
        FROM rewards),
      oracle_arm AS (
        SELECT sum(r) * 1000000 // sum(n) AS oracle_fixed_arm_ppm
        FROM rewards GROUP BY action
        ORDER BY sum(r) * 1000000 // sum(n) DESC, action LIMIT 1)
      SELECT r.n_matched,
        r.r_matched * 1000000 // greatest(r.n_matched, 1) AS policy_reward_ppm,
        b.r_all * 1000000 // b.n_all AS logging_reward_ppm,
        CAST(o.oracle_fixed_arm_ppm AS BIGINT) AS oracle_fixed_arm_ppm
      FROM replay r CROSS JOIN baseline b CROSS JOIN oracle_arm o
    """))

  // ---------------------------------------------------------------- q468

  /** Storage-tiering bill: order months placed on hot (< 90 days old at
    * the data's end), warm (< 365) or cold tiers, with bytes estimated
    * from live row counts and literal per-GiB tier prices (milli-units)
    * — the monthly bill under age tiering vs keeping everything hot,
    * and the savings. The lifecycle-policy decision every lake makes,
    * priced from the engine's own census (q277 sizes for broadcast;
    * q294 measures freshness; this turns age into money).
    *
    * Scale shape: one orders fold to per-month (rows, bytes); tier
    * assignment is a literal CASE on month age; the bill is a 3-row
    * fold. */
  private val q468 = QueryDef(
    "q468_storage_tiering_bill",
    (spark, dir) => {
      val monthly = Tables.orders(spark, dir)
        .groupBy(expr("date_format(o_orderdate, 'yyyy-MM')").as("month"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("est_bytes", col("n_rows") * 64L)
      val mmax = monthly.agg(max(col("month")).as("mmax"))
      val aged = monthly.crossJoin(broadcast(mmax))
        .withColumn("age_months", expr(
          """(CAST(substring(mmax, 1, 4) AS BIGINT) * 12
              + CAST(substring(mmax, 6, 2) AS BIGINT))
             - (CAST(substring(month, 1, 4) AS BIGINT) * 12
                + CAST(substring(month, 6, 2) AS BIGINT))"""))
        .withColumn("tier", when(col("age_months") < 3L, "hot")
          .when(col("age_months") < 12L, "warm").otherwise("cold"))
      // price per byte in nano-units: hot 100, warm 30, cold 4
      val priced = aged
        .withColumn("price_nano", when(col("tier") === "hot", 100L)
          .when(col("tier") === "warm", 30L).otherwise(4L))
      priced.groupBy(col("tier"), col("price_nano"))
        .agg(count(lit(1)).as("n_months"), sum(col("n_rows")).as("n_rows"),
          sum(col("est_bytes")).as("est_bytes"),
          sum(expr("est_bytes * price_nano")).as("bill_nano"),
          sum(expr("est_bytes * 100")).as("all_hot_nano"))
        .select(col("tier"), col("n_months"), col("n_rows"), col("est_bytes"),
          col("bill_nano"),
          expr("(all_hot_nano - bill_nano) * 1000000 div all_hot_nano")
            .as("savings_ppm"))
        .orderBy(col("tier"))
    },
    Some("""
      WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) * 64 AS BIGINT) AS est_bytes
        FROM orders GROUP BY 1),
      mm AS (SELECT max(month) AS mmax FROM monthly),
      aged AS (
        SELECT month, n_rows, est_bytes,
          (CAST(substring(mmax, 1, 4) AS BIGINT) * 12
             + CAST(substring(mmax, 6, 2) AS BIGINT))
          - (CAST(substring(month, 1, 4) AS BIGINT) * 12
             + CAST(substring(month, 6, 2) AS BIGINT)) AS age_months
        FROM monthly CROSS JOIN mm),
      tiered AS (
        SELECT *, CASE WHEN age_months < 3 THEN 'hot'
            WHEN age_months < 12 THEN 'warm' ELSE 'cold' END AS tier,
          CASE WHEN age_months < 3 THEN 100
            WHEN age_months < 12 THEN 30 ELSE 4 END AS price_nano
        FROM aged)
      SELECT tier, CAST(count(*) AS BIGINT) AS n_months,
        CAST(sum(n_rows) AS BIGINT) AS n_rows,
        CAST(sum(est_bytes) AS BIGINT) AS est_bytes,
        CAST(sum(est_bytes * price_nano) AS BIGINT) AS bill_nano,
        CAST((sum(est_bytes * 100) - sum(est_bytes * price_nano)) * 1000000
          // sum(est_bytes * 100) AS BIGINT) AS savings_ppm
      FROM tiered GROUP BY tier, price_nano
      ORDER BY tier
    """))

  // ---------------------------------------------------------------- q469

  /** Outer-join decomposition certificate: FULL OUTER customer⋈orders
    * counted directly and reassembled as inner + left-anti + right-anti
    * — with row counts AND a value checksum per component, proving the
    * identity the planner uses to split outer joins across strategies
    * (e.g. broadcast the anti sides separately). A count-only check
    * would miss row substitution; the key-sum checksum closes that.
    *
    * Scale shape: each component is one keyed join over the same two
    * scans; output is 4 rows. */
  private val q469 = QueryDef(
    "q469_outer_join_decomposition",
    (spark, dir) => {
      // both sides filtered so inner, left-anti and right-anti are all
      // non-empty (the raw FK pair has perfect coverage: antis = 0)
      val c = Tables.customer(spark, dir).select(col("c_custkey"))
        .filter(col("c_custkey") % 3L =!= 1L)
      val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"))
        .filter(col("o_orderdate") < "1996-01-01")
      val full = c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("c_custkey"), lit(0L)) +
            coalesce(col("o_orderkey"), lit(0L))).as("checksum"))
        .select(lit("full_direct").as("component"), col("n"), col("checksum"))
      val inner = c.join(o, col("c_custkey") === col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_custkey") + col("o_orderkey")).as("checksum"))
        .select(lit("inner").as("component"), col("n"), col("checksum"))
      val leftAnti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
          coalesce(sum(col("c_custkey")), lit(0L)).as("checksum"))
        .select(lit("left_anti").as("component"), col("n"), col("checksum"))
      val rightAnti = o.join(c, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
          coalesce(sum(col("o_orderkey")), lit(0L)).as("checksum"))
        .select(lit("right_anti").as("component"), col("n"), col("checksum"))
      full.unionAll(inner).unionAll(leftAnti).unionAll(rightAnti)
        .orderBy(col("component"))
    },
    Some("""
      WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 1),
      o AS (SELECT o_custkey, o_orderkey FROM orders
            WHERE o_orderdate < TIMESTAMP '1996-01-01'),
      full_direct AS (
        SELECT 'full_direct' AS component, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(coalesce(c_custkey, 0) + coalesce(o_orderkey, 0)) AS BIGINT)
            AS checksum
        FROM c FULL JOIN o ON c.c_custkey = o.o_custkey),
      inner_j AS (
        SELECT 'inner', CAST(count(*) AS BIGINT),
          CAST(sum(c_custkey + o_orderkey) AS BIGINT)
        FROM c JOIN o ON c.c_custkey = o.o_custkey),
      left_anti AS (
        SELECT 'left_anti', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
        FROM c WHERE c_custkey NOT IN (SELECT o_custkey FROM o)),
      right_anti AS (
        SELECT 'right_anti', CAST(count(*) AS BIGINT),
          CAST(coalesce(sum(o_orderkey), 0) AS BIGINT)
        FROM o WHERE o_custkey NOT IN (SELECT c_custkey FROM c))
      SELECT * FROM full_direct
      UNION ALL SELECT * FROM inner_j
      UNION ALL SELECT * FROM left_anti
      UNION ALL SELECT * FROM right_anti
      ORDER BY component
    """))

  override def defs: Seq[QueryDef] = Seq(q467, q468, q469)
}
