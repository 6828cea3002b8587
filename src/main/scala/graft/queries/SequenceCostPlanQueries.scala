package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 8: order-structure probes — exact subsequence-pattern
  * COUNTING over user event streams (how many view→click→purchase
  * paths exist, not just whether one does — q115's first-match funnel
  * can't see volume), and the natural-runs sortedness census that
  * prices an external merge sort before running it.
  */
object SequenceCostPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q714

  /** Subsequence funnel counting: per user, the EXACT number of
    * (view, click, purchase) index triples i < j < k in timestamp
    * order — the classic O(n) DP (carry cumulative A-counts into B
    * rows, cumulative AB-counts into C rows) expressed as three
    * stacked per-user running windows. Counting beats first-match
    * (q115) when funnels are valued by VOLUME: a user with 40
    * convertible paths is a different signal from a user with one.
    * Census: users bucketed by ⌊log₂(paths+1)⌋ with path totals.
    *
    * Scale shape: three user-keyed running windows over (ts, event_id)
    * order — partitions are per-user event streams (≤ ~10² rows at
    * these SFs; path counts grow ~(n_u/3)³, decimal(38,0)-safe to
    * ~10¹² events per user); the census folds users to ≤ ~40 buckets. */
  private val q714 = QueryDef(
    "q714_subsequence_funnel_count",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("a"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("b"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("c"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val staged = ev
        .withColumn("cum_a", coalesce(sum(col("a")).over(w), lit(0L)))
        .withColumn("ab", col("b") * col("cum_a"))
        .withColumn("cum_ab",
          coalesce(sum(col("ab")).over(w), lit(0L)).cast("decimal(38,0)"))
      val perUser = staged
        .groupBy(col("user_id"))
        .agg(sum(col("c").cast("decimal(38,0)") * col("cum_ab"))
          .as("paths"))
        .select(col("user_id"),
          coalesce(col("paths"), lit(0L)).cast("decimal(38,0)").as("paths"))
      perUser
        .select(expr("CAST(length(bin(CAST(paths AS BIGINT) + 1)) - 1" +
          " AS BIGINT)").as("log2_paths"),
          col("paths"))
        .groupBy(col("log2_paths"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("paths")).cast("long").as("total_paths"))
        .orderBy(col("log2_paths"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, ts,
          CAST(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS BIGINT)
            AS a,
          CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS BIGINT)
            AS b,
          CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            AS BIGINT) AS c
        FROM events WHERE ts IS NOT NULL),
      staged AS MATERIALIZED (
        SELECT user_id, c,
          coalesce(sum(b * cum_a) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS cum_ab
        FROM (
          SELECT user_id, event_id, ts, b, c,
            coalesce(sum(a) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_a
          FROM ev)),
      per_user AS MATERIALIZED (
        SELECT user_id,
          CAST(coalesce(sum(CAST(c AS HUGEINT) * cum_ab), 0) AS HUGEINT)
            AS paths
        FROM staged GROUP BY user_id)
      SELECT CAST(length(bin(CAST(paths AS BIGINT) + 1)) - 1 AS BIGINT)
          AS log2_paths,
        CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(paths) AS BIGINT) AS total_paths
      FROM per_user GROUP BY 1 ORDER BY log2_paths
    """))

  // ---------------------------------------------------------------- q715

  /** Natural-runs sortedness census: over the event stream in arrival
    * (event_id) order, count the maximal nondecreasing runs of the
    * cents value — Knuth's statistic that prices an external merge
    * sort (⌈log₂ runs⌉ merge passes) and detects accidental
    * presortedness worth exploiting before a rewrite. Sharded exactly
    * like q372: runs within 8192-event blocks via bounded keyed
    * windows, plus one boundary comparison per adjacent block pair —
    * never a corpus-wide window.
    *
    * Scale shape: one projection, block-keyed lag windows (≤8192 rows
    * per partition), a blocks-sized boundary stitch, one-row readout. */
  private val q715 = QueryDef(
    "q715_natural_runs_census",
    (spark, dir) => {
      import graft.functions.Deterministic.cents
      val ev = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_id"), cents(col("value")).as("v"),
          expr("event_id div 8192").as("blk"))
      val w = Window.partitionBy(col("blk")).orderBy(col("event_id"))
      val inBlock = ev
        .withColumn("prev", lag(col("v"), 1).over(w))
        .agg(count(lit(1)).as("n"),
          sum(when(col("prev").isNotNull && col("v") < col("prev"), 1L)
            .otherwise(0L)).as("in_breaks"))
      val edges = ev.groupBy(col("blk"))
        .agg(min(struct(col("event_id"), col("v"))).as("first"),
          max(struct(col("event_id"), col("v"))).as("last"))
        .select(col("blk"), col("first.v").as("fv"), col("last.v").as("lv"))
      val wb = Window.orderBy(col("blk"))
      val boundary = edges
        .withColumn("prev_lv", lag(col("lv"), 1).over(wb))
        .agg(sum(when(col("prev_lv").isNotNull && col("fv") < col("prev_lv"),
          1L).otherwise(0L)).as("edge_breaks"))
      inBlock.crossJoin(broadcast(boundary))
        .select(col("n"),
          (col("in_breaks") + col("edge_breaks") + 1).as("runs"))
        .select(col("n"), col("runs"),
          expr("runs * 1000000 div n").as("runs_ppm"),
          expr("CAST(CASE WHEN runs <= 1 THEN 0" +
            " ELSE length(bin(runs - 1)) END AS BIGINT)")
            .as("merge_passes"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
          event_id // 8192 AS blk
        FROM events WHERE value IS NOT NULL),
      in_block AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN prev IS NOT NULL AND v < prev THEN 1 ELSE 0
            END) AS BIGINT) AS in_breaks
        FROM (
          SELECT v, lag(v) OVER (PARTITION BY blk ORDER BY event_id)
            AS prev
          FROM ev)),
      edges AS MATERIALIZED (
        SELECT blk,
          arg_min(v, event_id) AS fv, arg_max(v, event_id) AS lv
        FROM ev GROUP BY blk),
      boundary AS MATERIALIZED (
        SELECT CAST(sum(CASE WHEN prev_lv IS NOT NULL AND fv < prev_lv
            THEN 1 ELSE 0 END) AS BIGINT) AS edge_breaks
        FROM (
          SELECT fv, lag(lv) OVER (ORDER BY blk) AS prev_lv FROM edges))
      SELECT n, in_breaks + edge_breaks + 1 AS runs,
        (in_breaks + edge_breaks + 1) * 1000000 // n AS runs_ppm,
        CAST(CASE WHEN in_breaks + edge_breaks + 1 <= 1 THEN 0
          ELSE length(bin(in_breaks + edge_breaks + 1 - 1)) END AS BIGINT)
          AS merge_passes
      FROM in_block CROSS JOIN boundary
    """))

  def defs: Seq[QueryDef] = Seq(q714, q715)
}
