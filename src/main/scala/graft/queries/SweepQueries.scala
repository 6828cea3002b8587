package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 structural operators: degree-ordered triangle counting, the
  * sweep-line peak-concurrency aggregate, and CDC merge (changelog →
  * snapshot with upsert/delete semantics).
  */
object SweepQueries extends QueryGroup {

  /** Triangle census of the co-supply graph (suppliers that served the
    * same order, one ship-year), counted with the DEGREE-ORDERED
    * orientation: every undirected edge points from its (degree, id)-
    * smaller endpoint to the larger, turning the graph into a DAG whose
    * out-degrees are O(√m) — so the wedge self-join generates
    * O(m^1.5) candidates instead of the O(Σ deg²) of a naive
    * neighbor join, the standard bound that keeps triangle counting
    * feasible on power-law graphs at 100 TB. Each triangle survives as
    * exactly one wedge (apex = smallest endpoint) whose closing edge
    * exists in the oriented set — counted once, no /3 or /6 fixups.
    * Output: one metrics row per graph statistic (union of scalar
    * aggregates — no cross join of one-row relations needed). */
  private val q95 = QueryDef(
    "q95_triangle_count",
    (spark, dir) => {
      // r13: the pair projection, degrees, orientation and the wedge
      // semi-join all come from the memoized graph.Backbone builds —
      // q95/q551 and the wider co-supply family share ONE fact pass
      // (plans/r13/q95_*.txt: the build chain collapses to LogicalRDD
      // reads after the first consumer).
      val pairs = graft.graph.Backbone.coSupplyCanon(spark, dir)
        .select(col("u").as("a"), col("v").as("b"))
      val deg = pairs.select(col("a").as("node"))
        .union(pairs.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      def metric(name: String, df: DataFrame, cnt: Column): DataFrame =
        df.agg(cnt.as("value")).select(lit(name).as("metric"), col("value"))
      metric("n_nodes", deg, count(lit(1)))
        .union(metric("n_edges", pairs, count(lit(1))))
        .union(graft.graph.Backbone.coSupplyTriangleCount(spark, dir)
          .select(lit("n_triangles").as("metric"),
            col("n_triangles").as("value")))
        .orderBy("metric")
    },
    Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'),
      pairs AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
      deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
        GROUP BY node),
      o AS (
        SELECT CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.a ELSE p.b END AS u,
               CASE WHEN (da.d, p.a) < (db.d, p.b) THEN p.b ELSE p.a END AS v
        FROM pairs p
        JOIN deg da ON da.node = p.a
        JOIN deg db ON db.node = p.b),
      w AS (
        SELECT e1.v AS u, e2.v AS v
        FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v <> e2.v),
      tri AS (SELECT count(*) AS n FROM w SEMI JOIN o USING (u, v))
      SELECT metric, value FROM (
        SELECT 'n_nodes' AS metric, CAST(count(*) AS BIGINT) AS value FROM deg
        UNION ALL
        SELECT 'n_edges', CAST(count(*) AS BIGINT) FROM pairs
        UNION ALL
        SELECT 'n_triangles', CAST(n AS BIGINT) FROM tri)
      ORDER BY metric
    """))

  /** Peak concurrency by sweep line: each event opens a 300-second
    * interval; the classic +1/-1 delta stream under a running sum gives
    * the live-interval count at every boundary, and the per-type max is
    * the answer ("how many sessions were open at once"). The RANGE
    * frames make same-instant starts and ends commute, so the result is
    * tie-order independent — deterministic across engines and
    * partitionings.
    *
    * Scale shape: a single running sum per event_type would funnel each
    * type through ONE task (there are only a handful of types), so the
    * prefix sum is computed in the standard two-level distributed form:
    * (1) running sums WITHIN each (type, day) chunk — thousands of
    * independent partitions; (2) per-chunk totals prefix-summed across
    * days, a window over the chunk-count-sized aggregate only; (3) the
    * day offset added back to every in-day running value. The ORACLE is
    * deliberately the naive single-partition window the two-level form
    * replaces, proving the decomposition exact. The naive alternative —
    * a self-join testing interval overlap — is quadratic and never
    * built. */
  private val q96 = QueryDef(
    "q96_peak_concurrency",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), epochS(col("ts")).as("t"))
      val deltas = ev.select(col("event_type"), col("t"), lit(1L).as("delta"))
        .union(ev.select(col("event_type"), (col("t") + 300).as("t"),
          lit(-1L).as("delta")))
        .withColumn("day", expr("t div 86400"))
      // (1) intra-chunk running sums — partitioned by (type, day)
      val intra = deltas.withColumn("run_in_day", sum(col("delta")).over(
        Window.partitionBy(col("event_type"), col("day")).orderBy(col("t"))))
      // (2) chunk totals, prefix-summed across days (chunk-sized data)
      val offsets = deltas
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("delta")).as("day_sum"))
        .withColumn("day_offset",
          coalesce(sum(col("day_sum")).over(
            Window.partitionBy(col("event_type")).orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("event_type"), col("day"), col("day_offset"))
      // (3) recombine, reduce to per-(type, day) peaks row-locally, then
      // resolve the per-type peak over the day-level aggregate only —
      // no row-level window ever partitions by type alone
      val live = intra.join(offsets, Seq("event_type", "day"))
        .withColumn("live", col("day_offset") + col("run_in_day"))
      val perDay = live
        .withColumn("day_peak", max(col("live")).over(
          Window.partitionBy(col("event_type"), col("day"))))
        .filter(col("live") === col("day_peak"))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("live")).as("day_peak"), min(col("t")).as("first_t"))
      perDay
        .withColumn("peak", max(col("day_peak")).over(
          Window.partitionBy(col("event_type"))))
        .filter(col("day_peak") === col("peak"))
        .groupBy(col("event_type"))
        .agg(max(col("day_peak")).as("peak_concurrency"),
          min(col("first_t")).as("first_peak_at_s"))
        .orderBy("event_type")
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS t
        FROM events),
      deltas AS (
        SELECT event_type, t, CAST(1 AS BIGINT) AS delta FROM e
        UNION ALL
        SELECT event_type, t + 300, CAST(-1 AS BIGINT) FROM e),
      r AS (
        SELECT event_type, t,
          sum(delta) OVER (PARTITION BY event_type ORDER BY t) AS live
        FROM deltas),
      p AS (
        SELECT event_type, t, live,
          max(live) OVER (PARTITION BY event_type) AS peak
        FROM r)
      SELECT event_type,
        CAST(max(live) AS BIGINT) AS peak_concurrency,
        min(CASE WHEN live = peak THEN t END) AS first_peak_at_s
      FROM p GROUP BY event_type ORDER BY event_type
    """))

  /** CDC merge: apply a keyed changelog (upserts + deletes, ordered by
    * (timestamp, event_id)) onto a base snapshot — the MERGE INTO of a
    * lakehouse table, as one dataflow. The changelog collapses to its
    * per-key LAST change with a single max(struct(...)) hash
    * aggregation (map-side partials keep one row per key — the q61
    * keep-latest shape, extended with delete semantics), then a single
    * full-outer join against the base decides each key's fate: base-only
    * rows survive untouched, upserts replace, deletes drop, never-seen
    * keys insert. History is never sorted and the base is scanned
    * once. Changelog here: events per user (event_type 'error' ⇒
    * DELETE, anything else ⇒ UPSERT of the event value). */
  private val q97 = QueryDef(
    "q97_cdc_merge",
    (spark, dir) => {
      import graft.functions.Deterministic.{cents, epochS}
      val base = Tables.customer(spark, dir)
        .filter(col("c_custkey") < 150)
        .select(col("c_custkey").as("key"), cents(col("c_acctbal")).as("base_cents"))
      val last = Tables.events(spark, dir)
        .select(col("user_id").as("key"),
          epochS(col("ts")).as("ts_s"), col("event_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
          cents(col("value")).as("vc"))
        .groupBy(col("key"))
        .agg(max(struct(col("ts_s"), col("event_id"), col("op"), col("vc"))).as("l"),
          count(lit(1)).as("n_changes"))
      base
        .join(last, Seq("key"), "full_outer")
        .filter(col("l").isNull || col("l.op") =!= "D")
        .select(col("key"),
          coalesce(col("l.vc"), col("base_cents")).as("val_cents"),
          coalesce(col("n_changes"), lit(0L)).as("n_changes"),
          when(col("l").isNull, "base")
            .when(col("base_cents").isNull, "insert")
            .otherwise("upsert").as("src"))
        .orderBy("key")
    },
    Some("""
      WITH ch AS (
        SELECT user_id AS key,
          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
          CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_s, event_id
        FROM events),
      last AS (
        SELECT key, op, vc, n_changes FROM (
          SELECT key, op, vc,
            row_number() OVER (PARTITION BY key ORDER BY ts_s DESC, event_id DESC) AS rn,
            CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n_changes
          FROM ch) WHERE rn = 1),
      base AS (
        SELECT c_custkey AS key, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bc
        FROM customer WHERE c_custkey < 150)
      SELECT coalesce(b.key, l.key) AS key,
        coalesce(l.vc, b.bc) AS val_cents,
        coalesce(l.n_changes, 0) AS n_changes,
        CASE WHEN l.key IS NULL THEN 'base'
             WHEN b.key IS NULL THEN 'insert'
             ELSE 'upsert' END AS src
      FROM base b FULL OUTER JOIN last l ON b.key = l.key
      WHERE l.op IS NULL OR l.op <> 'D'
      ORDER BY key
    """))

  def defs: Seq[QueryDef] = Seq(q95, q96, q97)
}
