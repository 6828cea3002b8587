package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents
import graft.operators.RankSelect

/** Round-4 sequence/causal/graph operators: gapped sequential-pattern
  * support (PrefixSpan's counting step), distributional quantile
  * treatment effects, and HITS hub/authority scoring — all integer-exact
  * for the oracle gate.
  */
object SequenceQueries extends QueryGroup {

  // ---------------------------------------------------------------- q413

  /** Gapped sequential-pattern support: for every ordered event-type
    * triple (a, b, c), how many users exhibit it as a SUBSEQUENCE (gaps
    * allowed) of their event stream — the support-counting core of
    * PrefixSpan/GSP sequence mining. q150/q87 count ADJACENT transitions;
    * this counts containment, which is what "signup … then purchase …
    * then error" funnels actually ask. Correct by the greedy-earliest
    * argument: a subsequence exists iff scanning for the earliest a,
    * then the earliest b after it, then any c after that, succeeds.
    *
    * Scale shape: all joins are keyed on user_id; each expansion
    * multiplies the per-user stream by the alphabet (×|T|, ×|T|²), a
    * bounded constant for a fixed vocabulary — never user×user and
    * never a global sort. Positions come from one per-user window. */
  private val q413 = QueryDef(
    "q413_gapped_sequence_support",
    (spark, dir) => {
      val p = Tables.events(spark, dir).select(col("user_id").as("u"),
        col("event_type").as("t"),
        row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))).as("pos"))
      val a = p.groupBy(col("u"), col("t").as("t1")).agg(min(col("pos")).as("pa"))
      val b = a.join(p.select(col("u"), col("t").as("t2"), col("pos")), Seq("u"))
        .filter(col("pos") > col("pa"))
        .groupBy(col("u"), col("t1"), col("t2")).agg(min(col("pos")).as("pb"))
      val c = b.join(p.select(col("u"), col("t").as("t3"), col("pos")), Seq("u"))
        .filter(col("pos") > col("pb"))
        .select(col("u"), col("t1"), col("t2"), col("t3")).distinct()
      c.groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("t1"), col("t2"), col("t3"))
    },
    Some("""
      WITH p AS (
        SELECT user_id AS u, event_type AS t,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
        FROM events),
      a AS (SELECT u, t AS t1, min(pos) AS pa FROM p GROUP BY u, t),
      b AS (
        SELECT a.u, a.t1, p.t AS t2, min(p.pos) AS pb
        FROM a JOIN p ON p.u = a.u AND p.pos > a.pa
        GROUP BY a.u, a.t1, p.t),
      c AS (
        SELECT DISTINCT b.u, b.t1, b.t2, p.t AS t3
        FROM b JOIN p ON p.u = b.u AND p.pos > b.pb)
      SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS support
      FROM c GROUP BY t1, t2, t3
      ORDER BY support DESC, t1, t2, t3
    """))

  // ---------------------------------------------------------------- q414

  /** Quantile treatment effects: the discounted-vs-undiscounted price
    * difference at every decile of the two distributions — the
    * DISTRIBUTIONAL causal readout that a mean effect (q240's DiD,
    * q236's elasticity) collapses; a treatment can leave the mean flat
    * while widening the tails. Exact rank selection via RankSelect's
    * two-level histogram (the q100/q142 machinery) on integer cents.
    *
    * Scale shape: the coarse pass is one (group, bin) agg; only rows in
    * the ≤ 18 selected bins are refined; the decile pivot runs on a
    * 2-row-per-decile table. */
  private val q414 = QueryDef(
    "q414_quantile_treatment_effects",
    (spark, dir) => {
      val bps = Seq(1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000)
      val li = Tables.lineitem(spark, dir).select(
        when(col("l_discount") > 0d, 1L).otherwise(0L).as("treated"),
        cents(col("l_extendedprice")).as("price_c"))
      val q = RankSelect.percentiles(li, "treated", "price_c", bps, 100000L)
      val long = q.selectExpr("treated", "n",
        s"stack(9, ${bps.map(bp => s"${bp}L, p_$bp").mkString(", ")}) AS (bp, qv)")
      val t1 = long.filter(col("treated") === 1)
        .select(col("bp"), col("n").as("n_treated"), col("qv").as("q_treated_c"))
      val t0 = long.filter(col("treated") === 0)
        .select(col("bp").as("bp0"), col("n").as("n_control"),
          col("qv").as("q_control_c"))
      t1.join(t0, col("bp") === col("bp0"))
        .select(col("bp"), col("n_treated"), col("n_control"),
          col("q_treated_c"), col("q_control_c"),
          (col("q_treated_c") - col("q_control_c")).as("qte_c"))
        .orderBy(col("bp"))
    },
    Some("""
      WITH li AS (
        SELECT CASE WHEN l_discount > 0 THEN 1 ELSE 0 END AS treated,
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM lineitem),
      cum AS (
        SELECT treated, price_c, c,
          sum(c) OVER (PARTITION BY treated ORDER BY price_c) AS cum,
          sum(c) OVER (PARTITION BY treated) AS n
        FROM (SELECT treated, price_c, count(*) AS c FROM li GROUP BY 1, 2)),
      qs AS (
        SELECT treated, CAST(max(n) AS BIGINT) AS n,
          CAST(min(CASE WHEN cum * 10000 >= 1000 * n THEN price_c END) AS BIGINT) AS p_1000,
          CAST(min(CASE WHEN cum * 10000 >= 2000 * n THEN price_c END) AS BIGINT) AS p_2000,
          CAST(min(CASE WHEN cum * 10000 >= 3000 * n THEN price_c END) AS BIGINT) AS p_3000,
          CAST(min(CASE WHEN cum * 10000 >= 4000 * n THEN price_c END) AS BIGINT) AS p_4000,
          CAST(min(CASE WHEN cum * 10000 >= 5000 * n THEN price_c END) AS BIGINT) AS p_5000,
          CAST(min(CASE WHEN cum * 10000 >= 6000 * n THEN price_c END) AS BIGINT) AS p_6000,
          CAST(min(CASE WHEN cum * 10000 >= 7000 * n THEN price_c END) AS BIGINT) AS p_7000,
          CAST(min(CASE WHEN cum * 10000 >= 8000 * n THEN price_c END) AS BIGINT) AS p_8000,
          CAST(min(CASE WHEN cum * 10000 >= 9000 * n THEN price_c END) AS BIGINT) AS p_9000
        FROM cum GROUP BY treated),
      lng AS (
        SELECT treated, n, CAST(1000 AS BIGINT) AS bp, p_1000 AS qv FROM qs
        UNION ALL SELECT treated, n, 2000, p_2000 FROM qs
        UNION ALL SELECT treated, n, 3000, p_3000 FROM qs
        UNION ALL SELECT treated, n, 4000, p_4000 FROM qs
        UNION ALL SELECT treated, n, 5000, p_5000 FROM qs
        UNION ALL SELECT treated, n, 6000, p_6000 FROM qs
        UNION ALL SELECT treated, n, 7000, p_7000 FROM qs
        UNION ALL SELECT treated, n, 8000, p_8000 FROM qs
        UNION ALL SELECT treated, n, 9000, p_9000 FROM qs)
      SELECT l1.bp, l1.n AS n_treated, l0.n AS n_control,
        l1.qv AS q_treated_c, l0.qv AS q_control_c,
        l1.qv - l0.qv AS qte_c
      FROM lng l1 JOIN lng l0
        ON l0.bp = l1.bp AND l1.treated = 1 AND l0.treated = 0
      ORDER BY l1.bp
    """))

  // ---------------------------------------------------------------- q415

  /** HITS hub/authority scores (3 iterations, integer-quantized with
    * max-normalization each half-step) on the bipartite customer→supplier
    * purchase graph: authoritative suppliers are bought by good hub
    * customers and vice versa — the mutual-reinforcement ranking that
    * complements q75's random-walk PageRank. Top 15 suppliers by final
    * authority, total tiebreak.
    *
    * Scale shape: q75's loop discipline — the edge list is built once
    * (localCheckpoint truncates the order×line self-join lineage), each
    * half-step is one keyed join + agg, and each normalizer is a one-row
    * broadcast max; scores stay ≤ 10⁶ so products stay ≤ 10¹² — no
    * overflow at any graph size. The wall-clock is dominated by the six
    * sequential global-reduction barriers (flat from sf0.001 to sf0.1 —
    * stage latency, not data volume); on a real cluster each barrier is
    * an O(1) scalar reduce, and deferring normalization would trade this
    * bounded-integer guarantee for deg³-growth overflow.
    *
    * Round-6 drift investigation (the r5 bench showed 6.30 → 8.07 s
    * isolated with no code change): a stage-level profile shows ~55 AQE
    * stage-materialization jobs of 15–400 ms each with per-stage data
    * time far below the scheduling envelope — the query is bound by
    * local[32] job-launch latency, so its wall-clock breathes ±25% with
    * JVM state (JIT warmth, GC pressure from whatever ran before).
    * Round-6 isolated recheck: 6.59 s at sf0.1 / 6.25 s at sf0.01 — the
    * r5 reading was suite-JVM noise, not a regression; no plan change
    * is warranted (fusing the two per-iteration normalize barriers
    * would change floor-division semantics and buy at most ~3 of the
    * ~20 barrier-latency slots).
    *
    * SCALING (round-7 probe, largest testdata = sf0.1): 5.36 s at
    * sf0.01 -> 6.47 s at sf0.1 (10x data, 1.21x time) - the unrolled
    * HITS rounds' barrier latency dominates; the co-supply edge list
    * is supplier-dimension-bounded. */
  private val q415 = QueryDef(
    "q415_hits_hub_authority",
    (spark, dir) => {
      // one order-year of purchase activity (q75's refresh-window
      // discipline): the date filter reaches the orders scan and cuts
      // the six downstream vector shuffles ~7×
      val edges = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s")), Seq("ok"))
        .select(col("c"), col("s")).distinct()
        .localCheckpoint(true)
      val supps = Tables.supplier(spark, dir).select(col("s_suppkey").as("s"))
      // each half-step's vector is read twice (its own max + the next
      // join) — persist the node-sized frames or round r's plan embeds
      // 2^r copies of round 1's subtree
      def normalize(df: DataFrame, k: String): DataFrame = {
        val p = df.persist()
        val mx = p.agg(max(col(k)).as("mx"))
        p.crossJoin(broadcast(mx))
          .select(p.columns.filter(_ != k).map(col) :+
            expr(s"$k * 1000000 div mx").as(k): _*)
      }
      // rounds run on EDGE-ACTIVE nodes only: zero-score isolates cannot
      // change any sum or max, so the full node tables join once at the
      // end instead of six times inside the loop
      var auth = edges.select(col("s")).distinct()
        .select(col("s"), lit(1000000L).as("a"))
      for (_ <- 1 to 3) {
        val hub = edges.join(auth, Seq("s"))
          .groupBy(col("c")).agg(sum(col("a")).as("h"))
        val hubN = normalize(hub, "h")
        val a2 = edges.join(hubN, Seq("c"))
          .groupBy(col("s")).agg(sum(col("h")).as("a"))
        auth = normalize(a2, "a")
      }
      supps.join(auth, Seq("s"), "left")
        .select(col("s").as("s_suppkey"),
          coalesce(col("a"), lit(0L)).as("authority_q"))
        .orderBy(col("authority_q").desc, col("s_suppkey"))
        .limit(15)
    },
    Some("""
      WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'),
      a0 AS (SELECT DISTINCT s, CAST(1000000 AS BIGINT) AS a FROM e),
      h1 AS (
        SELECT e.c, CAST(sum(a0.a) AS BIGINT) AS h
        FROM e JOIN a0 USING (s) GROUP BY e.c),
      h1n AS (SELECT c, h * 1000000 // (SELECT max(h) FROM h1) AS h FROM h1),
      a1 AS (
        SELECT e.s, CAST(sum(h1n.h) AS BIGINT) AS a
        FROM e JOIN h1n USING (c) GROUP BY e.s),
      a1n AS (SELECT s, a * 1000000 // (SELECT max(a) FROM a1) AS a FROM a1),
      h2 AS (
        SELECT e.c, CAST(sum(a1n.a) AS BIGINT) AS h
        FROM e JOIN a1n USING (s) GROUP BY e.c),
      h2n AS (SELECT c, h * 1000000 // (SELECT max(h) FROM h2) AS h FROM h2),
      a2 AS (
        SELECT e.s, CAST(sum(h2n.h) AS BIGINT) AS a
        FROM e JOIN h2n USING (c) GROUP BY e.s),
      a2n AS (SELECT s, a * 1000000 // (SELECT max(a) FROM a2) AS a FROM a2),
      h3 AS (
        SELECT e.c, CAST(sum(a2n.a) AS BIGINT) AS h
        FROM e JOIN a2n USING (s) GROUP BY e.c),
      h3n AS (SELECT c, h * 1000000 // (SELECT max(h) FROM h3) AS h FROM h3),
      a3 AS (
        SELECT e.s, CAST(sum(h3n.h) AS BIGINT) AS a
        FROM e JOIN h3n USING (c) GROUP BY e.s),
      a3n AS (SELECT s, a * 1000000 // (SELECT max(a) FROM a3) AS a FROM a3)
      SELECT sp.s_suppkey, CAST(coalesce(a3n.a, 0) AS BIGINT) AS authority_q
      FROM supplier sp LEFT JOIN a3n ON a3n.s = sp.s_suppkey
      ORDER BY authority_q DESC, s_suppkey
      LIMIT 15
    """))

  override def defs: Seq[QueryDef] = Seq(q413, q414, q415)
}
