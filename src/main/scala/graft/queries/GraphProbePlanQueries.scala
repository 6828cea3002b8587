package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 3: three graph probes the catalog lacked — degree-
  * weighted link prediction (resource allocation, the score that beats
  * raw common-neighbor counts by discounting promiscuous hubs), the
  * strongly-connected bowtie decomposition of a DIRECTED trade graph
  * (every prior component query was undirected), and the classic
  * two-sweep BFS diameter lower bound. All three keep the established
  * graph discipline: hub caps bound candidate generation, bounded
  * node sets get checkpointed once and iterated cheaply, per-round
  * plans stay keyed-shuffle-only.
  */
object GraphProbePlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q699

  /** Link prediction by resource allocation: for supplier pairs not yet
    * co-supplying, RA(u,v) = Σ_{x ∈ Γ(u)∩Γ(v)} 1/deg(x) — a common
    * neighbor shared with the whole market says nothing, one shared
    * with a 2-degree specialist says a lot. The per-neighbor weight is
    * the floored ⌊10⁶/deg(x)⌋ both engines share, summed exactly; same
    * hub cap (deg > 64 excluded as wildcards) and anti-join as q386,
    * whose unweighted Jaccard this refines.
    *
    * Scale shape: candidate generation is Σ_{x: deg≤64} deg(x)² —
    * bounded per node by the cap; weights join on the bounded neighbor
    * key before the pair fold; anti-join and top-k are standard
    * shuffles. Nothing quadratic in node count. */
  private val q699 = QueryDef(
    "q699_resource_allocation_links",
    (spark, dir) => {
      // r13: canonical pairs from the memoized graph.Backbone build
      val und = graft.graph.Backbone.coSupplyCanon(spark, dir)
        .select(col("u").as("a"), col("v").as("b"))
      val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      val deg = adj.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      val small = adj
        .join(deg.filter(col("deg") <= 64L)
          .select(col("node"), expr("1000000 div deg").as("w")),
          col("b") === col("node"))
        .select(col("a"), col("b"), col("w"))
      val scored = small.select(col("a").as("u"), col("b").as("x"), col("w"))
        .join(small.select(col("a").as("v"), col("b").as("x")), Seq("x"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v"))
        .agg(sum(col("w")).as("ra_ppm"), count(lit(1)).as("cn"))
      scored
        .join(und, col("u") === col("a") && col("v") === col("b"),
          "left_anti")
        .select(col("u"), col("v"), col("cn"), col("ra_ppm"))
        .orderBy(col("ra_ppm").desc, col("u"), col("v"))
        .limit(20)
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'),
      und AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
      adj AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
              FROM adj GROUP BY 1),
      small AS (
        SELECT adj.a, adj.b, 1000000 // deg.deg AS w
        FROM adj JOIN deg ON adj.b = deg.node
        WHERE deg.deg <= 64),
      scored AS (
        SELECT s1.a AS u, s2.a AS v,
          CAST(sum(s1.w) AS BIGINT) AS ra_ppm,
          CAST(count(*) AS BIGINT) AS cn
        FROM small s1 JOIN small s2 ON s1.b = s2.b AND s1.a < s2.a
        GROUP BY 1, 2)
      SELECT u, v, cn, ra_ppm
      FROM scored
      WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = u AND und.b = v)
      ORDER BY ra_ppm DESC, u, v
      LIMIT 20
    """))

  // ---------------------------------------------------------------- q700

  /** Bowtie decomposition of the directed nation trade graph (edge
    * A→B when a high-value order — one March-1995 week, totalprice >
    * 300k, the sparsifier that keeps the bowtie from collapsing to
    * all-core — by a nation-A customer includes a line supplied from
    * nation B): find the largest strongly-connected
    * component by transitive closure, then classify every nation as
    * CORE (in it), IN (reaches it), OUT (reached from it), or DISC.
    * The Broder bowtie is THE macroscopic shape statistic for directed
    * graphs, and no prior query handles directed reachability.
    *
    * Scale shape: the fact join folds once to the ≤25×25 nation edge
    * set (checkpointed — the doubling rounds never rescan facts);
    * closure is 5 doubling self-joins on the ≤625-row relation
    * (diameter 25 < 2⁵), each checkpointed so plans stay flat; SCC ids,
    * the max component, and the classification are dimension-sized.
    * For a larger node universe the same doubling works until |V|²
    * pairs stop being "bounded" — then switch to q56's label
    * propagation on the condensed graph. */
  private val q700 = QueryDef(
    "q700_scc_bowtie",
    (spark, dir) => {
      val base = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-03-01" &&
          col("o_orderdate") < "1995-03-08" &&
          col("o_totalprice") > 300000d)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, dir),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(true) // ≤ 625 rows; rounds never rescan facts
      var reach = base
      // r13 fixpoint shortcut: doubling only ADDS pairs, so an unchanged
      // pair count proves the closure is complete and the remaining
      // rounds are provable no-ops (the count rides the materialized
      // checkpoint — one cheap job per live round; the nation closure
      // saturates in 2-3 doublings, not 5)
      var rCount = base.count()
      var fixed = false
      for (_ <- 1 to 5 if !fixed) {
        reach = reach
          .union(reach.join(
            reach.select(col("src").as("mid"), col("dst").as("d2")),
            col("dst") === col("mid"))
            .select(col("src"), col("d2").as("dst")))
          .distinct()
          .localCheckpoint(true)
        val n = reach.count()
        fixed = n == rCount
        rCount = n
      }
      val nodes = base.select(col("src").as("node"))
        .union(base.select(col("dst").as("node"))).distinct()
      val sccId = nodes
        .join(reach.union(nodes.select(col("node").as("src"),
            col("node").as("dst"))) // reflexive closure
          .select(col("src").as("node"), col("dst").as("fwd")),
          Seq("node"))
        .join(reach.union(nodes.select(col("node").as("src"),
            col("node").as("dst")))
          .select(col("dst").as("node"), col("src").as("bwd")),
          Seq("node"))
        .filter(col("fwd") === col("bwd"))
        .groupBy(col("node")).agg(min(col("fwd")).as("scc"))
      val core = sccId.groupBy(col("scc")).agg(count(lit(1)).as("sz"))
        .orderBy(col("sz").desc, col("scc")).limit(1)
        .select(col("scc").as("core_id"))
      val coreNodes = sccId.join(broadcast(core),
        col("scc") === col("core_id")).select(col("node"))
      val reachesCore = reach.join(broadcast(
          coreNodes.select(col("node").as("dst"))), Seq("dst"))
        .select(col("src").as("node")).distinct()
      val fromCore = reach.join(broadcast(
          coreNodes.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
      nodes
        .join(broadcast(coreNodes.withColumn("c", lit(1))), Seq("node"),
          "left")
        .join(broadcast(reachesCore.withColumn("i", lit(1))), Seq("node"),
          "left")
        .join(broadcast(fromCore.withColumn("o", lit(1))), Seq("node"),
          "left")
        .select(when(col("c") === 1, "core")
          .when(col("i") === 1, "in")
          .when(col("o") === 1, "out")
          .otherwise("disc").as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("n_nations"))
        .orderBy(col("part"))
    },
    Some("""
      WITH base AS MATERIALIZED (
        SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE o_orderdate >= TIMESTAMP '1995-03-01'
          AND o_orderdate < TIMESTAMP '1995-03-08'
          AND o_totalprice > 300000
          AND c_nationkey <> s_nationkey),
      r1 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM base
          UNION ALL
          SELECT a.src, b.dst FROM base a JOIN base b ON a.dst = b.src)),
      r2 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r1
          UNION ALL
          SELECT a.src, b.dst FROM r1 a JOIN r1 b ON a.dst = b.src)),
      r3 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r2
          UNION ALL
          SELECT a.src, b.dst FROM r2 a JOIN r2 b ON a.dst = b.src)),
      r4 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r3
          UNION ALL
          SELECT a.src, b.dst FROM r3 a JOIN r3 b ON a.dst = b.src)),
      reach AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM r4
          UNION ALL
          SELECT a.src, b.dst FROM r4 a JOIN r4 b ON a.dst = b.src)),
      nodes AS MATERIALIZED (
        SELECT src AS node FROM base UNION SELECT dst FROM base),
      closure AS MATERIALIZED (
        SELECT src, dst FROM reach
        UNION SELECT node, node FROM nodes),
      scc AS MATERIALIZED (
        SELECT f.src AS node, min(f.dst) AS scc
        FROM closure f JOIN closure b ON f.src = b.dst AND f.dst = b.src
        GROUP BY f.src),
      core AS MATERIALIZED (
        SELECT scc AS core_id FROM (
          SELECT scc, count(*) AS sz FROM scc GROUP BY scc
          ORDER BY sz DESC, scc LIMIT 1)),
      cls AS (
        SELECT n.node,
          CASE
            WHEN s.scc = (SELECT core_id FROM core) THEN 'core'
            WHEN EXISTS (SELECT 1 FROM reach r JOIN scc s2 ON r.dst = s2.node
                         WHERE r.src = n.node
                           AND s2.scc = (SELECT core_id FROM core))
              THEN 'in'
            WHEN EXISTS (SELECT 1 FROM reach r JOIN scc s2 ON r.src = s2.node
                         WHERE r.dst = n.node
                           AND s2.scc = (SELECT core_id FROM core))
              THEN 'out'
            ELSE 'disc' END AS part
        FROM nodes n JOIN scc s ON s.node = n.node)
      SELECT part, CAST(count(*) AS BIGINT) AS n_nations
      FROM cls GROUP BY part ORDER BY part
    """))

  // ---------------------------------------------------------------- q701

  /** Two-sweep BFS diameter lower bound on the co-supply graph: sweep 1
    * runs capped BFS (5 relaxation rounds) from the max-degree node
    * (ties → min key); sweep 2 re-runs from the farthest node sweep 1
    * settled (ties → min key). Each sweep reports its source, reached
    * count, and eccentricity-within-cap; sweep 2's ecc is the classic
    * diameter lower bound that one arbitrary-source BFS misses. The
    * 5-round cap makes the statistic well-defined at every SF (a capped
    * ecc is still a valid lower bound).
    *
    * Scale shape: q427's iterate-shuffle — one keyed join + min-agg per
    * round over the persisted edge list, frontier-filtered; the
    * source/argmax selections are one-row folds. Each round's dist
    * (node-sized) is localCheckpointed (q691's discipline): ten nested
    * persisted AQE plans made the per-stage plan-string render (AQE's
    * onUpdatePlan explain) combinatorially expensive — measured 700+ s
    * of driver CPU in generateTreeString before the checkpoint cut. */
  private val q701 = QueryDef(
    "q701_two_sweep_diameter",
    (spark, dir) => {
      // r13: edges mirror the memoized checkpointed graph.Backbone canon
      val edges = graft.graph.Backbone.coSupplySym(spark, dir).persist()
      // r13 FRONTIER BFS (guide §2.3 — shuffle fewer bytes): each round
      // expands only the nodes settled IN THE PREVIOUS ROUND instead of
      // every settled node (a node settled at round r-2 already pushed
      // min(d+1) to its neighbors at round r-1, so re-expanding it can
      // never lower any distance — classic BFS layering, identical
      // distances), and an empty frontier ends the sweep early: all
      // later frontiers are provably empty too, so the fixed 5 rounds
      // were paying for no-op rounds (the r12 verdict measured 2 of the
      // 4 paid rounds doing no useful work on this near-clique graph).
      // `reached` holds exactly the d < 9999 rows of the old dist table.
      def sweep(seed: org.apache.spark.sql.DataFrame) = {
        var frontier = seed.withColumn("d", lit(0L)).localCheckpoint(true)
        var reached = frontier
        var r = 0L
        var done = false
        while (r < 5 && !done) {
          r += 1
          val rr = r // stable copy for the closure
          val next = edges
            .join(frontier.select(col("node").as("src")), Seq("src"))
            .select(col("dst").as("node")).distinct()
            .join(reached.select(col("node")), Seq("node"), "left_anti")
            .select(col("node"), lit(rr).as("d"))
            .localCheckpoint(true)
          if (next.isEmpty) done = true
          else {
            frontier = next
            reached = reached.union(next)
          }
        }
        reached
      }
      val s1seed = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("dg"))
        .orderBy(col("dg").desc, col("node")).limit(1).select(col("node"))
      val d1 = sweep(s1seed)
      val s2seed = d1.filter(col("d") < 9999L)
        .orderBy(col("d").desc, col("node")).limit(1).select(col("node"))
      val d2 = sweep(s2seed)
      def report(tag: String, seed: org.apache.spark.sql.DataFrame,
          dist: org.apache.spark.sql.DataFrame) =
        dist.filter(col("d") < 9999L)
          .agg(count(lit(1)).as("reached"), max(col("d")).as("ecc_capped"))
          .crossJoin(broadcast(seed.select(col("node").as("source"))))
          .select(lit(tag).as("sweep"), col("source"), col("reached"),
            col("ecc_capped"))
      report("s1_maxdeg", s1seed, d1)
        .unionAll(report("s2_farthest", s2seed, d2))
        .orderBy(col("sweep"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'),
      e AS MATERIALIZED (
        SELECT DISTINCT a.sk AS src, b.sk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.sk <> b.sk),
      nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
      seed1 AS MATERIALIZED (
        SELECT src AS node FROM e GROUP BY src
        ORDER BY count(*) DESC, src LIMIT 1),
      a0 AS MATERIALIZED (
        SELECT node,
          CASE WHEN node IN (SELECT node FROM seed1) THEN 0 ELSE 9999 END
            AS d
        FROM nodes),
      a1 AS MATERIALIZED (
        SELECT a0.node, least(a0.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM a0 LEFT JOIN e ON e.dst = a0.node
          LEFT JOIN a0 s ON s.node = e.src AND s.d < 9999
        GROUP BY a0.node, a0.d),
      a2 AS MATERIALIZED (
        SELECT a1.node, least(a1.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM a1 LEFT JOIN e ON e.dst = a1.node
          LEFT JOIN a1 s ON s.node = e.src AND s.d < 9999
        GROUP BY a1.node, a1.d),
      a3 AS MATERIALIZED (
        SELECT a2.node, least(a2.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM a2 LEFT JOIN e ON e.dst = a2.node
          LEFT JOIN a2 s ON s.node = e.src AND s.d < 9999
        GROUP BY a2.node, a2.d),
      a4 AS MATERIALIZED (
        SELECT a3.node, least(a3.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM a3 LEFT JOIN e ON e.dst = a3.node
          LEFT JOIN a3 s ON s.node = e.src AND s.d < 9999
        GROUP BY a3.node, a3.d),
      a5 AS MATERIALIZED (
        SELECT a4.node, least(a4.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM a4 LEFT JOIN e ON e.dst = a4.node
          LEFT JOIN a4 s ON s.node = e.src AND s.d < 9999
        GROUP BY a4.node, a4.d),
      seed2 AS MATERIALIZED (
        SELECT node FROM a5 WHERE d < 9999
        ORDER BY d DESC, node LIMIT 1),
      b0 AS MATERIALIZED (
        SELECT node,
          CASE WHEN node IN (SELECT node FROM seed2) THEN 0 ELSE 9999 END
            AS d
        FROM nodes),
      b1 AS MATERIALIZED (
        SELECT b0.node, least(b0.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM b0 LEFT JOIN e ON e.dst = b0.node
          LEFT JOIN b0 s ON s.node = e.src AND s.d < 9999
        GROUP BY b0.node, b0.d),
      b2 AS MATERIALIZED (
        SELECT b1.node, least(b1.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM b1 LEFT JOIN e ON e.dst = b1.node
          LEFT JOIN b1 s ON s.node = e.src AND s.d < 9999
        GROUP BY b1.node, b1.d),
      b3 AS MATERIALIZED (
        SELECT b2.node, least(b2.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM b2 LEFT JOIN e ON e.dst = b2.node
          LEFT JOIN b2 s ON s.node = e.src AND s.d < 9999
        GROUP BY b2.node, b2.d),
      b4 AS MATERIALIZED (
        SELECT b3.node, least(b3.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM b3 LEFT JOIN e ON e.dst = b3.node
          LEFT JOIN b3 s ON s.node = e.src AND s.d < 9999
        GROUP BY b3.node, b3.d),
      b5 AS MATERIALIZED (
        SELECT b4.node, least(b4.d, coalesce(min(s.d + 1), 9999)) AS d
        FROM b4 LEFT JOIN e ON e.dst = b4.node
          LEFT JOIN b4 s ON s.node = e.src AND s.d < 9999
        GROUP BY b4.node, b4.d),
      rep AS (
        SELECT 's1_maxdeg' AS sweep,
          (SELECT node FROM seed1) AS source,
          CAST(count(*) AS BIGINT) AS reached,
          CAST(max(d) AS BIGINT) AS ecc_capped
        FROM a5 WHERE d < 9999
        UNION ALL
        SELECT 's2_farthest', (SELECT node FROM seed2),
          CAST(count(*) AS BIGINT), CAST(max(d) AS BIGINT)
        FROM b5 WHERE d < 9999)
      SELECT sweep, source, reached, ecc_capped FROM rep ORDER BY sweep
    """))

  def defs: Seq[QueryDef] = Seq(q699, q700, q701)
}
