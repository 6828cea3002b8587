package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 batch 5: three algorithm families the catalog had not yet
  * named — entropic optimal transport (Sinkhorn scaling in exact fixed
  * point), minimal-perfect-hash construction (BBHash level peeling),
  * and bit-sliced index aggregation (the BSI identity that lets a
  * bitmap index SUM a column without touching rows). All integer-exact
  * with total ORDER BYs.
  */
object TransportPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q755

  /** Fixed-point Sinkhorn: align src0's token-length distribution to
    * src1's under the kernel K(i,j) = 1000/(1+|i−j|) (heavier mass on
    * smaller length moves). Three unrolled scaling iterations in 2²⁰
    * fixed point — u ← a·S²/(K v), v ← b·S²/(K u) with integer floor
    * division, so both engines produce bit-identical scalings — then
    * the transport plan P = u∘K∘v/S² and its per-row marginals. The
    * row-marginal error after 3 rounds (column marginals are exact by
    * construction: v is computed LAST, so every column constraint
    * holds at emission) is the convergence readout; the plan cost
    * Σ P·|i−j| prices "how far apart are the two length profiles" —
    * the mixture-alignment number a curator reads before reweighting.
    *
    * Scale shape: the histograms fold from the corpus (map-side); all
    * scaling rounds run on the 10×10 kernel grid joined to 10-row
    * vectors — bounded, iteration count fixed at 3. */
  private val q755 = QueryDef(
    "q755_sinkhorn_length_transport",
    (spark, dir) => {
      val S = 1048576L // 2^20 fixed-point scale
      // r13: BOTH length histograms fold in one corpus scan (the former
      // per-source hist() scanned + exploded documents twice); each
      // source's rows are recovered by filtering its count > 0, which is
      // exactly the membership the per-source GROUP BY produced.
      val hists = Tables.fanOut(Tables.documents(spark, dir))
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"),
          explode(graft.functions.expressions.tokens_native(col("text")))
            .as("w"))
        .select(col("source"), least(length(col("w")).cast("long"), lit(10L)).as("len"))
        .groupBy(col("len"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("b"))
        .localCheckpoint(true) // ≤10 rows; read by both vector chains
      val grid = spark.range(1, 11).select(col("id").as("i"))
        .crossJoin(spark.range(1, 11).select(col("id").as("j")))
        .select(col("i"), col("j"),
          expr("1000 div (1 + abs(i - j))").as("k"))
      val a = hists.filter(col("a") > 0L).select(col("len").as("i"), col("a"))
      val b = hists.filter(col("b") > 0L).select(col("len").as("j"), col("b"))
      // u0 = S, v0 = S; three alternating scalings, u first
      var u = a.select(col("i"), lit(S).as("u"))
      var v = b.select(col("j"), lit(S).as("v"))
      for (_ <- 1 to 3) {
        val kv = grid.join(v, Seq("j"))
          .groupBy(col("i")).agg(sum(col("k") * col("v")).as("kv"))
        u = a.join(kv, Seq("i"))
          .select(col("i"), expr(s"a * $S * $S div kv").as("u"))
        val ku = grid.join(u, Seq("i"))
          .groupBy(col("j")).agg(sum(col("k") * col("u")).as("ku"))
        v = b.join(ku, Seq("j"))
          .select(col("j"), expr(s"b * $S * $S div ku").as("v"))
      }
      val plan = grid.join(u, Seq("i")).join(v, Seq("j"))
        .select(col("i"), col("j"),
          expr(s"u * k div $S * v div $S").as("p"),
          expr("abs(i - j)").as("c"))
      plan.groupBy(col("i"))
        .agg(sum(col("p")).as("row_mass"),
          sum(col("p") * col("c")).as("row_cost"))
        .join(a, Seq("i"))
        .select(col("i"), col("a").as("a_mass"), col("row_mass"),
          (col("row_mass") - col("a")).as("marginal_err"),
          col("row_cost"))
        .orderBy(col("i"))
    },
    Some("""
      WITH ha AS MATERIALIZED (
        SELECT least(len(w), 10) AS i, CAST(count(*) AS BIGINT) AS a
        FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents
              WHERE source = 'src0')
        WHERE len(w) > 0 GROUP BY 1),
      hb AS MATERIALIZED (
        SELECT least(len(w), 10) AS j, CAST(count(*) AS BIGINT) AS b
        FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents
              WHERE source = 'src1')
        WHERE len(w) > 0 GROUP BY 1),
      grid AS MATERIALIZED (
        SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
          1000 // (1 + abs(i - j)) AS k
        FROM (SELECT unnest(range(1, 11)) AS i),
             (SELECT unnest(range(1, 11)) AS j)),
      u0 AS (SELECT i, CAST(1048576 AS BIGINT) AS u FROM ha),
      v0 AS (SELECT j, CAST(1048576 AS BIGINT) AS v FROM hb),
      kv1 AS (SELECT i, CAST(sum(k * v) AS BIGINT) AS kv
              FROM grid JOIN v0 USING (j) GROUP BY i),
      u1 AS (SELECT i, CAST(a * 1048576 * 1048576 // kv AS BIGINT) AS u
             FROM ha JOIN kv1 USING (i)),
      ku1 AS (SELECT j, CAST(sum(k * u) AS BIGINT) AS ku
              FROM grid JOIN u1 USING (i) GROUP BY j),
      v1 AS (SELECT j, CAST(b * 1048576 * 1048576 // ku AS BIGINT) AS v
             FROM hb JOIN ku1 USING (j)),
      kv2 AS (SELECT i, CAST(sum(k * v) AS BIGINT) AS kv
              FROM grid JOIN v1 USING (j) GROUP BY i),
      u2 AS (SELECT i, CAST(a * 1048576 * 1048576 // kv AS BIGINT) AS u
             FROM ha JOIN kv2 USING (i)),
      ku2 AS (SELECT j, CAST(sum(k * u) AS BIGINT) AS ku
              FROM grid JOIN u2 USING (i) GROUP BY j),
      v2 AS (SELECT j, CAST(b * 1048576 * 1048576 // ku AS BIGINT) AS v
             FROM hb JOIN ku2 USING (j)),
      kv3 AS (SELECT i, CAST(sum(k * v) AS BIGINT) AS kv
              FROM grid JOIN v2 USING (j) GROUP BY i),
      u3 AS (SELECT i, CAST(a * 1048576 * 1048576 // kv AS BIGINT) AS u
             FROM ha JOIN kv3 USING (i)),
      ku3 AS (SELECT j, CAST(sum(k * u) AS BIGINT) AS ku
              FROM grid JOIN u3 USING (i) GROUP BY j),
      v3 AS (SELECT j, CAST(b * 1048576 * 1048576 // ku AS BIGINT) AS v
             FROM hb JOIN ku3 USING (j)),
      plan AS (
        SELECT g.i, g.j,
          CAST(u.u * g.k // 1048576 * v.v // 1048576 AS BIGINT) AS p,
          abs(g.i - g.j) AS c
        FROM grid g JOIN u3 u USING (i) JOIN v3 v USING (j))
      SELECT p.i, a.a AS a_mass,
        CAST(sum(p.p) AS BIGINT) AS row_mass,
        CAST(sum(p.p) - a.a AS BIGINT) AS marginal_err,
        CAST(sum(p.p * p.c) AS BIGINT) AS row_cost
      FROM plan p JOIN ha a ON a.i = p.i
      GROUP BY p.i, a.a ORDER BY p.i
    """))

  // ---------------------------------------------------------------- q756

  /** BBHash-style minimal-perfect-hash level peeling (Limasset et al.):
    * at each level, keys hash into exactly |keys| bins (γ = 1); a key
    * whose bin holds exactly one key is RESOLVED (its bit position is
    * its final slot); colliding keys fall through to the next level
    * with a fresh hash (per-level multiplier + the q752 xorshift mix —
    * a multiplicative-only hash of sequential keys lands on a lattice
    * and resolves only ~17% per level instead of the theoretical
    * ~1/e ≈ 37%). Four levels over the distinct customer keys,
    * reporting per level: keys in, resolved, the collision share, and
    * the cumulative bit budget (each level spends |keys_in| bits) —
    * how a 100 TB dictionary gets O(1) exact lookups with ~3 bits/key
    * and no stored keys.
    *
    * Scale shape: each level is one keyed group-by on the hashed bin
    * (map-side combined) plus a semi-join to carry survivors; levels
    * are unrolled (4), key counts shrink geometrically (~1/e resolve
    * per level at γ=1). */
  private val q756 = QueryDef(
    "q756_bbhash_level_census",
    (spark, dir) => {
      val mults = Seq(2246822519L, 2654435761L, 2971215073L, 40503L)
      var keys = Tables.customer(spark, dir)
        .select(col("c_custkey").as("k")).distinct()
      var out = Seq.empty[org.apache.spark.sql.DataFrame]
      for (l <- 0 until 4) {
        val m = mults(l)
        val n = keys.agg(count(lit(1)).as("n"))
        val binned = keys.crossJoin(broadcast(n))
          .withColumn("h1", expr(s"((k % 2147483648) * $m) % 4294967296"))
          .withColumn("h2", expr(
            "(((h1 ^ (h1 div 65536)) % 2147483648) * 2654435761) % 4294967296"))
          .select(col("k"), col("n"),
            expr("(h2 ^ (h2 div 65536)) % greatest(n, 1)").as("b"))
        // r13: per-bin sizes via a bin-partitioned window — one exchange
        // of the key stream instead of the groupBy + join pair (which
        // shuffled the binned keys twice per level)
        val tagged = binned.withColumn("c", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
        val lvl = tagged.agg(
            max(col("n")).as("keys_in"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("resolved"))
          .select(lit(l.toLong).as("level"), col("keys_in"), col("resolved"),
            expr("(keys_in - resolved) * 1000000 div greatest(keys_in, 1)")
              .as("collision_ppm"))
        out = out :+ lvl
        keys = tagged.filter(col("c") > 1L).select(col("k"))
          .localCheckpoint(true)
      }
      val leftover = keys.agg(count(lit(1)).as("unresolved"))
      out.reduce(_ union _)
        .crossJoin(broadcast(leftover))
        .orderBy(col("level"))
    },
    Some("""
      WITH k0 AS MATERIALIZED (SELECT DISTINCT c_custkey AS k FROM customer),
      n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k0),
      b0 AS MATERIALIZED (
        SELECT k, xor(h2, h2 // 65536) % greatest(n, 1) AS b, n
        FROM (
          SELECT k, n,
            ((xor(h1, h1 // 65536) % 2147483648) * 2654435761) % 4294967296
              AS h2
          FROM (SELECT k, n,
                  ((k % 2147483648) * 2246822519) % 4294967296 AS h1
                FROM k0 CROSS JOIN n0))),
      c0 AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM b0 GROUP BY b),
      t0 AS MATERIALIZED (SELECT b0.k, b0.n, c0.c FROM b0 JOIN c0 USING (b)),
      l0 AS (SELECT CAST(0 AS BIGINT) AS level, max(n) AS keys_in,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS resolved
        FROM t0),
      k1 AS MATERIALIZED (SELECT k FROM t0 WHERE c > 1),
      n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k1),
      b1 AS MATERIALIZED (
        SELECT k, xor(h2, h2 // 65536) % greatest(n, 1) AS b, n
        FROM (
          SELECT k, n,
            ((xor(h1, h1 // 65536) % 2147483648) * 2654435761) % 4294967296
              AS h2
          FROM (SELECT k, n,
                  ((k % 2147483648) * 2654435761) % 4294967296 AS h1
                FROM k1 CROSS JOIN n1))),
      c1 AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM b1 GROUP BY b),
      t1 AS MATERIALIZED (SELECT b1.k, b1.n, c1.c FROM b1 JOIN c1 USING (b)),
      l1 AS (SELECT CAST(1 AS BIGINT) AS level, max(n) AS keys_in,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS resolved
        FROM t1),
      k2 AS MATERIALIZED (SELECT k FROM t1 WHERE c > 1),
      n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k2),
      b2 AS MATERIALIZED (
        SELECT k, xor(h2, h2 // 65536) % greatest(n, 1) AS b, n
        FROM (
          SELECT k, n,
            ((xor(h1, h1 // 65536) % 2147483648) * 2654435761) % 4294967296
              AS h2
          FROM (SELECT k, n,
                  ((k % 2147483648) * 2971215073) % 4294967296 AS h1
                FROM k2 CROSS JOIN n2))),
      c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM b2 GROUP BY b),
      t2 AS MATERIALIZED (SELECT b2.k, b2.n, c2.c FROM b2 JOIN c2 USING (b)),
      l2 AS (SELECT CAST(2 AS BIGINT) AS level, max(n) AS keys_in,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS resolved
        FROM t2),
      k3 AS MATERIALIZED (SELECT k FROM t2 WHERE c > 1),
      n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM k3),
      b3 AS MATERIALIZED (
        SELECT k, xor(h2, h2 // 65536) % greatest(n, 1) AS b, n
        FROM (
          SELECT k, n,
            ((xor(h1, h1 // 65536) % 2147483648) * 2654435761) % 4294967296
              AS h2
          FROM (SELECT k, n,
                  ((k % 2147483648) * 40503) % 4294967296 AS h1
                FROM k3 CROSS JOIN n3))),
      c3 AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM b3 GROUP BY b),
      t3 AS MATERIALIZED (SELECT b3.k, b3.n, c3.c FROM b3 JOIN c3 USING (b)),
      l3 AS (SELECT CAST(3 AS BIGINT) AS level, max(n) AS keys_in,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS resolved
        FROM t3),
      left4 AS (SELECT CAST(count(*) AS BIGINT) AS unresolved
                FROM t3 WHERE c > 1),
      lv AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
             UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
      SELECT level, keys_in, resolved,
        CAST((keys_in - resolved) * 1000000 // greatest(keys_in, 1) AS BIGINT)
          AS collision_ppm,
        unresolved
      FROM lv CROSS JOIN left4
      ORDER BY level
    """))

  // ---------------------------------------------------------------- q757

  /** Bit-sliced index aggregation (O'Neil–Quass BSI): decompose
    * l_quantity into its 6 bit planes; the per-plane POPCOUNTS alone
    * reconstruct the exact column sum (Σ 2ᵇ·popcount_b) — the identity
    * that lets a bitmap index answer SUM/AVG without touching a single
    * row, and the reason BSI + roaring (q473) is the standard layout
    * for metric columns in OLAP bitmaps. Each plane row carries its
    * popcount, density, weighted contribution, and the reconstructed
    * vs directly-folded total (equal by construction — the gate proves
    * the identity on both engines).
    *
    * Scale shape: one scan folding 6 predicates map-side (the bit
    * tests are codegen'd arithmetic); output is 6 rows. */
  private val q757 = QueryDef(
    "q757_bit_sliced_index_sum",
    (spark, dir) => {
      // r13: ONE single-row aggregate computes all 6 plane popcounts,
      // the row count and the direct sum in one scan — the former
      // 6×-explode + shuffle + second scan collapsed to a map-side fold
      // unpivoted with stack (guide §2.3 "aggregate before you shuffle";
      // plans/r13/q757_*.txt: Generate+Exchange gone, one scan).
      val q = Tables.lineitem(spark, dir)
        .select(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("v"))
      val aggCols = Seq.range(0, 6).map(b =>
        sum(expr(s"(v div ${1L << b}) % 2")).as(s"pc$b")) ++
        Seq(count(lit(1)).as("n_rows"), sum(col("v")).as("direct_sum"))
      val folded = q.agg(aggCols.head, aggCols.tail: _*)
      folded
        .select(expr("stack(6, " +
          Seq.range(0, 6).map(b => s"CAST($b AS BIGINT), pc$b").mkString(", ") +
          ") AS (bit, popcount)"), col("n_rows"), col("direct_sum"))
        .select(col("bit"), col("popcount"),
          expr("popcount * 1000000 div n_rows").as("density_ppm"),
          expr("popcount * shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            .as("weighted"), col("direct_sum"))
        .withColumn("reconstructed_sum",
          expr("sum(weighted) OVER ()"))
        .select(col("bit"), col("popcount"), col("density_ppm"),
          col("weighted"), col("reconstructed_sum"), col("direct_sum"))
        .orderBy(col("bit"))
    },
    Some("""
      WITH v AS MATERIALIZED (
        SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v FROM lineitem),
      slices AS (
        SELECT CAST(b AS BIGINT) AS bit,
          CAST(sum((v // (CAST(1 AS BIGINT) << CAST(b AS INTEGER))) % 2)
            AS BIGINT) AS popcount,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM v, (SELECT unnest(range(0, 6)) AS b) g
        GROUP BY 1),
      direct AS (SELECT CAST(sum(v) AS BIGINT) AS direct_sum FROM v),
      w AS (
        SELECT bit, popcount,
          CAST(popcount * 1000000 // n_rows AS BIGINT) AS density_ppm,
          CAST(popcount * (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
            AS BIGINT) AS weighted
        FROM slices)
      SELECT bit, popcount, density_ppm, weighted,
        CAST(sum(weighted) OVER () AS BIGINT) AS reconstructed_sum,
        direct_sum
      FROM w CROSS JOIN direct
      ORDER BY bit
    """))

  override def defs: Seq[QueryDef] = Seq(q755, q756, q757)
}
