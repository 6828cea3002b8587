package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 batch 6: clustering evaluation and iterated-function
  * structure — B-cubed precision/recall (the element-centric clustering
  * metric entity-resolution pipelines report, which purity (q137)
  * cannot substitute: purity ignores cluster fragmentation), and
  * functional-graph contraction via pointer doubling (the log-round
  * technique that turns "follow this chain a million steps" into 20
  * self-joins). Exact integers, total ORDER BYs.
  */
object EvalPlanQueries2 extends QueryGroup {

  // ---------------------------------------------------------------- q758

  /** B-cubed evaluation of a grid clustering against gold labels:
    * system clusters = the 2-D quantized embedding cell (q747's
    * quantizer at one scale), gold = the label column. Per-item
    * precision is |cluster ∩ gold|/|cluster|, recall is
    * |cluster ∩ gold|/|gold|; B³ averages both over ITEMS, so a
    * shattered gold class hurts recall in proportion to its mass —
    * the property purity lacks. Floored-ppm arithmetic (per-(cluster,
    * gold) cell, then the item average) keeps both engines
    * bit-identical; per gold label: its mass, its recall, and the
    * global P/R/F1 alongside.
    *
    * Scale shape: one scan to (cell, label) counts (map-side
    * combined); every B³ sum runs on the (cluster × label)
    * contingency — cells² never items². */
  private val q758 = QueryDef(
    "q758_bcubed_clustering_eval",
    (spark, dir) => {
      val cells = Tables.embeddings(spark, dir)
        .select(col("label").cast("long").as("g"),
          expr("""concat_ws(',', transform(slice(embedding, 1, 2),
                   x -> CAST(floor(CAST(x AS DOUBLE) * 5) AS BIGINT)))""")
            .as("c"))
        .groupBy(col("c"), col("g")).agg(count(lit(1)).as("n"))
      // No persist (r13, ADVICE low): the identical aggregate subtree is
      // deduped by exchange reuse within the one plan (ReusedExchange in
      // plans/r13/q758_after.txt), so a cache here only leaked blocks in
      // Verify, which has no per-query cleanup.
      val byC = cells.groupBy(col("c")).agg(sum(col("n")).as("nc"))
      val byG = cells.groupBy(col("g")).agg(sum(col("n")).as("ng"))
      val tot = cells.agg(sum(col("n")).as("nt"))
      val contrib = cells.join(byC, Seq("c")).join(byG, Seq("g"))
        .select(col("g"), col("n"), col("ng"),
          expr("n * n * 1000000 div nc").as("p_mass"),
          expr("n * n * 1000000 div ng").as("r_mass"))
      val overall = contrib.agg(sum(col("p_mass")).as("pm"),
          sum(col("r_mass")).as("rm"))
        .crossJoin(broadcast(tot))
        .select(expr("pm div nt").as("precision_ppm"),
          expr("rm div nt").as("recall_ppm"))
        .withColumn("f1_ppm", expr(
          "2 * precision_ppm * recall_ppm div " +
            "greatest(precision_ppm + recall_ppm, 1)"))
      contrib.groupBy(col("g"))
        .agg(max(col("ng")).as("n_gold"), sum(col("r_mass")).as("rg"))
        .select(col("g").as("gold_label"), col("n_gold"),
          expr("rg div n_gold").as("label_recall_ppm"))
        .crossJoin(broadcast(overall))
        .orderBy(col("gold_label"))
    },
    Some("""
      WITH cells AS MATERIALIZED (
        SELECT CAST(label AS BIGINT) AS g,
          array_to_string(list_transform(embedding[1:2],
            x -> CAST(floor(CAST(x AS DOUBLE) * 5) AS BIGINT)), ',') AS c,
          CAST(count(*) AS BIGINT) AS n
        FROM embeddings GROUP BY 1, 2),
      byc AS (SELECT c, CAST(sum(n) AS BIGINT) AS nc FROM cells GROUP BY c),
      byg AS (SELECT g, CAST(sum(n) AS BIGINT) AS ng FROM cells GROUP BY g),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
      contrib AS MATERIALIZED (
        SELECT cells.g, cells.n, byg.ng,
          n * n * 1000000 // nc AS p_mass,
          n * n * 1000000 // ng AS r_mass
        FROM cells JOIN byc USING (c) JOIN byg USING (g)),
      overall AS (
        SELECT CAST(pm // nt AS BIGINT) AS precision_ppm,
          CAST(rm // nt AS BIGINT) AS recall_ppm,
          CAST(2 * (pm // nt) * (rm // nt)
            // greatest(pm // nt + rm // nt, 1) AS BIGINT) AS f1_ppm
        FROM (SELECT CAST(sum(p_mass) AS BIGINT) AS pm,
                     CAST(sum(r_mass) AS BIGINT) AS rm FROM contrib)
          CROSS JOIN tot)
      SELECT g AS gold_label, CAST(max(ng) AS BIGINT) AS n_gold,
        CAST(sum(r_mass) // max(ng) AS BIGINT) AS label_recall_ppm,
        precision_ppm, recall_ppm, f1_ppm
      FROM contrib CROSS JOIN overall
      GROUP BY g, precision_ppm, recall_ppm, f1_ppm
      ORDER BY gold_label
    """))

  // ---------------------------------------------------------------- q759

  /** Functional-graph contraction by pointer doubling: every customer
    * key gets ONE out-edge k → h(k) (the xorshift-mixed hash into the
    * 0-based contiguous key domain), making a functional graph — rho-shaped chains
    * draining into cycles. Composing the map with itself per round
    * (f ← f∘f, one self-join each) reaches f^(2^r) after r rounds; the
    * census tracks the IMAGE SIZE per round, which contracts toward
    * the mass living on cycles — 5 rounds see 32 steps for the cost of
    * 5 joins, the log-round discipline behind q700's SCC closure and
    * every "chase this chain at 100 TB" problem.
    *
    * Scale shape: each round is one keyed self-join + distinct on the
    * key domain (customer-dimension-bounded); 5 fixed rounds, each
    * frame localCheckpointed (flat lineage). */
  private val q759 = QueryDef(
    "q759_pointer_doubling_contraction",
    (spark, dir) => {
      val dom = Tables.customer(spark, dir)
        .select(col("c_custkey").as("k")).distinct()
      val n = dom.agg(count(lit(1)).as("n"))
      // h(k): xorshift-mixed multiplicative hash folded into [0, n)
      var f = dom.crossJoin(broadcast(n))
        .withColumn("h1", expr("((k % 2147483648) * 2246822519) % 4294967296"))
        .withColumn("h2", expr(
          "(((h1 ^ (h1 div 65536)) % 2147483648) * 2654435761) % 4294967296"))
        .select(col("k"),
          expr("(h2 ^ (h2 div 65536)) % greatest(n, 1)").as("v"))
        .localCheckpoint(true)
      def census(r: Int, m: org.apache.spark.sql.DataFrame) =
        m.agg(countDistinct(col("v")).as("image_size"))
          .select(lit(r.toLong).as("round"),
            lit(1L << r).as("steps"), col("image_size"))
      var out = Seq(census(0, f))
      for (r <- 1 to 5) {
        f = f.as("a").join(f.as("b"), col("a.v") === col("b.k"))
          .select(col("a.k").as("k"), col("b.v").as("v"))
          .localCheckpoint(true)
        out = out :+ census(r, f)
      }
      out.reduce(_ union _).orderBy(col("round"))
    },
    Some("""
      WITH dom AS MATERIALIZED (
        SELECT DISTINCT c_custkey AS k FROM customer),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dom),
      f1 AS MATERIALIZED (
        SELECT k, xor(h2, h2 // 65536) % greatest(n, 1) AS v
        FROM (
          SELECT k, n,
            ((xor(h1, h1 // 65536) % 2147483648) * 2654435761) % 4294967296
              AS h2
          FROM (SELECT k, n,
                  ((k % 2147483648) * 2246822519) % 4294967296 AS h1
                FROM dom CROSS JOIN nn))),
      f2 AS MATERIALIZED (
        SELECT a.k, b.v FROM f1 a JOIN f1 b ON b.k = a.v),
      f4 AS MATERIALIZED (
        SELECT a.k, b.v FROM f2 a JOIN f2 b ON b.k = a.v),
      f8 AS MATERIALIZED (
        SELECT a.k, b.v FROM f4 a JOIN f4 b ON b.k = a.v),
      f16 AS MATERIALIZED (
        SELECT a.k, b.v FROM f8 a JOIN f8 b ON b.k = a.v),
      f32 AS MATERIALIZED (
        SELECT a.k, b.v FROM f16 a JOIN f16 b ON b.k = a.v)
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS round, CAST(1 AS BIGINT) AS steps,
          CAST(count(DISTINCT v) AS BIGINT) AS image_size FROM f1
        UNION ALL SELECT 1, 2, CAST(count(DISTINCT v) AS BIGINT) FROM f2
        UNION ALL SELECT 2, 4, CAST(count(DISTINCT v) AS BIGINT) FROM f4
        UNION ALL SELECT 3, 8, CAST(count(DISTINCT v) AS BIGINT) FROM f8
        UNION ALL SELECT 4, 16, CAST(count(DISTINCT v) AS BIGINT) FROM f16
        UNION ALL SELECT 5, 32, CAST(count(DISTINCT v) AS BIGINT) FROM f32)
      ORDER BY round
    """))

  override def defs: Seq[QueryDef] = Seq(q758, q759)
}
