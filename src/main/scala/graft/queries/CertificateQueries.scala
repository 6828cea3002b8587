package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.cents

/** Round-4 certificate/audit operators: the distributed top-k merge
  * certificate, the predicate-correlation cardinality audit, and the
  * nested-percentile fallacy census — rewrites a planner may apply and
  * statistics users routinely get wrong, deterministic for the oracle
  * gate.
  */
object CertificateQueries extends QueryGroup {

  // ---------------------------------------------------------------- q458

  /** Distributed top-k merge certificate: the global top-10 orders by
    * total price computed directly, and again as "top-10 within each
    * order-year, union, re-top-10" — the partition-local-heads-then-
    * merge rewrite every TakeOrdered/LIMIT pushdown relies on. Emitted
    * as matched rank pairs with an equality flag per rank; valid
    * because a global top-k element is a fortiori in its partition's
    * top-k (k per partition suffices whatever the partitioning).
    *
    * Scale shape: the pushed form never sorts globally — per-year
    * TakeOrdered heads (≤ 10·years rows) merge in one tiny re-sort;
    * the direct form is the oracle-side TakeOrderedAndProject. */
  private val q458 = QueryDef(
    "q458_topk_merge_certificate",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("pc"),
          year(col("o_orderdate")).as("yr"))
      val direct = o
        .orderBy(col("pc").desc, col("o_orderkey")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("pc").desc, col("o_orderkey"))).cast("long"))
        .select(col("rk"), col("o_orderkey").as("key_direct"),
          col("pc").as("pc_direct"))
      val heads = o
        .withColumn("prk", row_number().over(
          Window.partitionBy(col("yr")).orderBy(col("pc").desc, col("o_orderkey"))))
        .filter(col("prk") <= 10)
      val merged = heads
        .orderBy(col("pc").desc, col("o_orderkey")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("pc").desc, col("o_orderkey"))).cast("long"))
        .select(col("rk"), col("o_orderkey").as("key_merged"),
          col("pc").as("pc_merged"))
      direct.join(merged, Seq("rk"))
        .select(col("rk"), col("key_direct"), col("key_merged"),
          col("pc_direct"), col("pc_merged"),
          (col("key_direct") === col("key_merged") &&
            col("pc_direct") === col("pc_merged")).cast("long").as("is_equal"))
        .orderBy(col("rk"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
          year(o_orderdate) AS yr
        FROM orders),
      direct AS (
        SELECT CAST(row_number() OVER (ORDER BY pc DESC, o_orderkey) AS BIGINT)
            AS rk,
          o_orderkey AS key_direct, pc AS pc_direct
        FROM o ORDER BY pc DESC, o_orderkey LIMIT 10),
      heads AS (
        SELECT o_orderkey, pc,
          row_number() OVER (PARTITION BY yr ORDER BY pc DESC, o_orderkey)
            AS prk
        FROM o QUALIFY prk <= 10),
      merged AS (
        SELECT CAST(row_number() OVER (ORDER BY pc DESC, o_orderkey) AS BIGINT)
            AS rk,
          o_orderkey AS key_merged, pc AS pc_merged
        FROM heads ORDER BY pc DESC, o_orderkey LIMIT 10)
      SELECT d.rk, d.key_direct, m.key_merged, d.pc_direct, m.pc_merged,
        CAST(CASE WHEN d.key_direct = m.key_merged
          AND d.pc_direct = m.pc_merged THEN 1 ELSE 0 END AS BIGINT) AS is_equal
      FROM direct d JOIN merged m ON d.rk = m.rk
      ORDER BY d.rk
    """))

  // ---------------------------------------------------------------- q459

  /** Predicate-correlation cardinality audit: planners estimate
    * AND-selectivity as the product of marginals; this measures, for
    * five predicate pairs over orders, the ACTUAL joint row count vs
    * n·P(A)·P(B), as a correlation factor ×1000 (1000 = independent,
    * >1000 = positively correlated — the planner UNDERestimates the
    * scan) — the error that motivated multi-column statistics in every
    * CBO (q443 prices single-column buckets; this prices the
    * independence assumption itself).
    *
    * Scale shape: ONE scan folds all marginal and joint counters
    * map-side into a single row; the melt to per-pair rows is a 5-row
    * literal lateral. */
  private val q459 = QueryDef(
    "q459_predicate_correlation_audit",
    (spark, dir) => {
      val flags = Tables.orders(spark, dir)
        .select(
          (col("o_orderstatus") === "F").cast("long").as("a1"),
          (col("o_orderdate") < "1998-01-01").cast("long").as("b1"),
          (col("o_orderpriority") === "1-URGENT").cast("long").as("a2"),
          (col("o_orderstatus") === "P").cast("long").as("b2"),
          (cents(col("o_totalprice")) > 30000000L).cast("long").as("a3"),
          (col("o_orderdate") >= "1999-01-01").cast("long").as("b3"),
          (col("o_custkey") % 2L === 0L).cast("long").as("a4"),
          (col("o_orderkey") % 2L === 0L).cast("long").as("b4"),
          (col("o_orderstatus") === "O").cast("long").as("a5"),
          (col("o_orderdate") >= "2000-01-01").cast("long").as("b5"))
      val counted = flags.agg(
        count(lit(1)).as("n"),
        (1 to 5).flatMap(i => Seq(
          sum(col(s"a$i")).as(s"ca$i"), sum(col(s"b$i")).as(s"cb$i"),
          sum(col(s"a$i") * col(s"b$i")).as(s"cj$i"))): _*)
      val pairNames = Seq(
        "status_F*pre1998", "urgent*status_P", "price_hi*post1999",
        "custkey_even*orderkey_even", "status_O*post2000")
      counted.select(col("n"), explode(array(pairNames.zipWithIndex.map {
        case (nm, i0) =>
          val i = i0 + 1
          struct(lit(nm).as("pair"), col(s"ca$i").as("ca"),
            col(s"cb$i").as("cb"), col(s"cj$i").as("cj"))
      }: _*)).as("p")).select(col("n"), col("p.*"))
        .select(col("pair"), col("n"), col("ca"), col("cb"), col("cj"),
          expr("ca * cb div n").as("indep_est"),
          expr("cj * 1000 div greatest(ca * cb div n, 1)").as("corr_factor_milli"))
        .orderBy(col("pair"))
    },
    Some("""
      WITH flags AS (
        SELECT
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a1,
          CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS b1,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a2,
          CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS b2,
          CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 30000000
            THEN 1 ELSE 0 END AS a3,
          CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END AS b3,
          CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS a4,
          CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS b4,
          CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS a5,
          CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END AS b5
        FROM orders),
      counted AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(a1) AS BIGINT) AS ca1, CAST(sum(b1) AS BIGINT) AS cb1,
          CAST(sum(a1 * b1) AS BIGINT) AS cj1,
          CAST(sum(a2) AS BIGINT) AS ca2, CAST(sum(b2) AS BIGINT) AS cb2,
          CAST(sum(a2 * b2) AS BIGINT) AS cj2,
          CAST(sum(a3) AS BIGINT) AS ca3, CAST(sum(b3) AS BIGINT) AS cb3,
          CAST(sum(a3 * b3) AS BIGINT) AS cj3,
          CAST(sum(a4) AS BIGINT) AS ca4, CAST(sum(b4) AS BIGINT) AS cb4,
          CAST(sum(a4 * b4) AS BIGINT) AS cj4,
          CAST(sum(a5) AS BIGINT) AS ca5, CAST(sum(b5) AS BIGINT) AS cb5,
          CAST(sum(a5 * b5) AS BIGINT) AS cj5
        FROM flags),
      melted AS (
        SELECT n, p.* FROM counted,
        LATERAL (VALUES
          ('status_F*pre1998', ca1, cb1, cj1),
          ('urgent*status_P', ca2, cb2, cj2),
          ('price_hi*post1999', ca3, cb3, cj3),
          ('custkey_even*orderkey_even', ca4, cb4, cj4),
          ('status_O*post2000', ca5, cb5, cj5)) AS p(pair, ca, cb, cj))
      SELECT pair, n, ca, cb, cj,
        ca * cb // n AS indep_est,
        cj * 1000 // greatest(ca * cb // n, 1) AS corr_factor_milli
      FROM melted
      ORDER BY pair
    """))

  // ---------------------------------------------------------------- q460

  /** Nested-percentile fallacy census: the mean of per-source p95
    * document lengths and the median of per-shard medians of order
    * totals, each next to the TRUE global statistic with the signed
    * gap — the aggregation mistake every dashboard makes (percentiles
    * do not average; medians of medians are not medians), quantified so
    * reviewers can see WHEN the shortcut is tolerable (q451 bounds the
    * principled merge; this measures the naive one).
    *
    * Scale shape: per-group rank selection on group-local histograms
    * (q36's shape), two vocabulary-sized folds, one-row output per
    * statistic. */
  private val q460 = QueryDef(
    "q460_nested_percentile_fallacy",
    (spark, dir) => {
      // per-source p95 of n_chars -> mean, vs global p95
      val docs = Tables.documents(spark, dir)
        .select(col("source"), col("n_chars").cast("long").as("len"))
      def p95(df: org.apache.spark.sql.DataFrame, grp: Seq[String]) = {
        val hist = df.groupBy((grp :+ "len").map(col): _*)
          .agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy(grp.map(col): _*).orderBy(col("len"))
        val wAll = Window.partitionBy(grp.map(col): _*)
        hist.withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .filter(col("cum") * 100L >= col("n") * 95L)
          .groupBy(grp.map(col): _*).agg(min(col("len")).as("p95"))
      }
      val perSource = p95(docs, Seq("source"))
        .agg(expr("sum(p95) div count(1)").as("mean_of_p95"))
      val globalP95 = p95(docs.withColumn("g", lit(1L)), Seq("g"))
        .select(col("p95").as("global_p95"))
      val row1 = perSource.crossJoin(broadcast(globalP95))
        .select(lit("mean_of_source_p95_len").as("statistic"),
          col("mean_of_p95").as("nested"), col("global_p95").as("global"),
          (col("mean_of_p95") - col("global_p95")).as("gap"))
      // median of per-shard medians of order cents, vs global median
      val vals = Tables.orders(spark, dir)
        .select(cents(col("o_totalprice")).as("len"),
          (col("o_orderkey") % 8L).as("shard"))
      def med(df: org.apache.spark.sql.DataFrame, grp: Seq[String]) = {
        val hist = df.groupBy((grp :+ "len").map(col): _*)
          .agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy(grp.map(col): _*).orderBy(col("len"))
        val wAll = Window.partitionBy(grp.map(col): _*)
        hist.withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .filter(col("cum") * 2L >= col("n"))
          .groupBy(grp.map(col): _*).agg(min(col("len")).as("med"))
      }
      val shardMeds = med(vals, Seq("shard")).select(col("med").as("len"))
        .withColumn("g", lit(1L))
      val momRow = med(shardMeds, Seq("g")).select(col("med").as("mom"))
      val globalMed = med(vals.withColumn("g", lit(1L)), Seq("g"))
        .select(col("med").as("gmed"))
      val row2 = momRow.crossJoin(broadcast(globalMed))
        .select(lit("median_of_shard_medians_cents").as("statistic"),
          col("mom").as("nested"), col("gmed").as("global"),
          (col("mom") - col("gmed")).as("gap"))
      row1.unionAll(row2)
        .withColumn("gap_ppm", expr("abs(gap) * 1000000 div greatest(global, 1)"))
        .orderBy(col("statistic"))
    },
    Some("""
      WITH docs AS (SELECT source, n_chars::BIGINT AS len FROM documents),
      src_hist AS (
        SELECT source, len, count(*) AS cnt FROM docs GROUP BY 1, 2),
      src_cum AS (
        SELECT source, len,
          sum(cnt) OVER (PARTITION BY source ORDER BY len) AS cum,
          sum(cnt) OVER (PARTITION BY source) AS n
        FROM src_hist),
      src_p95 AS (
        SELECT source, min(len) AS p95 FROM src_cum
        WHERE cum * 100 >= n * 95 GROUP BY source),
      mean_p95 AS (
        SELECT CAST(sum(p95) // count(*) AS BIGINT) AS nested FROM src_p95),
      glob_p95 AS (
        SELECT CAST(min(len) AS BIGINT) AS global FROM (
          SELECT len, sum(cnt) OVER (ORDER BY len) AS cum,
            sum(cnt) OVER () AS n
          FROM (SELECT len, count(*) AS cnt FROM docs GROUP BY len))
        WHERE cum * 100 >= n * 95),
      vals AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS len,
          o_orderkey % 8 AS shard
        FROM orders),
      sh_med AS (
        SELECT shard, min(len) AS med FROM (
          SELECT shard, len,
            sum(cnt) OVER (PARTITION BY shard ORDER BY len) AS cum,
            sum(cnt) OVER (PARTITION BY shard) AS n
          FROM (SELECT shard, len, count(*) AS cnt FROM vals GROUP BY 1, 2))
        WHERE cum * 2 >= n GROUP BY shard),
      mom AS (
        SELECT CAST(min(med) AS BIGINT) AS nested FROM (
          SELECT med, row_number() OVER (ORDER BY med) AS rn,
            count(*) OVER () AS n
          FROM sh_med)
        WHERE rn * 2 >= n),
      gmed AS (
        SELECT CAST(min(len) AS BIGINT) AS global FROM (
          SELECT len, sum(cnt) OVER (ORDER BY len) AS cum,
            sum(cnt) OVER () AS n
          FROM (SELECT len, count(*) AS cnt FROM vals GROUP BY len))
        WHERE cum * 2 >= n)
      SELECT statistic, nested, global, nested - global AS gap,
        abs(nested - global) * 1000000 // greatest(global, 1) AS gap_ppm
      FROM (
        SELECT 'mean_of_source_p95_len' AS statistic, m.nested, g.global
        FROM mean_p95 m CROSS JOIN glob_p95 g
        UNION ALL
        SELECT 'median_of_shard_medians_cents', mm.nested, gg.global
        FROM mom mm CROSS JOIN gmed gg)
      ORDER BY statistic
    """))

  override def defs: Seq[QueryDef] = Seq(q458, q459, q460)
}
