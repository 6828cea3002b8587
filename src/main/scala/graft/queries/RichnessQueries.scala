package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Round-4 richness/structure operators: Roaring-bitmap container
  * planning, approximate functional-dependency strength, and the Chao1
  * distinct-from-sample estimator — index layout, soft schema rules,
  * and species-richness statistics, deterministic for the oracle gate.
  */
object RichnessQueries extends QueryGroup {

  // ---------------------------------------------------------------- q473

  /** Roaring-bitmap container planner: per-month order-key posting
    * lists split into 2¹⁶-key chunks, each chunk stored as a sorted
    * 16-bit ARRAY (2 bytes/value) when sparse or an 8 KiB BITMAP when
    * it holds > 4096 values — Roaring's container rule — with bytes
    * under the hybrid plan vs naive 8-byte lists. Reported per month:
    * chunks, array/bitmap split, hybrid vs naive bytes, savings — the
    * index layout every modern bitmap engine (Lucene, ClickHouse,
    * Pilosa) uses, planned from live key density.
    *
    * Scale shape: one orders fold to (month, chunk) value counts;
    * container choice is a CASE; the plan is months × chunks rows. */
  private val q473 = QueryDef(
    "q473_roaring_container_plan",
    (spark, dir) => {
      val chunks = Tables.orders(spark, dir)
        .select(expr("date_format(o_orderdate, 'yyyy-MM')").as("month"),
          expr("o_orderkey div 65536").as("chunk"), col("o_orderkey"))
        .groupBy(col("month"), col("chunk"))
        .agg(countDistinct(col("o_orderkey")).as("n_values"))
        .withColumn("container",
          when(col("n_values") <= 4096L, "array").otherwise("bitmap"))
        .withColumn("bytes", when(col("container") === "array",
          col("n_values") * 2L).otherwise(lit(8192L)))
      chunks.groupBy(col("month"))
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("container") === "array").cast("long")).as("n_array"),
          sum((col("container") === "bitmap").cast("long")).as("n_bitmap"),
          sum(col("bytes")).as("hybrid_bytes"),
          sum(col("n_values") * 8L).as("naive_bytes"))
        .withColumn("savings_ppm", expr(
          "(naive_bytes - hybrid_bytes) * 1000000 div naive_bytes"))
        .orderBy(col("month")).limit(24)
    },
    Some("""
      WITH chunks AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
          o_orderkey // 65536 AS chunk,
          CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_values
        FROM orders GROUP BY 1, 2),
      planned AS (
        SELECT month, chunk, n_values,
          CASE WHEN n_values <= 4096 THEN 'array' ELSE 'bitmap' END AS container,
          CASE WHEN n_values <= 4096 THEN n_values * 2 ELSE 8192 END AS bytes
        FROM chunks)
      SELECT month, CAST(count(*) AS BIGINT) AS n_chunks,
        CAST(sum(CASE WHEN container = 'array' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_array,
        CAST(sum(CASE WHEN container = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bitmap,
        CAST(sum(bytes) AS BIGINT) AS hybrid_bytes,
        CAST(sum(n_values * 8) AS BIGINT) AS naive_bytes,
        CAST((sum(n_values * 8) - sum(bytes)) * 1000000 // sum(n_values * 8)
          AS BIGINT) AS savings_ppm
      FROM planned GROUP BY month
      ORDER BY month LIMIT 24
    """))

  // ---------------------------------------------------------------- q474

  /** Approximate functional-dependency strength: for five candidate
    * rules X → Y, the g3 measure — the minimum fraction of rows to
    * DELETE before the FD holds exactly, computed as 1 − Σ_x max_y
    * count(x, y) / n — plus the holds-exactly flag. Soft rules with
    * g3 ≈ 0 power normalization hints, error detection and imputation
    * even when q167's exact mining rejects them (one dirty row kills an
    * exact FD; g3 prices the dirt).
    *
    * Scale shape: each rule folds to (x, y) counts, then a per-x max,
    * then one row — all map-side-combinable aggregates; the five rules
    * union to 5 rows. */
  private val q474 = QueryDef(
    "q474_approx_fd_strength",
    (spark, dir) => {
      def g3(df: org.apache.spark.sql.DataFrame, label: String,
             x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        df.groupBy(x.as("x"), y.as("y")).agg(count(lit(1)).as("c"))
          .groupBy(col("x")).agg(max(col("c")).as("mx"), sum(col("c")).as("nx"))
          .agg(sum(col("mx")).as("kept"), sum(col("nx")).as("n"))
          .select(lit(label).as("rule"), col("n"), col("kept"),
            (col("n") - col("kept")).as("rows_to_delete"),
            expr("(n - kept) * 1000000 div n").as("g3_ppm"),
            (col("kept") === col("n")).cast("long").as("holds_exactly"))
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      g3(c, "c_nationkey->c_mktsegment", col("c_nationkey"), col("c_mktsegment"))
        .unionAll(g3(o, "o_custkey->o_orderpriority", col("o_custkey"),
          col("o_orderpriority")))
        .unionAll(g3(o, "o_orderkey->o_orderstatus", col("o_orderkey"),
          col("o_orderstatus")))
        .unionAll(g3(li, "l_orderkey->l_returnflag", col("l_orderkey"),
          col("l_returnflag")))
        .unionAll(g3(li, "l_partkey->l_suppkey", col("l_partkey"),
          col("l_suppkey")))
        .orderBy(col("rule"))
    },
    Some {
      def g3Sql(label: String, tbl: String, x: String, y: String) =
        s"""SELECT '$label' AS rule, CAST(sum(nx) AS BIGINT) AS n,
          CAST(sum(mx) AS BIGINT) AS kept,
          CAST(sum(nx) - sum(mx) AS BIGINT) AS rows_to_delete,
          CAST((sum(nx) - sum(mx)) * 1000000 // sum(nx) AS BIGINT) AS g3_ppm,
          CAST(CASE WHEN sum(mx) = sum(nx) THEN 1 ELSE 0 END AS BIGINT)
            AS holds_exactly
        FROM (
          SELECT x, max(c) AS mx, sum(c) AS nx FROM (
            SELECT $x AS x, $y AS y, count(*) AS c FROM $tbl GROUP BY 1, 2)
          GROUP BY x)"""
      s"""
      ${g3Sql("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment")}
      UNION ALL
      ${g3Sql("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority")}
      UNION ALL
      ${g3Sql("o_orderkey->o_orderstatus", "orders", "o_orderkey", "o_orderstatus")}
      UNION ALL
      ${g3Sql("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag")}
      UNION ALL
      ${g3Sql("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey")}
      ORDER BY rule
    """
    })

  // ---------------------------------------------------------------- q475

  /** Chao1 species-richness estimator: the distinct part count of the
    * FULL fact table estimated from a deterministic 10% hash sample —
    * d_sample + f1·(f1−1)/(2·(f2+1)) (the bias-corrected form), where
    * f1/f2 are singleton/doubleton counts IN THE SAMPLE — against the
    * true distinct count, error in ppm. The ecology estimator that
    * answers "how many keys exist" from a sample alone, where q450's
    * HLL needs to SEE every row — the profiling trade when even one
    * full pass is too expensive.
    *
    * Scale shape: the sample filter is a narrow pushed hash predicate;
    * everything downstream folds per sampled key; the true count is
    * the one full-fold comparison side. */
  private val q475 = QueryDef(
    "q475_chao1_distinct_from_sample",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir).select(col("l_partkey").as("k"))
      // row-level sampling must not key on k (that would sample SPECIES,
      // not individuals) — hash the row's own identity instead
      val rows = Tables.lineitem(spark, dir)
        .select(col("l_partkey").as("k"),
          (Sampling.keyHash(expr("l_orderkey * 10000 + l_linenumber")) % 10L)
            .as("tier"))
      val sample = rows.filter(col("tier") < 1L)
      val freq = sample.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val est = freq.agg(count(lit(1)).as("d_sample"),
        sum((col("c") === 1L).cast("long")).as("f1"),
        sum((col("c") === 2L).cast("long")).as("f2"))
        .withColumn("chao1", expr(
          "d_sample + f1 * (f1 - 1) div (2 * (f2 + 1))"))
      val truth = li.agg(countDistinct(col("k")).as("d_true"))
      est.crossJoin(broadcast(truth))
        .select(col("d_sample"), col("f1"), col("f2"), col("chao1"),
          col("d_true"),
          expr("abs(chao1 - d_true) * 1000000 div d_true").as("err_ppm"))
    },
    Some("""
      WITH rows_t AS (
        SELECT l_partkey AS k,
          (((l_orderkey * 10000 + l_linenumber) % 2147483648) * 2654435761)
            % 4294967296 % 10 AS tier
        FROM lineitem),
      freq AS (
        SELECT k, count(*) AS c FROM rows_t WHERE tier < 1 GROUP BY k),
      est AS (
        SELECT CAST(count(*) AS BIGINT) AS d_sample,
          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM freq),
      truth AS (
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_true
        FROM lineitem)
      SELECT e.d_sample, e.f1, e.f2,
        e.d_sample + e.f1 * (e.f1 - 1) // (2 * (e.f2 + 1)) AS chao1,
        t.d_true,
        abs(e.d_sample + e.f1 * (e.f1 - 1) // (2 * (e.f2 + 1)) - t.d_true)
          * 1000000 // t.d_true AS err_ppm
      FROM est e CROSS JOIN truth t
    """))

  override def defs: Seq[QueryDef] = Seq(q473, q474, q475)
}
