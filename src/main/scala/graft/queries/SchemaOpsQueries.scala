package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.epochS

/** Round-4 schema/workload operators: inclusion-dependency mining across
  * table pairs, the split-and-stitch sessionization certificate for
  * batch-boundary-safe sessions, and a predicate-workload index advisor
  * — discovery and planning over the engine's own schema and workload,
  * deterministic for the oracle gate.
  */
object SchemaOpsQueries extends QueryGroup {

  // ---------------------------------------------------------------- q440

  /** Inclusion-dependency mining: eight directed column pairs tested
    * for value containment (distinct child values found among parent
    * values, in ppm) — the schema-discovery step that surfaces JOINABLE
    * columns and foreign keys without a catalog (q167 mines functional
    * dependencies WITHIN a table; q83 audits one declared FK; this
    * searches across tables). The supplier→customer pair documents the
    * classic IND false positive: disjoint entities whose surrogate-key
    * RANGES overlap contain each other almost fully — containment alone
    * is evidence, not proof, of a semantic link.
    *
    * Scale shape: each pair is two map-side distinct folds and one
    * keyed semi-join on the (already distinct) key sets — never a row
    *-level join; the union output is 8 rows. */
  private val q440 = QueryDef(
    "q440_inclusion_dependency_mining",
    (spark, dir) => {
      def pair(label: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String) = {
        val c = child.select(col(ck).as("k")).distinct()
        val p = parent.select(col(pk).as("k")).distinct()
        val contained = c.join(p, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("n_contained"))
        c.agg(count(lit(1)).as("n_child_distinct"))
          .crossJoin(broadcast(contained))
          .select(lit(label).as("pair"), col("n_child_distinct"),
            col("n_contained"),
            expr("n_contained * 1000000 div n_child_distinct")
              .as("containment_ppm"))
      }
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val p = Tables.part(spark, dir)
      val s = Tables.supplier(spark, dir)
      Seq(
        pair("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey", o, "o_orderkey"),
        pair("orders.o_orderkey->lineitem.l_orderkey", o, "o_orderkey", li, "l_orderkey"),
        pair("orders.o_custkey->customer.c_custkey", o, "o_custkey", c, "c_custkey"),
        pair("customer.c_custkey->orders.o_custkey", c, "c_custkey", o, "o_custkey"),
        pair("lineitem.l_partkey->part.p_partkey", li, "l_partkey", p, "p_partkey"),
        pair("part.p_partkey->lineitem.l_partkey", p, "p_partkey", li, "l_partkey"),
        pair("lineitem.l_suppkey->supplier.s_suppkey", li, "l_suppkey", s, "s_suppkey"),
        pair("supplier.s_suppkey->customer.c_custkey", s, "s_suppkey", c, "c_custkey"))
        .reduce(_ unionAll _)
        .withColumn("is_ind", (col("containment_ppm") === 1000000L).cast("long"))
        .orderBy(col("pair"))
    },
    Some {
      def pairSql(label: String, ct: String, ck: String, pt: String, pk: String) =
        s"""SELECT '$label' AS pair,
          CAST(count(*) AS BIGINT) AS n_child_distinct,
          CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_contained
        FROM (SELECT DISTINCT $ck AS k FROM $ct) ch
        LEFT JOIN (SELECT DISTINCT $pk AS k FROM $pt) p USING (k)"""
      val pairs = Seq(
        ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_orderkey->lineitem.l_orderkey", "orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_custkey->orders.o_custkey", "customer", "c_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        ("part.p_partkey->lineitem.l_partkey", "part", "p_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("supplier.s_suppkey->customer.c_custkey", "supplier", "s_suppkey", "customer", "c_custkey"))
      s"""
      WITH u AS (
        ${pairs.map(p => pairSql(p._1, p._2, p._3, p._4, p._5))
          .mkString("\n        UNION ALL\n        ")})
      SELECT pair, n_child_distinct, n_contained,
        n_contained * 1000000 // n_child_distinct AS containment_ppm,
        CAST(CASE WHEN n_contained * 1000000 // n_child_distinct = 1000000
          THEN 1 ELSE 0 END AS BIGINT) AS is_ind
      FROM u
      ORDER BY pair
    """
    })

  // ---------------------------------------------------------------- q441

  /** Split-and-stitch sessionization certificate: 30-minute-gap
    * sessions counted globally (one pass) and again per calendar-day
    * batch, then day-boundary bridges (last event of day d within 30
    * min of the same user's first event of day d+1) stitch the batch
    * count back together — proving sessions_global = sessions_batch −
    * bridges, the identity that lets a petabyte backfill sessionize
    * day-partitioned data WITHOUT a global shuffle-sort (q87/q228/q260
    * all assume the global pass; this licenses the partitioned one:
    * chained multi-day sessions work because each bridged boundary
    * removes exactly one session).
    *
    * Scale shape: the batch pass partitions windows by (user, day) —
    * embarrassingly parallel over day partitions; bridges are a keyed
    * self-join of per-(user, day) min/max bounds (one row per user-day,
    * never per event); the global pass exists here only as the
    * certificate's other side. */
  private val q441 = QueryDef(
    "q441_session_stitch_certificate",
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), epochS(col("ts")).as("s"))
        .withColumn("day", expr("s div 86400"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("s"))
      val wUD = Window.partitionBy(col("user_id"), col("day")).orderBy(col("s"))
      def breaks(w: org.apache.spark.sql.expressions.WindowSpec) =
        when(lag(col("s"), 1).over(w).isNull ||
          col("s") - lag(col("s"), 1).over(w) > 1800L, 1L).otherwise(0L)
      val globalN = e.withColumn("brk", breaks(wU))
        .agg(sum(col("brk")).as("sessions_global"))
      val batchN = e.withColumn("brk", breaks(wUD))
        .agg(sum(col("brk")).as("sessions_batch"))
      val bounds = e.groupBy(col("user_id"), col("day"))
        .agg(min(col("s")).as("first_s"), max(col("s")).as("last_s"))
      val bridges = bounds.alias("a")
        .join(bounds.alias("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.day") === col("a.day") + 1L)
        .filter(col("b.first_s") - col("a.last_s") <= 1800L)
        .agg(count(lit(1)).as("n_bridges"))
      globalN.crossJoin(broadcast(batchN)).crossJoin(broadcast(bridges))
        .select(col("sessions_global"), col("sessions_batch"), col("n_bridges"),
          (col("sessions_batch") - col("n_bridges")).as("sessions_stitched"),
          (col("sessions_batch") - col("n_bridges") === col("sessions_global"))
            .cast("long").as("is_consistent"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS s,
          epoch_ms(ts) // 1000 // 86400 AS day
        FROM events),
      g AS (
        SELECT CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
            OR lag(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
          THEN 1 ELSE 0 END AS brk
        FROM e),
      gtot AS (SELECT CAST(sum(brk) AS BIGINT) AS sessions_global FROM g),
      gd AS (
        SELECT CASE WHEN s - lag(s) OVER (PARTITION BY user_id, day ORDER BY s)
            > 1800
            OR lag(s) OVER (PARTITION BY user_id, day ORDER BY s) IS NULL
          THEN 1 ELSE 0 END AS brk
        FROM e),
      btot AS (SELECT CAST(sum(brk) AS BIGINT) AS sessions_batch FROM gd),
      bounds AS (
        SELECT user_id, day, min(s) AS first_s, max(s) AS last_s
        FROM e GROUP BY 1, 2),
      bridges AS (
        SELECT CAST(count(*) AS BIGINT) AS n_bridges
        FROM bounds a JOIN bounds b
          ON a.user_id = b.user_id AND b.day = a.day + 1
        WHERE b.first_s - a.last_s <= 1800)
      SELECT sessions_global, sessions_batch, n_bridges,
        sessions_batch - n_bridges AS sessions_stitched,
        CAST(CASE WHEN sessions_batch - n_bridges = sessions_global
          THEN 1 ELSE 0 END AS BIGINT) AS is_consistent
      FROM gtot CROSS JOIN btot CROSS JOIN bridges
    """))

  // ---------------------------------------------------------------- q442

  /** Predicate-workload index advisor: a 10-predicate workload over
    * orders (status/priority equality, price bands, date ranges) with
    * literal frequency weights; each predicate's selectivity is
    * measured from the data in ONE scan, an index on a column saves
    * (1 − selectivity) of that scan for its predicates, and columns are
    * ranked by frequency-weighted saved-scan ppm with the top two
    * flagged — the what-to-index decision (q277 prices join strategy,
    * q331 audits zone maps; this prices secondary indexes from the
    * workload).
    *
    * Scale shape: ten conditional sums fold in one map-side pass to a
    * single row; the melt to per-predicate rows and the column ranking
    * are workload-sized. */
  private val q442 = QueryDef(
    "q442_index_advisor",
    (spark, dir) => {
      // (name, column, frequency weight, predicate)
      def preds(df: DataFrame): Seq[(String, String, Long, Column)] = Seq(
        ("status_F", "o_orderstatus", 30L, col("o_orderstatus") === "F"),
        ("status_O", "o_orderstatus", 10L, col("o_orderstatus") === "O"),
        ("prio_urgent", "o_orderpriority", 25L, col("o_orderpriority") === "1-URGENT"),
        ("prio_high", "o_orderpriority", 15L, col("o_orderpriority") === "2-HIGH"),
        ("price_gt_400k", "o_totalprice", 8L, col("o_totalprice") > 400000d),
        ("price_lt_50k", "o_totalprice", 7L, col("o_totalprice") < 50000d),
        ("date_1995", "o_orderdate", 20L,
          col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01"),
        ("date_2000plus", "o_orderdate", 12L, col("o_orderdate") >= "2000-01-01"),
        ("cust_low", "o_custkey", 5L, col("o_custkey") <= 100L),
        ("key_band", "o_orderkey", 3L,
          col("o_orderkey") >= 1000L && col("o_orderkey") < 5000L))
      val o = Tables.orders(spark, dir)
      val ps = preds(o)
      val counted = o.agg(count(lit(1)).as("n_rows"),
        ps.map { case (n, _, _, p) => sum(p.cast("long")).as(s"c_$n") }: _*)
      val melted = counted.select(col("n_rows"), explode(array(ps.map {
        case (n, cc, f, _) =>
          struct(lit(n).as("pred"), lit(cc).as("column"), lit(f).as("freq"),
            col(s"c_$n").as("matched"))
      }: _*)).as("p")).select(col("n_rows"), col("p.*"))
      val perCol = melted
        .withColumn("sel_ppm", expr("matched * 1000000 div n_rows"))
        .groupBy(col("column"))
        .agg(count(lit(1)).as("n_preds"), sum(col("freq")).as("total_freq"),
          sum(expr("freq * (1000000 - sel_ppm)")).as("saved_weight"))
      val ranked = perCol.withColumn("rk", row_number().over(
        Window.orderBy(col("saved_weight").desc, col("column"))).cast("long"))
      ranked
        .select(col("column"), col("n_preds"), col("total_freq"),
          col("saved_weight"), col("rk"),
          (col("rk") <= 2L).cast("long").as("is_picked"))
        .orderBy(col("rk"))
    },
    Some("""
      WITH counted AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_status_f,
          CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c_status_o,
          CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS c_prio_u,
          CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS c_prio_h,
          CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) AS c_price_gt,
          CAST(sum(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS c_price_lt,
          CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS c_date95,
          CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS c_date00,
          CAST(sum(CASE WHEN o_custkey <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS c_cust,
          CAST(sum(CASE WHEN o_orderkey >= 1000 AND o_orderkey < 5000 THEN 1 ELSE 0 END) AS BIGINT) AS c_key
        FROM orders),
      melted AS (
        SELECT n_rows, p.* FROM counted,
        LATERAL (VALUES
          ('status_F', 'o_orderstatus', CAST(30 AS BIGINT), c_status_f),
          ('status_O', 'o_orderstatus', 10, c_status_o),
          ('prio_urgent', 'o_orderpriority', 25, c_prio_u),
          ('prio_high', 'o_orderpriority', 15, c_prio_h),
          ('price_gt_400k', 'o_totalprice', 8, c_price_gt),
          ('price_lt_50k', 'o_totalprice', 7, c_price_lt),
          ('date_1995', 'o_orderdate', 20, c_date95),
          ('date_2000plus', 'o_orderdate', 12, c_date00),
          ('cust_low', 'o_custkey', 5, c_cust),
          ('key_band', 'o_orderkey', 3, c_key))
          AS p(pred, col_name, freq, matched)),
      per_col AS (
        SELECT col_name AS "column", CAST(count(*) AS BIGINT) AS n_preds,
          CAST(sum(freq) AS BIGINT) AS total_freq,
          CAST(sum(freq * (1000000 - matched * 1000000 // n_rows)) AS BIGINT)
            AS saved_weight
        FROM melted GROUP BY col_name),
      ranked AS (
        SELECT *, CAST(row_number() OVER (ORDER BY saved_weight DESC, "column")
          AS BIGINT) AS rk
        FROM per_col)
      SELECT "column", n_preds, total_freq, saved_weight, rk,
        CAST(CASE WHEN rk <= 2 THEN 1 ELSE 0 END AS BIGINT) AS is_picked
      FROM ranked
      ORDER BY rk
    """))

  override def defs: Seq[QueryDef] = Seq(q440, q441, q442)
}
