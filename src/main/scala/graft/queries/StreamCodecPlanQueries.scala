package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic.epochS

/** Round-9 batch 4: storage-codec sizing analytics, continuing q657-q659
  * (varint posting lists, RLE runs) with the three codecs those queries
  * don't cover: Gorilla delta-of-delta for timestamp streams (the
  * time-series-database standard), an EMPIRICAL Bloom-filter
  * false-positive sweep (actual hash collisions at a bits budget — not
  * the idealized (1−e^(−kn/m))^k formula, which real skewed key sets
  * violate), and frame-of-reference bit-packing under two physical
  * layouts (the "why sort before you pack" readout). All exact integers;
  * the Bloom hash is plain 64-bit-safe modular arithmetic both engines
  * compute identically.
  */
object StreamCodecPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q676

  /** Gorilla delta-of-delta census over per-user event timestamps: the
    * second difference of consecutive event times, bucketed into
    * Gorilla's transmission classes (0 bits of payload when the cadence
    * is steady; 7/9/12/32-bit windows otherwise) with the paper's
    * 1/2/3/4-bit control prefixes. Output: per class, how many deltas
    * land there and the bits they cost, plus the compression ratio vs
    * raw 64-bit timestamps — the storage model for any event-stream
    * archive.
    *
    * Scale shape: two lag windows per user (user-keyed partitions — the
    * bounded-window discipline; no user's history is corpus-sized),
    * then a ≤5-row class census with map-side partials. */
  private val q676 = QueryDef(
    "q676_gorilla_dod_census",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val dod = Tables.events(spark, dir)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          epochS(col("ts")).as("t"))
        .withColumn("d", col("t") - lag(col("t"), 1).over(w))
        .withColumn("dod", col("d") - lag(col("d"), 1).over(w))
        .filter(col("dod").isNotNull)
        .select(expr(
          """CASE
               WHEN dod = 0 THEN 'a_zero'
               WHEN dod BETWEEN -63 AND 64 THEN 'b_7bit'
               WHEN dod BETWEEN -255 AND 256 THEN 'c_9bit'
               WHEN dod BETWEEN -2047 AND 2048 THEN 'd_12bit'
               ELSE 'e_32bit' END""").as("class"),
          expr(
            """CASE
               WHEN dod = 0 THEN 1
               WHEN dod BETWEEN -63 AND 64 THEN 9
               WHEN dod BETWEEN -255 AND 256 THEN 12
               WHEN dod BETWEEN -2047 AND 2048 THEN 16
               ELSE 36 END""").cast("long").as("bits"))
      val census = dod.groupBy(col("class"))
        .agg(count(lit(1)).as("n"), sum(col("bits")).as("total_bits"))
      census
        .withColumn("ratio_ppm",
          expr("total_bits * 1000000 div (n * 64)"))
        .select(col("class"), col("n"), col("total_bits"), col("ratio_ppm"))
        .orderBy(col("class"))
    },
    Some("""
      WITH base AS (
        SELECT user_id, ts, event_id,
          CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t
        FROM events WHERE ts IS NOT NULL),
      d1 AS (
        SELECT user_id, ts, event_id,
          t - lag(t) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
        FROM base),
      d2 AS (
        SELECT d - lag(d) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS dod
        FROM d1),
      cls AS (
        SELECT
          CASE WHEN dod = 0 THEN 'a_zero'
               WHEN dod BETWEEN -63 AND 64 THEN 'b_7bit'
               WHEN dod BETWEEN -255 AND 256 THEN 'c_9bit'
               WHEN dod BETWEEN -2047 AND 2048 THEN 'd_12bit'
               ELSE 'e_32bit' END AS class,
          CAST(CASE WHEN dod = 0 THEN 1
               WHEN dod BETWEEN -63 AND 64 THEN 9
               WHEN dod BETWEEN -255 AND 256 THEN 12
               WHEN dod BETWEEN -2047 AND 2048 THEN 16
               ELSE 36 END AS BIGINT) AS bits
        FROM d2 WHERE dod IS NOT NULL)
      SELECT class, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(bits) AS BIGINT) AS total_bits,
        CAST(sum(bits) * 1000000 // (count(*) * 64) AS BIGINT) AS ratio_ppm
      FROM cls GROUP BY class ORDER BY class
    """))

  // ---------------------------------------------------------------- q677

  /** Empirical Bloom-filter FPR sweep: insert the distinct order keys
    * that contain a returned line (l_returnflag = 'R') into a
    * single-hash Bloom filter of m ∈ {4096, 16384, 65536} buckets
    * (h = LCG-mixed key mod m — plain modular arithmetic, identical in
    * both engines), then probe with every order key that has NO
    * returned line and count actual collisions. The EMPIRICAL false-
    * positive rate — what q57's BloomJoin really pays on this key
    * distribution — vs the occupancy the textbook formula assumes.
    *
    * Scale shape: member/probe sets are order-keyed distinct aggs; the
    * occupied-bucket table is ≤m rows per grid point; the probe check
    * is a keyed join on (m, bucket) against that bounded table. No
    * all-pairs anything.
    *
    * SCALING (round-9 probe): 0.56 s at sf0.01 → 1.14 s at sf0.1 (10×
    * data, exponent ≈0.31 — the orderkey fold and bucket join grow
    * with keys, the occupied table stays ≤m). */
  private val q677 = QueryDef(
    "q677_bloom_fpr_empirical",
    (spark, dir) => {
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(4096L, 16384L, 65536L).toDF("m")
      val flagged = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_r"))
      val hashed = flagged.select(col("l_orderkey"), col("has_r"),
        expr("((l_orderkey % 2147483647) * 1103515245 + 12345) % 2147483647")
          .as("h"))
        .crossJoin(broadcast(grid))
        .select(col("m"), col("has_r"), expr("h % m").as("bucket"))
      val occupied = hashed.filter(col("has_r") === 1L)
        .select(col("m"), col("bucket")).distinct()
      val members = hashed.filter(col("has_r") === 1L)
        .groupBy(col("m")).agg(count(lit(1)).as("n_members"))
      val occ = occupied.groupBy(col("m")).agg(count(lit(1)).as("n_occupied"))
      val probes = hashed.filter(col("has_r") === 0L)
        .join(occupied.withColumn("hit", lit(1L)), Seq("m", "bucket"), "left")
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_probes"),
          sum(coalesce(col("hit"), lit(0L))).as("n_false_pos"))
      members.join(occ, Seq("m")).join(probes, Seq("m"))
        .select(col("m"), col("n_members"), col("n_occupied"),
          expr("n_occupied * 1000000 div m").as("occupancy_ppm"),
          col("n_probes"), col("n_false_pos"),
          expr("n_false_pos * 1000000 div n_probes").as("fpr_ppm"))
        .orderBy(col("m"))
    },
    Some("""
      WITH grid(m) AS (VALUES (CAST(4096 AS BIGINT)),
        (CAST(16384 AS BIGINT)), (CAST(65536 AS BIGINT))),
      flagged AS (
        SELECT l_orderkey,
          max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
        FROM lineitem GROUP BY l_orderkey),
      hashed AS (
        SELECT m, has_r,
          (((l_orderkey % 2147483647) * 1103515245 + 12345) % 2147483647)
            % m AS bucket
        FROM flagged CROSS JOIN grid),
      occupied AS (
        SELECT DISTINCT m, bucket FROM hashed WHERE has_r = 1),
      members AS (
        SELECT m, CAST(count(*) AS BIGINT) AS n_members
        FROM hashed WHERE has_r = 1 GROUP BY m),
      occ AS (
        SELECT m, CAST(count(*) AS BIGINT) AS n_occupied
        FROM occupied GROUP BY m),
      probes AS (
        SELECT h.m, CAST(count(*) AS BIGINT) AS n_probes,
          CAST(sum(CASE WHEN o.bucket IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
        FROM hashed h
        LEFT JOIN occupied o ON o.m = h.m AND o.bucket = h.bucket
        WHERE h.has_r = 0 GROUP BY h.m)
      SELECT m, n_members, n_occupied,
        CAST(n_occupied * 1000000 // m AS BIGINT) AS occupancy_ppm,
        n_probes, n_false_pos,
        CAST(n_false_pos * 1000000 // n_probes AS BIGINT) AS fpr_ppm
      FROM members JOIN occ USING (m) JOIN probes USING (m)
      ORDER BY m
    """))

  // ---------------------------------------------------------------- q678

  /** Frame-of-reference bit-packing under two layouts: pack l_partkey
    * in key-range zones (512-wide) of the NATURAL clustering
    * (l_orderkey zones — what arrives from ingestion) vs a layout
    * sorted by l_partkey itself (l_partkey zones). Per zone the FOR
    * codec stores min + ceil(log₂(max−min+1)) bits per row; sorting
    * shrinks each zone's range and therefore its width. The
    * sort-before-pack savings number a table-layout owner reads next to
    * q622's IO-skipping view of the same decision.
    *
    * Scale shape: zones are key-range buckets (integer division of a
    * key — NO global row_number sort; q622's bin-granular discipline),
    * so both layouts are plain keyed aggs: per-zone min/max/count, then
    * a 2-row readout. Bit widths via length(bin(range)) — the integer
    * log₂ both engines agree on. */
  private val q678 = QueryDef(
    "q678_for_packing_layouts",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      def zoned(zoneKey: String, label: String) =
        li.groupBy(expr(s"$zoneKey div 512").as("z"))
          .agg(count(lit(1)).as("n"),
            min(col("l_partkey")).as("lo"), max(col("l_partkey")).as("hi"))
          .select(lit(label).as("layout"), col("n"),
            expr("CASE WHEN hi = lo THEN 0" +
              " ELSE length(bin(hi - lo)) END").cast("long").as("bits"))
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("n_zones"), sum(col("n")).as("n_rows"),
            sum(col("bits") * col("n")).as("packed_bits"),
            max(col("bits")).as("max_zone_bits"))
      zoned("l_orderkey", "natural").unionAll(zoned("l_partkey", "sorted"))
        .select(col("layout"), col("n_zones"), col("n_rows"),
          col("packed_bits"), col("max_zone_bits"),
          expr("packed_bits * 1000000 div (n_rows * 64)").as("ratio_ppm"))
        .orderBy(col("layout"))
    },
    Some("""
      WITH natural_z AS (
        SELECT l_orderkey // 512 AS z, CAST(count(*) AS BIGINT) AS n,
          min(l_partkey) AS lo, max(l_partkey) AS hi
        FROM lineitem GROUP BY 1),
      sorted_z AS (
        SELECT l_partkey // 512 AS z, CAST(count(*) AS BIGINT) AS n,
          min(l_partkey) AS lo, max(l_partkey) AS hi
        FROM lineitem GROUP BY 1),
      bits AS (
        SELECT 'natural' AS layout, n,
          CAST(CASE WHEN hi = lo THEN 0 ELSE length(bin(hi - lo)) END
            AS BIGINT) AS bits
        FROM natural_z
        UNION ALL
        SELECT 'sorted' AS layout, n,
          CAST(CASE WHEN hi = lo THEN 0 ELSE length(bin(hi - lo)) END
            AS BIGINT) AS bits
        FROM sorted_z),
      fold AS (
        SELECT layout, CAST(count(*) AS BIGINT) AS n_zones,
          CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(sum(bits * n) AS BIGINT) AS packed_bits,
          CAST(max(bits) AS BIGINT) AS max_zone_bits
        FROM bits GROUP BY layout)
      SELECT layout, n_zones, n_rows, packed_bits, max_zone_bits,
        CAST(packed_bits * 1000000 // (n_rows * 64) AS BIGINT) AS ratio_ppm
      FROM fold ORDER BY layout
    """))

  override def defs: Seq[QueryDef] = Seq(q676, q677, q678)
}
