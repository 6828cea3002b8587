package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 5: storage-encoding estimators and the order-
  * randomness audit behind them — delta-varint posting-list sizing
  * (the inverted-index storage estimate), run-length encoding runs
  * (the columnar-layout estimate), and the Wald–Wolfowitz runs test
  * (is a sequence ordered enough that RLE pays, or random enough that
  * it can't?). Compression RATIOS are pure integer arithmetic over
  * counts and bit lengths — no codec needed to cost a layout decision.
  * All exact integers with total ORDER BYs for the oracle gate.
  */
object EncodingPlanQueries extends QueryGroup {

  /** q657's body, parameterized by shard width so the spec can assert
    * the census is width-invariant. `shardWidth <= 0` selects the
    * UNSHARDED reference form (per-token window over raw postings) —
    * test-only: it is the exact shape the generator-keyed window gate
    * exists to reject at corpus scale. */
  private[graft] def varintPostingCensus(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      shardWidth: Long): org.apache.spark.sql.DataFrame = {
    // no .distinct() needed: array_distinct dedupes tokens WITHIN a
    // document and doc_id separates documents, so (token, doc_id) is
    // already unique — a distinct here would buy nothing but a full
    // extra shuffle of the exploded stream
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("array_distinct(filter(split(text, ' '), t -> t != ''))"))
          .as("token"))
    val perToken =
      if (shardWidth <= 0L) {
        // unsharded reference: one window partition per token — a
        // stop word's partition is the whole corpus (gate canary)
        val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
        postings
          .withColumn("gap",
            col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(-1L)))
          .select(col("token"),
            expr("CAST((length(bin(gap)) + 6) div 7 AS BIGINT)").as("vbytes"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("df"), sum(col("vbytes")).as("varint_bytes"))
      } else {
        val sharded = postings.withColumn("shard", expr(s"doc_id div ${shardWidth}L"))
        // in-shard gaps: partitions bounded by the shard width; the
        // first row of each shard has no in-shard gap (vb null -> 0)
        val wIn = Window.partitionBy(col("token"), col("shard")).orderBy(col("doc_id"))
        val inShard = sharded
          .withColumn("prev", lag(col("doc_id"), 1).over(wIn))
          .withColumn("vb",
            expr("CAST((length(bin(doc_id - prev)) + 6) div 7 AS BIGINT)"))
        // per-(token, shard) summary — corpus/shardWidth rows per token
        val shards = inShard.groupBy(col("token"), col("shard"))
          .agg(count(lit(1)).as("cnt"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
            sum(coalesce(col("vb"), lit(0L))).as("vb_in"))
        // stitch: one boundary gap per shard, against the previous
        // NONEMPTY shard's max (empty shards produce no summary row,
        // so lag skips them exactly as the unsharded window would)
        val wB = Window.partitionBy(col("token")).orderBy(col("shard"))
        shards
          .withColumn("bgap",
            col("min_doc") - coalesce(lag(col("max_doc"), 1).over(wB), lit(-1L)))
          .withColumn("vb_b",
            expr("CAST((length(bin(bgap)) + 6) div 7 AS BIGINT)"))
          .groupBy(col("token"))
          .agg(sum(col("cnt")).as("df"),
            (sum(col("vb_in")) + sum(col("vb_b"))).as("varint_bytes"))
      }
    perToken.groupBy(expr("CAST(length(bin(df)) - 1 AS BIGINT)").as("log2_df"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("df") * 8L).as("raw_bytes"),
        sum(col("varint_bytes")).as("varint_bytes"))
      .select(col("log2_df"), col("n_tokens"), col("raw_bytes"),
        col("varint_bytes"),
        expr("varint_bytes * 1000000 div raw_bytes").as("ratio_ppm"))
      .orderBy(col("log2_df"))
  }

  // ---------------------------------------------------------------- q657

  /** Delta-varint posting-list sizing: for every token's posting list
    * (sorted distinct doc ids), the LEB128 varint cost of the
    * delta-encoded form — varint_bytes(gap) = ⌈bitlen(gap)/7⌉, via the
    * libm-safe length(bin(g)) — versus 8 bytes/posting raw. Bucketed
    * by log₂(df): rare tokens carry large gaps (poor compression),
    * common tokens tiny gaps (great compression) — the census IS the
    * index-sizing model, and the overall ratio is the disk budget.
    *
    * Scale shape: the explode folds to DISTINCT (token, doc) — keyed;
    * gap computation is SHARDED (round-9, the round-8 judge's task 4):
    * a plain per-token lag window puts a stop-word's ENTIRE posting
    * list in one window partition — billions of rows in a single task
    * sort at 100 TB — so gaps are computed per (token, doc_id div S)
    * shard (partitions ≤ S rows by construction) and the one boundary
    * gap per shard is stitched from the per-shard min/max summary,
    * whose own per-token window moves corpus/S rows per partition,
    * never corpus rows. The stitch changes NO census number: within a
    * shard the gaps are the unsharded gaps, and each shard's first gap
    * is min_doc − (previous nonempty shard's max_doc), which IS the
    * unsharded gap across the boundary (first overall = doc_id + 1).
    * ShardedPostingSpec asserts width-invariance (4096 == 2²⁰ ==
    * unsharded reference); the census folds to ≤ ~30 log buckets.
    *
    * Shard width: 4096 here so the stitch provably executes at test
    * SFs (≥ 2 shards from sf0.01 up); a production index uses ~2²⁰ —
    * at 10¹² documents both the in-shard sort (≤ S) and the summary
    * window (≤ N/S per token) stay ≤ ~10⁶ rows per task. */
  private val q657 = QueryDef(
    "q657_varint_posting_size",
    (spark, dir) => varintPostingCensus(spark, dir, shardWidth = 4096L),
    Some("""
      WITH postings AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(
          list_filter(str_split(text, ' '), t -> len(t) > 0))) AS token
        FROM documents),
      gaps AS (
        SELECT token,
          doc_id - coalesce(lag(doc_id)
            OVER (PARTITION BY token ORDER BY doc_id), -1) AS gap
        FROM postings),
      pt AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df,
          CAST(sum((length(bin(gap)) + 6) // 7) AS BIGINT) AS varint_bytes
        FROM gaps GROUP BY token)
      SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS log2_df,
        CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(df * 8) AS BIGINT) AS raw_bytes,
        CAST(sum(varint_bytes) AS BIGINT) AS varint_bytes,
        CAST(sum(varint_bytes) * 1000000 // sum(df * 8) AS BIGINT) AS ratio_ppm
      FROM pt GROUP BY 1 ORDER BY 1
    """))

  // ---------------------------------------------------------------- q658

  /** Run-length encoding census: within each order's lineitem sequence
    * (ordered by line number — the physical row order a writer sees),
    * count the RUNS of equal l_returnflag. RLE stores one entry per
    * run, so entries/rows is the compression ratio; grouped by order
    * size, the census shows where RLE pays (clustered flags) and where
    * it degrades to no-op (alternating flags). The columnar sibling of
    * q657's index estimate.
    *
    * Scale shape: one lineitem scan; the run detection is a lag window
    * PER ORDER (≤ 7-row partitions — dimension-bounded); census folds
    * to ≤ 7 order-size rows. Ordering: (l_linenumber, l_returnflag,
    * l_partkey, l_suppkey) — this testdata repeats line numbers within
    * an order, and including the flag in the tie-break makes any
    * fully-tied rows carry EQUAL flags, so the flag sequence (and the
    * run count) is permutation-invariant on both engines.
    *
    * SCALING (round-8 probe): 0.29 s at sf0.01 → 1.09 s at sf0.1 (10×
    * data, 3.7× time ≈ exponent 0.57) — the per-order window sorts
    * grow with the corpus but partitions stay ≤ 7 rows, so the slope
    * stays sublinear. */
  private val q658 = QueryDef(
    "q658_rle_run_census",
    (spark, dir) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(
        col("l_linenumber"), col("l_returnflag"), col("l_partkey"), col("l_suppkey"))
      val runs = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_partkey"), col("l_suppkey"))
        .withColumn("new_run",
          when(col("l_returnflag") === lag(col("l_returnflag"), 1).over(w), 0L)
            .otherwise(1L))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("new_run")).as("n_runs"))
      runs.groupBy(col("n_items"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("n_runs")).as("total_runs"),
          sum(col("n_items")).as("total_rows"))
        .select(col("n_items"), col("n_orders"), col("total_runs"),
          expr("total_runs * 1000000 div total_rows").as("rle_ratio_ppm"))
        .orderBy(col("n_items"))
    },
    Some("""
      WITH marked AS (
        SELECT l_orderkey,
          CASE WHEN l_returnflag = lag(l_returnflag)
            OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_returnflag, l_partkey, l_suppkey)
            THEN 0 ELSE 1 END AS new_run
        FROM lineitem),
      runs AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
          CAST(sum(new_run) AS BIGINT) AS n_runs
        FROM marked GROUP BY l_orderkey)
      SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(n_runs) AS BIGINT) AS total_runs,
        CAST(sum(n_runs) * 1000000 // sum(n_items) AS BIGINT) AS rle_ratio_ppm
      FROM runs GROUP BY n_items ORDER BY n_items
    """))

  // ---------------------------------------------------------------- q659

  /** Wald–Wolfowitz runs test on the 1995 daily-order-count series:
    * is the above/below-median sequence random, or does it carry
    * structure (trend, seasonality, batch effects) an encoder — or an
    * experimenter assuming i.i.d. days — should know about? Too FEW
    * runs means clustering; too MANY means alternation. z² in exact
    * ppm: with A = R·n − n − 2·n₁·n₂ (integer), z² = A²·(n−1) /
    * (2n₁n₂·(2n₁n₂ − n)) — DECIMAL(38,0) intermediates since A²·(n−1)
    * ·10⁶ ≈ 10²² exceeds int64. Median = lower median of the 365
    * counts, rank-selected.
    *
    * Scale shape: one orders scan folds to ≤ 365 day rows
    * (calendar-bounded); the median rank, the lag sequence, and the
    * run count are windows over those CALENDAR rows (the sanctioned
    * q99/q636 class); readout is 1 row. */
  private val q659 = QueryDef(
    "q659_runs_test_daily_orders",
    (spark, dir) => {
      val daily = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
        .groupBy(expr("CAST(datediff(o_orderdate, DATE '1995-01-01') AS BIGINT)")
          .as("day"))
        .agg(count(lit(1)).as("cnt")).persist()
      val med = daily
        .withColumn("rn", row_number().over(Window.orderBy(col("cnt"), col("day"))))
        .withColumn("nn", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(expr("rn = (nn + 1) div 2"))
        .select(col("cnt").as("med"))
      val seq0 = daily.crossJoin(broadcast(med))
        .select(col("day"), (col("cnt") > col("med")).cast("long").as("above"))
      val runsRow = seq0
        .withColumn("new_run",
          when(col("above") === lag(col("above"), 1).over(Window.orderBy(col("day"))),
            0L).otherwise(1L))
        .agg(count(lit(1)).as("n"),
          sum(col("above")).as("n1"),
          sum(lit(1L) - col("above")).as("n2"),
          sum(col("new_run")).as("r"))
      runsRow.select(col("n").as("n_days"), col("n1").as("n_above"),
          col("n2").as("n_below"), col("r").as("n_runs"),
          expr("""CAST(CAST(r * n - n - 2 * n1 * n2 AS DECIMAL(38,0))
              * (r * n - n - 2 * n1 * n2) * (n - 1) * 1000000
            div (CAST(2 * n1 * n2 AS DECIMAL(38,0)) * (2 * n1 * n2 - n))
            AS BIGINT)""").as("z2_ppm"))
        .select(col("n_days"), col("n_above"), col("n_below"), col("n_runs"),
          col("z2_ppm"), (col("z2_ppm") < 3841459L).as("random_at_5pct"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(datediff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
          CAST(count(*) AS BIGINT) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1),
      med AS (
        SELECT cnt AS med FROM (
          SELECT cnt, row_number() OVER (ORDER BY cnt, day) AS rn,
            count(*) OVER () AS n
          FROM daily)
        WHERE rn = (n + 1) // 2),
      seq0 AS (
        SELECT day, CAST(CASE WHEN cnt > med THEN 1 ELSE 0 END AS BIGINT)
          AS above
        FROM daily CROSS JOIN med),
      marked AS (
        SELECT above,
          CASE WHEN above = lag(above) OVER (ORDER BY day)
            THEN 0 ELSE 1 END AS new_run
        FROM seq0),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(above) AS BIGINT) AS n1,
          CAST(sum(1 - above) AS BIGINT) AS n2,
          CAST(sum(new_run) AS BIGINT) AS r
        FROM marked)
      SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
        CAST(CAST(r * n - n - 2 * n1 * n2 AS HUGEINT)
            * (r * n - n - 2 * n1 * n2) * (n - 1) * 1000000
          // (CAST(2 * n1 * n2 AS HUGEINT) * (2 * n1 * n2 - n))
          AS BIGINT) AS z2_ppm,
        CAST(CAST(r * n - n - 2 * n1 * n2 AS HUGEINT)
            * (r * n - n - 2 * n1 * n2) * (n - 1) * 1000000
          // (CAST(2 * n1 * n2 AS HUGEINT) * (2 * n1 * n2 - n))
          AS BIGINT) < 3841459 AS random_at_5pct
      FROM agg
    """))

  override def defs: Seq[QueryDef] = Seq(q657, q658, q659)
}
