package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 6: ingestion-hygiene engine surface — `luhn_check`
  * (the checksum that separates real card numbers from 16-digit noise
  * in PII scrubbing), exact Shannon code-length budgeting via the
  * `bin()` bit-length trick (integer coding-cost audits with no
  * floating log2), and `try_cast`-based type sniffing (schema inference
  * over scraped string columns).
  */
object EngineSurfacePlanQueries5 extends QueryGroup {

  // ---------------------------------------------------------------- q739

  /** Luhn checksum PII filter: 16-digit candidate strings synthesized
    * deterministically from customer keys are screened with
    * `luhn_check` — the mod-10 checksum every issued card satisfies, so
    * a PII scrubber that skips it flags ~10× too many 16-digit strings
    * (phone+zip concatenations, order ids). The oracle reimplements the
    * Luhn digit-doubling sum independently as a scalar list fold — if
    * the builtin disagreed with the arithmetic on one row, the hash
    * breaks. ~1/10 of synthetic candidates pass, exactly the noise
    * floor the filter exists to measure.
    *
    * Scale shape: one scan, per-row codegen'd checksum, one bounded
    * fold per market segment. Exact while c_custkey·2654435761 < 2⁶³
    * (custkey ≲ 3.5·10⁹ ≈ sf20k). */
  private val q739 = QueryDef(
    "q739_luhn_pii_filter",
    (spark, dir) => {
      Tables.customer(spark, dir)
        .select(col("c_mktsegment").as("segment"),
          lpad(expr("CAST((c_custkey * 2654435761) % 10000000000000000 " +
            "AS STRING)"), 16, "0").as("s"))
        .select(col("segment"),
          expr("luhn_check(s)").cast("long").as("ok"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_luhn_valid"))
        .orderBy(col("segment"))
    },
    Some("""
      WITH s AS MATERIALIZED (
        SELECT c_mktsegment AS segment,
          lpad(CAST((c_custkey * 2654435761) % 10000000000000000
            AS VARCHAR), 16, '0') AS s
        FROM customer),
      luhn AS (
        -- independent Luhn: fold the REVERSED digits with the state
        -- packed into one BIGINT (sum*2 + position parity; rightmost
        -- digit is position 1, never doubled)
        SELECT segment,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              [CAST(d AS BIGINT) for d in str_split(reverse(s), '')]),
            (a, d) -> ((a // 2) + CASE WHEN a % 2 = 1
                THEN (CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END)
                ELSE d END) * 2 + (1 - a % 2)) AS st
        FROM s)
      SELECT segment, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN (st // 2) % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_luhn_valid
      FROM luhn GROUP BY segment ORDER BY segment
    """))

  // ---------------------------------------------------------------- q740

  /** Shannon code-length budget for the token vocabulary: each token's
    * optimal integer code length is the smallest L with f·2^L ≥ N,
    * computed EXACTLY via the bin() bit-length trick (L =
    * len(bin(ceil(N/f) − 1)); no floating log2, so both engines agree
    * bit-for-bit — the floor(log2) lesson). Rolled up per code length:
    * vocabulary share, frequency mass, encoded-bit budget, and the
    * Kraft sum in 2⁻²⁰ units (≤ 2²⁰ proves the lengths are realizable
    * as a prefix code). This is the "what does a tokenizer swap save"
    * budget line: encoded bits vs the 8·chars baseline.
    *
    * Scale shape: corpus folds to the vocabulary once; everything after
    * is vocab-sized. Code lengths stay far below 62, so len(bin(.)) is
    * exact both sides; kraft_mu is an integer shift 2^(20−L) with an
    * explicit L > 20 → 0 guard on BOTH sides (a float 2^−L cast would
    * truncate in Spark but round in DuckDB once L ≥ 21). */
  private val q740 = QueryDef(
    "q740_shannon_code_budget",
    (spark, dir) => {
      val vocab = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      val n = vocab.agg(sum(col("f")).as("n"))
      vocab.crossJoin(broadcast(n))
        .select(col("w"), col("f"),
          expr("""CASE WHEN (n + f - 1) div f = 1 THEN CAST(0 AS BIGINT)
                  ELSE CAST(length(bin((n + f - 1) div f - 1)) AS BIGINT)
                  END""").as("len"))
        .groupBy(col("len"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("f")).as("mass"),
          sum(col("f") * col("len")).as("encoded_bits"),
          sum(expr("""CASE WHEN len > 20 THEN CAST(0 AS BIGINT)
                      ELSE shiftleft(CAST(1 AS BIGINT),
                                     CAST(20 - len AS INT)) END"""))
            .as("kraft_mu"))
        .orderBy(col("len"))
    },
    Some("""
      WITH v AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS f
        FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      n AS (SELECT sum(f) AS n FROM v),
      c AS (
        SELECT w, f,
          CASE WHEN (n + f - 1) // f = 1 THEN CAST(0 AS BIGINT)
               ELSE CAST(len(bin((n + f - 1) // f - 1)) AS BIGINT)
          END AS len
        FROM v CROSS JOIN n)
      SELECT len, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(f) AS BIGINT) AS mass,
        CAST(sum(f * len) AS BIGINT) AS encoded_bits,
        CAST(sum(CASE WHEN len > 20 THEN 0
                      ELSE (CAST(1 AS BIGINT) << (20 - len)) END) AS BIGINT)
          AS kraft_mu
      FROM c GROUP BY len ORDER BY len
    """))

  // ---------------------------------------------------------------- q741

  /** Type sniffing with `try_cast`: a scraped-looking string column
    * (deterministic 5-way mix of integers, ISO dates, decimals,
    * booleans, and bare words synthesized from document fields;
    * selector (doc_id div 20) % 5 so every source sees every case —
    * doc_id mod 20 determines the source) is
    * probed with tolerant casts — each row votes for the narrowest type
    * it parses as, never aborting on garbage (the ANSI try_ semantics
    * that make schema inference a query instead of a crash loop). Per
    * source: the vote census and the winning type.
    *
    * Scale shape: one scan, four codegen'd try_cast kernels per row,
    * one bounded fold. */
  private val q741 = QueryDef(
    "q741_try_cast_type_sniffing",
    (spark, dir) => {
      Tables.documents(spark, dir)
        .select(col("source"),
          expr("""CASE CAST((doc_id div 20) % 5 AS INT)
              WHEN 0 THEN CAST(n_chars AS STRING)
              WHEN 1 THEN concat('2024-01-', lpad(CAST(doc_id % 28 + 1
                AS STRING), 2, '0'))
              WHEN 2 THEN concat(CAST(n_chars AS STRING), '.25')
              WHEN 3 THEN 'true'
              ELSE substring(text, 1, 8) END""").as("s"))
        .select(col("source"),
          expr("try_cast(s AS BIGINT)").isNotNull.cast("long").as("v_int"),
          (expr("try_cast(s AS DATE)").isNotNull &&
            expr("try_cast(s AS BIGINT)").isNull).cast("long").as("v_date"),
          (expr("try_cast(s AS DOUBLE)").isNotNull &&
            expr("try_cast(s AS BIGINT)").isNull).cast("long").as("v_double"),
          (expr("try_cast(s AS BOOLEAN)").isNotNull &&
            expr("try_cast(s AS DOUBLE)").isNull).cast("long").as("v_bool"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("v_int")).as("n_int"),
          sum(col("v_date")).as("n_date"),
          sum(col("v_double")).as("n_double"),
          sum(col("v_bool")).as("n_bool"))
        .withColumn("n_text",
          expr("n - n_int - n_date - n_double - n_bool"))
        .orderBy(col("source"))
    },
    Some("""
      WITH s AS MATERIALIZED (
        SELECT source,
          CASE CAST((doc_id // 20) % 5 AS INT)
            WHEN 0 THEN CAST(n_chars AS VARCHAR)
            WHEN 1 THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1
              AS VARCHAR), 2, '0')
            WHEN 2 THEN CAST(n_chars AS VARCHAR) || '.25'
            WHEN 3 THEN 'true'
            ELSE substr(text, 1, 8) END AS s
        FROM documents),
      v AS (
        SELECT source,
          -- NOTE: DuckDB's string->BIGINT cast ROUNDS decimals ('1.25'
          -- parses), Spark's try_cast does not — so the independent int
          -- test is a digits-only regexp, not TRY_CAST AS BIGINT
          CASE WHEN regexp_matches(s, '^[0-9]+$') THEN 1 ELSE 0 END
            AS v_int,
          CASE WHEN TRY_CAST(s AS DATE) IS NOT NULL
                AND NOT regexp_matches(s, '^[0-9]+$') THEN 1 ELSE 0 END
            AS v_date,
          CASE WHEN TRY_CAST(s AS DOUBLE) IS NOT NULL
                AND NOT regexp_matches(s, '^[0-9]+$') THEN 1 ELSE 0 END
            AS v_double,
          CASE WHEN TRY_CAST(s AS BOOLEAN) IS NOT NULL
                AND TRY_CAST(s AS DOUBLE) IS NULL THEN 1 ELSE 0 END
            AS v_bool
        FROM s)
      SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(v_int) AS BIGINT) AS n_int,
        CAST(sum(v_date) AS BIGINT) AS n_date,
        CAST(sum(v_double) AS BIGINT) AS n_double,
        CAST(sum(v_bool) AS BIGINT) AS n_bool,
        CAST(count(*) - sum(v_int) - sum(v_date) - sum(v_double)
          - sum(v_bool) AS BIGINT) AS n_text
      FROM v GROUP BY source ORDER BY source
    """))

  override def defs: Seq[QueryDef] = Seq(q739, q740, q741)
}
