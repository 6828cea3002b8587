package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 3: engine surface for pipeline OPERATIONS — file
  * provenance via the `_metadata` hidden column (lineage at 100 TB is
  * "which file, which row", not a bolt-on audit table), column-level
  * AES quarantine (`aes_encrypt`/`aes_decrypt` — PII columns travel
  * encrypted between pipeline stages), dynamic-gap `session_window`
  * (per-event-type session horizons, the streaming-parity batch form),
  * and the `to_char`/`try_to_number` tolerant numeric codec (messy
  * formatted numerics are the #1 ingestion hazard).
  */
object EngineSurfacePlanQueries3 extends QueryGroup {

  // ---------------------------------------------------------------- q728

  /** File-provenance census via the `_metadata` hidden column: file
    * name, file-local `row_index`, and row mass per file — the scan-time
    * lineage primitive (a curator's "quarantine everything file X
    * produced" needs provenance attached AT READ TIME, free, not via a
    * join against an audit table). The oracle knows the ground truth
    * mathematically: one source file, contiguous row indices 0..N−1 —
    * so n, min, max, and the Gauss sum pin the metadata column exactly.
    *
    * Scale shape: one scan; `_metadata` is constant-folded per file
    * split (no shuffle, no memory); the readout is a 1-row-per-file
    * fold. */
  private val q728 = QueryDef(
    "q728_file_provenance_metadata",
    (spark, dir) => {
      graft.GraftSession.configure(spark)
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("_metadata.file_name").as("fname"),
          col("_metadata.row_index").as("ri"), col("doc_id"))
        .groupBy(col("fname"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ri")).as("ri_min"), max(col("ri")).as("ri_max"),
          sum(col("ri")).as("ri_sum"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("fname"))
    },
    Some("""
      SELECT 'documents.parquet' AS fname,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(0 AS BIGINT) AS ri_min,
        CAST(count(*) - 1 AS BIGINT) AS ri_max,
        CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS ri_sum,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM documents
    """))

  // ---------------------------------------------------------------- q729

  /** Column-level AES quarantine: the events `props` payload travels
    * encrypted (`aes_encrypt`, ECB so the audit is deterministic — GCM
    * salts a random IV; production would use GCM and verify via
    * decrypt-only) and the census proves (a) ciphertext mass follows
    * the PKCS#7 16-byte padding law exactly and (b) every row survives
    * the decrypt round trip. This is how PII columns move between
    * pipeline stages that must not read them.
    *
    * Scale shape: one scan, per-row cipher kernels (codegen'd, no UDF),
    * one 5-row fold. Crypto is CPU-bound per byte — scan-shaped, which
    * is the point: quarantine costs no extra pass. */
  private val q729 = QueryDef(
    "q729_aes_column_quarantine",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_type"), col("props"),
          expr("aes_encrypt(props, '0123456789abcdef', 'ECB')").as("c"))
        .select(col("event_type"),
          length(col("c")).cast("long").as("clen"),
          (expr("CAST(aes_decrypt(c, '0123456789abcdef', 'ECB') AS STRING)")
            === col("props")).cast("long").as("ok"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("clen")).as("cipher_bytes"),
          sum(col("ok")).as("n_roundtrip_ok"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum((len(props) // 16 + 1) * 16) AS BIGINT) AS cipher_bytes,
        CAST(count(*) AS BIGINT) AS n_roundtrip_ok
      FROM events GROUP BY event_type ORDER BY event_type
    """))

  // ---------------------------------------------------------------- q730

  /** Dynamic-gap session windows: `session_window` with a PER-EVENT gap
    * expression — views cool off in 5 minutes, everything else holds a
    * session for 30 — then the session-size histogram. Fixed-gap
    * sessionization (q38) can't express "cheap signals shouldn't keep
    * sessions alive"; the dynamic gap is the engine surface that can.
    * The oracle replays the merge rule independently (running max of
    * event-end over the ordered prefix; an event at or past it opens a
    * new session — Spark merges on strict overlap, [start, end) ).
    *
    * Scale shape: session_window shuffles once on user_id and merges
    * sort-locally per key (exactly the streaming state layout); the
    * histogram is a second bounded agg. No window function over the
    * corpus, no self-join. */
  private val q730 = QueryDef(
    "q730_dynamic_gap_sessions",
    (spark, dir) => {
      val gap = when(col("event_type") === "view", lit("5 minutes"))
        .otherwise(lit("30 minutes"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("t"))
        .groupBy(session_window(col("t"), gap), col("user_id"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("session_size"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("session_size"))
    },
    Some("""
      WITH e AS MATERIALIZED (
        SELECT user_id, epoch_us(ts) AS t,
          epoch_us(ts) + CASE WHEN event_type = 'view'
                              THEN 300000000 ELSE 1800000000 END AS fin
        FROM events),
      m AS (
        SELECT user_id, t,
          max(fin) OVER (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM e),
      f AS (
        SELECT user_id, t,
          CASE WHEN prev_end IS NULL OR t >= prev_end THEN 1 ELSE 0 END
            AS brk
        FROM m),
      isl AS (
        SELECT user_id,
          sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS island
        FROM f),
      sess AS (
        SELECT user_id, island, CAST(count(*) AS BIGINT) AS sz
        FROM isl GROUP BY user_id, island)
      SELECT sz AS session_size, CAST(count(*) AS BIGINT) AS n_sessions
      FROM sess GROUP BY sz ORDER BY sz
    """))

  // ---------------------------------------------------------------- q731

  /** Tolerant numeric codec: order values serialize to grouped decimal
    * strings (`to_char` with a thousands-separator mask — the format
    * exports actually arrive in) with a deterministic slice of rows
    * corrupted to 'N/A', and `try_to_number` reads them back: bad cells
    * become NULL (never an abort — ANSI try_ semantics), good cells
    * round-trip exactly. The per-priority census proves mass is
    * conserved through the codec and the null rate equals the
    * corruption rate.
    *
    * Scale shape: one scan, per-row format/parse kernels, one 5-row
    * fold. */
  private val q731 = QueryDef(
    "q731_try_to_number_codec",
    (spark, dir) => {
      Tables.orders(spark, dir)
        .select(col("o_orderpriority").as("priority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          col("o_orderkey").as("k"))
        .select(col("priority"), col("cents"),
          when(col("k") % 7L === 0L, lit("N/A"))
            .otherwise(expr("to_char(cents, '999,999,999,999')")).as("s"))
        .select(col("priority"), col("cents"),
          expr("CAST(try_to_number(s, '999,999,999,999') AS BIGINT)")
            .as("parsed"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("n_bad"),
          sum(col("parsed")).as("cents_recovered"),
          sum(when(col("parsed") === col("cents"), 1L).otherwise(0L))
            .as("n_exact"))
        .orderBy(col("priority"))
    },
    Some("""
      SELECT o_orderpriority AS priority,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bad,
        CAST(sum(CASE WHEN o_orderkey % 7 <> 0
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS cents_recovered,
        CAST(sum(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_exact
      FROM orders GROUP BY o_orderpriority ORDER BY priority
    """))

  override def defs: Seq[QueryDef] = Seq(q728, q729, q730, q731)
}
