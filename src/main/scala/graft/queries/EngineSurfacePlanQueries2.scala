package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 2: more previously un-exercised engine surface —
  * URL decomposition (`parse_url`, the domain-extraction primitive
  * behind per-site dedup/quality policies in web curation), the Spark
  * 3.5 regexp accessor family (`regexp_count`/`regexp_instr`/
  * `regexp_substr`), SQL LATERAL correlated subqueries (Catalyst's
  * decorrelation path), ordered-set aggregates (`percentile_disc` /
  * `listagg ... WITHIN GROUP`), and Spark 4 collation-aware grouping
  * (`collate(x, 'UTF8_LCASE')` — case-insensitive dedup without
  * materializing a lowercased copy).
  */
object EngineSurfacePlanQueries2 extends QueryGroup {

  // ---------------------------------------------------------------- q723

  /** URL decomposition census: document coordinates serialize to
    * canonical URLs (host from source, path from doc id, query from
    * lang) and `parse_url` takes them back apart — HOST for the
    * per-site rollup, PATH re-parsed to recover the id mass, QUERY key
    * extraction for the lang facet. Per-site accounting (docs, id
    * checksum, distinct langs) is the backbone of web-corpus curation:
    * site-level quality scores, robots policies, and dedup scopes all
    * key on the registrable host.
    *
    * Scale shape: one scan, per-row codegen'd parse (no UDF), one
    * map-side-combined groupBy to |sites| rows (20 here; ~10⁷ at web
    * scale — still dimension-sized next to the corpus). */
  private val q723 = QueryDef(
    "q723_parse_url_host_census",
    (spark, dir) => {
      Tables.documents(spark, dir)
        .select(concat(lit("https://"), col("source"),
          lit(".example.com/d/"), col("doc_id"),
          lit("?lang="), col("lang")).as("url"))
        .select(expr("parse_url(url, 'HOST')").as("host"),
          expr("CAST(substring(parse_url(url, 'PATH'), 4) AS BIGINT)")
            .as("path_id"),
          expr("parse_url(url, 'QUERY', 'lang')").as("qlang"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"), sum(col("path_id")).as("id_sum"),
          countDistinct(col("qlang")).as("n_langs"))
        .orderBy(col("host"))
    },
    Some("""
      SELECT source || '.example.com' AS host,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(doc_id) AS BIGINT) AS id_sum,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source ORDER BY host
    """))

  // ---------------------------------------------------------------- q724

  /** Regexp accessor family over the corpus: per source,
    * `regexp_count` totals pattern hits (the repetition/boilerplate
    * counters every quality filter runs), `regexp_instr` sums
    * first-hit offsets (lead-position statistics for boilerplate
    * stripping), and `regexp_substr` measures first-match mass. The
    * DuckDB oracle rebuilds each from primitives (regexp_extract_all
    * length, strpos of the leftmost match — equal to the match offset
    * for any unanchored pattern, since an earlier occurrence of the
    * matched string would itself have been the leftmost match).
    *
    * Scale shape: one scan, three codegen'd regexp kernels per row, one
    * bounded groupBy. Scan-bound at 100 TB, as regex filters must be. */
  private val q724 = QueryDef(
    "q724_regexp_accessor_census",
    (spark, dir) => {
      Tables.documents(spark, dir)
        .select(col("source"),
          expr("regexp_count(text, 'ta[a-z]+e')").cast("long").as("hits"),
          expr("regexp_instr(text, 'sp[a-z]+k')").cast("long").as("first_pos"),
          expr("CAST(coalesce(length(regexp_substr(text, 'w[a-z]+w')), 0) AS BIGINT)")
            .as("sub_len"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("hits"),
          sum(col("first_pos")).as("first_pos_sum"),
          sum(col("sub_len")).as("sub_len_sum"))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(regexp_extract_all(text, 'ta[a-z]+e'))) AS BIGINT)
          AS hits,
        CAST(sum(CASE WHEN regexp_matches(text, 'sp[a-z]+k')
              THEN strpos(text, regexp_extract(text, 'sp[a-z]+k', 0))
              ELSE 0 END) AS BIGINT) AS first_pos_sum,
        CAST(sum(CASE WHEN regexp_matches(text, 'w[a-z]+w')
              THEN len(regexp_extract(text, 'w[a-z]+w', 0))
              ELSE 0 END) AS BIGINT) AS sub_len_sum
      FROM documents GROUP BY source ORDER BY source
    """))

  // ---------------------------------------------------------------- q725

  /** SQL LATERAL correlated subquery: per source, a lateral derived
    * table computes that source's longest document and its long-doc
    * count — the "for each group, run this parameterized probe" shape
    * analysts write naturally. Catalyst decorrelates it into a keyed
    * aggregate + join (DecorrelateInnerQuery), NOT a per-row re-scan —
    * which is exactly what must happen for the construct to survive
    * 100 TB; the spec pins the decorrelated plan shape.
    *
    * Scale shape: after decorrelation — one distinct over sources, one
    * keyed aggregate over documents, one join on source. All
    * key-partitioned; nothing per-row. */
  private val q725 = QueryDef(
    "q725_lateral_source_probe",
    (spark, dir) => {
      Tables.documents(spark, dir).createOrReplaceTempView("graft_q725_docs")
      spark.sql("""
        SELECT s.source, t.max_chars, t.n_long
        FROM (SELECT DISTINCT source FROM graft_q725_docs) s,
        LATERAL (
          SELECT max(d.n_chars) AS max_chars,
            CAST(count(CASE WHEN d.n_chars > 200 THEN 1 END) AS BIGINT)
              AS n_long
          FROM graft_q725_docs d WHERE d.source = s.source) t
        ORDER BY s.source
      """)
    },
    Some("""
      SELECT s.source, t.max_chars, t.n_long
      FROM (SELECT DISTINCT source FROM documents) s,
      LATERAL (
        SELECT max(d.n_chars) AS max_chars,
          CAST(count(CASE WHEN d.n_chars > 200 THEN 1 END) AS BIGINT)
            AS n_long
        FROM documents d WHERE d.source = s.source) t
      ORDER BY s.source
    """))

  // ---------------------------------------------------------------- q726

  /** Ordered-set aggregates: per return flag, `percentile_disc(...)
    * WITHIN GROUP` reads exact data-valued quartiles (no interpolation
    * — the only percentile that hash-matches across engines by
    * construction) and `listagg(DISTINCT ...) WITHIN GROUP` folds the
    * status domain to one ordered string — the deterministic
    * small-domain serialization used in audit fingerprints. Both are
    * the ANSI ordered-set syntax Spark added in 3.4/4.0.
    *
    * Scale shape: percentile_disc is a sort-based aggregate over the
    * group — fine for a 3-group flag census; at corpus scale the
    * histogram-rank route (q324 family) replaces it, which is why both
    * live in the catalog. listagg folds a ≤2-value domain. */
  private val q726 = QueryDef(
    "q726_ordered_set_aggregates",
    (spark, dir) => {
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q726_li")
      spark.sql("""
        SELECT l_returnflag AS flag,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS q50,
          percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS q90,
          listagg(DISTINCT l_linestatus, ',')
            WITHIN GROUP (ORDER BY l_linestatus) AS statuses,
          CAST(count(*) AS BIGINT) AS n
        FROM graft_q726_li GROUP BY l_returnflag ORDER BY flag
      """)
    },
    Some("""
      SELECT l_returnflag AS flag,
        quantile_disc(l_quantity, 0.25) AS q25,
        quantile_disc(l_quantity, 0.5)  AS q50,
        quantile_disc(l_quantity, 0.9)  AS q90,
        string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
          AS statuses,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY flag
    """))

  // ---------------------------------------------------------------- q727

  /** Collation-aware distinct: a case-mangled token stream (alternating
    * doc-id blocks capitalize their tokens — the kind of casing noise
    * OCR and titling inject; blocks of 20 so every source sees both
    * casings, since doc_id mod 20 determines the source) is
    * deduplicated twice: byte-exact, and under
    * Spark 4's UTF8_LCASE collation via `collate()` — case-insensitive
    * distinct WITHOUT materializing a lowercased copy of the corpus
    * (the collation comparator works on the original bytes; at 100 TB
    * that's the difference between reusing the scan and doubling it).
    * The oracle checks both cardinalities against lower()-normalized
    * ground truth.
    *
    * Scale shape: one explode + two distinct aggregates over the token
    * stream, map-side combined, token-hash partitioned. */
  private val q727 = QueryDef(
    "q727_collation_ci_distinct",
    (spark, dir) => {
      Tables.fanOut(Tables.documents(spark, dir))
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("source"),
          when(expr("doc_id div 20") % 2L === 1L,
            concat(upper(substring(col("w"), 1, 1)), expr("substring(w, 2)")))
            .otherwise(col("w")).as("tok"))
        // r13: dedupe (source, tok) FIRST (one map-side-combined
        // aggregate over the token stream), then count over the
        // deduplicated set — the former two-countDistinct aggregate
        // Expand-doubled the full corpus token stream through the
        // exchange; counting distinct of a coarser equivalence over an
        // already-distinct set is the same number (guide §2.3).
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_exact"),
          countDistinct(expr("collate(tok, 'UTF8_LCASE')")).as("n_ci"))
        .orderBy(col("source"))
    },
    Some("""
      WITH toks AS MATERIALIZED (
        SELECT source,
          CASE WHEN (doc_id // 20) % 2 = 1
               THEN upper(w[1]) || w[2:] ELSE w END AS tok
        FROM (SELECT source, doc_id, unnest(str_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) > 0)
      SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact,
        CAST(count(DISTINCT lower(tok)) AS BIGINT) AS n_ci
      FROM toks GROUP BY source ORDER BY source
    """))

  override def defs: Seq[QueryDef] = Seq(q723, q724, q725, q726, q727)
}
