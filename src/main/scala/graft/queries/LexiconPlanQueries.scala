package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 2b: closed-form lexical-repetitiveness statistics over
  * the documents corpus — the size-robust complements of q154's
  * type-token panel (TTR falls with corpus size by construction; Yule's
  * K and Simpson's repeat rate are quadratic in the frequency SPECTRUM
  * and provably size-invariant under the urn model, which is why corpus
  * curation uses them to compare sources of different volumes).
  */
object LexiconPlanQueries extends QueryGroup {

  /** Yule's K per source: K = 10⁴·(Σ m²V_m − N)/N² over the token
    * frequency spectrum (V_m = number of types occurring m times,
    * N = token count) — high K means the source leans on few types
    * (template/boilerplate-prone), low K means broad vocabulary. A
    * corpus-mix dashboard number next to q667's Heaps exponent and
    * q673's stylometric fingerprint. Emitted as k_milli (K×1000), one
    * exact HUGEINT/decimal(38,0) floor both engines share.
    *
    * Scale shape: one explode+groupBy to the (source, token) count
    * table — the row-scale shuffle, map-side combined; the spectrum
    * moments fold per source (Σm², Σm over type rows, far smaller than
    * tokens); readout is sources-sized. Exact while 10⁷·S₂ < 10³⁸
    * (N ≲ 10¹⁵ tokens per source). */
  private val q698 = QueryDef(
    "q698_yules_k",
    (spark, dir) => {
      val tf = Tables.documents(spark, dir)
        .select(col("source"),
          explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("m"))
      tf.groupBy(col("source"))
        .agg(sum(col("m")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("m").cast("decimal(38,0)") * col("m")).as("s2"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("""CAST((s2 - n_tokens) * 10000000 div
              (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)""")
            .as("k_milli"))
        .orderBy(col("source"))
    },
    Some("""
      WITH tf AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS m
        FROM (SELECT source,
                unnest(list_filter(str_split(text, ' '), t -> len(t) > 0))
                  AS token
              FROM documents)
        GROUP BY source, token)
      SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        CAST((sum(CAST(m AS HUGEINT) * m) - sum(m)) * 10000000 //
          (CAST(sum(m) AS HUGEINT) * sum(m)) AS BIGINT) AS k_milli
      FROM tf GROUP BY source ORDER BY source
    """))

  def defs: Seq[QueryDef] = Seq(q698)
}
