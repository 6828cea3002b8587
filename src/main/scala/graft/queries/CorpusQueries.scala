package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Dedup, MinHashLSH}
import graft.functions.Deterministic.cents
import graft.operators.BloomJoin

/** Corpus-level curation operators (round 3): the cluster/select/compact
  * steps that sit between pair generation and corpus materialization in
  * a training-data pipeline.
  */
object CorpusQueries extends QueryGroup {

  /** The shared polynomial-hash fold, as DuckDB SQL (tok → hash). */
  private val duckPolyHash =
    "list_reduce(list_prepend(0::BIGINT, [ord(c)::BIGINT for c in str_split(tok,'')]), (h,c) -> (h*31+c) % 1000000007)"

  private val duckTokens = "list_filter(str_split(text, ' '), t -> len(t) > 0)"

  /** MinHash-LSH candidate-pair CTE chain (same arithmetic q21 verifies),
    * ending in `cand(doc_a, doc_b)`. */
  private val duckMinhashCand = s"""
      toks AS (
        SELECT doc_id, list_transform($duckTokens,
          tok -> $duckPolyHash) AS th
        FROM documents),
      docs AS (
        SELECT doc_id, list_distinct([
            ((th[i]*31 + th[i+1])*31 + th[i+2]) % 1000000007
            for i in range(1, len(th)-1)]) AS sh
        FROM toks WHERE len(th) >= 3),
      sigs AS (
        SELECT doc_id, t.j,
          list_min(list_transform(sh, h -> (h*(2*t.j+1) + 7919*t.j) % 1000000007)) AS m
        FROM docs CROSS JOIN (SELECT unnest(range(16)) AS j) t),
      bands AS (
        SELECT doc_id, j//4 AS band,
          list_reduce(list_prepend(0::BIGINT, list(m ORDER BY j)),
            (a,x) -> ((a*1000000007) % 2147483647 + x) % 2147483647) AS bucket
        FROM sigs GROUP BY doc_id, j//4),
      ok AS (
        SELECT band, bucket FROM bands GROUP BY band, bucket HAVING count(*) <= 2),
      bands_ok AS (
        SELECT b.* FROM bands b JOIN ok USING (band, bucket)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_ok a JOIN bands_ok b
          ON a.band=b.band AND a.bucket=b.bucket AND a.doc_id < b.doc_id)"""

  /** Near-duplicate CLUSTERS from minhash candidate pairs: connected
    * components by min-label propagation (graft.dedup.Dedup
    * .connectedComponents), the step that turns pairwise candidates into
    * dedup groups with one deterministic survivor (min doc id). The
    * oracle reproduces the pair pipeline (q21's verified arithmetic) and
    * closes it transitively with a recursive CTE. */
  private val q56 = QueryDef(
    "q56_dup_clusters",
    (spark, dir) => {
      val pairs = MinHashLSH.nearDuplicates(Tables.documents(spark, dir),
        "doc_id", "text", minJaccard = 0.0, maxBucketSize = Some(2))
      val comps = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("v").as("doc_id"), col("component"))
      val sizes = comps.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comps.join(sizes, "component")
        .select(col("doc_id"), col("component"), col("cluster_size"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $duckMinhashCand,
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand),
      reach AS (
        SELECT src AS v, src AS r FROM edges
        UNION
        SELECT e.dst AS v, reach.r FROM edges e JOIN reach ON reach.v = e.src),
      comp AS (
        SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v)
      SELECT doc_id, component,
        CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
      FROM comp ORDER BY doc_id
    """))

  /** Bloom-pre-filtered semi join (graft.operators.BloomJoin): lineitems
    * of high-value orders, where the order key set rides a bloom bitset
    * to the fact scan as a narrow codegen'd pre-filter and the exact
    * semi join runs on the survivors only. The bloom has no false
    * negatives and the verify join removes false positives, so the
    * result — and the oracle — is the plain IN-subquery semi join. */
  private val q57 = QueryDef(
    "q57_bloom_semi_join",
    (spark, dir) => {
      val highValue = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 350000).select(col("o_orderkey"))
      BloomJoin.preFilteredSemiJoin(
        Tables.lineitem(spark, dir), "l_orderkey", highValue, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 350000)
      GROUP BY l_returnflag ORDER BY l_returnflag
    """))

  def defs: Seq[QueryDef] = Seq(q56, q57)
}
