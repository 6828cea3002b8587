package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Dedup, MinHashLSH}
import graft.functions.Deterministic.{cents, epochS}
import graft.functions.TopKAggregate.topk_pairs
import graft.operators.{BloomJoin, Sampling}

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

  /** Per-language quota sampling: keep at most N docs per language,
    * priority = the deterministic key hash (Sampling.keyHash) — the
    * language-balancing step of corpus assembly. Scale path: the
    * bounded-heap topk_pairs aggregate carries ≤N rows per language
    * through the shuffle (map-side partial heaps), where the textbook
    * row_number() window would sort every doc of every language. The
    * oracle IS that textbook window — same result, different plan. */
  private val q58 = QueryDef(
    "q58_quota_sample",
    (spark, dir) => {
      val quota = 40
      // hash < 2^32 is exactly representable in double, so the heap's
      // (score desc, id asc) order == (hash asc, doc_id asc)
      val prio = Sampling.keyHash(col("doc_id")).cast("double")
      Tables.documents(spark, dir)
        .select(col("lang"), col("doc_id"), negate(prio).as("neg"))
        .groupBy(col("lang"))
        .agg(topk_pairs(col("neg"), col("doc_id"), quota).as("picked"))
        .select(col("lang"), explode(col("picked")).as("p"))
        .select(col("lang"), col("p.id").as("doc_id"),
          negate(col("p.score")).cast("long").as("priority"))
        .orderBy("lang", "priority", "doc_id")
    },
    Some("""
      WITH h AS (
        SELECT lang, doc_id,
          ((doc_id % 2147483648) * 2654435761) % 4294967296 AS pr
        FROM documents)
      SELECT lang, doc_id, CAST(pr AS BIGINT) AS priority
      FROM h
      QUALIFY row_number() OVER (PARTITION BY lang ORDER BY pr, doc_id) <= 40
      ORDER BY lang, priority, doc_id
    """))

  /** One-pass column profiling (the data-quality census a pipeline runs
    * before training): per profiled column — non-null count, exact
    * distinct, min, max — computed in a SINGLE aggregate over one scan
    * and unpivoted to long format. Naive profilers scan once per
    * column; at 100 TB the single-pass shape is the difference between
    * one job and a dozen. */
  private val q59 = QueryDef(
    "q59_data_profile",
    (spark, dir) => {
      val src = Tables.orders(spark, dir).select(
        col("o_orderkey").as("c1"),
        col("o_custkey").as("c2"),
        cents(col("o_totalprice")).as("c3"),
        length(col("o_orderpriority")).cast("long").as("c4"))
      def m(c: String) = Seq(
        count(col(c)).as(s"${c}_n"),
        countDistinct(col(c)).as(s"${c}_d"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))
      val agg = src.agg(m("c1").head, (m("c1").tail ++ m("c2") ++ m("c3") ++ m("c4")): _*)
      agg.select(expr(
        """stack(4,
           'o_orderkey', c1_n, c1_d, c1_min, c1_max,
           'o_custkey', c2_n, c2_d, c2_min, c2_max,
           'o_totalprice_cents', c3_n, c3_d, c3_min, c3_max,
           'o_orderpriority_len', c4_n, c4_d, c4_min, c4_max)
           AS (column_name, n_nonnull, n_distinct, min_v, max_v)"""))
        .orderBy("column_name")
    },
    Some("""
      WITH src AS (
        SELECT o_orderkey AS c1, o_custkey AS c2,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c3,
          CAST(len(o_orderpriority) AS BIGINT) AS c4
        FROM orders)
      SELECT column_name, n_nonnull, n_distinct, min_v, max_v FROM (
        SELECT 'o_orderkey' AS column_name, CAST(count(c1) AS BIGINT) AS n_nonnull,
          CAST(count(DISTINCT c1) AS BIGINT) AS n_distinct, min(c1) AS min_v, max(c1) AS max_v
        FROM src
        UNION ALL
        SELECT 'o_custkey', CAST(count(c2) AS BIGINT),
          CAST(count(DISTINCT c2) AS BIGINT), min(c2), max(c2) FROM src
        UNION ALL
        SELECT 'o_totalprice_cents', CAST(count(c3) AS BIGINT),
          CAST(count(DISTINCT c3) AS BIGINT), min(c3), max(c3) FROM src
        UNION ALL
        SELECT 'o_orderpriority_len', CAST(count(c4) AS BIGINT),
          CAST(count(DISTINCT c4) AS BIGINT), min(c4), max(c4) FROM src)
      ORDER BY column_name
    """))

  /** Directional n-gram containment over prefix-blocked pairs
    * (graft.dedup.Dedup.containmentPairs): the quote/excerpt detector —
    * containment ≈ 1 in one direction flags A ⊂ B even when symmetric
    * Jaccard is low. Runs with the boilerplate-block cap ON. */
  private val q60 = QueryDef(
    "q60_containment_pairs",
    (spark, dir) => {
      Dedup.containmentPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, prefixLen = 24, minContainment = 0.0, maxBlockSize = Some(2))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH g AS (
        SELECT doc_id, substr(text,1,24) AS block,
          list_distinct([substr(text,i,3) for i in range(1, len(text)-1)]) AS grams
        FROM documents),
      ok AS (SELECT block FROM g GROUP BY block HAVING count(*) <= 2),
      g_ok AS (SELECT g.* FROM g JOIN ok USING (block))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)/len(a.grams)
          AS containment_a_in_b,
        CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)/len(b.grams)
          AS containment_b_in_a
      FROM g_ok a JOIN g_ok b ON a.block = b.block AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b
    """))

  /** Keep-latest compaction (CDC/snapshot semantics): one surviving row
    * per user — the latest event by (second, event_id). Scale path: a
    * single hash aggregation of max(struct(orderKeys…, payload…)) with
    * map-side partial maxes — NOT a per-key window sort; the struct's
    * leading fields (ts_s, event_id) are a unique sort key, so payload
    * fields never decide the comparison. The oracle is the textbook
    * row_number window. */
  private val q61 = QueryDef(
    "q61_keep_latest",
    (spark, dir) => {
      Tables.events(spark, dir)
        .select(col("user_id"), struct(
          epochS(col("ts")).as("ts_s"),
          col("event_id"),
          col("event_type"),
          cents(col("value")).as("value_cents")).as("s"))
        .groupBy(col("user_id"))
        .agg(max(col("s")).as("s"))
        .select(col("user_id"), col("s.ts_s").as("ts_s"), col("s.event_id").as("event_id"),
          col("s.event_type").as("event_type"), col("s.value_cents").as("value_cents"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_s, event_id, event_type,
        CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents
      FROM events
      QUALIFY row_number() OVER (
        PARTITION BY user_id
        ORDER BY epoch_ms(ts) // 1000 DESC, event_id DESC) = 1
      ORDER BY user_id
    """))

  def defs: Seq[QueryDef] = Seq(q56, q57, q58, q59, q60, q61)
}
