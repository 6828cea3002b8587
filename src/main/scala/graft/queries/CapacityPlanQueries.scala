package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 batch 4: capacity/quality analytics — Kingman's VUT queueing
  * formula from measured variability, class-balanced effective-number
  * weighting (integer exp-by-squaring), and a kNN label-noise census.
  * All outputs integers / strings with total ORDER BYs for the oracle
  * gate.
  */
object CapacityPlanQueries extends QueryGroup {

  // ---------------------------------------------------------------- q546

  /** Kingman (VUT) queue-wait planner: W_q ≈ ρ/(1−ρ) · (C_a²+C_s²)/2 · τ
    * says waiting explodes with UTILIZATION times VARIABILITY — both
    * measured here per event type: C_a² from inter-arrival gaps (lag
    * within (type, day) partitions), C_s² from the value column as the
    * service-size proxy, every CV² as the integer n·Σx²·1000/(Σx)² − 1000
    * (milli, division-last so ~10¹⁷ stays in range). Swept over target
    * utilizations {0.5, 0.8, 0.95} to show the hockey stick. q522 sizes
    * pools by Little's law (means only); this adds the variability term
    * that actually bites.
    *
    * Scale shape: gaps ship from a (type, day)-partitioned lag — the
    * stream's natural shard, never a global window; the 3-row ρ grid
    * broadcasts onto the per-type CV table. */
  private val q546 = QueryDef(
    "q546_kingman_queue_wait",
    (spark, dir) => {
      import graft.functions.Deterministic.epochS
      val spark0 = spark
      import spark0.implicits._
      val grid = Seq(500L, 800L, 950L).toDF("rho_milli")
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), epochS(col("ts")).as("ts_s"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("svc"),
          col("event_id"))
      val gaps = ev
        .withColumn("day", expr("ts_s div 86400"))
        .withColumn("gap", col("ts_s") - lag(col("ts_s"), 1).over(
          Window.partitionBy(col("event_type"), col("day"))
            .orderBy(col("ts_s"), col("event_id"))))
        .filter(col("gap").isNotNull && col("gap") >= 0L)
      // CV² = n·Σx²/(Σx)² − 1, staged division-FIRST: Σx² div Σx is at
      // most max(x) (≤ 86400 s / 10⁴ cents), so n·that·1000 ≤ ~10¹³ —
      // the naive n·Σx²·1000 crosses 2⁶³ on sparse streams
      val ca = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sg"),
          sum(expr("gap * gap")).as("sg2"))
        .select(col("event_type"), col("n_gaps"),
          expr("n_gaps * (sg2 div greatest(sg, 1)) * 1000" +
            " div greatest(sg, 1) - 1000").as("ca2_milli"))
      val cs = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("svc")).as("sv"),
          sum(expr("svc * svc")).as("sv2"))
        .select(col("event_type"), col("n_events"),
          expr("n_events * (sv2 div greatest(sv, 1)) * 1000" +
            " div greatest(sv, 1) - 1000").as("cs2_milli"))
      ca.join(cs, Seq("event_type"))
        .crossJoin(broadcast(grid))
        .select(col("event_type"), col("rho_milli"), col("n_gaps"),
          col("ca2_milli"), col("cs2_milli"),
          expr("rho_milli * (ca2_milli + cs2_milli) div (2 * (1000 - rho_milli))")
            .as("wq_per_service_milli"))
        .orderBy(col("event_type"), col("rho_milli"))
    },
    Some("""
      WITH grid(rho_milli) AS (VALUES (CAST(500 AS BIGINT)),
        (CAST(800 AS BIGINT)), (CAST(950 AS BIGINT))),
      ev AS (
        SELECT event_type, epoch_ms(ts) // 1000 AS ts_s,
          CAST(floor(value * 100 + 0.5) AS BIGINT) AS svc, event_id
        FROM events),
      g AS (
        SELECT event_type,
          ts_s - lag(ts_s, 1) OVER (PARTITION BY event_type, ts_s // 86400
            ORDER BY ts_s, event_id) AS gap
        FROM ev),
      ca AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
          CAST(count(*) * (sum(gap * gap) // greatest(sum(gap), 1)) * 1000
            // greatest(sum(gap), 1) - 1000 AS BIGINT) AS ca2_milli
        FROM g WHERE gap IS NOT NULL AND gap >= 0 GROUP BY event_type),
      cs AS (
        SELECT event_type,
          CAST(count(*) * (sum(svc * svc) // greatest(sum(svc), 1)) * 1000
            // greatest(sum(svc), 1) - 1000 AS BIGINT) AS cs2_milli
        FROM ev GROUP BY event_type)
      SELECT ca.event_type, rho_milli, n_gaps, ca2_milli, cs2_milli,
        CAST(rho_milli * (ca2_milli + cs2_milli) // (2 * (1000 - rho_milli))
          AS BIGINT) AS wq_per_service_milli
      FROM ca JOIN cs USING (event_type) CROSS JOIN grid
      ORDER BY event_type, rho_milli
    """))

  // ---------------------------------------------------------------- q547

  /** Class-balanced weighting by effective number (Cui et al.): a class
    * with n samples has effective number (1−βⁿ)/(1−β) (β = 0.999), and
    * re-weighting by its inverse stops huge classes from drowning rare
    * ones while not over-boosting singletons the way plain 1/n does.
    * βⁿ is computed by integer EXP-BY-SQUARING: β^(2ⁱ) ships as ten ppm
    * literals (computed once at plan build, identical in both engines)
    * and each row multiplies the constants for its n's set bits with
    * ppm truncation per step — bit-identical everywhere, no pow().
    *
    * Scale shape: one per-label count, ten-branch scalar projection,
    * one-row weight-total broadcast for normalization. */
  private val q547 = QueryDef(
    "q547_class_balanced_weights",
    (spark, dir) => {
      val betaPow: IndexedSeq[Long] = (0 until 10).map { i =>
        math.round(math.pow(0.999, math.pow(2.0, i.toDouble)) * 1e6)
      }
      // p = β^min(n,1023) in ppm via set-bit product, truncating per step
      val chain = (0 until 10).foldLeft("CAST(1000000 AS BIGINT)") { (acc, i) =>
        s"(CASE WHEN nc % ${1L << (i + 1)} >= ${1L << i} " +
          s"THEN ($acc * ${betaPow(i)}) div 1000000 ELSE $acc END)"
      }
      val counts = Tables.embeddings(spark, dir)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vectors"))
        .withColumn("nc", expr("least(n_vectors, 1023)"))
        .withColumn("beta_pow_ppm", expr(chain))
        .withColumn("eff_number_milli", expr("1000000 - beta_pow_ppm"))
        .withColumn("raw_w", expr("1000000000 div greatest(eff_number_milli, 1)"))
      val tot = counts.agg(sum(col("raw_w")).as("wt"))
      counts.crossJoin(broadcast(tot))
        .select(col("label"), col("n_vectors"), col("beta_pow_ppm"),
          col("eff_number_milli"),
          expr("raw_w * 1000000 div wt").as("weight_ppm"))
        .orderBy(col("label"))
    },
    Some {
      val betaPow: IndexedSeq[Long] = (0 until 10).map { i =>
        math.round(math.pow(0.999, math.pow(2.0, i.toDouble)) * 1e6)
      }
      val chain = (0 until 10).foldLeft("CAST(1000000 AS BIGINT)") { (acc, i) =>
        s"(CASE WHEN nc % ${1L << (i + 1)} >= ${1L << i} " +
          s"THEN ($acc * ${betaPow(i)}) // 1000000 ELSE $acc END)"
      }
      s"""
      WITH counts AS (
        SELECT CAST(label AS BIGINT) AS label,
          CAST(count(*) AS BIGINT) AS n_vectors
        FROM embeddings GROUP BY label),
      c2 AS (SELECT *, least(n_vectors, 1023) AS nc FROM counts),
      p AS (SELECT label, n_vectors, CAST($chain AS BIGINT) AS beta_pow_ppm
            FROM c2),
      e AS (
        SELECT *, 1000000 - beta_pow_ppm AS eff_number_milli,
          1000000000 // greatest(1000000 - beta_pow_ppm, 1) AS raw_w
        FROM p),
      t AS (SELECT sum(raw_w) AS wt FROM e)
      SELECT label, n_vectors, beta_pow_ppm, eff_number_milli,
        CAST(raw_w * 1000000 // wt AS BIGINT) AS weight_ppm
      FROM e CROSS JOIN t ORDER BY label
    """
    })

  // ---------------------------------------------------------------- q548

  /** kNN label-noise census (confident-learning's neighborhood form):
    * for a 2% hash sample of vectors, find each probe's exact 5 nearest
    * neighbors by quantized cosine and count how many share its label —
    * a label whose neighborhoods disagree with it is either noisy or
    * genuinely overlapping, and its consensus ppm is the cleaning
    * budget's target order. q137 scores CLUSTER purity around learned
    * centroids; this scores the raw metric neighborhoods.
    *
    * Scale shape: q25/q495's broadcast-probe pattern — corpus × |2%
    * sample| codegen'd cosines, top-5 per probe via a probe-partitioned
    * rank, label-sized rollup. */
  private val q548 = QueryDef(
    "q548_knn_label_noise",
    (spark, dir) => {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 512 + 0.5) AS BIGINT))")
            .as("qv"))
        .withColumn("nsq", expr("aggregate(qv, 0L, (a, x) -> a + x * x)"))
        .filter(col("nsq") > 0L)
      val probes = vecs
        .filter(graft.operators.Sampling.keyHash(col("vec_id")) % 10000L < 200L)
        .select(col("vec_id").as("p_id"), col("label").as("p_label"),
          col("qv").as("p_qv"), col("nsq").as("p_nsq"))
      val byProbe = Window.partitionBy(col("p_id"))
        .orderBy(col("cos_milli").desc, col("vec_id"))
      vecs.join(broadcast(probes), col("vec_id") =!= col("p_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qv, p_qv, (a, b) -> a * b), 0L, (a, x) -> a + x)"))
        .withColumn("cos_milli", expr(
          "CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(nsq AS DOUBLE)" +
            " * CAST(p_nsq AS DOUBLE)) * 1000 + 0.5) AS BIGINT)"))
        .withColumn("rk", row_number().over(byProbe))
        .filter(col("rk") <= 5)
        .groupBy(col("p_id"), col("p_label"))
        .agg(sum(when(col("label") === col("p_label"), 1L).otherwise(0L))
          .as("agree"))
        .groupBy(col("p_label"))
        .agg(count(lit(1)).as("n_probes"), sum(col("agree")).as("agree_total"))
        .select(col("p_label").as("label"), col("n_probes"),
          expr("agree_total * 1000000 div (n_probes * 5)").as("consensus_ppm"),
          expr("1000000 - agree_total * 1000000 div (n_probes * 5)")
            .as("noise_estimate_ppm"))
        .orderBy(col("label"))
    },
    Some("""
      WITH v AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 512 + 0.5) AS BIGINT)) AS qv
        FROM embeddings),
      n AS (
        SELECT vec_id, label, qv,
          CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        FROM v),
      nn AS (SELECT * FROM n WHERE nsq > 0),
      probes AS (
        SELECT vec_id AS p_id, label AS p_label, qv AS p_qv, nsq AS p_nsq
        FROM nn
        WHERE (vec_id % 2147483648) * 2654435761 % 4294967296 % 10000 < 200),
      s AS (
        SELECT p.p_id, p.p_label, nn.label,
          row_number() OVER (PARTITION BY p.p_id ORDER BY
            CAST(floor(CAST(list_sum(list_transform(range(1, len(nn.qv) + 1),
                i -> nn.qv[i] * p.p_qv[i])) AS DOUBLE)
              / sqrt(CAST(nn.nsq AS DOUBLE) * CAST(p.p_nsq AS DOUBLE)) * 1000
              + 0.5) AS BIGINT) DESC, nn.vec_id) AS rk
        FROM nn JOIN probes p ON nn.vec_id <> p.p_id),
      a AS (
        SELECT p_id, p_label,
          CAST(sum(CASE WHEN label = p_label THEN 1 ELSE 0 END) AS BIGINT)
            AS agree
        FROM s WHERE rk <= 5 GROUP BY p_id, p_label)
      SELECT p_label AS label, CAST(count(*) AS BIGINT) AS n_probes,
        CAST(sum(agree) * 1000000 // (count(*) * 5) AS BIGINT)
          AS consensus_ppm,
        CAST(1000000 - sum(agree) * 1000000 // (count(*) * 5) AS BIGINT)
          AS noise_estimate_ppm
      FROM a GROUP BY p_label ORDER BY label
    """))

  def defs: Seq[QueryDef] = Seq(q546, q547, q548)
}
