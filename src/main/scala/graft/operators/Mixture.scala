package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-scaled mixture sampling: rebalance a multi-source corpus
  * by sampling source s with weight ∝ n_s^(1/T) — the standard recipe for
  * up-weighting small sources (T > 1 flattens the natural distribution;
  * T = 1 keeps it; T → ∞ is uniform).
  *
  * Everything is integer-exact and engine-portable:
  *  - weights are sqrt(n_s) QUANTIZED to a 1e-6 grid (floor(·1e6 + 0.5)),
  *    so per-source weights are longs and their sum is order-independent
  *    (a raw double sum over sources would depend on reduction order);
  *  - per-source targets use integer division: target_s = T·q_s / Σq;
  *  - membership is the deterministic key-hash threshold
  *    h(id)·n_s < target_s·2^32 — every engine picks the same rows, and
  *    the expected kept count per source is target_s.
  *
  * Scale shape: one hash aggregation for the source census (tiny result —
  * sources number in the hundreds), the per-source targets broadcast back
  * onto the corpus scan, and the sample itself is a narrow filter: the
  * 100 TB side is scanned once and never shuffled.
  */
object Mixture {

  private val TwoPow32 = 4294967296L
  private val TwoPow31 = 2147483648L

  /** Per-source census with temperature-2 quantized weights and integer
    * sample targets for a total draw of ~`totalTarget` rows. The weight
    * total is an unpartitioned window over the census — safe because the
    * census is vocabulary-sized (one row per source), and it keeps the
    * census subtree single-use (a crossJoin against its own aggregate
    * would plan the corpus scan twice).
    *
    * Membership is h(key) < hash_threshold with the threshold
    * PRECOMPUTED per source as ceil(target_n·2^32 / n_docs): identical
    * kept set to the h·n_docs < target_n·2^32 form, but the per-row
    * comparison never multiplies h (< 2^32) by n_docs — which would
    * silently wrap Long once a single source exceeds ~2^31 documents.
    * Exact while totalTarget < 2^31 (so target_n·2^32 < 2^63), enforced. */
  def sourceTargets(df: DataFrame, sourceCol: String, totalTarget: Long): DataFrame = {
    require(totalTarget > 0 && totalTarget < TwoPow31,
      s"totalTarget must be in (0, 2^31): $totalTarget")
    val census = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("q_weight", floor(sqrt(col("n_docs")) * 1e6 + 0.5).cast("long"))
    val everything = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    census
      .withColumn("q_total", sum(col("q_weight")).over(everything))
      .withColumn("target_n",
        expr(s"CAST($totalTarget * q_weight DIV q_total AS BIGINT)"))
      // ceil(target_n·2^32 / n_docs) via (x−1) div n + 1 (operands
      // non-negative, target_n ≥ 1 in the ELSE branch so x−1 ≥ 0)
      .withColumn("hash_threshold",
        expr(s"CAST(CASE WHEN target_n = 0 THEN 0 " +
          s"ELSE (target_n * $TwoPow32 - 1) DIV n_docs + 1 END AS BIGINT)"))
      .drop("q_total")
  }

  /** The sampled rows given a precomputed census: joins the (broadcast)
    * targets back and keeps rows whose key hash clears the per-source
    * threshold. Accepting the census avoids re-scanning the corpus when
    * the caller already has it. */
  def sampleWithTargets(df: DataFrame, sourceCol: String, keyCol: Column,
                        targets: DataFrame): DataFrame =
    df.join(broadcast(targets.select(col(sourceCol), col("hash_threshold"))),
        Seq(sourceCol))
      .filter(Sampling.keyHash(keyCol) < col("hash_threshold"))
      .drop("hash_threshold")

  /** One-shot convenience: census + sample (two corpus scans total). */
  def sample(df: DataFrame, sourceCol: String, keyCol: Column, totalTarget: Long): DataFrame =
    sampleWithTargets(df, sourceCol, keyCol, sourceTargets(df, sourceCol, totalTarget))
}
