package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * Training-data pipelines need samples and train/test splits that are
  * (a) reproducible run-over-run and cluster-size-independent — no
  * `rand()`, whose draw depends on partitioning — and (b) *key-
  * consistent*: every row of a user/document/group lands on the same
  * side of a split, or leakage corrupts evaluation.
  *
  * Both come from hashing the key with a fixed multiplicative hash:
  * h(key) = ((key mod 2^31) · A) mod 2^32, then thresholding h mod
  * 10_000. The inner mask keeps the multiply inside 64 bits for EVERY
  * long key (2^31 · A < 2^63), so there is no silent wraparound and the
  * same formula evaluates identically in any SQL engine — without the
  * mask, keys ≥ ~3.5e9 would overflow and diverge across engines. For
  * keys < 2^31 the mask is the identity, so hash values are unchanged.
  * Sampling is a narrow filter: no shuffle, pushes down past column
  * pruning, and composes with every downstream operator.
  */
object Sampling {

  private val TwoPow32 = 4294967296L
  private val TwoPow31 = 2147483648L

  /** h(key) in [0, 2^32): Knuth multiplicative hash with multiplier A
    * over the masked key (key mod 2^31 — overflow-free for all longs).
    * Distinct multipliers give independent hash streams (e.g. one for
    * sampling, another for splitting). */
  def keyHash(key: Column, multiplier: Long = 2654435761L): Column =
    pmod(pmod(key, lit(TwoPow31)) * lit(multiplier), lit(TwoPow32))

  /** Deterministic ~`fraction` Bernoulli sample, keyed: every row whose
    * key hashes under the threshold is kept — the SAME keys at any
    * scale factor, cluster size, or engine. Null keys hash to null and
    * are dropped (standard SQL filter semantics). */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
                  multiplier: Long = 2654435761L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(keyHash(key, multiplier) % 10000L < (fraction * 10000).round)
  }

  /** Per-stratum sampling fractions (stratum → fraction); strata absent
    * from the map are dropped. One narrow filter, no shuffle. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double],
                       multiplier: Long = 2654435761L): DataFrame = {
    val threshold = fractions.foldLeft(lit(-1L)) { case (acc, (s, f)) =>
      when(stratum === s, lit((f * 10000).round)).otherwise(acc)
    }
    df.filter(keyHash(key, multiplier) % 10000L < threshold)
  }

  /** Key-consistent split column: 'test' for ~testFraction of keys,
    * 'train' for the rest. All rows sharing a key get the same side —
    * the no-leakage property group-aware evaluation needs. */
  def splitColumn(key: Column, testFraction: Double,
                  multiplier: Long = 1779033703L): Column =
    when(keyHash(key, multiplier) % 10000L < (testFraction * 10000).round, lit("test"))
      .otherwise(lit("train"))

  /** (train, test) pair of DataFrames split key-consistently.
    * Null keys hash to null; routing them explicitly to the TRAIN side
    * (matching `splitColumn`'s otherwise-branch) preserves the
    * train ∪ test = df invariant — a bare `filter(!mark)` would silently
    * drop null-keyed rows from both sides. */
  def trainTestSplit(df: DataFrame, key: Column, testFraction: Double,
                     multiplier: Long = 1779033703L): (DataFrame, DataFrame) = {
    val mark = coalesce(
      keyHash(key, multiplier) % 10000L < (testFraction * 10000).round, lit(false))
    (df.filter(!mark), df.filter(mark))
  }
}
