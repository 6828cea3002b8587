package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomAggregate.bloom_bits
import graft.functions.expressions.bloom_contains

/** Bloom-filter pre-filtered joins — the explicit form of the runtime
  * semi-join filter big engines inject automatically.
  *
  * At 100 TB the expensive part of `fact ⋈ dim-subset` is shuffling the
  * fact side; when the dim subset is too large to broadcast-join outright
  * but its KEY SET still fits a few MB of bloom bits, the winning plan
  * is: (1) aggregate the dim keys into an m-bit bloom bitset (one native
  * aggregate, map-side partial OR-merge — the shuffle carries bitsets,
  * not keys), (2) collect the bits to the driver as model-scale metadata,
  * (3) probe the fact table with a codegen'd scan-time filter — a NARROW
  * operation that drops (1 − fpp) of the non-matching rows before any
  * exchange, (4) run the exact join on the survivors only. The bloom has
  * no false negatives, so step 4 restores exactness; the final result is
  * bit-identical to the plain join and the DuckDB oracle verifies it as
  * such (q57).
  */
object BloomJoin {

  /** Optimal bloom sizing: m = ceil(−n·ln(fpp)/ln(2)²) bits, k hash
    * functions = round(m/n · ln 2) clamped to [1, 8]. */
  def optimalBits(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    val m = math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2)).toInt.max(64)
    val k = math.round(m.toDouble / expectedKeys * ln2).toInt.max(1).min(8)
    (m, k)
  }

  /** Aggregate `keyCol` of `keys` into a bloom bitset (driver-side
    * long[] — a few KB..MB; broadcast to probes as a literal). */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int, numHashes: Int): Array[Long] =
    keys.agg(bloom_bits(col(keyCol), numBits, numHashes).as("bits"))
      .collect()(0).getSeq[Long](0).toArray

  /** `fact` rows whose `factKey` appears in `dimKeys.dimKey`, exactly —
    * bloom-pre-filtered, then verified with a left-semi join over the
    * survivors. `fpp` trades filter size for pre-filter selectivity. */
  def preFilteredSemiJoin(fact: DataFrame, factKey: String,
                          dimKeys: DataFrame, dimKey: String,
                          fpp: Double = 0.01): DataFrame = {
    val keys = dimKeys.select(col(dimKey)).distinct()
    val n = keys.count().max(1L)
    val (m, k) = optimalBits(n, fpp)
    val bits = buildBits(keys, dimKey, m, k)
    fact
      .filter(bloom_contains(typedLit(bits.toSeq), col(factKey), k))
      .join(keys.withColumnRenamed(dimKey, factKey), Seq(factKey), "left_semi")
  }
}
