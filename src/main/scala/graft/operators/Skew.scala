package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities.
  *
  * AQE's skew-join splitting handles most hot keys at runtime; salting is
  * the explicit fallback when one key dominates so heavily that even
  * split shuffle blocks overwhelm single tasks (the classic power-law
  * join key at 100 TB). The salted join spreads each hot key over
  * `salts` shuffle partitions by giving the large side a content-derived
  * salt and replicating the small side across all salt values — results
  * are identical to the plain join, only the partitioning changes.
  */
object Skew {

  /** Inner equi-join of `large` with `small` on `key`, salted `salts`
    * ways. The salt for a large-side row is a hash of the whole row, so
    * rows sharing a hot key scatter uniformly; `small` is replicated
    * ×salts (keep it the dimension side). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n most frequent values of `key` with counts — the diagnostic
    * used to decide between AQE, salting, or dropping a template key
    * (cheap: one partial-aggregated count). */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).count().orderBy(col("count").desc, col("key")).limit(topN)
}
