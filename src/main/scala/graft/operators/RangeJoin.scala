package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable range (interval) joins.
  *
  * Spark has no native range-join operator: a join whose only condition
  * is `lo <= t AND t < hi` plans as a nested-loop join — O(points ×
  * intervals), a non-starter at scale. The standard fix (the same trick
  * behind Databricks' range-join hints and KDB's window joins) is to
  * quantize time into fixed-width bins, turn the range condition into an
  * equi-join on the bin id, and re-check the exact range as a residual
  * filter:
  *
  *  - each point lands in exactly ONE bin — no duplication of the fact
  *    side, and each matching pair appears exactly once
  *  - each interval is replicated into the ~(len/binWidth + 1) bins it
  *    overlaps — choose binWidth near the typical interval length so the
  *    replication factor stays ~2
  *  - the join is then a plain equi-join on (bin, keys): hash/sort-merge
  *    planable, AQE-optimizable, salting-composable — all the machinery
  *    a 100 TB shuffle needs, none of which a nested loop gets
  */
object RangeJoin {

  /** Inner join of `points` (long column `tCol`) with `intervals`
    * (half-open [loCol, hiCol), long columns), optionally with extra
    * equi `keys`. Assumes non-negative epoch-style values (bin ids are
    * computed with exact double floor-division — |t| < 2^53). Returns
    * one row per (point, containing interval) pair with both sides'
    * columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tCol: String, loCol: String, hiCol: String,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin",
      floor(col(tCol) / lit(binWidth.toDouble)).cast("long"))
    val ib = intervals
      .filter(col(hiCol) > col(loCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / lit(binWidth.toDouble)).cast("long"),
        floor((col(hiCol) - 1) / lit(binWidth.toDouble)).cast("long"))))
    pb.join(ib, Seq("__bin") ++ keys)
      .filter(col(tCol) >= col(loCol) && col(tCol) < col(hiCol))
      .drop("__bin")
  }
}
