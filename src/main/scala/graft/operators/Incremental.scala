package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates: keep a base
  * aggregate table current by merging in each new batch's partial
  * aggregate, instead of recomputing over the full history.
  *
  * Correct for any commutative-monoid aggregate state — here
  * (count, sum) pairs, which also recover avg at read time. The merge
  * is a groupBy over the union of two ALREADY-AGGREGATED tables, so its
  * cost is O(|groups|), independent of history size: the 100 TB of
  * history is never rescanned, which is the entire point. The verified
  * query (q84) asserts the maintained view is bit-identical to the
  * full recompute.
  */
object Incremental {

  /** Per-group additive state: (group, n, sum_cents) — the partial the
    * base table stores and each delta batch produces. */
  def aggState(df: DataFrame, groupCol: String, centsCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(centsCol)).as("sum_cents"))

  /** Merge any number of additive states into one — groups present in
    * several inputs combine, groups in only one pass through. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_ union _)
      .groupBy(col(states.head.columns.head))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
  }
}
