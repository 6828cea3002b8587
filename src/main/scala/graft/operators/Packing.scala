package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-size context windows the
  * way LLM pretraining does — concatenate documents in a deterministic
  * order and cut every `budget` tokens, so each document is tagged with
  * the bin it STARTS in and its token offset inside that bin.
  *
  * Scale design: packing is embarrassingly parallel across independent
  * streams; the running-sum window only ever sorts WITHIN a
  * (group, shard) cell, never globally. The shard column is the
  * parallelism dial — at 100 TB you shard each language into thousands of
  * cells (deterministically, by key hash), each cell packs independently
  * in one task, and no single task ever sees more than corpus/shards
  * tokens. A global ORDER BY over the corpus — the naive formulation —
  * would serialize the entire table through one sort; this never does.
  */
object Packing {

  /** Adds `bin` (which context window the document starts in) and
    * `bin_offset` (token offset inside that bin) per (groupCols) cell,
    * ordering documents by `orderCol` within the cell. `tokenCol` is the
    * document's token count. */
  def packByRunningSum(df: DataFrame, groupCols: Seq[String], orderCol: String,
                       tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val startOffset = sum(col(tokenCol)).over(w) - col(tokenCol)
    // integer floor division (startOffset is non-negative): Column/Int
    // would promote to double, which is exact only below 2^53 cumulative
    // tokens and can disagree with the exact integer `%` near that edge
    df.withColumn("__start_off", startOffset.cast("long"))
      .withColumn("bin", expr(s"__start_off div $budget"))
      .withColumn("bin_offset", expr(s"__start_off % $budget"))
      .drop("__start_off")
  }
}
