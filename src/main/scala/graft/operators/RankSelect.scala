package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentile selection over near-continuous integer
  * values, scale-safely.
  *
  * The naive exact method — cumulative window over the (group, value)
  * histogram — degenerates when values are near-continuous (prices in
  * cents): the histogram is as big as the data and the window sorts it
  * inside |groups| partitions, so 3 groups at 100 TB means 3 tasks each
  * sorting a third of the corpus.
  *
  * This operator does TWO-LEVEL rank selection instead (the q100
  * pattern): a coarse histogram of `binWidth`-wide bins locates the bin
  * holding each requested percentile (cumulative window over bins —
  * thousands of rows, not billions), then ONLY the rows inside the
  * selected bins get exact refinement (a window over ~|bins selected| /
  * |bins| of the data, partitioned by (group, bin)). Selection uses the
  * discrete test cum·10⁴ ≥ bp·n in 64-bit integers, so the thresholds
  * are identical to the single-pass form bit-for-bit.
  *
  * Input `df` must expose integer columns named by `groupCol` and
  * `valueCol`. Returns one row per group: (groupCol, n, p_<bp> per
  * requested basis point), where p_<bp> is the smallest value whose
  * cumulative count reaches bp/10⁴ of the group.
  */
object RankSelect {

  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  bps: Seq[Int], binWidth: Long): DataFrame = {
    require(bps.nonEmpty && bps.forall(bp => bp > 0 && bp <= 10000),
      s"basis points must lie in (0, 10000]: $bps")
    require(binWidth > 0, "binWidth must be positive")
    val g = col(groupCol)
    val x = col(valueCol)

    val coarse = df.groupBy(g, expr(s"$valueCol DIV $binWidth").as("xb"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(g).orderBy(col("xb"))
    val wAll = Window.partitionBy(g)
    val cum1 = coarse
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))

    val binCols = bps.map(bp =>
      min(when(col("cum") * 10000 >= lit(bp) * col("n"), col("xb"))).as(s"bin_$bp"))
    val binsel = cum1.groupBy(g).agg(binCols.head, binCols.tail: _*)

    val preCols = bps.map(bp =>
      max(when(col("xb") === col(s"bin_$bp"), col("cum") - col("cnt"))).as(s"before_$bp")) ++
      bps.map(bp => max(col(s"bin_$bp")).as(s"bin_$bp")) :+
      max(col("n")).as("n")
    val pre = cum1.join(broadcast(binsel), Seq(groupCol))
      .groupBy(g)
      .agg(preCols.head, preCols.tail: _*)

    val inSelected = bps.map(bp => col("xb") === col(s"bin_$bp")).reduce(_ || _)
    val wBin = Window.partitionBy(g, col("xb")).orderBy(x)
    val carried = Seq(col("xb"), x) ++
      bps.flatMap(bp => Seq(col(s"bin_$bp"), col(s"before_$bp"))) :+ col("n")
    df.join(broadcast(pre), Seq(groupCol))
      .withColumn("xb", expr(s"$valueCol DIV $binWidth"))
      .filter(inSelected)
      .groupBy(g +: carried: _*)
      .agg(count(lit(1)).as("c2"))
      .withColumn("cumin", sum(col("c2")).over(wBin))
      .groupBy(g)
      .agg(max(col("n")).as("n"),
        bps.map(bp =>
          min(when(col("xb") === col(s"bin_$bp") &&
            (col(s"before_$bp") + col("cumin")) * 10000 >= lit(bp) * col("n"), x))
            .as(s"p_$bp")): _*)
  }
}
