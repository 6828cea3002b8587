package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-partition fact tables on their join key
  * so repeated joins/aggregations on that key skip the exchange entirely.
  *
  * At 100 TB the shuffle for a fact⋈fact join is usually the single
  * largest cost in the pipeline; bucketing pays it once at write time and
  * amortizes it over every subsequent query. Verified by BucketingSpec:
  * the join plan over two co-bucketed tables contains no
  * `Exchange hashpartitioning`.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plans as a
    * sort-merge join with zero shuffle when bucket counts match. */
  def cobucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                     key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
