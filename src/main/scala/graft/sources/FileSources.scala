package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file sources/sinks beyond parquet: CSV, JSON-lines, ORC.
  *
  * Readers take an explicit schema — at 100 TB schema inference is a
  * full extra pass over the data; an engine never infers in production.
  * CSV/JSON land as row formats for interchange; ORC/parquet are the
  * columnar formats that support pushdown and pruning (reflected in
  * `.explain`: PushedFilters appear for orc/parquet scans only).
  */
object FileSources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Streaming file source: picks up files dropped into `path` (the
    * no-broker substitute for the Kafka source in offline environments). */
  def streamJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCol`. The repartition-on-key before the write gives ONE file
    * per partition value instead of numShufflePartitions × values small
    * files — the small-file explosion is the classic partitioned-write
    * mistake at scale. Reads that filter on `partCol` prune whole
    * directories before any IO (`PartitionFilters` in the scan,
    * asserted by LayoutSpec). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Sort the rows of each output file by `sortCols` before writing:
    * parquet row-group min/max statistics then make selective filters
    * skip row groups (`PushedFilters` actually prune IO, not just rows).
    * Use a Z-order key (graft.functions.expressions.zorder_key) as the
    * sort column to get locality in TWO dimensions at once. */
  def writeSorted(df: DataFrame, path: String,
                  sortCols: Seq[org.apache.spark.sql.Column]): Unit =
    df.sortWithinPartitions(sortCols: _*).write.mode("overwrite").parquet(path)
}
