package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.FileSources

/** Source-format round trips: parquet → {csv, json, orc} → read back with
  * explicit schema → aggregate. The oracle aggregates the parquet
  * directly, so a hash match proves the write+read round trip is
  * lossless. Only integer/string columns travel (float/timestamp text
  * round-trips are format-lossy by design — columnar formats exist for a
  * reason). */
object SourceQueries extends QueryGroup {

  private val roundtripSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("qty_cents", LongType),
    StructField("l_returnflag", StringType)))

  /** lineitem projected to exact integer/string columns. */
  private def slice(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_quantity") * lit(100d) + lit(0.5d)).as("qty_cents"),
      col("l_returnflag"))

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qty_cents")).as("total_qty_cents"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")

  private val oracleAgg = """
      SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_qty_cents,
        count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag
    """

  private def roundtrip(fmt: String) = QueryDef(
    s"q34_${fmt}_source_roundtrip",
    (spark, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip_$fmt"
      val data = slice(spark, dir)
      val back = fmt match {
        case "csv" =>
          FileSources.writeCsv(data, path)
          FileSources.readCsv(spark, path, roundtripSchema)
        case "json" =>
          FileSources.writeJsonLines(data, path)
          FileSources.readJsonLines(spark, path, roundtripSchema)
        case "orc" =>
          FileSources.writeOrc(data, path)
          FileSources.readOrc(spark, path)
      }
      aggregate(back)
    },
    Some(oracleAgg))

  def defs: Seq[QueryDef] = Seq(roundtrip("csv"), roundtrip("json"), roundtrip("orc"))
}
