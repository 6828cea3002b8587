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

  /** Schema-evolution union surface: a v1 event feed (no channel column)
    * and a v2 feed (adds `channel`) merged with
    * `unionByName(allowMissingColumns = true)` — positional `union`
    * would misalign or reject; BY NAME pads the missing column with
    * null, and the null bucket IS the legacy cohort. The everyday
    * schema-drift merge every long-lived pipeline hits.
    *
    * Scale shape: the union is a zero-shuffle concatenation of two
    * filtered projections of one scan; only the final channel rollup
    * shuffles. */
  private val q196 = QueryDef(
    "q196_union_by_name",
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT)").as("ts_s"),
          expr("CAST(floor(value*100 + 0.5) AS BIGINT)").as("vc"),
          col("event_type"))
      val v1 = e.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts_s"), col("vc"))
      val v2 = e.filter(col("event_id") % 2 === 1)
        .select(col("user_id"), col("ts_s"), col("vc"),
          col("event_type").as("channel"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(coalesce(col("channel"), lit("legacy")).as("channel"))
        .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("value_cents"))
        .orderBy(col("channel"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id,
          CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_s,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS vc,
          event_type
        FROM events),
      v1 AS (SELECT user_id, ts_s, vc FROM e WHERE event_id % 2 = 0),
      v2 AS (SELECT user_id, ts_s, vc, event_type AS channel
             FROM e WHERE event_id % 2 = 1),
      u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
      SELECT coalesce(channel, 'legacy') AS channel,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(vc) AS BIGINT) AS value_cents
      FROM u GROUP BY 1 ORDER BY channel
    """))

  def defs: Seq[QueryDef] =
    Seq(roundtrip("csv"), roundtrip("json"), roundtrip("orc"), q196)
}
