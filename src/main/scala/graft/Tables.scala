package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loaders take the scale-factor directory so the same query code runs
  * at any SF. Reads are plain `spark.read.parquet` — column pruning and
  * predicate pushdown happen in the caller's plan and reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with its TIMESTAMP(NANOS) column converted to a proper
    * microsecond TimestampType column (floor division, matching how
    * nanos-unaware readers like DuckDB truncate).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    // With nanosAsLong=true the ts column arrives as LongType nanoseconds.
    raw.schema("ts").dataType.typeName match {
      // integer division: Column./ is double division, which at 2^60-ns
      // magnitudes rounds by up to ~128 ns and can floor to the wrong µs
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _      => raw // already a timestamp (future-proofing)
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
