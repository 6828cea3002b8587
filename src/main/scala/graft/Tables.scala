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

  // One relation per (session, path): repeated `spark.read.parquet` calls
  // each fire a footer/listing job at CONSTRUCTION time, so 230+ query
  // builders over 10 tables would pay ~2 driver jobs apiece before any
  // action runs. Caching the DataFrame (plans are immutable) makes every
  // builder after the first a pure plan-graph construction — asserted by
  // the laziness gate in QueriesSmokeSpec. The outer map holds the
  // session by WEAK reference (reference-compared — SparkSession does
  // not override equals): identityHashCode keys are reused after GC, so
  // a long-lived multi-session process could both leak dead sessions'
  // plans and serve a new session another session's DataFrames.
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.configure(spark)
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet", spark.read.parquet(_))
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
