package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation over a scale-factor
  * directory, plus (when SQL-expressible) the equivalent DuckDB oracle SQL
  * the driver hash-compares against.
  *
  * Conventions that make the hash compare byte-exact (see
  * graft.functions.Deterministic):
  *  - every output column explicitly aliased; identical names both sides
  *  - deterministic total ORDER BY in both implementations
  *  - no raw timestamps out (epoch seconds instead), no double→string,
  *    no order-dependent double sums
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def defs: Seq[QueryDef]
}

/** SQL text macros shared across query modules and their oracles —
  * defined once so the Spark and DuckDB forms cannot drift (the
  * graph.Backbone discipline for scalar expressions). */
object SqlMacros {
  /** Exact integer square root, ±1-corrected: floor(sqrt(v)) computed
    * via libm double sqrt, then nudged so the result r satisfies
    * r² ≤ v < (r+1)² EXACTLY — identical on any engine regardless of
    * the platform's sqrt rounding at perfect-square boundaries (the
    * floor(log2) lesson). Both Spark SQL and DuckDB accept this text
    * verbatim. */
  def isqrt(v: String): String =
    s"""(CASE
        WHEN (CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) + 1)
           * (CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) + 1) <= ($v)
          THEN CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) + 1
        WHEN CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT)
           * CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) > ($v)
          THEN CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) - 1
        ELSE CAST(floor(sqrt(CAST(($v) AS DOUBLE))) AS BIGINT) END)"""
}
