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
