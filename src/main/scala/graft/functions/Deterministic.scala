package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-for-bit deterministic numeric helpers.
  *
  * The correctness gate hash-compares Spark results against a DuckDB
  * oracle, so every verified column must be byte-identical across two
  * independent engines. Floating-point *sums* are order-dependent and
  * engine double→decimal casts round differently (Spark goes through the
  * shortest decimal representation, DuckDB rounds the true binary value),
  * so aggregate money math is done on exact integer cents:
  *
  *   cents(x)   = floor(x*100 + 0.5)  — identical IEEE ops in both engines
  *   sum(cents) — exact 64-bit integer, order-independent
  *   /100.0     — one correctly-rounded IEEE division at the end
  *
  * This is also the right 100 TB answer: a 64-bit integer partial sum is
  * cheaper to shuffle and spill than a 128-bit decimal, and map-side
  * partial aggregation stays exact.
  */
object Deterministic {

  /** Exact integer cents of a 2-decimal-valued double column. */
  def cents(c: Column): Column = floor(c * lit(100d) + lit(0.5d)).cast("long")

  /** Order-independent sum of a 2-decimal column, returned as double. */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / lit(100d)

  /** Order-independent mean of a 2-decimal column, returned as double.
    * Oracle form: (CAST(sum(...) AS DOUBLE)/100)/count(*) — same op order. */
  def moneyAvg(c: Column): Column =
    (sum(cents(c)).cast("double") / lit(100d)) / count(lit(1))

  /** Timestamp → epoch seconds (verified outputs avoid raw timestamp
    * columns; epoch seconds compare exactly across engines). The parquet
    * tables' unadjusted timestamps arrive as TIMESTAMP_NTZ, which ANSI
    * mode won't cast straight to long — go through TimestampType (UTC
    * session ⇒ same instant DuckDB computes for the naive value). */
  def epochS(c: Column): Column = c.cast("timestamp").cast("long")
}
