package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Canary for the local correctness stand-in's oracle-type gate
  * (tools/compare.py): DuckDB silently widens sum(BIGINT) and bigint
  * products to HUGEINT (int128). The driver's hasher canonicalizes int128
  * differently from the int64 the Spark side writes, so such oracles ship
  * value-identical yet driver hash-red (32 queries did exactly that in
  * round 4). The gate DESCRIBEs every oracle and fails loudly on any
  * HUGEINT/UHUGEINT/UBIGINT/DECIMAL output column BEFORE hashing; these
  * tests prove it catches the defect class and passes clean oracles.
  *
  * The intentionally-HUGEINT query lives HERE, not in SparkEntry.queries —
  * it must never reach the driver.
  */
class OracleTypeGateSpec extends SparkSpec {

  private val repoRoot = sys.props.getOrElse("user.dir", ".")
  private val sfDir = "/root/testdata/sf0.001"

  private def haveDuckdb: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Throwable => false }

  private def runGate(outDir: String): (Int, String) = {
    val buf = new StringBuilder
    val logger = ProcessLogger(l => buf.append(l).append('\n'), l => buf.append(l).append('\n'))
    val code = Seq("python3", s"$repoRoot/tools/compare.py", outDir, sfDir).!(logger)
    (code, buf.toString)
  }

  private def writeFixture(name: String, oracle: String, sparkSql: String): String = {
    val dir = Files.createTempDirectory("gate").toString
    spark.sql(sparkSql).coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    val json = s"""{"$name": "${oracle.replace("\"", "\\\"")}"}"""
    Files.writeString(Paths.get(s"$dir/oracle_sql.json"), json)
    dir
  }

  test("gate FAILS an int128-widening oracle even when values match") {
    assume(haveDuckdb, "python3+duckdb not on PATH (driver-side tooling)")
    // sum(BIGINT) -> HUGEINT in DuckDB; the Spark side emits int64 with the
    // same VALUE, which is exactly the r4 defect the gate must catch
    val dir = writeFixture(
      "q_canary_hugeint",
      "SELECT sum(CAST(r_regionkey AS BIGINT)) AS s FROM region",
      "SELECT CAST(10 AS LONG) AS s")
    val (code, out) = runGate(dir)
    assert(code != 0, s"gate accepted a HUGEINT oracle:\n$out")
    assert(out.contains("driver-unhashable wide types"), out)
    assert(out.contains("HUGEINT"), out)
  }

  test("gate PASSES the same oracle once the final column is cast to BIGINT") {
    assume(haveDuckdb, "python3+duckdb not on PATH (driver-side tooling)")
    val dir = writeFixture(
      "q_canary_cast",
      "SELECT CAST(sum(CAST(r_regionkey AS BIGINT)) AS BIGINT) AS s FROM region",
      "SELECT CAST(10 AS LONG) AS s")
    val (code, out) = runGate(dir)
    assert(code == 0, s"gate rejected a clean BIGINT oracle:\n$out")
    assert(out.contains("PASS q_canary_cast"), out)
  }

  test("gate FAILS on same-name columns with diverging types") {
    assume(haveDuckdb, "python3+duckdb not on PATH (driver-side tooling)")
    // Spark side writes INTEGER where the oracle emits BIGINT: values hash
    // identically under the local str() canon but not under the driver's
    val dir = writeFixture(
      "q_canary_typediff",
      "SELECT CAST(10 AS BIGINT) AS s",
      "SELECT CAST(10 AS INT) AS s")
    val (code, out) = runGate(dir)
    assert(code != 0, s"gate accepted diverging column types:\n$out")
    assert(out.contains("type mismatch"), out)
  }
}
