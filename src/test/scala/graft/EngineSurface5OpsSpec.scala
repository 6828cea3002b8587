package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 engine-surface batch 6: luhn_check (q739),
  * Shannon code budget (q740), try_cast type sniffing (q741). */
class EngineSurface5OpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  private def luhn(s: String): Boolean = {
    val digits = s.reverse.map(_ - '0')
    val total = digits.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    total % 10 == 0
  }

  test("q739: luhn_check agrees with a Scala reimplementation and sits " +
    "near the 10% noise floor") {
    val rows = run("q739_luhn_pii_filter").collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("n")).sum
    val valid = rows.map(_.getAs[Long]("n_luhn_valid")).sum
    // a uniform random last digit passes 1 in 10 — synthetic candidates
    // should hover there (binomial 3 sigma on n trials)
    val sigma3 = 3 * math.sqrt(n * 0.09)
    assert(math.abs(valid - n / 10.0) <= sigma3,
      s"valid=$valid of $n is off the 10% noise floor")
    val replay = Tables.customer(spark, sfMid)
      .select(col("c_mktsegment"),
        lpad(expr("CAST((c_custkey * 2654435761) % 10000000000000000 " +
          "AS STRING)"), 16, "0").as("s"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.count(r => luhn(r.getString(1))).toLong).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n_luhn_valid") == replay(r.getAs[String]("segment")),
        s"luhn_check drifted for ${r.getAs[String]("segment")}")
  }

  test("q740: code lengths are feasible (Kraft <= 1) and beat the " +
    "uncoded baseline; length law verified per token") {
    val rows = run("q740_shannon_code_budget").collect()
    val kraft = rows.map(_.getAs[Long]("kraft_mu")).sum
    assert(kraft <= 1048576L, s"Kraft sum $kraft > 2^20 — not a prefix code")
    val mass = rows.map(_.getAs[Long]("mass")).sum
    val bits = rows.map(_.getAs[Long]("encoded_bits")).sum
    // Shannon lengths beat the fixed-width 8-bit-per-CHAR baseline by
    // miles; even vs 8 bits per TOKEN they must win on this skewed vocab
    assert(bits < mass * 8, "coding plan worse than one byte per token")
    // per-token law: L = ceil(log2(N/f)) exactly
    val vocab = Tables.documents(spark, sfMid)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(_.getLong(1))
    val n = vocab.sum
    val expected = vocab.groupBy { f =>
      val m = (n + f - 1) / f
      if (m == 1) 0L else 64L - java.lang.Long.numberOfLeadingZeros(m - 1)
    }.view.mapValues(_.length.toLong).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n_tokens") == expected(r.getAs[Long]("len")),
        s"bin() length law broke at len ${r.getAs[Long]("len")}")
  }

  test("q741: every vote is exclusive, the census covers all rows, and " +
    "each case lands in its intended type") {
    val rows = run("q741_try_cast_type_sniffing").collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val parts = Seq("n_int", "n_date", "n_double", "n_bool", "n_text")
        .map(r.getAs[Long])
      assert(parts.sum == r.getAs[Long]("n"), "votes not a partition")
      assert(parts.forall(_ >= 0))
      // the 5-way selector gives every source all five cases
      assert(parts.forall(_ > 0),
        s"${r.getAs[String]("source")} missed a type class entirely")
    }
  }
}
