package graft

/** The q693/q694 exactness ceilings, pinned as constructed boundary
  * tests instead of scaladoc prose (round-11 verdict item 7): each test
  * builds the synthetic magnitude where the REJECTED arithmetic path
  * breaks — BIGINT multiply wrap, decimal→long overflow-to-null,
  * decimal(38,0) product overflow — and asserts the path the queries
  * actually ship survives with the exact value.
  *
  * ANSI is off (reference parity, GraftSession), so the failure modes
  * are silent: longs WRAP and overflowing casts/products go NULL — the
  * worst kind of scale cliff, which is why these are tests, not
  * comments.
  */
class ScaleCeilingSpec extends SparkSpec {

  private def one(sql: String) = spark.sql(sql).collect().head

  test("q693 T-fold: the BIGINT div path wraps past s2² > 2⁶³ while the " +
    "decimal(38,0) subtract-remainder form stays exact") {
    // N ≈ 2.4·10⁶ rows ⇒ s2 ≈ 4·10⁹ doubled-rank mass: s2² = 1.6·10¹⁹
    // overflows BIGINT (2⁶³ ≈ 9.2·10¹⁸) — the ceiling the q693 comment
    // documents at ≈ sf0.3
    val s2 = BigInt("4000000000")
    val n = BigInt(1000)
    val exact = (s2 * s2 - (s2 * s2) % n) / n
    val r = one(s"""
      SELECT CAST((s2*s2 - (s2*s2) % n) / n AS DECIMAL(38,0)) AS dec_path,
             (s2l*s2l) div nl AS big_path
      FROM VALUES (CAST($s2 AS DECIMAL(38,0)), CAST($n AS DECIMAL(38,0)),
                   CAST($s2 AS BIGINT), CAST($n AS BIGINT))
        AS t(s2, n, s2l, nl)""")
    assert(BigInt(r.getDecimal(0).toBigInteger) == exact,
      "the shipped decimal path must carry the exact floor")
    // the rejected path: s2l*s2l wraps silently under ANSI-off
    assert(BigInt(r.getLong(1)) != exact,
      s"BIGINT div should have wrapped at this magnitude, got ${r.getLong(1)}")
  }

  test("q693 r2_sum: decimal→BIGINT cast WRAPS past 2⁶³ (the N ≈ 3.7·10⁹ " +
    "output-column ceiling) and is exact below it") {
    val below = BigInt(Long.MaxValue) - 1 // still representable
    val above = BigInt(Long.MaxValue) + 1 // one past the cliff
    val r = one(s"""
      SELECT CAST(CAST('$below' AS DECIMAL(38,0)) AS BIGINT) AS ok,
             CAST(CAST('$above' AS DECIMAL(38,0)) AS BIGINT) AS cliff""")
    assert(r.getLong(0) == below.toLong, "below the ceiling the cast is exact")
    // measured, not assumed: ANSI-off decimal→BIGINT overflow WRAPS to
    // Long.MinValue (it does NOT null) — the silent-wrong-value cliff
    // the r2_sum ceiling comment documents
    assert(r.getLong(1) == Long.MinValue,
      s"expected the ANSI-off wrap to Long.MinValue, got ${r.getLong(1)}")
  }

  test("q694 variance term vb = g3·t3: the exact decimal product " +
    "overflows decimal(38,0) near sf2-3 while the shipped per-factor " +
    "DOUBLE product stays finite and correctly rounded") {
    // factors ≈ 10²⁰ each: product 10⁴⁰ breaches decimal(38,0); both
    // factors are far below 2⁵³ · 2⁵³, and each CAST(... AS DOUBLE) is
    // exact to 1 ulp, so the IEEE product is the correctly rounded value
    val g3 = BigInt("100000000000000000000") // 10^20
    val t3 = BigInt("300000000000000000000") // 3·10^20
    val r = one(s"""
      SELECT CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE) AS ieee,
             g3 * t3 AS dec_product
      FROM VALUES (CAST('$g3' AS DECIMAL(38,0)),
                   CAST('$t3' AS DECIMAL(38,0))) AS t(g3, t3)""")
    assert(r.isNullAt(1),
      "the exact decimal product must overflow decimal(38,0) to NULL " +
        "at this magnitude — the breach the q694 comment documents")
    val ieee = r.getDouble(0)
    val exact = (BigDecimal(g3) * BigDecimal(t3)).toDouble // correctly rounded
    assert(ieee == exact && !ieee.isInfinite,
      "the shipped factor-by-factor DOUBLE product must be the correctly " +
        "rounded value where the decimal path is already dead")
  }

  test("q694 factors g3 ≈ N³/25 and t3 ≈ N³/120 individually fit " +
    "decimal(38,0) to N ≈ 10¹³ — the factor path's own ceiling is far out") {
    val n = BigInt(10).pow(13)
    val g3 = n.pow(3) / 25 // 4·10^37 — still inside decimal(38,0)
    val r = one(s"SELECT CAST('$g3' AS DECIMAL(38,0)) AS v")
    assert(BigInt(r.getDecimal(0).toBigInteger) == g3,
      "the factor must still be representable at N = 10¹³")
  }
}
