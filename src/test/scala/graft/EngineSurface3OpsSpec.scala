package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 engine-surface batch 3: _metadata
  * provenance (q728), AES quarantine (q729), dynamic-gap sessions
  * (q730), try_to_number codec (q731). */
class EngineSurface3OpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q728: row_index is a contiguous 0..N-1 ramp and doc ids are unique") {
    val r = run("q728_file_provenance_metadata").collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_rows")
    assert(row.getAs[String]("fname") == "documents.parquet")
    assert(row.getAs[Long]("ri_min") == 0L)
    assert(row.getAs[Long]("ri_max") == n - 1)
    assert(row.getAs[Long]("ri_sum") == n * (n - 1) / 2,
      "row_index has a gap or a duplicate — file provenance broken")
    assert(row.getAs[Long]("n_docs") == n)
  }

  test("q729: ciphertext is never plaintext, follows PKCS#7 length law, " +
    "and a wrong key does NOT decrypt") {
    val rows = run("q729_aes_column_quarantine").collect()
    assert(rows.length == 5)
    for (r <- rows) assert(r.getAs[Long]("n_roundtrip_ok") == r.getAs[Long]("n"))
    // independent: ciphertext bytes differ from plaintext; wrong key fails
    val probe = Tables.events(spark, sfMid).limit(100)
      .select(col("props"),
        expr("aes_encrypt(props, '0123456789abcdef', 'ECB')").as("c"))
      .select(
        (expr("CAST(c AS STRING)") === col("props")).cast("long").as("leak"),
        expr("try_aes_decrypt(c, 'fedcba9876543210', 'ECB')").isNull
          .cast("long").as("wrong_key_rejected"))
      .agg(sum(col("leak")).as("leaks"),
        sum(col("wrong_key_rejected")).as("rej"))
      .collect().head
    assert(probe.getAs[Long]("leaks") == 0L, "ciphertext equals plaintext")
    assert(probe.getAs[Long]("rej") == 100L,
      "a wrong key decrypted successfully — not AES")
  }

  test("q730: dynamic gaps produce MORE sessions than a uniform 30-minute " +
    "gap and fewer than a uniform 5-minute gap") {
    val dyn = run("q730_dynamic_gap_sessions").collect()
      .map(r => r.getAs[Long]("session_size") -> r.getAs[Long]("n_sessions"))
    val dynTotal = dyn.map(_._2).sum
    def uniform(gap: String) = Tables.events(spark, sfMid)
      .select(col("user_id"), col("ts").cast("timestamp").as("t"))
      .groupBy(session_window(col("t"), gap), col("user_id"))
      .agg(count(lit(1))).count()
    val wide = uniform("30 minutes")
    val tight = uniform("5 minutes")
    assert(dynTotal >= wide, s"dynamic ($dynTotal) < uniform-30m ($wide)")
    assert(dynTotal <= tight, s"dynamic ($dynTotal) > uniform-5m ($tight)")
    assert(dynTotal > wide && dynTotal < tight,
      "dynamic gap indistinguishable from a uniform gap — the per-event " +
        "expression did nothing")
    // event mass is conserved through sessionization
    val events = Tables.events(spark, sfMid).count()
    assert(dyn.map { case (sz, n) => sz * n }.sum == events)
  }

  test("q731: the codec conserves mass — recovered cents equal the " +
    "uncorrupted slice exactly, null rate equals corruption rate") {
    val rows = run("q731_try_to_number_codec").collect()
    assert(rows.length == 5)
    val direct = Tables.orders(spark, sfMid)
      .select(col("o_orderpriority").as("p"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        (col("o_orderkey") % 7L === 0L).cast("long").as("bad"))
      .groupBy(col("p"))
      .agg(sum(when(col("bad") === 0L, col("cents")).otherwise(0L)).as("cs"),
        sum(col("bad")).as("nb"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    for (r <- rows) {
      val (cs, nb, n) = direct(r.getAs[String]("priority"))
      assert(r.getAs[Long]("cents_recovered") == cs, "codec lost cents")
      assert(r.getAs[Long]("n_bad") == nb)
      assert(r.getAs[Long]("n_exact") == n - nb,
        "a surviving cell failed the exact round trip")
    }
  }
}
