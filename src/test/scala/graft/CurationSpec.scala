package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate
import graft.operators.{Mixture, Packing}
import graft.text.{Redaction, TextAnalysis}

/** Semantics of the round-3 curation operators: PII redaction,
  * decontamination, sequence packing, mixture sampling, repetition
  * stats.
  */
class CurationSpec extends SparkSpec {

  test("redact removes every email and phone it counted") {
    import spark.implicits._
    val df = Seq(
      ("a", "mail me at jo.doe@site.org or call 12-345-678-9012 thanks"),
      ("b", "two mails x@ab.cd and y.z@e.fg, one phone 99-999-999-9999"),
      ("c", "nothing sensitive here"),
      ("d", "dots.and#hash@sub.domain.com trailing text")
    ).toDF("id", "t")
    val byId = df.select(
      col("id"),
      Redaction.emailCount(col("t")).as("e"),
      Redaction.phoneCount(col("t")).as("p"),
      Redaction.redact(col("t")).as("r"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(byId("a") === ((1, 1, "mail me at [EMAIL] or call [PHONE] thanks")))
    assert(byId("b") === ((2, 1, "two mails [EMAIL] and [EMAIL], one phone [PHONE]")))
    assert(byId("c") === ((0, 0, "nothing sensitive here")))
    assert(byId("d") === ((1, 0, "[EMAIL] trailing text")))
    // post-redaction text never matches either pattern again
    val residual = df.select(Redaction.redact(col("t")).as("r"))
      .select(Redaction.emailCount(col("r")) + Redaction.phoneCount(col("r")))
      .as[Int].collect().sum
    assert(residual === 0)
  }

  test("decontamination flags exactly the documents sharing an n-gram") {
    import spark.implicits._
    val bench = Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta epsilon y"), // contains the 5-gram
      (2L, "alpha beta gamma delta zeta"),        // only 4 shared tokens
      (3L, "completely different words here now five")
    ).toDF("doc_id", "text")
    val hits = Decontaminate.overlap(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(hits === Map(1L -> 1L))
  }

  test("packing: bins cut exactly at the budget, offsets carry over") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 500L), ("en", 4L, 100L),
      ("fr", 1L, 512L), ("fr", 2L, 1L)
    ).toDF("lang", "doc_id", "n_tokens").withColumn("shard", lit(0))
    val out = Packing.packByRunningSum(df, Seq("lang", "shard"), "doc_id", "n_tokens", 512)
      .select("lang", "doc_id", "bin", "bin_offset")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("en", 1L, 0L, 0L),    // starts bin 0 offset 0
      ("en", 2L, 0L, 300L),  // 300 tokens in, straddles into bin 1
      ("en", 3L, 1L, 88L),   // starts at 600 = bin 1, offset 88
      ("en", 4L, 2L, 76L),   // starts at 1100 = bin 2, offset 76
      ("fr", 1L, 0L, 0L),
      ("fr", 2L, 1L, 0L)))   // previous doc filled bin 0 exactly
  }

  test("mixture sampling: targets follow sqrt weights, sample is deterministic") {
    import spark.implicits._
    // source a: 900 docs, source b: 100 docs → sqrt weights 30:10, so a
    // 200-doc draw targets 150/50 — temperature flattening in action:
    // natural proportions would give 180/20.
    val docs = spark.range(1000).select(
      col("id").as("doc_id"),
      when(col("id") < 900, "a").otherwise("b").as("source"))
    val t = Mixture.sourceTargets(docs, "source", 200L)
      .select("source", "target_n").as[(String, Long)].collect().toMap
    assert(t("a") === 150L && t("b") === 50L)
    val s1 = Mixture.sample(docs, "source", col("doc_id"), 200L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Mixture.sample(docs, "source", col("doc_id"), 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "sample must be reproducible")
    // expected counts hit within ±40% per source (hash threshold is
    // exact-in-expectation, not exact-count)
    val bySource = docs.filter(col("doc_id").isin(s1.toSeq: _*))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(bySource("a") - 150L) <= 60, s"a sampled ${bySource("a")}")
    assert(math.abs(bySource("b") - 50L) <= 20, s"b sampled ${bySource("b")}")
  }

  test("incremental merge: associative, order-insensitive, equals full recompute") {
    import spark.implicits._
    import graft.operators.Incremental
    val rows = (1L to 300L).map(i => (s"g${i % 7}", i))
    val df = rows.toDF("g", "cents")
    val full = Incremental.aggState(df, "g", "cents")
      .as[(String, Long, Long)].collect().toSet
    // three disjoint batches, merged in two different orders
    val parts = Seq(df.filter(col("cents") % 3 === 0), df.filter(col("cents") % 3 === 1),
      df.filter(col("cents") % 3 === 2)).map(Incremental.aggState(_, "g", "cents"))
    val m1 = Incremental.merge(parts).as[(String, Long, Long)].collect().toSet
    val m2 = Incremental.merge(parts.reverse).as[(String, Long, Long)].collect().toSet
    // merging an already-merged state with another state also works
    val m3 = Incremental.merge(Seq(Incremental.merge(parts.take(2)), parts(2)))
      .as[(String, Long, Long)].collect().toSet
    assert(m1 === full); assert(m2 === full); assert(m3 === full)
  }

  test("integer outlier test agrees with the double z-score form away from ties") {
    import spark.implicits._
    // the decimal cross-multiplied test must flag exactly the rows the
    // textbook |x-mu| > 3*sigma flags on data with a clear outlier
    val xs = Seq.fill(200)(100L) ++ Seq(1000L, 99L, 101L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val m = df.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val flagged = df.crossJoin(m)
      .filter((d(col("n")) * d(col("x")) - d(col("sx"))) *
        (d(col("n")) * d(col("x")) - d(col("sx"))) >
        lit(9) * (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
      .select("x").as[Long].collect().toSet
    assert(flagged === Set(1000L))
  }

  test("repetition stats: degenerate repetition scores high, varied text low") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),       // one bigram repeated
      (2L, "the quick brown fox jumps over dogs"), // all distinct
      (3L, "one")                                  // < 2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._3 === 5.0 / 6.0)  // 6 tokens, 1 distinct
    assert(out(1L)._4 === 1.0)        // every bigram is "spam spam"
    assert(out(2L)._3 === 0.0)
    assert(out(2L)._4 === 1.0 / 6.0)  // 6 bigrams, all unique
  }

  // ---------------------------------------------------------------- q214

  test("langid confusion PRF matches driver-side confusion-matrix algebra") {
    val sfDir = "/root/testdata/sf0.001"
    val preds = SparkEntry.queries("q26_text_langid")(spark, sfDir)
      .selectExpr("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val declared = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = declared.map(_._2).distinct.sorted.toSeq.map { c =>
      val tp = declared.count { case (id, l) => l == c && preds(id) == c }.toLong
      val fp = declared.count { case (id, l) => l != c && preds(id) == c }.toLong
      val fn = declared.count { case (id, l) => l == c && preds(id) != c }.toLong
      def ppm(num: Long, den: Long) = if (den == 0) None else Some(num * 1000000L / den)
      (c, tp, fp, fn, ppm(tp, tp + fp), ppm(tp, tp + fn), ppm(2 * tp, 2 * tp + fp + fn))
    }
    val got = SparkEntry.queries("q214_langid_confusion")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q215

  test("log2 length histogram matches driver-side bit-length buckets") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs
      .map { case (s, n) => (s, (63 - java.lang.Long.numberOfLeadingZeros(n)).toLong, n) }
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((s, b), xs) => (s, b, xs.length.toLong, xs.map(_._3).sum) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q215_log2_length_histogram")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // doubling buckets: every doc length satisfies 2^b <= n < 2^(b+1)
    got.foreach { case (_, b, _, _) => assert(b >= 0 && b < 63) }
  }
}
