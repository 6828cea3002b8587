package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.Stateful

/** The ingest-side composition claim: the SAME operator code that is
  * oracle-verified in batch (decode, quality, dedup, normalization) runs
  * unchanged over streams — documents and binary assets arriving on a
  * stream flow through the identical column expressions / mapPartitions.
  */
class StreamingIngestSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String, event_timestamp: java.sql.Timestamp)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("multimodal decode + feature extraction run on a stream unchanged") {
    import spark.implicits._
    val input = MemoryStream[Doc](spark)
    val assets = Multimodal.assetsFromText(input.toDF(), "doc_id", "text")
    val metas = Multimodal.decodeAssets(assets)
    val q = metas.writeStream.format("memory").queryName("stream_decode")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1L, "spark streams binary assets", ts("2024-01-01 10:00:00")),
        Doc(2L, "decode happens per batch", ts("2024-01-01 10:00:01")),
        Doc(3L, "same operator as batch", ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      val rows = spark.table("stream_decode")
        .select("asset_id", "kind", "n_bytes", "width")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      assert(rows.length === 3)
      assert(rows.map(_._2).toSet.subsetOf(Set("image", "audio", "video")))
      // decode equals the batch path bit-for-bit (same stub codec)
      val batch = Multimodal.decodeAssets(
        Multimodal.assetsFromText(
          Seq((1L, "spark streams binary assets")).toDF("doc_id", "text"), "doc_id", "text"))
        .select("width").as[Long].head()
      assert(rows.head._4 === batch)
    } finally q.stop()
  }

  test("streaming LLM-funnel front: normalize + quality filter + stream dedup") {
    import spark.implicits._
    val input = MemoryStream[Doc](spark)
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val cleaned = input.toDF()
      .withColumn("t", norm)
      .withColumn("fp", graft.functions.expressions.text_fingerprint(col("t")))
      .filter(graft.functions.expressions.token_count(col("t")) >= 3)
    val deduped = Stateful.dedupStream(cleaned, Seq("fp"), "event_timestamp", "10 minutes")
      .select(col("doc_id"), col("t"))
    val q = deduped.writeStream.format("memory").queryName("stream_funnel")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1L, "The Quick, Brown Fox!", ts("2024-01-01 10:00:00")),
        Doc(2L, "the quick brown fox", ts("2024-01-01 10:00:05")), // dup after normalize
        Doc(3L, "too short", ts("2024-01-01 10:00:06")),           // < 3 tokens → dropped
        Doc(4L, "a different document entirely", ts("2024-01-01 10:00:07")))
      q.processAllAvailable()
      val kept = spark.table("stream_funnel").select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept === Seq(1L, 4L), s"normalize-dedup should drop 2 (dup) and 3 (short), got $kept")
    } finally q.stop()
  }

  test("PII redaction runs on a stream unchanged, batch-identical") {
    import spark.implicits._
    import graft.text.Redaction
    val input = MemoryStream[Doc](spark)
    val redacted = input.toDF()
      .select(col("doc_id"),
        Redaction.redact(col("text")).as("clean"),
        (Redaction.emailCount(col("text")) + Redaction.phoneCount(col("text")))
          .as("n_hits"))
    val q = redacted.writeStream.format("memory").queryName("stream_redact")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1L, "contact me jo@site.org or 12-345-678-9012", ts("2024-01-01 10:00:00")),
        Doc(2L, "no pii here", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      val rows = spark.table("stream_redact")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(rows === Seq(
        (1L, "contact me [EMAIL] or [PHONE]", 2),
        (2L, "no pii here", 0)))
    } finally q.stop()
  }
}
