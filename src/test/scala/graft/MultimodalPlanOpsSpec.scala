package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-8 multimodal batch (q660–q661) beyond the
  * oracle gate: the modality pipeline's shape invariants. */
class MultimodalPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q660: 3 ranked hits per modality, scores descending, probe excluded") {
    val rows = run("q660_multimodal_feature_ann").collect()
    assert(rows.length == 9)
    assert(rows.map(_.getAs[String]("kind")).distinct.sorted.toSeq
      == Seq("audio", "image", "video"))
    rows.groupBy(_.getAs[String]("kind")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      assert(byRank.map(_.getAs[Long]("dot")).sliding(2)
        .forall(p => p(0) >= p(1)))
    }
    assert(rows.forall(_.getAs[Long]("asset_id") != 0L), "probe retrieved itself")
  }

  test("q661: frame counts conserve the closed-form slice count") {
    val rows = run("q661_frame_dedup_census").collect()
    assert(rows.length == 3)
    // every asset emits floor((bytes-1)/128)+1 frames — recompute from
    // the corpus and compare the per-kind totals
    val expected = Tables.documents(spark, sfMid)
      .select(pmod(col("doc_id"), lit(3)).cast("long").as("k"),
        (floor((length(encode(col("text"), "utf-8")) - 1) / 128) + 1)
          .cast("long").as("nf"))
      .groupBy(col("k")).agg(sum(col("nf")).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kindOf = Map(0L -> "image", 1L -> "audio", 2L -> "video")
    rows.foreach { r =>
      val k = kindOf.collectFirst {
        case (i, n) if n == r.getAs[String]("kind") => i }.get
      assert(r.getAs[Long]("n_frames") == expected(k))
      assert(r.getAs[Long]("stored_bytes") <= r.getAs[Long]("raw_bytes"))
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_frames"))
    }
  }
}
