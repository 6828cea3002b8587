package graft

import org.apache.spark.sql.functions._

/** Semantics of the pretraining-corpus planning operators (q476–q482)
  * beyond the oracle gate. */
class PretrainPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q476

  test("block dedup ledger: deletions conserve, rates consistent") {
    val rows = run("q476_block_dedup_ledger").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val blocks = r.getAs[Long]("n_blocks")
      val deleted = r.getAs[Long]("n_deleted")
      // keep-first is GLOBAL, so a late source may lose every block —
      // only the bounds and the rate identity are invariant per source
      assert(deleted >= 0L && deleted <= blocks)
      assert(r.getAs[Long]("chars_kept") >= 0L)
      assert(r.getAs[Long]("deleted_ppm") == deleted * 1000000L / blocks)
    }
    // corpus-wide: at least one duplicated block must exist at sf0.01
    // (the synthetic word streams repeat heavily)
    assert(rows.map(_.getAs[Long]("n_deleted")).sum > 0L)
  }

  // ---------------------------------------------------------------- q477

  test("BPE rounds: distinct merges, monotone compression, positive counts") {
    val rows = run("q477_bpe_merge_rounds").orderBy(col("round")).collect()
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L, 3L))
    val pairs = rows.map(_.getAs[String]("pair"))
    assert(pairs.distinct.length == 3, s"merges must differ: ${pairs.toSeq}")
    // each merge strictly shrinks the corpus symbol count
    val totals = rows.map(_.getAs[Long]("total_symbols_after"))
    assert(totals.sliding(2).forall { case Array(a, b) => b < a },
      s"not monotone: ${totals.toSeq}")
    assert(rows.forall(_.getAs[Long]("n") > 0L))
  }

  // ---------------------------------------------------------------- q478

  test("suffix loop census: period counts within doc counts") {
    val rows = run("q478_suffix_loop_census").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val loops = r.getAs[Long]("loop_p1") + r.getAs[Long]("loop_p2") +
        r.getAs[Long]("loop_p3")
      assert(loops <= n)
      assert(r.getAs[Long]("loop_ppm") == loops * 1000000L / n)
    }
  }

  // ---------------------------------------------------------------- q479

  test("DSIR selection: quota respected globally, target source over-selected") {
    val rows = run("q479_dsir_selection").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val selected = rows.map(_.getAs[Long]("n_selected")).sum
    assert(selected == total / 4, s"quota: $selected of $total")
    // the target domain must be selected at a rate above the corpus
    // average — that is the entire point of importance resampling
    val src0 = rows.find(_.getAs[String]("source") == "src0").get
    val src0Rate = src0.getAs[Long]("n_selected").toDouble / src0.getAs[Long]("n_docs")
    val restSel = selected - src0.getAs[Long]("n_selected")
    val restDocs = total - src0.getAs[Long]("n_docs")
    assert(src0Rate > restSel.toDouble / restDocs,
      s"target rate $src0Rate vs rest ${restSel.toDouble / restDocs}")
  }

  // ---------------------------------------------------------------- q480

  test("prefix cache plan: monotone decreasing sharing as k grows") {
    val rows = run("q480_prefix_cache_plan").orderBy(col("k")).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(4L, 8L, 16L))
    for (r <- rows) {
      assert(r.getAs[Long]("n_docs_shared") >= 2 * r.getAs[Long]("n_shared_prefixes"))
      assert(r.getAs[Long]("saved_ppm") <= 1000000L)
    }
    // longer prefixes can only split groups: shared docs cannot increase
    val sharedDocs = rows.map(_.getAs[Long]("n_docs_shared"))
    assert(sharedDocs.sliding(2).forall { case Array(a, b) => b <= a },
      s"not monotone: ${sharedDocs.toSeq}")
  }

  // ---------------------------------------------------------------- q481

  test("epoch decay: effective tokens follow the integer decay constants") {
    val rows = run("q481_epoch_decay_effective_tokens").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val u = r.getAs[Long]("unique_tokens")
      assert(r.getAs[Long]("eff_epoch1") == u)
      assert(r.getAs[Long]("eff_epoch2") == u * 1550L / 1000L)
      assert(r.getAs[Long]("eff_epoch4") == u * 2018L / 1000L)
      // diminishing returns: 4 epochs < 4x one epoch
      assert(r.getAs[Long]("eff_epoch4") < 4L * u)
    }
  }

  // ---------------------------------------------------------------- q482

  test("chunk sweep: coverage >= corpus, overhead shrinks with window size") {
    val rows = run("q482_chunk_overlap_sweep").orderBy(col("l")).collect()
    assert(rows.map(r => (r.getAs[Long]("l"), r.getAs[Long]("s"))).toSeq ==
      Seq((32L, 24L), (64L, 48L), (128L, 96L)))
    val total = rows.head.getAs[Long]("total_tokens")
    for (r <- rows) {
      assert(r.getAs[Long]("total_tokens") == total, "same corpus each config")
      assert(r.getAs[Long]("covered_tokens") >= total)
      assert(r.getAs[Long]("n_chunks") > 0L)
    }
    // larger windows with the same 25% overlap ratio re-read fewer tokens
    val overhead = rows.map(_.getAs[Long]("overhead_ppm"))
    assert(overhead.sliding(2).forall { case Array(a, b) => b <= a },
      s"not monotone: ${overhead.toSeq}")
  }
}
