package graft

/** Semantics of the round-10 density/eval batch: grid-density census
  * (q708), dup-span localization (q709), DeLong paired AUC (q710). */
class DensityEvalOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q708: census classes partition every embedded point") {
    val rows = run("q708_grid_density_census").collect()
    val classes = rows.map(_.getAs[String]("klass"))
    assert(classes.toSet.subsetOf(Set("a_core", "b_border", "c_noise")))
    val totalPts = rows.map(_.getAs[Long]("n_points")).sum
    val nEmb = Tables.embeddings(spark, sfMid).count()
    assert(totalPts == nEmb, s"census lost points: $totalPts vs $nEmb")
    rows.foreach(r =>
      assert(r.getAs[Long]("n_points") >= r.getAs[Long]("n_cells"),
        "a cell holds at least one point by construction"))
  }

  test("q709: spans are trigram-consistent and pairs are ordered") {
    val rows = run("q709_dup_span_localization").collect()
    assert(rows.nonEmpty, "sf0.01 has LSH candidate pairs (q21 finds them)")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val span = r.getAs[Long]("longest_span_tokens")
      val m = r.getAs[Long]("matched_trigrams")
      val d = r.getAs[Long]("n_diagonals")
      // one matched trigram = a 3-token span; a run of length r spans
      // r+2 tokens and contributes r matches
      assert(span >= 3, s"span $span")
      assert(m >= span - 2, s"matches $m can't be under the longest run")
      assert(d >= 1)
    }
  }

  test("q710: AUCs are valid ppm, complements behave, z is finite") {
    val r = run("q710_delong_paired_auc").collect().head
    val aucA = r.getAs[Long]("auc_a_ppm")
    val aucB = r.getAs[Long]("auc_b_ppm")
    assert(aucA >= 0 && aucA <= 1000000L)
    assert(aucB >= 0 && aucB <= 1000000L)
    val z = r.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
    // value and hour are generator-independent of purchase-ness: both
    // AUCs sit near chance and the paired difference is modest
    assert(math.abs(aucA - 500000L) < 100000L, s"AUC_A $aucA far from chance")
    assert(math.abs(aucB - 500000L) < 100000L, s"AUC_B $aucB far from chance")
    val n = r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg")
    val events = Tables.events(spark, sfMid)
      .filter("value IS NOT NULL AND ts IS NOT NULL").count()
    assert(n == events, s"placement universe lost rows: $n vs $events")
  }
}
