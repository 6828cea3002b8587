package graft

import org.apache.spark.sql.functions._

/** Semantics of the keyword/privacy/retrieval operators (q428–q430)
  * beyond the oracle gate. */
class KeywordOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  private val stops =
    Set("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  // ---------------------------------------------------------------- q428

  test("rake: phrases stopword-free, 2-5 words, ranked by score") {
    val rows = run("q428_rake_keyphrases").collect()
    assert(rows.length == 25)
    for (r <- rows) {
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length == r.getAs[Long]("n_words"))
      assert(words.length >= 2 && words.length <= 5)
      assert(!words.exists(stops.contains), s"stopword inside: ${r.getAs[String]("phrase")}")
      assert(r.getAs[Long]("score_ppm") > 0L)
      assert(r.getAs[Long]("n_occurrences") >= 1L)
    }
    val ranked = rows.sortBy(_.getAs[Long]("rk"))
    val scores = ranked.map(_.getAs[Long]("score_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "rank order follows score")
  }

  // ---------------------------------------------------------------- q429

  test("kanon lattice: generalization is monotone, chosen = cheapest satisfying") {
    val rows = run("q429_kanon_lattice_plan").collect()
    assert(rows.length == 6)
    val m = rows.map(r => r.getAs[String]("node") ->
      (r.getAs[Long]("gen_cost"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("min_class_size"), r.getAs[Long]("satisfies_k"),
        r.getAs[Long]("is_chosen"))).toMap
    // every generalization EDGE weakly grows the min class and shrinks
    // the class count
    val edges = Seq(
      "nation,segment" -> "region,segment", "nation,segment" -> "nation,*",
      "region,segment" -> "region,*", "region,segment" -> "*,segment",
      "nation,*" -> "region,*", "region,*" -> "*,*", "*,segment" -> "*,*")
    for ((from, to) <- edges) {
      assert(m(from)._3 <= m(to)._3, s"min class must grow $from -> $to")
      assert(m(from)._2 >= m(to)._2, s"classes must shrink $from -> $to")
    }
    // the full-suppression node always satisfies any k <= |table|
    assert(m("*,*")._4 == 1L)
    // exactly one chosen; it satisfies; nothing satisfying is cheaper
    val chosen = rows.filter(_.getAs[Long]("is_chosen") == 1L)
    assert(chosen.length == 1)
    val cc = chosen.head.getAs[Long]("gen_cost")
    assert(chosen.head.getAs[Long]("satisfies_k") == 1L)
    for (r <- rows if r.getAs[Long]("satisfies_k") == 1L)
      assert(r.getAs[Long]("gen_cost") >= cc)
  }

  // ---------------------------------------------------------------- q430

  test("fagin ta: stop depth grows with k, certificate holds") {
    val rows = run("q430_fagin_ta_depth").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 10L, 50L))
    val depths = rows.map(_.getAs[Long]("stop_depth"))
    assert(depths.forall(d => d > 0L && d <= 256L), s"stopped within cap: ${depths.toSeq}")
    assert(depths.zip(depths.tail).forall { case (a, b) => a <= b },
      "harder k stops deeper")
    for (r <- rows) {
      // at the stop depth at least k items are seen (the certificate
      // counts only seen items scoring >= threshold)
      assert(r.getAs[Long]("n_seen_at_stop") >= r.getAs[Long]("k"))
      assert(r.getAs[Long]("threshold_at_stop") > 0L)
    }
    // thresholds weakly decrease with depth
    val ts = rows.map(_.getAs[Long]("threshold_at_stop"))
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
  }
}
