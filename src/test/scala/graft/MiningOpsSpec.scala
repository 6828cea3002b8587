package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 mining operators (q111–q114) beyond the
  * oracle gate: driver-side brute force at the smallest SF and the
  * invariants the hash compare can't see.
  */
class MiningOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- q111

  test("co-occurrence lift matches driver-side brute force") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val tk = t.split(" ").filter(_.nonEmpty)
      for {
        i <- tk.indices; d <- 1 to 3 if i + d < tk.length
      } yield {
        val (x, y) = (tk(i), tk(i + d))
        if (x <= y) (x, y) else (y, x)
      }
    }
    val tPairs = pairs.length.toLong
    val co = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val uni = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = co.toSeq.collect {
      case ((a, b), nab) if nab >= 5 =>
        (a, b, nab, uni(a), uni(b), nab * tPairs * 1000000L / (uni(a) * uni(b)))
    }.sortBy { case (a, b, nab, _, _, _) => (-nab, a, b) }.take(50)
    val got = run("q111_cooccurrence_lift").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == expected.length)
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q112

  test("range partition plan: buckets partition the corpus, bounds ordered") {
    val rows = run("q112_range_partition_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs) // every doc in exactly one bucket
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.forall(_._1 >= 0) && rows.forall(_._1 <= 7))
    val bounds = rows.flatMap(_._3)
    assert(bounds.toSeq == bounds.toSeq.sorted) // octiles non-decreasing
    assert(rows.last._3.isEmpty) // top bucket is unbounded
  }

  // ---------------------------------------------------------------- q113

  test("hard negatives: dense ranks, label-disjoint, hardest first") {
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("q113_hard_negative_mining").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((anchor, rks) <- rows.groupBy(_._1)) {
      val sorted = rks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 2)
      // rank 1 is at least as similar as rank 2
      if (sorted.length == 2) assert(sorted(0)._5 >= sorted(1)._5)
      for ((_, _, neg, negLabel, cos) <- sorted) {
        assert(negLabel != labels(anchor), s"anchor $anchor")
        assert(negLabel == labels(neg))
        assert(cos >= -1.0001 && cos <= 1.0001)
      }
    }
  }

  // ---------------------------------------------------------------- q114

  test("n-gram novelty: ppm bounds, first doc fully novel, conservation") {
    val rows = run("q114_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((doc, nGrams, nNovel, ppm) <- rows) {
      assert(nNovel >= 0 && nNovel <= nGrams, s"doc $doc")
      assert(ppm == nNovel * 1000000L / nGrams, s"doc $doc")
    }
    // the lowest doc_id owns every one of its grams by construction
    val firstDoc = rows.minBy(_._1)
    assert(firstDoc._3 == firstDoc._2 && firstDoc._4 == 1000000L)
    // every distinct gram has exactly one owner: novel counts sum to the
    // corpus-wide distinct gram count
    val distinctGrams = Tables.documents(spark, sfDir)
      .selectExpr(
        "explode(array_distinct(transform(sequence(1, length(text) - 4), " +
          "i -> substring(text, i, 5)))) AS g")
      .select("g").distinct().count()
    assert(rows.map(_._3).sum == distinctGrams)
  }
}
