package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 training-prep/feature operators (q103–q110)
  * beyond the oracle gate: driver-side brute-force equivalence at the
  * smallest SF and invariants the hash compare can't see (coverage,
  * credit conservation, determinism, no-leakage).
  */
class TrainFeatureOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- q103

  test("chunking covers every token exactly, stride 24, width ≤ 32") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(filter(split(text, ' '), t -> length(t) > 0)) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val chunks = run("q103_text_chunking").collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2 > 0).keySet)
    for ((docId, rows) <- byDoc) {
      val n = docs(docId)
      val sorted = rows.sortBy(_.getLong(1))
      // chunk_idx is dense 0..k-1; starts are multiples of the stride
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq)
      for (r <- sorted) {
        val start = r.getLong(2); val len = r.getLong(3)
        assert(start == r.getLong(1) * 24)
        assert(len == math.min(32L, n - start), s"doc $docId start $start")
      }
      // every token position is inside at least one chunk
      val covered = sorted.flatMap(r =>
        r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
      assert(covered == (0L until n).toSet, s"doc $docId coverage")
    }
  }

  // ---------------------------------------------------------------- q104

  test("BPE pair stats match driver-side brute force") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val brute = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = brute.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = run("q104_bpe_pair_stats").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q105

  test("position attribution conserves credit exactly") {
    val rows = run("q105_position_attribution").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val vc = r.getLong(2); val n = r.getLong(3)
      val first = r.getLong(6); val last = r.getLong(7)
      val midEach = r.getLong(8); val midRem = r.getLong(9)
      val total = first + last + midEach * math.max(0L, n - 2) + midRem
      assert(total == vc, s"purchase ${r.getLong(1)}: $total != $vc")
      if (n == 1) {
        assert(first == vc && last == 0 && midEach == 0 && midRem == 0)
        assert(r.getLong(4) == r.getLong(5)) // first_view == last_view
      }
    }
  }

  // ---------------------------------------------------------------- q106

  test("pareto frontier matches brute-force dominance") {
    import graft.functions.Deterministic.cents
    import org.apache.spark.sql.functions._
    val bySize = Tables.part(spark, sfDir)
      .groupBy(col("p_size"))
      .agg(min(cents(col("p_retailprice"))).as("best"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val brute = bySize.filter { case (s, c) =>
      !bySize.exists { case (s2, c2) => s2 > s && c2 <= c }
    }.keySet
    val got = run("q106_pareto_frontier").collect().map(_.getInt(0)).toSet
    assert(got == brute)
  }

  // ---------------------------------------------------------------- q107

  test("negative sampling: deterministic, in-range, never self") {
    val a = run("q107_negative_sampling").collect()
    val b = run("q107_negative_sampling").collect()
    assert(a.toSeq == b.toSeq) // bit-reproducible run over run
    assert(a.nonEmpty)
    val nVec = Tables.embeddings(spark, sfDir).count()
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- a) {
      val anchor = r.getLong(0); val neg = r.getLong(2)
      assert(neg != anchor)
      assert(neg >= 0 && neg < nVec)
      assert(r.getInt(3) == labels(neg))
      assert(r.getLong(4) == (if (labels(neg) == labels(anchor)) 1L else 0L))
    }
    // ≤ 4 slots per anchor, slots distinct
    for ((_, rows) <- a.groupBy(_.getLong(0))) {
      val slots = rows.map(_.getLong(1))
      assert(slots.length <= 4 && slots.distinct.length == slots.length)
    }
  }

  // ---------------------------------------------------------------- q108

  test("PIT features match brute force and never leak the future") {
    import org.apache.spark.sql.functions._
    import graft.functions.Deterministic.{cents, epochS}
    val ev = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochS(col("ts")).as("ts_s"), cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val byUser = ev.groupBy(_._2)
    val got = run("q108_feature_store_pit").collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (label, user, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // strict event-order prefix: (ts, event_id) ≤ label's — no future rows
      val prefix = byUser(user).filter(e =>
        e._4 < ts || (e._4 == ts && e._1 <= label))
      val lastClick = prefix.filter(_._3 == "click")
        .sortBy(e => (e._4, e._1)).lastOption.map(_._5)
      val lastView = prefix.filter(_._3 == "view")
        .sortBy(e => (e._4, e._1)).lastOption.map(_._4)
      val prior = prefix.count(_._3 == "purchase") - 1
      val gotClick = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotClick == lastClick, s"label $label click")
      val gotRecency = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(gotRecency == lastView.map(ts - _), s"label $label view recency")
      assert(r.getLong(5) == prior, s"label $label prior purchases")
    }
  }

  // ---------------------------------------------------------------- q109

  test("rolling median matches brute force over trailing 7 events") {
    import org.apache.spark.sql.functions._
    import graft.functions.Deterministic.{cents, epochS}
    val ev = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        epochS(col("ts")).as("ts_s"), cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else s(s.length / 2 - 1) + (s(s.length / 2) - s(s.length / 2 - 1)) * 0.5
    }
    val expected: Map[Long, Double] = ev.groupBy(_._2).toSeq.flatMap {
      case (_, rows) =>
        val ordered = rows.toSeq.sortBy(e => (e._3, e._1))
        ordered.zipWithIndex.map { case (e, i) =>
          e._1 -> median(ordered.slice(math.max(0, i - 6), i + 1).map(_._4))
        }
    }.toMap
    val got = run("q109_rolling_median").collect()
    assert(got.nonEmpty)
    for (r <- got)
      assert(r.getDouble(3) == expected(r.getLong(0)), s"event ${r.getLong(0)}")
  }

  // ---------------------------------------------------------------- q110

  test("quantile normalization: ppm grid endpoints and monotonicity") {
    val rows = run("q110_quantile_norm").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    for ((_, rs) <- rows.groupBy(_._1); if rs.length > 1) {
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      assert(sorted.last._3 == 1000000L)
      // rank order respects the score order (ties broken by doc_id)
      assert(sorted.map(_._2).zip(sorted.map(_._2).sorted)
        .forall { case (a, b) => a == b })
    }
  }

  // ---------------------------------------------------------------- q158

  test("centroid separation matches driver-side rational cos²") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(label AS LONG) AS label",
        "transform(embedding, x -> CAST(floor(x*512 + 0.5) AS LONG)) AS qv")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val n = vs.length
      Array.tabulate(64)(d => Math.floorDiv(vs.map(_._2(d)).sum, n.toLong))
    }.toMap
    val labels = cents.keys.toSeq.sorted
    val expected = (for {
      i <- labels.indices; j <- (i + 1) until labels.length
      (la, lb) = (labels(i), labels(j))
      dot = (0 until 64).map(d => cents(la)(d) * cents(lb)(d)).sum
      n2a = cents(la).map(c => c * c).sum
      n2b = cents(lb).map(c => c * c).sum
      sign = if (dot < 0) -1 else 1
    } yield (la, lb, dot,
      (BigInt(sign) * (BigInt(dot) * dot * 1000000) / (BigInt(n2a) * n2b)).toLong))
      .toSeq
    val got = run("q158_centroid_separation").collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty && got.forall(p => p._4.abs <= 1000000L))
  }

  // ---------------------------------------------------------------- q159

  test("token budget plan matches driver-side allocation arithmetic") {
    val bySource = Tables.documents(spark, sfDir)
      .selectExpr("source", "size(filter(split(text, ' '), t -> length(t) > 0)) AS tc")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = bySource.values.sum
    val quota = (total / 2) / bySource.size
    val got = run("q159_token_budget_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == bySource.keys.toSeq.sorted)
    for ((s, nt, q, ep, served, short) <- got) {
      assert(nt == bySource(s))
      assert(q == quota)
      assert(ep == (BigInt(quota) * 1000000 / nt).toLong)
      assert(served == math.min(quota, nt * 4))
      assert(short == math.max(quota - nt * 4, 0L))
      assert(served + short == q)
    }
  }
}
