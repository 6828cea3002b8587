package graft

/** Semantics of the round-4 additions q222–q232 beyond the oracle gate:
  * driver-side brute force at the smallest SF and the invariants the
  * hash compare can't see.
  */
class RecentOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  private def tokensOf(t: String): Array[String] =
    t.split(" ").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q222

  test("Good-Turing count-of-counts matches driver-side census") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val bigramFreq = new scala.collection.mutable.HashMap[String, Long]()
    for (t <- texts) {
      val tk = tokensOf(t)
      for (i <- 0 until tk.length - 1)
        bigramFreq.updateWith(tk(i) + " " + tk(i + 1))(c => Some(c.getOrElse(0L) + 1))
    }
    val cc = bigramFreq.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = run("q222_good_turing_counts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => g._1 -> g._2).toMap == cc)
    for ((r, nR, mass, gt) <- got) {
      assert(mass == r * nR)
      val expectGt = cc.get(r + 1) match {
        case Some(nNext) => (BigInt(r + 1) * nNext * 1000000 / nR).toLong
        case None        => 0L
      }
      assert(gt == expectGt, s"gt at r=$r")
    }
  }

  // ---------------------------------------------------------------- q223

  test("GBDT pre-binning: 16 bins, counts conserve, brute force agrees") {
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(floor(l_quantity * 100 + 0.5) AS LONG)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS LONG)",
        "CAST(floor(l_discount * 10000 + 0.5) AS LONG)",
        "CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val feats = Map(
      "quantity" -> li.map(x => (x._1, x._4)),
      "price" -> li.map(x => (x._2, x._4)),
      "discount" -> li.map(x => (x._3, x._4)))
    val expected = feats.flatMap { case (f, vs) =>
      val lo = vs.map(_._1).min
      val hi = vs.map(_._1).max
      vs.groupBy { case (v, _) => (v - lo) * 16 / (hi - lo + 1) }
        .map { case (b, rows) =>
          (f, b) -> (rows.length.toLong, rows.map(_._2).sum, rows.map(_._1).sum)
        }
    }
    val got = run("q223_gbdt_prebinning").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    assert(got.keys.forall { case (_, b) => b >= 0 && b <= 15 })
    // per feature, bin counts conserve the row count
    for (f <- feats.keys)
      assert(got.collect { case ((`f`, _), (n, _, _)) => n }.sum == li.length.toLong)
  }

  // ---------------------------------------------------------------- q224

  test("rank concordance gamma matches driver-side pair count") {
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir)
    val m = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .selectExpr("p_brand",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS LONG) AS rc",
        "CAST(floor(l_quantity + 0.5) AS LONG) AS q")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(rows => (rows.map(_._2).sum, rows.map(_._3).sum)).toMap
    val brands = m.keys.toSeq.sorted
    var (c, d) = (0L, 0L)
    for (i <- brands.indices; j <- i + 1 until brands.length) {
      val prod = BigInt(m(brands(i))._1 - m(brands(j))._1) *
        BigInt(m(brands(i))._2 - m(brands(j))._2)
      if (prod > 0) c += 1 else if (prod < 0) d += 1
    }
    val row = run("q224_rank_concordance").collect().head
    val nPairs = brands.length.toLong * (brands.length - 1) / 2
    assert(row.getLong(0) == nPairs && row.getLong(1) == c && row.getLong(2) == d)
    assert(row.getLong(3) == nPairs - c - d)
    val gamma =
      if (c + d == 0) 0L
      else if (c >= d) (c - d) * 1000000 / (c + d)
      else -((d - c) * 1000000 / (c + d))
    assert(row.getLong(4) == gamma)
  }

  // ---------------------------------------------------------------- q225

  test("SRM audit: arms partition each day, chi matches brute force") {
    val rows = run("q225_srm_audit").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, a0, a1, chi, flag) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a0 + a1 == n)
      val diff = BigInt(a0 - a1)
      assert(chi == (diff * diff * 1000000 / n).toLong)
      assert(flag == (if (chi > 3841459L) 1L else 0L))
    }
  }

  // ---------------------------------------------------------------- q226

  test("participation ratio matches BigInt brute force and stays in [1, dims]") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("label", "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 512 + 0.5) AS LONG))")
      .collect().map(r => (r.getInt(0).toLong, r.getSeq[Long](1).toArray))
    val expected = vecs.groupBy(_._1).view.mapValues { g =>
      val qs = g.map(_._2)
      val n = qs.length.toLong
      val dims = qs.head.length
      val vds = (0 until dims).map { d =>
        val xs = qs.map(_(d))
        BigInt(n) * xs.map(x => BigInt(x) * x).sum - {
          val s = xs.sum; BigInt(s) * s
        }
      }
      val s1 = vds.sum
      val s2 = vds.map(v => v * v).sum
      if (s2 == 0) 0L else (s1 * s1 * 1000000 / s2).toLong
    }.toMap
    val got = run("q226_effective_dim").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
    // PR of a non-degenerate cluster lies in [1, 64] (ppm-scaled)
    for ((_, pr) <- got if pr != 0L)
      assert(pr >= 1000000L && pr <= 64000000L)
  }

  // ---------------------------------------------------------------- q227/q230

  test("dup-rate census conserves doc counts; leakage span histogram agrees") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    val census = run("q227_dup_rate_by_source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((src, rows) <- bySrc) {
      val (nDocs, nUniq) = census(src)
      assert(nDocs == rows.length.toLong)
      assert(nUniq == rows.map(_._2).distinct.length.toLong)
    }
    val prefixClusters = docs.groupBy { case (_, t) => t.take(64) }
      .values.filter(_.length > 1)
    val expectedSpans = prefixClusters
      .groupBy(_.map(_._1).distinct.length.toLong).view
      .mapValues(cs => (cs.size.toLong, cs.map(_.length.toLong).sum)).toMap
    val got = run("q230_cross_source_dup_leakage").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expectedSpans)
  }

  // ---------------------------------------------------------------- q228

  test("session-timeout census: cumulative ppm is monotone and ends at 1e6") {
    val rows = run("q228_session_timeout_census").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length > 1)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    assert(rows.last._3 == 1000000L)
    // census covers every same-user consecutive gap exactly once
    val ev = Tables.events(spark, sfDir)
    val nGaps = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nGaps)
  }

  // ---------------------------------------------------------------- q229

  test("bloom sizing: exact formula, monotone in key count") {
    val rows = run("q229_bloom_size_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((_, n, bits, bytes, k) <- rows) {
      assert(bits == (BigInt(n) * 9585059 + 999999) / 1000000)
      assert(bytes == (bits + 7) / 8)
      assert(k == 7L)
    }
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
  }

  // ---------------------------------------------------------------- q231

  test("temporal split combos partition the customer base") {
    val rows = run("q231_temporal_split_leakage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nCustomers = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._3).sum == nCustomers)
    for ((splits, nSplits, _) <- rows)
      assert(splits.split("\\+").length.toLong == nSplits)
  }

  // ---------------------------------------------------------------- q232

  test("join-key skew census: uniform keys score ≈ 1e6, salt only above 4x") {
    val rows = run("q232_join_key_skew_census").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 3)
    for ((_, nKeys, total, maxCnt, imb, salt) <- rows) {
      assert(maxCnt * nKeys >= total) // max ≥ mean always
      assert(imb == (BigInt(maxCnt) * nKeys * 1000000 / total).toLong)
      assert(salt == ((BigInt(maxCnt) * nKeys + 4 * total - 1) / (BigInt(4) * total)).toLong)
      if (imb <= 4000000L) assert(salt == 1L)
    }
  }
}
