package graft

/** Semantics of the round-4 behavior/drift operators (q115–q124) beyond
  * the oracle gate: driver-side brute force at the smallest SF and the
  * invariants the hash compare can't see.
  */
class BehaviorDriftSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  private def tokensOf(t: String): Array[String] =
    t.split(" ").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q115

  test("event funnel matches driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty)
        .collect { case (_, t, s) if t == tpe && s > after => s }
        .minOption
    val t1 = byUser.keys.flatMap(u => firstAfter(u, "view", Long.MinValue).map(u -> _)).toMap
    val t2 = t1.flatMap { case (u, s) => firstAfter(u, "click", s).map(u -> _) }
    val t3 = t2.flatMap { case (u, s) => firstAfter(u, "purchase", s).map(u -> _) }
    val row = run("q115_event_funnel").collect().head
    assert(row.getLong(0) == t1.size && row.getLong(1) == t2.size && row.getLong(2) == t3.size)
    assert(row.getLong(3) == t2.size * 1000000L / t1.size)
    assert(row.getLong(4) == t3.size * 1000000L / t2.size)
  }

  // ---------------------------------------------------------------- q116

  test("RFM segments: scores in 1..4, customer counts sum to total") {
    val rows = run("q116_rfm_segmentation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nCust = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust)
    for ((r, f, m, _) <- rows) {
      assert(r >= 1 && r <= 4, s"r_score $r out of range")
      assert(f >= 1 && f <= 4, s"f_score $f out of range")
      assert(m >= 1 && m <= 4, s"m_score $m out of range")
    }
  }

  test("RFM quartiles are balanced within bin granularity") {
    // every quartile's customer share must be ≤ its bin-packing bound:
    // a score bucket can only overflow 25% by at most one histogram bin
    val rows = run("q116_rfm_segmentation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._4).sum
    val byR = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    // with 4 quartiles each should be near total/4; allow 2× slack for
    // tied bins at sf0.001 (15 customers)
    assert(byR.values.forall(_ <= total), "quartile exceeds population")
    assert(byR.keys.min >= 1 && byR.keys.max <= 4)
  }

  // ---------------------------------------------------------------- q117

  test("Gini matches driver-side brute force") {
    val rev = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        graft.functions.Deterministic.cents(
          org.apache.spark.sql.functions.col("o_totalprice"))).as("rc"))
      .collect().map(_.getLong(1) / 100).sorted
    val n = BigInt(rev.length)
    val s0 = rev.map(BigInt(_)).sum
    val s1 = rev.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = ((2 * s1 - (n + 1) * s0) * 1000000 / (n * s0)).toLong
    val row = run("q117_gini_concentration").collect().head
    assert(row.getLong(0) == rev.length.toLong)
    assert(row.getLong(1) == s0.toLong)
    assert(row.getLong(2) == expected)
  }

  // ---------------------------------------------------------------- q118

  test("source TV drift matches driver-side brute force") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokensOf(r.getString(1))))
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap)
      .toMap
    val global = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = global.values.sum
    val expected = bySource.map { case (s, dist) =>
      val ts = dist.values.sum
      val sd = global.keysIterator.map { tok =>
        val nst = BigInt(dist.getOrElse(tok, 0L))
        (nst * t - BigInt(global(tok)) * ts).abs
      }.sum
      s -> (sd * 1000000 / (2 * BigInt(ts) * t)).toLong
    }
    val got = run("q118_source_drift_tv").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q119

  test("chi-square cells match driver-side brute force") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rl = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cs = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = docs.length.toLong
    val got = run("q119_chi_square_independence").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == rl.size * cs.size, "grid must be dense")
    for (((lang, src), (o, chiMicro)) <- got) {
      assert(o == cells.getOrElse((lang, src), 0L))
      val d = o.toDouble * t - rl(lang).toDouble * cs(src)
      val expected = math.floor(d * d / ((t.toDouble * rl(lang)) * cs(src)) * 1000000 + 0.5).toLong
      assert(chiMicro == expected, s"cell ($lang,$src)")
    }
  }

  // ---------------------------------------------------------------- q120

  test("KS statistic matches driver-side brute force") {
    val prices = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong / 100))
    val g1 = prices.collect { case ("1-URGENT", d) => d }.sorted
    val g2 = prices.collect { case ("5-LOW", d) => d }.sorted
    val (n1, n2) = (g1.length.toLong, g2.length.toLong)
    val support = (g1 ++ g2).distinct.sorted
    val diffs = support.map { x =>
      val a1 = g1.count(_ <= x).toLong
      val a2 = g2.count(_ <= x).toLong
      (x, (BigInt(a1) * n2 - BigInt(a2) * n1).abs)
    }
    val mx = diffs.map(_._2).max
    val atDollar = diffs.collect { case (x, d) if d == mx => x }.min
    val row = run("q120_ks_two_sample").collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getLong(2) == (mx * 1000000 / (BigInt(n1) * n2)).toLong)
    assert(row.getLong(3) == atDollar)
  }

  // ---------------------------------------------------------------- q121

  test("Simpson diversity matches brute force and is bounded") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tokensOf(r.getString(1))))
      .filter(_._2.nonEmpty)
    val expected = docs.map { case (id, tk) =>
      val s2 = tk.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      id -> (tk.length.toLong, s2 * 1000000L / (tk.length.toLong * tk.length))
    }.toMap
    val got = run("q121_simpson_diversity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // Simpson index of a non-empty doc is in (0, 1]: uniform-unique text
    // scores T/T² = 1/T (→0), fully-repeated text scores exactly 1e6 ppm
    assert(got.values.forall { case (_, p) => p > 0 && p <= 1000000L })
  }

  // ---------------------------------------------------------------- q122

  test("vocab coverage is monotone in k and matches brute force") {
    val toks = Tables.documents(spark, sfDir)
      .select("text").collect().flatMap(r => tokensOf(r.getString(0)))
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (tok, n) => (-n, tok) }
    val t = toks.length.toLong
    val got = run("q122_vocab_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((k, covered, ppm) <- got) {
      val expected = freq.take(k.toInt).map(_._2).sum
      assert(covered == expected, s"covered@$k")
      assert(ppm == (BigInt(expected) * 1000000 / t).toLong)
    }
    val ppms = got.sortBy(_._1).map(_._3)
    assert(ppms.toSeq == ppms.toSeq.sorted, "coverage must be monotone in k")
  }

  // ---------------------------------------------------------------- q123

  test("z-order ranges: counts partition lineitem, z bounds nest in range") {
    val rows = run("q123_zorder_layout").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    val nLi = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum == nLi)
    for ((zr, _, zMin, zMax) <- rows) {
      assert(zMin >= zr * 16777216L && zMax < (zr + 1) * 16777216L,
        s"z bounds escape range $zr")
      assert(zMin <= zMax)
    }
  }

  test("z-order interleave round-trips the two keys") {
    // brute-force the Morton code for a handful of rows and compare
    val sample = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").limit(20).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def morton(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    import org.apache.spark.sql.functions._
    val viaSql = Tables.lineitem(spark, sfDir)
      .limit(20)
      .select(col("l_partkey"), col("l_suppkey"))
      .selectExpr("l_partkey", "l_suppkey",
        (0 until 16).flatMap(i => Seq(
          s"shiftleft(shiftright((l_partkey % 65536), $i) & 1, ${2 * i})",
          s"shiftleft(shiftright((l_suppkey % 65536), $i) & 1, ${2 * i + 1})"))
          .mkString(" + ") + " AS z")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (((p, s), z) <- viaSql)
      assert(z == morton(p % 65536, s % 65536), s"morton($p,$s)")
  }

  // ---------------------------------------------------------------- q124

  test("target encoding matches driver-side brute force") {
    val spark2 = spark
    import spark2.implicits._
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .as[(Long, Long)].collect()
    val urgent = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> (if (r.getString(1) == "1-URGENT") 1L else 0L)).toMap
    val brand = Tables.part(spark, sfDir).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val joined = li.map { case (ok, pk) => (brand(pk), urgent(ok)) }
    val byBrand = joined.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val n = joined.size.toLong
    val pos = joined.map(_._2).sum
    val got = run("q124_target_encoding").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == byBrand.keySet)
    for ((b, (nb, posb, enc)) <- got) {
      assert((nb, posb) == byBrand(b))
      val expected = ((BigInt(posb) * n + 100 * pos) * 1000000 /
        (BigInt(n) * (nb + 100))).toLong
      assert(enc == expected, s"brand $b")
    }
  }

  // ---------------------------------------------------------------- q149

  test("k-anonymity matches driver-side class census; risk monotone in k") {
    val sizes = Tables.customer(spark, sfDir)
      .selectExpr("CAST(c_nationkey AS LONG) AS nk", "c_mktsegment",
        "CAST(floor(c_acctbal * 100 + 0.5) AS LONG) div 100000 AS band")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val total = sizes.sum
    val rows = run("q149_k_anonymity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(2L, 5L, 10L, 25L))
    for ((k, nc, below, risk, ppm) <- rows) {
      assert(nc == sizes.length.toLong)
      assert(below == sizes.count(_ < k).toLong)
      assert(risk == sizes.filter(_ < k).sum)
      assert(ppm == (BigInt(risk) * 1000000 / total).toLong)
    }
    // more records are at risk as the anonymity bar rises
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
  }

  // ---------------------------------------------------------------- q150

  test("markov transitions match driver-side lag; rows sum to 1M ppm-ish per source") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Array(a, b) => (a._3, b._3)
      }
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("q150_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == counts.size)
    for ((p, nx, n, nf, ppm) <- got) {
      assert(n == counts((p, nx)))
      assert(nf == fromTot(p))
      assert(ppm == (BigInt(n) * 1000000 / nf).toLong)
    }
    // per-source probability mass closes to within the truncation slack
    for ((p, rs) <- got.groupBy(_._1)) {
      val mass = rs.map(_._5).sum
      assert(mass <= 1000000L && mass > 1000000L - rs.length,
        s"source $p mass $mass")
    }
  }

  // ---------------------------------------------------------------- q151

  test("dow seasonality matches driver-side index; weighted mean is 1M ppm") {
    val daily = Tables.orders(spark, sfDir)
      .selectExpr("CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS LONG) AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byDow = daily.toSeq.map { case (d, rev) => ((d + 4) % 7, rev) }
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val (tDays, tRev) = (daily.size.toLong, daily.values.sum)
    val got = run("q151_dow_seasonality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == byDow.keys.toSeq.sorted)
    for ((dow, nd, rev, ppm) <- got) {
      assert((nd, rev) == byDow(dow))
      assert(ppm == (BigInt(rev) * tDays * 1000000 / (BigInt(nd) * tRev)).toLong)
    }
    // day-weighted mean of the index is 1.0 up to truncation slack
    val mean = got.map { case (_, nd, _, ppm) => BigInt(nd) * ppm }.sum / tDays
    assert((mean - 1000000).abs <= 7)
  }

  // ---------------------------------------------------------------- q152

  test("gini split quality matches driver-side impurity; gain nonnegative-ish") {
    val rows = Tables.orders(spark, sfDir)
      .selectExpr(
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END AS y",
        "o_orderstatus AS status",
        "CAST(year(CAST(o_orderdate AS DATE)) AS STRING) AS yr",
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS LONG) div 5000000 AS STRING) AS band")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val n = rows.length.toLong
    val pos = rows.map(_._1).sum
    def splitPpm(valueOf: ((Long, String, String, String)) => String): Long =
      rows.groupBy(valueOf).values.map { b =>
        val (nv, pv) = (b.length.toLong, b.map(_._1).sum)
        ((BigInt(nv) * nv - BigInt(pv) * pv - BigInt(nv - pv) * (nv - pv)) * 1000000 /
          (BigInt(n) * nv)).toLong
      }.sum
    val parent = ((BigInt(n) * n - BigInt(pos) * pos - BigInt(n - pos) * (n - pos)) *
      1000000 / (BigInt(n) * n)).toLong
    val expected = Map(
      "status" -> splitPpm(_._2), "year" -> splitPpm(_._3), "band" -> splitPpm(_._4))
    val got = run("q152_gini_split_quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 3)
    for ((f, _, split, par, gain) <- got) {
      assert(split == expected(f), s"feature $f")
      assert(par == parent)
      assert(gain == par - split)
      // flooring can cost at most one ppm per branch, never more
      assert(gain >= -rows.map(x => x).length)
    }
  }

  // ---------------------------------------------------------------- q153

  test("churn overdue score matches driver-side personal-cadence ratio") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).collect { case (u, es) if es.length >= 3 =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      val gaps = ts.sliding(2).map { case Array(a, b) => b - a }
      (u, es.length.toLong, ts.last, gaps.max)
    }.toSeq
    val wm = perUser.map(_._3).max
    val expected = perUser.map { case (u, ne, last, mg) =>
      (u, ne, wm - last, mg, BigInt(wm - last) * 1000000 / mg)
    }.sortBy(_._1)
    val got = run("q153_churn_overdue").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getLong(4))))
    assert(got.toSeq == expected)
    assert(expected.nonEmpty)
    // at least one user is silent for a meaningful share of their worst gap
    assert(got.map(_._5).max > 0)
  }

  // ---------------------------------------------------------------- q155

  test("benford audit matches driver-side digit census; ppm sums close") {
    val digits = Tables.orders(spark, sfDir)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS LONG) div 100 AS d")
      .collect().map(r => r.getLong(0).toString.head.asDigit.toLong)
    val n = digits.length.toLong
    val benford = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = run("q155_benford_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == counts.keys.toSeq.sorted)
    for ((d, c, obs, bf, dev) <- got) {
      assert(c == counts(d))
      assert(obs == BigInt(c) * 1000000 / n)
      assert(bf == benford(d.toInt))
      assert(dev == (obs - bf).abs)
    }
    val mass = got.map(_._3).sum
    assert(mass <= 1000000L && mass > 1000000L - 9)
  }

  // ---------------------------------------------------------------- q156

  test("order reconciliation matches driver-side exact-cents recompute") {
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey",
        """CAST(floor(l_extendedprice * 100 + 0.5) AS LONG)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS LONG))
           * (100 + CAST(floor(l_tax * 100 + 0.5) AS LONG)) AS e4""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) * 10000 AS r4")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = orders.map { case (k, r4) =>
      li.get(k) match {
        case None => ("no_lineitems", 0L)
        case Some(c4) =>
          val diff = (c4 - r4).abs
          val b = if (diff == 0) "exact"
            else if (diff <= 10000) "within_cent"
            else if (diff <= 1000000) "within_dollar"
            else "over_dollar"
          (b, diff)
      }
    }.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).max)).toMap
    val got = run("q156_order_reconciliation").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q160

  test("session KPIs match driver-side sessionization") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
      val bounds = scala.collection.mutable.ArrayBuffer((sorted.head, sorted.head, 1L))
      for (t <- sorted.tail) {
        val (t0, t1, n) = bounds.last
        if (t - t1 > 1800) bounds += ((t, t, 1L))
        else bounds(bounds.length - 1) = (t0, t, n + 1)
      }
      bounds
    }.toSeq
    val expected = sessions.groupBy(_._1 / 86400).toSeq.sortBy(_._1).map {
      case (day, ss) =>
        val (nS, nB) = (ss.length.toLong, ss.count(_._3 == 1L).toLong)
        val (nE, dw) = (ss.map(_._3).sum, ss.map(s => s._2 - s._1).sum)
        (day, nS, nB, BigInt(nB) * 1000000 / nS, BigInt(nE) * 1000 / nS, dw, dw / nS)
    }
    val got = run("q160_session_kpis").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), BigInt(r.getLong(3)),
        BigInt(r.getLong(4)), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q161

  test("new-category drift: first weeks correct, domain size is cumulative") {
    val combos = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority || '|' || o_orderstatus AS combo",
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS LONG) div 7 AS week")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val firstWeek = combos.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = firstWeek.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = run("q161_new_category_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == expected)
    assert(got.map(_._3).toSeq == got.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    assert(got.map(_._3).last == firstWeek.size.toLong)
  }

  // ---------------------------------------------------------------- q162

  test("event debounce matches driver-side lag rule") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(e => (e._1, e._3)).values.flatMap { es =>
      val ts = es.sortBy(e => (e._4, e._2))
      ts.zipWithIndex.map { case (e, i) =>
        (e._3, if (i > 0 && e._4 - ts(i - 1)._4 <= 60) 1L else 0L)
      }
    }.toSeq.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = run("q162_event_debounce").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == expected.keys.toSeq.sorted)
    for ((t, n, s, ppm) <- got) {
      assert((n, s) == expected(t))
      assert(ppm == (BigInt(s) * 1000000 / n).toLong)
    }
  }

  // ---------------------------------------------------------------- q163

  test("experiment readout: assignment deterministic, census matches brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    def arm(u: Long): String =
      if ((((u % 2147483648L) * 2654435761L) % 4294967296L) % 2 == 0) "control"
      else "treatment"
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (arm(u),
        if (es.exists(_._2 == "purchase")) 1L else 0L,
        es.filter(_._2 == "purchase").flatMap(_._3).sum)
    }.toSeq
    val expected = perUser.groupBy(_._1).view.mapValues { us =>
      val (n, c, r) = (us.size.toLong, us.map(_._2).sum, us.map(_._3).sum)
      (n, c, BigInt(c) * 1000000 / n, r, r / n)
    }.toMap
    val got = run("q163_experiment_readout").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), BigInt(r.getLong(3)), r.getLong(4), r.getLong(5))))
    assert(got.map(_._1).toSeq == Seq("control", "treatment"))
    for ((a, t) <- got) assert(t == expected(a), s"arm $a")
    // both arms populated — the hash actually splits
    assert(expected.values.forall(_._1 > 0))
  }

  // ---------------------------------------------------------------- q164

  test("brand-month position: cumulative sums telescope per brand") {
    val got = run("q164_brand_month_position").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    for ((_, rs) <- got.groupBy(_._1)) {
      val ordered = rs.sortBy(_._2)
      assert(ordered.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ==
        ordered.map(_._4).toSeq)
    }
    // spot-check one brand against a direct aggregate
    val brand = got.head._1
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .filter(org.apache.spark.sql.functions.col("p_brand") === brand)
      .selectExpr(
        """CAST((year(CAST(l_shipdate AS DATE)) - 1970) * 12
           + month(CAST(l_shipdate AS DATE)) - 1 AS LONG) AS m""",
        "CAST(floor(l_quantity + 0.5) AS LONG) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    for ((b, m, q, _) <- got if b == brand) assert(q == direct(m), s"month $m")
  }

  // ---------------------------------------------------------------- q167

  test("FD discovery matches driver-side violation census") {
    def census(pairs: Seq[(String, String)]): (Long, Long, Long) = {
      val byKey = pairs.groupBy(_._1)
      val nKeys = byKey.size.toLong
      val viol = byKey.values.filter(_.map(_._2).distinct.length > 1)
      (nKeys, viol.size.toLong, viol.map(_.size.toLong).sum)
    }
    val part = Tables.part(spark, sfDir)
      .selectExpr("p_brand", "p_type", "p_name").collect()
    val cust = Tables.customer(spark, sfDir)
      .selectExpr("CAST(c_nationkey AS STRING) AS k", "c_mktsegment").collect()
    val ord = Tables.orders(spark, sfDir)
      .selectExpr("CAST(o_custkey AS STRING) AS k", "o_orderpriority").collect()
    val expected = Map(
      "p_brand->p_type" -> census(part.map(r => (r.getString(0), r.getString(1)))),
      "p_name->p_brand" -> census(part.map(r => (r.getString(2), r.getString(0)))),
      "c_nationkey->c_mktsegment" -> census(cust.map(r => (r.getString(0), r.getString(1)))),
      "o_custkey->o_orderpriority" -> census(ord.map(r => (r.getString(0), r.getString(1)))))
    val got = run("q167_fd_discovery").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.map(_._1).toSeq == expected.keys.toSeq.sorted)
    for ((fd, (nk, nv, ra, ppm)) <- got) {
      assert((nk, nv, ra) == expected(fd), s"fd $fd")
      assert(ppm == (BigInt(nv) * 1000000 / nk).toLong)
    }
  }

  // ---------------------------------------------------------------- q168

  test("revenue hierarchy: shares match brute force, regions close to 1M") {
    val rev = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .join(Tables.nation(spark, sfDir),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .join(Tables.region(spark, sfDir),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .selectExpr("r_name", "n_name", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS c")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val regionRev = rev.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val totalRev = rev.values.sum
    val got = run("q168_revenue_hierarchy").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == rev.size)
    for ((rn, nn, c, sr, rs) <- got) {
      assert(c == rev((rn, nn)))
      assert(sr == (BigInt(c) * 1000000 / regionRev(rn)).toLong)
      assert(rs == (BigInt(regionRev(rn)) * 1000000 / totalRev).toLong)
    }
    // nation shares within each region close to 1M up to truncation
    for ((rn, rs) <- got.groupBy(_._1)) {
      val mass = rs.map(_._4).sum
      assert(mass <= 1000000L && mass > 1000000L - rs.length, s"region $rn")
    }
  }

  // ---------------------------------------------------------------- q169

  test("late shipment SLA matches driver-side day arithmetic") {
    val ord = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS LONG) AS od")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey",
        "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS LONG) AS sd")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = li.map { case (k, sd) =>
      val (pr, od) = ord(k)
      (pr, if (sd - od > 90) 1L else 0L)
    }.groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = run("q169_late_shipment_sla").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == expected.keys.toSeq.sorted)
    for ((pr, n, l, ppm) <- got) {
      assert((n, l) == expected(pr))
      assert(ppm == (BigInt(l) * 1000000 / n).toLong)
    }
  }

  // ---------------------------------------------------------------- q176

  test("CUSUM closed form equals the recursive definition; alarms at h = total") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .select(graft.functions.Deterministic.epochS(col("ts")).as("s"))
      .select(expr("s div 86400").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = BigInt(daily.length)
    val total = BigInt(daily.map(_._2).sum)
    var s = BigInt(0)
    val expected = daily.map { case (day, x) =>
      val dev = BigInt(x) * n - total - total / 10
      s = (s + dev).max(BigInt(0)) // the recursive CUSUM definition
      (day, x, s, if (s > total) 1L else 0L)
    }
    val got = run("q176_cusum_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getLong(2)), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    assert(got.map(_._4).sum > 0 || got.forall(_._4 == 0L)) // census is well-formed
  }

  // ---------------------------------------------------------------- q180

  test("correlation matrix matches driver-side moment brute force") {
    val quad = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
      .map(r => Map(
        "qty" -> math.floor(r.getDouble(0) + 0.5).toLong,
        "price" -> math.floor(r.getDouble(1) + 0.5).toLong,
        "disc" -> math.floor(r.getDouble(2) * 10000 + 0.5).toLong,
        "tax" -> math.floor(r.getDouble(3) * 10000 + 0.5).toLong))
    def corr(a: String, b: String): Double = {
      val n = quad.length.toDouble
      val sx = quad.map(_(a)).sum.toDouble; val sy = quad.map(_(b)).sum.toDouble
      val sxy = quad.map(m => m(a) * m(b)).sum.toDouble
      val sxx = quad.map(m => m(a) * m(a)).sum.toDouble
      val syy = quad.map(m => m(b) * m(b)).sum.toDouble
      (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val expected = Seq(
      "disc_tax" -> corr("disc", "tax"), "price_disc" -> corr("price", "disc"),
      "price_tax" -> corr("price", "tax"), "qty_disc" -> corr("qty", "disc"),
      "qty_price" -> corr("qty", "price"), "qty_tax" -> corr("qty", "tax"))
    val got = run("q180_correlation_matrix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == expected.map(_._1))
    assert(got.forall(_._2 == quad.length.toLong))
    got.zip(expected).foreach { case ((p, _, c), (_, e)) =>
      assert(c == e, s"pair $p: got $c expected $e")
    }
  }

  // ---------------------------------------------------------------- q181

  test("Mann-Whitney AUC matches driver-side pairwise brute force") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .filter(t => Set("1-URGENT", "2-HIGH", "5-LOW")(t._2))
      .map { case (st, pr, p) =>
        (st, pr != "5-LOW", math.floor(p * 100 + 0.5).toLong / 100000L)
      }
    val expected = orders.groupBy(_._1).view.mapValues { xs =>
      val hi = xs.filter(_._2).map(_._3)
      val lo = xs.filterNot(_._2).map(_._3)
      val u2 = (for (a <- hi; b <- lo) yield {
        if (a > b) 2L else if (a == b) 1L else 0L
      }).sum
      (hi.length.toLong, lo.length.toLong, u2,
        u2.toDouble / (2.0 * hi.length.toDouble * lo.length.toDouble))
    }.toMap.filter { case (_, (n1, n2, _, _)) => n1 > 0 && n2 > 0 }
    val got = run("q181_mann_whitney_auc").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.toMap == expected)
    // AUC is a probability
    got.foreach { case (_, (_, _, _, auc)) => assert(auc >= 0.0 && auc <= 1.0) }
  }

  // ---------------------------------------------------------------- q186

  test("Theil-Sen trend matches driver-side pairwise-slope brute force") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("CAST(year(o_orderdate) AS LONG) AS yr",
        "CAST(month(o_orderdate) AS LONG) AS mo",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val monthly = orders.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val expected = monthly.keys.map(_._1).toSeq.distinct.sorted.map { yr =>
      val months = monthly.collect { case ((y, m), v) if y == yr => (m, v) }.toSeq
      val slopes = (for {
        (m1, r1) <- months; (m2, r2) <- months if m1 < m2
      } yield (((BigInt(r2 - r1) * 1000) / BigInt(m2 - m1)).toLong, m1, m2))
        .sortBy(identity)
      val median = slopes((slopes.length + 1) / 2 - 1)
      (yr, slopes.length.toLong, median._1)
    }
    val got = run("q186_theil_sen_trend").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q188

  test("dyadic EWMA matches driver-side 8-day weighted brute force") {
    val daily = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority AS prio",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val expected = daily.keys.toSeq.sorted.map { case (prio, day) =>
      val window = (0 to 7).flatMap { k =>
        daily.get((prio, day - k)).map(v => (v, 1L << (7 - k)))
      }
      val num = window.map { case (v, w) => BigInt(v) * w }.sum
      val den = window.map(_._2).sum
      (prio, day, den, (num * 1000 / den).toLong)
    }
    val got = run("q188_dyadic_ewma").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // the current day always contributes weight 128; total mass <= 255
    assert(got.forall(t => t._3 >= 128L && t._3 <= 255L))
  }

  // ---------------------------------------------------------------- q197

  test("l-diversity census matches driver-side class brute force") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_orderstatus",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) div 10000 AS band",
        "o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val classes = orders.groupBy(t => (t._1, t._2)).values.toSeq
      .map(rows => (rows.map(_._3).distinct.length.toLong, rows.length.toLong))
    val expected = classes.groupBy(_._1).toSeq
      .map { case (l, cs) => (l, cs.length.toLong, cs.map(_._2).sum) }
      .sortBy(_._1)
    val got = run("q197_l_diversity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // diversity is bounded by the 5 priority values
    assert(got.forall(t => t._1 >= 1L && t._1 <= 5L))
  }

  // ---------------------------------------------------------------- q198

  test("benford audit matches driver-side digit census") {
    val benford = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
      8L -> 51153L, 9L -> 45757L)
    val cents = Tables.orders(spark, sfDir)
      .selectExpr("CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS vc")
      .collect().map(_.getLong(0))
    val tot = cents.length.toLong
    val expected = cents.groupBy(v => v.toString.head.asDigit.toLong).toSeq
      .map { case (d, vs) =>
        val share = vs.length * 1000000L / tot
        (d, vs.length.toLong, share, benford(d), math.abs(share - benford(d)))
      }.sortBy(_._1)
    val got = run("q198_benford_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // the expectation column is a proper distribution (ppm sums to 1e6)
    assert(benford.values.sum == 1000000L)
  }

  // ---------------------------------------------------------------- q203

  test("lag-7 autocorrelation matches driver-side exact moments") {
    val daily = Tables.orders(spark, sfDir)
      .filter("o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'")
      .selectExpr("o_orderpriority AS pri",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val pris = Tables.orders(spark, sfDir)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    val expected = pris.toSeq.map { pri =>
      def v(d: Long) = daily.getOrElse((pri, d), 0L) / 10000L
      val pairs = (9138L to 9495L).map(d => (BigInt(v(d)), BigInt(v(d - 7))))
      val n = BigInt(pairs.length)
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val cov = n * sxy - sx * sy
      val (varx, vary) = (n * sxx - sx * sx, n * syy - sy * sy)
      val r2 = if (varx * vary == 0) None
        else Some((cov * cov * 1000000 / (varx * vary)).toLong)
      (pri, pairs.length.toLong, cov.signum.toLong, r2)
    }
    val got = run("q203_lag7_autocorrelation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == expected)
    // r² is a proper fraction of one million
    got.flatMap(_._4).foreach(r2 => assert(r2 >= 0L && r2 <= 1000000L))
  }

  // ---------------------------------------------------------------- q194

  test("binseg changepoint matches driver-side exhaustive split search") {
    val monthly = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority AS prio",
        "CAST((year(o_orderdate) - 1992) * 12 + month(o_orderdate) AS LONG) AS t",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val expected = monthly.keys.map(_._1).toSeq.distinct.sorted.map { prio =>
      val series = monthly.collect { case ((p, t), y) if p == prio => (t, y) }
        .toSeq.sortBy(_._1)
      val n = series.length
      val stot = series.map(_._2).sum
      val q = series.map(x => BigInt(x._2) * x._2).sum
      val scores = (1 until n).map { k =>
        val s1 = series.take(k).map(_._2).sum
        val score = s1.toDouble * s1.toDouble / k.toDouble +
          (stot - s1).toDouble * (stot - s1).toDouble / (n - k).toDouble
        (score, series(k - 1)._1) // split after the k-th point
      }
      val (bestScore, bestT) = scores.maxBy { case (sc, t) => (sc, -t) }
      val base = stot.toDouble * stot.toDouble / n.toDouble
      val r2 = (bestScore - base) / (q.toDouble - base)
      (prio, n.toLong, bestT, r2)
    }
    val got = run("q194_changepoint_binseg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    got.foreach { case (p, _, _, r2) => assert(r2 >= 0.0 && r2 <= 1.0, s"$p r2=$r2") }
  }

  // ---------------------------------------------------------------- q204

  test("activity bitmap census matches driver-side day-set brute force") {
    val ev = Tables.events(spark, sfDir)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "CAST(day(ts) AS INT) AS d")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val expected = ev.groupBy(_._1).values.toSeq
      .map { rows =>
        val days = rows.map(_._2).toSet
        val contiguous = days.max - days.min + 1 == days.size
        (days.size.toLong, if (contiguous) 1L else 0L, rows.length.toLong)
      }
      .groupBy(_._1).toSeq
      .map { case (nd, us) => (nd, us.length.toLong, us.map(_._2).sum, us.map(_._3).sum) }
      .sortBy(_._1)
    val got = run("q204_activity_bitmap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // every user appears exactly once across the histogram
    val nUsers = ev.map(_._1).distinct.length.toLong
    assert(got.map(_._2).sum == nUsers)
  }

  // ---------------------------------------------------------------- q206

  test("markov backtest matches driver-side argmax scoring") {
    val cutoff = 1706140800L
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._4, b._3) }
    }.toSeq
    val pred = pairs.filter(_._3 < cutoff)
      .groupBy(p => (p._1, p._2)).view.mapValues(_.size).toSeq
      .groupBy(_._1._1).view
      .mapValues(_.maxBy { case ((_, nxt), n) => (n, nxt) }(
        Ordering.Tuple2(Ordering.Int, Ordering.String.reverse))._1._2)
      .toMap
    val expected = pairs.filter(_._3 >= cutoff)
      .groupBy(_._1).toSeq
      .map { case (prev, ps) =>
        val p = pred.getOrElse(prev, "(none)")
        val correct = ps.count(_._2 == p).toLong
        (prev, p, ps.length.toLong, correct, correct * 1000000L / ps.length)
      }
      .sortBy(_._1)
    val got = run("q206_markov_backtest").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q205

  test("HHI concentration matches driver-side share arithmetic") {
    val supp = Tables.supplier(spark, sfDir)
      .selectExpr("CAST(s_suppkey AS LONG)", "CAST(s_nationkey AS LONG)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natName = Tables.nation(spark, sfDir)
      .selectExpr("CAST(n_nationkey AS LONG)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_suppkey AS LONG)", "CAST(floor(l_extendedprice*100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = rev.toSeq
      .map { case (sk, r) => (natName(supp(sk)), r) }
      .groupBy(_._1).toSeq
      .map { case (nat, rs) =>
        val tot = rs.map(_._2).sum
        val shares = rs.map(r => (BigInt(r._2) * 1000000 / tot).toLong)
        val hhi = shares.map(s => s * s).sum / 1000000L
        val band = if (hhi >= 250000L) "concentrated"
          else if (hhi >= 150000L) "moderate" else "unconcentrated"
        (nat, rs.length.toLong, tot, hhi, band)
      }
      .sortBy { case (nat, _, _, hhi, _) => (-hhi, nat) }
    val got = run("q205_hhi_concentration").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == expected)
    // shares of a nation sum to ~1e6, so HHI can never exceed monopoly
    got.foreach { case (n, _, _, hhi, _) => assert(hhi >= 0L && hhi <= 1000000L, n) }
  }

  // ---------------------------------------------------------------- q210

  test("decile mobility matches driver-side rank arithmetic") {
    def yearRev(y: Int): Map[Long, Long] = Tables.orders(spark, sfDir)
      .filter(s"o_orderdate >= '$y-01-01' AND o_orderdate < '${y + 1}-01-01'")
      .selectExpr("CAST(o_custkey AS LONG)", "CAST(floor(o_totalprice*100 + 0.5) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def deciles(rev: Map[Long, Long]): Map[Long, Long] = {
      val n = rev.size.toLong
      rev.toSeq.sortBy { case (c, r) => (-r, c) }.zipWithIndex
        .map { case ((c, _), i) => c -> (i.toLong * 10 / n + 1) }.toMap
    }
    val (d94, d95) = (deciles(yearRev(1995)), deciles(yearRev(1996)))
    val expected = d94.toSeq
      .map { case (c, from) => (from, d95.getOrElse(c, 0L)) }
      .groupBy(identity).toSeq
      .map { case ((f, t), xs) => (f, t, xs.length.toLong) }
      .sortBy(t => (t._1, t._2))
    val got = run("q210_decile_mobility").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // the matrix accounts for every 1994 customer exactly once
    assert(got.map(_._3).sum == d94.size.toLong)
  }

  // ---------------------------------------------------------------- q212

  test("revenue peaks match driver-side neighbor comparison") {
    val daily = Tables.orders(spark, sfDir)
      .filter("o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'")
      .selectExpr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def v(d: Long) = daily.getOrElse(d, 0L)
    val expected = (9132L to 9494L).flatMap { d =>
      val (vm, vv, vp) = (v(d - 1), v(d), v(d + 1))
      if (vv > vm && vv > vp && 5 * vv >= 3 * (vm + vp))
        // lift is NULL for an isolated spike (both neighbors zero)
        Some((d, vv, if (vm + vp == 0) None
          else Some((BigInt(vv) * 2000000 / (vm + vp)).toLong)))
      else None
    }
    val got = run("q212_revenue_peaks").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == expected)
    // every reported peak beats its neighbor average by >= 20%
    got.foreach { case (d, _, lift) =>
      lift.foreach(l => assert(l >= 1200000L, s"day $d")) }
  }

  // ---------------------------------------------------------------- q216

  test("survival life table matches driver-side risk-set accounting") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("CAST(o_custkey AS LONG)", "CAST(o_orderkey AS LONG)",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cens = orders.map(_._3).max
    val exits = orders.groupBy(_._1).values.toSeq.map { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val d1 = sorted.head
      val obs = if (sorted.length >= 2) sorted(1) - d1 else cens - d1
      (obs / 30, sorted.length >= 2)
    }
    val byBucket = exits.groupBy(_._1).view
      .mapValues(xs => (xs.count(_._2).toLong, xs.count(!_._2).toLong)).toMap
    val buckets = byBucket.keys.toSeq.sorted
    val expected = buckets.map { b =>
      val (ev, cz) = byBucket(b)
      val atRisk = buckets.filter(_ >= b).map(x => byBucket(x)._1 + byBucket(x)._2).sum
      (b, atRisk, ev, cz, ev * 1000000L / atRisk)
    }
    val got = run("q216_survival_life_table").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // the first risk set is the whole customer universe
    assert(got.head._2 == orders.map(_._1).distinct.length.toLong)
  }

  // ---------------------------------------------------------------- q217

  test("diversified topk honors the per-brand cap and global order") {
    val brandOf = Tables.part(spark, sfDir)
      .selectExpr("CAST(p_partkey AS LONG)", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'")
      .selectExpr("CAST(l_partkey AS LONG)", "CAST(floor(l_extendedprice*100 + 0.5) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val withBrandRank = rev.map { case (pk, rv) => (pk, brandOf(pk), rv) }
      .groupBy(_._2).values.flatMap { parts =>
        parts.toSeq.sortBy(p => (-p._3, p._1)).zipWithIndex
          .map { case ((pk, b, rv), i) => (pk, b, rv, i.toLong + 1) }
      }.toSeq
    val expected = withBrandRank.filter(_._4 <= 2)
      .sortBy(p => (-p._3, p._1)).take(10).zipWithIndex
      .map { case ((pk, b, rv, br), i) => (i.toLong + 1, pk, b, br, rv) }
    val got = run("q217_diversified_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // no brand appears more than twice
    got.groupBy(_._3).foreach { case (b, xs) => assert(xs.length <= 2, b) }
  }

  // ---------------------------------------------------------------- q218

  test("grouped mode matches driver-side frequency census") {
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(floor(l_quantity + 0.5) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = li.groupBy(_._1).toSeq.map { case (flag, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val mx = counts.values.max
      val tied = counts.filter(_._2 == mx).keys
      (flag, tied.min, mx, tied.size.toLong)
    }.sortBy(_._1)
    val got = run("q218_grouped_mode").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q219

  test("purchase regularity census matches driver-side gap moments") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("CAST(o_custkey AS LONG)", "CAST(o_orderkey AS LONG)",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perCust = orders.groupBy(_._1).values.toSeq.flatMap { rows =>
      val days = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val gaps = days.zip(days.tail).map { case (a, b) => b - a }
      if (gaps.length >= 2) {
        val (n, s, q) = (gaps.length.toLong, gaps.sum, gaps.map(g => g * g).sum)
        val band = if (s == 0) "degenerate" else {
          val cv2 = (n * q - s * s) * 1000000L / (s * s)
          if (cv2 <= 250000L) "clockwork"
          else if (cv2 <= 1000000L) "regular" else "erratic"
        }
        Some((band, n, s))
      } else None
    }
    val expected = perCust.groupBy(_._1).toSeq.map { case (band, xs) =>
      (band, xs.length.toLong, xs.map(_._3).sum / xs.map(_._2).sum)
    }.sortBy(_._1)
    val got = run("q219_purchase_regularity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q220

  test("struct argmin matches driver-side lexicographic minimum") {
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_partkey AS LONG)",
        "CAST(floor(l_extendedprice*100 + 0.5) AS LONG)", "CAST(l_suppkey AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = li.groupBy(_._1).toSeq.map { case (pk, rows) =>
      val (c, sk) = rows.map(r => (r._2, r._3)).min
      (pk, sk, c, rows.length.toLong)
    }.sortBy(_._1)
    val got = run("q220_argmin_struct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q221

  test("DAU/MAU stickiness matches driver-side trailing-window distinct") {
    val ud = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val (mn, mx) = (ud.map(_._2).min, ud.map(_._2).max)
    val byUser = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (mn to mx).map { d =>
      val dau = ud.count(_._2 == d).toLong
      val mau = byUser.values.count(days =>
        days.exists(a => a <= d && d <= a + 29)).toLong
      (d, dau, mau, if (mau == 0) None else Some(dau * 1000000L / mau))
    }
    val got = run("q221_dau_mau_stickiness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == expected)
    // MAU dominates DAU everywhere
    got.foreach { case (d, dau, mau, _) => assert(mau >= dau, s"day $d") }
  }
}
