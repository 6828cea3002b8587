package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-4 affinity/audit operators (q131–q135) beyond
  * the oracle gate: driver-side brute force at the smallest SF.
  */
class AffinityOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- q131

  test("source similarity matrix matches driver-side brute force") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty).toSet))
    val vocab = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    val sources = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
      (a, b) = (sources(i), sources(j))
      inter = (vocab(a) & vocab(b)).size.toLong
    } yield (a, b, vocab(a).size.toLong, vocab(b).size.toLong, inter,
      inter * 1000000L / (vocab(a).size + vocab(b).size - inter))).toSeq
    val got = run("q131_source_similarity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected.sortBy(t => (t._1, t._2)))
  }

  // ---------------------------------------------------------------- q132

  test("time-weighted average matches driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val holds = sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val span = holds.map(_._2).sum
      val vw = holds.map { case (v, g) => BigInt(v) * g }.sum
      (holds.length.toLong, span, (vw / span).toLong)
    }.toMap
    val got = run("q132_time_weighted_avg").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q134

  test("conversion latency quartiles match driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] =
      byUser(u).collect { case (_, t, s) if t == tpe && s > after => s }.minOption
    val lats = byUser.keys.toSeq.flatMap { u =>
      for {
        t1 <- firstAfter(u, "view", Long.MinValue)
        t2 <- firstAfter(u, "click", t1)
        t3 <- firstAfter(u, "purchase", t2)
      } yield (t3 - t1) / 60
    }.sorted
    val n = lats.length.toLong
    def pct(p: Long): Long = lats(((p * n + 99) / 100 - 1).toInt)
    val row = run("q134_conversion_latency").collect().head
    assert(row.getLong(0) == n)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == (pct(25), pct(50), pct(75)))
  }

  // ---------------------------------------------------------------- q133

  test("join blowup audit matches driver-side brute force") {
    val counts = Tables.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.map(c => BigInt(c) * c).sum
    val expected = counts.toSeq
      .map { case (u, c) => (u, c, c * c, (BigInt(c) * c * 1000000 / total).toLong) }
      .sortBy { case (u, _, c2, _) => (-c2, u) }.take(20)
    val got = run("q133_join_blowup_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q136

  test("temperature allocation: sqrt-weights flatten the distribution") {
    val rows = run("q136_temperature_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact weights
    for ((_, n, _, _) <- rows) assert(n > 0)
    val totalN = rows.map(_._2).sum
    val ws = rows.map(t => math.sqrt(t._2.toDouble).toLong)
    val sw = ws.sum
    for (((src, n, natPpm, tempPpm), w) <- rows.zip(ws)) {
      assert(natPpm == n * 1000000L / totalN, src)
      assert(tempPpm == w * 1000000L / sw, src)
    }
    // τ=0.5 compresses: the largest source's share must not grow, the
    // smallest source's share must not shrink
    val largest = rows.maxBy(_._2)
    val smallest = rows.minBy(_._2)
    assert(largest._4 <= largest._3)
    assert(smallest._4 >= smallest._3)
  }

  // ---------------------------------------------------------------- q137

  test("cluster purity: cells partition the corpus, purity bounded") {
    val rows = run("q137_cluster_purity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum == nVecs)
    val labels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().collect().map(_.getInt(0).toLong).toSet
    for ((cl, n, nLabels, majLabel, purity) <- rows) {
      assert(cl >= 0 && cl < 8)
      assert(nLabels >= 1 && nLabels <= labels.size)
      assert(labels.contains(majLabel))
      // majority share is at least 1/n_labels (pigeonhole) and ≤ 1
      assert(purity <= 1000000L, s"cell $cl")
      assert(purity >= 1000000L / nLabels - 1, s"cell $cl")
    }
  }

  // ---------------------------------------------------------------- q138

  test("degree histogram matches driver-side brute force") {
    val li = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs: Set[(Long, Long)] = li.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val ss = g.map(_._2).distinct.toSeq
        for (a <- ss; b <- ss if a < b) yield (a, b)
      }.toSet
    val deg = pairs.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val allSupp = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0))
    val expected = allSupp.map(s => deg.getOrElse(s, 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = run("q138_degree_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q139

  test("norm outliers match driver-side brute force P99") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 512 + 0.5).toLong)
          .map(q => q * q).sum))
    val n = vecs.length.toLong
    val buckets = vecs.map(_._2).sorted
    val cumTarget = (99 * n + 99) / 100
    // exactly as the query defines it: smallest bucket whose cumulative
    // count reaches the target
    val hist = buckets.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val cums = hist.scanLeft((0L, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }.drop(1)
    val thr = cums.collectFirst { case (b, cum) if cum >= cumTarget => b }.get
    val expected = vecs.filter(_._2 >= thr).map(v => (v._1, v._2)).sortBy(_._1)
    val got = run("q139_norm_outliers").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty && got.length <= math.max(1, (vecs.length * 3) / 100 + 1),
      "P99 gate should flag about 1% of vectors")
  }

  // ---------------------------------------------------------------- q140

  test("week-over-week growth matches driver-side brute force") {
    val weekly = Tables.orders(spark, sfDir)
      .selectExpr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 7 AS LONG) AS w",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val expected = weekly.zipWithIndex.map { case ((w, rev), i) =>
      val prev = if (i == 0) None else Some(weekly(i - 1)._2)
      (w, rev, prev, prev.map(p => (rev - p) * 1000000L / p))
    }
    val got = run("q140_wow_growth").collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q141

  test("volume trend slope matches driver-side least squares") {
    val daily = Tables.events(spark, sfDir)
      .selectExpr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS x")
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val n = BigInt(daily.length)
    val sx = daily.map(d => BigInt(d._1)).sum
    val sy = daily.map(d => BigInt(d._2)).sum
    val sxy = daily.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = daily.map { case (x, _) => BigInt(x) * x }.sum
    val expected = ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong
    val row = run("q141_volume_trend_slope").collect().head
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getLong(1) == sy.toLong)
    assert(row.getLong(2) == expected)
  }

  // ---------------------------------------------------------------- q142

  test("ship latency quartiles match driver-side brute force per group") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS od")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val lats = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey", "CAST(CAST(l_shipdate AS DATE) AS STRING) AS sd")
      .collect().map { r =>
        val (pr, od) = orders(r.getLong(0))
        val d = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(od), java.time.LocalDate.parse(r.getString(1)))
        (pr, d)
      }
    val expected = lats.groupBy(_._1).view.mapValues { g =>
      val ds = g.map(_._2).sorted
      val n = ds.length.toLong
      def pct(p: Long) = ds(((p * n + 99) / 100 - 1).toInt)
      (n, pct(25), pct(50), pct(75))
    }.toMap
    val got = run("q142_ship_latency_quartiles").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
  }

  // ---------------------------------------------------------------- q143

  test("cohort LTV matches driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = ev.filter(_._2 == "purchase")
      .groupBy(e => (cohort(e._1), e._3 - cohort(e._1))).view
      .mapValues(_.map(_._4).sum).toSeq
      .sortBy { case ((c, o), _) => (c, o) }
    val expected = cells.groupBy(_._1._1).toSeq.flatMap { case (c, rows) =>
      var cum = 0L
      rows.sortBy(_._1._2).map { case ((_, o), rev) =>
        cum += rev
        (c, o, rev, cum, cum / sizes(c))
      }
    }.sortBy(t => (t._1, t._2))
    val got = run("q143_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q144

  test("cart abandonment matches driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS day")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(e => e._2 == "click" || e._2 == "purchase")
    val expected = ev.groupBy(e => (e._1, e._3)).view
      .mapValues(g => (g.exists(_._2 == "click"), g.exists(_._2 == "purchase")))
      .toSeq.collect { case ((_, day), (true, purchased)) => (day, purchased) }
      .groupBy(_._1).view
      .mapValues { g =>
        val n = g.size.toLong
        val ab = g.count(!_._2).toLong
        (n, ab, ab * 1000000L / n)
      }.toSeq.map { case (d, (n, ab, ppm)) => (d, n, ab, ppm) }.sortBy(_._1)
    val got = run("q144_cart_abandonment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q145

  test("OOV rate by cutoff matches brute force and complements coverage") {
    val toks = Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = toks.length.toLong
    val got = run("q145_oov_rate_by_cutoff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 5L, 10L, 100L))
    for ((c, kept, lost, ppm) <- got) {
      assert(kept == freq.values.count(_ >= c).toLong, s"cutoff $c kept")
      assert(lost == freq.values.filter(_ < c).sum, s"cutoff $c lost")
      assert(ppm == lost * 1000000L / t)
    }
    // monotone: a stricter cutoff keeps fewer entries, loses more mass
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
  }

  // ---------------------------------------------------------------- q146

  test("robust median/MAD outliers match driver-side brute force") {
    val vals = Tables.orders(spark, sfDir)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS LONG) div 100 AS v")
      .collect().map(_.getLong(0))
    def lowerMedian(xs: Array[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2 - 1).toInt)
    }
    val med = lowerMedian(vals)
    val mad = lowerMedian(vals.map(v => math.abs(v - med)))
    val outliers = vals.filter(v => math.abs(v - med) * 10000 > mad * 44478)
    val row = run("q146_robust_outliers").collect().head
    assert(row.getLong(0) == vals.length.toLong)
    assert(row.getLong(1) == med)
    assert(row.getLong(2) == mad)
    assert(row.getLong(3) == outliers.length.toLong)
    if (outliers.nonEmpty) assert(row.getLong(4) == outliers.min)
    else assert(row.isNullAt(4))
  }

  // ---------------------------------------------------------------- q147

  test("reference calibration matches driver-side CDF lookup") {
    val rows = Tables.orders(spark, sfDir)
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS LONG) div 100 AS d",
        "o_orderdate < '1998-01-01' AS is_ref")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val ref = rows.collect { case (d, true) => d }.sorted
    val nRef = ref.length.toLong
    val newByBucket = rows.collect { case (d, false) => d }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val expected = newByBucket.map { case (d, ct) =>
      val cum = ref.count(_ <= d).toLong
      (d, ct, cum, cum * 1000000L / nRef)
    }
    val got = run("q147_reference_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // calibration is a CDF: monotone in the bucket value
    val ppms = got.map(_._4)
    assert(ppms.toSeq == ppms.toSeq.sorted)
  }

  // ---------------------------------------------------------------- q148

  test("weekly drift matches driver-side TV between consecutive weeks") {
    val rows = Tables.orders(spark, sfDir)
      .selectExpr(
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') div 7 AS LONG) AS w",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) div 100 AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap)
      .toMap
    val expected = byWeek.keys.toSeq.sorted.flatMap { w =>
      byWeek.get(w - 1).map { prev =>
        val cur = byWeek(w)
        val (t, tp) = (cur.values.sum, prev.values.sum)
        val num = (cur.keySet ++ prev.keySet).toSeq.map { d =>
          (BigInt(cur.getOrElse(d, 0L)) * tp - BigInt(prev.getOrElse(d, 0L)) * t).abs
        }.sum
        (w, t, tp, (num * 1000000 / (2 * BigInt(t) * tp)).toLong)
      }
    }
    val got = run("q148_weekly_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q135

  test("dup size histogram: docs partition the corpus, removable consistent") {
    val rows = run("q135_dup_size_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum == nDocs)
    val totalRemovable = rows.map { case (sz, nc, _, _) => (sz - 1) * nc }.sum
    for ((sz, nc, nd, ppm) <- rows) {
      assert(nd == sz * nc)
      assert(ppm == (sz - 1) * nc * 1000000L / nDocs)
    }
    assert(totalRemovable >= 0 && totalRemovable < nDocs)
  }

  // ---------------------------------------------------------------- q154

  test("lexical richness matches driver-side token census") {
    val toks = Tables.documents(spark, sfDir)
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(r.getString(0) -> _))
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      val freq = ts.map(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      val (nTok, nTyp) = (ts.length.toLong, freq.size.toLong)
      val hapax = freq.count(_._2 == 1L).toLong
      (nTok, nTyp, hapax, nTyp * 1000000L / nTok, hapax * 1000000L / nTyp)
    }.toMap
    val got = run("q154_lexical_richness").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.map(_._1).toSeq == expected.keys.toSeq.sorted)
    for ((s, t) <- got) assert(t == expected(s), s"source $s")
  }

  // ---------------------------------------------------------------- q166

  test("source keyness matches driver-side lift ranking") {
    val toks = Tables.documents(spark, sfDir)
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(r.getString(0) -> _))
    val st = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val glob = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val srcTot = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val tAll = toks.length.toLong
    val expected = st.toSeq.collect {
      case ((s, tok), c) if c >= 5 =>
        (s, tok, c, (BigInt(c) * tAll * 1000000 / (BigInt(glob(tok)) * srcTot(s))).toLong)
    }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex.map {
        case ((src, tok, c, lift), i) => (src, i + 1L, tok, c, lift)
      }
    }
    val got = run("q166_source_keyness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q184

  test("marker-segmented cumsum matches driver-side brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s",
        "CAST(floor(value * 100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      // segment id = number of purchases strictly before this row
      val segIds = sorted.scanLeft(0L)((s, r) => if (r._3 == "purchase") s + 1 else s).init
      sorted.zip(segIds).groupBy(_._2).toSeq.collect {
        case (seg, seg_rows) if seg_rows.exists(_._1._3 == "purchase") =>
          (u, seg, seg_rows.length.toLong,
            seg_rows.collect { case ((_, _, t, _, v), _) if t != "purchase" => v }.sum,
            seg_rows.collect { case ((_, _, "purchase", _, v), _) => v }.sum)
      }
    }.sortBy(t => (t._1, t._2))
    val got = run("q184_marker_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // every closed segment ends with exactly one purchase: purchase value
    // equals that event's value, and the count of output rows is the
    // corpus-wide purchase count
    val nPurchases = ev.count(_._3 == "purchase").toLong
    assert(got.length.toLong == nPurchases)
  }

  // ---------------------------------------------------------------- q192

  test("longest streak matches driver-side gaps-and-islands brute force") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val expected = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted
      val runs = days.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, d)                               => List((d, 1L))
        case ((last, len) :: tl, d) if d == last + 1 => (d, len + 1) :: tl
        case (acc, d)                               => (d, 1L) :: acc
      }.map(_._2)
      (u, days.length.toLong, runs.max, runs.length.toLong)
    }.sortBy(_._1)
    val got = run("q192_longest_streak").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // islands partition active days: streak <= active days, islands >= 1
    got.foreach { case (u, nd, ls, ni) =>
      assert(ls <= nd && ni >= 1 && ls >= 1, s"user $u")
    }
  }

  // ---------------------------------------------------------------- q196

  test("union-by-name schema evolution matches driver-side merge") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "event_type",
        "CAST(floor(value*100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = ev.groupBy { case (id, tpe, _) =>
      if (id % 2 == 0) "legacy" else tpe
    }.view.mapValues(rows => (rows.length.toLong, rows.map(_._3).sum))
      .toSeq.map { case (ch, (n, s)) => (ch, n, s) }.sortBy(_._1)
    val got = run("q196_union_by_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // the legacy (pre-channel) cohort survives the merge as its own bucket
    assert(got.exists(_._1 == "legacy"))
  }

  // ---------------------------------------------------------------- q200

  test("interval-union coverage matches driver-side sweep merge") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = ev.groupBy(_._1).view.mapValues { rows =>
      val iv = rows.map(_._2).sorted.map(s => (s, s + 1800L))
      val islands = iv.tail.foldLeft(List(iv.head)) { case (acc @ (st, en) :: rest, (s, e)) =>
        if (s >= en) (s, e) :: acc
        else (st, math.max(en, e)) :: rest
      }
      (islands.length.toLong, islands.map { case (st, en) => en - st }.sum)
    }.toMap
    val expected = perUser.values.groupBy(_._1).toSeq
      .map { case (n, us) =>
        (n, us.size.toLong, us.map(_._2).sum, us.map(_._2).max)
      }.sortBy(_._1)
    val got = run("q200_interval_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // merging actually happened: some user has fewer islands than events
    val eventsPerUser = ev.groupBy(_._1).view.mapValues(_.length.toLong)
    assert(perUser.exists { case (u, (n, _)) => n < eventsPerUser(u) })
  }

  // ---------------------------------------------------------------- q202

  test("null-safe join keeps the NULL-key cohort and stays an equi-join") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("NULLIF(event_type, 'view') AS k",
        "CAST(floor(value*100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (Option(r.get(0)).map(_.toString), r.getLong(1)))
    val expected = ev.groupBy(_._1).toSeq
      .map { case (k, rows) =>
        (k.getOrElse("organic"), rows.length.toLong, rows.length.toLong,
          rows.map(_._2).sum, true)
      }.sortBy(_._1)
    val df = run("q202_null_safe_join")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == expected)
    // the organic (NULL-key) cohort survived — a plain equi-join drops it
    assert(got.exists(_._1 == "organic"))
    // EqualNullSafe still plans as an equi-join, never a nested loop
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  // ---------------------------------------------------------------- q185

  test("two-hop reach matches driver-side BFS brute force") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = li.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val sks = g.map(_._2).distinct.toSeq
        for (a <- sks; b <- sks if a != b) yield (a, b)
      }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") <= 10).select("s_suppkey")
      .collect().map(_.getLong(0)).sorted
    val expected = seeds.map { s =>
      val h1 = adj.getOrElse(s, Set.empty)
      val h2 = h1.flatMap(v => adj.getOrElse(v, Set.empty))
      val reach = (h1 ++ h2) - s
      (s, (h1 - s).size.toLong, reach.size.toLong)
    }
    val got = run("q185_two_hop_reach").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    // reach is monotone: two-hop set contains the one-hop set
    got.foreach { case (s, n1, n2) => assert(n2 >= n1, s"seed $s") }
  }

  // ---------------------------------------------------------------- q208

  test("recovery as-of histogram matches driver-side forward scan") {
    val ev = Tables.events(spark, sfDir)
      .filter("event_type IN ('error', 'purchase')")
      .selectExpr("user_id", "event_id", "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val buckets = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.zipWithIndex.collect { case ((_, _, ts, "error"), i) =>
        val nextP = sorted.drop(i + 1).collectFirst { case (_, _, p, "purchase") => p }
        nextP match {
          case Some(p) if p - ts <= 3600L => (p - ts) / 600L
          case _ => -1L
        }
      }
    }
    val expected = buckets.groupBy(identity).toSeq
      .map { case (b, bs) => (b, bs.length.toLong) }.sortBy(_._1)
    val got = run("q208_recovery_asof").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    // histogram accounts for every error event exactly once
    assert(got.map(_._2).sum == ev.count(_._4 == "error").toLong)
  }

  // ---------------------------------------------------------------- q209

  test("simpson audit matches driver-side sign algebra") {
    val cust = Tables.customer(spark, sfDir)
      .filter("c_mktsegment IN ('BUILDING', 'MACHINERY')")
      .selectExpr("CAST(c_custkey AS LONG)", "c_mktsegment", "CAST(c_nationkey AS LONG)")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val natName = Tables.nation(spark, sfDir)
      .selectExpr("CAST(n_nationkey AS LONG)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("CAST(o_custkey AS LONG)", "CAST(floor(o_totalprice*100 + 0.5) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ck, c) => cust.get(ck).map { case (seg, nk) => (natName(nk), seg, c) } }
    val byNation = orders.groupBy(_._1)
    val (tS1, tN1) = (orders.filter(_._2 == "BUILDING").map(_._3).sum,
      orders.count(_._2 == "BUILDING").toLong)
    val (tS2, tN2) = (orders.filter(_._2 == "MACHINERY").map(_._3).sum,
      orders.count(_._2 == "MACHINERY").toLong)
    val odir = (BigInt(tS1) * tN2 - BigInt(tS2) * tN1).signum.toLong
    val expected = byNation.toSeq.map { case (nat, rows) =>
      val s1 = rows.filter(_._2 == "BUILDING").map(_._3).sum
      val n1 = rows.count(_._2 == "BUILDING").toLong
      val s2 = rows.filter(_._2 == "MACHINERY").map(_._3).sum
      val n2 = rows.count(_._2 == "MACHINERY").toLong
      val dir = (BigInt(s1) * n2 - BigInt(s2) * n1).signum.toLong
      val verdict = if (dir == 0L || odir == 0L) "tie"
        else if (dir == odir) "consistent" else "reversed"
      (nat, n1, n2, dir, odir, verdict)
    }.sortBy(_._1)
    val got = run("q209_simpson_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.toSeq == expected)
  }
}
