package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-4 planning/ops operators (q125–q130) beyond
  * the oracle gate: driver-side brute force at the smallest SF and the
  * invariants the hash compare can't see.
  */
class PlanningOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---------------------------------------------------------------- q125

  test("weighted sampling matches driver-side priority brute force") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def keyHash(k: Long): Long = ((k % 2147483648L) * 2654435761L) % 4294967296L
    val expected = docs
      .map { case (id, w) => (id, w, w * 4294967296L / (keyHash(id) + 1)) }
      .sortBy { case (id, _, p) => (-p, id) }
      .take(200)
    val got = run("q125_weighted_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("weighted sampling favors heavier docs") {
    // mean weight of the sample must exceed the corpus mean: selection
    // odds are ∝ n_chars, so the sample is length-biased by design
    val all = Tables.documents(spark, sfDir).select("n_chars").collect().map(_.getLong(0))
    val sample = run("q125_weighted_sampling").collect().map(_.getLong(1))
    assert(sample.sum.toDouble / sample.length > all.sum.toDouble / all.length)
  }

  // ---------------------------------------------------------------- q126

  test("compaction plan: files cover chars, docs_per_file covers docs") {
    val rows = run("q126_compaction_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    for ((src, nDocs, totalChars, nFiles, docsPerFile) <- rows) {
      assert(nFiles == (totalChars + 16383) / 16384, s"$src files")
      assert(nFiles >= 1)
      assert(docsPerFile * nFiles >= nDocs, s"$src plan must place every doc")
      assert((docsPerFile - 1) * nFiles < nDocs, s"$src plan must not over-allocate")
    }
  }

  // ---------------------------------------------------------------- q128

  test("split leakage: group split leaks zero users, row split leaks some") {
    val rows = run("q128_split_leakage_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (gUsers, gLeak) = rows("group_hash")
    val (rUsers, rLeak) = rows("row_hash")
    assert(gUsers == rUsers, "both modes audit the same population")
    assert(gLeak == 0L, "group-keyed split must never split a user")
    // 15 users × ~67 events each at sf0.001: every user all but surely
    // draws both sides under a per-event split
    assert(rLeak > 0L, "row split should leak at this event density")
  }

  // ---------------------------------------------------------------- q130

  test("volume anomaly matches driver-side trailing-window brute force") {
    val daily = Tables.events(spark, sfDir)
      .selectExpr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400 AS day")
      .groupBy("day").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expected = daily.indices.drop(7).map { i =>
      val (day, x) = daily(i)
      val win = daily.slice(i - 7, i).map(_._2)
      val s = win.sum
      val q = win.map(v => BigInt(v) * v).sum
      val lhs = BigInt(7 * x - s) * (7 * x - s)
      val rhs = 4 * (7 * q - BigInt(s) * s)
      (day, x, s, if (lhs > rhs) 1L else 0L)
    }
    val got = run("q130_volume_anomaly").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q129

  test("basket triples match driver-side brute force") {
    val brand = Tables.part(spark, sfDir).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), brand(r.getLong(1))))
      .distinct.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted.toVector)
      .filter(_.length >= 3)
    val support = baskets.toSeq
      .flatMap(_.combinations(3))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (t, s) => (t(0), t(1), t(2), s) }
      .sortBy { case (a, b, c, s) => (-s, a, b, c) }
      .take(20)
    val got = run("q129_basket_triples").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == support)
  }

  // ---------------------------------------------------------------- q127

  test("embedding moments match driver-side brute force") {
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val got = run("q127_embedding_moments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == dims)
    for ((dim, n, mean, varM) <- got) {
      val qs = vecs.map(v => math.floor(v(dim.toInt).toDouble * 1000000 + 0.5).toLong)
      assert(n == qs.length.toLong)
      assert(mean == qs.sum / qs.length) // Long division truncates toward 0 like div
      val bn = BigInt(qs.length)
      val s = qs.map(BigInt(_)).sum
      val ss = qs.map(q => BigInt(q) * q).sum
      assert(varM == ((bn * ss - s * s) / (bn * bn)).toLong, s"dim $dim")
      assert(varM >= 0)
    }
  }

  // ---------------------------------------------------------------- q171

  test("column profile matches driver-side per-column stats") {
    val rows = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      graft.functions.Deterministic.cents(col("o_totalprice")).as("price_cents"),
      graft.functions.Deterministic.epochS(col("o_orderdate")).as("date_s"),
      col("o_orderpriority")).collect()
    val byCol: Map[String, Array[Option[Any]]] =
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "price_cents",
        "date_s", "o_orderpriority").zipWithIndex.map { case (c, i) =>
        c -> rows.map(r => if (r.isNullAt(i)) None else Some(r.get(i)))
      }.toMap
    val got = run("q171_column_profile").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got.keySet == byCol.keySet)
    for ((c, vals) <- byCol) {
      val present = vals.flatten
      val (nRows, nNulls, ndv, minR, maxR) = got(c)
      assert(nRows == rows.length.toLong, c)
      assert(nNulls == (vals.length - present.length).toLong, c)
      assert(ndv == present.distinct.length.toLong, c)
      val (expMin, expMax) = present.head match {
        case _: String =>
          val s = present.map(_.asInstanceOf[String]); (s.min, s.max)
        case _: Long =>
          val l = present.map(_.asInstanceOf[Long])
          (l.min.toString, l.max.toString)
      }
      assert(minR == expMin, c)
      assert(maxR == expMax, c)
    }
  }

  // ---------------------------------------------------------------- q175

  test("recency weights match driver-side half-life decay") {
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderpriority"),
      graft.functions.Deterministic.cents(col("o_totalprice")).as("vc"),
      (graft.functions.Deterministic.epochS(col("o_orderdate")) / 86400)
        .cast("long").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val refDay = o.map(_._3).max
    def wPpm(day: Long): Long = {
      val hl = (refDay - day) / 180
      if (hl >= 20) 0L else 1000000L / (1L << hl)
    }
    val grouped = o.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong,
        rows.map { case (_, vc, day) => BigInt(vc) * wPpm(day) }.sum)
    }.toMap
    val sumW = grouped.values.map(_._2).sum
    val got = run("q175_recency_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    for ((pr, n, eff, share) <- got) {
      val (en, ew) = grouped(pr)
      assert(n == en, pr)
      assert(eff == (ew / 1000000).toLong, pr)
      assert(share == (ew * 1000000 / sumW).toLong, pr)
    }
    assert(got.length == grouped.size)
  }

  // ---------------------------------------------------------------- q195

  test("weighted percentiles match driver-side cumulative brute force") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("source", "CAST(length(text) AS LONG) div 64 AS bin",
        "CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS LONG) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val hist = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      val cums = hist.scanLeft((0L, 0L)) { case ((_, c), (b, w)) => (b, c + w) }.tail
      def pick(num: Long, den: Long) =
        cums.collectFirst { case (b, c) if c * den >= tot * num => b }.get
      (src, tot, pick(1, 2) * 64, pick(9, 10) * 64)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q195_weighted_percentiles")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // p90 is at or above p50
    got.foreach { case (s, _, p50, p90) => assert(p90 >= p50, s) }
  }

  // ---------------------------------------------------------------- q199

  test("linear interpolation matches driver-side neighbor fill") {
    val sfDir = "/root/testdata/sf0.001"
    val daily = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .selectExpr("o_orderpriority AS pri",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val pris = Tables.orders(spark, sfDir)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    def truncDiv(a: Long, b: Long) = a / b // JVM / truncates toward zero, like div
    val expected = for {
      pri <- pris.toSeq; day <- 9131L to 9495L
      obs = daily.get((pri, day))
      lo = (9131L to day).reverse.collectFirst { case d if daily.contains((pri, d)) => d }
      hi = (day to 9495L).collectFirst { case d if daily.contains((pri, d)) => d }
    } yield {
      val v = obs.getOrElse((lo, hi) match {
        case (Some(l), Some(h)) =>
          daily((pri, l)) + truncDiv((daily((pri, h)) - daily((pri, l))) * (day - l), h - l)
        case (Some(l), None) => daily((pri, l))
        case (None, Some(h)) => daily((pri, h))
        case _ => 0L
      })
      (pri, day, v, obs.isEmpty)
    }
    val got = SparkEntry.queries("q199_linear_interpolation")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == expected)
    // gaps actually exist at this SF (the interpolation path is exercised)
    assert(got.count(_._4) > 0)
  }

  // ---------------------------------------------------------------- q201

  test("forecast backtest matches driver-side lag scoring") {
    val sfDir = "/root/testdata/sf0.001"
    val daily = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .selectExpr("o_orderpriority AS pri",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400 AS day",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS vc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val pris = Tables.orders(spark, sfDir)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).sorted
    val expected = pris.toSeq.map { pri =>
      def v(d: Long) = daily.getOrElse((pri, d), 0L)
      val days = 9138L to 9495L
      val sae1 = days.map(d => math.abs(v(d) - v(d - 1))).sum
      val sae7 = days.map(d => math.abs(v(d) - v(d - 7))).sum
      val n = days.length.toLong
      val winner = if (sae7 < sae1) "seasonal" else if (sae1 < sae7) "naive" else "tie"
      (pri, n, sae1 / n, sae7 / n, winner)
    }
    val got = SparkEntry.queries("q201_forecast_backtest")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == expected)
  }

  // ---------------------------------------------------------------- q207

  test("ABC-XYZ census matches driver-side cumulative-share + CV labels") {
    val li = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'")
      .selectExpr("CAST(l_partkey AS LONG) AS part", "CAST(month(l_shipdate) AS INT) AS m",
        "CAST(floor(l_extendedprice*100 + 0.5) AS LONG) AS c",
        "CAST(floor(l_quantity + 0.5) AS LONG) AS q")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val perPart = li.groupBy(_._1).toSeq.map { case (part, rows) =>
      val monthly = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).values.toSeq
      val s = monthly.sum
      val qq = monthly.map(q => q * q).sum
      val cv2 = ((BigInt(12) * qq - BigInt(s) * s) * 1000000 / (BigInt(s) * s)).toLong
      (part, rows.map(_._3).sum, cv2)
    }
    val tot = perPart.map(_._2).sum
    val ordered = perPart.sortBy { case (part, rev, _) => (-rev, part) }
    val cums = ordered.scanLeft(0L)(_ + _._2).tail
    val expected = ordered.zip(cums).map { case ((_, rev, cv2), cum) =>
      val cumPpm = (BigInt(cum) * 1000000 / tot).toLong
      val abc = if (cumPpm <= 800000L) "A" else if (cumPpm <= 950000L) "B" else "C"
      val xyz = if (cv2 <= 250000L) "X" else if (cv2 <= 1000000L) "Y" else "Z"
      (abc, xyz, rev)
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((abc, xyz), rs) => (abc, xyz, rs.length.toLong, rs.map(_._3).sum) }
      .sortBy(t => (t._1, t._2))
    val got = run("q207_abc_xyz_classes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // the census partitions all parts: counts sum to the part universe
    assert(got.map(_._3).sum == perPart.length.toLong)
  }

  // ---------------------------------------------------------------- q211

  test("growth bridge matches driver-side cross-ratio decomposition") {
    val brandOf = Tables.part(spark, sfDir)
      .selectExpr("CAST(p_partkey AS LONG)", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= '1995-01-01' AND l_shipdate < '1997-01-01'")
      .selectExpr("CAST(l_partkey AS LONG)", "l_shipdate < '1996-01-01'",
        "CAST(floor(l_extendedprice*100 + 0.5) AS LONG)",
        "CAST(floor(l_quantity + 0.5) AS LONG)")
      .collect()
      .map(r => (brandOf(r.getLong(0)), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    val expected = li.groupBy(_._1).toSeq.flatMap { case (brand, rows) =>
      val rev94 = rows.filter(_._2).map(_._3).sum
      val qty94 = rows.filter(_._2).map(_._4).sum
      val rev95 = rows.filterNot(_._2).map(_._3).sum
      val qty95 = rows.filterNot(_._2).map(_._4).sum
      if (rev94 > 0 && qty94 > 0) {
        def ppm(num: Long, den: Long) = (BigInt(num) * 1000000 / den).toLong
        val g = ppm(rev95 - rev94, rev94)
        val vl = ppm(qty95 - qty94, qty94)
        Some((brand, rev94, rev95, g, vl, g - vl))
      } else None
    }.sortBy(_._1)
    val got = run("q211_growth_bridge").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
    // the bridge closes: growth = volume + price/mix for every brand
    got.foreach { case (b, _, _, g, vl, pm) => assert(g == vl + pm, b) }
  }

  // ---------------------------------------------------------------- q213

  test("seat apportionment matches driver-side largest-remainder method") {
    val masses = Tables.documents(spark, sfDir)
      .selectExpr("source", "CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS LONG)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val total = masses.map(_._2).sum
    val base = masses.map { case (s, m) =>
      (s, m, (BigInt(m) * 1000 / total).toLong, (BigInt(m) * 1000 % total).toLong)
    }
    val deficit = 1000L - base.map(_._3).sum
    val extras = base.sortBy { case (s, _, _, rem) => (-rem, s) }
      .take(deficit.toInt).map(_._1).toSet
    val expected = base.map { case (s, m, b, _) =>
      val e = if (extras(s)) 1L else 0L
      (s, m, b, e, b + e)
    }
    val got = run("q213_seat_apportionment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // apportionment is exact: seats sum to precisely the 1000 budget
    assert(got.map(_._5).sum == 1000L)
  }
}
