package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 operators (q92–q97) beyond the oracle gate:
  * brute-force equivalence on adversarial small inputs, invariants the
  * oracle can't see (orientation bounds, idempotence), and plan shape.
  */
class RefineryOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- q95

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val set = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      i <- nodes; j <- nodes if i < j && set((i, j))
      k <- nodes if j < k && set((j, k)) && set((i, k))
    } yield 1).size.toLong
  }

  private def orientedTriangles(edges: Seq[(Long, Long)]): Long = {
    // mirror of q95's dataflow, over an arbitrary edge list
    val pairs = edges.toDF("x", "y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .filter($"a" =!= $"b").distinct()
    val deg = pairs.select($"a".as("node")).union(pairs.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val oriented = pairs
      .join(deg.select($"node".as("a"), $"d".as("da")), Seq("a"))
      .join(deg.select($"node".as("b"), $"d".as("db")), Seq("b"))
      .select(
        when(struct($"da", $"a") < struct($"db", $"b"), $"a").otherwise($"b").as("u"),
        when(struct($"da", $"a") < struct($"db", $"b"), $"b").otherwise($"a").as("v"))
    val wedges = oriented.join(oriented.select($"u", $"v".as("w")), Seq("u"))
      .filter($"v" =!= $"w")
      .select($"v".as("u"), $"w".as("v"))
    wedges.join(oriented, Seq("u", "v"), "left_semi").count()
  }

  test("triangle count matches brute force on adversarial graphs") {
    val k5 = for (i <- 0L to 4L; j <- 0L to 4L if i < j) yield (i, j) // C(5,3)=10
    val star = (1L to 10L).map(i => (0L, i))                          // 0 triangles
    val rng = new scala.util.Random(7)
    val rand = Seq.fill(120)((rng.nextInt(12).toLong, rng.nextInt(12).toLong))
      .filter(e => e._1 != e._2)
    for (g <- Seq(k5, star, rand, k5 ++ star.map { case (a, b) => (a + 20, b + 20) }))
      assert(orientedTriangles(g) === bruteTriangles(g))
  }

  test("degree orientation bounds out-degree by O(sqrt(m))") {
    // wheel + clique mix: hub has high degree, must not be a wedge apex
    val hub = (1L to 40L).map(i => (0L, i))
    val clique = for (i <- 1L to 8L; j <- 1L to 8L if i < j) yield (i, j)
    val edges = (hub ++ clique).toDF("x", "y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b")).distinct()
    val deg = edges.select($"a".as("node")).union(edges.select($"b".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val outdeg = edges
      .join(deg.select($"node".as("a"), $"d".as("da")), Seq("a"))
      .join(deg.select($"node".as("b"), $"d".as("db")), Seq("b"))
      .select(when(struct($"da", $"a") < struct($"db", $"b"), $"a").otherwise($"b").as("u"))
      .groupBy($"u").agg(count(lit(1)).as("od"))
    val maxOut = outdeg.agg(max($"od")).as[Long].head()
    val m = edges.count()
    // hub's raw degree is 40; oriented out-degree must stay near sqrt(2m)
    assert(maxOut <= math.ceil(math.sqrt(2.0 * m)).toLong + 1,
      s"max out-degree $maxOut vs m=$m")
  }

  // ---------------------------------------------------------------- q96

  test("peak concurrency matches brute-force interval overlap") {
    val rng = new scala.util.Random(11)
    val starts = Seq.fill(200)(rng.nextInt(1000).toLong)
    val len = 37L
    // brute force: concurrency at time t = #intervals with s <= t < s+len;
    // peak is attained at some start point
    val expected = starts.map(t => starts.count(s => s <= t && t < s + len)).max
    val deltas = starts.toDF("t").select($"t", lit(1L).as("delta"))
      .union(starts.toDF("t").select(($"t" + len).as("t"), lit(-1L).as("delta")))
    val live = sum($"delta").over(Window.orderBy($"t"))
    val peak = deltas.select(live.as("live")).agg(max($"live")).as[Long].head()
    assert(peak === expected.toLong)
  }

  test("peak concurrency is tie-order independent (RANGE frame)") {
    // one interval ends exactly when another starts: end-exclusive
    // semantics demand concurrency 1 at the boundary, and the RANGE
    // frame nets +1/-1 at the same instant regardless of row order
    val deltas = Seq((0L, 1L), (10L, -1L), (10L, 1L), (20L, -1L)).toDF("t", "delta")
    val live = sum($"delta").over(Window.orderBy($"t"))
    val atBoundary = deltas.select($"t", live.as("live"))
      .filter($"t" === 10L).select($"live").distinct().as[Long].collect()
    assert(atBoundary.toSeq === Seq(1L))
  }

  // ---------------------------------------------------------------- q97

  test("cdc merge: delete wins, upsert wins, base survives, insert appears") {
    val base = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("key", "base_cents")
    val changes = Seq(
      (2L, 1L, 10L, "U", 999L),  // upsert key 2
      (3L, 2L, 10L, "U", 888L),  // then delete key 3
      (3L, 3L, 11L, "D", 0L),
      (4L, 4L, 12L, "U", 777L))  // insert key 4 (not in base)
      .toDF("key", "event_id", "ts_s", "op", "vc")
    val last = changes.groupBy($"key")
      .agg(max(struct($"ts_s", $"event_id", $"op", $"vc")).as("l"),
        count(lit(1)).as("n_changes"))
    val merged = base.join(last, Seq("key"), "full_outer")
      .filter($"l".isNull || $"l.op" =!= "D")
      .select($"key", coalesce($"l.vc", $"base_cents").as("val_cents"),
        when($"l".isNull, "base").when($"base_cents".isNull, "insert")
          .otherwise("upsert").as("src"))
      .orderBy($"key")
    assert(merged.collect().toSeq === Seq(
      Row(1L, 100L, "base"), Row(2L, 999L, "upsert"), Row(4L, 777L, "insert")))
  }

  test("cdc merge emits each surviving key exactly once, never null-valued") {
    val dir = "/root/testdata/sf0.001"
    val once = SparkEntry.queries("q97_cdc_merge")(spark, dir)
    assert(once.count() === once.select($"key").distinct().count())
    assert(once.filter($"val_cents".isNull).count() === 0)
    assert(once.filter($"src" === "base" && $"n_changes" =!= 0L).count() === 0)
    assert(once.filter($"src" === "upsert" && $"n_changes" === 0L).count() === 0)
  }

  // ---------------------------------------------------------------- q92

  test("segment dedup conserves segments; untouched docs come back verbatim") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q92_segment_dedup")(spark, dir)
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val joined = out.join(docs, Seq("doc_id"))
      .withColumn("n_seg",
        ceil(size(graft.text.TextFunctions.tokens($"text")) / lit(2.0)).cast("long"))
    // every segment is either kept or dropped — none invented, none lost
    assert(joined.filter($"n_kept" + $"n_dropped" =!= $"n_seg").count() === 0)
    // a document with nothing dropped reassembles to its exact original text
    assert(joined.filter($"n_dropped" === 0 && $"kept_text" =!= $"text").count() === 0)
  }

  test("segment dedup drops boilerplate and preserves order at sf0.01") {
    val out = SparkEntry.queries("q92_segment_dedup")(spark, "/root/testdata/sf0.01")
    val agg = out.agg(sum($"n_dropped"), count(when($"n_kept" === 0, 1))).head()
    assert(agg.getLong(0) > 0, "the sf0.01 corpus contains boilerplate segments")
    // kept_text loses 1..2 tokens per dropped segment (segments are 2
    // words wide; only a document's last segment can be 1 wide), and is
    // untouched when nothing was dropped
    val docs = Tables.documents(spark, "/root/testdata/sf0.01").select($"doc_id", $"text")
    val bad = out.join(docs, Seq("doc_id"))
      .select(size(graft.text.TextFunctions.tokens($"kept_text")).as("nk"),
        size(graft.text.TextFunctions.tokens($"text")).as("nt"), $"n_dropped")
      .filter(
        ($"n_dropped" === 0 && $"nk" =!= $"nt") ||
        ($"n_dropped" > 0 &&
          ($"nk" > $"nt" - $"n_dropped" || $"nk" < $"nt" - $"n_dropped" * 2)))
    assert(bad.count() === 0)
  }

  // ---------------------------------------------------------------- q93/q94

  test("oov fraction is bounded and zero for fully-templated corpora") {
    val out = SparkEntry.queries("q93_oov_bigram_quality")(spark, "/root/testdata/sf0.01")
    assert(out.filter($"oov_frac" < 0.0 || $"oov_frac" > 1.0).count() === 0)
    assert(out.filter($"n_oov" > $"n_bigrams").count() === 0)
  }

  test("length batching partitions every document exactly once, batches <= 8") {
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q94_length_bucketed_batching")(spark, dir)
    val total = out.agg(sum($"n_docs")).as[Long].head()
    assert(total === Tables.documents(spark, dir).count())
    assert(out.filter($"n_docs" > 8L || $"n_docs" < 1L).count() === 0)
    assert(out.filter($"pad_waste" < 0L).count() === 0)
    // waste is bounded: every member of a batch is within its 16-wide
    // length bucket of the max, so waste < 16 * n_docs
    assert(out.filter($"pad_waste" >= $"n_docs" * 16L).count() === 0)
  }

  // ---------------------------------------------------------------- q183

  test("rank surfaces (ntile/percent_rank/cume_dist) match brute force") {
    val sfDir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val expected = cust.groupBy(_._1).toSeq.flatMap { case (nk, rows) =>
      val sorted = rows.sortBy(r => (-r._3, r._2))
      val n = sorted.length
      // ntile: first (n % 10) buckets get one extra row
      val base = n / 10; val extra = n % 10
      def tileOf(idx: Int): Long = {
        var i = 0; var acc = 0
        while (i < 10) {
          val sz = base + (if (i < extra) 1 else 0)
          if (idx < acc + sz) return (i + 1).toLong
          acc += sz; i += 1
        }
        10L
      }
      sorted.zipWithIndex.map { case ((_, _, bal), idx) =>
        val pr = if (n == 1) 0.0 else idx.toDouble / (n - 1).toDouble
        val cd = (idx + 1).toDouble / n.toDouble
        (nk, tileOf(idx), math.floor(bal * 100 + 0.5).toLong, pr, cd)
      }.groupBy(_._2).toSeq.map { case (tile, xs) =>
        (nk, tile, xs.length.toLong, xs.map(_._3).sum,
          xs.map(_._4).min, xs.map(_._5).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q183_rank_surfaces")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == expected)
    // the top tile's max cume_dist is exactly 1.0 in every nation
    got.groupBy(_._1).values.foreach(rs => assert(rs.maxBy(_._2)._6 == 1.0))
  }

  // ---------------------------------------------------------------- q187

  test("lateral top-k matches driver-side per-customer brute force") {
    val sfDir = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1)).take(10)
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(floor(o_totalprice*100 + 0.5) AS LONG) AS pc",
        "CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) AS od_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = cust.flatMap { case (ck, bal) =>
      orders.getOrElse(ck, Array.empty[(Long, Long, Long, Long)]).toSeq
        .sortBy(o => (-o._4, o._2)).take(2)
        .map(o => (ck, math.floor(bal * 100 + 0.5).toLong, o._2, o._3, o._4))
    }.sortBy(t => (t._1, t._3))
    val got = SparkEntry.queries("q187_lateral_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected.toSeq)
  }

  // ---------------------------------------------------------------- q190

  test("NOT IN null trap: poisoned set yields 0, filtered agrees with NOT EXISTS") {
    val sfDir = "/root/testdata/sf0.001"
    val urgentKeys = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0))
    val minKey = urgentKeys.min
    val effective = urgentKeys.filter(_ != minKey).toSet
    val nCust = Tables.customer(spark, sfDir).count()
    val expectedFiltered = Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
      .count(k => !effective(k)).toLong
    val row = SparkEntry.queries("q190_not_in_null_trap")(spark, sfDir).collect().head
    assert(row.getLong(0) == 0L, "NOT IN against a null-bearing set is UNKNOWN-poisoned")
    assert(row.getLong(1) == expectedFiltered)
    assert(row.getLong(2) == expectedFiltered, "NOT EXISTS is null-immune")
    assert(expectedFiltered > 0L && expectedFiltered < nCust)
  }

  // ---------------------------------------------------------------- q191

  test("subsample stability matches driver-side hash-bit brute force") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "CAST(length(text) AS LONG) AS l")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (0 until 32).map { b =>
      val members = docs.filter { case (id, _) =>
        val bucket = ((BigInt(id) * 2654435761L) % BigInt(4294967296L)).toLong
        ((bucket >> b) & 1L) == 1L
      }
      val n = members.length.toLong
      (b.toLong, n, (BigInt(members.map(_._2).sum) * 1000 / n).toLong)
    }
    val got = SparkEntry.queries("q191_subsample_stability")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    // half-samples: every bucket holds roughly half the corpus
    val total = docs.length.toLong
    got.foreach { case (b, n, _) =>
      assert(n > total / 4 && n < 3 * total / 4, s"bucket $b size $n of $total")
    }
  }

  // ---------------------------------------------------------------- q193

  test("bag set ops match driver-side multiset arithmetic") {
    val sfDir = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, sfDir).select("c_nationkey")
      .collect().map(_.getInt(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val s = Tables.supplier(spark, sfDir).select("s_nationkey")
      .collect().map(_.getInt(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exAll = c.flatMap { case (k, n) =>
      val m = n - s.getOrElse(k, 0L); if (m > 0) Some((("except_all", k), m)) else None
    }
    val inAll = c.flatMap { case (k, n) =>
      val m = math.min(n, s.getOrElse(k, 0L)); if (m > 0) Some((("intersect_all", k), m)) else None
    }
    val expected = (exAll ++ inAll).toSeq
      .map { case ((op, k), m) => (op, k, m) }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q193_bag_set_ops")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }
}
