package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Ecommerce

/** Property-based checks (SURVEY.md §5.3): window-assignment invariants,
  * aggregate algebra against a plain Scala fold, and from_json
  * schema-drift leniency under fuzzed payloads. */
class PropertySpec extends SparkSpec {

  private val tsGen: Gen[Long] = Gen.choose(1704067200L, 1704070800L) // one hour of epoch seconds

  /** Deterministic sampler: n draws from g with fixed seeds. */
  private def forSamples[T](g: Gen[T], n: Int = 5)(f: T => Unit): Unit =
    (0 until n).foreach(i => f(g.pureApply(Gen.Parameters.default, Seed(42L + i))))

  test("every event lands in exactly ceil(60/30)=2 sliding windows, each covering it") {
    import spark.implicits._
    forSamples(Gen.listOfN(50, tsGen)) { epochs =>
      {
        val df = epochs.map(e => new Timestamp(e * 1000L)).toDF("ts")
        val windows = df.select(col("ts"), window(col("ts"), "1 minute", "30 seconds"))
          .select(col("ts").cast("long").as("t"),
            col("window.start").cast("long").as("ws"),
            col("window.end").cast("long").as("we"))
          .collect()
        assert(windows.length === epochs.size * 2)
        windows.foreach { r =>
          val (t, ws, we) = (r.getLong(0), r.getLong(1), r.getLong(2))
          assert(ws <= t && t < we && we - ws === 60 && ws % 30 === 0)
        }
      }
    }
  }

  test("windowed aggregates equal a reference Scala fold per key") {
    import spark.implicits._
    val amountGen = Gen.choose(1, 50000).map(_ / 100.0)
    forSamples(Gen.listOfN(80, Gen.zip(tsGen, amountGen))) { events =>
      {
        val df = events.map { case (e, a) =>
          ("u" + (e % 7), "cat", "US", a, false, new Timestamp(e * 1000L))
        }.toDF("user_id", "category", "location", "total_amount", "is_fraud_simulation", "event_timestamp")
        val got = Ecommerce.windowedAggregations(df)
          .select(col("window_start").cast("long"), col("order_count"), col("max_order_value"), col("min_order_value"))
          .as[(Long, Long, Double, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        // reference fold: assign each event to its two windows
        val expected = events
          .flatMap { case (e, a) => Seq((e / 30 * 30, a), (e / 30 * 30 - 30, a)) }
          .groupBy(_._1)
          .map { case (ws, xs) => ws -> ((xs.size.toLong, xs.map(_._2).max, xs.map(_._2).min)) }
        assert(got === expected)
      }
    }
  }

  test("binned range join == naive theta join on arbitrary interval sets") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val pointGen = Gen.listOfN(200, Gen.choose(0L, 1000L))
    val ivGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 120L)))
    forSamples(Gen.zip(pointGen, ivGen)) { case (ps, ivs) =>
      val points = ps.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
      val intervals = ivs.zipWithIndex.map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
        .toDF("iid", "lo", "hi")
      val naive = points.join(intervals, col("t") >= col("lo") && col("t") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      for (bw <- Seq(13L, 100L)) {
        val binned = RangeJoin.pointInInterval(points, intervals, "t", "lo", "hi", bw)
          .select("pid", "iid").as[(Long, Long)].collect()
        assert(binned.length === binned.toSet.size, s"bw=$bw duplicated pairs")
        assert(binned.toSet === naive, s"bw=$bw mismatch")
      }
    }
  }

  test("sampling invariants: key-consistency and nesting for arbitrary fractions") {
    import spark.implicits._
    import graft.operators.Sampling
    forSamples(Gen.zip(Gen.choose(0.05, 0.95), Gen.choose(0.0, 1.0)), n = 3) {
      case (f1, scale) =>
        val f2 = f1 * scale // f2 <= f1
        val df = spark.range(5000).toDF("k")
        val big = Sampling.sampleByKey(df, col("k"), f1).as[Long].collect().toSet
        val small = Sampling.sampleByKey(df, col("k"), f2).as[Long].collect().toSet
        assert(small.subsetOf(big), s"f2=$f2 sample must nest inside f1=$f1")
        assert(math.abs(big.size - 5000 * f1) < 5000 * 0.1, s"f1=$f1 got ${big.size}")
    }
  }

  test("packing invariants: offset in [0,budget), bins monotone, position = running sum") {
    import spark.implicits._
    val lenGen = Gen.listOfN(60, Gen.choose(1L, 700L))
    forSamples(lenGen) { lens =>
      val budget = 512
      val df = lens.zipWithIndex
        .map { case (n, i) => (if (i % 2 == 0) "a" else "b", 0, i.toLong, n) }
        .toDF("lang", "shard", "doc_id", "n_tokens")
      val packed = graft.operators.Packing
        .packByRunningSum(df, Seq("lang", "shard"), "doc_id", "n_tokens", budget)
        .select("lang", "doc_id", "n_tokens", "bin", "bin_offset")
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2))
      for ((_, docs) <- packed) {
        var running = 0L
        var prevBin = 0L
        for ((_, _, n, bin, off) <- docs) {
          assert(off >= 0 && off < budget, s"offset $off out of [0,$budget)")
          assert(bin >= prevBin, "bins must be monotone in concatenation order")
          assert(bin * budget + off === running, "start position == running token sum")
          running += n
          prevBin = bin
        }
      }
    }
  }

  test("pagerank invariants: base floor, bounded total mass, in-degree monotonicity") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(80,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)).suchThat(e => e._1 != e._2))
    forSamples(edgeGen) { es =>
      val edges = es.distinct.toDF("src", "dst")
      val nodes = (0L to 19L).toDF("node")
      val ranks = graft.operators.PageRank.iterate(edges, nodes, 3)
        .as[(Long, Long)].collect().toMap
      // every node keeps at least the damping base
      assert(ranks.values.forall(_ >= 150000000L))
      // floor divisions only ever LOSE mass: total ≤ N·1e9 (plus base slack)
      assert(ranks.values.sum <= 20L * 1000000000L)
      // a node with no in-edges sits exactly at the base
      val dsts = es.map(_._2).toSet
      for (n <- 0L to 19L if !dsts.contains(n))
        assert(ranks(n) === 150000000L, s"in-edge-free node $n must hold the base rank")
    }
  }

  test("from_json never throws on drifted/garbage payloads; valid fields survive") {
    import spark.implicits._
    val junkGen = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"""{"order_id":"$s","user_id":"u"}"""),
      Gen.alphaNumStr.map(s => s"""{"unknown_field":"$s"}"""),
      Gen.alphaNumStr, // not JSON at all
      Gen.const("""{"order_id":123}""") // wrong type
    )
    forSamples(Gen.listOfN(30, junkGen)) { payloads =>
      {
        val df = payloads.toDF("v")
          .select(encode(col("v"), "utf-8").as("value"), lit(new Timestamp(0)).as("timestamp"))
        // must not throw; unparseable timestamps are filtered, not fatal
        val parsed = Ecommerce.parseOrders(df).collect()
        assert(parsed.length <= payloads.size)
      }
    }
  }

  test("suffixLoopPeriod kernel == Scala token-slice reference on fuzzed docs") {
    // small alphabet + variable whitespace maximizes accidental loops,
    // empty tokens, and boundary cases
    val tokGen = Gen.oneOf("a", "b", "ab", "ba", "aa", "", " ")
    val docGen = Gen.listOfN(12, tokGen).map(_.mkString(" "))
    def reference(text: String, maxP: Int): Int = {
      val tk = text.split(" ").filter(_.nonEmpty).toSeq
      val n = tk.length
      (1 to maxP).find(p =>
        n >= 2 * p && tk.slice(n - p, n) == tk.slice(n - 2 * p, n - p))
        .getOrElse(0)
    }
    forSamples(Gen.listOfN(200, docGen)) { docs =>
      import org.apache.spark.unsafe.types.UTF8String
      for (d <- docs; maxP <- Seq(1, 3)) {
        val got = functions.GraftHash.suffixLoopPeriod(UTF8String.fromString(d), maxP)
        assert(got == reference(d, maxP), s"doc='$d' maxP=$maxP")
      }
    }
  }
}
