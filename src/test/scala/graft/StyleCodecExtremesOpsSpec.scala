package graft

/** Semantics of the round-9 stylometry (q673–q675), storage-codec
  * (q676–q678) and extremes (q679–q681) batches beyond the oracle gate. */
class StyleCodecExtremesOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q673: full upper-triangle pair matrix with symmetric-free rows") {
    val rows = run("q673_stylometric_fingerprint").collect()
    val sources = rows.flatMap(r => Seq(r.getAs[String]("s1"),
      r.getAs[String]("s2"))).distinct.length
    assert(rows.length == sources * (sources - 1) / 2,
      s"$sources sources must give ${sources * (sources - 1) / 2} pairs")
    rows.foreach { r =>
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
      val d = r.getAs[Long]("l1_ppm")
      // L1 over 8 ppm coordinates is at most 8 × 1e6
      assert(d >= 0L && d <= 8000000L, s"l1 $d")
    }
  }

  test("q674: syllable classes partition the words") {
    val rows = run("q674_syllable_complexity_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mono_ppm") + r.getAs[Long]("poly3_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_syllables") <= 10L * r.getAs[Long]("n_words"),
        "vowel-group heuristic cannot plausibly exceed 10 syllables/word")
      assert(r.getAs[Long]("mean_syll_milli") >= 0L)
    }
  }

  test("q675: exclusivity is a sub-census of each source's bigrams") {
    val rows = run("q675_cross_source_bigram_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exclusive") <= r.getAs[Long]("n_bigrams"))
      val p = r.getAs[Long]("exclusive_ppm")
      assert(p >= 0L && p <= 1000000L)
    }
  }

  test("q676: every class charges exactly its Gorilla bit budget") {
    val bitOf = Map("a_zero" -> 1L, "b_7bit" -> 9L, "c_9bit" -> 12L,
      "d_12bit" -> 16L, "e_32bit" -> 36L)
    val rows = run("q676_gorilla_dod_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cls = r.getAs[String]("class")
      assert(bitOf.contains(cls), s"unknown class $cls")
      assert(r.getAs[Long]("total_bits") == bitOf(cls) * r.getAs[Long]("n"),
        s"$cls bits must be n × ${bitOf(cls)}")
      assert(r.getAs[Long]("ratio_ppm") == bitOf(cls) * 1000000L / 64L)
    }
  }

  test("q677: more bits mean fewer collisions, occupancy within bounds") {
    val rows = run("q677_bloom_fpr_empirical").collect().sortBy(_.getAs[Long]("m"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occupied")
        <= math.min(r.getAs[Long]("m"), r.getAs[Long]("n_members")))
      assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_probes"))
      assert(r.getAs[Long]("fpr_ppm") <= 1000000L)
    }
    rows.sliding(2).foreach { case Array(small, big) =>
      assert(small.getAs[Long]("fpr_ppm") >= big.getAs[Long]("fpr_ppm"),
        "growing the filter cannot raise the empirical FPR")
      assert(small.getAs[Long]("occupancy_ppm") >= big.getAs[Long]("occupancy_ppm"))
    }
  }

  test("q678: sorting by the packed key never packs worse") {
    val rows = run("q678_for_packing_layouts").collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("natural", "sorted"))
    assert(rows("natural").getAs[Long]("n_rows")
      == rows("sorted").getAs[Long]("n_rows"))
    assert(rows("sorted").getAs[Long]("packed_bits")
      <= rows("natural").getAs[Long]("packed_bits"),
      "FOR packing on the sort key must not lose to the natural layout")
    rows.values.foreach(r =>
      assert(r.getAs[Long]("ratio_ppm") <= 1000000L, "FOR cannot beat 64-bit raw... backwards"))
  }

  test("q679: both directions fold the same day population") {
    val rows = run("q679_sign_transfer_contingency").collect()
    assert(rows.length == 2)
    val totals = rows.map(r => r.getAs[Long]("n_uu") + r.getAs[Long]("n_ud")
      + r.getAs[Long]("n_du") + r.getAs[Long]("n_dd"))
    assert(totals.distinct.length == 1,
      "view→buy and buy→view see the same lag-aligned day count")
    assert(totals.head >= 1L)
    rows.foreach(r => assert(r.getAs[Long]("odds_ppm") >= 0L))
  }

  test("q680: clusters partition exceedances; the 90th percentile bites") {
    val r = run("q680_extremal_index_clusters").collect().head
    val nc = r.getAs[Long]("n_clusters"); val ne = r.getAs[Long]("n_exceed")
    assert(nc >= 1L && nc <= ne)
    assert(r.getAs[Long]("max_cluster_len") >= 1L
      && r.getAs[Long]("max_cluster_len") <= ne)
    val ei = r.getAs[Long]("extremal_index_ppm")
    assert(ei >= 1L && ei <= 1000000L)
    // at least 10% of days clear a <=90th-percentile threshold
    assert(ne * 10L >= r.getAs[Long]("n_days"))
  }

  test("q681: records thin out — year one holds the harmonic bulk") {
    val rows = run("q681_record_breaking_census").collect()
      .sortBy(_.getAs[Long]("yr"))
    assert(rows.nonEmpty)
    // the first observed day is a record by definition
    assert(rows.head.getAs[Long]("n_records") >= 1L)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_records") <= r.getAs[Long]("n_days")))
    // records among n iid days ~ H(n) ≈ ln n: year one must carry more
    // than any later year on a ~7-year series unless trending hard
    val first = rows.head.getAs[Long]("n_records")
    assert(rows.tail.forall(_.getAs[Long]("n_records") <= first + 2L),
      "late-year record surplus beyond slack — census wiring suspect")
  }
}
