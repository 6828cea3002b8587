package graft

import org.apache.spark.sql.Row

/** Semantic invariants for the round-12 batch-2 queries (q745–q750)
  * beyond the DuckDB hash gate: conservation laws the numbers must obey
  * whatever the data says. */
class Round12OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()

  test("q745: the recursion conserves stock — every month's start equals " +
    "the prior end plus the arriving reorder, nothing goes negative") {
    val rows = run("q745_recursive_inventory_sim")
      .map(r => (r.getAs[Long]("m"), r.getAs[Long]("stock_start"),
        r.getAs[Long]("shipped"), r.getAs[Long]("lost"),
        r.getAs[Long]("stock_end"), r.getAs[Long]("on_order"))).sortBy(_._1)
    assert(rows.length == 12 && rows.map(_._1).toSeq == (1L to 12L))
    for ((m, start, shipped, lost, end, _) <- rows) {
      assert(start >= 0 && shipped >= 0 && lost >= 0 && end >= 0, s"month $m")
      assert(end == start - shipped, s"month $m: stock must balance")
      assert(shipped <= start, s"month $m: cannot ship more than held")
    }
    for (((_, _, _, _, end, onOrder), (_, start2, _, _, _, _)) <- rows.zip(rows.tail))
      assert(start2 == end + onOrder,
        "next month must start at prior end + arriving reorder")
  }

  test("q746: phrase hits exist, respect doc multiplicity, and every " +
    "reported phrase is from the dictionary") {
    val dict = Set("hash join", "table scan", "sort merge join",
      "slow query", "fast vector scan")
    val rows = run("q746_blocklist_phrase_match")
    assert(rows.nonEmpty, "2-token phrases over this vocabulary must hit")
    for (r <- rows) {
      assert(dict.contains(r.getAs[String]("phrase")))
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_hits"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
    assert(rows.exists(_.getAs[String]("phrase") == "hash join"),
      "the highest-frequency bigram phrase must appear")
  }

  test("q747: grid refinement can only split cells — n_fine ≥ n_coarse, " +
    "both bounded by the vector count") {
    for (r <- run("q747_box_counting_dimension")) {
      val (nv, nc, nf) = (r.getAs[Long]("n_vectors"),
        r.getAs[Long]("n_coarse"), r.getAs[Long]("n_fine"))
      assert(nc <= nf, "halving the cell width cannot merge cells")
      assert(nf <= nv && nc <= nv)
      assert(r.getAs[Long]("refine_ratio_ppm") >= 1000000L)
    }
  }

  test("q748: leakage pairs are canonical and mass-consistent with the " +
    "K=8 repeat floor and M=24 cap") {
    for (r <- run("q748_repeat_source_leakage")) {
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      val n = r.getAs[Long]("n_shared_repeats")
      val mass = r.getAs[Long]("leaked_tokens")
      assert(mass >= n * 8 && mass <= n * 24,
        "every shared repeat is 8..24 tokens by construction")
      assert(r.getAs[Long]("longest_shared") <= 24L)
    }
  }

  test("q749: every non-terminal prefix has a child, and terminals sum " +
    "to the ≤6-char vocabulary") {
    val rows = run("q749_trie_fanout_census").map(r =>
      (r.getAs[Long]("d"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_terminals"), r.getAs[Long]("n_child"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 6L))
    for ((d, nodes, terms, child) <- rows if d < 6)
      assert(child >= nodes - terms,
        s"depth $d: each of the ${nodes - terms} non-terminal prefixes " +
          "must contribute at least one depth-(d+1) node")
    import org.apache.spark.sql.functions._
    val vocabLe6 = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, 6))
      .select(col("w")).distinct().count()
    assert(rows.map(_._3).sum == vocabLe6,
      "terminals across depths 1..6 must enumerate the ≤6-char vocabulary")
  }

  test("q752: the 3×3 grid blocking misses NO neighbor pair — band " +
    "counts equal the all-pairs brute force") {
    import org.apache.spark.sql.functions._
    // reconstruct the xorshift coordinates in Scala
    def mix(k: Long, m1: Long, m2: Long): Long = {
      val a = ((k % 2147483648L) * m1) % 4294967296L
      val a2 = (((a ^ (a / 65536)) % 2147483648L) * m2) % 4294967296L
      (a2 ^ (a2 / 65536)) % 1000000L
    }
    val ids = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val pts = ids.map(k => (k, mix(k, 2246822519L, 2654435761L),
      mix(k, 2654435761L, 2246822519L)))
    val brute = scala.collection.mutable.Map[Long, Long]()
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val d = math.max(math.abs(pts(i)._2 - pts(j)._2),
        math.abs(pts(i)._3 - pts(j)._3))
      if (d <= 20000) {
        val band = d * 5 / 20001
        brute(band) = brute.getOrElse(band, 0L) + 1
      }
    }
    val got = run("q752_grid_neighbor_join")
      .map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_pairs")).toMap
    assert(got == brute.toMap,
      s"grid join must be exact: got $got, brute force ${brute.toMap}")
    assert(brute.values.sum > 0, "the fixture must produce neighbor pairs")
  }

  test("q753: the parameterized census partitions all orders and the " +
    "above-mean share stays a proper fraction") {
    val rows = run("q753_execute_immediate_params")
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    for (r <- rows) {
      assert(r.getAs[Long]("n_above_mean") <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("above_ppm") <= 1000000L)
    }
  }

  test("q751: SQL UDFs inline — no JVM-UDF wall in the plan — and the " +
    "band law n·lo ≤ mass ≤ n·hi holds with shares summing to ~1e6") {
    val df = SparkEntry.queries("q751_sql_udf_band_census")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "a SQL-defined function must inline into the plan, not wall it off")
    val rows = df.collect()
    for (r <- rows) {
      val (lo, hi, n, mass) = (r.getAs[Long]("band_lo_cents"),
        r.getAs[Long]("band_hi_cents"), r.getAs[Long]("n"), r.getAs[Long]("mass"))
      assert(n * lo <= mass && mass <= n * hi,
        s"band [$lo,$hi]: mass $mass must sit inside the band envelope")
    }
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 999900L && shares <= 1000000L,
      s"floor-divided shares must sum to just under 1e6, got $shares")
  }

  test("q754: the CMS inner product NEVER underestimates the join size, " +
    "and the min over rows is the tightest row") {
    val rows = run("q754_cms_join_size_estimate")
    assert(rows.length == 4)
    val exact = rows.head.getAs[Long]("exact_join_size")
    val est = rows.head.getAs[Long]("cms_estimate")
    for (r <- rows) {
      assert(r.getAs[Long]("row_estimate") >= exact,
        "a CMS row estimate must upper-bound the true inner product")
      assert(r.getAs[Long]("row_estimate") >= est)
      assert(r.getAs[Long]("overestimate_ppm") >= 0L)
    }
    assert(rows.map(_.getAs[Long]("row_estimate")).min == est)
    assert(exact > 0, "views and purchases must co-occur on some user")
  }

  test("q755: Sinkhorn's column-last scaling leaves small row-marginal " +
    "error after 3 rounds and positive transported mass everywhere") {
    for (r <- run("q755_sinkhorn_length_transport")) {
      val a = r.getAs[Long]("a_mass")
      assert(r.getAs[Long]("row_mass") > 0)
      assert(math.abs(r.getAs[Long]("marginal_err")) * 10 <= a,
        s"after 3 rounds each row marginal must be within 10% of its " +
          s"target (a=$a, err=${r.getAs[Long]("marginal_err")})")
      assert(r.getAs[Long]("row_cost") >= 0)
    }
  }

  test("q756: the level peel conserves keys (in − resolved = next " +
    "level's in) and resolves ≈1/e per level under the mixed hash") {
    val rows = run("q756_bbhash_level_census")
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("keys_in"),
        r.getAs[Long]("resolved"), r.getAs[Long]("unresolved"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 3L))
    for (((_, in, res, _), (_, in2, _, _)) <- rows.zip(rows.tail))
      assert(in2 == in - res, "colliding keys must all reach the next level")
    val (_, lin, lres, unresolved) = rows.last
    assert(unresolved == lin - lres)
    for ((l, in, res, _) <- rows)
      assert(res * 100 >= in * 25 && res * 100 <= in * 50,
        s"level $l: a real hash resolves ~37% at gamma=1, got $res/$in")
  }

  test("q757: the bit-sliced popcounts reconstruct the exact column sum") {
    val rows = run("q757_bit_sliced_index_sum")
    assert(rows.length == 6)
    val rec = rows.head.getAs[Long]("reconstructed_sum")
    assert(rows.forall(_.getAs[Long]("direct_sum") == rec),
      "the BSI identity must hold: sum of 2^b * popcount_b = sum(v)")
    assert(rows.map(r => r.getAs[Long]("weighted")).sum == rec)
    for (r <- rows) assert(r.getAs[Long]("density_ppm") <= 1000000L)
  }

  test("q758: B-cubed metrics are proper fractions, gold masses " +
    "partition the corpus, and F1 sits between P and R") {
    val rows = run("q758_bcubed_clustering_eval")
    val p = rows.head.getAs[Long]("precision_ppm")
    val rcl = rows.head.getAs[Long]("recall_ppm")
    val f1 = rows.head.getAs[Long]("f1_ppm")
    assert(p > 0 && p <= 1000000L && rcl > 0 && rcl <= 1000000L)
    assert(f1 >= math.min(p, rcl) - 1 && f1 <= math.max(p, rcl) + 1,
      "harmonic mean must sit between its arguments")
    assert(rows.map(_.getAs[Long]("n_gold")).sum ==
      Tables.embeddings(spark, sfDir).count())
    for (r <- rows) assert(r.getAs[Long]("label_recall_ppm") <= 1000000L)
  }

  test("q759: pointer doubling only contracts — the image size is " +
    "non-increasing and steps double each round") {
    val rows = run("q759_pointer_doubling_contraction")
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("steps"),
        r.getAs[Long]("image_size"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 5L))
    for ((rnd, steps, _) <- rows) assert(steps == (1L << rnd))
    for (((_, _, a), (_, _, b)) <- rows.zip(rows.tail))
      assert(b <= a, "composing f with itself cannot grow the image")
  }

  test("q750: deletion conserves tokens and matches q742's per-source " +
    "coverage exactly") {
    val impact = run("q750_dedup_impact_projection")
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens_before"), r.getAs[Long]("tokens_after"))).toMap
    val census = run("q742_maximal_repeat_census")
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Long]("dup_tokens"))).toMap
    assert(impact.keySet == census.keySet)
    for ((src, (before, after)) <- impact) {
      val (tokens, dup) = census(src)
      assert(before == tokens, s"$src: totals must agree with q742")
      assert(before - after == dup,
        s"$src: deleted mass must equal q742's span coverage")
      assert(after >= 0 && after <= before)
    }
  }
}
