package graft

/** Semantics of the round-10 order-structure batch: subsequence funnel
  * counting (q714), natural-runs sortedness census (q715). */
class SequenceCostOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  test("q714: buckets cover every user and totals sit inside their octave") {
    val rows = run("q714_subsequence_funnel_count").collect()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("n_users")).sum
    val allUsers = Tables.events(spark, sfMid)
      .filter("ts IS NOT NULL").select("user_id").distinct().count()
    assert(users == allUsers, s"census lost users: $users vs $allUsers")
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_paths")
      val n = r.getAs[Long]("n_users")
      val t = r.getAs[Long]("total_paths")
      // each user in octave b has paths in [2^b - 1, 2^(b+1) - 2]
      val lo = (1L << b) - 1
      val hi = (1L << (b + 1)) - 2
      assert(t >= n * lo && t <= n * hi,
        s"octave $b: total $t outside [${n * lo}, ${n * hi}]")
    }
  }

  test("q715: runs census is consistent and prices the merge") {
    val r = run("q715_natural_runs_census").collect().head
    val n = r.getAs[Long]("n")
    val runs = r.getAs[Long]("runs")
    assert(n > 0 && runs >= 1 && runs <= n)
    assert(r.getAs[Long]("runs_ppm") == runs * 1000000L / n)
    val passes = r.getAs[Long]("merge_passes")
    // ceil(log2(runs)): 2^passes >= runs > 2^(passes-1)
    assert((1L << passes) >= runs, s"2^$passes < $runs")
    if (passes > 0) assert((1L << (passes - 1)) < runs)
    // arrival order of a value stream is near-random: runs ≈ n/2
    assert(runs > n / 3 && runs < 2 * n / 3, s"runs $runs vs n $n")
  }
}
