package graft

import org.apache.spark.sql.functions._

/** Semantics of the OLAP-engineering operators (q437–q439) beyond the
  * oracle gate. */
class OlapPlanOpsSpec extends SparkSpec {

  private val sfMid = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfMid)

  // ---------------------------------------------------------------- q437

  test("swag sliding max: decomposition agrees with the direct frame everywhere") {
    val rows = run("q437_swag_sliding_max").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_equal") == r.getAs[Long]("n_days"),
        s"SWAG != direct in month ${r.getAs[String]("month")}")
      assert(r.getAs[Long]("peak7_c") > 0L)
    }
    // full-window days only: first month loses the 6 warm-up days
    val total = rows.map(_.getAs[Long]("n_days")).sum
    val daily = Tables.orders(spark, sfMid)
      .select(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(datediff(max(col("day")), min(col("day"))) + 1).collect().head.getInt(0)
    assert(total == daily - 6L, "one row per day from day 6 onward")
  }

  // ---------------------------------------------------------------- q438

  test("neyman allocation: budget respected, sd exact, differs from proportional") {
    val rows = run("q438_neyman_allocation").collect()
    assert(rows.length == 25)
    val ney = rows.map(_.getAs[Long]("neyman_n")).sum
    val prop = rows.map(_.getAs[Long]("proportional_n")).sum
    // floor allocation: within 25 of the 1000 budget, never over
    assert(ney <= 1000L && ney > 975L - 25L, s"neyman sum $ney")
    assert(prop <= 1000L && prop > 950L, s"proportional sum $prop")
    // isqrt is exact: sd^2 <= var < (sd+1)^2, recomputed for one stratum
    val brand = rows.head.getAs[String]("p_brand")
    val st = Tables.lineitem(spark, sfMid)
      .join(broadcast(Tables.part(spark, sfMid)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === brand)
      .select(graft.functions.Deterministic.cents(col("l_extendedprice")).as("x"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sxx")).collect().head
    val n = st.getAs[Long]("n"); val sx = BigInt(st.getAs[Long]("sx"))
    val sxx = BigInt(st.getAs[Long]("sxx"))
    val v = (BigInt(n) * sxx - sx * sx) / (BigInt(n) * (n - 1))
    val sd = BigInt(rows.head.getAs[Long]("sd_c"))
    assert(sd * sd <= v && v < (sd + 1) * (sd + 1), s"isqrt exactness: $sd vs $v")
    // the designs must actually disagree somewhere (variance is not flat)
    assert(rows.exists(r =>
      r.getAs[Long]("neyman_n") != r.getAs[Long]("proportional_n")))
  }

  // ---------------------------------------------------------------- q439

  test("cube greedy: base never picked, picks are benefit argmaxes, submodular") {
    val rows = run("q439_cube_materialize_greedy").collect()
    assert(rows.length == 8)
    val base = rows.find(_.getAs[Long]("gid") == 0L).get
    assert(base.getAs[Long]("picked_round") == 0L)
    assert(rows.forall(_.getAs[Long]("size") <= base.getAs[Long]("size")),
      "base cuboid is the largest")
    val p1 = rows.filter(_.getAs[Long]("picked_round") == 1L)
    val p2 = rows.filter(_.getAs[Long]("picked_round") == 2L)
    assert(p1.length == 1 && p2.length == 1)
    val nonBase = rows.filter(_.getAs[Long]("gid") != 0L)
    assert(p1.head.getAs[Long]("benefit1") ==
      nonBase.map(_.getAs[Long]("benefit1")).max)
    // diminishing returns: materializing pick1 can only shrink benefits
    for (r <- rows)
      assert(r.getAs[Long]("benefit2") <= r.getAs[Long]("benefit1"),
        s"submodularity violated at ${r.getAs[String]("cuboid")}")
  }
}
