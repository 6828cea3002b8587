package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-8 bench-floor investigation): split each query's
  * wall time into PLANNING (constructor + analysis + optimization +
  * physical planning, forced via `queryExecution.executedPlan`) and
  * EXECUTION (the noop write, which re-plans its own command — so the
  * sum slightly double-counts planning; the split is still the right
  * order-of-magnitude evidence for "is the sf0.01 floor launch-bound
  * or planning-bound"). Warm pass first, then one measured pass.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.configure(spark)
    // A/B lever for the launch-overhead investigation: AQE re-plans at
    // every exchange (one extra scheduling barrier each), which is pure
    // overhead at probe scale. SPARK_GRAFT_AQE=off isolates that cost.
    if (sys.env.get("SPARK_GRAFT_AQE").contains("off"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keySet.toSeq.sorted
    // warm-up: classes, codegen, parquet footers
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    var totPlan = 0.0; var totExec = 0.0
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan // force analyze+optimize+plan
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val plan = (t1 - t0) / 1e9; val exec = (t2 - t1) / 1e9
      totPlan += plan; totExec += exec
      System.err.println(f"[probe] $n%-36s plan=$plan%6.3f s exec=$exec%6.3f s")
    }
    println(f"""{"queries":${names.length},"plan_total":$totPlan%.2f,"exec_total":$totExec%.2f,"plan_avg":${totPlan / names.length}%.4f,"exec_avg":${totExec / names.length}%.4f}""")
    spark.stop()
  }
}
