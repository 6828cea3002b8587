package graft

import scala.jdk.CollectionConverters._

/** The relation cache's listener lifecycle (round-8 advice): invalidate
  * must remove the per-session listener from the shared SparkContext —
  * the listener's closure strongly captures its session, so leaving it
  * registered would pin one session per cycle for callers creating and
  * discarding many sessions over one long-lived context.
  */
class TablesCacheSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // listenerBus/listeners are private[spark]; Scala package-private is
  // public in bytecode, so plain reflection reaches them
  private def graftListenerCount: Int = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethod("listeners").invoke(bus)
      .asInstanceOf[java.util.List[_]].asScala
      .count(_.getClass.getName.startsWith("graft.Tables"))
  }

  test("invalidate drops the session's listener — no accumulation over session cycles") {
    Tables.table(spark, sfDir, "region") // settle the base session's entry
    val before = graftListenerCount
    val sessions = (1 to 5).map(_ => spark.newSession())
    sessions.foreach(s => Tables.table(s, sfDir, "region"))
    assert(graftListenerCount === before + 5,
      "each fresh session registers exactly one listener")
    sessions.foreach(Tables.invalidate)
    assert(graftListenerCount === before,
      "invalidate must remove the listener, not just the map entry")
    sessions.foreach(Tables.invalidate) // idempotent
    assert(graftListenerCount === before)
  }

  test("a session re-registers cleanly after invalidate") {
    val s = spark.newSession()
    val a = Tables.table(s, sfDir, "nation")
    Tables.invalidate(s)
    val b = Tables.table(s, sfDir, "nation")
    assert(!(a eq b), "invalidate must drop the cached plan")
    assert(b.count() === 25)
    Tables.invalidate(s)
  }
}
