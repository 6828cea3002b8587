package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState,
  MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Stateful streaming operators beyond the reference's windowed
  * aggregation (SURVEY.md §2.6 W8 notes these as the available-if-needed
  * surface): bounded-state streaming dedup and custom session state via
  * flatMapGroupsWithState.
  *
  * Scale: both operators keep per-key state in the state store, shuffled
  * by key once; watermarks bound state size (dedup entries and idle
  * sessions are evicted as event time passes), which is what makes them
  * runnable indefinitely on an unbounded stream.
  */
object Stateful {

  /** Streaming exact dedup with watermark-bounded state: drops events
    * whose `keyCols` were already seen within the watermark horizon.
    * The streaming member of the dedup family (graft.dedup.*). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  eventTimeCol: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionState(nEvents: Long, totalAmount: Double,
                                firstTsSec: Long, lastTsSec: Long)
  final case class SessionSummary(user_id: String, n_events: Long,
                                  total_amount: Double, duration_s: Long)

  /** Per-user session aggregation with a custom state machine: events
    * accumulate into open sessions; a session closes (and emits one
    * summary row) when no event arrives within `gapSeconds` of event
    * time — enforced by EventTimeTimeout against the stream's watermark.
    */
  def userSessions(events: DataFrame, gapSeconds: Long,
                   watermarkDelay: String = "30 seconds"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_timestamp", watermarkDelay)
      .selectExpr("user_id", "total_amount", "cast(event_timestamp as long) as ts_s",
        "event_timestamp")
      .as[(String, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: String, rows: Iterator[(String, Double, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close and emit
            val s = state.get
            state.remove()
            Iterator(SessionSummary(user, s.nEvents, s.totalAmount, s.lastTsSec - s.firstTsSec))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
            val next = batch.foldLeft(prev) { case (st, (_, amount, ts, _)) =>
              SessionState(st.nEvents + 1, st.totalAmount + amount,
                math.min(st.firstTsSec, ts), math.max(st.lastTsSec, ts))
            }
            state.update(next)
            state.setTimeoutTimestamp((next.lastTsSec + gapSeconds) * 1000L)
            Iterator.empty
          }
        })
  }

  final case class UserRunningTotal(user_id: String, n_orders: Long, total_amount: Double)

  /** The Spark 4 `transformWithState` form of per-key running state — the
    * successor API to (flat)mapGroupsWithState, with typed state
    * variables managed by the operator (and RocksDB-backed stores, the
    * provider transformWithState requires). Emits the updated per-user
    * running order count/total on every batch that touches the user. */
  class RunningTotalProcessor
      extends StatefulProcessor[String, (String, Double), UserRunningTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                                 timerValues: TimerValues): Iterator[UserRunningTotal] = {
      val (n0, sum0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var total = sum0
      rows.foreach { case (_, amount) => n += 1; total += amount }
      totals.update((n, total))
      Iterator.single(UserRunningTotal(key, n, total))
    }
  }

  /** Per-user running totals via transformWithState (update mode).
    *
    * Spark 4 supports transformWithState ONLY on the RocksDB state store
    * provider, while `GraftSession.configure` pins the HDFS-backed
    * provider for reference parity (SURVEY §2.12 W6) — so this operator
    * re-pins RocksDB on the session itself. The conf is read at
    * streaming-query START, so it covers the query the caller builds from
    * the returned Dataset; reference-parity pipelines that need the HDFS
    * provider should (re)`configure(spark)` before starting theirs. */
  def runningTotals(orders: DataFrame): Dataset[UserRunningTotal] = {
    val spark = orders.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    orders.selectExpr("user_id", "total_amount").as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class ActivitySnapshot(user_id: String, n_orders: Long,
                                    recent_kept: Long, recent_sum_cents: Long,
                                    n_types: Long, type_total: Long)

  /** The full Spark 4 state-v2 variable surface in one processor — the
    * three typed state shapes a real migration off
    * (flat)mapGroupsWithState reaches for:
    *
    *  - `ValueState[Long]`  "count"  — lifetime order count, optionally
    *    TTL'd (processing-time expiry; the "forget inactive users
    *    without a timer per key" shape);
    *  - `ListState[Long]`   "recent" — the last `recentCap` amounts in
    *    cents, trimmed on every batch (bounded by construction — the
    *    state-store analogue of a ring buffer);
    *  - `MapState[String, Long]` "types" — per-event-type counts (a
    *    keyed sub-aggregate INSIDE the key's state, which a ValueState
    *    of a map would rewrite wholesale on every update).
    *
    * Emits one snapshot per touched user per batch. */
  class UserActivityProcessor(recentCap: Int, countTtl: Option[java.time.Duration])
      extends StatefulProcessor[String, (String, String, Long), ActivitySnapshot] {
    @transient private var count: ValueState[Long] = _
    @transient private var recent: ListState[Long] = _
    @transient private var types: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = countTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, TTLConfig.NONE)
      types = getHandle.getMapState[String, Long](
        "types", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[(String, String, Long)],
                                 timerValues: TimerValues): Iterator[ActivitySnapshot] = {
      val batch = rows.toSeq
      val n = (if (count.exists()) count.get() else 0L) + batch.size
      count.update(n)
      val kept = (recent.get().toSeq ++ batch.map(_._3)).takeRight(recentCap)
      recent.put(kept.toArray)
      batch.groupBy(_._2).foreach { case (t, xs) =>
        val prev = if (types.containsKey(t)) types.getValue(t) else 0L
        types.updateValue(t, prev + xs.size)
      }
      val typePairs = types.iterator().toSeq
      Iterator.single(ActivitySnapshot(key, n, kept.size.toLong, kept.sum,
        typePairs.size.toLong, typePairs.map(_._2).sum))
    }
  }

  /** Per-user activity snapshots over (user_id, event_type,
    * amount_cents) rows via transformWithState with all three state-v2
    * variable types; `countTtl` puts a processing-time TTL on the
    * lifetime counter only. RocksDB re-pinned exactly as
    * [[runningTotals]] (transformWithState supports only RocksDB). */
  def userActivity(events: DataFrame, recentCap: Int = 3,
                   countTtl: Option[java.time.Duration] = None): Dataset[ActivitySnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // changelog checkpointing: commit appends a changelog instead of
    // uploading a full RocksDB snapshot per partition per batch — the
    // production configuration for any non-trivial state size
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // TTL requires processing-time semantics; without TTL, TimeMode.None
    // skips the timer column families entirely
    val mode = if (countTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.selectExpr("user_id", "event_type", "amount_cents")
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserActivityProcessor(recentCap, countTtl), mode,
        OutputMode.Update())
  }
}
