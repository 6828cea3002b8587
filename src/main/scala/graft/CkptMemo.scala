package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Cross-query memo of eagerly `localCheckpoint(true)`-materialized builds
  * (graph.Backbone, queries.SuffixDedupQueries), keyed per
  * (application, session, build key) so independent sessions never read
  * each other's checkpoint blocks.
  *
  * SELF-HEALING (round-13): a locally-checkpointed RDD whose blocks have
  * been dropped — e.g. by a blanket `unpersist` sweep from someone else's
  * cleanup — fails permanently with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; a
  * memo that kept handing out such a frame would poison every later
  * consumer. So a cache hit is validated first: every `LogicalRDD` leaf of
  * the cached plan must still be persisted (unpersist resets the RDD's
  * storage level to NONE). A dead entry is evicted and rebuilt instead of
  * returned. Validation is plan-tree inspection only — no job runs.
  */
final class CkptMemo[V] {
  private val map = new ConcurrentHashMap[String, V]()

  private def alive(df: DataFrame): Boolean =
    df.queryExecution.logical.collectLeaves().forall {
      case l: LogicalRDD => l.rdd.getStorageLevel != StorageLevel.NONE
      case _             => true
    }

  /** The memoized value for `key`, rebuilding if absent or if any of its
    * checkpointed frames (per `frames`) has lost its blocks. */
  def getOrBuild(spark: SparkSession, key: String)(build: => V)(frames: V => Seq[DataFrame]): V = {
    val k = s"${spark.sparkContext.applicationId}|${System.identityHashCode(spark)}|$key"
    val cached = map.computeIfAbsent(k, _ => build)
    if (frames(cached).forall(alive)) cached
    else {
      map.remove(k, cached)
      map.computeIfAbsent(k, _ => build)
    }
  }
}
