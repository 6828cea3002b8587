package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the change-detection step of incremental
  * ingestion: given two versions of a table, classify every key as
  * added / removed / changed (unchanged rows are dropped — the output
  * is a changelog, not a copy).
  *
  * Scale design: each side is first reduced to (key, digest) with a
  * NARROW projection — the full-outer join then shuffles two slim
  * columns per row, never the payload, exactly like Dedup.exactGroups
  * shuffles digests instead of documents. Digest = md5 over '|'-joined
  * canonical string forms; callers pass integer-exact columns (cents,
  * epoch seconds — the repo determinism contract) so the digest is
  * engine-portable.
  */
object SnapshotDiff {

  /** md5 digest of the given columns, '|'-joined. Columns must already
    * be string-exact (ints/strings — no raw doubles/timestamps). */
  def rowDigest(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  /** Changelog between `oldDf` and `newDf` keyed by `keyCol`:
    * (key, status ∈ added|removed|changed). Rows with equal digests
    * (unchanged) are omitted. `digestCols` default to all non-key
    * columns of `newDf` (which must then match `oldDf`'s schema). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
           digestCols: Option[Seq[String]] = None): DataFrame = {
    val cols = digestCols.getOrElse(newDf.columns.filter(_ != keyCol).toSeq)
    val a = oldDf.select(col(keyCol).as("k"), rowDigest(cols.map(oldDf(_))).as("h_old"))
    val b = newDf.select(col(keyCol).as("k"), rowDigest(cols.map(newDf(_))).as("h_new"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("k").as(keyCol), col("status"))
  }
}
