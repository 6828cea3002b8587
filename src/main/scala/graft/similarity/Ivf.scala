package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.quantized_cosine

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into coarse cells around centroids; probe only the cells
  * whose centroids are nearest the query.
  *
  * Index build = one Lloyd iteration of k-means over QUANTIZED vectors
  * with integer-floor centroid means — every step is exact integer
  * arithmetic (then one double division for cosine), so build and probe
  * are bit-deterministic and reproducible by the SQL oracle. More Lloyd
  * iterations refine recall but don't change the dataflow shape.
  *
  * Scale: the centroid table is tiny (k rows) and broadcast everywhere;
  * assignment is a narrow broadcast-join + per-row argmax (one shuffle
  * for the mean recompute); a probe touches ~corpus/k · nprobe rows
  * instead of the whole corpus.
  */
object Ivf {

  /** Float vector → quantized long vector (same arithmetic the oracle
    * mirrors: floor(x·512 + 0.5) per element). */
  private def qvec(c: org.apache.spark.sql.Column) =
    transform(c, x => floor(x * lit(512.0d) + lit(0.5d)).cast("long"))

  /** Integer cosine between two long vectors (columns); null for a zero
    * vector (matches DuckDB's x/0 → NULL rather than IEEE NaN). */
  private def cosLong(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    val na = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val nb = aggregate(transform(b, x => x * x), lit(0L), _ + _)
    when(na === 0L || nb === 0L, lit(null).cast("double"))
      .otherwise(dot.cast("double") / sqrt(na.cast("double") * nb.cast("double")))
  }

  /** Elementwise floor-mean centroids of the given assignment.
    * Output: (cluster, centroid array<long>). */
  private def meanCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(floor(sum(col("v")) / count(lit(1))).as("m")) // floor-mean: exact ints ÷ → identical double → floor
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))), s => s.getField("m")).as("centroid"))

  /** Build the IVF index: returns (assignments, centroids).
    * assignments: (id, vec, qv, cluster); centroids: (cluster, centroid).
    * Seed cells = id mod k, then one Lloyd step (assign to nearest
    * centroid by integer cosine, deterministic tie-break on cluster id).
    */
  def build(embeddings: DataFrame, idCol: String, vecCol: String, k: Int): (DataFrame, DataFrame) = {
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"), qvec(col(vecCol)).as("qv"))
    val seeded = base.withColumn("cluster", pmod(col("id"), lit(k.toLong)))
    val cent0 = meanCentroids(seeded)
    val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cluster"))
    val reassigned = base
      .crossJoin(broadcast(cent0.select(col("cluster"), col("centroid"))))
      .withColumn("cos", cosLong(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("qv"), col("cluster"))
    (reassigned, meanCentroids(reassigned))
  }

  /** Probe: exact top-k by quantized cosine, restricted to the `nprobe`
    * cells nearest the query vector. Returns (id, cosine). */
  def probeTopK(assignments: DataFrame, centroids: DataFrame,
                queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val q = assignments.filter(col("id") === queryId)
      .select(col("qv").as("q_qv"), col("vec").as("q_vec"))
    val probedCells = centroids
      .crossJoin(broadcast(q))
      .withColumn("cos", cosLong(col("q_qv"), col("centroid")))
      .orderBy(col("cos").desc, col("cluster"))
      .limit(nprobe)
      .select(col("cluster"))
    assignments
      .join(broadcast(probedCells), Seq("cluster"), "left_semi")
      .filter(col("id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("id"), quantized_cosine(col("vec"), col("q_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
