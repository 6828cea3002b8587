package graft.similarity

import org.apache.spark.sql.DataFrame
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
  * Scale: the centroid table is tiny (k rows — collected/broadcast like
  * any trained model); assignment is a narrow codegen'd per-row argmax
  * (no join, no shuffle — only the k-row mean recomputes shuffle); a
  * probe touches ~corpus/k · nprobe rows instead of the whole corpus.
  */
object Ivf {

  /** Float vector → quantized long vector (same arithmetic the oracle
    * mirrors: floor(x·512 + 0.5) per element). Codegen'd kernel. */
  private def qvec(c: org.apache.spark.sql.Column) =
    graft.functions.expressions.quantize_vec(c)

  /** Integer cosine between two long vectors (columns); null for a zero
    * vector (matches DuckDB's x/0 → NULL rather than IEEE NaN). */
  private def cosLong(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
    val na = aggregate(transform(a, x => x * x), lit(0L), _ + _)
    val nb = aggregate(transform(b, x => x * x), lit(0L), _ + _)
    when(na === 0L || nb === 0L, lit(null).cast("double"))
      .otherwise(dot.cast("double") / sqrt(na.cast("double") * nb.cast("double")))
  }

  /** Elementwise floor-mean centroids of the given assignment, reduced
    * by the native `vector_sum` aggregate (one long[dim] buffer, one
    * fused loop per row; map-side partials carry k×dim longs into the
    * shuffle — the posexplode alternative shuffles n×dim rows).
    * Output: (cluster, centroid array<long>). */
  private def meanCentroids(assigned: DataFrame, dim: Int): DataFrame =
    assigned
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"),
        graft.functions.VectorAggregates.vector_sum(col("qv"), dim).as("__s"))
      // floor-mean: exact int sums, one double ÷ per element → identical
      // across engines, then floor (k rows — the interpreted transform
      // is off the hot path)
      .select(col("cluster"), transform(col("__s"), s => floor(s / col("__n"))).as("centroid"))

  /** Build the IVF index: returns (assignments, centroids).
    * assignments: (id, vec, qv, cluster); centroids: (cluster, centroid).
    * Seed cells = id mod k, then `iterations` Lloyd steps: each step
    * collects the k current centroids to the driver (k·dim longs —
    * model-scale metadata) and assigns every row with the codegen'd
    * `nearest_centroid` argmax, a narrow projection with no join and no
    * shuffle. The only shuffles in the whole build are the k-row
    * centroid mean aggregations (one per iteration + one final).
    * iterations=1 is the oracle-verified configuration; more iterations
    * improve recall without changing the dataflow shape.
    */
  def build(embeddings: DataFrame, idCol: String, vecCol: String, k: Int,
            iterations: Int = 1): (DataFrame, DataFrame) = {
    val base = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"), qvec(col(vecCol)).as("qv"))
    val dim = base.select(size(col("qv"))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        s"Ivf.build: embeddings input is empty — cannot infer vector dimension from '$vecCol'"))
    var assigned = base.withColumn("cluster", pmod(col("id"), lit(k.toLong)))
    var i = 0
    while (i < iterations) {
      val cents = meanCentroids(assigned, dim).orderBy(col("cluster")).collect()
      val ids = cents.map(_.getLong(0))
      val mats = cents.map(_.getSeq[Long](1).toArray)
      assigned = base.withColumn("cluster",
        graft.functions.expressions.nearest_centroid(col("qv"), mats, ids))
      i += 1
    }
    (assigned, meanCentroids(assigned, dim))
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
