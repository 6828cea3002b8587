package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import VectorOps._

/** Similarity search over an embedding column.
  *
  * Two paths, same semantics:
  *  - `bruteForceTopK`: exact scan — the query vector is broadcast (a
  *    one-row dimension), each partition scores its slice, and
  *    orderBy+limit plans as TakeOrderedAndProject (per-partition top-k
  *    heaps, no global sort). O(n·d) work, minimal shuffle: the right
  *    baseline, and at 100 TB still the correct *exact* answer.
  *  - `lshTopK`: approximate scale path — sign-random-projection LSH
  *    (Charikar 2002): `planes` deterministic integer hyperplanes bucket
  *    the corpus; only the query's bucket (Hamming-adjacent buckets
  *    optional) is scored. Corpus bucketing is a narrow projection; the
  *    probe is a semi-join on bucket id, so the scored candidate set —
  *    not the corpus — bounds the work.
  *
  * Hyperplane components are pseudo-random integers derived from (plane,
  * dim) by a splitmix-style mix — deterministic, reproducible anywhere,
  * no stored model.
  */
object Knn {

  /** Exact top-k by quantized cosine against the embedding of `queryId`.
    * Ties broken by id for full determinism. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    embeddings
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col(idCol),
        graft.functions.expressions.quantized_cosine(col(vecCol), col("q_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1000, 1000]:
    * mix(plane, dim) — same formula the oracle SQL reproduces. */
  private def planeComponent(plane: Int, dimCol: org.apache.spark.sql.Column) =
    (lit(plane.toLong * 2654435761L) + dimCol * lit(40503L)) % lit(2001L) - lit(1000L)

  /** Sign-LSH bucket id (one long, `planes` bits) for each embedding.
    * Codegen'd fused kernel; `lshBucketHof` is the executable spec. */
  def lshBucket(vecCol: org.apache.spark.sql.Column, planes: Int): org.apache.spark.sql.Column =
    graft.functions.expressions.sign_lsh_bucket(vecCol, planes)

  /** HOF reference form of `lshBucket` (interpreted — spec only). */
  def lshBucketHof(vecCol: org.apache.spark.sql.Column, planes: Int): org.apache.spark.sql.Column = {
    val qv = quantize(vecCol)
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(qv, sequence(lit(0L), size(qv).cast("long") - lit(1L)), (x, i) => x * planeComponent(p, i)),
        lit(0L), _ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate top-k: score only the corpus bucket the query lands in.
    * Returns (id, cosine) — a subset ranking of bruteForceTopK. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = embeddings.select(col(idCol), col(vecCol), lshBucket(col(vecCol), planes).as("bucket"))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("bucket"))
    bucketed
      .filter(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("bucket"))
      .select(col(idCol), graft.functions.expressions.quantized_cosine(col(vecCol), col("q_vec")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All pairs above a cosine threshold, blocked on a partition column
    * (e.g. a cluster/label id): the self-join shuffles once on the block
    * key; work is Σ_b |b|² instead of n². Blocks over `maxBlockSize`
    * are dropped before the quadratic join — a giant block (one label
    * covering half the corpus) otherwise degenerates to all-pairs; at
    * scale such blocks get re-blocked (finer clustering) or handled as
    * their own corpus. */
  def similarPairsWithinBlocks(embeddings: DataFrame, idCol: String, vecCol: String,
                               blockCol: String, minCosine: Double,
                               maxBlockSize: Option[Int] = None): DataFrame = {
    val prepared = embeddings.select(
      col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v"))
    val capped = maxBlockSize match {
      case Some(cap) =>
        val hot = prepared.groupBy("block").count().filter(col("count") > cap)
          .select(col("block"))
        prepared.join(hot, Seq("block"), "left_anti")
      case None => prepared
    }
    val a = capped.select(col("block"), col("id").as("id_a"), col("v").as("v_a"))
    val b = capped.select(col("block"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        graft.functions.expressions.quantized_cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") > minCosine)
  }
}
