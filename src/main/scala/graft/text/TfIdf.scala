package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Corpus-level term weighting (TF-IDF family) for training-data
  * pipelines: keyword extraction, boilerplate detection, corpus search.
  *
  * Scale design: two hash aggregations and one broadcast-joined lookup.
  *  - term frequencies: explode tokens → groupBy(doc, token) with
  *    map-side partial aggregation, so the shuffle carries distinct
  *    (doc, token) pairs, not the token stream
  *  - document frequencies: groupBy(token) over the already-distinct
  *    (doc, token) pairs — one more partial-agged shuffle, output is
  *    vocabulary-sized
  *  - the per-doc top-k ranking windows on doc_id (millions of small
  *    partitions — parallel, unlike a global sort)
  *
  * The idf is the *rational* form (N+1)/(df+1) rather than
  * log((N+1)/(df+1)): log is a transcendental whose last bit is not
  * guaranteed identical across libm implementations, while one exact
  * integer product and one IEEE division are bit-reproducible in any
  * engine — and log is monotone in the rational form, so top-k term
  * rankings are very close (ties differ only where tf varies jointly).
  */
object TfIdf {

  /** (doc, token, tf, df, score) for every distinct (doc, token):
    * score = (tf·(N+1)) / (df+1) with exact integer numerator. */
  def termScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count() // corpus size: one cheap count job, broadcast as literal
    val tf = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("token"))
      .select(col("doc"), col("token"), col("tf"), col("df"),
        ((col("tf") * lit(n + 1L)).cast("double") / (col("df") + lit(1L))).as("score"))
  }

  /** Top-k highest-scoring terms per document, rank-stamped;
    * deterministic tie-break on the token itself. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc")).orderBy(col("score").desc, col("token"))
    termScores(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
