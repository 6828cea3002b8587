package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** SimHash near-duplicate fingerprinting (Charikar 2002, as used in
  * Manku et al., WWW'07 for web-scale dedup).
  *
  * Each token votes ±1 on every bit position according to its hash; the
  * fingerprint keeps the sign of each bit's vote total. Near-duplicate
  * documents differ in few bits (small Hamming distance).
  *
  * Execution shape: explode(tokens) × bits → two hash aggregations keyed
  * by (doc, bit) then (doc). Both shuffles carry integer tuples only;
  * map-side partial aggregation collapses the (doc, bit) stream to at
  * most 30 rows per doc per mapper. Bits = 30 keeps every intermediate in
  * portable 64-bit integer arithmetic (token hash < 2^30).
  */
object SimHash {

  val Bits = 30

  /** (id, simhash long) per document — one narrow codegen'd pass, no
    * shuffle (graft.functions.GraftHash.simhash). Token-less documents
    * (empty / all-space text) are dropped, matching the aggregation spec
    * where exploding zero tokens yields zero rows. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(length(regexp_replace(col(textCol), " ", "")) > 0)
      .select(col(idCol), graft.functions.expressions.simhash64(col(textCol), Bits).as("simhash"))

  /** Reference implementation via explode + two keyed aggregations —
    * the executable spec `fingerprints` is tested against. Shuffles
    * O(docs × bits); kept for cross-validation only. */
  def fingerprintsByAggregation(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tok"))
      .select(col("doc"), polyHash(col("tok")).as("h"))
      .select(col("doc"), col("h"), explode(sequence(lit(0), lit(Bits - 1))).as("b"))
      .groupBy(col("doc"), col("b"))
      .agg(sum(expr("2 * (shiftright(h, cast(b as int)) & 1) - 1")).as("vote"))
      .groupBy(col("doc"))
      .agg(
        sum(when(col("vote") >= 0, expr("shiftleft(cast(1 as bigint), cast(b as int))")).otherwise(0L)).as("simhash"),
        count(lit(1)).as("n_bits"))
      .select(col("doc").as(idCol), col("simhash"))
  }

  /** Candidate pairs within `maxHamming` bit flips, via the pigeonhole
    * banding of Manku et al.: split the fingerprint into maxHamming+1
    * chunks — any pair within distance d shares at least one chunk
    * exactly. The join is keyed on (chunk index, chunk value): shuffle
    * volume O(docs × (d+1)), then exact Hamming verification. */
  def pairsWithinHamming(fps: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = (Bits + chunks - 1) / chunks
    val chunkCols = array((0 until chunks).map(c =>
      expr(s"shiftright(simhash, ${c * chunkBits}) & ${(1L << chunkBits) - 1}")): _*)
    val e = fps.select(col(idCol).as("doc"), col("simhash"), posexplode(chunkCols).as(Seq("chunk", "v")))
    val a = e.select(col("chunk"), col("v"), col("doc").as("doc_a"), col("simhash").as("sh_a"))
    val b = e.select(col("chunk"), col("v"), col("doc").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
