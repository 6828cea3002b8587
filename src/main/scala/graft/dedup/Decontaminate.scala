package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Benchmark decontamination: flag training documents that share any
  * n-token gram with a held-out evaluation set (the overlap rule used to
  * scrub eval sets out of pretraining corpora).
  *
  * Scale shape for a 100 TB corpus vs a small benchmark suite:
  *  - each side reduces to DISTINCT n-grams before any join — the corpus
  *    side shrinks to (doc_id, gram) pairs, the benchmark side to a bare
  *    gram set that is tiny (benchmarks are MBs, not TBs);
  *  - the join is keyed on the gram string, and because the benchmark
  *    side is small Spark broadcasts it — the 100 TB side is never
  *    shuffled, just filtered in place by a broadcast hash join;
  *  - the per-document overlap count is a hash aggregation of the
  *    (small) surviving pairs.
  * Nothing here is quadratic in corpus size, and the only wide operation
  * runs over rows that already matched the benchmark.
  */
object Decontaminate {

  /** (doc_id, gram) pairs: every distinct n-token gram of every document
    * (docs shorter than n tokens contribute none). */
  def tokenNgrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(1), size(col("tk")) - lit(n - 1)),
          i => array_join(slice(col("tk"), i, lit(n)), " ")))).as("gram"))
  }

  /** Per-training-document count of distinct n-grams also present in the
    * benchmark set. Only contaminated documents appear in the output;
    * callers drop or down-weight them. `benchmark` needs only a text
    * column. */
  def overlap(train: DataFrame, benchmark: DataFrame,
              idCol: String, textCol: String, n: Int): DataFrame = {
    val trainGrams = tokenNgrams(train, idCol, textCol, n)
    val benchGrams = tokenNgrams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    trainGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }
}
