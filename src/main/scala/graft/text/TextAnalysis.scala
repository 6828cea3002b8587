package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token statistics. All pure column expressions —
  * narrow, codegen-fused, shuffle-free per row — with engine-portable
  * arithmetic (every division is int→double with identical operand
  * order, so the oracle matches bitwise).
  */
object TextAnalysis {

  /** Stopword lists for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny: language ID here is a cheap filter, not a model —
    * the operator shape (per-token membership scoring + argmax) is what a
    * real lexicon would reuse. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "les", "des", "en", "une"))

  /** Number of tokens of `toks` found in `words`. Counts occurrences
    * (not distinct matches). HOF reference form — the codegen'd
    * `expressions.stopword_hits` kernel is what the operators use;
    * `KernelParitySpec` asserts they agree. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Per-language stopword-hit scores, one column per language (fused
    * one-pass kernels — no token array materialized per language). */
  def languageScores(text: Column): Seq[(String, Column)] =
    Stopwords.map { case (lang, words) =>
      lang -> graft.functions.expressions.stopword_hits(text, words)
    }

  /** Argmax language with deterministic first-wins tie-breaking in
    * Stopwords order; "und" (undetermined) when no stopword hits at all. */
  def languageId(text: Column): Column = {
    val scores = languageScores(text)
    val best = greatest(scores.map(_._2): _*)
    // foldRight builds the when-chain in Stopwords order → first-wins ties
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      when(s > 0 && s === best, lit(lang)).otherwise(rest)
    }
  }

  /** Quality features + composite score. Returns a struct column with:
    * n_chars, n_tokens, n_distinct_tokens, avg_token_len, stopword_ratio,
    * type_token_ratio, quality_score ∈ [0,1]. */
  def qualityFeatures(text: Column): Column = {
    import graft.functions.expressions.{token_count, distinct_token_count, stopword_hits}
    val nChars = length(text).cast("long")
    val nToks = token_count(text).cast("long")
    val nDistinct = distinct_token_count(text).cast("long")
    // Σ token lengths == non-space chars: translate+length is codegen'd,
    // where the aggregate(transform(...)) fold runs interpreted
    val charsInToks = length(translate(text, " ", "")).cast("long")
    val avgTokLen = charsInToks.cast("double") / nToks
    val stopHits = stopword_hits(text, Stopwords.flatMap(_._2)).cast("long")
    val stopRatio = stopHits.cast("double") / nToks
    val ttr = nDistinct.cast("double") / nToks
    // Composite: reward 3..10-char average tokens, some stopwords, lexical
    // variety. Pure arithmetic — portable and fully deterministic.
    val lenOk = when(avgTokLen >= 3 && avgTokLen <= 10, lit(1.0d)).otherwise(lit(0.0d))
    val score = (lenOk + least(stopRatio * lit(5.0d), lit(1.0d)) + least(ttr * lit(2.0d), lit(1.0d))) / lit(3.0d)
    struct(
      nChars.as("n_chars"), nToks.as("n_tokens"), nDistinct.as("n_distinct_tokens"),
      avgTokLen.as("avg_token_len"), stopRatio.as("stopword_ratio"),
      ttr.as("type_token_ratio"), score.as("quality_score"))
  }

  /** Token statistics incl. two BPE-ish subword estimates: chars/4 (the
    * standard planning heuristic) and a regex token count (alphabetic
    * runs + digit runs + individual other non-space chars — the
    * GPT-2-style pre-tokenizer shape without the merges). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.expressions.{token_count, distinct_token_count}
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      token_count(col(textCol)).cast("long").as("n_words"),
      distinct_token_count(col(textCol)).cast("long").as("n_distinct_words"),
      floor((length(col(textCol)) + lit(3)) / lit(4)).as("est_bpe_tokens"),
      regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("n_regex_tokens"))
  }

  /** Gopher-style repetition signals per document: the duplicate-token
    * fraction (1 − distinct/total) and the top-bigram fraction (most
    * frequent token bigram / total bigrams) — the two cheapest filters
    * for boilerplate and degenerate repetition in crawl data.
    *
    * Scale shape: the bigram histogram is two hash aggregations — first
    * keyed (doc, bigram) with map-side partials, then (doc) — never a
    * per-document sort, and the exploded bigram stream is the only wide
    * data; both fractions are single int→double divisions, so results
    * hash-match any engine. Documents with < 2 tokens are dropped (no
    * bigram exists to measure). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.expressions.{bigram_hashes, distinct_token_count, token_count}
    val base = docs
      .select(col(idCol),
        token_count(col(textCol)).cast("long").as("n_tokens"),
        distinct_token_count(col(textCol)).cast("long").as("n_distinct_tokens"),
        bigram_hashes(col(textCol)).as("bh"))
      .filter(col("n_tokens") >= 2)
    // histogram over injective bigram-hash KEYS, not bigram strings: the
    // codegen'd kernel is one byte scan per doc (the string form runs an
    // interpreted HOF and shuffles strings — measured 6x slower), and
    // h_i·2^31 + h_i+1 cannot collide on distinct hash pairs
    val bigramCounts = base
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        explode(col("bh")).as("bigram"))
      .groupBy(col(idCol), col("n_tokens"), col("n_distinct_tokens"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    bigramCounts
      .groupBy(col(idCol), col("n_tokens"), col("n_distinct_tokens"))
      .agg(max(col("cnt")).as("top_bigram_cnt"), sum(col("cnt")).as("n_bigrams"))
      .select(col(idCol), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct_tokens")).cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }
}
