package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. Everything here is pure Catalyst expression composition
  * (higher-order functions on arrays) — codegen-friendly, no UDFs, no
  * shuffles — and uses only engine-portable integer arithmetic so results
  * hash-match the DuckDB oracle bit-for-bit.
  *
  * The base hash is a polynomial rolling hash (base 31, mod 1e9+7) over
  * character codes — the classic Rabin–Karp form. It is NOT a
  * cryptographic hash; it's chosen because any engine can reproduce it
  * with three integer ops per character.
  */
object TextFunctions {

  /** Modulus for all polynomial hashes (prime, < 2^30 so a*h+b stays well
    * inside a long for multipliers up to ~2^32). */
  val Mod = 1000000007L

  /** Polynomial hash of a string column:
    * fold(chars, 0, (h, c) => (h*31 + code(c)) % Mod). */
  def polyHash(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1)))),
      lit(0L),
      (h, c) => (h * lit(31L) + c) % lit(Mod))

  /** Whitespace tokens with empties dropped (trailing-separator safe).
    * Codegen'd one-pass kernel; `tokensHof` is the executable spec. */
  def tokens(text: Column): Column =
    graft.functions.expressions.tokens_native(text)

  /** HOF reference form of `tokens` (interpreted — spec only). */
  def tokensHof(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Number of (non-empty, whitespace-delimited) tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Hashes of all k-character shingles (positions 1 .. len-k+1).
    * For fixed small k the polynomial is unrolled to straight-line
    * arithmetic — no inner fold, and since 255*31^(k-1) < Mod for k ≤ 5
    * the running value never needs an intermediate modulo. */
  def shingleHashes(text: Column, k: Int): Column = {
    require(k >= 1 && k <= 5, s"shingle k=$k out of unrolled range 1..5")
    transform(sequence(lit(1), length(text) - lit(k - 1)), i => {
      val h = (0 until k)
        .map(j => ascii(text.substr(i + lit(j), lit(1))) * lit(pow31(k - 1 - j)))
        .reduce(_ + _)
      h % lit(Mod)
    })
  }

  /** Distinct shingle-hash set of a document (the MinHash input).
    * Codegen'd one-pass kernel; `shingleSetHof` is the executable spec
    * (the HOF form is quadratic per doc: substr(i, 1) re-seeks UTF-8). */
  def shingleSet(text: Column, k: Int): Column =
    graft.functions.expressions.char_shingle_set(text, k)

  /** HOF reference form of `shingleSet` (interpreted — spec only). */
  def shingleSetHof(text: Column, k: Int): Column =
    array_distinct(shingleHashes(text, k))

  /** Polynomial hash of every whitespace token (nested fold: outer
    * transform over tokens, inner fold over characters). Spec path —
    * built on `tokensHof` so kernel-parity tests stay independent of the
    * token kernel. */
  def tokenHashes(text: Column): Column =
    transform(tokensHof(text), t =>
      aggregate(
        transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1)))),
        lit(0L),
        (h, c) => (h * lit(31L) + c) % lit(Mod)))

  /** Distinct hashes of all k-word shingles, combined from token hashes
    * by a base-31 fold. Word shingles discriminate much better than char
    * shingles on small-vocabulary corpora. Codegen'd one-pass kernel
    * (see GraftHash.wordShingleSet); `wordShingleSetHof` below is the
    * interpreted spec it is parity-tested against. */
  def wordShingleSet(text: Column, k: Int = 3): Column =
    graft.functions.expressions.word_shingle_set(text, k)

  /** HOF reference form of `wordShingleSet` (interpreted — spec only;
    * token hashes < Mod keep every intermediate < 2^63 for k ≤ 7).
    * Undefined for documents with fewer than k tokens. */
  def wordShingleSetHof(text: Column, k: Int = 3): Column = {
    require(k >= 1 && k <= 7, s"word-shingle k=$k overflows the unmodded base-31 fold beyond 7")
    val th = tokenHashes(text)
    array_distinct(
      transform(sequence(lit(1), size(th) - lit(k - 1)), i => {
        val folded = (1 until k).foldLeft(element_at(th, i): Column)(
          (acc, j) => acc * lit(31L) + element_at(th, i + lit(j)))
        folded % lit(Mod)
      }))
  }

  /** Distinct k-character-gram set (exact Jaccard input). */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(transform(sequence(lit(1), length(text) - lit(n - 1)), i => text.substr(i, lit(n))))

  /** 64-bit-ish content fingerprint: two independent polynomial hashes
    * (bases 31 and 131, different prime moduli) packed into one long.
    * Collision probability ~2^-60 — suitable for exact-dup detection at
    * 100 TB without shipping full texts through the shuffle. */
  def fingerprint(text: Column): Column = {
    val h1 = polyHash(text)
    val h2 = aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (h, c) => (h * lit(131L) + c) % lit(998244353L))
    h1 * lit(998244353L) + h2
  }

  private def pow31(e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * 31L)
}
