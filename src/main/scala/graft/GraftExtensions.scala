package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.expressions._

/** graft's custom Catalyst expressions as SQL functions.
  *
  * Two ways in, same registrations:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` at session
  *    build (the deployment path — every session on the cluster gets the
  *    functions with no code change)
  *  - programmatic: `GraftFunctions.register(spark)` on a live session
  *
  * After either, the kernels are first-class in SQL:
  * {{{
  *   SELECT graft_fingerprint(text), graft_token_count(text) FROM docs
  *   SELECT * FROM t WHERE graft_cosine(a.vec, b.vec) > 0.8
  * }}}
  */
object GraftFunctions {

  private def intOf(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  /** Every graft SQL function: name → expression builder. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> (args => PolyHash(args.head)),
    "graft_fingerprint" -> (args => Fingerprint(args.head)),
    "graft_minhash" -> (args =>
      MinHashSignature(args(0), intOf(args(1), "numHashes"), intOf(args(2), "shingleK"))),
    "graft_simhash" -> (args => SimHash64(args(0), intOf(args(1), "bits"))),
    "graft_cosine" -> (args => QuantizedCosine(args(0), args(1))),
    "graft_ngram_jaccard" -> (args => NGramJaccard(args(0), args(1), intOf(args(2), "n"))),
    "graft_tokens" -> (args => Tokens(args.head)),
    "graft_token_count" -> (args => TokenCount(args.head)),
    "graft_distinct_token_count" -> (args => DistinctTokenCount(args.head)),
    "graft_quantize" -> (args => QuantizeVec(args.head)),
    "graft_zorder" -> (args => ZOrderKey(
      org.apache.spark.sql.catalyst.expressions.Cast(args(0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(args(1), org.apache.spark.sql.types.LongType))),
    "graft_lsh_bucket" -> (args => SignLshBucket(args(0), intOf(args(1), "planes"))),
    "graft_ngram_containment" -> (args =>
      NGramContainment(args(0), args(1), intOf(args(2), "n"))),
    "graft_sig_match_count" -> (args => SigMatchCount(args(0), args(1))),
    "graft_bloom_contains" -> (args =>
      BloomContains(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1), org.apache.spark.sql.types.LongType),
        intOf(args(2), "numHashes"))),
    "graft_char_shingles" -> (args =>
      CharShingleSet(args(0), intOf(args(1), "k"))),
    "graft_word_shingles" -> (args =>
      WordShingleSet(args(0), intOf(args(1), "k"))),
    "graft_suffix_loop_period" -> (args =>
      SuffixLoopPeriod(args(0), intOf(args(1), "maxP"))),
    "graft_long_dot" -> (args => LongDot(args(0), args(1))),
    "graft_l2sq" -> (args => L2SqLong(args(0), args(1))),
    "graft_maxsim" -> (args =>
      MaxSimBlocks(args(0), args(1), intOf(args(2), "blocks"))),
    // mergeable quantile sketch: graft_sketch_quantile(v, p [, k])
    "graft_sketch_quantile" -> (args =>
      graft.functions.QuantileSketch(args(0),
        Seq(args(1) match {
          case Literal(v: Double, _) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
          case other => throw new IllegalArgumentException(
            s"probability must be a numeric literal, got $other")
        }),
        if (args.length > 2) intOf(args(2), "k") else 256)
        .toAggregateExpression()))

  /** Register all graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point (must be a zero-arg class). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name),
        builder))
    }
}
