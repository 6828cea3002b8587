package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector arithmetic over `array<float>` columns.
  *
  * All similarity math runs on quantized integer vectors:
  * q_i = floor(x_i·512 + 0.5). The scale is a power of two, so x·512 is
  * exact in IEEE arithmetic, making quantization — and therefore every
  * downstream dot product and norm — bit-reproducible on any engine
  * (the DuckDB oracle reproduces it exactly). For 64-dim unit-scale
  * embeddings, |q| ≤ ~2^10 ⇒ dot products ≤ ~2^26 and squared norms fit
  * comfortably in longs; the final cosine is one exact int→double
  * conversion, one correctly-rounded sqrt and one division.
  *
  * Integer dots are also the fast path: long multiply-add vectorizes,
  * and partial results shuffle as single longs.
  */
object VectorOps {

  val QuantScale = 512L

  /** array<float> → array<long> quantized at QuantScale. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x * lit(QuantScale.toDouble) + lit(0.5d)).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  /** Exact integer squared norm of a quantized vector. */
  def normSqQ(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), _ + _)

  /** Cosine similarity of two quantized vectors (double; deterministic).
    * Null when either vector is zero — undefined cosine; matches the
    * kernel (GraftHash.cosineQ) and the oracle's x/0 → NULL. */
  def cosineQ(a: Column, b: Column): Column = {
    val na = normSqQ(a)
    val nb = normSqQ(b)
    when(na === 0L || nb === 0L, lit(null).cast("double"))
      .otherwise(dotQ(a, b).cast("double") / sqrt(na.cast("double") * nb.cast("double")))
  }
}
