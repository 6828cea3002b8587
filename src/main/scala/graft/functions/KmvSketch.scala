package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, "bottom-k") distinct sketch as a native
  * Catalyst aggregate — the mergeable distinct-count summary of
  * Bar-Yossef et al. (2002), the sketch behind theta-sketch set
  * algebra.
  *
  * The buffer is the set of the k SMALLEST distinct hash values seen.
  * Map-side partial aggregation reduces every partition to ≤k longs per
  * group before the shuffle (same scale argument as [[TopKPairs]]), and
  * merging two sketches is union-then-trim — associative and
  * commutative, so the result is identical under any partitioning.
  *
  * Unlike HLL, the KMV buffer is a DETERMINISTIC pure function of the
  * input value set: bottom-k of the hashes. That makes it the sketch an
  * external engine can reproduce row-for-row in SQL (sort the distinct
  * hashes, take k) — so the estimate itself is oracle-verifiable, not
  * just "approximately right". With hashes uniform on [0, 2³²), the
  * standard estimator is (k−1)·2³² / h_k where h_k is the k-th smallest
  * hash (sketch full), or exact |sketch| when fewer than k distinct
  * values exist.
  *
  * Input: LONG hash values (caller hashes — e.g.
  * `Sampling.keyHash(poly_hash(text))`). Output: array<long>, the
  * sorted bottom-k distinct hashes.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(s: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (s.size < k) { s.add(v); () }
    else if (v < s.last()) {
      if (s.add(v)) { s.remove(s.last()); () }
    }
  }

  override def update(s: java.util.TreeSet[java.lang.Long], input: InternalRow):
      java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(s, v.asInstanceOf[Long])
    s
  }

  override def merge(s: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]):
      java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(s, it.next())
    s
  }

  override def eval(s: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](s.size)
    val it = s.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(s: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.size)
    val it = s.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(in.readLong()); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvBottomK =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvBottomK =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_bottom_k"
}

object KmvSketch {
  /** Column API: sorted bottom-k distinct hash values per group. */
  def kmv_bottom_k(hash: Column, k: Int): Column =
    Bridge.column(KmvBottomK(Bridge.expression(hash), k).toAggregateExpression())

  /** Distinct-count estimate from a bottom-k array column (by name)
    * over hashes uniform on [0, 2³²): exact size when the sketch isn't
    * full, else (k−1)·2³² DIV h_k — integer division, so the exact
    * same expression runs in the oracle. */
  def kmv_estimate(sketchCol: String, k: Int): Column = {
    require(sketchCol.matches("[A-Za-z_][A-Za-z0-9_]*"), s"plain column name expected: $sketchCol")
    org.apache.spark.sql.functions.expr(
      s"CAST(CASE WHEN size($sketchCol) < $k THEN size($sketchCol)" +
        s" ELSE CAST(${k - 1} AS BIGINT) * 4294967296 DIV element_at($sketchCol, $k)" +
        s" END AS BIGINT)")
  }
}
