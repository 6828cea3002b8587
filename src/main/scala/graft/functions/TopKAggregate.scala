package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a native Catalyst aggregate (a
  * TypedImperativeAggregate with a bounded-heap buffer).
  *
  * The built-in way to get "top 3 per group" is a window rank + filter,
  * which sorts EVERY row of every group. This aggregate keeps a k-element
  * heap instead: map-side partial aggregation reduces each partition to
  * ≤k rows per group before the shuffle, so the exchange carries
  * O(groups·k) rows regardless of input size — the difference between a
  * sort of 100 TB and a merge of heaps at scale.
  *
  * Input: struct(score double, id long); output: array<struct<score,id>>
  * sorted (score desc, id asc) — ties broken by id for full determinism.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // min-heap on (score asc, id desc): the root is the entry to evict.
  // transient lazy: rebuilt after plan serialization, not allocated per row
  @transient private lazy val ord: java.util.Comparator[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, ord)

  private def offer(h: java.util.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (h.size < k) h.offer(e)
    else if (ord.compare(e, h.peek()) > 0) { h.poll(); h.offer(e) }
  }

  override def update(h: java.util.PriorityQueue[(Double, Long)], input: InternalRow):
      java.util.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) offer(h, (row.getDouble(0), row.getLong(1)))
    }
    h
  }

  override def merge(h: java.util.PriorityQueue[(Double, Long)],
                     other: java.util.PriorityQueue[(Double, Long)]):
      java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) offer(h, it.next())
    h
  }

  override def eval(h: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = h.toArray(new Array[(Double, Long)](h.size))
    // final order: score desc, id asc
    java.util.Arrays.sort(arr, ord.reversed())
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(h: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(h.size)
    val it = h.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.offer((in.readDouble(), in.readLong())); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "topk_pairs"
}

object TopKAggregate {
  /** Column API: top-k (score, id) pairs per group, score desc / id asc. */
  def topk_pairs(score: Column, id: Column, k: Int): Column = {
    val struct = org.apache.spark.sql.functions.struct(score.as("score"), id.as("id"))
    Bridge.column(TopKPairs(Bridge.expression(struct), k).toAggregateExpression())
  }
}
