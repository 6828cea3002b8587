package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Space-Saving heavy hitters (Metwally et al. 2005) as a native
  * aggregate: the frequent-items question ("which domains / templates /
  * users dominate this corpus?") answered in ONE pass with a bounded
  * `capacity`-entry buffer per partition — no groupBy of the full key
  * space, no second scan.
  *
  * Guarantees (any merge order): every item with true frequency
  * > n/capacity is present in the summary, and every reported count
  * overestimates the true count by at most its recorded `err`
  * (err ≤ n/capacity). When `capacity` ≥ the number of distinct items
  * no eviction ever fires and the counts are EXACT and
  * order-independent — the regime q62's DuckDB oracle verifies; the
  * approximation regime is spec-tested on skewed data instead (its
  * output depends on merge order, so it is deliberately not an oracle
  * query).
  *
  * Buffer memory grows with observed distinct items per partition, not
  * with `capacity` — a generous capacity costs nothing on low-cardinality
  * inputs.
  *
  * Output: array<struct<item,cnt,err>> sorted (cnt desc, item asc),
  * truncated to `k`.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, (Long, Long)]] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def createAggregationBuffer(): mutable.HashMap[Long, (Long, Long)] =
    mutable.HashMap.empty

  override def update(m: mutable.HashMap[Long, (Long, Long)],
                      input: InternalRow): mutable.HashMap[Long, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      m.get(item) match {
        case Some((c, e)) => m.update(item, (c + 1, e))
        case None if m.size < capacity => m.update(item, (1L, 0L))
        case None =>
          // evict the (count, item)-min entry; its count seeds the error
          val (minItem, (minC, _)) = m.minBy { case (i, (c, _)) => (c, i) }
          m.remove(minItem)
          m.update(item, (minC + 1, minC))
      }
    }
    m
  }

  override def merge(m: mutable.HashMap[Long, (Long, Long)],
                     other: mutable.HashMap[Long, (Long, Long)]):
      mutable.HashMap[Long, (Long, Long)] = {
    other.foreach { case (item, (c, e)) =>
      m.get(item) match {
        case Some((c0, e0)) => m.update(item, (c0 + c, e0 + e))
        case None           => m.update(item, (c, e))
      }
    }
    if (m.size > capacity) {
      // keep the top `capacity` by (count desc, item asc)
      val keep = m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      m.clear()
      keep.foreach { case (i, ce) => m.update(i, ce) }
    }
    m
  }

  override def eval(m: mutable.HashMap[Long, (Long, Long)]): Any = {
    val top = m.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(i, c, e)
    }.toArray[Any])
  }

  override def serialize(m: mutable.HashMap[Long, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (i, (c, e)) => out.writeLong(i); out.writeLong(c); out.writeLong(e) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) { m.update(in.readLong(), (in.readLong(), in.readLong())); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType), StructField("cnt", LongType),
      StructField("err", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "space_saving_topk"
}

object HeavyHitters {
  /** Column API: top-k frequent items of a long column with a
    * `capacity`-bounded Space-Saving summary. */
  def heavy_hitters(item: Column, k: Int, capacity: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(item.cast("long")), k, capacity)
        .toAggregateExpression())
}
