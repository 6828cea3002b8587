package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise sum of array<long> vectors as ONE native aggregate.
  *
  * The alternative — `dim` separate `sum(v[i])` aggregate expressions —
  * evaluates `dim` array extractions per row and carries `dim` separate
  * agg buffers; a single long[dim] buffer updated in one fused loop does
  * the same reduction with one pass and one buffer, and map-side partial
  * aggregation ships k·dim longs per partition. This is the reduction
  * under centroid means (IVF builds, per-label embedding stats).
  *
  * Null vectors are skipped; all inputs must share the aggregate's
  * declared `dim` (enforced — a silent length mismatch would corrupt the
  * centroid).
  */
case class VectorSum(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"vector_sum(dim=$dim) got a vector of length ${arr.numElements()}")
      var i = 0
      while (i < dim) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(dim * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < dim) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim)
    var i = 0
    while (i < dim) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSum =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): VectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSum =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "vector_sum"
}

object VectorAggregates {
  /** Column API: element-wise sum of an array<long> column of fixed
    * length `dim`, as array<long>. */
  def vector_sum(v: Column, dim: Int): Column =
    Bridge.column(VectorSum(Bridge.expression(v), dim).toAggregateExpression())
}
