package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Latest-value-by-sequence aggregate with tombstone semantics — the custom
  * TypedImperativeAggregate SURVEY §4 calls out as the clean replacement
  * for the reference's collect_list + Python-UDF state scan
  * (pyspark-job.py:34-54, 188-204).
  *
  * `graft_latest_by_seq(value, seq, tombstone)` returns the value carried
  * by the row with the highest seq per group, or NULL when that row is
  * tombstoned. The buffer is a constant 18 bytes regardless of group size —
  * vs collect_list's O(group) memory and shuffle — and merges
  * associatively, so partial aggregation works map-side.
  */
case class LatestBySeqAgg(
    valueExpr: Expression,
    seqExpr: Expression,
    tombExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LatestBySeqAgg.Buf] {

  import LatestBySeqAgg.Buf

  override def children: Seq[Expression] = Seq(valueExpr, seqExpr, tombExpr)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_latest_by_seq"

  override def createAggregationBuffer(): Buf = Buf(empty = true, 0L, 0.0, tomb = false)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val seqAny = seqExpr.eval(input)
    if (seqAny == null) return buf
    val seq = seqAny.asInstanceOf[Number].longValue()
    if (buf.empty || seq > buf.seq) {
      val v = valueExpr.eval(input)
      val t = tombExpr.eval(input)
      Buf(empty = false, seq,
        if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue(),
        tomb = (t != null && t.asInstanceOf[Boolean]) || v == null)
    } else buf
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.empty) b else if (b.empty) a else if (a.seq >= b.seq) a else b

  override def eval(buf: Buf): Any =
    if (buf.empty || buf.tomb) null else buf.value

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(18)
    bb.put(if (buf.empty) 1.toByte else 0.toByte)
    bb.putLong(buf.seq)
    bb.putDouble(buf.value)
    bb.put(if (buf.tomb) 1.toByte else 0.toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val empty = bb.get() == 1
    val seq = bb.getLong()
    val value = bb.getDouble()
    val tomb = bb.get() == 1
    Buf(empty, seq, value, tomb)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestBySeqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestBySeqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestBySeqAgg =
    copy(valueExpr = newChildren(0), seqExpr = newChildren(1), tombExpr = newChildren(2))
}

object LatestBySeqAgg {
  final case class Buf(empty: Boolean, seq: Long, value: Double, tomb: Boolean)
}
