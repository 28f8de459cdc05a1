package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV / bottom-k sketch aggregate: `graft_bottom_k(hash, k)` returns the k
  * smallest DISTINCT long hash values of the group, sorted ascending.
  *
  * This is the mergeable-sketch building block for distinct-count and
  * set-overlap estimation (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07): the buffer is O(k)
  * regardless of group size, updates are heap-bounded, and partial buffers
  * merge associatively — so at 100 TB the sketch flows through map-side
  * partial aggregation exactly like a sum, where a collect_set-then-slice
  * formulation would carry the full distinct set through the shuffle.
  *
  * Estimators downstream (see operators/StatOps a23): for sketches S_A, S_B
  * with threshold k, J(A,B) ≈ |bottomK(S_A ∪ S_B) ∩ S_A ∩ S_B| / k, and
  * the distinct count ≈ (k-1)·2^60 / h_k. Both are plain array expressions
  * over the sketch output, replayable by any engine that can sort a list —
  * which is what makes the op oracle-checkable.
  */
case class BottomKSketchAgg(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()
    require(v >= 1, s"graft_bottom_k: k must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hashExpr.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketchAgg =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
