package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distinct-value collector with SATURATING state: at most `max` long
  * values are ever held per group — once a group's set reaches `max`,
  * further values are discarded (the merged size is `min(true_df, max)`).
  *
  * This is the aggregation a df-capped pair-former actually needs:
  * callers set `max = cap + 1`, read groups of size in `[2, cap]` as the
  * discriminative doc-id sets, and size `== cap + 1` as the "hot, df>cap"
  * marker — the saturation property makes both answers EXACT while the
  * per-group aggregate state is O(cap) regardless of how many documents
  * share the group's key. `collect_set` in the same position holds a hot
  * gram's ENTIRE doc-id set (a stop-phrase shared by 10^7 documents is
  * 80 MB of aggregate state for one key at warehouse scale); the cap is
  * the difference between a bounded shuffle and an OOM.
  *
  * Runs on the same `ObjectHashAggregateExec` path as `collect_set`, with
  * map-side partial aggregation; merge saturates identically, so partial
  * states are also O(cap). Output order is insertion order — callers must
  * not depend on it (pair formation takes unordered combinations). */
case class BoundedCollectSet(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.LinkedHashSet[Long]] {

  require(max >= 1, "bounded_collect_set requires max >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_set requires bigint, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_set"

  override def createAggregationBuffer(): java.util.LinkedHashSet[Long] =
    new java.util.LinkedHashSet[Long]()

  override def update(
      buffer: java.util.LinkedHashSet[Long],
      input: InternalRow): java.util.LinkedHashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buffer.size() < max) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.LinkedHashSet[Long],
      other: java.util.LinkedHashSet[Long]): java.util.LinkedHashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buffer.size() < max) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: java.util.LinkedHashSet[Long]): Any = {
    val out = new Array[Long](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.LinkedHashSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size() * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.LinkedHashSet[Long] = {
    val set = new java.util.LinkedHashSet[Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) set.add(bb.getLong())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectSet =
    copy(child = newChildren.head)
}
