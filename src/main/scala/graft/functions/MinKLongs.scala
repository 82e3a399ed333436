package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The `k` smallest long values per group, ascending, duplicates kept —
  * value-identical to `slice(array_sort(collect_list(v)), 1, k)` but with
  * O(k) aggregate state and full map-side combine: `collect_list` in that
  * position ships EVERY group member through the exchange and sorts the
  * whole group's array just to keep its head, so a first-k sample of an
  * N-row group costs O(N) shuffle bytes per group; this aggregate's
  * partial states are k values regardless of group size. Runs on the same
  * `ObjectHashAggregateExec` path as `collect_list`. Callers that sample
  * first-k (ts, id) pairs pack them into one sortable long via
  * `(ts_sec << 32) | event_id` (the `promo_rollup` encoding) so the
  * lexicographic pair order and the long order coincide — exact iff
  * `0 <= event_id < 2^32` and `0 <= ts_sec < 2^31`; the caller guards
  * those bounds at runtime (out-of-range input raises, never silently
  * mis-samples). */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayList[Long]] {

  require(k >= 1, "min_k_longs requires k >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_k_longs requires bigint, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_longs"

  override def createAggregationBuffer(): java.util.ArrayList[Long] =
    new java.util.ArrayList[Long](k + 1)

  /** Keep the buffer sorted ascending, size ≤ k: insert in place, drop
    * the tail when it overflows (k is sample-sized — linear insert). */
  private def insert(buffer: java.util.ArrayList[Long], v: Long): Unit = {
    val n = buffer.size()
    if (n == k && v >= buffer.get(n - 1)) return
    var i = n
    while (i > 0 && buffer.get(i - 1) > v) i -= 1
    buffer.add(i, v)
    if (buffer.size() > k) buffer.remove(k)
  }

  override def update(
      buffer: java.util.ArrayList[Long],
      input: InternalRow): java.util.ArrayList[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.ArrayList[Long],
      other: java.util.ArrayList[Long]): java.util.ArrayList[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.ArrayList[Long]): Any = {
    val out = new Array[Long](buffer.size())
    var i = 0
    while (i < out.length) { out(i) = buffer.get(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.ArrayList[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size() * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val list = new java.util.ArrayList[Long](k + 1)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) list.add(bb.getLong())
    list
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKLongs =
    copy(child = newChildren.head)
}
