package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Distributed bounded top-k aggregate: keeps the k SMALLEST values of its
  * child by the type's natural ordering and returns them as a sorted array.
  *
  * `SELECT doc_id, topk_min(struct(-score, ...), 3) GROUP BY doc_id` is the
  * shuffle-minimal form of the per-group top-k that `row_number() OVER
  * (PARTITION BY ...) <= k` spells: the window form sorts the ENTIRE frame
  * within each partition before discarding all but k rows per group, while
  * this aggregate's partial (map-side) pass never holds more than k values
  * per group, so the exchange carries at most k rows per group and nothing
  * is ever globally sorted. At 100 TB the window's sort over the full frame
  * is the difference between a bounded shuffle and a spill storm.
  *
  * The reference delegates ranking to its host engines (SURVEY §2.8 — "no
  * top-k"); this is the Spark-first primitive their `ORDER BY ... LIMIT k`
  * per-group idiom compiles to. Descending orders are expressed by negating
  * the leading sort field (exact for doubles/longs), same as the q54 usage.
  */
case class TopKMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Any]] {
  require(k >= 1, "k must be >= 1")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_min requires an orderable type, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.ArrayList[Any] =
    new java.util.ArrayList[Any](k + 1)

  /** Insert keeping the buffer ascending-sorted and capped at k. */
  private def insert(buf: java.util.ArrayList[Any], v: Any): Unit = {
    val n = buf.size()
    if (n == k && ordering.compare(v, buf.get(n - 1)) >= 0) return
    var i = n
    while (i > 0 && ordering.compare(v, buf.get(i - 1)) < 0) i -= 1
    buf.add(i, InternalRow.copyValue(v))
    if (buf.size() > k) buf.remove(k)
  }

  override def update(buf: java.util.ArrayList[Any], input: InternalRow)
      : java.util.ArrayList[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: java.util.ArrayList[Any], other: java.util.ArrayList[Any])
      : java.util.ArrayList[Any] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.ArrayList[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: java.util.ArrayList[Any]): Array[Byte] =
    bufferProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = new java.util.ArrayList[Any](k + 1)
    var i = 0
    while (i < arr.numElements()) {
      buf.add(InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMin =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_min"
}

object TopK {
  /** Bounded per-group top-k: k smallest `c` values as an ascending array. */
  def topkMin(c: Column, k: Int): Column =
    Bridge.column(TopKMin(Bridge.expression(c), k).toAggregateExpression())
}
