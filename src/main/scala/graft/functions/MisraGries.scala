package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary over weighted string keys: at most
  * `capacity` counters, every counter an UNDER-estimate of the true
  * frequency by at most `totalWeight / (capacity + 1)` — so every key
  * with true frequency above that bound is guaranteed present. Summaries
  * are MERGEABLE (Agarwal et al., "Mergeable Summaries"): combine counts
  * then subtract the (capacity+1)-th largest, preserving the same bound,
  * which makes the partial/final aggregation exact Spark semantics — 32
  * executor-local sketches merge into one without ever shuffling the
  * keys themselves.
  *
  * This is the CANDIDATE pass of the sketch-then-verify pattern (q67):
  * at 100 TB the exact `GROUP BY token` shuffles the whole vocabulary;
  * the sketch pass moves only `capacity` counters per partition, and the
  * exact recount that follows touches only the candidate keys. The
  * reference has no sketches at all (SURVEY §2.8 — "no approximate
  * aggregates"); this is the additive scale path next to the exact KMV
  * sketch (q45).
  */
case class MisraGriesSketch(
    key: Expression,
    weight: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {
  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(key, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, weight.dataType) match {
      case (StringType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects (string, integral weight), got $other")
    }

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](capacity * 2)

  /** Decrement-by-minimum trim back to `capacity` counters (the weighted
    * Misra–Gries step; zeroed counters drop out).
    */
  private def trim(buf: java.util.HashMap[UTF8String, Long]): Unit =
    while (buf.size() > capacity) {
      var m = Long.MaxValue
      val it0 = buf.values().iterator()
      while (it0.hasNext) m = math.min(m, it0.next())
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue - m
        if (c <= 0) it.remove() else e.setValue(c)
      }
    }

  private def add(buf: java.util.HashMap[UTF8String, Long],
      tok: UTF8String, w: Long): Unit =
    if (w > 0) {
      val cur = buf.get(tok)
      if (cur != 0L || buf.containsKey(tok)) buf.put(tok, cur + w)
      else {
        buf.put(tok.clone(), w) // copy: UTF8String may view a reused buffer
        trim(buf)
      }
    }

  override def update(buf: java.util.HashMap[UTF8String, Long], input: InternalRow)
      : java.util.HashMap[UTF8String, Long] = {
    val k = key.eval(input)
    val w = weight.eval(input)
    if (k != null && w != null) {
      val wl = w match {
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l.longValue()
      }
      add(buf, k.asInstanceOf[UTF8String], wl)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long])
      : java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != 0L || buf.containsKey(e.getKey)) buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey, e.getValue)
    }
    trim(buf)
    buf
  }

  /** Entries sorted by (count desc, key asc) for deterministic output. */
  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1.compareTo(b._1) < 0
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c)): Any
    })
  }

  @transient private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] =
    bufferProjection(InternalRow(eval(buf))).getBytes

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.put(s.getUTF8String(0).clone(), s.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesSketch =
    copy(key = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Weighted heavy-hitters summary: array<struct<tok,cnt>> of at most
    * `capacity` under-estimated counters, every key with true weight
    * above totalWeight/(capacity+1) guaranteed present.
    */
  def sketch(key: Column, weight: Column, capacity: Int): Column =
    Bridge.column(MisraGriesSketch(
      Bridge.expression(key), Bridge.expression(weight), capacity)
      .toAggregateExpression())
}
