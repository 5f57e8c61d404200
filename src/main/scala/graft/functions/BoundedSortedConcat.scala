package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded GROUP_CONCAT: keeps only the `maxElems` binary-smallest
  * strings (with duplicate counts unless `distinct`) in the
  * aggregation buffer itself.
  *
  * The Column-level cap (`slice(sort_array(collect_list(...)))`)
  * bounds the *result* but the collect buffer still grows with the
  * group — a skewed key at 100 TB OOMs the executor before the slice
  * runs. This TypedImperativeAggregate trims on every insert, so
  * per-group state is O(maxElems) regardless of group size, in the
  * partial (map-side) aggregation too. Output is byte-identical to
  * `concat_ws(sep, slice(sort_array(...), 1, maxElems))`: UTF8String's
  * comparator IS sort_array's binary ordering.
  */
case class BoundedSortedConcat(
    child: Expression,
    sep: String,
    maxElems: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSortedConcat.Buf] with UnaryLike[Expression] {

  require(maxElems > 0, "maxElems must be positive")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = BoundedSortedConcat.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got $other")
  }

  override def createAggregationBuffer(): BoundedSortedConcat.Buf =
    new BoundedSortedConcat.Buf

  override def update(buf: BoundedSortedConcat.Buf, input: InternalRow): BoundedSortedConcat.Buf = {
    val v = child.eval(input)
    if (v != null) {
      // copy: the UTF8String may point into a reused row buffer
      buf.add(v.asInstanceOf[UTF8String].clone(), 1L, distinct, maxElems)
    }
    buf
  }

  override def merge(buf: BoundedSortedConcat.Buf, other: BoundedSortedConcat.Buf): BoundedSortedConcat.Buf = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue, distinct, maxElems)
    }
    buf
  }

  override def eval(buf: BoundedSortedConcat.Buf): Any = {
    val sb = new java.lang.StringBuilder
    val sepStr = sep
    var first = true
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.longValue()
      while (c > 0) {
        if (!first) sb.append(sepStr)
        sb.append(e.getKey.toString)
        first = false
        c -= 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: BoundedSortedConcat.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedSortedConcat.Buf = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new BoundedSortedConcat.Buf
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val count = in.getLong
      buf.map.put(UTF8String.fromBytes(arr), count)
      buf.total += count
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedConcat =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedConcat =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedConcat =
    copy(child = newChild)
}

object BoundedSortedConcat {
  val name = "graft_bounded_concat"

  /** Sorted (UTF8 binary order) string → count map with a running
    * total; `add` trims from the largest key so the buffer never holds
    * more than maxElems elements.
    */
  final class Buf {
    // values are boxed explicitly: a j.u.TreeMap[_, scala.Long] would
    // silently unbox a missing key's null to 0L and break the
    // contains-check
    val map = new java.util.TreeMap[UTF8String, java.lang.Long]()
    var total: Long = 0L

    def add(v: UTF8String, count: Long, distinct: Boolean, maxElems: Int): Unit = {
      // beyond-bound fast path: v sorts strictly after a full buffer's
      // maximum, so inserting it would be undone by the trim (a v
      // already in the map can never sort after the last key)
      if (total >= maxElems && map.size() > 0 && v.compareTo(map.lastKey()) > 0) return
      val cur: java.lang.Long = map.get(v)
      if (distinct) {
        if (cur == null) { map.put(v, java.lang.Long.valueOf(1L)); total += 1 }
      } else {
        val next = if (cur == null) count else cur.longValue() + count
        map.put(v, java.lang.Long.valueOf(next))
        total += count
      }
      while (total > maxElems) {
        val last = map.lastEntry()
        val drop = math.min(last.getValue.longValue(), total - maxElems)
        if (drop == last.getValue.longValue()) map.remove(last.getKey)
        else map.put(last.getKey, java.lang.Long.valueOf(last.getValue.longValue() - drop))
        total -= drop
      }
    }
  }
}
