package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries / SpaceSaving heavy-hitter sketch as a custom Catalyst
  * `TypedImperativeAggregate` — the "novel sketch" tier of the custom
  * operator ladder: a bounded-memory (`capacity` counters) one-pass
  * frequent-items summary that composes with partial aggregation.
  * Update and merge follow the classic algorithm (Misra & Gries 1982;
  * merge per Agarwal et al., "Mergeable Summaries", PODS 2012): combine
  * counters, subtract the (capacity+1)-th largest count, drop
  * non-positives.
  *
  * GUARANTEE (what makes a deterministic oracle possible even though
  * counter values depend on partition merge order): every item with true
  * frequency > N/(capacity+1) SURVIVES in the sketch. So the sketch
  * emits a small candidate SET — a superset of the true heavy hitters —
  * and an exact second pass over just those candidates recovers the
  * exact heavy-hitter answer, independent of merge order. That 2-pass
  * shape is the standard exact-heavy-hitters plan at 100 TB: pass 1
  * never shuffles raw tokens (partial sketches merge), pass 2 counts
  * only the few surviving candidates.
  *
  * eval returns the candidate items sorted lexicographically (counts
  * are intentionally NOT exposed — they are approximate and
  * order-dependent).
  */
case class TopKSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if capacity > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure("topk_sketch capacity must be > 0")
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_sketch requires string input, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key.clone(), 1L)
        case None => // decrement-all step: every counter pays for the newcomer
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (k, c) => if (c == 1L) dead += k else buf.update(k, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count; drop non-positives
      val cut = buf.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (k, c) => if (c - cut <= 0L) dead += k else buf.update(k, c - cut) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buf.keys.toArray.sortBy(_.toString).map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_sketch"
}

object TopKSketch {
  /** Column API: candidate heavy hitters of a string column (sorted). */
  def topkCandidates(c: Column, capacity: Int): Column =
    GraftGlue.column(TopKSketchAgg(GraftGlue.expression(c), capacity).toAggregateExpression())
}
