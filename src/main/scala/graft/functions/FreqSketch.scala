package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") sketch as a native
  * `TypedImperativeAggregate` — the frequent-items member of the X5
  * sketch family (HLL, Bloom, quantiles): O(capacity) mergeable state
  * per partition, one pass, no shuffle of raw values.
  *
  * Guarantees (the classic MG bounds, preserved under merge per
  * Agarwal et al., "Mergeable Summaries", PODS'12):
  *  - every item with true frequency > n/(capacity+1) IS in the sketch
  *    (pigeonhole: a counter survives at least freq − n/(capacity+1)
  *    decrements);
  *  - every reported count is a LOWER bound on the true count, short
  *    by at most n/(capacity+1).
  *
  * Both bounds are pinned as oracle invariant bits in q117, with the
  * exact counts recomputed portably on both engines.
  *
  * 100 TB posture: per-task state is `capacity` (string, long) pairs;
  * partial aggregation happens map-side and the final merge sees one
  * buffer per task — the corpus' token stream is never shuffled. The
  * decrement step on a full buffer is O(capacity) per non-resident
  * token, the textbook trade for a deterministic guarantee (a
  * Space-Saving variant would amortize it; capacity here is small).
  */
case class MisraGries(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 100000,
    s"freq_sketch capacity must be in (0, 100000], got $capacity")

  override def prettyName: String = "freq_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"freq_sketch needs a string column, got ${child.dataType}")

  override def createAggregationBuffer()
      : mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty[UTF8String, Long]

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow)
      : mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity =>
        buf.update(key.clone(), 1L) // clone: input buffers are reused
      case None =>
        // decrement-all; drop zeros (the MG step)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (k, c) =>
      b1.update(k, b1.getOrElse(k, 0L) + c)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop non-positives — the mergeable-summaries reduction that
      // keeps the error bound additive in n, not in merge count
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic surface: count desc, item asc
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGries = copy(child = newChild)
}

object FreqSketch {
  /** `array<struct<item,count>>` of ≤ `capacity` candidate heavy
    * hitters of `c`, counts are guaranteed lower bounds short by at
    * most n/(capacity+1). */
  def freqSketch(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), capacity)
        .toAggregateExpression())

  /** Helper: ArrayData result → Seq[(String, Long)] for tests. */
  def decode(a: ArrayData): Seq[(String, Long)] =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
}
