package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items (heavy hitters) summary as a mergeable
  * Catalyst aggregate — the frequency counterpart of the HLL cardinality
  * sketch: Spark has count-min (`count_min_sketch`, point queries only)
  * and the driver-side `stat.freqItems`, but no aggregate that RETURNS
  * the top items, and an exact groupBy-count of a high-cardinality column
  * shuffles every distinct value. This summary is O(capacity) memory per
  * partial, merges associatively (Agarwal et al., "Mergeable Summaries",
  * PODS 2012: add counts pointwise, subtract the (capacity+1)-th largest,
  * drop non-positive), and rides Catalyst's partial/final aggregation
  * like any built-in.
  *
  * Guarantee: a stored count c(x) satisfies
  * `true(x) - n/(capacity+1) <= c(x) <= true(x)`, so any item with
  * frequency gap > n/(capacity+1) over another is ordered correctly in
  * the output — the gate's planted-heavy-hitter contract.
  */
object FreqItems {

  /** freq_items(x, capacity): array<struct<item string, est bigint>> of
    * surviving items sorted by (est desc, item asc).
    */
  def freqItems(c: Column, capacity: Int): Column =
    Bridge.column(FreqItemsAggregate(Bridge.expression(c), capacity)
      .toAggregateExpression())

  type Summary = mutable.HashMap[String, Long]

  private[functions] def insert(s: Summary, item: String, capacity: Int): Unit = {
    s.get(item) match {
      case Some(n) => s.update(item, n + 1)
      case None if s.size < capacity => s.update(item, 1L)
      case None =>
        // decrement-all: every tracked count pays for the untracked arrival
        val dead = mutable.ArrayBuffer.empty[String]
        s.mapValuesInPlace((_, n) => n - 1)
        s.foreach { case (k, n) => if (n <= 0) dead += k }
        dead.foreach(s.remove)
    }
  }

  private[functions] def mergeInto(into: Summary, other: Summary,
      capacity: Int): Unit = {
    other.foreach { case (k, n) => into.update(k, into.getOrElse(k, 0L) + n) }
    if (into.size > capacity) {
      val counts = into.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(capacity) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      into.mapValuesInPlace((_, n) => n - cut)
      into.foreach { case (k, n) => if (n <= 0) dead += k }
      dead.foreach(into.remove)
    }
  }
}

case class FreqItemsAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItems.Summary] with UnaryLike[Expression] {
  require(capacity > 0)

  override def createAggregationBuffer(): FreqItems.Summary =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: FreqItems.Summary, input: InternalRow): FreqItems.Summary = {
    val v = child.eval(input)
    if (v != null) FreqItems.insert(buffer, v.toString, capacity)
    buffer
  }

  override def merge(buffer: FreqItems.Summary, other: FreqItems.Summary): FreqItems.Summary = {
    FreqItems.mergeInto(buffer, other, capacity)
    buffer
  }

  override def eval(buffer: FreqItems.Summary): Any = {
    val sorted = buffer.toArray.sortBy { case (k, n) => (-n, k) }
    new GenericArrayData(sorted.map { case (k, n) =>
      InternalRow(UTF8String.fromString(k), n)
    })
  }

  override def serialize(buffer: FreqItems.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, n) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): FreqItems.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val s = mutable.HashMap.empty[String, Long]
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.update(new String(b, StandardCharsets.UTF_8), in.readLong())
    }
    s
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqItemsAggregate =
    copy(child = c)
  override def prettyName: String = "freq_items_mg"
}
