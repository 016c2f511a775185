package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable md5-keyed sketches — KMV (distinct values + set algebra),
  * Bloom filter (membership), Count-Min (point frequency) — completing
  * the sketch family next to the HLL cardinality aggregate
  * ([[graft.functions.Hll]], ref query/common/hll.go:31-43) and the
  * Misra–Gries heavy-hitters summary ([[FreqItems]]).
  *
  * Why these three when HLL exists: HLL answers ONLY |A| and |A∪B| — a
  * KMV (k-minimum-values / bottom-k) sketch additionally estimates
  * |A∩B| and Jaccard between any two sketched sets (Bar-Yossef et al.
  * 2002; Beyer et al. SIGMOD 2007), which is the cross-corpus overlap
  * question curation asks constantly. The Bloom filter turns a large
  * reference set (eval benchmarks, URL blocklists) into a fixed-size
  * broadcastable bitset probed map-side with zero false negatives. The
  * Count-Min sketch answers point-frequency queries over a stream whose
  * key space is too large to groupBy exactly (Cormode & Muthukrishnan
  * 2005) — the estimating counterpart of the exact-top-k [[FreqItems]].
  *
  * All three are O(fixed) per partial, merge associatively (KMV: union
  * + keep k smallest; Bloom: bitwise OR; CMS: pointwise add) and ride
  * Catalyst partial/final aggregation — the same distributed algebra the
  * reference's broker applies to HLL register-max merges
  * (broker/result_merge.go:42-141).
  *
  * Every hash derives from the md5 HEX string (first 15 hex chars → a
  * 60-bit non-negative long), so a SQL oracle replays the sketch
  * CONTENTS exactly: `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)`
  * in DuckDB ≡ `conv(substring(md5(x), 1, 15), 16, 10)` in Spark ≡
  * [[Sketches.hash60]] here. Estimates are then integer/exact on both
  * sides — the hash-replay gate pattern (`q_shuffle_shards` precedent).
  */
object Sketches {

  // MessageDigest.getInstance walks the provider registry — reuse one
  // instance per thread (reset() via digest()); measured ~2x on the
  // token-proportional update paths at sf1
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5-prefix hash of the UTF-8 bytes — identical to Spark's
    * `conv(substring(md5(c),1,15),16,10)` and DuckDB's
    * `('0x'||substring(md5(x),1,15))::BIGINT`.
    */
  def hash60(s: String): Long = {
    val md = localMd5.get()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Seeded variant: hash of `"<seed>:<s>"` — the per-row/per-probe hash
    * of the Bloom and Count-Min sketches.
    */
  def seededHash60(seed: Int, s: String): Long = hash60(s"$seed:$s")

  /** The same 60-bit hash as a codegen'd Column (for probes and oracles). */
  def hash60Col(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private def seededHash60Col(seed: Int, c: Column): Column =
    hash60Col(concat(lit(s"$seed:"), c))

  // --- KMV --------------------------------------------------------------

  /** kmv_sketch(x, k): the k smallest DISTINCT hash60 values seen, as a
    * sorted ascending array<long>. With fewer than k distinct values the
    * sketch IS the exact hashed set.
    */
  def kmv(c: Column, k: Int): Column =
    Bridge.column(KmvAggregate(Bridge.expression(c), k).toAggregateExpression())

  /** Distinct-count estimate off a KMV sketch array: `(k-1) * 2^60 / kth`
    * when the sketch is full, else the exact sketch size. Double-valued —
    * spec-level only (gates pin the integer sketch contents instead).
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
        element_at(sketch, k).cast(DoubleType))

  /** Combine two KMV sketches into the union sketch (k smallest of the
    * union), plus the shared-value count that estimates Jaccard as
    * `shared / |union sketch|`. Returns struct(kth, shared, usize).
    */
  def kmvCombine(a: Column, b: Column, k: Int): Column = {
    val u = slice(array_sort(array_union(a, b)), 1, k)
    val kth = element_at(u, size(u))
    val shared = size(filter(array_intersect(a, b), x => x <= kth))
    struct(kth.as("kth"), shared.as("shared"), size(u).as("usize"))
  }

  // --- Bloom ------------------------------------------------------------

  /** bloom_sketch(x, mBits, seeds): fixed-size bitset as array<int> of
    * 0/1 flags, length mBits (expanded at eval for builtin-function
    * probes; the aggregation buffer is a packed long array).
    */
  def bloom(c: Column, mBits: Int, seeds: Int): Column =
    Bridge.column(BloomAggregate(Bridge.expression(c), mBits, seeds)
      .toAggregateExpression())

  /** Might-contain probe against a [[bloom]] eval array — all `seeds` bit
    * positions set. Pure builtin Columns (codegen'd): no false negatives,
    * false positives deterministic from the hash, so a SQL oracle replays
    * membership EXACTLY.
    */
  def bloomMightContain(bits: Column, item: Column, mBits: Int, seeds: Int): Column =
    (0 until seeds).map { i =>
      get(bits, (seededHash60Col(i, item) % mBits).cast(IntegerType)) === 1
    }.reduce(_ && _)

  // --- Count-Min --------------------------------------------------------

  /** cms_sketch(x, width, depth): depth×width counter matrix flattened
    * row-major to array<long> (row r, bucket b at index r*width + b).
    */
  def cms(c: Column, width: Int, depth: Int): Column =
    Bridge.column(CmsAggregate(Bridge.expression(c), width, depth)
      .toAggregateExpression())

  /** Point-frequency estimate: min over rows of the item's bucket counter.
    * Pure builtin Columns over the eval array.
    */
  def cmsEstimate(sketch: Column, item: Column, width: Int, depth: Int): Column =
    least((0 until depth).map { r =>
      get(sketch, (lit(r.toLong * width) +
        seededHash60Col(r, item) % width).cast(IntegerType))
    }: _*)
}

/** K-minimum-values sketch: bounded sorted set of the k smallest distinct
  * hash60 values.
  */
case class KmvAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k > 0)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(s: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (s.size < k) { s.add(h); () }
    else if (h < s.last()) {
      if (s.add(h)) { s.remove(s.last()); () }
    }
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, Sketches.hash60(v.toString))
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val s = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    (0 until n).foreach(_ => s.add(in.readLong()))
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvAggregate =
    copy(child = c)
  override def prettyName: String = "kmv_sketch"
}

/** Bloom filter: packed-long bitset buffer, 0/1 int array at eval. */
case class BloomAggregate(
    child: Expression,
    mBits: Int,
    seeds: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits $mBits must be a positive multiple of 64")
  require(seeds > 0)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < seeds) {
        val pos = (Sketches.seededHash60(i, s) % mBits).toInt
        buffer(pos >> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val arr = new Array[Any](mBits)
    var i = 0
    while (i < mBits) {
      arr(i) = ((buffer(i >> 6) >>> (i & 63)) & 1L).toInt
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    Array.fill(mBits / 64)(in.readLong())
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): BloomAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAggregate =
    copy(child = c)
  override def prettyName: String = "bloom_sketch"
}

/** Count-Min sketch: depth×width long counters, row-major. */
case class CmsAggregate(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(width > 0 && depth > 0)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var r = 0
      while (r < depth) {
        val b = (Sketches.seededHash60(r, s) % width).toInt
        buffer(r * width + b) += 1
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    Array.fill(width * depth)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): CmsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsAggregate =
    copy(child = c)
  override def prettyName: String = "cms_sketch"
}
