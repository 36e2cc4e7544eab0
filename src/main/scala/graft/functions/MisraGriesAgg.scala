package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Misra-Gries heavy-hitter summary: at most `c` (key, count) counters.
  *
  * Stream update is the classic algorithm — increment a present key,
  * admit a new key while capacity remains, otherwise decrement EVERY
  * counter by one (dropping zeros). Merge is the mergeable-summaries
  * rule (Agarwal et al., PODS'12): pointwise-sum the two counter sets,
  * then subtract the (c+1)-th largest count from all and drop the
  * non-positive — at most c survive, and the summed decrements stay
  * within the stream bound. The invariant both operations preserve:
  * every key's counter undercounts its true frequency by at most
  * N/(c+1), so ANY key with true frequency > N/(c+1) has a positive
  * counter and is retained. The summary's key SET is therefore a
  * guaranteed superset of the heavy hitters — the caller re-counts the
  * ≤ c candidates exactly and filters, making the end-to-end result
  * exact and deterministic even though which EXTRA candidates survive
  * depends on partitioning.
  *
  * Public: ObjectHashAggregate constructs buffer objects across
  * classloaders.
  */
final class MgBuffer(val c: Int) {
  import scala.collection.mutable
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  def offer(key: UTF8String): Unit = {
    counts.get(key) match {
      case Some(v) => counts.update(key, v + 1L)
      case None if counts.size < c =>
        // inputs hand out UTF8Strings backed by reused row buffers
        counts.update(key.clone(), 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.foreach { case (k, v) =>
          if (v == 1L) dead += k else counts.update(k, v - 1L)
        }
        dead.foreach(counts.remove)
    }
  }

  def add(key: UTF8String, n: Long): Unit =
    counts.update(key, counts.getOrElse(key, 0L) + n)

  def mergeFrom(o: MgBuffer): MgBuffer = {
    o.counts.foreach { case (k, v) => add(k, v) }
    if (counts.size > c) {
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val sub = vs(vs.length - 1 - c) // (c+1)-th largest
      val keys = counts.keys.toArray
      keys.foreach { k =>
        val nv = counts(k) - sub
        if (nv <= 0L) counts.remove(k) else counts.update(k, nv)
      }
    }
    this
  }

  /** Candidate keys, sorted (binary UTF8 order) for a deterministic
    * output array.
    */
  def keysSorted: Array[UTF8String] = {
    val ks = counts.keys.toArray
    java.util.Arrays.sort(ks,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    ks
  }

  def toBytes: Array[Byte] = {
    var bytes = 0
    counts.foreach { case (k, _) => bytes += k.numBytes() }
    val bb = ByteBuffer.allocate(8 + counts.size * 12 + bytes)
    bb.putInt(c).putInt(counts.size)
    counts.foreach { case (k, v) =>
      val b = k.getBytes
      bb.putInt(b.length).put(b).putLong(v)
    }
    bb.array()
  }
}

object MgBuffer {
  def fromBytes(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.add(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }
}

/** `misra_gries(key, c)` — bounded-state heavy-hitter CANDIDATES as
  * `array<string>`: the ≤ c keys whose true frequency may exceed
  * N/(c+1), guaranteed to include every key that actually does.
  *
  * The scale contract: a `groupBy(key).count` pre-pass shuffles the
  * ENTIRE key vocabulary (billions of rows for URL/author-shaped keys)
  * to answer what is usually a tiny question — which handful of keys
  * are hot enough to need salting / capping / a skew-join hint. This
  * aggregate's state is c counters per partition, merged map-side like
  * any partial agg, so the exchange carries c entries per map task and
  * the follow-up EXACT count restricts to the ≤ c candidates via a
  * broadcast semi-join — no vocabulary-wide shuffle anywhere.
  */
case class MisraGriesAgg(
    child: Expression, c: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(c > 0 && c <= (1 << 16),
    s"misra_gries: c must be in [1, 2^16], got $c")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(c)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val k = child.eval(input)
    if (k != null) buf.offer(k.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = a.mergeFrom(b)

  override def eval(buf: MgBuffer): Any =
    new GenericArrayData(buf.keysSorted.asInstanceOf[Array[Any]])

  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(bytes)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAgg = copy(child = newChild)
}

object MisraGriesAgg {
  /** Column-level entry point:
    * `df.agg(misra_gries($"k", 8))` → `array<string>` candidates.
    */
  def misra_gries(key: Column, c: Int): Column =
    Bridge.column(
      MisraGriesAgg(Bridge.expression(key), c).toAggregateExpression())

  /** Counts-carrying variant: `array<struct<k string, cnt long>>` —
    * the summary form a STREAM persists per micro-batch so later
    * batches' summaries can keep merging (the counts are what the
    * mergeable-summaries rule folds; the key-only form suffices when
    * the caller re-counts exactly in the same job).
    */
  def misra_gries_counts(key: Column, c: Int): Column =
    Bridge.column(
      MisraGriesCountsAgg(Bridge.expression(key), c)
        .toAggregateExpression())

  /** The pairwise mergeable-summaries fold over materialized
    * summaries, driver-side (for stream readouts over O(batches) × c
    * rows): same rule as [[MgBuffer.mergeFrom]].
    */
  def mergeSummaries(batches: Seq[Seq[(String, Long)]],
      c: Int): Map[String, Long] = {
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    batches.foreach { b =>
      b.foreach { case (k, v) => acc.update(k, acc.getOrElse(k, 0L) + v) }
      if (acc.size > c) {
        val vs = acc.values.toArray
        java.util.Arrays.sort(vs)
        val sub = vs(vs.length - 1 - c)
        acc.keys.toArray.foreach { k =>
          val nv = acc(k) - sub
          if (nv <= 0L) acc.remove(k) else acc.update(k, nv)
        }
      }
    }
    acc.toMap
  }
}

/** [[MisraGriesAgg]] with counts in the output —
  * `array<struct<k string, cnt long>>`, key-ascending. Same buffer,
  * same guarantee; the counts make persisted summaries MERGEABLE
  * across micro-batches (a later summary folds in via
  * [[MisraGriesAgg.mergeSummaries]]).
  */
case class MisraGriesCountsAgg(
    child: Expression, c: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(c > 0 && c <= (1 << 16),
    s"misra_gries_counts: c must be in [1, 2^16], got $c")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def createAggregationBuffer(): MgBuffer = new MgBuffer(c)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val k = child.eval(input)
    if (k != null) buf.offer(k.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = a.mergeFrom(b)

  override def eval(buf: MgBuffer): Any = {
    val ks = buf.keysSorted
    val out = new Array[Any](ks.length)
    var i = 0
    while (i < ks.length) {
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(2)
      row.update(0, ks(i))
      row.update(1, buf.counts(ks(i)))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_counts"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesCountsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesCountsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesCountsAgg = copy(child = newChild)
}
