package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k buffer: at most k (score, id) pairs kept sorted
  * best-first, where "better" = higher score, ties to the smaller id
  * (`java.lang.Double.compare` on scores, so the -0.0 < 0.0 edge orders
  * exactly like Spark's DESC sort). Public: ObjectHashAggregate
  * constructs buffer objects across classloaders.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** true if (s1, id1) ranks strictly better than (s2, id2). */
  private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return
    // position = number of existing entries strictly better than (s, id)
    var pos = 0
    while (pos < n && better(scores(pos), ids(pos), s, id)) pos += 1
    val last = if (n == k) k - 1 else n
    var i = last
    while (i > pos) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
    this
  }
}

/** Bounded-state top-k per group: `top_k(score, id, k)` returns the k
  * best (score, id) pairs as `array<struct<score, id>>`, best first.
  *
  * This is the scale-correct form of "rank per key, keep k": the
  * `row_number() OVER (PARTITION BY key ORDER BY score DESC)` window it
  * replaces cannot partially aggregate — every candidate row of a key
  * crosses the exchange and gets buffered and sorted in one task before
  * k survive. This aggregate's state is k pairs per (group, partition),
  * merged map-side like any other partial agg, so the shuffle carries
  * one k-element buffer per group per map task instead of the full
  * candidate set — for an ANN scoring pass over a corpus, |corpus|/k ×
  * less exchange traffic, and no per-key sort at all (insertion into a
  * k-bounded sorted buffer is the sort).
  */
case class TopKAgg(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"top_k: k must be in [1, 2^20], got $k")

  override def inputTypes = Seq(DoubleType, LongType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = a.mergeFrom(b)

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      val row = new GenericInternalRow(2)
      row.update(0, buf.scores(i))
      row.update(1, buf.ids(i))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    // entries arrive already sorted; insert preserves order in O(k)
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg = copy(left = l, right = r)
}

object TopKAgg {
  /** Column-level entry point:
    * `df.groupBy($"q").agg(top_k($"sim", $"id", 5))`.
    */
  def top_k(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())

  /** String-id variant: `top_k_str($"n", $"word", 100)`. */
  def top_k_str(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKStrAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}

/** String-id sibling of [[TopKBuffer]]: ties order by the UTF8String's
  * binary (byte-wise unsigned) comparison — identical to Spark's and
  * DuckDB's default ASC string sort, so `(score DESC, id ASC)` here
  * matches `ORDER BY n DESC, word` in the oracle. Inserted ids are
  * cloned: aggregate inputs hand out UTF8Strings backed by reused row
  * buffers.
  */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)
  var n = 0

  private def better(s1: Double, id1: UTF8String,
      s2: Double, id2: UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1.compareTo(id2) < 0)
  }

  def insert(s: Double, id: UTF8String): Unit = {
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return
    var pos = 0
    while (pos < n && better(scores(pos), ids(pos), s, id)) pos += 1
    val last = if (n == k) k - 1 else n
    var i = last
    while (i > pos) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
    this
  }
}

/** `top_k_str(score, id, k)` — the bounded-state top-k aggregate for
  * STRING ids (words, URLs, content hashes): k best (score, id) pairs
  * per group as `array<struct<score double, id string>>`, best first
  * (score DESC, id ASC on ties). Same scale contract as [[TopKAgg]]:
  * partial-aggregates map-side, the shuffle carries one k-element buffer
  * per group per map task instead of the full candidate set, and there
  * is no per-key sort — which is what lets a corpus-wide vocabulary
  * ranking (`vocab_coverage`) run with NO window at all instead of
  * funnelling every distinct token into one task. The Long-id
  * [[TopKAgg]] stays as the fast path (primitive arrays, no per-entry
  * allocation) for numeric ids.
  */
case class TopKStrAgg(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer]
  with ImplicitCastInputTypes with BinaryLike[Expression] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0 && k <= (1 << 20), s"top_k_str: k must be in [1, 2^20], got $k")

  override def inputTypes = Seq(DoubleType, StringType)

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buf.insert(s.asInstanceOf[Double],
        id.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(a: TopKStrBuffer, b: TopKStrBuffer): TopKStrBuffer =
    a.mergeFrom(b)

  override def eval(buf: TopKStrBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      val row = new GenericInternalRow(2)
      row.update(0, buf.scores(i))
      row.update(1, buf.ids(i))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.n) { bytes += buf.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buf.n * 12 + bytes)
    bb.putInt(buf.k).putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i))
      val b = buf.ids(i).getBytes
      bb.putInt(b.length).put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.insert(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_str"

  override def withNewMutableAggBufferOffset(o: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStrAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKStrAgg = copy(left = l, right = r)
}
