package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.security.MessageDigest

/** Single-pass 64-bit SimHash aggregate: per input token, a 64-bit hash
  * casts one ±1 vote per bit position; the final signature sets bit i iff
  * vote i is positive.
  *
  * The token hash is the first 8 md5-digest bytes read little-endian —
  * chosen over xxhash64 because it is PORTABLE: it equals DuckDB's
  * `md5_number_upper(token)` bit-for-bit, which is what lets the
  * dedup_simhash query carry a value-level SQL oracle instead of a
  * rows-only check. md5 costs more per token than xxhash64, but the
  * signature pass is a fraction of the dedup pipeline (the candidate
  * join dominates) and uniformity is what SimHash actually needs.
  *
  * A `TypedImperativeAggregate` with a 64-int buffer replaces the naive
  * formulation (64 separate `sum(CASE WHEN ...)` aggregate columns) that
  * blows up generated code and ran ~20× slower. Partial aggregation
  * works normally: votes merge by element-wise addition, so the map-side
  * combine happens before the shuffle — at 100 TB the shuffle carries
  * one 256-byte buffer per document, not one row per (document, token).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // Tokens must arrive as strings (the md5 portability contract is over
  // UTF-8 bytes); other types implicitly cast rather than ClassCast-ing
  // in the executor — simhash_agg(doc_id) hashes the decimal rendering.
  // (Return type inferred: AbstractDataType is private[sql].)
  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SimHashAgg.tokenHash(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg =
    copy(child = c)
}

object SimHashAgg {
  /** Column-level entry point: `df.groupBy($"doc").agg(simhash_agg($"tok"))`. */
  def simhash_agg(c: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(c)).toAggregateExpression())

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 8 md5-digest bytes, little-endian — identical to DuckDB's
    * `md5_number_upper(s)` reinterpreted as a signed 64-bit value (the
    * bit pattern, which is all SimHash reads, is engine-independent).
    */
  def tokenHash(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
    h
  }

  /** Reference single-value hash (used by tests to recompute votes). */
  def tokenHash(s: String): Long = tokenHash(s.getBytes("UTF-8"))
}
