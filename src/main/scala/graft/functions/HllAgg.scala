package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** HyperLogLog register file over a 64-bit hash input: 2^p byte
  * registers, register = the hash's top p bits, rho = 1 + the number of
  * leading zeros of the remaining (64-p) bits (i.e. 65 - p - bitlen),
  * each register keeping its MAX rho. Merge is bytewise max — the
  * canonical mergeable sketch: any partitioning, any merge order, same
  * registers. Public: ObjectHashAggregate constructs buffers across
  * classloaders.
  */
final class HllBuffer(val p: Int) {
  val regs = new Array[Byte](1 << p)

  def offer(h: Long): Unit = {
    val reg = (h >>> (64 - p)).toInt
    val m = h & ((1L << (64 - p)) - 1)
    val rho =
      if (m == 0L) 65 - p
      else 65 - p - (64 - java.lang.Long.numberOfLeadingZeros(m))
    if (rho > regs(reg)) regs(reg) = rho.toByte
  }

  def mergeFrom(o: HllBuffer): HllBuffer = {
    var i = 0
    while (i < regs.length) {
      if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
      i += 1
    }
    this
  }
}

/** `hll_registers(hash64, p)` — the HyperLogLog register file as
  * `array<struct<register int, max_rho int>>` over the OCCUPIED
  * registers, register-ascending (a deterministic, integer-exact view
  * of the whole sketch; the estimate is one driver-side formula over
  * it, and empty registers are the 2^p complement).
  *
  * The scale contract: exact `COUNT(DISTINCT key)` over a 100-TB table
  * is an Expand + a shuffle carrying the full distinct key set —
  * billions of rows crossing the wire to answer one number. This
  * aggregate's state is a CONSTANT 2^p bytes per partition (1 KiB at
  * p=10), merged bytewise-max map-side, so the exchange carries one
  * register file per map task and the relative error is the standard
  * 1.04/√2^p (~3% at p=10). The hash is the caller's 64-bit column
  * (md5-derived for cross-engine parity), so register contents are
  * bit-identical to a GROUP-BY-register oracle: the gate certifies the
  * sketch CONSTRUCTION exactly, not just the estimate's ballpark.
  */
case class HllAgg(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4, 16], got $p")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val h = child.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = a.mergeFrom(b)

  override def eval(buf: HllBuffer): Any = {
    var n = 0
    var i = 0
    while (i < buf.regs.length) { if (buf.regs(i) > 0) n += 1; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < buf.regs.length) {
      if (buf.regs(i) > 0) {
        val row = new GenericInternalRow(2)
        row.update(0, i)
        row.update(1, buf.regs(i).toInt)
        out(j) = row
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val bytes = new Array[Byte](1 + buf.regs.length)
    bytes(0) = buf.p.toByte
    System.arraycopy(buf.regs, 0, bytes, 1, buf.regs.length)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.regs.length)
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("register", IntegerType, nullable = false),
    StructField("max_rho", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): HllAgg = copy(child = newChild)
}

object HllAgg {
  /** Column-level entry point:
    * `df.agg(hll_registers(md5h, 10))` → occupied registers.
    */
  def hll_registers(hash64: Column, p: Int): Column =
    Bridge.column(
      HllAgg(Bridge.expression(hash64), p).toAggregateExpression())

  /** The standard HLL estimate (with the small-range linear-counting
    * correction) from an occupied-register map — driver-side, for
    * specs/readouts; the gate certifies the registers themselves.
    */
  def estimate(occupied: Map[Int, Int], p: Int): Double = {
    val m = 1 << p
    var z = 0.0
    var i = 0
    while (i < m) { z += math.pow(2.0, -occupied.getOrElse(i, 0)); i += 1 }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val e = alpha * m * m / z
    val zeros = m - occupied.size
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
