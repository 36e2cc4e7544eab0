package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Direct md5→BIGINT kernels for the portability-hash contract.
  *
  * The engine's cross-engine value hash is "md5 digest bytes read as an
  * integer" (== DuckDB's `md5_number_upper` little-endian, or its
  * `('0x' || substr(md5(x), 1, n))::BIGINT` hex-prefix form). The
  * original Column formulation spelled that as
  * `conv(substring(md5(c), i, j), 16, 10).cast("long")` chains: per row
  * that allocates the 32-char hex rendering, up to 8 substring slices,
  * and up to 8 string→decimal-string→long `conv` round-trips — pure
  * expression overhead dwarfing the digest itself on the HLL/CMS/DSIR
  * hot paths (guide §1.2 step 2: per-task work). These expressions
  * compute the SAME value from the raw digest bytes in one pass — no
  * hex string, no conv — with whole-stage codegen calling a static
  * helper on a thread-local MessageDigest.
  *
  * Bit-equivalence (pinned in Md5LongSpec against the old Column
  * composition):
  *   - [[Md5Num]]    == OR over i<8 of conv(substring(md5(c),2i+1,2),16,10) << 8i
  *     (first 8 digest bytes composed little-endian; byte 7's high bit
  *     lands in the sign bit exactly like the shiftleft(56) it replaces).
  *   - [[Md5Prefix]] == conv(substring(md5(c),1,nHex),16,10).cast("long")
  *     (first nHex ≤ 15 hex chars = big-endian nibbles, always ≥ 0).
  */
object Md5Helper {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(bytes)
  }

  /** First 8 digest bytes little-endian (== DuckDB md5_number_upper
    * reinterpreted as signed). */
  def num(s: UTF8String): Long = {
    val d = digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h |= (d(i) & 0xffL) << (8 * i); i += 1 }
    h
  }

  /** First `nHex` hex chars of the digest as a non-negative long
    * (nHex ≤ 15 ⇒ < 2^60). Hex char i is nibble i of the digest read
    * high-nibble-first. */
  def prefix(s: UTF8String, nHex: Int): Long = {
    val d = digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      h = (h << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    h
  }
}

case class Md5Num(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Md5Helper.num(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Helper.num($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Num =
    copy(child = newChild)
}

case class Md5Prefix(child: Expression, nHex: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(nHex >= 1 && nHex <= 15,
    s"md5_prefix: nHex must be in [1, 15], got $nHex")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Md5Helper.prefix(input.asInstanceOf[UTF8String], nHex)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Helper.prefix($c, $nHex)")
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Long {
  /** md5 digest of the UTF-8 bytes of `c`, first 8 bytes little-endian
    * as BIGINT — the `md5_number_upper` portability hash. */
  def md5_num(c: Column): Column = Bridge.column(Md5Num(Bridge.expression(c)))

  /** md5 hex-prefix hash: first `nHex` (≤ 15) hex chars of md5(c) as a
    * non-negative BIGINT. */
  def md5_prefix(c: Column, nHex: Int): Column =
    Bridge.column(Md5Prefix(Bridge.expression(c), nHex))
}
