package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Karp–Rabin rolling hash + window
  * minima): hash every k-byte gram with a polynomial rolling hash
  * (O(1) per position), then keep the minimum hash of each sliding
  * window of `w` grams — the classic winnowing scheme: any shared
  * substring of length ≥ k + w − 1 between two documents is guaranteed
  * to share a fingerprint, and expected density is 2/(w+1).
  *
  * Shape at scale: one pass over the bytes per row, no shuffle; overlap
  * detection is then an explode + equi-join on the fingerprint — the
  * same blocking-key pattern as the other dedup operators.
  *
  * Codegen: the kernel lives in a static method the generated code
  * calls directly (no interpreted expression tree in the loop).
  */
case class RollingHashMinima(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1,
    s"winnow_fingerprints: k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RollingHashMinima.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashMinima.winnow($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): RollingHashMinima =
    copy(child = c)
}

object RollingHashMinima {
  private val Base = 257L
  private val Mod = (1L << 61) - 1 // Mersenne prime keeps products exact-ish

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit Mersenne modular multiply via 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    if (r >= Mod) r - Mod else r
  }

  /** Distinct sorted window-minima of the k-gram rolling hashes. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // initial gram + precompute Base^(k-1)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = (mulmod(h, Base) + (bytes(i) & 0xffL)) % Mod
      if (i < k - 1) pow = mulmod(pow, Base)
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      val out = mulmod(bytes(i - 1) & 0xffL, pow)
      h = ((h - out + Mod) % Mod)
      h = (mulmod(h, Base) + (bytes(i + k - 1) & 0xffL)) % Mod
      hashes(i) = h
      i += 1
    }
    // window minima (winnowing): distinct minima over each w-gram window
    val minima = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var m = Long.MaxValue
      var j = 0
      while (j < nGrams) { if (hashes(j) < m) m = hashes(j); j += 1 }
      minima.add(m)
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var m = Long.MaxValue
        var j = start
        while (j < start + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        minima.add(m)
        start += 1
      }
    }
    val out = new Array[Long](minima.size())
    val it = minima.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    new GenericArrayData(out)
  }

  /** Column entry point: `winnow_fingerprints(col, k, w)`. */
  def winnow_fingerprints(c: Column, k: Int = 8, w: Int = 16): Column =
    Bridge.column(RollingHashMinima(Bridge.expression(c), k, w))
}
