package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * drop-list representation past `InSet` scale: an exact hash set of
  * 10⁸ shingle hashes is gigabytes per task, while a 1%-fpp bloom is
  * ~120 MB and probes O(1) with no allocation. One-sided error:
  * `mightContain` never misses a true member (no contaminated document
  * survives); false positives over-drop clean documents at the
  * configured fpp — the conservative trade a decontamination pass
  * wants.
  *
  * The filter ships inside the expression as a codegen reference
  * object (the same mechanism Spark's runtime-filtering bloom probe
  * uses), so executors deserialize it once per task batch, not per row.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def might_contain(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))
}
