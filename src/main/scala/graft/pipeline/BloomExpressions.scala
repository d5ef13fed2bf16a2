package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd expression. The filter ships
  * into generated code as a reference object (same convention as DictScore /
  * NerDetect), so a multi-hundred-MB filter neither bloats the plan string
  * nor de-codegens the stage. Input is a 64-bit key (hash wide keys first —
  * [[Dedup.dedupAgainstReference]] uses xxhash64); NULL in, NULL out.
  *
  * Guarantee direction: `false` means definitely-absent; `true` means
  * possibly-present (the caller must confirm exactly). Never used alone for
  * drop decisions.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom probe requires a BIGINT key (hash wide keys first), got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomMightContain {
  def apply(key: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(
      new BloomMightContain(GraftColumnBridge.expression(key), bloom))
}
