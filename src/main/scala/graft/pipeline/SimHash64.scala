package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array<string> of tokens, computed in a single pass
  * per row (custom Catalyst expression; bit-vote algorithm from Charikar 2002).
  * Token hash = two seeded Murmur3-32 halves (same primitive Spark's `hash()`
  * uses), so results are stable across JVMs. Fully codegen'd via the
  * [[SketchOps]] static kernel — no CodegenFallback in the sketch stage.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SketchOps.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.SketchOps.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Distinct xxhash64'd word-n-gram shingles from a text column in one
  * codegen'd pass (see [[SketchOps.hashedShingles]]). Replaces the
  * `transform(shingles(text, n), s => xxhash64(s))` formulation: higher-order
  * functions are CodegenFallback, so that chain forced the whole sketch stage
  * (and any Generate above it) out of whole-stage codegen AND allocated every
  * intermediate shingle string; this hashes byte spans in place.
  */
case class HashedShingles(child: Expression, n: Int,
                          wholeTextFallback: Boolean = true) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SketchOps.hashedShingles(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, wholeTextFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.SketchOps.hashedShingles($c, $n, $wholeTextFallback)")

  override protected def withNewChildInternal(c: Expression): HashedShingles = copy(child = c)
}
