package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Generator expressions that compute a sketch ONCE per row and emit its band
  * rows directly.
  *
  * Why: `withColumn(sketch) + posexplode(...)` lets Catalyst's CollapseProject
  * inline the sketch expression into the generator input, so an N-band explode
  * re-evaluates the whole sketch N times per row (measured 30-60x overhead on
  * the MinHash path). A Generator evaluates its child exactly once per input
  * row by contract.
  *
  * All three generators support whole-stage codegen: GenerateExec's
  * IterableOnce path emits `value.iterator()` over whatever the generator's
  * doGenCode produced, so each doGenCode declares a
  * `scala.collection.IterableOnce<InternalRow>` built by a static
  * [[SketchOps]] kernel (same convention as Spark's `Stack`). Previously these
  * were CodegenFallback, which forced the whole Generate input stage out of
  * codegen.
  */

/** (band, bandHash) rows from hashed shingles — see [[MinHashBands]]. */
case class MinHashBandsExplode(child: Expression, numHashes: Int, bands: Int)
    extends Generator {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bandhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    SketchOps.minhashBandRowsIter(
      child.eval(input).asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        scala.collection.IterableOnce<InternalRow> ${ev.value} =
          graft.pipeline.SketchOps.minhashBandRowsIter(
            ${childGen.isNull} ? null : ${childGen.value}, $numHashes, $bands);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashBandsExplode =
    copy(child = c.head)
}

/** (pos, gramhash) rows: every `n`-word window of the text with its 1-based
  * word position — the positional (non-distinct) dual of [[HashedShingles]],
  * for exact-substring span dedup ([[Dedup.duplicateSpans]]). Same fused
  * tokenize+hash kernel; one text scan per row, codegen'd.
  */
case class ShinglePositionsExplode(child: Expression, n: Int)
    extends Generator {
  require(n >= 1, "window must be >= 1 word")

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gramhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    SketchOps.shinglePosRowsIter(
      child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        scala.collection.IterableOnce<InternalRow> ${ev.value} =
          graft.pipeline.SketchOps.shinglePosRowsIter(
            ${childGen.isNull} ? null : ${childGen.value}, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ShinglePositionsExplode =
    copy(child = c.head)
}

/** (chunk, chunkval) rows from one SimHash64 evaluation over the token array —
  * pigeonhole banding input for [[Dedup.simHashDuplicatePairs]].
  */
case class SimHashChunksExplode(child: Expression, nChunks: Int)
    extends Generator {
  require(nChunks >= 1 && nChunks <= 64)

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk", IntegerType, nullable = false),
    StructField("chunkval", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    SketchOps.simhashChunkRowsIter(
      child.eval(input).asInstanceOf[ArrayData], nChunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        scala.collection.IterableOnce<InternalRow> ${ev.value} =
          graft.pipeline.SketchOps.simhashChunkRowsIter(
            ${childGen.isNull} ? null : ${childGen.value}, $nChunks);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashChunksExplode =
    copy(child = c.head)
}

/** (pairIndex, pairValue, simhash) rows from one SimHash64 evaluation:
  * chunk-PAIR blocking. With `nChunks = maxHamming + 2`, any pair within the
  * Hamming budget leaves >= 2 chunks error-free (pigeonhole), so the two
  * sketches agree exactly on at least one chunk pair — recall 1 with bucket
  * keys of ~2x chunk width (e.g. 5 chunks of 12-16 bits -> 10 keys of 24-32
  * bits), vs <= 65k buckets/chunk for single-chunk blocking. C(nChunks, 2)
  * rows per doc.
  */
case class SimHashChunkPairsExplode(child: Expression, nChunks: Int)
    extends Generator {
  require(nChunks >= 2 && nChunks <= 32, "nChunks must be in [2, 32]")

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pair", IntegerType, nullable = false),
    StructField("pairval", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    SketchOps.simhashChunkPairRowsIter(
      child.eval(input).asInstanceOf[ArrayData], nChunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        scala.collection.IterableOnce<InternalRow> ${ev.value} =
          graft.pipeline.SketchOps.simhashChunkPairRowsIter(
            ${childGen.isNull} ? null : ${childGen.value}, $nChunks);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashChunkPairsExplode =
    copy(child = c.head)
}
