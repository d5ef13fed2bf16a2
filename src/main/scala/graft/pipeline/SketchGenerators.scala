package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */

/** (band, bandHash) rows from hashed shingles — see [[MinHashBands]]. */
case class MinHashBandsExplode(child: Expression, numHashes: Int, bands: Int)
    extends Generator with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  private val rowsPerBand = numHashes / bands

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bandhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v2 = XXH64.hashLong(h, s)
          if (v2 < mins(s)) mins(s) = v2
          s += 1
        }
      }
      i += 1
    }
    (0 until bands).iterator.map { b =>
      var acc = 0x9E3779B97F4A7C15L + b
      var k = b * rowsPerBand
      val end = k + rowsPerBand
      while (k < end) {
        acc = XXH64.hashLong(mins(k), acc)
        k += 1
      }
      InternalRow(b, acc)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashBandsExplode =
    copy(child = c.head)
}

/** (chunk, chunkval) rows from one SimHash64 evaluation over the token array —
  * pigeonhole banding input for [[Dedup.simHashDuplicatePairs]].
  */
case class SimHashChunksExplode(child: Expression, nChunks: Int)
    extends Generator with CodegenFallback {
  require(nChunks >= 1 && nChunks <= 64)
  private val base = 64 / nChunks
  private val offsets = ((0 until nChunks).map(_ * base) :+ 64).toArray

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk", IntegerType, nullable = false),
    StructField("chunkval", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val sim = SimHash64(child).nullSafeEval(v).asInstanceOf[Long]
    (0 until nChunks).iterator.map { i =>
      val width = offsets(i + 1) - offsets(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      InternalRow(i, (sim >>> offsets(i)) & mask, sim)
    }
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
    extends Generator with CodegenFallback {
  require(nChunks >= 2 && nChunks <= 32, "nChunks must be in [2, 32]")
  private val base = 64 / nChunks
  private val offsets = ((0 until nChunks).map(_ * base) :+ 64).toArray
  private val pairs: Array[(Int, Int)] =
    (for (i <- 0 until nChunks; j <- i + 1 until nChunks) yield (i, j)).toArray

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pair", IntegerType, nullable = false),
    StructField("pairval", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val sim = SimHash64(child).nullSafeEval(v).asInstanceOf[Long]
    def chunk(i: Int): Long = {
      val width = offsets(i + 1) - offsets(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      (sim >>> offsets(i)) & mask
    }
    pairs.iterator.zipWithIndex.map { case ((i, j), idx) =>
      InternalRow(idx, (chunk(i) << 32) | chunk(j), sim)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashChunkPairsExplode =
    copy(child = c.head)
}
