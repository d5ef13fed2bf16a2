package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash band hashes over pre-hashed shingles (array<long>), one pass.
  *
  * For each of `numHashes` seeded xxh64 permutations, keeps the min over the
  * shingle set; bands of `numHashes / bands` consecutive minima are combined
  * into one hash per band. A single tight primitive loop replaces numHashes
  * interpreted higher-order-function evaluations per row (~15x faster at
  * 64-128 hashes).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  private val rowsPerBand = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
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
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x9E3779B97F4A7C15L + b
      var k = b * rowsPerBand
      val end = k + rowsPerBand
      while (k < end) {
        acc = XXH64.hashLong(mins(k), acc)
        k += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}
