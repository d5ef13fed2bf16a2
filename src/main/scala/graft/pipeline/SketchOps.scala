package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Static (Java-callable) evaluation kernels for the pipeline sketch
  * expressions ([[SimHash64]], [[MinHashBands]], [[HyperplaneBuckets]],
  * [[NearestCentroids]]). Whole-stage codegen emits direct calls to these, so
  * the sketch-generation stages stay inside the fused loop — a
  * CodegenFallback expression de-codegens EVERY expression sharing its
  * projection (see the measured rationale at NetChecks.scala's NetOps), which
  * previously left the minhash/simhash/LSH stages fully interpreted.
  */
object SketchOps {

  /** 64-bit SimHash over an array<string> of tokens (bit-vote, Charikar 2002).
    * Token hash = two seeded Murmur3-32 halves, stable across JVMs.
    */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = tokenHash(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def tokenHash(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0)
    val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 1)
    (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
  }

  /** Per-seed base hashes for [[minhashSignatureXx]]: seed s contributes
    * XXH64.hashInt(s, 42L) — exactly what Spark's `xxhash64(lit(s), h)`
    * folds before hashing `h` — cached per signature width so the per-row
    * loop pays only the per-shingle `hashLong`.
    */
  private val xxSeedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def xxSeeds(numHashes: Int): Array[Long] =
    xxSeedCache.computeIfAbsent(numHashes, n => Array.tabulate(n)(s => XXH64.hashInt(s, 42L)))

  /** MinHash signature over pre-hashed shingles (array<long>): component s =
    * min over shingles h of `xxhash64(lit(s), h)` — BIT-IDENTICAL to the
    * higher-order-function formulation
    * `array(array_min(transform(hsh, h => xxhash64(lit(s), h))) for s)` it
    * replaces (Spark's XxHash64 folds an int child as hashInt(v, seed) and a
    * long child as hashLong(v, seed); the fold is replayed here verbatim),
    * but in ONE tight codegen'd loop instead of numHashes interpreted
    * CodegenFallback lambda evaluations per row (measured ~3 ms/doc → ~30
    * µs/doc on 24-token docs at numHashes=64). Empty or all-null input
    * arrays yield all-null components, matching `array_min(empty) = null`.
    *
    * Bit-parity boundary (ADVICE r14): parity assumes NON-NULL elements.
    * For a null element, Spark's `xxhash64(lit(s), null)` skips the null
    * child and yields hashInt(s, 42) (non-null), while this kernel skips
    * nulls entirely — an all-null array yields all-null components here vs
    * all-hashInt(s,42) there. Unreachable from the engine's callers
    * (HashedShingles declares containsNull = false), and enforced at
    * analysis by [[graft.pipeline.MinHashSignature]]'s input check.
    */
  def minhashSignatureXx(arr: ArrayData, numHashes: Int): ArrayData = {
    val seeds = xxSeeds(numHashes)
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = XXH64.hashLong(h, seeds(s))
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(mins)
  }

  /** MinHash band hashes over pre-hashed shingles (array<long>), one pass. */
  def minhashBands(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val rowsPerBand = numHashes / bands
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
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

  /** All `tables` hyperplane-LSH bucket keys for one embedding (tight loops).
    * Element t = (t << 48) | signBits.
    */
  def hyperplaneBuckets(arr: ArrayData, hyper: Array[Array[Array[Double]]],
                        planes: Int, dim: Int): ArrayData = {
    val tables = hyper.length
    val n = math.min(dim, arr.numElements())
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var p = 0
      while (p < planes) {
        val plane = hyper(t)(p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += vec(d) * plane(d); d += 1 }
        if (dot >= 0) bits |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 48) | bits
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct xxhash64'd word-n-gram shingles straight from the text bytes —
    * one pass, zero intermediate strings. Token separator is a single 0x20
    * (safe on UTF-8: continuation bytes never equal 0x20), so the byte span
    * of tokens i..i+n-1 IS the concat_ws(" ", slice(tokens, i, n)) shingle,
    * and hashing the span with seed 42 equals Spark's `xxhash64(shingle)`.
    * Fewer than n tokens degenerates to one whole-text shingle, matching
    * `shingles()`'s otherwise-branch. Output longs are sorted-unique (the
    * consumers are set ops: MinHash minima, array_intersect Jaccard).
    */
  def hashedShingles(text: UTF8String, n: Int): ArrayData =
    hashedShingles(text, n, wholeTextFallback = true)

  /** As above; `wholeTextFallback=false` yields an EMPTY array for docs with
    * fewer than n tokens (decontamination semantics: a short doc contributes
    * no grams) instead of the whole-text shingle (sketch-stability semantics).
    */
  def hashedShingles(text: UTF8String, n: Int, wholeTextFallback: Boolean): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val m = spaces + 1
    if (m < n) {
      if (!wholeTextFallback) return new GenericArrayData(Array.emptyLongArray)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    }
    val starts = new Array[Int](m + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(k) = i + 1; k += 1
      }
      i += 1
    }
    starts(m) = len + 1
    val count = m - n + 1
    val hs = new Array[Long](count)
    i = 0
    while (i < count) {
      val s = starts(i)
      hs(i) = XXH64.hashUnsafeBytes(base, off + s, starts(i + n) - 1 - s, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < count) {
      if (hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(if (uniq == count) hs else java.util.Arrays.copyOf(hs, uniq))
  }

  /** (band, bandhash) rows for [[MinHashBandsExplode]] — the generator-codegen
    * contract (GenerateExec codeGenIterableOnce) consumes a
    * `scala.collection.IterableOnce<InternalRow>`; a null shingle array yields
    * no rows.
    */
  def minhashBandRowsIter(arr: ArrayData, numHashes: Int, bands: Int): Iterator[InternalRow] = {
    if (arr == null) return Iterator.empty
    val bandArr = minhashBands(arr, numHashes, bands)
    Iterator.tabulate(bands)(b => InternalRow(b, bandArr.getLong(b)))
  }

  /** (chunk, chunkval, simhash) rows for [[SimHashChunksExplode]]: one
    * SimHash64 evaluation, nChunks pigeonhole chunks.
    */
  def simhashChunkRowsIter(arr: ArrayData, nChunks: Int): Iterator[InternalRow] = {
    if (arr == null) return Iterator.empty
    val sim = simhash64(arr)
    val base = 64 / nChunks
    Iterator.tabulate(nChunks) { i =>
      val off = i * base
      val width = (if (i == nChunks - 1) 64 else off + base) - off
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      InternalRow(i, (sim >>> off) & mask, sim)
    }
  }

  /** (pair, pairval, simhash) rows for [[SimHashChunkPairsExplode]]:
    * chunk-PAIR blocking keys from one SimHash64 evaluation.
    */
  def simhashChunkPairRowsIter(arr: ArrayData, nChunks: Int): Iterator[InternalRow] = {
    if (arr == null) return Iterator.empty
    val sim = simhash64(arr)
    val base = 64 / nChunks
    def chunk(i: Int): Long = {
      val off = i * base
      val width = (if (i == nChunks - 1) 64 else off + base) - off
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      (sim >>> off) & mask
    }
    val out = new Array[InternalRow](nChunks * (nChunks - 1) / 2)
    var idx = 0
    var i = 0
    while (i < nChunks) {
      var j = i + 1
      while (j < nChunks) {
        out(idx) = InternalRow(idx, (chunk(i) << 32) | chunk(j), sim)
        idx += 1
        j += 1
      }
      i += 1
    }
    out.iterator
  }

  /** (pos, gramhash) rows for [[ShinglePositionsExplode]]: every `n`-token
    * window of `text` with its 1-based word position — NON-distinct, in
    * document order (the positional dual of [[hashedShingles]]; same byte-span
    * XXH64-seed-42 hashing, so the two agree on gram identity). A doc with
    * fewer than n tokens emits no rows: it contains no full window. Null text
    * emits no rows.
    */
  def shinglePosRowsIter(text: UTF8String, n: Int): Iterator[InternalRow] = {
    if (text == null) return Iterator.empty
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') spaces += 1
      i += 1
    }
    val m = spaces + 1
    if (m < n) return Iterator.empty
    val starts = new Array[Int](m + 1)
    var k = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(k) = i + 1; k += 1
      }
      i += 1
    }
    starts(m) = len + 1
    val count = m - n + 1
    Iterator.tabulate(count) { p =>
      val s = starts(p)
      InternalRow(p + 1, XXH64.hashUnsafeBytes(base, off + s, starts(p + n) - 1 - s, 42L))
    }
  }

  /** L2 norm kernels for [[VectorNorm]] — sequential left-to-right
    * accumulation, the SAME element order as the old `aggregate` HOF (and
    * DuckDB's list_sum), so the 0-ulp oracle parity of the embedding stats is
    * preserved. A null element nulls the whole norm (HOF-cast semantics).
    * Boxed return so codegen can propagate the null.
    */
  def l2NormF64(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i); s += v * v; i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  def l2NormF32(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getFloat(i).toDouble; s += v * v; i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  def l2NormI64(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i).toDouble; s += v * v; i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  def l2NormI32(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getInt(i).toDouble; s += v * v; i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  /** The `nprobe` centroid ids nearest (by cosine over L2-normalized
    * centroids) to one embedding, most similar first; ties break on id.
    */
  def nearestCentroids(arr: ArrayData, normed: Array[Array[Double]],
                       nprobe: Int): ArrayData = {
    val n = arr.numElements()
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) { vec(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
    val sims = new Array[Double](normed.length)
    var c = 0
    while (c < normed.length) {
      val cen = normed(c)
      val d = math.min(n, cen.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += vec(j) * cen(j); j += 1 }
      sims(c) = dot
      c += 1
    }
    val order = sims.zipWithIndex.sortBy { case (s, idx) => (-s, idx) }
    new GenericArrayData(order.take(nprobe).map(_._2))
  }

  /** Exact cosine of two double arrays in ONE fused pass; null (boxed) when
    * lengths differ or any element is null — the exact poisoning semantics of
    * the old `zip_with`/`aggregate` HOF chain, accumulated in the same
    * left-to-right element order so results are bit-identical.
    */
  def cosineSim(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
