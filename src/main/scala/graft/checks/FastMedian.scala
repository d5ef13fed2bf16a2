package graft.checks

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Growable primitive double buffer for [[ExactMedian]] — no boxing, no
  * per-value map entries.
  */
final class DoubleBuffer(var values: Array[Double], var n: Int) {
  def this() = this(new Array[Double](64), 0)
  def add(v: Double): Unit = {
    if (n == values.length) {
      val bigger = new Array[Double](values.length * 2)
      System.arraycopy(values, 0, bigger, 0, n)
      values = bigger
    }
    values(n) = v
    n += 1
  }
  def merge(o: DoubleBuffer): Unit = {
    if (n + o.n > values.length) {
      val bigger = new Array[Double](math.max(values.length * 2, n + o.n))
      System.arraycopy(values, 0, bigger, 0, n)
      values = bigger
    }
    System.arraycopy(o.values, 0, values, n, o.n)
    n += o.n
  }
}

/** Exact interpolating median over doubles as a primitive-array
  * TypedImperativeAggregate. Spark's built-in exact `percentile` keeps a
  * boxed value->count OpenHashMap and sorts its keys — measured 1.9 s for
  * 600k doubles; this collects raw primitives per partition and quickselects
  * once (~40x less per-value overhead). Memory is 8 bytes/row on the final
  * merge — the same order as the built-in's map for mostly-distinct inputs —
  * so it suits the driver-stat checks (MAD bands) where exactness must match
  * a sequential engine's `median`. Interpolation: mean of the two middle
  * values for even counts (DuckDB/Spark percentile-0.5 semantics). NULL and
  * NaN inputs are ignored; empty input -> NULL.
  *
  * GUARD: exactness costs 8 bytes per buffered value, so an unbounded group
  * (a 10B-row ungrouped `graft_exact_median`) would OOM an executor. Past
  * `maxValues` buffered values the aggregate FAILS with a clear message
  * instead — switch to `percentile_approx` (or the engine's default
  * `exact=false` MAD path) for groups that large, or raise the cap via
  * `graft_exact_median(col, max_values)`. The hard ceiling is
  * [[ExactMedian.HardMaxValues]] (the Int-arithmetic limit of the serialized
  * buffer, ~268M values = ~2 GiB); `maxValues` above it is clamped.
  */
case class ExactMedian(child: Expression,
                       maxValues: Long = ExactMedian.DefaultMaxValues,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private val cap: Int = math.min(maxValues, ExactMedian.HardMaxValues).toInt

  override def createAggregationBuffer(): DoubleBuffer = new DoubleBuffer()

  private def capExceeded(): Nothing =
    throw new IllegalStateException(
      s"graft_exact_median: a group exceeded $cap buffered values (exact median " +
        "buffers every value at 8 bytes each). Use percentile_approx for groups this " +
        "large, keep the engine's default approximate MAD path (exact=false), or " +
        "raise the cap: graft_exact_median(col, max_values).")

  override def update(buf: DoubleBuffer, input: InternalRow): DoubleBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case n: Number => n.doubleValue()
      }
      if (!java.lang.Double.isNaN(d)) {
        if (buf.n >= cap) capExceeded()
        buf.add(d)
      }
    }
    buf
  }

  override def merge(buf: DoubleBuffer, other: DoubleBuffer): DoubleBuffer = {
    if (buf.n.toLong + other.n > cap) capExceeded()
    buf.merge(other)
    buf
  }

  override def eval(buf: DoubleBuffer): Any =
    if (buf.n == 0) null
    else {
      val n = buf.n
      val a = buf.values
      if (n % 2 == 1) quickSelect(a, n, n / 2)
      else {
        val hi = quickSelect(a, n, n / 2)
        // after selecting k = n/2, the left region holds the lower half;
        // its max is the (n/2 - 1)-th order statistic
        var lo = a(0)
        var i = 1
        while (i < n / 2) { if (a(i) > lo) lo = a(i); i += 1 }
        (lo + hi) / 2.0
      }
    }

  /** In-place quickselect for the k-th (0-based) order statistic; after the
    * call, elements left of k are <= a(k).
    */
  private def quickSelect(a: Array[Double], n: Int, k: Int): Double = {
    var left = 0
    var right = n - 1
    val rnd = new java.util.Random(0x5DEECE66DL)
    while (left < right) {
      val pivot = a(left + rnd.nextInt(right - left + 1))
      var i = left
      var j = right
      while (i <= j) {
        while (a(i) < pivot) i += 1
        while (a(j) > pivot) j -= 1
        if (i <= j) {
          val t = a(i); a(i) = a(j); a(j) = t
          i += 1; j -= 1
        }
      }
      if (k <= j) right = j
      else if (k >= i) left = i
      else return a(k)
    }
    a(k)
  }

  override def serialize(buf: DoubleBuffer): Array[Byte] = {
    // 8 * n in Int arithmetic overflows past ~268M values; the cap (clamped
    // to HardMaxValues) keeps us below, but fail loudly rather than corrupt
    require(buf.n <= ExactMedian.HardMaxValues,
      s"graft_exact_median: serialized buffer would exceed 2 GiB (${buf.n} values)")
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val values = new Array[Double](math.max(n, 1))
    var i = 0
    while (i < n) { values(i) = bb.getDouble; i += 1 }
    new DoubleBuffer(values, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMedian =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactMedian =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ExactMedian =
    copy(child = cs.head)
}

object ExactMedian {
  /** Default per-group value cap: 2^27 values = 1 GiB of buffered doubles. */
  val DefaultMaxValues: Long = 1L << 27
  /** Int-arithmetic ceiling of the serialized buffer (4 + 8*n bytes). */
  val HardMaxValues: Long = (Int.MaxValue - 4) / 8

  import org.apache.spark.sql.{Column, GraftColumnBridge}
  /** Column form: exact interpolating median of `c` cast to double. */
  def of(c: Column, maxValues: Long = DefaultMaxValues): Column =
    GraftColumnBridge.column(
      ExactMedian(GraftColumnBridge.expression(c.cast("double")), maxValues)
        .toAggregateExpression())
}
