package graft.anomaly

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Pure-Scala Isolation Forest (Liu/Ting/Zhou 2008) — the OSS stand-in for the
  * reference's sklearn-IsolationForest pandas-UDF scorer
  * (anomaly/core.py:187-225). The algorithm is driver-friendly by design:
  * each tree trains on a tiny random subsample (default 256 rows), so the
  * whole forest fits in a broadcast and scoring is a row-local expression —
  * no Python workers, no model registry round-trips.
  */
object IsolationForest {

  sealed trait Node extends Serializable
  final case class Split(feature: Int, value: Double, left: Node, right: Node) extends Node
  final case class Leaf(size: Int) extends Node

  final case class Model(trees: Array[Node], subsampleSize: Int) extends Serializable {
    /** Average-path-length normalizer c(n) (paper eq. 1). */
    def cFactor: Double = c(subsampleSize)

    /** Anomaly score in (0, 1): 0.5-ish = normal, -> 1 = anomalous. */
    def score(row: Array[Double]): Double = {
      var sum = 0.0
      var i = 0
      while (i < trees.length) { sum += pathLength(trees(i), row, 0); i += 1 }
      val avg = sum / trees.length
      math.pow(2.0, -avg / cFactor)
    }

    /** Population std-dev of the per-tree scores 2^(-h_i/c): the ensemble's
      * disagreement about this row — the reference's confidence signal
      * (anomaly/explainability.py ensemble variance). Low std = confident.
      */
    def scoreStd(row: Array[Double]): Double = {
      var sum = 0.0
      var sumSq = 0.0
      var i = 0
      while (i < trees.length) {
        val s = math.pow(2.0, -pathLength(trees(i), row, 0) / cFactor)
        sum += s; sumSq += s * s
        i += 1
      }
      val n = trees.length
      val mean = sum / n
      math.sqrt(math.max(0.0, sumSq / n - mean * mean))
    }

    /** Per-feature contribution percentages (sum 100) from depth-weighted
      * path attribution over all trees; uniform when no split was taken.
      */
    def contributions(row: Array[Double], nFeatures: Int): Array[Double] = {
      val acc = new Array[Double](nFeatures)
      var i = 0
      while (i < trees.length) { pathWeights(trees(i), row, 0, acc); i += 1 }
      var total = 0.0
      i = 0
      while (i < nFeatures) { total += acc(i); i += 1 }
      if (total <= 0) java.util.Arrays.fill(acc, 100.0 / nFeatures)
      else { i = 0; while (i < nFeatures) { acc(i) = acc(i) / total * 100.0; i += 1 } }
      acc
    }
  }

  private def c(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  private def pathLength(node: Node, row: Array[Double], depth: Int): Double = node match {
    case Leaf(size) => depth + c(size)
    case Split(f, v, l, r) =>
      val x = if (f < row.length) row(f) else 0.0
      if (x < v) pathLength(l, row, depth + 1) else pathLength(r, row, depth + 1)
  }

  /** Depth-weighted split-feature attribution (the deterministic stand-in for
    * the reference's SHAP explanations, anomaly/explainability.py:256): each
    * split on the row's path credits its feature 1/(depth+1) — early splits
    * isolate more, so they weigh more. Accumulated over all trees into `acc`
    * (length = feature count).
    */
  private def pathWeights(node: Node, row: Array[Double], depth: Int, acc: Array[Double]): Unit =
    node match {
      case Leaf(_) => ()
      case Split(f, v, l, r) =>
        if (f < acc.length) acc(f) += 1.0 / (depth + 1)
        val x = if (f < row.length) row(f) else 0.0
        pathWeights(if (x < v) l else r, row, depth + 1, acc)
    }

  /** Train on a driver-side sample: `numTrees` trees, each over a random
    * subsample of `subsampleSize` rows, split until isolation or the height
    * limit ceil(log2(subsampleSize)).
    */
  def train(sample: Array[Array[Double]], numTrees: Int = 100,
            subsampleSize: Int = 256, seed: Long = 42L): Model = {
    require(sample.nonEmpty, "training sample must not be empty")
    val rnd = new java.util.Random(seed)
    val psi = math.min(subsampleSize, sample.length)
    val heightLimit = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt.max(1)
    val trees = Array.fill(numTrees) {
      val sub = Array.fill(psi)(sample(rnd.nextInt(sample.length)))
      grow(sub, 0, heightLimit, rnd)
    }
    Model(trees, psi)
  }

  private def grow(rows: Array[Array[Double]], depth: Int, limit: Int,
                   rnd: java.util.Random): Node = {
    if (depth >= limit || rows.length <= 1) return Leaf(rows.length)
    val nFeatures = rows.head.length
    // pick among features that still vary in this partition
    val candidates = (0 until nFeatures).filter { f =>
      var mn = Double.MaxValue; var mx = Double.MinValue
      rows.foreach { r => val x = r(f); if (x < mn) mn = x; if (x > mx) mx = x }
      mx > mn
    }
    if (candidates.isEmpty) return Leaf(rows.length)
    val f = candidates(rnd.nextInt(candidates.length))
    var mn = Double.MaxValue; var mx = Double.MinValue
    rows.foreach { r => val x = r(f); if (x < mn) mn = x; if (x > mx) mx = x }
    val split = mn + rnd.nextDouble() * (mx - mn)
    val (l, r) = rows.partition(_(f) < split)
    if (l.isEmpty || r.isEmpty) Leaf(rows.length)
    else Split(f, split, grow(l, depth + 1, limit, rnd), grow(r, depth + 1, limit, rnd))
  }
}

/** Static (Java-callable) evaluation helpers for the codegen'd forest
  * expressions: scoring stays a JVM tree-walk either way, but real doGenCode
  * keeps a composed rule set's shared projection inside whole-stage codegen
  * (one CodegenFallback expression would de-codegen every check in it).
  */
object IForestOps {
  private def toRow(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val row = new Array[Double](n)
    var i = 0
    while (i < n) { row(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i); i += 1 }
    row
  }

  // model passed as Object: the codegen reference slot must use a Java
  // source-level type name, and the nested case class's binary name
  // (IsolationForest$Model) is not one
  def score(arr: ArrayData, model: Object): Double =
    model.asInstanceOf[IsolationForest.Model].score(toRow(arr))

  def contrib(arr: ArrayData, model: Object, nFeatures: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      model.asInstanceOf[IsolationForest.Model].contributions(toRow(arr), nFeatures))

  def scoreStd(arr: ArrayData, model: Object): Double =
    model.asInstanceOf[IsolationForest.Model].scoreStd(toRow(arr))

  def percentile(x: Double, sorted: Array[Double]): Double = {
    // mean-rank percentile: (count(< x) + count(<= x)) / 2 — ties land mid-rank
    // (a constant distribution maps to 50, not 100)
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < x) lo = mid + 1 else hi = mid
    }
    val less = lo
    lo = 0; hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    val lessEq = lo
    (less + lessEq).toDouble / 2.0 / sorted.length * 100.0
  }
}

/** Row-local scoring expression over an array<double> feature vector; the
  * trained forest ships inside the expression (tiny: <=100 trees over <=256
  * rows). NULL input -> NULL score.
  */
case class IForestScore(child: Expression, model: IsolationForest.Model)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = IForestOps.score(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("model", model, "java.lang.Object")
    defineCodeGen(ctx, ev, c => s"graft.anomaly.IForestOps.score($c, $modelRef)")
  }

  override protected def withNewChildInternal(c: Expression): IForestScore = copy(child = c)
}

/** Per-feature contribution percentages as array<double> (aligned with the
  * check's column list, summing to ~100). Row-local; NULL input -> NULL.
  * Wrap in `when(is_anomaly, ...)` so the second forest walk is only paid on
  * flagged rows, like the reference computes SHAP for anomalies only.
  */
/** Per-tree score std-dev (ensemble disagreement) — confidence_std in the
  * anomaly info struct. NULL input -> NULL.
  */
case class IForestScoreStd(child: Expression, model: IsolationForest.Model)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    IForestOps.scoreStd(v.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("model", model, "java.lang.Object")
    defineCodeGen(ctx, ev, c => s"graft.anomaly.IForestOps.scoreStd($c, $modelRef)")
  }

  override protected def withNewChildInternal(c: Expression): IForestScoreStd = copy(child = c)
}

case class IForestContrib(child: Expression, model: IsolationForest.Model, nFeatures: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    IForestOps.contrib(v.asInstanceOf[ArrayData], model, nFeatures)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("model", model, "java.lang.Object")
    defineCodeGen(ctx, ev, c => s"graft.anomaly.IForestOps.contrib($c, $modelRef, $nFeatures)")
  }

  override protected def withNewChildInternal(c: Expression): IForestContrib = copy(child = c)
}

/** Percentile (0-100) of a double value within a sorted reference
  * distribution — binary search, O(log n) per row (vs an interpreted
  * higher-order aggregate over a 10k-literal array).
  */
case class ScorePercentile(child: Expression, sorted: Array[Double])
    extends UnaryExpression {
  require(sorted.nonEmpty, "reference distribution must not be empty")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    IForestOps.percentile(v.asInstanceOf[Double], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sortedRef = ctx.addReferenceObj("sorted", sorted, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.anomaly.IForestOps.percentile($c, $sortedRef)")
  }

  override protected def withNewChildInternal(c: Expression): ScorePercentile = copy(child = c)
}
