package graft.geo

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over WKT strings. One parse per row computes every
  * property the geo check family needs (the OSS stand-in for the reference's
  * per-check `st_*` calls, geo/check_funcs.py:110-1302).
  */
object WktInfo {
  val schema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("is_valid", BooleanType),
    StructField("is_empty", BooleanType),
    StructField("dimension", IntegerType),
    StructField("num_points", IntegerType),
    StructField("area", DoubleType),
    StructField("x", DoubleType),       // point x, null for non-points
    StructField("y", DoubleType),
    StructField("xmin", DoubleType),    // envelope, null when empty
    StructField("ymin", DoubleType),
    StructField("xmax", DoubleType),
    StructField("ymax", DoubleType)
  ))
}

/** NULL when the WKT does not parse (try_to_geometry null semantics). */
case class WktInfo(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = WktInfo.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Wkt.parse(v.asInstanceOf[UTF8String].toString) match {
      case None => null
      case Some(g) =>
        val (x, y) = g match {
          case GPoint(Some(p)) => (p.x: java.lang.Double, p.y: java.lang.Double)
          case _ => (null, null)
        }
        val env = g.envelope
        def d(f: ((Double, Double, Double, Double)) => Double): java.lang.Double =
          env.map(e => java.lang.Double.valueOf(f(e))).orNull
        InternalRow(
          UTF8String.fromString(g.typeName),
          GeomOps.ogcValid(g),
          g.isEmpty,
          g.dimension,
          g.numPoints,
          g.area,
          x, y,
          d(_._1), d(_._2), d(_._3), d(_._4))
    }

  override protected def withNewChildInternal(c: Expression): WktInfo = copy(child = c)
}

/** Does the fixed reference geometry hold `relation` vs the row's geometry —
  * `st_rel(reference, column)` argument order (geo/check_funcs.py:1006).
  * NULL when the row WKT does not parse. The reference WKT is parsed once.
  */
case class WktRelation(child: Expression, referenceWkt: String, relation: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val refGeom: Geom = Wkt.parse(referenceWkt)
    .getOrElse(throw new IllegalArgumentException(s"Invalid reference WKT: $referenceWkt"))

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Wkt.parse(v.asInstanceOf[UTF8String].toString) match {
      case None => null
      case Some(g) => GeomOps.relate(relation, refGeom, g)
    }

  override protected def withNewChildInternal(c: Expression): WktRelation = copy(child = c)
}

/** Exact pairwise intersection of two WKT columns (candidate verification in
  * the D16 bucketed spatial join). NULL when either side does not parse.
  */
case class WktPairIntersects(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    (Wkt.parse(l.asInstanceOf[UTF8String].toString),
      Wkt.parse(r.asInstanceOf[UTF8String].toString)) match {
      case (Some(a), Some(b)) => GeomOps.intersects(a, b)
      case _ => null
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WktPairIntersects =
    copy(left = l, right = r)
}

/** Grid cells spanned by the geometry's envelope at `cellSize` — the blocking
  * key array for the D16 spatial self-join. Each element is `cellX * 1e9 +
  * cellY` packed into a long (cell indexes bounded by planetary coordinate
  * ranges / sane cell sizes). NULL when unparseable or empty.
  */
case class WktEnvelopeCells(child: Expression, cellSize: Double)
    extends UnaryExpression with CodegenFallback {
  require(cellSize > 0, "cellSize must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Wkt.parse(v.asInstanceOf[UTF8String].toString).flatMap(_.envelope) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) =>
        val x0 = math.floor(xmin / cellSize).toLong
        val x1 = math.floor(xmax / cellSize).toLong
        val y0 = math.floor(ymin / cellSize).toLong
        val y1 = math.floor(ymax / cellSize).toLong
        val cells = for (cx <- x0 to x1; cy <- y0 to y1) yield cx * 1000000000L + cy
        new GenericArrayData(cells.toArray): ArrayData
    }

  override protected def withNewChildInternal(c: Expression): WktEnvelopeCells = copy(child = c)
}
