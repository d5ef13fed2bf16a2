package graft.geo

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over WKT strings. One parse per row computes every
  * property the geo check family needs (the OSS stand-in for the reference's
  * per-check `st_*` calls, geo/check_funcs.py:110-1302).
  *
  * All expressions implement real `doGenCode` (static calls into [[GeoOps]]):
  * a single CodegenFallback expression inside a composed check projection or
  * the result-reading filter disables whole-stage codegen for EVERY check in
  * that operator — measured ~2x on the 24-check row suite.
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

/** Static (Java-callable) evaluators for the codegen'd WKT expressions;
  * null returns signal unparseable input (try_to_geometry null semantics).
  */
object GeoOps {
  // the 7 type names the parser can yield, as reusable UTF8Strings — a
  // fromString per row was a visible slice of the 10M-row row-check suite
  private val typeUtf8: java.util.HashMap[String, UTF8String] = {
    val m = new java.util.HashMap[String, UTF8String]()
    Seq("ST_Point", "ST_LineString", "ST_Polygon", "ST_MultiPoint",
      "ST_MultiLineString", "ST_MultiPolygon", "ST_GeometryCollection")
      .foreach(n => m.put(n, UTF8String.fromString(n)))
    m
  }
  private val pointName = typeUtf8.get("ST_Point")

  private def typeName(g: Geom): UTF8String = {
    val cached = typeUtf8.get(g.typeName)
    if (cached != null) cached else UTF8String.fromString(g.typeName)
  }

  def wktInfo(s: UTF8String): InternalRow =
    Wkt.parse(s.toString) match {
      case None => null
      case Some(GPoint(Some(p))) =>
        // fast path for the most common row-check input: every field below
        // equals the generic branch's value for a non-empty point (ogcValid
        // is unconditionally true for points, envelope = the point itself)
        val bx = java.lang.Double.valueOf(p.x)
        val by = java.lang.Double.valueOf(p.y)
        InternalRow(pointName, true, false, 0, 1, 0.0, bx, by, bx, by, bx, by)
      case Some(g) =>
        val (x, y) = g match {
          case GPoint(Some(p)) => (p.x: java.lang.Double, p.y: java.lang.Double)
          case _ => (null, null)
        }
        val env = g.envelope
        def d(f: ((Double, Double, Double, Double)) => Double): java.lang.Double =
          env.map(e => java.lang.Double.valueOf(f(e))).orNull
        InternalRow(
          typeName(g),
          GeomOps.ogcValid(g),
          g.isEmpty,
          g.dimension,
          g.numPoints,
          g.area,
          x, y,
          d(_._1), d(_._2), d(_._3), d(_._4))
    }

  def wktRelation(s: UTF8String, refGeom: Geom, relation: String): java.lang.Boolean =
    Wkt.parse(s.toString) match {
      case None => null
      case Some(g) => java.lang.Boolean.valueOf(GeomOps.relate(relation, refGeom, g))
    }

  def pairIntersects(l: UTF8String, r: UTF8String): java.lang.Boolean =
    (Wkt.parse(l.toString), Wkt.parse(r.toString)) match {
      case (Some(a), Some(b)) => java.lang.Boolean.valueOf(GeomOps.intersects(a, b))
      case _ => null
    }

  def envelopeCells(s: UTF8String, cellSize: Double): ArrayData =
    Wkt.parse(s.toString).flatMap(_.envelope) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) =>
        val x0 = math.floor(xmin / cellSize).toLong
        val x1 = math.floor(xmax / cellSize).toLong
        val y0 = math.floor(ymin / cellSize).toLong
        val y1 = math.floor(ymax / cellSize).toLong
        val cells = for (cx <- x0 to x1; cy <- y0 to y1) yield cx * 1000000000L + cy
        new GenericArrayData(cells.toArray)
    }

  /** Half-size subcells of `parentCell` (at `parentSize`) covered by the
    * geometry's envelope — the refinement step of the D16 quadtree grid.
    * At most 4 cells; empty when the envelope misses the parent entirely.
    * Packing convention matches [[envelopeCells]] (`cx*1e9+cy`, |cy| < 5e8).
    */
  def envelopeSubCells(s: UTF8String, parentCell: Long, parentSize: Double): ArrayData =
    Wkt.parse(s.toString).flatMap(_.envelope) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) =>
        var px = Math.floorDiv(parentCell, 1000000000L)
        var py = Math.floorMod(parentCell, 1000000000L)
        if (py >= 500000000L) { py -= 1000000000L; px += 1 }
        val h = parentSize / 2
        val x0 = math.max(math.floor(xmin / h).toLong, 2 * px)
        val x1 = math.min(math.floor(xmax / h).toLong, 2 * px + 1)
        val y0 = math.max(math.floor(ymin / h).toLong, 2 * py)
        val y1 = math.min(math.floor(ymax / h).toLong, 2 * py + 1)
        val cells = for (cx <- x0 to x1; cy <- y0 to y1) yield cx * 1000000000L + cy
        new GenericArrayData(cells.toArray)
    }

  /** Codegen template: child-null-safe call whose null result sets ev.isNull. */
  private[geo] def nullableCall(ctx: CodegenContext, ev: ExprCode, javaType: String,
                                children: Seq[Expression], call: Seq[String] => String): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val resVar = ctx.freshName("geoRes")
    val anyChildNull = gens.map(_.isNull.toString).mkString(" || ")
    ev.copy(code =
      code"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!($anyChildNull)) {
          $javaType $resVar = ${call(gens.map(_.value.toString))};
          if ($resVar != null) { ${ev.isNull} = false; ${ev.value} = $resVar; }
        }""")
  }
}

/** NULL when the WKT does not parse (try_to_geometry null semantics). */
case class WktInfo(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WktInfo.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = GeoOps.wktInfo(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    GeoOps.nullableCall(ctx, ev, "org.apache.spark.sql.catalyst.InternalRow", Seq(child),
      vs => s"graft.geo.GeoOps.wktInfo(${vs.head})")

  override protected def withNewChildInternal(c: Expression): WktInfo = copy(child = c)
}

/** Does the fixed reference geometry hold `relation` vs the row's geometry —
  * `st_rel(reference, column)` argument order (geo/check_funcs.py:1006).
  * NULL when the row WKT does not parse. The reference WKT is parsed once.
  */
case class WktRelation(child: Expression, referenceWkt: String, relation: String)
    extends UnaryExpression {
  @transient private lazy val refGeom: Geom = Wkt.parse(referenceWkt)
    .getOrElse(throw new IllegalArgumentException(s"Invalid reference WKT: $referenceWkt"))

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    GeoOps.wktRelation(v.asInstanceOf[UTF8String], refGeom, relation)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refRef = ctx.addReferenceObj("refGeom", refGeom, classOf[Geom].getName)
    val relRef = ctx.addReferenceObj("relation", relation, "java.lang.String")
    val gen = child.genCode(ctx)
    val resVar = ctx.freshName("relRes")
    ev.copy(code =
      code"""
        ${gen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${gen.isNull}) {
          java.lang.Boolean $resVar = graft.geo.GeoOps.wktRelation(${gen.value}, $refRef, $relRef);
          if ($resVar != null) { ${ev.isNull} = false; ${ev.value} = $resVar.booleanValue(); }
        }""")
  }

  override protected def withNewChildInternal(c: Expression): WktRelation = copy(child = c)
}

/** Exact pairwise intersection of two WKT columns (candidate verification in
  * the D16 bucketed spatial join). NULL when either side does not parse.
  */
case class WktPairIntersects(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    GeoOps.pairIntersects(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val resVar = ctx.freshName("interRes")
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${lGen.isNull} && !${rGen.isNull}) {
          java.lang.Boolean $resVar = graft.geo.GeoOps.pairIntersects(${lGen.value}, ${rGen.value});
          if ($resVar != null) { ${ev.isNull} = false; ${ev.value} = $resVar.booleanValue(); }
        }""")
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
    extends UnaryExpression {
  require(cellSize > 0, "cellSize must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    GeoOps.envelopeCells(v.asInstanceOf[UTF8String], cellSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    GeoOps.nullableCall(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData", Seq(child),
      vs => s"graft.geo.GeoOps.envelopeCells(${vs.head}, ${cellSize}D)")

  override protected def withNewChildInternal(c: Expression): WktEnvelopeCells = copy(child = c)
}

/** Half-size subcells of the row's `parentCell` (computed at `parentSize`)
  * covered by the geometry's envelope — the quadtree refinement step that
  * splits dense D16 grid cells. At most 4 cells per row. NULL when the WKT
  * does not parse or has no envelope.
  */
case class WktEnvelopeSubCells(left: Expression, right: Expression, parentSize: Double)
    extends BinaryExpression {
  require(parentSize > 0, "parentSize must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(w: Any, cell: Any): Any =
    GeoOps.envelopeSubCells(w.asInstanceOf[UTF8String], cell.asInstanceOf[Long], parentSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    GeoOps.nullableCall(ctx, ev, "org.apache.spark.sql.catalyst.util.ArrayData",
      Seq(left, right),
      vs => s"graft.geo.GeoOps.envelopeSubCells(${vs(0)}, ${vs(1)}, ${parentSize}D)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WktEnvelopeSubCells =
    copy(left = l, right = r)
}
