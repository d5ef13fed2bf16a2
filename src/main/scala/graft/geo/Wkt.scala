package graft.geo

/** Minimal planar (2D) geometry model + WKT parser + computational geometry,
  * pure Scala — the OSS substitute for the Databricks spatial SQL functions the
  * reference wraps (geo/check_funcs.py:14-32, :110-1302). Type-name constants
  * match `st_geometrytype` (`ST_Point`, ...; geo/check_funcs.py:14-21) so check
  * semantics line up one-to-one.
  *
  * Scope: WKT only (no WKB/EWKT), no Z/M coordinates, Cartesian math (no
  * geodesics) — documented boundary; the expression layer degrades to NULL on
  * anything unparseable, matching `try_to_geometry` null semantics.
  */
final case class Pt(x: Double, y: Double)

sealed trait Geom {
  def typeName: String
  def isEmpty: Boolean
  /** Topological dimension: point 0, line 1, polygon 2; collection = max. */
  def dimension: Int
  /** Total vertex count (all rings/parts). */
  def numPoints: Int
  /** Shoelace area (shells minus holes); 0 for sub-areal geometries. */
  def area: Double
  def allPoints: Seq[Pt]
  def envelope: Option[(Double, Double, Double, Double)] = {
    // one pass, no intermediate mapped Seqs / boxed mins (the 4x map+min
    // formulation was a measurable slice of the 10M-row WktInfo cost);
    // NaN coords cannot occur post-parse (Wkt.number rejects them)
    val ps = allPoints
    if (ps.isEmpty) None
    else {
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      val it = ps.iterator
      while (it.hasNext) {
        val p = it.next()
        if (p.x < xmin) xmin = p.x
        if (p.x > xmax) xmax = p.x
        if (p.y < ymin) ymin = p.y
        if (p.y > ymax) ymax = p.y
      }
      Some((xmin, ymin, xmax, ymax))
    }
  }
  /** Leaf parts (multi/collection flattened). */
  def parts: Seq[Geom] = Seq(this)
}

final case class GPoint(p: Option[Pt]) extends Geom {
  val typeName = "ST_Point"
  def isEmpty: Boolean = p.isEmpty
  def dimension = 0
  def numPoints: Int = if (p.isEmpty) 0 else 1
  def area = 0.0
  def allPoints: Seq[Pt] = p.toSeq
  override def envelope: Option[(Double, Double, Double, Double)] =
    p.map(q => (q.x, q.y, q.x, q.y))
}

final case class GLine(pts: IndexedSeq[Pt]) extends Geom {
  val typeName = "ST_LineString"
  def isEmpty: Boolean = pts.isEmpty
  def dimension = 1
  def numPoints: Int = pts.length
  def area = 0.0
  def allPoints: Seq[Pt] = pts
  def segments: Seq[(Pt, Pt)] = if (pts.length < 2) Seq.empty else pts.zip(pts.tail)
}

/** rings(0) = shell, rest = holes; rings are closed (first == last). */
final case class GPolygon(rings: IndexedSeq[IndexedSeq[Pt]]) extends Geom {
  val typeName = "ST_Polygon"
  def isEmpty: Boolean = rings.isEmpty
  def dimension = 2
  def numPoints: Int = rings.map(_.length).sum
  def area: Double = rings.zipWithIndex.map { case (r, i) =>
    val a = math.abs(GeomOps.shoelace(r))
    if (i == 0) a else -a
  }.sum
  def allPoints: Seq[Pt] = rings.flatten
  def segments: Seq[(Pt, Pt)] = rings.flatMap(r => if (r.length < 2) Seq.empty else r.zip(r.tail))
}

final case class GMulti(typeName: String, override val parts: Seq[Geom]) extends Geom {
  def isEmpty: Boolean = parts.forall(_.isEmpty)
  def dimension: Int = if (parts.isEmpty) 0 else parts.map(_.dimension).max
  def numPoints: Int = parts.map(_.numPoints).sum
  def area: Double = parts.map(_.area).sum
  def allPoints: Seq[Pt] = parts.flatMap(_.allPoints)
}

object Wkt {
  /** Parse WKT text; None when malformed. */
  def parse(s: String): Option[Geom] =
    try { val p = new Parser(s); val g = p.geometry(); p.end(); Some(g) }
    catch { case _: ParseFail => None }

  private final class ParseFail extends RuntimeException(null, null, false, false)

  private final class Parser(s: String) {
    private var i = 0
    private def fail(): Nothing = throw new ParseFail
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def eat(c: Char): Unit = { ws(); if (i >= s.length || s.charAt(i) != c) fail(); i += 1 }
    private def peek(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }
    /** Allocation-free keyword dispatch: the geometry tag appears once per
      * parsed value, and `substring().toUpperCase` was two garbage objects
      * per row in the row-check hot path. Matches the known WKT keywords
      * case-insensitively in place.
      */
    private def keywordTag(): Int = {
      ws(); val start = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      if (i == start) fail()
      val len = i - start
      def is(k: String): Boolean = len == k.length && s.regionMatches(true, start, k, 0, len)
      if (is("POINT")) 0
      else if (is("LINESTRING")) 1
      else if (is("POLYGON")) 2
      else if (is("MULTIPOINT")) 3
      else if (is("MULTILINESTRING")) 4
      else if (is("MULTIPOLYGON")) 5
      else if (is("GEOMETRYCOLLECTION")) 6
      else fail()
    }
    private def number(): Double = {
      ws(); val start = i
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var digits = false
      while (i < s.length && s.charAt(i).isDigit) { i += 1; digits = true }
      if (i < s.length && s.charAt(i) == '.') { i += 1; while (i < s.length && s.charAt(i).isDigit) { i += 1; digits = true } }
      if (!digits) fail()
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        val es = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i == es) fail()
      }
      val v = java.lang.Double.parseDouble(s.substring(start, i))
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) fail()
      v
    }
    private def coord(): Pt = { val x = number(); val y = number(); Pt(x, y) }
    private def coordList(): IndexedSeq[Pt] = {
      eat('(')
      val buf = Vector.newBuilder[Pt]
      buf += coord()
      while (peek(',')) { eat(','); buf += coord() }
      eat(')')
      buf.result()
    }
    private def isEmptyToken(): Boolean = {
      ws()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; true } else false
    }

    def geometry(): Geom = keywordTag() match {
      case 0 => // POINT
        if (isEmptyToken()) GPoint(None)
        else { eat('('); val p = coord(); eat(')'); GPoint(Some(p)) }
      case 1 => // LINESTRING
        if (isEmptyToken()) GLine(Vector.empty) else GLine(coordList())
      case 2 => // POLYGON
        if (isEmptyToken()) GPolygon(Vector.empty) else GPolygon(ringList())
      case 3 => // MULTIPOINT
        if (isEmptyToken()) GMulti("ST_MultiPoint", Seq.empty)
        else {
          eat('(')
          val buf = Seq.newBuilder[Geom]
          def one(): Unit =
            if (peek('(')) { eat('('); buf += GPoint(Some(coord())); eat(')') }
            else buf += GPoint(Some(coord()))
          one(); while (peek(',')) { eat(','); one() }
          eat(')')
          GMulti("ST_MultiPoint", buf.result())
        }
      case 4 => // MULTILINESTRING
        if (isEmptyToken()) GMulti("ST_MultiLineString", Seq.empty)
        else {
          eat('(')
          val buf = Seq.newBuilder[Geom]
          buf += GLine(coordList())
          while (peek(',')) { eat(','); buf += GLine(coordList()) }
          eat(')')
          GMulti("ST_MultiLineString", buf.result())
        }
      case 5 => // MULTIPOLYGON
        if (isEmptyToken()) GMulti("ST_MultiPolygon", Seq.empty)
        else {
          eat('(')
          val buf = Seq.newBuilder[Geom]
          buf += GPolygon(ringList())
          while (peek(',')) { eat(','); buf += GPolygon(ringList()) }
          eat(')')
          GMulti("ST_MultiPolygon", buf.result())
        }
      case 6 => // GEOMETRYCOLLECTION
        if (isEmptyToken()) GMulti("ST_GeometryCollection", Seq.empty)
        else {
          eat('(')
          val buf = Seq.newBuilder[Geom]
          buf += geometry()
          while (peek(',')) { eat(','); buf += geometry() }
          eat(')')
          GMulti("ST_GeometryCollection", buf.result())
        }
      case _ => fail()
    }

    private def ringList(): IndexedSeq[IndexedSeq[Pt]] = {
      eat('(')
      val buf = Vector.newBuilder[IndexedSeq[Pt]]
      buf += coordList()
      while (peek(',')) { eat(','); buf += coordList() }
      eat(')')
      buf.result()
    }

    def end(): Unit = { ws(); if (i != s.length) fail() }
  }
}

/** Computational-geometry predicates over the model. Exact arithmetic is NOT
  * attempted (doubles + epsilon-free orientation tests) — adequate for the
  * engine's data-quality use, not a full DE-9IM implementation.
  */
object GeomOps {
  /** Signed shoelace sum of a closed ring (2x area). */
  def shoelace(r: Seq[Pt]): Double = {
    var a = 0.0
    var i = 0
    while (i < r.length - 1) {
      a += r(i).x * r(i + 1).y - r(i + 1).x * r(i).y
      i += 1
    }
    a / 2.0
  }

  private def orient(a: Pt, b: Pt, c: Pt): Int = {
    val v = (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }

  def onSegment(p: Pt, a: Pt, b: Pt): Boolean =
    orient(a, b, p) == 0 &&
      p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
      p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)

  /** Closed-segment intersection (shared endpoint counts). */
  def segmentsIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    if (o1 != o2 && o3 != o4) true
    else onSegment(c, a, b) || onSegment(d, a, b) || onSegment(a, c, d) || onSegment(b, c, d)
  }

  /** Proper crossing: interiors intersect at a single point (strict). */
  def segmentsCrossProperly(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    o1 != o2 && o3 != o4 && o1 != 0 && o2 != 0 && o3 != 0 && o4 != 0
  }

  /** Ray-casting position vs a closed ring: 0 outside, 1 on boundary, 2 inside. */
  def pointInRing(p: Pt, r: Seq[Pt]): Int = {
    var inside = false
    var i = 0
    while (i < r.length - 1) {
      val a = r(i); val b = r(i + 1)
      if (onSegment(p, a, b)) return 1
      val cond = (a.y > p.y) != (b.y > p.y)
      if (cond) {
        val xCross = (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x
        if (p.x < xCross) inside = !inside
      }
      i += 1
    }
    if (inside) 2 else 0
  }

  /** Position vs a polygon with holes: 0 outside, 1 boundary, 2 interior. */
  def pointInPolygon(p: Pt, poly: GPolygon): Int = {
    if (poly.rings.isEmpty) return 0
    val shell = pointInRing(p, poly.rings.head)
    if (shell == 0) return 0
    if (shell == 1) return 1
    var i = 1
    while (i < poly.rings.length) {
      pointInRing(p, poly.rings(i)) match {
        case 2 => return 0 // inside a hole
        case 1 => return 1 // on a hole boundary
        case _ =>
      }
      i += 1
    }
    2
  }

  /** OGC validity (practical subset): rings closed with >= 4 points, no proper
    * self-/cross-ring edge crossings, non-degenerate shell, holes within the
    * shell; lines need >= 2 points; points need finite coords (always true
    * post-parse); multis/collections valid iff all parts are.
    */
  def ogcValid(g: Geom): Boolean = g match {
    case _: GPoint => true
    case l: GLine => l.pts.isEmpty || l.pts.length >= 2
    case p: GPolygon =>
      if (p.rings.isEmpty) return true // POLYGON EMPTY is valid
      val ringsOk = p.rings.forall(r => r.length >= 4 && r.head == r.last)
      if (!ringsOk) return false
      if (math.abs(shoelace(p.rings.head)) == 0.0) return false
      // no proper crossing between any two edges (same or different ring)
      val segs = p.segments.toIndexedSeq
      var i = 0
      while (i < segs.length) {
        var j = i + 1
        while (j < segs.length) {
          if (segmentsCrossProperly(segs(i)._1, segs(i)._2, segs(j)._1, segs(j)._2)) return false
          j += 1
        }
        i += 1
      }
      // hole vertices inside (or on) the shell
      p.rings.tail.forall(h => h.forall(v => pointInRing(v, p.rings.head) != 0))
    case m: GMulti => m.parts.forall(ogcValid)
  }

  // ---- pairwise relations (decompose multis; any/all over part pairs) ----

  private def leafPairs(a: Geom, b: Geom): Seq[(Geom, Geom)] = {
    def leaves(g: Geom): Seq[Geom] = g match {
      case m: GMulti => m.parts.flatMap(leaves)
      case other => Seq(other)
    }
    for (x <- leaves(a); y <- leaves(b)) yield (x, y)
  }

  private def leafIntersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (GPoint(Some(p)), GPoint(Some(q))) => p == q
    case (GPoint(Some(p)), l: GLine) => l.segments.exists { case (s, e) => onSegment(p, s, e) }
    case (l: GLine, pt: GPoint) => leafIntersects(pt, l)
    case (GPoint(Some(p)), poly: GPolygon) => pointInPolygon(p, poly) != 0
    case (poly: GPolygon, pt: GPoint) => leafIntersects(pt, poly)
    case (l1: GLine, l2: GLine) =>
      l1.segments.exists { case (a1, b1) => l2.segments.exists { case (a2, b2) =>
        segmentsIntersect(a1, b1, a2, b2) } }
    case (l: GLine, poly: GPolygon) =>
      l.pts.exists(p => pointInPolygon(p, poly) != 0) ||
        l.segments.exists { case (a1, b1) => poly.segments.exists { case (a2, b2) =>
          segmentsIntersect(a1, b1, a2, b2) } }
    case (poly: GPolygon, l: GLine) => leafIntersects(l, poly)
    case (p1: GPolygon, p2: GPolygon) =>
      p1.allPoints.exists(p => pointInPolygon(p, p2) != 0) ||
        p2.allPoints.exists(p => pointInPolygon(p, p1) != 0) ||
        p1.segments.exists { case (a1, b1) => p2.segments.exists { case (a2, b2) =>
          segmentsIntersect(a1, b1, a2, b2) } }
    case _ => false // empty parts never intersect
  }

  def intersects(a: Geom, b: Geom): Boolean =
    leafPairs(a, b).exists { case (x, y) => leafIntersects(x, y) }

  /** Sample points of a geometry: vertices plus segment midpoints — used to
    * probe coverage of lines/polygons by an areal geometry (approximation of
    * full containment; midpoints catch concave-boundary escapes).
    */
  private def samplePoints(g: Geom): Seq[Pt] = g match {
    case GPoint(p) => p.toSeq
    case l: GLine => l.pts ++ l.segments.map { case (a, b) => Pt((a.x + b.x) / 2, (a.y + b.y) / 2) }
    case p: GPolygon => p.allPoints ++ p.segments.map { case (a, b) => Pt((a.x + b.x) / 2, (a.y + b.y) / 2) }
    case m: GMulti => m.parts.flatMap(samplePoints)
  }

  private def segmentsOf(g: Geom): Seq[(Pt, Pt)] = g match {
    case l: GLine => l.segments
    case p: GPolygon => p.segments
    case m: GMulti => m.parts.flatMap(segmentsOf)
    case _ => Seq.empty
  }

  /** Position of a point vs geometry a: 0 outside, 1 boundary, 2 interior. */
  private def position(p: Pt, a: Geom): Int = a match {
    case GPoint(Some(q)) => if (p == q) 2 else 0 // a point's interior IS the point (DE-9IM)
    case l: GLine => if (l.segments.exists { case (s, e) => onSegment(p, s, e) }) {
      // line interior = on the line, not at its endpoints
      val atEnd = l.pts.nonEmpty && (p == l.pts.head || p == l.pts.last)
      if (atEnd) 1 else 2
    } else 0
    case poly: GPolygon => pointInPolygon(p, poly)
    case m: GMulti => m.parts.map(position(p, _)).maxOption.getOrElse(0)
    case _ => 0
  }

  /** a covers b: every sampled point of b lies in the closure of a and no edge
    * of b properly crosses a boundary edge of a.
    */
  def covers(a: Geom, b: Geom): Boolean = {
    if (b.isEmpty || a.isEmpty) return false
    val pointsOk = samplePoints(b).forall(p => position(p, a) != 0)
    if (!pointsOk) return false
    val aSegs = segmentsOf(a)
    segmentsOf(b).forall { case (s, e) =>
      !aSegs.exists { case (u, v) => segmentsCrossProperly(s, e, u, v) } }
  }

  /** a contains b: covers, plus some point of b is interior to a
    * (boundary-only contact is not containment — matches st_contains).
    */
  def contains(a: Geom, b: Geom): Boolean =
    covers(a, b) && samplePoints(b).exists(p => position(p, a) == 2)

  /** a touches b: they intersect but interiors do not. Interior contact is
    * certified by any of:
    *  1. a sample point interior to BOTH (exact membership, any dimensions);
    *  2. a is areal and a sample of b lies strictly inside it — a's interior
    *     is open in the plane and every point of b is a limit of b's interior,
    *     so nearby b-interior points are inside a too (symmetric for b);
    *  3. a proper boundary-segment crossing (interiors cross transversally).
    */
  def touches(a: Geom, b: Geom): Boolean = {
    if (!intersects(a, b)) return false
    val samples = samplePoints(a) ++ samplePoints(b)
    val interiorContact =
      samples.exists(p => position(p, a) == 2 && position(p, b) == 2) ||
      (a.dimension == 2 && samplePoints(b).exists(p => position(p, a) == 2)) ||
      (b.dimension == 2 && samplePoints(a).exists(p => position(p, b) == 2)) ||
      segmentsOf(a).exists { case (u, v) => segmentsOf(b).exists { case (s, e) =>
        segmentsCrossProperly(u, v, s, e) } }
    !interiorContact
  }

  def relate(rel: String, a: Geom, b: Geom): Boolean = rel match {
    case "CONTAINS" => contains(a, b)
    case "COVERS" => covers(a, b)
    case "INTERSECTS" => intersects(a, b)
    case "TOUCHES" => touches(a, b)
    case "WITHIN" => contains(b, a)
    case other => throw new IllegalArgumentException(s"Unknown relation: $other")
  }
}
