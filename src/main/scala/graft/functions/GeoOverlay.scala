package graft.functions

import GeoFunctions._

/** Constructive + overlay geometry operations and binary/JSON IO
  * (reference registry `pkg/sql/plan/function/function_id.go:694-712`:
  * ST_CONVEXHULL/ST_SIMPLIFY, ST_UNION/ST_INTERSECTION/ST_DIFFERENCE/
  * ST_SYMDIFFERENCE, ST_BUFFER; IO ids 463-464 (WKB) and 498-499
  * (GeoJSON)). Pure-Scala kernels, like the rest of the geo family.
  *
  * Overlay algorithm: classic edge-split-and-stitch over simple
  * (hole-free, non-self-intersecting) polygons — split each ring's edges
  * at every crossing with the other ring, classify each sub-edge's
  * midpoint against the other polygon (in / on / out), keep the subset
  * the operation calls for (directions chosen so shells stitch CCW and
  * holes CW), then walk the directed edges into rings. Outputs POLYGON,
  * MULTIPOLYGON, or GEOMETRYCOLLECTION EMPTY. Collinear overlapping
  * edges are supported only on exactly-shared segments (the 'on' class);
  * other degeneracies are out of the precision contract, as documented
  * on the WKT kernel.
  */
object GeoOverlay {

  private val Eps = 1e-9

  // ------------------------------------------------------------ hull
  /** Andrew monotone chain; returns POINT/LINESTRING(2)/POLYGON (CCW,
    * starting at the lexicographically smallest vertex).
    */
  def convexHull(g: Geom): Geom = {
    val vs = vertices(g).distinct.sortBy(p => (p._1, p._2))
    if (vs.isEmpty) return GCollection(Vector())
    if (vs.size == 1) return GPoint(vs.head._1, vs.head._2)
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(pts: IndexedSeq[Pt]): Vector[Pt] = {
      var h = Vector.empty[Pt]
      for (p <- pts) {
        while (h.size >= 2 && cross(h(h.size - 2), h(h.size - 1), p) <= 0)
          h = h.dropRight(1)
        h :+= p
      }
      h
    }
    val lower = half(vs)
    val upper = half(vs.reverse)
    val hull = lower.dropRight(1) ++ upper.dropRight(1)
    if (hull.size == 2) GLine(Vector(hull(0), hull(1)))
    else GPolygon(Vector(hull :+ hull.head))
  }

  // -------------------------------------------------------- simplify
  /** Douglas-Peucker on linestrings and polygon rings (rings keep >= 4
    * points; a ring collapsing below a triangle simplifies to itself).
    */
  def simplify(g: Geom, tol: Double): Geom = g match {
    case p: GPoint => p
    case GLine(pts) => GLine(dp(pts, tol))
    case GPolygon(rings) =>
      GPolygon(rings.map { r =>
        val s = dpRing(r, tol)
        if (s.size >= 4) s else r
      })
    case GMultiPoint(ps) => GMultiPoint(ps)
    case GMultiLine(ls) => GMultiLine(ls.map(l => GLine(dp(l.pts, tol))))
    case GMultiPolygon(ps) =>
      GMultiPolygon(ps.map(p => simplify(p, tol).asInstanceOf[GPolygon]))
    case GCollection(gs) => GCollection(gs.map(simplify(_, tol)))
  }

  private def perpDist(p: Pt, a: Pt, b: Pt): Double = {
    val (dx, dy) = (b._1 - a._1, b._2 - a._2)
    val l = math.hypot(dx, dy)
    if (l == 0) math.hypot(p._1 - a._1, p._2 - a._2)
    else math.abs(dy * p._1 - dx * p._2 + b._1 * a._2 - b._2 * a._1) / l
  }

  private def dp(pts: IndexedSeq[Pt], tol: Double): IndexedSeq[Pt] = {
    if (pts.size <= 2) return pts
    var maxD = -1.0
    var maxI = 0
    for (i <- 1 until pts.size - 1) {
      val d = perpDist(pts(i), pts.head, pts.last)
      if (d > maxD) { maxD = d; maxI = i }
    }
    if (maxD <= tol) Vector(pts.head, pts.last)
    else dp(pts.take(maxI + 1), tol).dropRight(1) ++ dp(pts.drop(maxI), tol)
  }

  /** DP for a closed ring: anchor on the two farthest-apart vertices so
    * the closure point is not privileged.
    */
  private def dpRing(r: IndexedSeq[Pt], tol: Double): IndexedSeq[Pt] = {
    val open = r.dropRight(1)
    if (open.size <= 3) return r
    // split at vertex farthest from vertex 0
    val far = open.indices.maxBy(i => math.hypot(open(i)._1 - open(0)._1, open(i)._2 - open(0)._2))
    if (far == 0) return r
    val a = dp(open.slice(0, far + 1), tol)
    val b = dp(open.drop(far) :+ open.head, tol)
    a.dropRight(1) ++ b
  }

  // ----------------------------------------------------------- overlay
  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

  /** Intersection point(s) of segment [a,b] with [c,d] as parameters t
    * along [a,b]; includes endpoint touches. Collinear overlaps
    * contribute the other segment's endpoints that lie on [a,b].
    */
  private def splitParams(a: Pt, b: Pt, c: Pt, d: Pt): Seq[Double] = {
    val r = (b._1 - a._1, b._2 - a._2)
    val s = (d._1 - c._1, d._2 - c._2)
    val denom = r._1 * s._2 - r._2 * s._1
    val acx = (c._1 - a._1, c._2 - a._2)
    if (math.abs(denom) > Eps) {
      val t = (acx._1 * s._2 - acx._2 * s._1) / denom
      val u = (acx._1 * r._2 - acx._2 * r._1) / denom
      if (t >= -Eps && t <= 1 + Eps && u >= -Eps && u <= 1 + Eps) Seq(math.max(0.0, math.min(1.0, t)))
      else Nil
    } else if (math.abs(cross(a, b, c)) < Eps) {
      // collinear: project c and d onto [a,b]
      val l2 = r._1 * r._1 + r._2 * r._2
      if (l2 < Eps) Nil
      else Seq(c, d).map(p => ((p._1 - a._1) * r._1 + (p._2 - a._2) * r._2) / l2)
          .filter(t => t > Eps && t < 1 - Eps)
    } else Nil
  }

  private def norm(r: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    // drop closure point, force CCW
    val open = r.dropRight(1)
    var s = 0.0
    for (i <- open.indices) {
      val j = (i + 1) % open.size
      s += open(i)._1 * open(j)._2 - open(j)._1 * open(i)._2
    }
    if (s < 0) open.reverse else open
  }

  private type Edge = (Pt, Pt)

  /** Split every edge of ring r at crossings with ring o. */
  private def splitEdges(r: IndexedSeq[Pt], o: IndexedSeq[Pt]): Vector[Edge] = {
    val out = Vector.newBuilder[Edge]
    for (i <- r.indices) {
      val a = r(i)
      val b = r((i + 1) % r.size)
      val ts = (for (j <- o.indices;
                     t <- splitParams(a, b, o(j), o((j + 1) % o.size))) yield t)
        .filter(t => t > Eps && t < 1 - Eps).distinct.sorted
      var prev = a
      for (t <- ts) {
        val p = (a._1 + t * (b._1 - a._1), a._2 + t * (b._2 - a._2))
        if (math.hypot(p._1 - prev._1, p._2 - prev._2) > Eps) {
          out += ((prev, p)); prev = p
        }
      }
      if (math.hypot(b._1 - prev._1, b._2 - prev._2) > Eps) out += ((prev, b))
    }
    out.result()
  }

  /** -1 out / 0 on-boundary / 1 in, for the midpoint of e against poly. */
  private def midState(e: Edge, poly: GPolygon): Int = {
    val m = ((e._1._1 + e._2._1) / 2, (e._1._2 + e._2._2) / 2)
    GeoFunctions.pipState(m, poly)
  }

  /** Whether directed edge e runs along o's boundary in the same
    * direction (shared-segment disambiguation for union/intersection).
    */
  private def sameDirOnBoundary(e: Edge, o: IndexedSeq[Pt]): Boolean = {
    val dir = (e._2._1 - e._1._1, e._2._2 - e._1._2)
    o.indices.exists { j =>
      val (c, d) = (o(j), o((j + 1) % o.size))
      math.abs(cross(c, d, e._1)) < Eps && math.abs(cross(c, d, e._2)) < Eps && {
        val od = (d._1 - c._1, d._2 - c._2)
        dir._1 * od._1 + dir._2 * od._2 > 0
      }
    }
  }

  private def stitch(edges: Vector[Edge]): Option[IndexedSeq[IndexedSeq[Pt]]] = {
    if (edges.isEmpty) return Some(Vector())
    def key(p: Pt): (Long, Long) =
      (math.round(p._1 / Eps / 1000), math.round(p._2 / Eps / 1000))
    val bySrc = scala.collection.mutable.Map.empty[(Long, Long), List[Edge]]
    for (e <- edges) bySrc.updateWith(key(e._1))(l => Some(e :: l.getOrElse(Nil)))
    def takeFrom(k: (Long, Long)): Option[Edge] =
      bySrc.get(k).flatMap(_.headOption).map { e =>
        bySrc.updateWith(k)(_.map(_.tail).filter(_.nonEmpty)); e
      }
    val rings = Vector.newBuilder[IndexedSeq[Pt]]
    while (bySrc.nonEmpty) {
      val start = bySrc.head._2.head
      val startKey = key(start._1)
      val ring = Vector.newBuilder[Pt]
      var cur = takeFrom(startKey).get
      ring += cur._1
      var guard = edges.size + 1
      while (key(cur._2) != startKey && guard > 0) {
        takeFrom(key(cur._2)) match {
          case Some(next) => cur = next; ring += cur._1
          case None => return None // open chain — degenerate input
        }
        guard -= 1
      }
      if (guard == 0) return None
      val r = ring.result()
      if (r.size >= 3) rings += (r :+ r.head)
    }
    Some(rings.result())
  }

  /** Assemble stitched rings into POLYGON/MULTIPOLYGON/EMPTY: CCW rings
    * are shells, CW rings are holes of the shell containing them.
    */
  private def assemble(rings: IndexedSeq[IndexedSeq[Pt]]): Geom = {
    if (rings.isEmpty) return GCollection(Vector())
    def signedArea(r: IndexedSeq[Pt]): Double = {
      var s = 0.0
      for (i <- 0 until r.size - 1)
        s += r(i)._1 * r(i + 1)._2 - r(i + 1)._1 * r(i)._2
      s / 2
    }
    val (shells, holes) = rings.partition(signedArea(_) > 0)
    if (shells.isEmpty) return GCollection(Vector())
    val polys = shells.map { sh =>
      val mine = holes.filter { h =>
        GeoFunctions.pipState(h.head, GPolygon(Vector(sh))) >= 0
      }
      GPolygon(sh +: mine)
    }
    if (polys.size == 1) polys.head else GMultiPolygon(polys)
  }

  /** Boolean overlay of two simple polygons (exterior shells only). */
  def overlay(op: String, pa: GPolygon, pb: GPolygon): Option[Geom] = {
    val ra = norm(pa.rings.head)
    val rb = norm(pb.rings.head)
    val aN = GPolygon(Vector(ra :+ ra.head))
    val bN = GPolygon(Vector(rb :+ rb.head))
    val ea = splitEdges(ra, rb)
    val eb = splitEdges(rb, ra)
    val keep: Vector[Edge] = op match {
      case "intersection" =>
        // A edges in-or-on B (on: keep only same-direction shared runs,
        // once, from A), B edges strictly in A
        ea.filter(e => midState(e, bN) match {
          case 1 => true
          case 0 => sameDirOnBoundary(e, rb)
          case _ => false
        }) ++ eb.filter(e => midState(e, aN) == 1)
      case "union" =>
        ea.filter(e => midState(e, bN) match {
          case -1 => true
          case 0 => sameDirOnBoundary(e, rb)
          case _ => false
        }) ++ eb.filter(e => midState(e, aN) == -1)
      case "difference" =>
        // A out of B, plus B-in-A reversed (forms CW holes / cut lines)
        ea.filter(e => midState(e, bN) match {
          case -1 => true
          case 0 => !sameDirOnBoundary(e, rb) // opposite-direction shared run = boundary of the cut
          case _ => false
        }) ++ eb.filter(e => midState(e, aN) == 1).map(e => (e._2, e._1))
      case "symdifference" =>
        ea.filter(e => midState(e, bN) == -1) ++
          eb.filter(e => midState(e, aN) == -1) ++
          ea.filter(e => midState(e, bN) == 1).map(e => (e._2, e._1)) ++
          eb.filter(e => midState(e, aN) == 1).map(e => (e._2, e._1))
      case _ => return None
    }
    stitch(keep).map(assemble)
  }

  /** Entry point handling the point/line fast paths the reference's
    * overlay accepts; polygon×polygon goes through [[overlay]].
    */
  def setOp(op: String, a: Geom, b: Geom): Option[Geom] = (a, b) match {
    case (pa: GPolygon, pb: GPolygon) if pa.rings.size == 1 && pb.rings.size == 1 =>
      overlay(op, pa, pb)
    case (p: GPoint, g) => op match {
      case "intersection" =>
        Some(if (GeoFunctions.intersects(p, g)) p else GCollection(Vector()))
      case "union" if g.isInstanceOf[GPoint] =>
        val q = g.asInstanceOf[GPoint]
        Some(if (p == q) p else GMultiPoint(Vector((p.x, p.y), (q.x, q.y))))
      case "difference" =>
        Some(if (GeoFunctions.intersects(p, g)) GCollection(Vector()) else p)
      case _ => None
    }
    case (g, p: GPoint) => op match {
      case "intersection" => setOp(op, p, g)
      case "union" => setOp("union", p, g)
      case _ => None
    }
    case _ => None // line overlay and holes: out of scope, NULL
  }

  // ------------------------------------------------------------- buffer
  /** Arc segments per full circle (MySQL default 32 points/circle). */
  val BufferSegs = 32

  /** Positive-distance buffer of a point (regular n-gon on the radius
    * circle), a linestring (union of per-segment round-capped capsules),
    * or a CONVEX polygon (offset edges + vertex arc fans). A zero
    * distance is the identity (`geo_buffer.result`: zero_buf). Concave
    * polygons return None (NULL), documented scope.
    */
  def buffer(g: Geom, d: Double): Option[Geom] = bufferN(g, d, BufferSegs)

  /** One capsule polygon (rectangle + semicircular caps) around the
    * segment a→b, CCW, with `segs` total circle segments.
    */
  private def capsule(a: Pt, b: Pt, d: Double, segs: Int): GPolygon = {
    val theta = math.atan2(b._2 - a._2, b._1 - a._1)
    val half = math.max(2, segs / 2)
    val out = Vector.newBuilder[Pt]
    // cap around b: from theta-90° to theta+90°
    for (k <- 0 to half) {
      val ang = theta - math.Pi / 2 + math.Pi * k / half
      out += ((b._1 + d * math.cos(ang), b._2 + d * math.sin(ang)))
    }
    // cap around a: from theta+90° to theta+270°
    for (k <- 0 to half) {
      val ang = theta + math.Pi / 2 + math.Pi * k / half
      out += ((a._1 + d * math.cos(ang), a._2 + d * math.sin(ang)))
    }
    val pts = out.result()
    GPolygon(Vector(pts :+ pts.head))
  }

  def bufferN(g: Geom, d: Double, segs: Int): Option[Geom] = {
    if (d == 0) return Some(g)
    if (d < 0) return None
    g match {
      case GPoint(x, y) if !x.isNaN =>
        val pts = (0 until segs).map { k =>
          val a = 2 * math.Pi * k / segs
          (x + d * math.cos(a), y + d * math.sin(a))
        }
        Some(GPolygon(Vector(pts :+ pts.head)))
      case GLine(p) if p.size >= 2 =>
        val caps = p.sliding(2).map(s => capsule(s(0), s(1), d, segs)).toVector
        caps.tail.foldLeft(Option(caps.head: Geom)) { (acc, c) =>
          acc.flatMap(u => setOp("union", u, c))
        }
      case GPolygon(rings) if rings.size == 1 =>
        val r = norm(rings.head)
        val n = r.size
        // convexity check (CCW ⇒ all turns left)
        val convex = r.indices.forall { i =>
          cross(r(i), r((i + 1) % n), r((i + 2) % n)) > -Eps
        }
        if (!convex) return None
        val step = 2 * math.Pi / segs
        val out = Vector.newBuilder[Pt]
        for (i <- r.indices) {
          val prev = r((i - 1 + n) % n)
          val cur = r(i)
          val next = r((i + 1) % n)
          // outward normals of incoming and outgoing edges: CCW ring ⇒
          // outward = right of travel (dx,dy) = (dy,-dx)
          def normal(u: Pt, v: Pt): Double = math.atan2(-(v._1 - u._1), v._2 - u._2)
          val a0 = normal(prev, cur)
          var a1 = normal(cur, next)
          while (a1 < a0 - Eps) a1 += 2 * math.Pi
          // arc fan from a0 to a1 around cur
          var a = a0
          while (a < a1 - Eps) {
            out += ((cur._1 + d * math.cos(a), cur._2 + d * math.sin(a)))
            a += step
          }
          out += ((cur._1 + d * math.cos(a1), cur._2 + d * math.sin(a1)))
        }
        val pts = out.result()
        Some(GPolygon(Vector(pts :+ pts.head)))
      case _ => None
    }
  }

  // ------------------------------------------------------------ WKB io
  /** OGC WKB, little-endian (type codes 1-7). */
  def toWkb(g: Geom): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(wkbSize(g)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    writeWkb(bb, g)
    bb.array()
  }

  private def wkbSize(g: Geom): Int = g match {
    case _: GPoint => 21
    case GLine(pts) => 9 + 16 * pts.size
    case GPolygon(rings) => 9 + 4 * rings.size + 16 * rings.map(_.size).sum
    case GMultiPoint(pts) => 9 + 21 * pts.size
    case GMultiLine(ls) => 9 + ls.map(wkbSize).sum
    case GMultiPolygon(ps) => 9 + ps.map(wkbSize).sum
    case GCollection(gs) => 9 + gs.map(wkbSize).sum
  }

  private def writeWkb(bb: java.nio.ByteBuffer, g: Geom): Unit = {
    bb.put(1.toByte) // little-endian
    g match {
      case GPoint(x, y) => bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
      case GLine(pts) =>
        bb.putInt(2); bb.putInt(pts.size)
        pts.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
      case GPolygon(rings) =>
        bb.putInt(3); bb.putInt(rings.size)
        rings.foreach { r =>
          bb.putInt(r.size)
          r.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
        }
      case GMultiPoint(pts) =>
        bb.putInt(4); bb.putInt(pts.size)
        pts.foreach { p => writeWkb(bb, GPoint(p._1, p._2)) }
      case GMultiLine(ls) =>
        bb.putInt(5); bb.putInt(ls.size); ls.foreach(writeWkb(bb, _))
      case GMultiPolygon(ps) =>
        bb.putInt(6); bb.putInt(ps.size); ps.foreach(writeWkb(bb, _))
      case GCollection(gs) =>
        bb.putInt(7); bb.putInt(gs.size); gs.foreach(writeWkb(bb, _))
    }
  }

  /** Parse WKB (either byte order). */
  def fromWkb(bytes: Array[Byte]): Option[Geom] =
    if (bytes == null || bytes.length < 5) None
    else try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val g = readWkb(bb)
      if (bb.hasRemaining) None else Some(g)
    } catch { case _: Exception => None }

  private def readWkb(bb: java.nio.ByteBuffer): Geom = {
    val order = bb.get()
    bb.order(if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    def pt(): Pt = (bb.getDouble, bb.getDouble)
    def pts(): IndexedSeq[Pt] = Vector.fill(bb.getInt)(pt())
    bb.getInt match {
      case 1 => val p = pt(); GPoint(p._1, p._2)
      case 2 => GLine(pts())
      case 3 => GPolygon(Vector.fill(bb.getInt)(pts()))
      case 4 => GMultiPoint(Vector.fill(bb.getInt) {
        val g = readWkb(bb).asInstanceOf[GPoint]; (g.x, g.y)
      })
      case 5 => GMultiLine(Vector.fill(bb.getInt)(readWkb(bb).asInstanceOf[GLine]))
      case 6 => GMultiPolygon(Vector.fill(bb.getInt)(readWkb(bb).asInstanceOf[GPolygon]))
      case 7 => GCollection(Vector.fill(bb.getInt)(readWkb(bb)))
      case t => throw new IllegalArgumentException(s"wkb type $t")
    }
  }

  // --------------------------------------------------------- GeoJSON io
  private def fmtNum(v: Double): String =
    if (v == v.toLong && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def jPos(p: Pt): String =
    if (p._1.isNaN || p._2.isNaN) "[]" // empty point member
    else s"[${fmtNum(p._1)},${fmtNum(p._2)}]"
  private def jRing(r: IndexedSeq[Pt]): String = r.map(jPos).mkString("[", ",", "]")

  /** Compact GeoJSON (RFC 7946 geometry object). */
  def toGeoJson(g: Geom): String = g match {
    case GPoint(x, y) => s"""{"type":"Point","coordinates":${jPos((x, y))}}"""
    case GLine(pts) => s"""{"type":"LineString","coordinates":${jRing(pts)}}"""
    case GPolygon(rings) =>
      s"""{"type":"Polygon","coordinates":${rings.map(jRing).mkString("[", ",", "]")}}"""
    case GMultiPoint(pts) =>
      s"""{"type":"MultiPoint","coordinates":${jRing(pts)}}"""
    case GMultiLine(ls) =>
      s"""{"type":"MultiLineString","coordinates":${ls.map(l => jRing(l.pts)).mkString("[", ",", "]")}}"""
    case GMultiPolygon(ps) =>
      s"""{"type":"MultiPolygon","coordinates":${
        ps.map(p => p.rings.map(jRing).mkString("[", ",", "]")).mkString("[", ",", "]")}}"""
    case GCollection(gs) =>
      s"""{"type":"GeometryCollection","geometries":${gs.map(toGeoJson).mkString("[", ",", "]")}}"""
  }

  /** Parse RFC 7946 geometry objects (Jackson, same reader as the JSON
    * function family).
    */
  def fromGeoJson(json: String): Option[Geom] = {
    if (json == null) return None
    val node = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch { case _: Exception => return None }
    fromJsonNode(node)
  }

  private def fromJsonNode(n: com.fasterxml.jackson.databind.JsonNode): Option[Geom] = {
    import com.fasterxml.jackson.databind.JsonNode
    if (n == null || !n.isObject) return None
    def coords: JsonNode = n.get("coordinates")
    def pos(a: JsonNode): Option[Pt] =
      if (a != null && a.isArray && a.size >= 2 && a.get(0).isNumber && a.get(1).isNumber)
        Some((a.get(0).asDouble, a.get(1).asDouble))
      else None
    def posList(a: JsonNode): Option[IndexedSeq[Pt]] =
      if (a == null || !a.isArray) None
      else {
        val ps = (0 until a.size).map(i => pos(a.get(i)))
        if (ps.exists(_.isEmpty)) None else Some(ps.flatMap(_.toList).toVector)
      }
    def ringList(a: JsonNode): Option[IndexedSeq[IndexedSeq[Pt]]] =
      if (a == null || !a.isArray) None
      else {
        val rs = (0 until a.size).map(i => posList(a.get(i)))
        if (rs.exists(_.isEmpty)) None else Some(rs.flatMap(_.toList).toVector)
      }
    Option(n.get("type")).map(_.asText).flatMap {
      case "Point" => pos(coords).map(p => GPoint(p._1, p._2))
      case "LineString" => posList(coords).map(GLine)
      case "Polygon" => ringList(coords).map(GPolygon)
      case "MultiPoint" => posList(coords).map(GMultiPoint)
      case "MultiLineString" => ringList(coords).map(rs => GMultiLine(rs.map(GLine)))
      case "MultiPolygon" =>
        val a = coords
        if (a == null || !a.isArray) None
        else {
          val ps = (0 until a.size).map(i => ringList(a.get(i)))
          if (ps.exists(_.isEmpty)) None
          else Some(GMultiPolygon(ps.flatMap(_.toList).map(GPolygon).toVector))
        }
      case "GeometryCollection" =>
        val gs = n.get("geometries")
        if (gs == null || !gs.isArray) None
        else {
          val parsed = (0 until gs.size).map(i => fromJsonNode(gs.get(i)))
          if (parsed.exists(_.isEmpty)) None
          else Some(GCollection(parsed.flatMap(_.toList).toVector))
        }
      case _ => None
    }
  }

  // --------------------------------------------- discrete curve distances
  /** Discrete Fréchet distance over the geometries' vertex sequences. */
  def frechet(a: Geom, b: Geom): Option[Double] = (a, b) match {
    case (GLine(p), GLine(q)) =>
      val ca = Array.fill(p.size, q.size)(-1.0)
      def d(i: Int, j: Int): Double = math.hypot(p(i)._1 - q(j)._1, p(i)._2 - q(j)._2)
      def c(i: Int, j: Int): Double = {
        if (ca(i)(j) >= 0) return ca(i)(j)
        val v =
          if (i == 0 && j == 0) d(0, 0)
          else if (i == 0) math.max(c(0, j - 1), d(0, j))
          else if (j == 0) math.max(c(i - 1, 0), d(i, 0))
          else math.max(math.min(math.min(c(i - 1, j), c(i - 1, j - 1)), c(i, j - 1)), d(i, j))
        ca(i)(j) = v
        v
      }
      Some(c(p.size - 1, q.size - 1))
    case _ => None
  }

  /** Discrete (vertex-sampled) Hausdorff distance. */
  def hausdorff(a: Geom, b: Geom): Option[Double] = {
    val va = vertices(a)
    val vb = vertices(b)
    if (va.isEmpty || vb.isEmpty) return None
    def oneWay(xs: IndexedSeq[Pt], g: Geom): Double =
      xs.map { p =>
        segments(g).toVector match {
          case segs if segs.nonEmpty =>
            segs.map { case (c, d) => GeoFunctions.pointSegDist(p, c, d) }.min
          case _ => vertices(g).map(q => math.hypot(p._1 - q._1, p._2 - q._2)).min
        }
      }.max
    Some(math.max(oneWay(va, b), oneWay(vb, a)))
  }

  // ------------------------------------------------ linear referencing
  /** Point at fraction f (0..1) along a linestring's length. */
  def lineInterpolatePoint(g: Geom, f: Double): Option[Geom] = g match {
    case GLine(pts) if f >= 0 && f <= 1 =>
      val total = pts.sliding(2).map(s => math.hypot(s(1)._1 - s(0)._1, s(1)._2 - s(0)._2)).sum
      pointAtLength(pts, f * total)
    case _ => None
  }

  /** Points at every multiple of `f` along the line (PostGIS
    * repeat-points semantics; the reference rejects f outside (0, 1] —
    * `geo_lineref.result`: 0.25 yields the 4 quarter points incl. the
    * endpoint, 1.0 yields just the endpoint).
    */
  def lineInterpolatePoints(g: Geom, f: Double): Option[Geom] = g match {
    case l: GLine if f > 0 && f <= 1 =>
      val n = math.floor(1.0 / f + 1e-9).toInt
      val pts = (1 to n).flatMap(k =>
        lineInterpolatePoint(l, math.min(k * f, 1.0))).collect {
        case GPoint(x, y) => (x, y)
      }
      // a single result is a bare POINT (geo_lineref.result: f=1.0)
      if (pts.size == 1) Some(GPoint(pts.head._1, pts.head._2))
      else Some(GMultiPoint(pts.toVector))
    case _ => None
  }

  /** Point at absolute distance d along a linestring. */
  def pointAtDistance(g: Geom, dist: Double): Option[Geom] = g match {
    case GLine(pts) if dist >= 0 => pointAtLength(pts, dist)
    case _ => None
  }

  private def pointAtLength(pts: IndexedSeq[Pt], target: Double): Option[Geom] = {
    var rem = target
    for (Seq(a, b) <- pts.sliding(2)) {
      val l = math.hypot(b._1 - a._1, b._2 - a._2)
      if (rem <= l)
        return Some(GPoint(a._1 + (b._1 - a._1) * (if (l == 0) 0 else rem / l),
          a._2 + (b._2 - a._2) * (if (l == 0) 0 else rem / l)))
      rem -= l
    }
    if (rem < Eps) Some(GPoint(pts.last._1, pts.last._2)) else None
  }
}
